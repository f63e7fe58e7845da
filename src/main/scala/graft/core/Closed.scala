package graft.core

/** Interval bound-closedness flag algebra.
  *
  * A 2-bit flag describing which ends of a [start, stop] interval are
  * inclusive. Semantics follow the reference engine's flag type
  * (lakota/utils.py:307-335): LEFT = left bound closed, RIGHT = right
  * bound closed, BOTH = both, NONE = open interval.
  */
sealed abstract class Closed(val bits: Int) extends Serializable {
  def left: Boolean = (bits & 2) != 0
  def right: Boolean = (bits & 1) != 0

  def setLeft(v: Boolean): Closed =
    Closed.of(if (v) bits | 2 else bits & 1)
  def setRight(v: Boolean): Closed =
    Closed.of(if (v) bits | 1 else bits & 2)

  /** Single-char code used in manifests: n / r / l / b. */
  def short: String = this match {
    case Closed.None_ => "n"
    case Closed.Right => "r"
    case Closed.Left  => "l"
    case Closed.Both  => "b"
  }
}

object Closed {
  case object None_ extends Closed(0)
  case object Right extends Closed(1)
  case object Left  extends Closed(2)
  case object Both  extends Closed(3)

  def of(bits: Int): Closed = bits match {
    case 0 => None_
    case 1 => Right
    case 2 => Left
    case 3 => Both
    case b => throw new IllegalArgumentException(s"bad closed bits: $b")
  }

  /** Parse "l"/"r"/"b"/"n" (or long names, case-insensitive). */
  def parse(s: String): Closed = s.toLowerCase match {
    case "n" | "none"  => None_
    case "r" | "right" => Right
    case "l" | "left"  => Left
    case "b" | "both"  => Both
    case other => throw new IllegalArgumentException(s"bad closed: $other")
  }
}
