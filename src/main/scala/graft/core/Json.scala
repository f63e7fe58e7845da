package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node._
import scala.jdk.CollectionConverters._

/** Minimal JSON bridge over jackson-databind (ships with Spark).
  * Parses into plain Scala values: Map[String,Any] / List[Any] /
  * String / Long / Double / Boolean / null.
  */
object Json {
  private val mapper = new ObjectMapper()

  def parse(s: String): Any = fromNode(mapper.readTree(s))

  private def fromNode(n: JsonNode): Any = n match {
    case o: ObjectNode =>
      o.properties().asScala.map(e => e.getKey -> fromNode(e.getValue)).toMap
    case a: ArrayNode => a.elements().asScala.map(fromNode).toList
    case t: TextNode  => t.textValue()
    case b: BooleanNode => b.booleanValue()
    case _: NullNode  => null
    case num: NumericNode =>
      if (num.isIntegralNumber) num.longValue() else num.doubleValue()
    case other => other.asText()
  }

  def str(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append("\"").toString
  }

  /** Render a scalar kernel value (Long/Double/String/Boolean/null). */
  def scalar(v: Any): String = v match {
    case null       => "null"
    case s: String  => str(s)
    case d: Double  =>
      if (d.isNaN) "\"NaN\""
      else if (d.isPosInfinity) "\"Infinity\""
      else if (d.isNegInfinity) "\"-Infinity\""
      else d.toString
    case other      => other.toString
  }

  /** Inverse of [[scalar]] for doubles parsed from strings. */
  def toDouble(v: Any): Double = v match {
    case d: Double => d
    case l: Long   => l.toDouble
    case "NaN"     => Double.NaN
    case "Infinity" => Double.PositiveInfinity
    case "-Infinity" => Double.NegativeInfinity
    case s: String => s.toDouble
    case other => throw new IllegalArgumentException(s"not a double: $other")
  }
}
