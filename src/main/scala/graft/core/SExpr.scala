package graft.core

/** s-expression AST + parser for the engine's query language.
  *
  * Grammar ported behaviorally from the reference
  * (lakota/sexpr.py:237-305): `(op arg …)` calls, quoted strings
  * (single or double), numeric/boolean literals, dotted references
  * (`self.value` = frame column). Evaluation lives in the Spark layer
  * (graft.engine.SExprCompiler).
  */
sealed trait SExpr
object SExpr {
  final case class SCall(op: String, args: List[SExpr]) extends SExpr
  final case class SInt(v: Long) extends SExpr
  final case class SFloat(v: Double) extends SExpr
  final case class SStr(v: String) extends SExpr
  final case class SBool(v: Boolean) extends SExpr
  final case class SRef(path: String) extends SExpr

  def parse(input: String): SExpr = {
    val toks = tokenize(input)
    if (toks.isEmpty)
      throw new IllegalArgumentException("empty expression")
    val (expr, rest) = parseOne(toks)
    if (rest.nonEmpty)
      throw new IllegalArgumentException(
        s"unexpected trailing tokens: ${rest.mkString(" ")}")
    expr
  }

  private sealed trait Tok
  private case object LParen extends Tok
  private case object RParen extends Tok
  private final case class Atom(s: String) extends Tok
  private final case class Quoted(s: String) extends Tok

  private def tokenize(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer[Tok]()
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += LParen; i += 1 }
      else if (c == ')') { out += RParen; i += 1 }
      else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < n && s(i) != quote) {
          if (s(i) == '\\' && i + 1 < n) { sb.append(s(i + 1)); i += 2 }
          else { sb.append(s(i)); i += 1 }
        }
        if (i >= n) throw new IllegalArgumentException(
          s"unterminated string in: $s")
        i += 1
        out += Quoted(sb.toString)
      } else {
        val sb = new StringBuilder
        while (i < n && !s(i).isWhitespace && s(i) != '(' && s(i) != ')') {
          sb.append(s(i)); i += 1
        }
        out += Atom(sb.toString)
      }
    }
    out.toList
  }

  private def parseOne(toks: List[Tok]): (SExpr, List[Tok]) = toks match {
    case Nil => throw new IllegalArgumentException("unexpected end")
    case LParen :: rest =>
      val (op, rest1) = rest match {
        case Atom(a) :: r  => (a, r)
        case Quoted(q) :: r => (q, r)
        case LParen :: _ =>
          throw new IllegalArgumentException("operator must be an atom")
        case RParen :: _ =>
          throw new IllegalArgumentException("empty call")
        case Nil => throw new IllegalArgumentException("unexpected end")
      }
      var args = List.newBuilder[SExpr]
      var cur = rest1
      while (cur.headOption.exists(_ != RParen)) {
        val (a, nxt) = parseOne(cur)
        args += a
        cur = nxt
      }
      cur match {
        case RParen :: tail => (SCall(op, args.result()), tail)
        case _ => throw new IllegalArgumentException(s"missing ) in call $op")
      }
    case RParen :: _ =>
      throw new IllegalArgumentException("unexpected )")
    case Atom(a) :: rest => (atom(a), rest)
    case Quoted(q) :: rest => (SStr(q), rest)
  }

  private def atom(a: String): SExpr = a match {
    case "true"  => SBool(true)
    case "false" => SBool(false)
    case _ =>
      if (a.nonEmpty && (a(0).isDigit ||
          (a.length > 1 && (a(0) == '-' || a(0) == '+') && a(1).isDigit))) {
        // digit-leading but non-numeric atoms (e.g. an unquoted
        // 2020-01-01) must fail with the parser's own error contract,
        // not a raw NumberFormatException
        try {
          if (a.contains('.') || a.contains('e') || a.contains('E'))
            SFloat(a.toDouble)
          else
            try SInt(a.toLong) catch { case _: NumberFormatException =>
              SFloat(a.toDouble) }
        } catch { case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"invalid numeric atom: '$a' (quote strings: '$a')")
        }
      } else SRef(a)
  }

  /** Does the expression contain an aggregate call?
    * (reference lakota/sexpr.py:326-330) */
  def isAggregate(e: SExpr, aggOps: Set[String]): Boolean = e match {
    case SCall(op, args) =>
      aggOps.contains(op) || args.exists(isAggregate(_, aggOps))
    case _ => false
  }
}
