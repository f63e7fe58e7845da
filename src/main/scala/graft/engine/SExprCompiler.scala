package graft.engine

import graft.core.SExpr
import graft.core.SExpr._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compile s-expression ASTs to Spark Column trees.
  *
  * Every primitive of the reference language (lakota/sexpr.py:261-283,
  * utils.py:232-270) maps to an existing codegen'd Spark function — no
  * custom Catalyst Expressions needed. Aggregate detection mirrors
  * `AST.is_aggregate` and decides select vs groupBy.agg in
  * [[Ops.reduce]].
  */
object SExprCompiler {

  val aggOps: Set[String] =
    Set("min", "max", "sum", "mean", "average", "first", "last",
      "count", "len", "quantile")

  /** User extension point (the reference lets callers inject functions
    * into the eval env, lakota/frame.py:51): register a Scala function
    * under a name usable from s-expressions. */
  private val custom =
    scala.collection.concurrent.TrieMap.empty[String, Seq[Column] => Column]

  def register(name: String, fn: Seq[Column] => Column): Unit =
    custom.put(name, fn)

  def isAggregate(src: String): Boolean =
    SExpr.isAggregate(SExpr.parse(src), aggOps)

  /** Row-ordering context for order-sensitive aggregates: inside
    * [[withOrdering]], `(first x)`/`(last x)` compile to
    * `min_by(x, ord)`/`max_by(x, ord)` — deterministic under shuffle,
    * matching the reference's frame-order semantics (frames are sorted
    * by index; SURVEY §7.4-5). Plain `first()`/`last()` would return an
    * arbitrary partition's row once a grouped aggregate crosses a real
    * exchange. */
  private val orderCtx =
    new scala.util.DynamicVariable[Option[Column]](None)

  def withOrdering[T](idx: Seq[Column])(body: => T): T =
    orderCtx.withValue(
      if (idx.isEmpty) None else Some(struct(idx: _*)))(body)

  def compile(src: String): Column = compile(SExpr.parse(src))

  /** extract alias if the root call is (as expr "name") */
  def compileAliased(src: String): (Column, Option[String]) =
    SExpr.parse(src) match {
      case SCall("as", List(e, SStr(name))) => (compile(e), Some(name))
      case SCall("as", List(e, SRef(name))) => (compile(e), Some(name))
      case e => (compile(e), None)
    }

  def compile(e: SExpr): Column = e match {
    case SInt(v)   => lit(v)
    case SFloat(v) => lit(v)
    case SStr(v)   => lit(v)
    case SBool(v)  => lit(v)
    case SRef(path) =>
      if (path.startsWith("self.")) col(path.stripPrefix("self."))
      else col(path)
    case SCall(op, args) => call(op, args)
  }

  private def num(args: List[SExpr]): List[Column] = args.map(compile)

  private def variadic(args: List[SExpr], f: (Column, Column) => Column)
      : Column = {
    require(args.nonEmpty, "variadic operator needs at least one arg")
    num(args).reduceLeft(f)
  }

  private def call(op: String, args: List[SExpr]): Column = op match {
    // arithmetic (variadic reduce, reference sexpr.py:264-268)
    case "+" => variadic(args, _ + _)
    case "-" => if (args.length == 1) -compile(args.head)
                else variadic(args, _ - _)
    case "*" => variadic(args, _ * _)
    case "/" => variadic(args, _ / _)
    case "%" => variadic(args, _ % _)
    // comparisons
    case "<"  => variadic(args, _ < _)
    case "<=" => variadic(args, _ <= _)
    case "="  => variadic(args, _ === _)
    case "!=" => variadic(args, _ =!= _)
    case ">=" => variadic(args, _ >= _)
    case ">"  => variadic(args, _ > _)
    // boolean
    case "and" | "logical_and" => variadic(args, _ && _)
    case "or" | "logical_or" => variadic(args, _ || _)
    case "~" | "not" | "logical_not" => !compile(args.head)
    case "in" | "isin" =>
      val target = compile(args.head)
      // (in x (list a b c)) and variadic (in x a b c) both accepted
      val cands = args.tail.flatMap {
        case SCall("list", items) => items
        case a => List(a)
      }
      // empty candidate set: nothing matches (not a crash)
      cands.map(a => target === compile(a))
        .reduceLeftOption[Column](_ || _).getOrElse(lit(false))
    // numpy array constructors the reference tests exercise
    // (tests/sexpr_test.py:43, 51-55): columns ARE arrays here, so
    // asarray is identity; unique's return_index/return_counts kwarg
    // forms return numpy tuples (not columns) and stay scoped out
    case "asarray" => compile(args.head)
    case "unique" => args match {
      case List(e) => array_distinct(compile(e))
      case _ => throw new IllegalArgumentException(
        "(unique arr) — the return_index/return_counts forms return " +
        "numpy tuples, not columns; use reduce aggregates instead")
    }
    // container literals (reference sexpr.py:279-282)
    case "list" => array(num(args): _*)
    case "dict" =>
      require(args.length % 2 == 0, "(dict k v k v ...)")
      map(num(args): _*)
    case "kw" =>
      throw new IllegalArgumentException(
        "(kw ...) is only valid as an argument of a call")
    // alias
    case "as" => args match {
      case List(e, SStr(name)) => compile(e).as(name)
      case List(e, SRef(name)) => compile(e).as(name)
      case _ => throw new IllegalArgumentException("(as expr 'name')")
    }
    // datetime (reference utils.py:232-270); one-arg form is plain
    // numeric floor, the companion of the supported (ceil x)
    case "floor" => args match {
      case List(e, SStr(unit)) => date_trunc(truncUnit(unit), compile(e))
      case List(e) => floor(compile(e))
      case _ => throw new IllegalArgumentException(
        "(floor ts 'unit') or (floor x)")
    }
    case "as-tz" | "as_tz" => args match {
      case List(e, SStr(zone)) => from_utc_timestamp(compile(e), zone)
      case _ => throw new IllegalArgumentException("(as-tz ts 'zone')")
    }
    case "day_of_week_num" => dayofweek(compile(args.head)) - lit(1)
    // date-range generation (reference utils.py:104-108 drange):
    // (drange '2020-01-01' '2020-01-05' 'D') -> array of timestamps,
    // right-open like numpy.arange
    case "drange" => args match {
      case List(a, b, SStr(unit)) =>
        val lo = compile(a).cast("timestamp")
        val hi = compile(b).cast("timestamp")
        val step = unit match {
          case "s" => expr("interval 1 second")
          case "m" => expr("interval 1 minute")
          case "h" => expr("interval 1 hour")
          case "D" => expr("interval 1 day")
          case "W" => expr("interval 7 days")
          case "M" => expr("interval 1 month")
          case "Y" => expr("interval 1 year")
          case other => throw new IllegalArgumentException(
            s"unknown drange unit: $other")
        }
        // sequence() is closed on both ends; drop the end bound when it
        // falls exactly on the grid to match arange's right-open range
        filter(sequence(lo, hi, step), t => t < hi)
      case _ => throw new IllegalArgumentException(
        "(drange start stop 'unit')")
    }
    // aggregates (reference sexpr.py:169-224)
    case "min" => min(compile(args.head))
    case "max" => max(compile(args.head))
    case "sum" => sum(compile(args.head))
    case "mean" | "average" => avg(compile(args.head))
    case "first" => orderCtx.value match {
      case Some(ord) => min_by(compile(args.head), ord)
      case None      => first(compile(args.head))
    }
    case "last" => orderCtx.value match {
      case Some(ord) => max_by(compile(args.head), ord)
      case None      => last(compile(args.head))
    }
    case "count" | "len" => count(compile(args.head))
    case "quantile" =>
      val (kws, plain) = splitKw(args)
      val interp = kws.get("interpolation") match {
        case Some(SStr(s)) => s
        case Some(other) => throw new IllegalArgumentException(
          s"interpolation must be a string, got $other")
        case None => "linear"
      }
      val (e, q) = plain match {
        case List(e0, q0) => (compile(e0), compile(q0))
        case List(e0)     => (compile(e0), lit(0.5))
        case _ => throw new IllegalArgumentException("(quantile col q [kw])")
      }
      quantileInterp(e, q, interp)
    // common scalar functions (numpy-by-name coverage for the names
    // the reference itself exercises; sexpr.py:153-161)
    case "abs" => abs(compile(args.head))
    case "round" => args match {
      case List(e) => round(compile(e))
      case List(e, SInt(n)) => round(compile(e), n.toInt)
      case _ => throw new IllegalArgumentException("(round col [n])")
    }
    case "sqrt" => sqrt(compile(args.head))
    case "exp" => exp(compile(args.head))
    case "log" => log(compile(args.head))
    case "ceil" => ceil(compile(args.head))
    // trig / transcendental (numpy names; all codegen'd Spark builtins)
    case "sin" => sin(compile(args.head))
    case "cos" => cos(compile(args.head))
    case "tan" => tan(compile(args.head))
    case "arcsin" => asin(compile(args.head))
    case "arccos" => acos(compile(args.head))
    case "arctan" => atan(compile(args.head))
    case "arctan2" => atan2(compile(args.head), compile(args(1)))
    case "log10" => log10(compile(args.head))
    case "log2" => log2(compile(args.head))
    case "log1p" => log1p(compile(args.head))
    case "expm1" => expm1(compile(args.head))
    case "sign" => signum(compile(args.head))
    case "power" => pow(compile(args.head), compile(args(1)))
    // numpy clip(x, lo, hi); numpy propagates NaN, and so do
    // least/greatest chains over double NaN in ANSI-off Spark? No —
    // Spark's least/greatest SKIP nulls but order NaN largest, so
    // clip(NaN, lo, hi) = hi, not NaN. Exact doubles otherwise.
    case "clip" => args match {
      case List(e, lo, hi) =>
        least(greatest(compile(e), compile(lo)), compile(hi))
      case _ => throw new IllegalArgumentException("(clip x lo hi)")
    }
    // elementwise two-arg min/max (numpy minimum/maximum)
    case "minimum" => least(compile(args.head), compile(args(1)))
    case "maximum" => greatest(compile(args.head), compile(args(1)))
    // numpy fmod: result takes the DIVIDEND's sign — Spark's % does too
    case "fmod" => compile(args.head) % compile(args(1))
    case "isnan" => isnan(compile(args.head))
    case "char.lower" | "lower" => lower(compile(args.head))
    case "char.upper" | "upper" => upper(compile(args.head))
    case "char.strip" | "strip" => trim(compile(args.head))
    case "startswith" =>
      compile(args.head).startsWith(compile(args(1)))
    case "endswith" =>
      compile(args.head).endsWith(compile(args(1)))
    case "coalesce" => coalesce(num(args): _*)
    case "where" | "if" => args match {
      case List(c, t, f) => when(compile(c), compile(t))
        .otherwise(compile(f))
      case _ => throw new IllegalArgumentException("(where cond then else)")
    }
    // human-format numbers 1234 -> "1.2k" (display helper, reference
    // lakota/utils.py:136-145)
    case "pretty_nb" =>
      val c = compile(args.head).cast("double")
      when(abs(c) >= 1e9, concat(round(c / 1e9, 1).cast("string"), lit("G")))
        .when(abs(c) >= 1e6, concat(round(c / 1e6, 1).cast("string"), lit("M")))
        .when(abs(c) >= 1e3, concat(round(c / 1e3, 1).cast("string"), lit("k")))
        .otherwise(c.cast("string"))
    case other if custom.contains(other) =>
      custom(other)(args.map(compile))
    case other =>
      // the reference resolves any name against live numpy at eval
      // time (lakota/sexpr.py:153-161) — deliberately not reproduced
      // (unrestricted dispatch, un-analyzable by Catalyst); the error
      // must route a porting user to the policy, not read as a bug
      throw new IllegalArgumentException(
        s"unknown s-expr operator: $other — graft keeps a curated " +
        "function registry instead of the reference's dynamic " +
        "numpy-by-name dispatch; add it with SExprCompiler" +
        s""".register("$other", ...) (see MIGRATION.md """ +
        "'S-expression functions: dynamic numpy dispatch')")
  }

  /** split `(kw 'name' value …)` arguments out of a call's argument
    * list (reference sexpr.py:66-72, 314-324 KWargs). */
  private def splitKw(args: List[SExpr])
      : (Map[String, SExpr], List[SExpr]) = {
    val (kwCalls, plain) = args.partition {
      case SCall("kw", _) => true
      case _ => false
    }
    val kws = kwCalls.collect { case SCall(_, items) =>
      items.grouped(2).map {
        case List(SStr(k), v) => k -> v
        case List(SRef(k), v) => k -> v
        case other => throw new IllegalArgumentException(
          s"(kw ...) expects name/value pairs, got $other")
      }.toList
    }.flatten.toMap
    (kws, plain)
  }

  /** numpy-style quantile interpolation modes. `linear` (the default)
    * uses Spark's native exact percentile (partial-aggregable); the
    * element-selecting modes sort the group's values — exact but
    * memory-bound by group size, matching numpy semantics. */
  private def quantileInterp(c: Column, q: Column, interp: String)
      : Column = {
    if (interp == "linear") return percentile(c, q)
    val arr = sort_array(collect_list(c))
    val n = size(arr).cast("double")
    val pos = q * (n - lit(1.0))
    val lo = floor(pos).cast("int") + lit(1)
    val hi = ceil(pos).cast("int") + lit(1)
    interp match {
      case "lower"   => element_at(arr, lo)
      case "higher"  => element_at(arr, hi)
      // bround = round-half-even, matching numpy's np.around at exact
      // .5 positions (Spark round() is HALF_UP and diverges there)
      case "nearest" => element_at(arr, bround(pos).cast("int") + lit(1))
      case "midpoint" =>
        (element_at(arr, lo) + element_at(arr, hi)) / lit(2.0)
      case other => throw new IllegalArgumentException(
        s"unknown interpolation: $other")
    }
  }

  private def truncUnit(u: String): String = u match {
    case "Y" => "year"
    case "M" => "month"
    case "W" => "week"
    case "D" => "day"
    case "h" => "hour"
    case "m" => "minute"
    case "s" => "second"
    case other => other // allow spark-native unit names
  }
}
