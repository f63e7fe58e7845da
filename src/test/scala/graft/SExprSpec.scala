package graft

import graft.core.SExpr
import graft.engine.{Ops, SExprCompiler}
import org.scalatest.funsuite.AnyFunSuite

/** s-expression parser + compiler semantics, mirroring the reference
  * corpus (tests/sexpr_test.py, tests/frame_test.py mask/reduce).
  */
class SExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def df = {
    val s = spark
    import s.implicits._
    Seq((1L, 1.1, "ham"), (2L, 2.2, "spam"), (3L, 3.3, "ham"),
      (4L, 4.4, "spam")).toDF("x", "v", "cat")
  }

  test("parser: literals, calls, refs, strings") {
    import SExpr._
    assert(parse("42") == SInt(42))
    assert(parse("4.2") == SFloat(4.2))
    assert(parse("true") == SBool(true))
    assert(parse("'hello world'") == SStr("hello world"))
    assert(parse("self.x") == SRef("self.x"))
    assert(parse("(+ 1 2 3)") == SCall("+", List(SInt(1), SInt(2),
      SInt(3))))
    assert(parse("(floor self.ts 'M')") ==
      SCall("floor", List(SRef("self.ts"), SStr("M"))))
    intercept[IllegalArgumentException](parse("(+ 1"))
    intercept[IllegalArgumentException](parse(")"))
    intercept[IllegalArgumentException](parse(""))
  }

  test("aggregate detection") {
    assert(SExprCompiler.isAggregate("(max self.v)"))
    assert(SExprCompiler.isAggregate("(+ (sum self.v) 1)"))
    assert(!SExprCompiler.isAggregate("(+ self.v 1)"))
  }

  test("mask with modulo (reference frame_test mask example)") {
    val out = Ops.mask(df, "(= (% self.x 2) 0)")
      .select("x").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(2L, 4L))
  }

  test("variadic arithmetic and comparisons") {
    val out = Ops.mask(df, "(and (> self.v 1.5) (< self.x 4))")
      .select("x").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(2L, 3L))
    val neg = Ops.mask(df, "(~ (in self.cat 'spam'))")
      .select("x").collect().map(_.getLong(0)).sorted.toSeq
    assert(neg == Seq(1L, 3L))
  }

  test("reduce: grouped aggregates, every reference aggregate") {
    val out = Ops.reduce(df, Seq(
      "cat" -> "self.cat",
      "mx" -> "(max self.v)",
      "mn" -> "(min self.v)",
      "sm" -> "(sum self.v)",
      "avg" -> "(mean self.v)",
      "cnt" -> "(count self.v)"))
      .orderBy("cat").collect()
    assert(out.length == 2)
    val ham = out(0)
    assert(ham.getString(0) == "ham")
    assert(ham.getDouble(1) == 3.3 && ham.getDouble(2) == 1.1)
    assert(math.abs(ham.getDouble(3) - 4.4) < 1e-9)
    assert(ham.getLong(5) == 2L)
  }

  test("reduce without keys collapses to one row") {
    val out = Ops.reduce(df, Seq("total" -> "(sum self.v)",
      "q" -> "(quantile self.v 0.5)"))
    val r = out.collect()(0)
    assert(math.abs(r.getDouble(0) - 11.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - 2.75) < 1e-9)
  }

  test("custom function registration") {
    SExprCompiler.register("double_it", cols => cols.head * 2)
    val out = Ops.reduce(df, Seq("x" -> "self.x",
      "d" -> "(double_it self.v)")).orderBy("x").collect()
    assert(math.abs(out(0).getDouble(1) - 2.2) < 1e-9)
  }

  test("pretty_nb formatting") {
    val s = spark
    import s.implicits._
    val d = Seq(950.0, 1234.0, 2500000.0).toDF("n")
    val out = d.select(SExprCompiler.compile("(pretty_nb self.n)")
      .as("p")).collect().map(_.getString(0)).toSeq
    assert(out == Seq("950.0", "1.2k", "2.5M"))
  }

  test("numpy-named scalar functions match their JDK recomputes") {
    // the curated numpy-by-name surface (reference sexpr.py:153-161
    // dispatches arbitrary numpy names; here each name is an explicit
    // codegen'd builtin): every function checked against java.lang.Math
    // on the same doubles
    val exprs: Seq[(String, Double => Double)] = Seq(
      "sin" -> math.sin, "cos" -> math.cos, "tan" -> math.tan,
      "arctan" -> math.atan, "log10" -> (x => math.log10(x)),
      "log2" -> (x => math.log(x) / math.log(2.0)),
      "log1p" -> (x => math.log1p(x)), "expm1" -> (x => math.expm1(x)),
      "sign" -> (x => math.signum(x)), "sqrt" -> math.sqrt)
    for ((name, fn) <- exprs) {
      val got = Ops.reduce(df, Seq("x" -> "self.x",
        "y" -> s"($name self.v)"), Nil)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = df.collect()
        .map(r => r.getLong(0) -> fn(r.getDouble(1))).toMap
      want.foreach { case (k, v) =>
        assert(math.abs(got(k) - v) < 1e-12, s"$name($k)") }
    }
    // arcsin/arccos need inputs in [-1,1]
    val unit = Ops.reduce(df, Seq(
      "a" -> "(arcsin (/ self.v 10.0))",
      "b" -> "(arccos (/ self.v 10.0))",
      "c" -> "(arctan2 self.v self.x)",
      "p" -> "(power self.v 2.0)"), Nil).collect()
    df.collect().zip(unit.sortBy(_.getDouble(3))).foreach { case (r, u) =>
      val v = r.getDouble(1)
      assert(math.abs(u.getDouble(0) - math.asin(v / 10.0)) < 1e-12)
      assert(math.abs(u.getDouble(1) - math.acos(v / 10.0)) < 1e-12)
    }
    // clip / minimum / maximum / fmod / isnan
    val m = Ops.reduce(df, Seq(
      "cl" -> "(clip self.v 2.0 3.0)",
      "mn" -> "(minimum self.v 2.2)",
      "mx" -> "(maximum self.v 2.2)",
      "fm" -> "(fmod self.v 2.0)",
      "nn" -> "(isnan self.v)",
      "x" -> "self.x"), Nil)
      .collect().map(r => r.getLong(5) ->
        (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getBoolean(4))).toMap
    df.collect().foreach { r =>
      val (x, v) = (r.getLong(0), r.getDouble(1))
      val (cl, mn, mx, fm, nn) = m(x)
      assert(cl == math.min(3.0, math.max(2.0, v)))
      assert(mn == math.min(v, 2.2) && mx == math.max(v, 2.2))
      assert(math.abs(fm - (v % 2.0)) < 1e-12) // dividend-sign fmod
      assert(!nn)
    }
  }

  test("asarray/unique/logical_* forms from the reference sexpr tests") {
    val s = spark
    import s.implicits._
    // (asarray (list 1 2 3)) — tests/sexpr_test.py:43
    val arr = Ops.reduce(df, Seq("a" -> "(asarray (list 1 2 3))"), Nil)
      .collect().head.getSeq[Long](0)
    assert(arr == Seq(1L, 2L, 3L))
    // (unique arr) over an array column — tests/sexpr_test.py:51
    val u = Seq((Seq(1L, 2L, 1L, 2L), 1L)).toDF("arr", "k")
    val uq = Ops.reduce(u, Seq("u" -> "(unique self.arr)"), Nil)
      .collect().head.getSeq[Long](0).sorted
    assert(uq == Seq(1L, 2L))
    // kwarg forms return numpy tuples in the reference — scoped out
    intercept[IllegalArgumentException] {
      Ops.reduce(u, Seq("u" -> "(unique self.arr true)"), Nil).collect()
    }
    // logical_and/or aliases
    val la = Ops.mask(df,
      "(logical_and (> self.v 1.5) (logical_not (= self.x 4)))")
      .select("x").collect().map(_.getLong(0)).sorted.toSeq
    assert(la == Seq(2L, 3L))
  }

  test("alias via (as ...)") {
    val (c, alias) = SExprCompiler.compileAliased(
      "(as (sum self.v) 'total')")
    assert(alias.contains("total"))
    val _ = c
  }

  test("list / dict / in-list forms (reference sexpr_test examples)") {
    val s = spark
    import s.implicits._
    val d = Seq(("foo", 1), ("ham", 2), ("nope", 3)).toDF("w", "x")
    // (in "foo" (list "ham" "foo" "bar")) is trueish in the reference
    val hits = d.filter(SExprCompiler.compile(
      """(in self.w (list "ham" "foo" "bar"))"""))
      .collect().map(_.getString(0)).toSet
    assert(hits == Set("foo", "ham"))
    val arr = d.limit(1).select(SExprCompiler.compile("(list 1 2 3)")
      .as("a")).collect()(0).getSeq[Long](0)
    assert(arr == Seq(1L, 2L, 3L))
    val m = d.limit(1).select(SExprCompiler.compile(
      "(dict 'k1' 10 'k2' 20)").as("m")).collect()(0)
      .getMap[String, Long](0)
    assert(m == Map("k1" -> 10L, "k2" -> 20L))
  }

  test("drange generates right-open timestamp ranges") {
    val s = spark
    import s.implicits._
    val out = Seq(1).toDF("x").select(SExprCompiler.compile(
      "(drange '2020-01-01' '2020-01-04' 'D')").as("r"))
      .selectExpr("size(r) n", "cast(r[0] as string) first",
        "cast(r[2] as string) last")
      .collect()(0)
    assert(out.getInt(0) == 3) // right-open: 01, 02, 03
    assert(out.getString(1) == "2020-01-01 00:00:00")
    assert(out.getString(2) == "2020-01-03 00:00:00")
  }

  test("quantile with (kw 'interpolation' ...) modes") {
    val s = spark
    import s.implicits._
    val d = (1 to 10).map(_.toDouble).toDF("v") // quartiles at 3.25/7.75
    def q(expr: String): Double =
      d.agg(SExprCompiler.compile(expr).as("q")).collect()(0).getDouble(0)
    assert(math.abs(q("(quantile self.v 0.25)") - 3.25) < 1e-9)
    assert(q("(quantile self.v 0.25 (kw 'interpolation' 'lower'))") == 3.0)
    assert(q("(quantile self.v 0.25 (kw 'interpolation' 'higher'))") == 4.0)
    assert(q("(quantile self.v 0.25 (kw 'interpolation' 'nearest'))") == 3.0)
    assert(
      q("(quantile self.v 0.25 (kw 'interpolation' 'midpoint'))") == 3.5)
  }

  test("grouped first/last deterministic under shuffled partitioning") {
    val s = spark
    import s.implicits._
    val data = (1 to 400).map(i => (i % 7, i.toLong, i * 1.0))
    // arbitrary round-robin partitioning: plain first()/last() would
    // return whichever partition's row wins the race
    val base = data.toDF("g", "idx", "v").repartition(13)
    def run(orderKeys: Seq[String]) = Ops.reduce(base, Seq(
        "g" -> "self.g",
        "first_v" -> "(first self.v)",
        "last_v" -> "(last self.v)"), orderKeys)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)
    val expect = (0 until 7).map { g =>
      val is = (1 to 400).filter(_ % 7 == g)
      (g, is.min * 1.0, is.max * 1.0)
    }
    assert(run(Seq("idx")) == expect)
    // fallback ordering (all columns) is index order here too
    assert(run(Nil) == expect)
  }

  test("an exotic numpy name outside the curated registry fails LOUD " +
      "and the message routes to register() and MIGRATION.md") {
    // the reference would resolve this against live numpy
    // (lakota/sexpr.py:153-161); graft's deliberate policy deviation
    // must surface itself at first contact, not read as a bug
    val e = intercept[IllegalArgumentException] {
      SExprCompiler.compile("(char.swapcase self.name)")
    }
    assert(e.getMessage.contains("char.swapcase"))
    assert(e.getMessage.contains(
      """SExprCompiler.register("char.swapcase""""))
    assert(e.getMessage.contains("MIGRATION.md"))
    // ...and the hatch it points at actually closes the gap:
    // swapcase via per-char compare (no direct Spark builtin) —
    // escape hatches are ordinary Column expressions
    SExprCompiler.register("char.swapcase", cols => {
      import org.apache.spark.sql.functions._
      concat_ws("", transform(split(cols.head, ""), c =>
        when(c === upper(c), lower(c)).otherwise(upper(c))))
    })
    val s = TestSpark.spark
    import s.implicits._
    val got = Seq("aBc").toDF("name")
      .select(SExprCompiler.compile("(char.swapcase self.name)")
        .as("sw")).head.getString(0)
    assert(got == "AbC")
  }
}
