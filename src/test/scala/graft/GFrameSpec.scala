package graft

import graft.api.{GFrame, Repo}
import graft.core.{Closed, GSchema}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Reference Frame-API parity (lakota/frame.py + tests/frame_test.py)
  * for the GFrame wrapper: mask, reduce with/without aggregates,
  * slice_index closed algebra, positional slice, concat, start/stop.
  */
class GFrameSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val schema = GSchema("timestamp" -> "int*", "value" -> "float")

  def fixture(): GFrame = {
    val repo = new Repo(
      Files.createTempDirectory("graft-gf").toString, spark)
    val s = repo.createCollection(schema, "c").series("_")
    s.write(TestSpark.frame(1L to 8L, Seq(1.0, 2.0, 3.0, 4.0,
      5.0, 6.0, 7.0, 8.0)))
    s.gframe()
  }

  test("mask filters by s-expression") {
    val got = fixture().mask("(= (% self.timestamp 2) 0)")
      .df.select("timestamp").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(2L, 4L, 6L, 8L)))
  }

  test("reduce without aggregates is a projection, not a distinct") {
    // reference test_reduce_without_agg: row count unchanged
    val f = fixture().reduce("m" -> "(% self.timestamp 3)")
    assert(f.length == 8L)
    val mapped = f.df.collect().map(_.getLong(0)).sorted
    assert(mapped.sameElements(Array(0L, 0L, 1L, 1L, 1L, 2L, 2L, 2L)))
  }

  test("reduce with aggregates groups") {
    val rows = fixture()
      .reduce("even" -> "(= (% self.timestamp 2) 0)",
        "total" -> "(sum self.value)")
      .df.collect()
      .map(r => (r.getBoolean(0), r.getDouble(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((false, 16.0), (true, 20.0)))
  }

  test("slice_index honours closed bounds") {
    def ids(c: Closed): Seq[Long] = fixture()
      .sliceIndex(3L, 6L, c).df.select("timestamp")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(Closed.Both) == Seq(3L, 4L, 5L, 6L))
    assert(ids(Closed.Left) == Seq(3L, 4L, 5L))
    assert(ids(Closed.Right) == Seq(4L, 5L, 6L))
    assert(ids(Closed.None_) == Seq(4L, 5L))
  }

  test("positional slice, concat, start/stop, empty") {
    val f = fixture()
    val page = f.slice(2, 5).df.select("timestamp")
      .collect().map(_.getLong(0)).toSeq
    assert(page == Seq(3L, 4L, 5L))
    val two = f.mask("(< self.timestamp 2)")
      .concat(f.mask("(> self.timestamp 7)"))
    assert(two.length == 2L)
    assert(f.start().get == Seq(1L) && f.stop().get == Seq(8L))
    assert(f.mask("(> self.timestamp 99)").empty)
    val renamed = f.rename("value" -> "v").select("v")
    assert(renamed.df.columns.toSeq == Seq("v"))
  }

  test("positional slice rejects out-of-range bounds instead of wrapping") {
    val f = fixture()
    // Spark offset/limit are Int-bounded: past 2^31 a silent .toInt
    // wrap would mangle exactly the huge series this API targets
    intercept[IllegalArgumentException] { f.slice(-1, 2) }
    intercept[IllegalArgumentException] { f.slice(5, 2) }
    intercept[IllegalArgumentException] {
      f.slice(0, Int.MaxValue.toLong + 1)
    }
  }

  test("fractional double bounds are sub-second on timestamp indexes") {
    import graft.core.GType
    import graft.engine.SparkVals
    // epoch seconds 1.5 → 1_500_000 µs; whole doubles stay aligned
    // with the Long path (seconds → micros)
    assert(SparkVals.parseBound(GType.TimestampT, 1.5) == 1500000L)
    assert(SparkVals.parseBound(GType.TimestampT, 2.0) ==
      SparkVals.parseBound(GType.TimestampT, 2L))
    // integral indexes still reject fractional bounds loudly
    intercept[IllegalArgumentException] {
      SparkVals.parseBound(GType.IntT, 1.5)
    }
  }
}
