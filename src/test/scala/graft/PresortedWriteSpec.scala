package graft

import graft.api._
import graft.core._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The presorted bulk-write contract: `write(df, presorted = true)`
  * skips the range sample + shuffle + sort (the reference's own
  * precondition — lakota raises on unsorted frames) but VERIFIES the
  * declaration: per-row order in every task, file-range disjointness
  * at seal. A wrong declaration must abort loudly before anything
  * commits; a right one must be byte-for-byte equivalent to the
  * auto-sorted write (same content digests → shared segments).
  */
class PresortedWriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshRepo(): Repo =
    new Repo(Files.createTempDirectory("graft-presort").toString, spark)

  /** pin the DISTRIBUTED write path: the driver-tier small-write
    * fast path (spark.graft.driverWriteRows) would otherwise absorb
    * these sub-segment frames and verify on the driver instead */
  private def distributedOnly[T](body: => T): T = {
    spark.conf.set("spark.graft.driverWriteRows", "0")
    try body
    finally spark.conf.unset("spark.graft.driverWriteRows")
  }

  private val schema = GSchema("ts" -> "int*", "value" -> "float")

  // 40k rows over 4 partitions: range partitions are contiguous, so
  // the frame is globally sorted with disjoint per-partition ranges —
  // and big enough to bypass the driver-local small-write probe.
  private def sortedFrame() = {
    import spark.implicits._
    val _ = spark // touch lazy init
    spark.range(0, 40000, 1, 4)
      .select($"id".as("ts"), sin($"id".cast("double")).as("value"))
  }

  test("presorted write round-trips and matches the sorted write") {
    distributedOnly {
    val repo = freshRepo()
    val a = repo.createCollection(schema, "a").series("_")
    a.write(sortedFrame(), presorted = true)
    assert(a.frame().count() == 40000L)
    val got = a.frame(1000L, 1004L, closed = Closed.Both)
      .select("ts").collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1000L, 1001L, 1002L, 1003L, 1004L))

    // identical content + identical splits → identical per-file
    // digests, so a second presorted write of the same frame dedupes
    // against the first write's segment files in the store
    val b = repo.createCollection(schema, "b").series("_")
    b.write(sortedFrame(), presorted = true)
    val filesA = a.segments().flatMap(_.meta.files).toSet
    val filesB = b.segments().flatMap(_.meta.files).toSet
    assert(filesA == filesB,
      s"identical presorted writes should share content-addressed " +
        s"segments:\n$filesA\nvs\n$filesB")

    // the auto-sort path must agree on CONTENT (file splits may
    // differ, so addresses may differ — the digest is per file)
    val c = repo.createCollection(schema, "cc").series("_")
    c.write(sortedFrame())
    val av = a.frame()
    val cv = c.frame()
    assert(av.exceptAll(cv).isEmpty && cv.exceptAll(av).isEmpty)
    }
  }

  test("unsorted rows inside a partition fail loudly") {
    val repo = freshRepo()
    val s = repo.createCollection(schema, "bad1").series("_")
    import spark.implicits._
    // descending ts within each partition
    val df = spark.range(0, 40000, 1, 2)
      .select((lit(50000L) - $"id").as("ts"),
        lit(1.0).as("value"))
    val e = intercept[org.apache.spark.SparkException] {
      distributedOnly { s.write(df, presorted = true) }
    }
    assert(e.getMessage.contains("unsorted") ||
      Option(e.getCause).exists(_.getMessage.contains("unsorted")))
    assert(s.collection.manifest().isEmpty ||
      s.segments().isEmpty) // nothing committed
  }

  test("driver-tier small write verifies the presorted declaration") {
    val repo = freshRepo()
    val s = repo.createCollection(schema, "bad3").series("_")
    import spark.implicits._
    val df = spark.range(0, 40000, 1, 2)
      .select((lit(50000L) - $"id").as("ts"), lit(1.0).as("value"))
    // same unsorted frame, driver tier enabled (the default): the
    // declaration must still be rejected, just without a Spark job
    val e = intercept[IllegalArgumentException] {
      s.write(df, presorted = true)
    }
    assert(e.getMessage.contains("unsorted"))
    assert(s.collection.manifest().isEmpty || s.segments().isEmpty)
    // and a correct declaration round-trips through the driver tier's
    // parallel chunk files (40k rows / 32k-row chunks = 2)
    s.write(sortedFrame(), presorted = true)
    assert(s.frame().count() == 40000L)
    val segs = s.segments()
    assert(segs.nonEmpty && segs.forall(_.meta.files.length == 1))
    assert(segs.map(_.meta.length).sum == 40000L)
  }

  test("overlapping partition ranges fail loudly at seal") {
    val repo = freshRepo()
    val s = repo.createCollection(schema, "bad2").series("_")
    import spark.implicits._
    // each partition is internally sorted 0..19999, but both cover
    // the SAME key range → disjointness check must reject
    val df = spark.range(0, 40000, 1, 2)
      .select(($"id" % 20000L).as("ts"), lit(1.0).as("value"))
    val e = intercept[IllegalArgumentException] {
      distributedOnly { s.write(df, presorted = true) }
    }
    assert(e.getMessage.contains("overlapping"))
    assert(s.collection.manifest().isEmpty || s.segments().isEmpty)
  }

  test("kv upsert ignores the presorted flag and still merges") {
    val repo = freshRepo()
    val c = repo.createCollection(
      GSchema(Seq(ColDef("ts", GType.IntT, idx = true),
        ColDef("value", GType.FloatT, idx = false)), kv = true), "kv")
    val s = c.series("_")
    import spark.implicits._
    s.write(Seq((1L, 1.0), (2L, 2.0)).toDF("ts", "value"))
    s.write(Seq((2L, 20.0), (3L, 3.0)).toDF("ts", "value"))
    val got = s.frame().collect().map(r => (r.getLong(0), r.getDouble(1)))
      .toSeq.sorted
    assert(got == Seq((1L, 1.0), (2L, 20.0), (3L, 3.0)))
  }
}
