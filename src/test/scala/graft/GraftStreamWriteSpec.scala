package graft

import graft.api._
import graft.core._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** `writeStream.format("graft")` — the native streaming sink: one
  * engine revision per micro-batch, per-query epoch markers for
  * replay-safe restarts, complete-mode truncation. */
class GraftStreamWriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fresh(): (String, Series) = {
    val root = Files.createTempDirectory("graft-sw").toString
    val repo = new Repo(root, spark)
    val schema = GSchema("ts" -> "int*", "v" -> "float")
    (root, repo.createCollection(schema, "c").series("_"))
  }

  test("each micro-batch commits one revision; restart replays none") {
    val (root, sr) = fresh()
    val ckpt = Files.createTempDirectory("graft-sw-ck").toString
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Double)]

    def start() = mem.toDF().toDF("ts", "v")
      .writeStream.format("graft")
      .option("path", root).option("collection", "c")
      .option("series", "_")
      .option("checkpointLocation", ckpt)
      .start()

    val q = start()
    try {
      mem.addData((0L, 1.0), (1L, 2.0))
      q.processAllAvailable()
      assert(sr.frame().count() == 2L)
      val revs1 = sr.collection.changelog.log().length
      mem.addData((2L, 3.0), (3L, 4.0))
      q.processAllAvailable()
      sr.collection.refresh()
      assert(sr.frame().count() == 4L)
      assert(sr.collection.changelog.log().length == revs1 + 1,
        "one revision per micro-batch")
    } finally q.stop()

    // restart on the same checkpoint: nothing replays, appends resume
    val q2 = start()
    try {
      q2.processAllAvailable()
      sr.collection.refresh()
      assert(sr.frame().count() == 4L, "restart must not duplicate")
      mem.addData((4L, 5.0))
      q2.processAllAvailable()
      sr.collection.refresh()
      assert(sr.frame().count() == 5L)
      assert(sr.frame().orderBy("ts").collect().map(_.getDouble(1))
        .toSeq == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    } finally q2.stop()

    // the epoch marker ledger keeps only the latest epoch
    val store = sr.collection.repo.store
    val markers = store.walk("streams")
    assert(markers.length == 1, s"markers: $markers")
  }

  test("crash between engine commit and marker: replayed epoch " +
      "dedups (exactly-once visible state)") {
    // THE vulnerable window in GraftStreamingWrite.commit: the engine
    // revision landed, then the process died before the marker write
    // — which also means Spark never wrote its commit-log entry for
    // the batch (the sink commit hadn't returned). Simulate exactly
    // that: drop the epoch marker AND the checkpoint's commits/0
    // entry, restart on the same checkpoint, and let Spark REPLAY
    // epoch 0 for real. The replayed commit must not duplicate rows:
    // identical re-staged content hits the changelog's double-write
    // skip (or, if the replan staged different file boundaries, lands
    // as an idempotent overlay of the same index range) — either way
    // the visible state is exactly-once.
    val (root, sr) = fresh()
    val ckpt = Files.createTempDirectory("graft-sw-ck3").toString
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Double)]
    def start() = mem.toDF().toDF("ts", "v")
      .writeStream.format("graft")
      .option("path", root).option("collection", "c")
      .option("series", "_").option("checkpointLocation", ckpt)
      .start()
    val q = start()
    try {
      mem.addData((0L, 1.0), (1L, 2.0))
      q.processAllAvailable()
    } finally q.stop()
    sr.collection.refresh()
    assert(sr.frame().count() == 2L)
    val revs = sr.collection.changelog.log().length
    val store = sr.collection.repo.store
    val marker = store.walk("streams").find(_.endsWith("/e0"))
    assert(marker.isDefined, store.walk("streams").toString)
    store.rm(marker.get)
    val commitLog = new java.io.File(s"$ckpt/commits/0")
    assert(commitLog.exists(), "expected spark commit log for batch 0")
    assert(commitLog.delete())
    // the checkpoint FS writes CRC sidecars; leaving .0.crc behind
    // makes the replayed commit-log rename fail spuriously
    new java.io.File(s"$ckpt/commits/.0.crc").delete()
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    sr.collection.refresh()
    val got = sr.frame().orderBy("ts").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((0L, 1.0), (1L, 2.0)),
      s"replayed epoch duplicated or corrupted rows: $got")
    val revsAfter = sr.collection.changelog.log().length
    assert(revsAfter <= revs + 1,
      s"replay added ${revsAfter - revs} revisions, expected <=1")
    assert(store.walk("streams").exists(_.endsWith("/e0")),
      "marker must be restored by the replayed commit")
  }

  test("replayed epoch is skipped via the marker (direct probe)") {
    val (root, sr) = fresh()
    val ckpt = Files.createTempDirectory("graft-sw-ck2").toString
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, Double)]
    val q = mem.toDF().toDF("ts", "v").writeStream.format("graft")
      .option("path", root).option("collection", "c")
      .option("series", "_").option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData((10L, 1.5))
      q.processAllAvailable()
    } finally q.stop()
    sr.collection.refresh()
    assert(sr.frame().count() == 1L)
    // the marker for epoch 0 exists; a hypothetical replay of the
    // same epoch would hit the exists() guard in
    // GraftStreamingWrite.commit
    val store = sr.collection.repo.store
    assert(store.walk("streams").exists(_.endsWith("/e0")),
      store.walk("streams").toString)
  }
}
