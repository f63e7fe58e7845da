package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming queries with batch-checkable DuckDB oracles:
  * the stream runs over the events parquet with an AvailableNow
  * trigger into a memory sink, so the result is finite and exactly
  * reproducible — giving the driver hard correctness signal on the
  * streaming path (watermarked windowed aggregation and stateful
  * gap sessionization), not just ScalaTest coverage.
  */
object QueriesStream {

  /** raw streaming source over the events file, with ts already
    * normalized to UTC TimestampType (the on-disk encoding has varied
    * between NANOS-long and TIMESTAMP_NTZ across testdata drops —
    * Tables.normalizeTs absorbs both, for the stream exactly as for
    * the batch tables) */
  private def rawEvents(s: SparkSession, dir: String): DataFrame = {
    Tables.init(s)
    // schema inferred over the SAME glob the source streams, with
    // mergeSchema on: a dir mixing ts encodings (NANOS-long vs
    // NTZ-micros files) fails the merge loudly instead of silently
    // decoding every file with one random footer's encoding
    val schema = s.read.option("mergeSchema", "true")
      .parquet(s"$dir/events*.parquet").schema
    Tables.normalizeTs(
      StreamOps.eventStream(s, s"$dir/events*.parquet", schema), "ts")
  }

  /** drain `df` through a memory sink and return the sink table */
  private def drain(s: SparkSession, df: DataFrame, name: String,
      mode: String): DataFrame = {
    if (s.catalog.tableExists(name)) s.catalog.dropTempView(name)
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table(name)
  }

  /** Hourly windowed counts+sums per event type, computed BY THE
    * STREAMING PATH (watermark + window aggregate + memory sink in
    * complete mode), checked against the batch SQL equivalent. */
  def q52_stream_window(s: SparkSession, dir: String): DataFrame = {
    val src = rawEvents(s, dir)
    val agg = StreamOps.windowedStats(src, "ts", "1 hour", "1 hour",
      "1 hour")
    drain(s, agg, "graft_q52_sink", "complete")
      .select(col("win_start"), col("win_end"), col("event_type"),
        col("cnt"), (round(col("total"), 2) + lit(0.0)).as("total"))
      .orderBy(col("win_start"), col("event_type"))
  }

  val q52_oracle: String =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
      | time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS win_end,
      | event_type, count(*)::BIGINT AS cnt,
      | round(sum(value), 2) + 0 AS total
      |FROM events GROUP BY 1, 2, 3
      |ORDER BY win_start, event_type""".stripMargin

  /** Event-time gap sessionization ON THE STREAMING PATH
    * (flatMapGroupsWithState): emits every CLOSED session (>30 min
    * silence); the still-open last session per user stays in state, so
    * the oracle drops each user's final session. Event times are
    * ms-truncated on both sides — the stream's state math runs on
    * epoch-millis. */
  def q53_stream_sessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val src = rawEvents(s, dir)
      .select(col("user_id"),
        date_trunc("millisecond", col("ts")).as("ts"), col("value"))
      .as[StreamOps.SessionEvent]
    val sess = StreamOps.gapSessions(src, gapMs = 1800000L)
    drain(s, sess.toDF(), "graft_q53_sink", "append")
      .select(col("user_id"), col("sess_start"), col("n_events"),
        (round(col("total"), 2) + lit(0.0)).as("total"))
      .orderBy(col("user_id"), col("sess_start"))
  }

  val q53_oracle: String =
    """WITH e AS (
      |  SELECT user_id, date_trunc('milliseconds', ts) AS ts, event_id,
      |    value FROM events),
      |g AS (
      |  SELECT user_id, ts, event_id, value,
      |   epoch_ms(ts) - epoch_ms(lag(ts, 1) OVER
      |     (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_ms
      |  FROM e),
      |t AS (
      |  SELECT user_id, ts, value,
      |   CASE WHEN gap_ms IS NULL OR gap_ms > 1800000 THEN 1 ELSE 0 END
      |     AS new_sess, event_id FROM g),
      |si AS (
      |  SELECT user_id, ts, value,
      |   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM t),
      |se AS (
      |  SELECT user_id, sess_id, min(ts) AS sess_start,
      |   count(*)::BIGINT AS n_events, round(sum(value), 2) + 0 AS total
      |  FROM si GROUP BY user_id, sess_id)
      |SELECT user_id, sess_start, n_events, total
      |FROM se
      |WHERE sess_id < (SELECT max(s2.sess_id) FROM se s2
      |  WHERE s2.user_id = se.user_id)
      |ORDER BY user_id, sess_start""".stripMargin

  /** The stream→engine sink under the oracle gate: events stream into
    * a versioned series via writeToSeries (each micro-batch commits
    * one revision), then the ENGINE read — manifest prune, segment
    * scan — must reproduce the batch view exactly. */
  def q63_stream_sink(s: SparkSession, dir: String): DataFrame = {
    import graft.api.Repo
    import graft.core.GSchema
    val root = java.nio.file.Files
      .createTempDirectory("graft-qs").toString
    val schema = GSchema("ts" -> "timestamp*", "event_id" -> "int*",
      "value" -> "float", "event_type" -> "str")
    val sr = new Repo(root, s).createCollection(schema, "events")
      .series("_")
    val src = rawEvents(s, dir)
      .select(col("ts"), col("event_id"), col("value"),
        col("event_type"))
    val q = StreamOps.writeToSeries(src, sr)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    sr.frame().select(col("event_id"), col("ts"), col("value"))
      .orderBy(col("event_id"))
  }

  val q63_oracle: String =
    """SELECT event_id, ts, value FROM events ORDER BY event_id"""

  /** The NATIVE DSv2 streaming sink (`writeStream.format("graft")`,
    * [[graft.sources.GraftStreamingWrite]]): events stream into the
    * store through the connector — one engine revision per
    * micro-batch, per-query epoch markers making restarts replay-safe
    * — and the read-back goes through the SQL connector too, so both
    * directions of the streaming surface are exercised with zero
    * Scala-API data access. q63 is the same flow via the
    * foreachBatch helper; this is the `spark.writeStream` one-liner a
    * SQL-first user writes. */
  def q190_stream_native_sink(s: SparkSession, dir: String)
      : DataFrame = {
    import graft.api.Repo
    import graft.core.GSchema
    val root = java.nio.file.Files
      .createTempDirectory("graft-qs").toString
    val schema = GSchema("ts" -> "timestamp*", "event_id" -> "int*",
      "value" -> "float", "event_type" -> "str")
    new Repo(root, s).createCollection(schema, "events")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-qs-ck").toString
    val src = rawEvents(s, dir)
      .select(col("ts"), col("event_id"), col("value"),
        col("event_type"))
    val q = src.writeStream.format("graft")
      .option("path", root).option("collection", "events")
      .option("series", "_").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.read.format("graft").option("path", root)
      .option("collection", "events").option("series", "_").load()
      .createOrReplaceTempView("gq190")
    s.sql(
      """SELECT event_type, count(*) AS cnt,
        |  sum(event_id) AS id_sum,
        |  sum(cast(round(value * 1000000, 0) AS bigint)) AS val_micro
        |FROM gq190
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** INCREMENTAL MATERIALIZED VIEW over the versioned store: the CDC
    * stream (`readStream.format("graft")`) tails a series' commits,
    * and each micro-batch MERGEs its partial aggregate into a
    * catalog-managed summary table — matched groups ADD their deltas,
    * unseen groups insert (the first batch exercises the
    * zero-matched-groups MERGE). The summary after the drain must
    * equal the oracle's one-shot recompute over all events — the
    * exactly-once composition of the round-9 streaming source and
    * copy-on-write MERGE. */
  def q198_incremental_mv(s: SparkSession, dir: String): DataFrame = {
    import graft.api.Repo
    import graft.core.GSchema
    val root = java.nio.file.Files
      .createTempDirectory("graft-qs").toString
    val repo = new Repo(root, s)
    val schema = GSchema("ts" -> "timestamp*", "event_id" -> "int*",
      "value" -> "float", "event_type" -> "str")
    val sr = repo.createCollection(schema, "events").series("_")
    Tables.init(s)
    val ev = Tables.table(s, dir, "events")
      .select(col("ts"), col("event_id"), col("value"),
        col("event_type"))
    // two source commits, then the CDC drain
    val cut = lit("2024-01-15 00:00:00").cast("timestamp")
    sr.write(ev.filter(col("ts") < cut))
    sr.write(ev.filter(col("ts") >= cut))
    val cat = "gq198_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.path", root)
    s.sql(
      s"""CREATE TABLE $cat.mv.by_type
         |(event_type STRING, cnt BIGINT, val_micro BIGINT)
         |PARTITIONED BY (event_type)""".stripMargin)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-qs-ck").toString
    val q = s.readStream.format("graft")
      .option("path", root).option("collection", "events")
      .option("series", "_").load()
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // the micro-batch runs in a CLONED session — register the
          // view and run the MERGE there, not in the outer session
          batch.createOrReplaceTempView("gq198_batch")
          batch.sparkSession.sql(
            s"""MERGE INTO $cat.mv.by_type t USING (
               |  SELECT event_type, count(*) AS cnt,
               |    sum(cast(round(value * 1000000, 0) AS bigint))
               |      AS val_micro
               |  FROM gq198_batch GROUP BY event_type
               |) src ON t.event_type = src.event_type
               |WHEN MATCHED THEN UPDATE SET
               |  cnt = t.cnt + src.cnt,
               |  val_micro = t.val_micro + src.val_micro
               |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
          ()
        }
      }
      .start()
    q.awaitTermination()
    s.sql(s"SELECT event_type, cnt, val_micro FROM $cat.mv.by_type " +
      s"ORDER BY event_type")
  }

  val q198_oracle: String =
    """SELECT event_type, count(*)::BIGINT AS cnt,
      |  sum(round(value * 1000000)::BIGINT)::BIGINT AS val_micro
      |FROM events GROUP BY event_type ORDER BY event_type"""
      .stripMargin

  val q190_oracle: String =
    """SELECT event_type, count(*)::BIGINT AS cnt,
      |  sum(event_id)::BIGINT AS id_sum,
      |  sum(round(value * 1000000)::BIGINT)::BIGINT AS val_micro
      |FROM events GROUP BY event_type ORDER BY event_type"""
      .stripMargin

  /** Streaming exact deduplication: documents arrive as a stream,
    * `dropDuplicates` on the content hash keeps the first occurrence
    * of each distinct text (state = one compact hash per distinct doc,
    * the standard streaming-dedup shape; add a watermark to bound
    * state when arrival time correlates with content age). Only the
    * hash set is emitted — which physical row survives a duplicate
    * group is arrival-order-dependent, the set of hashes is not.
    */
  def q71_stream_dedup(s: SparkSession, dir: String): DataFrame = {
    Tables.init(s)
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    val src = StreamOps.eventStream(s, s"$dir/documents*.parquet", schema)
    val dd = src.select(md5(col("text")).as("h")).dropDuplicates("h")
    drain(s, dd, "graft_q71_sink", "append").orderBy(col("h"))
  }

  val q71_oracle: String =
    """SELECT DISTINCT md5(text) AS h FROM documents ORDER BY h"""

  /** Stateless streaming feature extraction: the native
    * `graft_minhash` kernel runs inside the stream's projection, so
    * signatures are computed at arrival time with zero state — the
    * shape of an ingest-time enrichment pipeline (the whole-stage
    * codegen'd Expression is reused verbatim between batch and
    * streaming plans). Oracle = the batch signature table (q22).
    */
  def q75_stream_minhash(s: SparkSession, dir: String): DataFrame = {
    Tables.init(s)
    graft.functions.VectorFunctions.register(s)
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    val src = StreamOps.eventStream(s, s"$dir/documents*.parquet", schema)
    val sigCols = (1 to 8).map(i =>
      expr(s"element_at(sig, $i)").as(s"mh$i"))
    val sigs = src.select(col("doc_id"),
        expr("graft_minhash(text)").as("sig"))
      .where(col("sig").isNotNull)
      .select(col("doc_id") +: sigCols: _*)
    drain(s, sigs, "graft_q75_sink", "append").orderBy(col("doc_id"))
  }

  val q75_oracle: String = {
    val minhashCols = QueriesSim.A.zip(QueriesSim.B).zipWithIndex
      .map { case ((a, b), i) =>
        s"min(($a*hv+$b)%${QueriesSim.P}) AS mh${i + 1}"
      }.mkString(", ")
    s"""WITH ${QueriesSim.duckShingleTok}
       |SELECT doc_id, $minhashCols
       |FROM tok GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Stream-stream event-time join ON THE STREAMING PATH: click →
    * purchase attribution within 30 minutes per user. Both sides carry
    * a watermark and the join has the time-range predicate Spark needs
    * to bound state (each side's buffered rows expire once the other
    * side's watermark passes the window) — the canonical shape for
    * joining two unbounded streams. With AvailableNow over the finite
    * events file the inner join emits exactly the batch-join pairs,
    * which is what the oracle checks. */
  def q81_stream_join(s: SparkSession, dir: String): DataFrame = {
    val src = rawEvents(s, dir)
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    val joined = clicks.join(purchases, expr(
      """c_user = p_user AND p_ts > c_ts AND
        |p_ts <= c_ts + interval 30 minutes""".stripMargin))
    drain(s, joined, "graft_q81_sink", "append")
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"))
      .orderBy("user_id", "click_id", "purchase_id")
  }

  val q81_oracle: String =
    """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
      |FROM events c JOIN events p ON c.user_id = p.user_id
      | AND c.event_type = 'click' AND p.event_type = 'purchase'
      | AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      |ORDER BY 1, 2, 3""".stripMargin

  /** Streaming incremental near-dedup against ENGINE-STORED state —
    * the live form of q118's batch ingest: the already-ingested
    * corpus half's minhash signature index is written through the
    * versioned series engine and read back via the manifest; the new
    * batch then arrives AS A STREAM, signatures are computed at
    * arrival time by the native kernel, and each micro-batch probes
    * the stored index with four stateless stream-static band joins
    * (union'd) verified at >= 6/8 signature agreement. No streaming
    * state at all — the dedup state IS the versioned store, which is
    * what makes the pipeline resumable: a restarted stream re-probes
    * the same committed index. A >= 6/8 agreement always survives at
    * least one of the 4 bands (2 mismatches can break at most 2), so
    * the band union loses nothing vs all-pairs and the oracle can
    * check plain agreement. */
  def q120_stream_incdedup(s: SparkSession, dir: String): DataFrame = {
    import graft.api.Repo
    import graft.core.GSchema
    Tables.init(s)
    graft.functions.VectorFunctions.register(s)
    Tables.registerAll(s, dir)
    val root = java.nio.file.Files
      .createTempDirectory("graft-sinc").toString
    val gs = GSchema(Seq("doc_id" -> "int*") ++
      (1 to 8).map(i => s"mh$i" -> "int"): _*)
    val sr = new Repo(root, s).createCollection(gs, "sigidx").series("_")
    val sigSel = Seq("doc_id") ++
      (1 to 8).map(i => s"element_at(sig, $i) AS mh$i")
    sr.write(s.sql(
      """SELECT doc_id, graft_minhash(text) AS sig FROM documents
        |WHERE doc_id % 2 = 0 AND graft_minhash(text) IS NOT NULL"""
        .stripMargin).selectExpr(sigSel: _*))
    val stored = sr.frame().select(col("doc_id").as("cd") +:
      (1 to 8).map(i => col(s"mh$i").as(s"c$i")): _*)
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    val src = StreamOps.eventStream(s, s"$dir/documents*.parquet", schema)
      .filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), expr("graft_minhash(text)").as("sig"))
      .where(col("sig").isNotNull)
      .select(col("doc_id").as("nd") +:
        (1 to 8).map(i => expr(s"element_at(sig, $i)").as(s"n$i")): _*)
    val agree = (1 to 8).map(i =>
      s"CASE WHEN n$i = c$i THEN 1 ELSE 0 END").mkString(" + ")
    val pairs = Seq((1, 2), (3, 4), (5, 6), (7, 8)).map { case (x, y) =>
      src.join(stored,
          col(s"n$x") === col(s"c$x") && col(s"n$y") === col(s"c$y"))
        .where(expr(s"($agree) >= 6"))
        .select(col("nd"), col("cd"))
    }.reduce(_ union _)
    drain(s, pairs, "graft_q120_sink", "append")
    // the same (nd, cd) can surface from several bands — collapse
    s.sql(
      """SELECT nd AS doc_id, min(cd) AS first_match,
        |  count(DISTINCT cd) AS n_matches
        |FROM graft_q120_sink GROUP BY nd ORDER BY doc_id""".stripMargin)
  }

  val q120_oracle: String = {
    val agree = (1 to 8).map(i =>
      s"CASE WHEN n.mh$i = c.mh$i THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH ${QueriesSim.duckShingleTok},
       |${QueriesSim.sigBody("tok")},
       |p AS (SELECT n.doc_id AS nd, c.doc_id AS cd
       |  FROM sig n JOIN sig c
       |    ON n.doc_id % 2 = 1 AND c.doc_id % 2 = 0
       |   AND ($agree) >= 6)
       |SELECT nd AS doc_id, min(cd) AS first_match,
       |  count(DISTINCT cd)::BIGINT AS n_matches
       |FROM p GROUP BY nd ORDER BY doc_id""".stripMargin
  }

  /** Streaming distribution-drift monitor probing ENGINE-STORED
    * reference state: the reference window's histogram lives in the
    * versioned series store (written once, via [[QueriesSeries
    * .refHistView]]), the current window ARRIVES AS A STREAM, and
    * each micro-batch folds into a complete-mode (event_type, bucket)
    * count aggregate — constant-size state, the streaming analogue of
    * a map-side-combined aggregate. PSI against the stored histogram
    * is computed over the drained sink with q139's exact math, so the
    * oracle is the full two-window batch recompute: a bucket shifted
    * by the stream path (or a stored count mangled in the engine
    * round trip) fails the hash. The bucket bounds are read from the
    * STORE and injected as literals — exactly how a 100 TB deployment
    * ships its fixed reference grid to every executor. */
  def q144_stream_drift(s: SparkSession, dir: String): DataFrame = {
    QueriesSeries.refHistView(s, dir)
    val b = s.sql(
      "SELECT min(lo) AS lo, min(hi) AS hi FROM graft_ref_hist").head()
    val (lo, hi) = (b.getDouble(0), b.getDouble(1))
    val src = rawEvents(s, dir)
      .filter(col("ts") >= lit("2024-01-15").cast("timestamp") &&
        col("value").isNotNull)
    val bucketed = src
      .withColumn("bk",
        when(col("value") < lit(lo), lit(0))
          .when(col("value") >= lit(hi), lit(11))
          .otherwise(floor((col("value") - lit(lo)) * lit(10.0) /
            (lit(hi) - lit(lo))).cast("int") + lit(1)))
      .groupBy(col("event_type"), col("bk"))
      .agg(count(lit(1)).as("c"))
    drain(s, bucketed, "graft_q144_sink", "complete")
    QueriesSeries.psiAgainstStored(s,
      "cb AS (SELECT event_type, bk, c FROM graft_q144_sink)")
  }

  /** stream-against-stored-state must equal the batch recompute */
  val q144_oracle: String = QueriesPipe.q139_oracle

  /** Streaming OHLC — q159's hourly open/high/low/close downsample
    * ON THE STREAMING PATH: watermarked hourly windows, all four
    * prices as SELECTION aggregates (min_by/max_by on (ts, event_id)
    * — deterministic under any arrival order, which is the whole
    * point: a late or reordered tick cannot change the answer). The
    * oracle is the batch q159 SQL, so stream and batch must agree
    * bit-for-bit. */
  def q163_stream_ohlc(s: SparkSession, dir: String): DataFrame = {
    val src = rawEvents(s, dir).filter(col("value").isNotNull)
    val agg = src
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id")))
          .as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id")))
          .as("close"),
        count(lit(1)).as("n_ticks"))
    drain(s, agg, "graft_q163_sink", "complete")
      .select(col("event_type"), col("window.start").as("hr"),
        col("open"), col("high"), col("low"), col("close"),
        col("n_ticks"))
      .orderBy(col("event_type"), col("hr"))
  }

  /** the stream must reproduce the batch OHLC exactly */
  val q163_oracle: String = QueriesWindow.q159_oracle

  /** The curation decision table ON THE STREAMING PATH — q168's
    * ordered reason-coded filter funnel evaluated per document AS IT
    * ARRIVES: the native `graft_termcounts` kernel runs inside the
    * stream's projection, the three signals (token count, max term
    * count, hashed classifier score) fold in-row over its output —
    * no per-doc state, so the streaming aggregate carries only the
    * reasons-sized count table in complete mode. The oracle is the
    * batch q168 SQL: arrival order cannot change a single verdict
    * or share. This is the deploy shape of an ingest-time filter at
    * 100 TB/day. */
  def q169_stream_funnel(s: SparkSession, dir: String): DataFrame = {
    Tables.init(s)
    graft.functions.VectorFunctions.register(s)
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    val src = StreamOps.eventStream(s, s"$dir/documents*.parquet",
      schema)
    val scored = src.selectExpr("doc_id",
        "graft_termcounts(text) AS tcs")
      .selectExpr("doc_id",
        "aggregate(tcs, 0L, (a, x) -> a + x.cnt) AS ntok",
        "aggregate(tcs, 0L, (a, x) -> if(x.cnt > a, x.cnt, a)) AS maxcnt",
        """aggregate(tcs, 0L, (a, x) -> a + x.cnt *
          |  (cast(conv(substr(md5(x.term), 1, 12), 16, 10) AS bigint)
          |    % 2000001 - 1000000)) AS raw""".stripMargin)
    val verdict = scored.selectExpr(
      """CASE WHEN ntok < 10 THEN 'a_too_short'
        |  WHEN ntok > 2000 THEN 'b_too_long'
        |  WHEN maxcnt * 1000 > ntok * 200 THEN 'c_repetitive'
        |  WHEN (CASE WHEN raw >= 0 THEN 1 ELSE -1 END)
        |    * ((abs(raw) * 2 + ntok) div (2 * ntok)) < -200000
        |    THEN 'd_low_quality'
        |  ELSE 'e_keep' END AS reason""".stripMargin, "ntok")
      .groupBy(col("reason"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
    drain(s, verdict, "graft_q169_sink", "complete")
    s.sql(
      """WITH v AS (SELECT reason, n_docs, n_tokens
        |  FROM graft_q169_sink),
        |t AS (SELECT sum(n_docs) AS nd, sum(n_tokens) AS nt FROM v)
        |SELECT v.reason, v.n_docs, v.n_tokens,
        |  (v.n_docs * 1000000) div t.nd AS doc_share_ppm,
        |  (v.n_tokens * 1000000) div t.nt AS token_share_ppm
        |FROM v CROSS JOIN t ORDER BY v.reason""".stripMargin)
  }

  /** arrival order cannot change a verdict: the batch table is the
    * oracle */
  val q169_oracle: String = QueriesPipe.q168_oracle

  /** The ENGINE STORE as a streaming source — events written into a
    * graft series, then streamed back out through the connector's
    * CDC micro-batches (`spark.readStream.format("graft")`: offsets
    * are changelog ordinals, each batch serves newly-referenced
    * segment files) into a memory sink, aggregated, and checked
    * against plain SQL over the original parquet. This is the "train
    * on data as it lands in the versioned store" delivery path: the
    * stream IS the store's commit history, no side channel. Written
    * in TWO commits so the drained result provably crosses a
    * micro-batch boundary. */
  def q178_stream_connector(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q178").toString
    val repo = new graft.api.Repo(root, s)
    val gschema = graft.core.GSchema(
      "ts" -> "timestamp*", "event_id" -> "int*",
      "value" -> "float", "event_type" -> "str")
    val clct = repo.createCollection(gschema, "events")
    clct.embedMaxSize = 0L
    val sr = clct.series("_")
    val ev = Tables.table(s, dir, "events")
      .select(col("ts"), col("event_id"), col("value"),
        col("event_type"))
    val cut = lit("2024-01-15").cast("timestamp")
    sr.write(ev.filter(col("ts") < cut))
    sr.write(ev.filter(col("ts") >= cut))
    val name = "graft_q178_sink"
    if (s.catalog.tableExists(name)) s.catalog.dropTempView(name)
    val q = s.readStream.format("graft")
      .option("path", root).option("collection", "events")
      .option("series", "_").load()
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table(name).createOrReplaceTempView("graft_q178_rows")
    s.sql(
      """SELECT event_type, count(*) AS cnt,
        |  sum(cast(round(value * 1000000, 0) AS bigint)) AS val_micro,
        |  count(DISTINCT event_id) AS n_ids
        |FROM graft_q178_rows
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val q178_oracle: String =
    """SELECT event_type, count(*)::BIGINT AS cnt,
      |  sum(round(value * 1000000)::BIGINT)::BIGINT AS val_micro,
      |  count(DISTINCT event_id)::BIGINT AS n_ids
      |FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q178_stream_connector" -> q178_stream_connector _,
    "q190_stream_native_sink" -> q190_stream_native_sink _,
    "q198_incremental_mv" -> q198_incremental_mv _,
    "q169_stream_funnel" -> q169_stream_funnel _,
    "q163_stream_ohlc" -> q163_stream_ohlc _,
    "q144_stream_drift" -> q144_stream_drift _,
    "q81_stream_join" -> q81_stream_join _,
    "q75_stream_minhash" -> q75_stream_minhash _,
    "q52_stream_window" -> q52_stream_window _,
    "q53_stream_sessions" -> q53_stream_sessions _,
    "q63_stream_sink" -> q63_stream_sink _,
    "q71_stream_dedup" -> q71_stream_dedup _,
    "q120_stream_incdedup" -> q120_stream_incdedup _)

  val oracles: Map[String, String] = Map(
    "q178_stream_connector" -> q178_oracle,
    "q190_stream_native_sink" -> q190_oracle,
    "q198_incremental_mv" -> q198_oracle,
    "q169_stream_funnel" -> q169_oracle,
    "q163_stream_ohlc" -> q163_oracle,
    "q144_stream_drift" -> q144_oracle,
    "q81_stream_join" -> q81_oracle,
    "q75_stream_minhash" -> q75_oracle,
    "q52_stream_window" -> q52_oracle,
    "q53_stream_sessions" -> q53_oracle,
    "q63_stream_sink" -> q63_oracle,
    "q71_stream_dedup" -> q71_oracle,
    "q120_stream_incdedup" -> q120_oracle)
}
