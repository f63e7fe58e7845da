package graft

import graft.api.Repo
import graft.core.{Closed, GSchema}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Engine-backed queries: route the test data through the versioned
  * series engine (write → manifest → pruned read) and verify the
  * result against plain SQL over the original parquet — proving the
  * storage engine's overlay/time-travel/delete semantics inside the
  * oracle gate.
  */
object QueriesSeries {

  private val eventsSchema = GSchema(
    "ts" -> "timestamp*", "event_id" -> "int*",
    "value" -> "float", "event_type" -> "str")

  private def eventsDf(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "events")
      .select(col("ts"), col("event_id"), col("value"), col("event_type"))

  private def freshSeries(s: SparkSession): graft.api.Series = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val repo = new Repo(root, s)
    repo.createCollection(eventsSchema, "events").series("_")
  }

  private val out = Seq("event_id", "ts", "value")

  /** write through the engine, range-read back [Jan10, Jan20) */
  def q30_series_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val sr = freshSeries(s)
    sr.write(eventsDf(s, dir))
    sr.frame("2024-01-10 00:00:00", "2024-01-20 00:00:00",
        closed = Closed.Left)
      .select(out.map(col): _*).orderBy(col("event_id"))
  }

  val q30_oracle: String =
    """SELECT event_id, ts, value FROM events
      |WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
      |ORDER BY event_id""".stripMargin

  /** overlay write: double the value over [Jan10, Jan20) without
    * rewriting the rest; full read shows the merged view */
  def q31_series_overlay(s: SparkSession, dir: String): DataFrame = {
    val sr = freshSeries(s)
    val ev = eventsDf(s, dir)
    sr.write(ev)
    val patch = ev
      .filter(col("ts") >= lit("2024-01-10").cast("timestamp") &&
        col("ts") < lit("2024-01-20").cast("timestamp"))
      .withColumn("value", col("value") * 2)
    sr.write(patch, "2024-01-10 00:00:00", "2024-01-20 00:00:00",
      Closed.Left)
    sr.frame().select(out.map(col): _*).orderBy(col("event_id"))
  }

  val q31_oracle: String =
    """SELECT event_id, ts,
      | CASE WHEN ts >= TIMESTAMP '2024-01-10'
      |       AND ts < TIMESTAMP '2024-01-20'
      |      THEN value * 2 ELSE value END AS value
      |FROM events ORDER BY event_id""".stripMargin

  /** time travel: read the snapshot before an overlay write */
  def q32_series_timetravel(s: SparkSession, dir: String): DataFrame = {
    val sr = freshSeries(s)
    val ev = eventsDf(s, dir)
    sr.write(ev)
    Thread.sleep(15)
    val cut = System.currentTimeMillis()
    Thread.sleep(15)
    sr.write(ev.filter(col("event_id") % 5 === 0)
        .withColumn("value", lit(-1.0)),
      "2024-01-01 00:00:00", "2024-02-01 00:00:00", Closed.Left)
    sr.frame(beforeMs = Some(cut))
      .select(out.map(col): _*).orderBy(col("event_id"))
  }

  val q32_oracle: String =
    """SELECT event_id, ts, value FROM events ORDER BY event_id""".stripMargin

  /** range delete: manifest-only tombstone hides [Jan10, Jan20) */
  def q33_series_delete(s: SparkSession, dir: String): DataFrame = {
    val sr = freshSeries(s)
    sr.write(eventsDf(s, dir))
    sr.delete("2024-01-10 00:00:00", "2024-01-20 00:00:00", Closed.Left)
    sr.frame().select(out.map(col): _*).orderBy(col("event_id"))
  }

  val q33_oracle: String =
    """SELECT event_id, ts, value FROM events
      |WHERE NOT (ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20')
      |ORDER BY event_id""".stripMargin

  /** KV upsert through the engine: weekly per-key aggregates merged
    * first-wins (new over old) — engine twin of q09 */
  def q34_series_kv(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-q").toString
    val repo = new Repo(root, s)
    val schema = GSchema.kv("user_id" -> "int*", "event_type" -> "str*",
      "value" -> "float")
    val sr = repo.createCollection(schema, "kv").series("_")
    val ev = Tables.table(s, dir, "events")
    def weekAgg(lo: String, hi: String) = ev
      .filter(col("ts") >= lit(lo).cast("timestamp") &&
        col("ts") < lit(hi).cast("timestamp"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(col("value")).as("value"))
    sr.write(weekAgg("2024-01-01", "2024-01-08"))   // old
    sr.write(weekAgg("2024-01-08", "2024-01-15"))   // new wins per key
    sr.frame()
      .select(col("user_id"), col("event_type"),
        round(col("value"), 2).as("value"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val q34_oracle: String =
    """WITH n AS (
      |  SELECT user_id, event_type, sum(value) AS v, 0 AS src FROM events
      |  WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
      |  GROUP BY 1, 2),
      |o AS (
      |  SELECT user_id, event_type, sum(value) AS v, 1 AS src FROM events
      |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
      |  GROUP BY 1, 2),
      |u AS (SELECT * FROM n UNION ALL SELECT * FROM o)
      |SELECT user_id, event_type, round(min_by(v, src),2) AS value
      |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** fragmentation path: hour-sliced tiny writes (manifest-inline
    * segments) next to a full-day file write, then defrag — the read
    * must be byte-identical to plain SQL over the source. Exercises
    * the embed_max_size fast path and inline-run compaction inside
    * the oracle gate. */
  def q48_series_inline(s: SparkSession, dir: String): DataFrame = {
    val sr = freshSeries(s)
    val ev = eventsDf(s, dir)
      .filter(col("ts") >= lit("2024-01-01").cast("timestamp") &&
        col("ts") < lit("2024-01-03").cast("timestamp"))
    // Jan 1 fragmented into 24 hour-bounded tiny writes -> inline rows
    (0 until 24).foreach { h =>
      val lo = f"2024-01-01 $h%02d:00:00"
      val hi = if (h == 23) "2024-01-02 00:00:00"
        else f"2024-01-01 ${h + 1}%02d:00:00"
      sr.write(ev.filter(col("ts") >= lit(lo).cast("timestamp") &&
        col("ts") < lit(hi).cast("timestamp")), lo, hi, Closed.Left)
    }
    // Jan 2 as one ordinary write (parquet segment at sf>=0.01)
    sr.write(ev.filter(col("ts") >= lit("2024-01-02").cast("timestamp")),
      "2024-01-02 00:00:00", "2024-01-03 00:00:00", Closed.Left)
    sr.collection.defrag()
    sr.collection.refresh()
    sr.frame().select(out.map(col): _*).orderBy(col("event_id"))
  }

  val q48_oracle: String =
    """SELECT event_id, ts, value FROM events
      |WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-03'
      |ORDER BY event_id""".stripMargin

  /** pagination under the oracle gate: pages 1-2 (skip page 0) of the
    * manifest-cursor paginate must equal plain LIMIT/OFFSET over the
    * index order */
  def q56_series_paginate(s: SparkSession, dir: String): DataFrame = {
    val sr = freshSeries(s)
    sr.write(eventsDf(s, dir))
    sr.paginate(step = 300L).slice(1, 3)
      .reduceOption(_ union _)
      .getOrElse(sr.emptyDf) // <= 1 page: same empty result as LIMIT 0
      .select(out.map(col): _*).orderBy(col("event_id"))
  }

  val q56_oracle: String =
    """SELECT event_id, ts, value FROM (
      |  SELECT * FROM events ORDER BY ts, event_id
      |  LIMIT 600 OFFSET 300)
      |ORDER BY event_id""".stripMargin

  /** epoch dtype output style: timestamps come back as integral epoch
    * seconds (reference DTYPE_MAP style) */
  def q57_series_epoch(s: SparkSession, dir: String): DataFrame = {
    val sr = freshSeries(s)
    sr.write(eventsDf(s, dir))
    sr.frame(style = "epoch")
      .select(out.map(col): _*).orderBy(col("event_id"))
  }

  val q57_oracle: String =
    """SELECT event_id, floor(epoch(ts))::BIGINT AS ts, value
      |FROM events ORDER BY event_id""".stripMargin

  /** the full two-repo sync workflow under the oracle gate: B forks
    * off A's base write, both write concurrently (A appends a later
    * range, B overlays a patch), A pulls B back and 3-way merges —
    * the read must equal the SQL composition of both branches */
  def q58_series_merge(s: SparkSession, dir: String): DataFrame = {
    val ev = eventsDf(s, dir)
    val rootA = java.nio.file.Files.createTempDirectory("graft-qA").toString
    val rootB = java.nio.file.Files.createTempDirectory("graft-qB").toString
    val repoA = new Repo(rootA, s)
    val sa = repoA.createCollection(eventsSchema, "events").series("_")
    sa.write(ev.filter(col("ts") < lit("2024-01-15").cast("timestamp")),
      "2020-01-01 00:00:00", "2024-01-15 00:00:00", Closed.Left)
    val repoB = new Repo(rootB, s)
    repoB.pull(repoA) // fork point
    Thread.sleep(10)
    sa.write(ev.filter(col("ts") >= lit("2024-01-15").cast("timestamp")),
      "2024-01-15 00:00:00", "2025-01-01 00:00:00", Closed.Left)
    Thread.sleep(10)
    val sb = repoB.collection("events").get.series("_")
    sb.write(ev
        .filter(col("ts") >= lit("2024-01-05").cast("timestamp") &&
          col("ts") < lit("2024-01-10").cast("timestamp"))
        .withColumn("value", col("value") * 3),
      "2024-01-05 00:00:00", "2024-01-10 00:00:00", Closed.Left)
    repoA.pull(repoB)
    val merged = repoA.collection("events").get
    merged.merge()
    merged.refresh()
    merged.series("_").frame()
      .select(out.map(col): _*).orderBy(col("event_id"))
  }

  val q58_oracle: String =
    """SELECT event_id, ts,
      | CASE WHEN ts >= TIMESTAMP '2024-01-05'
      |       AND ts < TIMESTAMP '2024-01-10'
      |      THEN value * 3 ELSE value END AS value
      |FROM events ORDER BY event_id""".stripMargin

  /** zero-copy clone with a column rename and an added default-valued
    * column, read through the clone's registry mapping */
  def q59_series_clone(s: SparkSession, dir: String): DataFrame = {
    val sr = freshSeries(s)
    sr.write(eventsDf(s, dir))
    val target = sr.collection.cloneTo("events_clone",
      rename = Map("value" -> "val2"),
      additions = Seq((graft.core.ColDef("src", graft.core.GType.StrT,
        idx = false), "cloned")))
    target.series("_").frame()
      .select(col("event_id"), col("ts"), col("val2"), col("src"))
      .orderBy(col("event_id"))
  }

  val q59_oracle: String =
    """SELECT event_id, ts, value AS val2, 'cloned' AS src
      |FROM events ORDER BY event_id""".stripMargin

  /** history maintenance under the oracle gate: trim past revisions,
    * squash to a single root — the visible frame must be unchanged */
  def q65_series_squash(s: SparkSession, dir: String): DataFrame = {
    val sr = freshSeries(s)
    val ev = eventsDf(s, dir)
    sr.write(ev.filter(col("ts") < lit("2024-01-15").cast("timestamp")),
      "2020-01-01 00:00:00", "2024-01-15 00:00:00", Closed.Left)
    Thread.sleep(10)
    val cut = System.currentTimeMillis()
    Thread.sleep(10)
    sr.write(ev.filter(col("ts") >= lit("2024-01-15").cast("timestamp")),
      "2024-01-15 00:00:00", "2025-01-01 00:00:00", Closed.Left)
    sr.collection.trim(cut)
    sr.collection.refresh()
    sr.collection.squash()
    sr.collection.refresh()
    sr.frame().select(out.map(col): _*).orderBy(col("event_id"))
  }

  val q65_oracle: String =
    """SELECT event_id, ts, value FROM events ORDER BY event_id"""

  /** bulk parquet export → import into a second repo, read back */
  def q66_series_export(s: SparkSession, dir: String): DataFrame = {
    val sr = freshSeries(s)
    sr.write(eventsDf(s, dir))
    val dump = java.nio.file.Files
      .createTempDirectory("graft-exp").toString + "/dump"
    sr.exportParquet(dump)
    val sr2 = freshSeries(s)
    sr2.importParquet(dump)
    sr2.frame().select(out.map(col): _*).orderBy(col("event_id"))
  }

  val q66_oracle: String =
    """SELECT event_id, ts, value FROM events ORDER BY event_id"""

  /** JSONL export → import round trip through the engine: the
    * one-object-per-line interchange format LLM training pipelines
    * consume, written distributed, re-imported under the engine
    * schema (JSON carries no types) into a second series. The read
    * back through the manifest must equal the raw events — a lossy
    * timestamp rendering, float mangling or dropped row fails the
    * hash. */
  def q123_jsonl_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val sr = freshSeries(s)
    sr.write(eventsDf(s, dir))
    val dump = java.nio.file.Files
      .createTempDirectory("graft-jsonl").toString + "/dump"
    sr.exportJsonl(dump)
    val sr2 = freshSeries(s)
    sr2.importJsonl(dump)
    sr2.frame().select(out.map(col): _*).orderBy(col("event_id"))
  }

  val q123_oracle: String =
    """SELECT event_id, ts, value FROM events ORDER BY event_id"""

  /** the SQL facade under the gate: write through the engine, register
    * repo-wide views, aggregate over the view in plain SQL — the view
    * carries the manifest-pruned frame() plan, so this proves SQL
    * users get the same read path (and results) as the API. */
  def q76_sql_facade(s: SparkSession, dir: String): DataFrame = {
    val sr = freshSeries(s)
    sr.write(eventsDf(s, dir))
    val Seq(view) = sr.collection.repo.registerViews("gq76_")
    s.sql(
      s"""SELECT event_type, count(*) AS cnt,
         |  round(sum(value), 2) + 0 AS total
         |FROM $view
         |WHERE ts >= '2024-01-05 00:00:00'
         |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val q76_oracle: String =
    """SELECT event_type, count(*)::BIGINT AS cnt,
      |  round(sum(value), 2) + 0 AS total
      |FROM events
      |WHERE ts >= '2024-01-05 00:00:00'
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** SQL-first read through the DataSourceV2 connector
    * (`spark.read.format("graft")`): the WHERE range on the
    * timestamp index pushes into [[graft.sources.GraftScanBuilder]]
    * and prunes MANIFEST segments before any file opens — the
    * engine-grade pruning a plain-SQL user gets without touching the
    * Scala API (GraftSourceSpec gates the segment count; q76 covers
    * the registerViews route, this covers the raw connector). The
    * oracle runs the identical filtered aggregate over the source
    * parquet, so overlay resolution + clip + pushdown must be
    * value-exact. */
  def q174_connector_sql(s: SparkSession, dir: String): DataFrame = {
    val sr = freshSeries(s)
    sr.write(eventsDf(s, dir))
    s.read.format("graft")
      .option("path", sr.collection.repo.rootUri)
      .option("collection", "events")
      .option("series", "_")
      .load()
      .createOrReplaceTempView("gq174")
    s.sql(
      """SELECT event_type, count(*) AS cnt,
        |  sum(cast(round(value * 1000000, 0) AS bigint)) AS val_micro,
        |  count(DISTINCT event_id) AS n_ids
        |FROM gq174
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-22 00:00:00'
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val q174_oracle: String =
    """SELECT event_type, count(*)::BIGINT AS cnt,
      |  sum(round(value * 1000000)::BIGINT)::BIGINT AS val_micro,
      |  count(DISTINCT event_id)::BIGINT AS n_ids
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-22 00:00:00'
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** SQL-first WRITE through the DataSourceV2 connector
    * (`INSERT INTO` a graft temp view): the engine ingests half the
    * events through the Scala API and the other half through a plain
    * SQL insert — which plans the engine's own one-job bulk write
    * ([[graft.sources.GraftBatchWrite]]: per-task segment files +
    * inline stats, manifest splice at commit, no read-back) with the
    * range-shuffle+sort requested declaratively via
    * RequiresDistributionAndOrdering. The aggregate then reads the
    * merged series back through the connector; the oracle computes
    * the same numbers over ALL source events, so the insert must have
    * landed exactly. */
  def q180_connector_insert(s: SparkSession, dir: String): DataFrame = {
    val sr = freshSeries(s)
    val ev = eventsDf(s, dir)
    val cut = lit("2024-01-15").cast("timestamp")
    sr.write(ev.filter(col("ts") < cut))
    s.read.format("graft")
      .option("path", sr.collection.repo.rootUri)
      .option("collection", "events")
      .option("series", "_")
      .load()
      .createOrReplaceTempView("gq180")
    ev.filter(col("ts") >= cut).createOrReplaceTempView("gq180_src")
    s.sql(
      """INSERT INTO gq180
        |SELECT ts, event_id, value, event_type FROM gq180_src"""
        .stripMargin)
    s.sql(
      """SELECT event_type, count(*) AS cnt,
        |  sum(cast(round(value * 1000000, 0) AS bigint)) AS val_micro,
        |  count(DISTINCT event_id) AS n_ids
        |FROM gq180
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val q180_oracle: String =
    """SELECT event_type, count(*)::BIGINT AS cnt,
      |  sum(round(value * 1000000)::BIGINT)::BIGINT AS val_micro,
      |  count(DISTINCT event_id)::BIGINT AS n_ids
      |FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Multi-column index pushdown through the connector: a
    * (day, event_id) two-column index, SQL `WHERE day = X AND
    * event_id >= Y` — the scan builder assembles the lexicographic
    * prefix bound [X, Y] → [X] and prunes manifest segments WITHIN
    * day X (head-column-only pushdown would scan the whole day;
    * GraftSourceSpec gates the segment count, this gates the
    * values). */
  def q181_connector_multiidx(s: SparkSession, dir: String)
      : DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val repo = new Repo(root, s)
    val schema = GSchema("day" -> "int*", "event_id" -> "int*",
      "value" -> "float")
    val clct = repo.createCollection(schema, "by_day")
    clct.pageLen = 2000L // several segments per day at sf0.01+
    clct.embedMaxSize = 0L
    val sr = clct.series("_")
    sr.write(eventsDf(s, dir).select(
      datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
        .cast("long").as("day"),
      col("event_id"), col("value")))
    s.read.format("graft").option("path", root)
      .option("collection", "by_day").option("series", "_").load()
      .createOrReplaceTempView("gq181")
    s.sql(
      """SELECT count(*) AS cnt,
        |  sum(event_id) AS id_sum,
        |  sum(cast(round(value * 1000000, 0) AS bigint)) AS val_micro
        |FROM gq181 WHERE day = 7 AND event_id >= 2400""".stripMargin)
  }

  val q181_oracle: String =
    """SELECT count(*)::BIGINT AS cnt,
      |  sum(event_id)::BIGINT AS id_sum,
      |  sum(round(value * 1000000)::BIGINT)::BIGINT AS val_micro
      |FROM events
      |WHERE date_diff('day', DATE '2024-01-01', ts::DATE) = 7
      |  AND event_id >= 2400""".stripMargin

  /** ORDER BY index LIMIT k through the connector: SupportsPushDownTopN
    * turns the SQL top-k into a manifest prefix-covering scan (1-2
    * trailing segments instead of the whole series — the same walk
    * `Series.tail` does), Spark re-sorts the reduced input above. The
    * unique (ts, event_id) index makes the top-k deterministic. */
  def q182_connector_topn(s: SparkSession, dir: String): DataFrame = {
    val sr = freshSeries(s)
    sr.write(eventsDf(s, dir))
    s.read.format("graft")
      .option("path", sr.collection.repo.rootUri)
      .option("collection", "events").option("series", "_").load()
      .createOrReplaceTempView("gq182")
    s.sql(
      """SELECT event_id, ts, cast(round(value * 1000000, 0) AS bigint)
        |  AS val_micro
        |FROM gq182 ORDER BY ts DESC, event_id DESC LIMIT 40"""
        .stripMargin)
  }

  val q182_oracle: String =
    """SELECT event_id, ts, round(value * 1000000)::BIGINT AS val_micro
      |FROM events ORDER BY ts DESC, event_id DESC LIMIT 40"""
      .stripMargin

  /** The engine as a Spark SQL CATALOG
    * ([[graft.sources.GraftCatalog]]): CREATE TABLE declares the
    * collection (identity PARTITIONED BY = the series index), INSERT
    * runs the engine's one-job write, and the aggregate reads back
    * through the catalog-loaded connector table — an all-SQL
    * lifecycle with zero Scala API calls between data and answer. */
  def q183_catalog_sql(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val cat = "gq183_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.path", root)
    s.sql(
      s"""CREATE TABLE $cat.events.ev
         |(ts TIMESTAMP, event_id BIGINT, value DOUBLE,
         | event_type STRING)
         |PARTITIONED BY (ts, event_id)""".stripMargin)
    eventsDf(s, dir).createOrReplaceTempView("gq183_src")
    s.sql(
      s"""INSERT INTO $cat.events.ev
         |SELECT ts, event_id, value, event_type FROM gq183_src"""
        .stripMargin)
    s.sql(
      s"""SELECT event_type, count(*) AS cnt,
         |  sum(cast(round(value * 1000000, 0) AS bigint)) AS val_micro
         |FROM $cat.events.ev
         |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
         |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val q183_oracle: String =
    """SELECT event_type, count(*)::BIGINT AS cnt,
      |  sum(round(value * 1000000)::BIGINT)::BIGINT AS val_micro
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** SQL `DELETE FROM` through the catalog — the WHERE's index range
    * becomes a manifest TOMBSTONE (the engine's native delete: one
    * metadata commit, zero Spark jobs, stored files untouched —
    * GraftCatalogSpec proves the no-job plan). Range + IN-list
    * deletes stack, then the aggregate over the surviving rows is
    * checked against the equivalent NOT-filter in plain SQL. */
  def q186_sql_delete(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val cat = "gq186_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.path", root)
    s.sql(
      s"""CREATE TABLE $cat.events.ev
         |(ts TIMESTAMP, event_id BIGINT, value DOUBLE,
         | event_type STRING)
         |PARTITIONED BY (ts, event_id)""".stripMargin)
    eventsDf(s, dir).createOrReplaceTempView("gq186_src")
    s.sql(s"INSERT INTO $cat.events.ev SELECT * FROM gq186_src")
    s.sql(
      s"""DELETE FROM $cat.events.ev
         |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
         |  AND ts < TIMESTAMP '2024-01-14 00:00:00'""".stripMargin)
    // IN-list delete (a subquery condition can't reach the v1 filter
    // pushdown, so resolve the key first — one driver-side scalar)
    val minTs = s.sql("SELECT min(ts) FROM gq186_src")
      .collect()(0).getTimestamp(0)
    s.sql(
      s"""DELETE FROM $cat.events.ev
         |WHERE ts IN (TIMESTAMP '$minTs')""".stripMargin)
    s.sql(
      s"""SELECT event_type, count(*) AS cnt,
         |  sum(cast(round(value * 1000000, 0) AS bigint)) AS val_micro
         |FROM $cat.events.ev
         |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val q186_oracle: String =
    """SELECT event_type, count(*)::BIGINT AS cnt,
      |  sum(round(value * 1000000)::BIGINT)::BIGINT AS val_micro
      |FROM events
      |WHERE NOT (ts >= TIMESTAMP '2024-01-10'
      |           AND ts < TIMESTAMP '2024-01-14')
      |  AND ts <> (SELECT min(ts) FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** SQL maintenance lifecycle via STORED PROCEDURES
    * ([[graft.sources.GraftProcedures]]): four disjoint-window
    * INSERTs fragment the manifest and deepen the changelog, then
    * `CALL sys.defrag` (segment compaction), `CALL sys.squash`
    * (history collapse) and `CALL sys.gc` (reap the unreferenced
    * originals) run the engine's day-2 verbs with zero Scala API
    * calls — the aggregate afterwards must still match the plain
    * one-pass oracle, proving maintenance never changes data. */
  def q187_sql_maintenance(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val cat = "gq187_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.path", root)
    s.sql(
      s"""CREATE TABLE $cat.events.ev
         |(ts TIMESTAMP, event_id BIGINT, value DOUBLE,
         | event_type STRING)
         |PARTITIONED BY (ts, event_id)""".stripMargin)
    eventsDf(s, dir).createOrReplaceTempView("gq187_src")
    // disjoint index windows → each INSERT splices its own range
    val cuts = Seq("2024-01-05", "2024-01-10", "2024-01-15")
    val windows =
      (s"ts < TIMESTAMP '${cuts.head}'" +:
        cuts.sliding(2).toSeq.collect { case Seq(a, b) =>
          s"ts >= TIMESTAMP '$a' AND ts < TIMESTAMP '$b'" }) :+
        s"ts >= TIMESTAMP '${cuts.last}'"
    windows.foreach { w =>
      s.sql(s"INSERT INTO $cat.events.ev SELECT * FROM gq187_src WHERE $w")
    }
    val d = s.sql(s"CALL $cat.sys.defrag(collection => 'events')")
      .collect()(0)
    require(d.getLong(2) <= d.getLong(1), s"defrag grew segments: $d")
    val q = s.sql(s"CALL $cat.sys.squash('events')").collect()(0)
    require(q.getLong(2) == 1L && q.getLong(1) >= windows.length,
      s"squash must collapse ${q.getLong(1)} revisions to one: $q")
    val g = s.sql(s"CALL $cat.sys.gc(timeout_ms => 0)").collect()(0)
    require(g.getLong(0) >= 0L)
    s.sql(
      s"""SELECT event_type, count(*) AS cnt,
         |  sum(event_id) AS id_sum,
         |  sum(cast(round(value * 1000000, 0) AS bigint)) AS val_micro
         |FROM $cat.events.ev
         |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val q187_oracle: String =
    """SELECT event_type, count(*)::BIGINT AS cnt,
      |  sum(event_id)::BIGINT AS id_sum,
      |  sum(round(value * 1000000)::BIGINT)::BIGINT AS val_micro
      |FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** SQL UPDATE / MERGE INTO / value-predicate DELETE through the
    * catalog — group-based copy-on-write row-level operations
    * ([[graft.sources.GraftRowLevelOperation]]): the UPDATE's index
    * WHERE drives runtime group filtering (only the covering
    * segments rewrite), the DELETE's value predicate takes the
    * rewrite path a tombstone can't express, and the MERGE both
    * updates matched keys and inserts new rows into free index space
    * beyond the series tail — then the aggregate must equal the
    * oracle's CASE/UNION recompute of the same three mutations. */
  def q188_sql_update(s: SparkSession, dir: String): DataFrame = {
    // env-gated stage timing (GRAFT_PROF=1): per-verb wall clock on
    // stderr, outside the oracle contract. The planning-tracker line
    // splits each verb into Catalyst phases (parse/analyze/optimize/
    // plan) vs execution — the attribution the q188 driver-floor work
    // runs on.
    def staged(tag: String)(body: => DataFrame): DataFrame = {
      if (!sys.env.contains("GRAFT_PROF")) body
      else {
        val st = s.sparkContext.statusTracker
        val j0 = st.getJobIdsForGroup(null).length
        val t0 = System.nanoTime()
        val r = body
        val wall = (System.nanoTime() - t0) / 1e6
        val jobs = st.getJobIdsForGroup(null).length - j0
        val phases = r.queryExecution.tracker.phases
          .map { case (p, t) => f"$p=${t.endTimeMs - t.startTimeMs}ms" }
          .mkString(" ")
        System.err.println(f"[q188] $tag: $wall%.0f ms  jobs=$jobs  $phases")
        r
      }
    }
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val cat = "gq188_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.path", root)
    s.sql(
      s"""CREATE TABLE $cat.events.ev
         |(ts TIMESTAMP, event_id BIGINT, value DOUBLE,
         | event_type STRING)
         |PARTITIONED BY (ts, event_id)""".stripMargin)
    // The source BATCH, pinned once per session+dir (the shared-
    // intermediate pattern every materialized q-table uses; built
    // inside the timed region on first use): the INSERT scans it
    // once, and MERGE's group-filter subquery + rewrite join read it
    // three more times — re-deriving the parquet scan per consumer
    // paid four decode passes per statement sequence. A production
    // batch mutation holds its incoming batch in memory too.
    locally {
      val t0 = System.nanoTime()
      QueriesSim.materializeDf(s, dir, "gq188_src")(eventsDf(s, dir))
      if (sys.env.contains("GRAFT_PROF"))
        System.err.println(f"[q188] materialize+create: ${
          (System.nanoTime() - t0) / 1e6}%.0f ms")
    }
    staged("insert")(
      s.sql(s"INSERT INTO $cat.events.ev SELECT * FROM gq188_src"))
    staged("update")(s.sql(
      s"""UPDATE $cat.events.ev SET value = value * 2
         |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
         |  AND ts < TIMESTAMP '2024-01-12 00:00:00'""".stripMargin))
    staged("delete")(s.sql(
      s"""DELETE FROM $cat.events.ev
         |WHERE value < 0.1
         |  AND ts >= TIMESTAMP '2024-01-20 00:00:00'""".stripMargin))
    staged("merge")(s.sql(
      s"""MERGE INTO $cat.events.ev t USING (
         |  SELECT ts, event_id, cast(-1.0 AS DOUBLE) AS value,
         |    event_type
         |  FROM gq188_src
         |  WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
         |    AND ts < TIMESTAMP '2024-01-16 00:00:00'
         |  UNION ALL
         |  SELECT ts + INTERVAL 100 DAY AS ts, event_id, value,
         |    event_type
         |  FROM gq188_src
         |  WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
         |) src ON t.ts = src.ts AND t.event_id = src.event_id
         |WHEN MATCHED THEN UPDATE SET value = src.value
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    if (sys.env.contains("GRAFT_PROF")) { // profile the final agg too
      val t0 = System.nanoTime()
      s.sql(s"SELECT count(*) FROM $cat.events.ev").collect()
      System.err.println(f"[q188] final-scan-count: ${
        (System.nanoTime() - t0) / 1e6}%.0f ms")
    }
    s.sql(
      s"""SELECT event_type, count(*) AS cnt,
         |  sum(cast(round(value * 1000000, 0) AS bigint)) AS val_micro
         |FROM $cat.events.ev
         |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val q188_oracle: String =
    """WITH upd AS (
      |  SELECT ts, event_id,
      |    CASE WHEN ts >= TIMESTAMP '2024-01-08'
      |           AND ts < TIMESTAMP '2024-01-12' THEN value * 2
      |         WHEN ts >= TIMESTAMP '2024-01-15'
      |           AND ts < TIMESTAMP '2024-01-16' THEN -1.0
      |         ELSE value END AS value,
      |    event_type
      |  FROM events
      |  WHERE NOT (value < 0.1 AND ts >= TIMESTAMP '2024-01-20')
      |), ins AS (
      |  SELECT ts + INTERVAL 100 DAY AS ts, event_id, value,
      |    event_type
      |  FROM events WHERE ts < TIMESTAMP '2024-01-02'
      |), allr AS (
      |  SELECT * FROM upd UNION ALL SELECT * FROM ins
      |)
      |SELECT event_type, count(*)::BIGINT AS cnt,
      |  sum(round(value * 1000000)::BIGINT)::BIGINT AS val_micro
      |FROM allr GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Zero-copy SCHEMA EVOLUTION through the catalog
    * ([[graft.sources.GraftCatalog.alterTable]]): `ALTER TABLE ADD
    * COLUMN ... DEFAULT` makes every pre-existing file answer the
    * default while post-ALTER inserts store real values (under a
    * fresh physical name — colMap machinery, no file rewritten), and
    * `RENAME COLUMN` remaps reads in place. The aggregate afterwards
    * must match the oracle's recompute of both populations. */
  def q189_schema_evolution(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val cat = "gq189_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.path", root)
    s.sql(
      s"""CREATE TABLE $cat.events.ev
         |(ts TIMESTAMP, event_id BIGINT, value DOUBLE,
         | event_type STRING)
         |PARTITIONED BY (ts, event_id)""".stripMargin)
    eventsDf(s, dir).createOrReplaceTempView("gq189_src")
    s.sql(s"INSERT INTO $cat.events.ev SELECT * FROM gq189_src")
    s.sql(s"ALTER TABLE $cat.events.ev ADD COLUMN quality DOUBLE " +
      s"DEFAULT 0.5")
    // post-ALTER writes store real quality values; the shifted copy
    // lands beyond the original tail (events span Jan 1-30)
    s.sql(
      s"""INSERT INTO $cat.events.ev
         |SELECT ts + INTERVAL 100 DAY, event_id, value, event_type,
         |  value AS quality
         |FROM gq189_src
         |WHERE ts < TIMESTAMP '2024-01-03 00:00:00'""".stripMargin)
    s.sql(s"ALTER TABLE $cat.events.ev RENAME COLUMN value TO val")
    s.sql(
      s"""SELECT event_type, count(*) AS cnt,
         |  sum(cast(round(val * 1000000, 0) AS bigint)) AS val_micro,
         |  sum(cast(round(quality * 1000000, 0) AS bigint)) AS q_micro
         |FROM $cat.events.ev
         |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val q189_oracle: String =
    """WITH allr AS (
      |  SELECT event_type, value AS val, 0.5 AS quality FROM events
      |  UNION ALL
      |  SELECT event_type, value, value FROM events
      |  WHERE ts < TIMESTAMP '2024-01-03'
      |)
      |SELECT event_type, count(*)::BIGINT AS cnt,
      |  sum(round(val * 1000000)::BIGINT)::BIGINT AS val_micro,
      |  sum(round(quality * 1000000)::BIGINT)::BIGINT AS q_micro
      |FROM allr GROUP BY event_type ORDER BY event_type""".stripMargin

  /** DATA SKIPPING on per-segment VALUE-column statistics (the
    * Delta/Iceberg file-stats idea on the manifest): every write
    * records each value column's (min, max) per segment file, and a
    * SQL WHERE on a value column drops segments whose recorded range
    * is disjoint — before any file opens. The series carries a value
    * column correlated with the index (day-banded), the regime where
    * stats prune; the query requires that segments actually skipped
    * (probe) and the aggregate must match the oracle's recompute. */
  def q191_data_skipping(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val repo = new Repo(root, s)
    val clct = repo.createCollection(GSchema(
      "ts" -> "timestamp*", "event_id" -> "int*",
      "vband" -> "float", "event_type" -> "str"), "events")
    val sr = clct.series("_")
    val src = eventsDf(s, dir).withColumn("vband",
      col("value") + dayofmonth(col("ts")) * lit(1000.0))
      .select(col("ts"), col("event_id"), col("vband"),
        col("event_type"))
    // four disjoint index windows -> at least four segments, so the
    // band predicate has something to skip at every SF
    val cuts = Seq("2024-01-05", "2024-01-10", "2024-01-15")
    val conds =
      (col("ts") < lit(cuts.head).cast("timestamp")) +:
        cuts.sliding(2).toSeq.collect { case Seq(a, b) =>
          col("ts") >= lit(a).cast("timestamp") &&
            col("ts") < lit(b).cast("timestamp") } :+
        (col("ts") >= lit(cuts.last).cast("timestamp"))
    conds.foreach(c => sr.write(src.filter(c)))
    s.read.format("graft").option("path", root)
      .option("collection", "events").option("series", "_").load()
      .createOrReplaceTempView("gq191")
    graft.sources.GraftScanProbe.lastStatSkipped = -1
    val out = s.sql(
      """SELECT event_type, count(*) AS cnt,
        |  sum(cast(round(vband * 1000000, 0) AS bigint)) AS v_micro
        |FROM gq191
        |WHERE vband >= 3000.0 AND vband < 4000.0
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
    val n = out.count() // force planning + execution once
    require(n > 0, "day-3 band must be non-empty")
    require(graft.sources.GraftScanProbe.lastStatSkipped >= 3,
      s"value stats should skip the other windows, skipped=" +
        s"${graft.sources.GraftScanProbe.lastStatSkipped}")
    out
  }

  val q191_oracle: String =
    """SELECT event_type, count(*)::BIGINT AS cnt,
      |  sum(round((value + date_part('day', ts) * 1000)
      |    * 1000000)::BIGINT)::BIGINT AS v_micro
      |FROM events
      |WHERE value + date_part('day', ts) * 1000 >= 3000
      |  AND value + date_part('day', ts) * 1000 < 4000
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** SQL history + revision-pinned time travel: two INSERT commits,
    * `CALL sys.history` lists them (ids, commit times, row counts),
    * and `VERSION AS OF '<first revision id>'` reproduces exactly the
    * first batch — the oracle recomputes that batch from the raw
    * table, so a wrong snapshot (or a history row misordered /
    * miscounted) hash-mismatches. */
  def q192_sql_history(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val cat = "gq192_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.path", root)
    s.sql(
      s"""CREATE TABLE $cat.events.ev
         |(ts TIMESTAMP, event_id BIGINT, value DOUBLE,
         | event_type STRING)
         |PARTITIONED BY (ts, event_id)""".stripMargin)
    eventsDf(s, dir).createOrReplaceTempView("gq192_src")
    s.sql(s"INSERT INTO $cat.events.ev SELECT * FROM gq192_src " +
      s"WHERE ts < TIMESTAMP '2024-01-10 00:00:00'")
    s.sql(s"INSERT INTO $cat.events.ev SELECT * FROM gq192_src " +
      s"WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'")
    val hist = s.sql(s"CALL $cat.sys.history('events')").collect()
    require(hist.length == 2 && hist.last.getBoolean(3),
      s"history: ${hist.mkString(",")}")
    val rev1 = hist(0).getString(0)
    s.sql(
      s"""SELECT event_type, count(*) AS cnt,
         |  sum(cast(round(value * 1000000, 0) AS bigint)) AS val_micro
         |FROM $cat.events.ev VERSION AS OF '$rev1'
         |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val q192_oracle: String =
    """SELECT event_type, count(*)::BIGINT AS cnt,
      |  sum(round(value * 1000000)::BIGINT)::BIGINT AS val_micro
      |FROM events WHERE ts < TIMESTAMP '2024-01-10'
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** STATS BACKFILL (`CALL sys.analyze`): the q191 series is first
    * stripped of its value stats (one raw manifest recommit — what a
    * store written before stats existed looks like), then analyze's
    * one-job scan + one-commit backfill restores them, and the same
    * band query must both SKIP segments again (probe requirement)
    * and agree with the oracle recompute. */
  def q193_analyze_backfill(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val repo = new Repo(root, s)
    val clct = repo.createCollection(GSchema(
      "ts" -> "timestamp*", "event_id" -> "int*",
      "vband" -> "float", "event_type" -> "str"), "events")
    val sr = clct.series("_")
    val src = eventsDf(s, dir).withColumn("vband",
      col("value") + dayofmonth(col("ts")) * lit(1000.0))
      .select(col("ts"), col("event_id"), col("vband"),
        col("event_type"))
    val cuts = Seq("2024-01-05", "2024-01-10", "2024-01-15")
    val conds =
      (col("ts") < lit(cuts.head).cast("timestamp")) +:
        cuts.sliding(2).toSeq.collect { case Seq(a, b) =>
          col("ts") >= lit(a).cast("timestamp") &&
            col("ts") < lit(b).cast("timestamp") } :+
        (col("ts") >= lit(cuts.last).cast("timestamp"))
    conds.foreach(c => sr.write(src.filter(c)))
    // strip stats (simulated legacy store), then backfill via SQL
    val leaf = clct.changelog.leaf().get
    val m = clct.decodePayload(clct.changelog.payload(leaf))
    clct.commitManifest(graft.core.Manifest(m.schema,
      m.rows.map(_.copy(vstats = None))),
      parents = Seq(leaf.child))
    clct.refresh()
    val cat = "gq193_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.path", root)
    val analyzed = s.sql(s"CALL $cat.sys.analyze('events')")
      .collect()(0).getLong(1)
    require(analyzed >= conds.length,
      s"analyze should backfill every segment, got $analyzed")
    s.read.format("graft").option("path", root)
      .option("collection", "events").option("series", "_").load()
      .createOrReplaceTempView("gq193")
    graft.sources.GraftScanProbe.lastStatSkipped = -1
    val out = s.sql(
      """SELECT event_type, count(*) AS cnt,
        |  sum(cast(round(vband * 1000000, 0) AS bigint)) AS v_micro
        |FROM gq193
        |WHERE vband >= 3000.0 AND vband < 4000.0
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
    require(out.count() > 0)
    require(graft.sources.GraftScanProbe.lastStatSkipped >= 3,
      s"backfilled stats should skip, skipped=" +
        s"${graft.sources.GraftScanProbe.lastStatSkipped}")
    out
  }

  val q193_oracle: String =
    """SELECT event_type, count(*)::BIGINT AS cnt,
      |  sum(round((value + date_part('day', ts) * 1000)
      |    * 1000000)::BIGINT)::BIGINT AS v_micro
      |FROM events
      |WHERE value + date_part('day', ts) * 1000 >= 3000
      |  AND value + date_part('day', ts) * 1000 < 4000
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Incremental CRAWL REFRESH via MERGE INTO — the continuous-
    * curation shape of a training-data store: a curated table
    * (doc_id-indexed quality scores) takes a re-crawl batch in ONE
    * atomic MERGE — re-fetched docs update their quality score in
    * place (copy-on-write over only the touched segments), newly
    * discovered docs insert into free index space — and the refreshed
    * table must aggregate exactly like the oracle's CASE/UNION
    * recompute. Each refresh is one revision: yesterday's curation
    * stays time-travelable for dataset reproducibility. */
  def q194_crawl_refresh(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val cat = "gq194_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.path", root)
    s.sql(
      s"""CREATE TABLE $cat.cur.docs
         |(doc_id BIGINT, lang STRING, q_ppm BIGINT)
         |PARTITIONED BY (doc_id)""".stripMargin)
    Tables.table(s, dir, "documents")
      .createOrReplaceTempView("gq194_src")
    s.sql(
      s"""INSERT INTO $cat.cur.docs
         |SELECT doc_id, lang, least(1000000, n_chars * 100)
         |FROM gq194_src""".stripMargin)
    val shift = s.sql("SELECT max(doc_id) + 1 FROM gq194_src")
      .collect()(0).getLong(0)
    s.sql(
      s"""MERGE INTO $cat.cur.docs t USING (
         |  SELECT doc_id, lang,
         |    cast(least(1000000, n_chars * 120) AS bigint) AS q_ppm
         |  FROM gq194_src WHERE doc_id % 5 = 0
         |  UNION ALL
         |  SELECT doc_id + $shift, lang,
         |    cast(n_chars * 50 AS bigint)
         |  FROM gq194_src WHERE doc_id % 7 = 0
         |) src ON t.doc_id = src.doc_id
         |WHEN MATCHED THEN UPDATE SET q_ppm = src.q_ppm
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    s.sql(
      s"""SELECT lang, count(*) AS cnt, sum(q_ppm) AS q_sum
         |FROM $cat.cur.docs
         |GROUP BY lang ORDER BY lang""".stripMargin)
  }

  val q194_oracle: String =
    """WITH cur AS (
      |  SELECT lang,
      |    CASE WHEN doc_id % 5 = 0
      |      THEN least(1000000, n_chars * 120)
      |      ELSE least(1000000, n_chars * 100) END AS q_ppm
      |  FROM documents
      |), ins AS (
      |  SELECT lang, n_chars * 50 AS q_ppm
      |  FROM documents WHERE doc_id % 7 = 0
      |), allr AS (
      |  SELECT * FROM cur UNION ALL SELECT * FROM ins
      |)
      |SELECT lang, count(*)::BIGINT AS cnt,
      |  sum(q_ppm)::BIGINT AS q_sum
      |FROM allr GROUP BY lang ORDER BY lang""".stripMargin

  /** METADATA-ONLY TOKEN BUDGET: `SELECT count(*), sum(tokens)` over
    * a corpus-accounting series answers from the manifest alone —
    * per-segment row counts plus the round-9 per-segment INTEGER
    * column sums (exact, overflow-guarded) — zero file IO, the query
    * a training scheduler runs before every mixture decision. The
    * probe requires the aggregate actually came from metadata. */
  def q195_token_budget(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val repo = new Repo(root, s)
    val clct = repo.createCollection(GSchema(
      "doc_id" -> "int*", "tokens" -> "int"), "budget")
    clct.embedMaxSize = 0L
    clct.series("_").write(
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars").as("tokens")))
    s.read.format("graft").option("path", root)
      .option("collection", "budget").option("series", "_").load()
      .createOrReplaceTempView("gq195")
    graft.sources.GraftScanProbe.lastAggPushed = false
    val out = s.sql(
      """SELECT count(*) AS docs, sum(tokens) AS total_tokens
        |FROM gq195""".stripMargin)
    require(out.count() == 1)
    require(graft.sources.GraftScanProbe.lastAggPushed,
      "token budget must answer from manifest metadata")
    out
  }

  val q195_oracle: String =
    """SELECT count(*)::BIGINT AS docs,
      |  sum(n_chars)::BIGINT AS total_tokens
      |FROM documents""".stripMargin

  /** AS-OF-REVISION temporal join — the versioned store as a slowly-
    * changing dimension: a per-type score series commits one revision
    * per day (days 1-5), and each event joins to the score the store
    * held AT ITS OWN DAY's revision — five pinned time-travel reads
    * (`frame(beforeMs)`) unioned with their day tag, then a broadcast
    * join. No snapshot copies, no SCD bookkeeping columns: history IS
    * the dimension table. The oracle recomputes the closed-form score
    * (day*100 + strlen(type)), so reading any wrong revision
    * hash-mismatches. */
  def q196_asof_revision_join(s: SparkSession, dir: String)
      : DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val repo = new Repo(root, s)
    val clct = repo.createCollection(GSchema(
      "event_type" -> "str*", "score" -> "int"), "scores")
    val sr = clct.series("_")
    val types = eventsDf(s, dir).select(col("event_type")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    // one revision per day: score(type, d) = d*100 + strlen(type)
    val dayMs = (1 to 5).map { d =>
      import s.implicits._
      sr.write(types.map(t =>
        (t, d * 100L + t.length)).toDF("event_type", "score"))
      Thread.sleep(5)
      d -> (clct.changelog.leaf().get.epochMs + 1L)
    }
    // five pinned snapshots, tagged with their day
    val snaps = dayMs.map { case (d, ms) =>
      sr.frame(beforeMs = Some(ms))
        .withColumn("day", lit(d))
    }.reduce(_.unionByName(_))
    val ev = eventsDf(s, dir)
      .withColumn("day", dayofmonth(col("ts")))
      .filter(col("day").between(1, 5))
    ev.join(broadcast(snaps), Seq("event_type", "day"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("score")).as("score_sum"))
      .orderBy(col("event_type"))
  }

  val q196_oracle: String =
    """SELECT event_type, count(*)::BIGINT AS cnt,
      |  sum(date_part('day', ts) * 100
      |    + length(event_type))::BIGINT AS score_sum
      |FROM events
      |WHERE date_part('day', ts) BETWEEN 1 AND 5
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** replaceWhere OVERWRITE (`df.writeTo(t).overwrite(cond)`) — the
    * day-backfill idiom: recompute one index window and atomically
    * replace exactly that window (tombstone + splice, one commit;
    * rows outside the declared range are refused before commit).
    * Days [10, 14) are re-ingested with corrected (doubled) values
    * and only even event_ids retained; the aggregate must match the
    * oracle's CASE recompute of the same surgery. */
  def q197_replace_where(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val cat = "gq197_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.path", root)
    s.sql(
      s"""CREATE TABLE $cat.events.ev
         |(ts TIMESTAMP, event_id BIGINT, value DOUBLE,
         | event_type STRING)
         |PARTITIONED BY (ts, event_id)""".stripMargin)
    eventsDf(s, dir).createOrReplaceTempView("gq197_src")
    s.sql(s"INSERT INTO $cat.events.ev SELECT * FROM gq197_src")
    val lo = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val hi = java.sql.Timestamp.valueOf("2024-01-14 00:00:00")
    eventsDf(s, dir)
      .filter(col("ts") >= lit(lo) && col("ts") < lit(hi) &&
        col("event_id") % 2 === 0)
      .withColumn("value", col("value") * 2)
      .writeTo(s"$cat.events.ev")
      .overwrite(col("ts") >= lit(lo) && col("ts") < lit(hi))
    s.sql(
      s"""SELECT event_type, count(*) AS cnt,
         |  sum(cast(round(value * 1000000, 0) AS bigint)) AS val_micro
         |FROM $cat.events.ev
         |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val q197_oracle: String =
    """SELECT event_type, count(*)::BIGINT AS cnt,
      |  sum(round(CASE WHEN ts >= TIMESTAMP '2024-01-10'
      |                  AND ts < TIMESTAMP '2024-01-14'
      |            THEN value * 2 ELSE value END * 1000000)::BIGINT
      |    )::BIGINT AS val_micro
      |FROM events
      |WHERE NOT (ts >= TIMESTAMP '2024-01-10'
      |           AND ts < TIMESTAMP '2024-01-14'
      |           AND event_id % 2 <> 0)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** RIGHT-TO-BE-FORGOTTEN in a versioned store — the governance flow
    * a time-travelable engine must make watertight: a value-predicate
    * SQL DELETE removes one source's documents (copy-on-write over
    * the touched segments), then `CALL sys.squash` collapses the
    * changelog (no revision can resurrect them) and `CALL sys.gc`
    * reaps the now-unreferenced pre-delete segment files. The query
    * REQUIRES files were actually collected and that zero rows of the
    * forgotten source survive; the aggregate must match the oracle's
    * recompute over everything else. */
  def q199_forget_source(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val cat = "gq199_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.path", root)
    s.sql(
      s"""CREATE TABLE $cat.docs.corpus
         |(doc_id BIGINT, source STRING, lang STRING, n_chars BIGINT)
         |PARTITIONED BY (doc_id)""".stripMargin)
    Tables.table(s, dir, "documents")
      .createOrReplaceTempView("gq199_src")
    s.sql(s"INSERT INTO $cat.docs.corpus " +
      s"SELECT doc_id, source, lang, n_chars FROM gq199_src")
    val victim = s.sql(
      "SELECT source FROM gq199_src GROUP BY source " +
        "ORDER BY count(*) DESC, source LIMIT 1")
      .collect()(0).getString(0)
    s.sql(s"DELETE FROM $cat.docs.corpus WHERE source = '$victim'")
    require(s.sql(s"CALL $cat.sys.squash('docs')").collect()(0)
      .getLong(2) == 1L)
    val collected = s.sql(s"CALL $cat.sys.gc(timeout_ms => 0)")
      .collect()(0).getLong(0)
    require(collected >= 1L,
      s"gc must reap the pre-delete files, collected=$collected")
    require(s.sql(
      s"SELECT count(*) FROM $cat.docs.corpus WHERE source = '$victim'")
      .collect()(0).getLong(0) == 0L, "forgotten source must be gone")
    s.sql(
      s"""SELECT source, lang, count(*) AS cnt,
         |  sum(n_chars) AS chars
         |FROM $cat.docs.corpus
         |GROUP BY source, lang ORDER BY source, lang""".stripMargin)
  }

  val q199_oracle: String =
    """WITH victim AS (
      |  SELECT source FROM documents GROUP BY source
      |  ORDER BY count(*) DESC, source LIMIT 1
      |)
      |SELECT source, lang, count(*)::BIGINT AS cnt,
      |  sum(n_chars)::BIGINT AS chars
      |FROM documents
      |WHERE source <> (SELECT source FROM victim)
      |GROUP BY source, lang ORDER BY source, lang""".stripMargin

  /** DATASET RELEASE capstone — the end-to-end flow a training-data
    * team ships: quality-filter the corpus, exact-dedup by content
    * hash (first doc_id wins), land the release as a versioned series
    * (one squash = one citable revision), answer the release's token
    * budget from MANIFEST METADATA alone (count + integer-sum
    * pushdown, probe-required), and publish the per-language card.
    * The oracle recomputes the same curation in one SQL statement, so
    * any stage corrupting rows hash-mismatches. */
  def q200_dataset_release(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val repo = new Repo(root, s)
    val clct = repo.createCollection(GSchema(
      "doc_id" -> "int*", "lang" -> "str", "tokens" -> "int"),
      "release")
    clct.embedMaxSize = 0L
    Tables.table(s, dir, "documents")
      .createOrReplaceTempView("gq200_src")
    val curated = s.sql(
      """SELECT doc_id, lang, n_chars AS tokens FROM (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY md5(text)
        |                       ORDER BY doc_id) AS rn
        |  FROM gq200_src WHERE n_chars >= 200
        |) WHERE rn = 1""".stripMargin)
    clct.series("_").write(curated)
    val cat = "gq200_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.path", root)
    require(s.sql(s"CALL $cat.sys.squash('release')").collect()(0)
      .getLong(2) == 1L, "a release is one citable revision")
    s.read.format("graft").option("path", root)
      .option("collection", "release").option("series", "_").load()
      .createOrReplaceTempView("gq200_rel")
    graft.sources.GraftScanProbe.lastAggPushed = false
    val budget = s.sql(
      "SELECT count(*), sum(tokens) FROM gq200_rel").collect()(0)
    require(graft.sources.GraftScanProbe.lastAggPushed,
      "the release's token budget must answer from metadata")
    require(budget.getLong(0) > 0L && budget.getLong(1) > 0L)
    s.sql(
      """SELECT lang, count(*) AS cnt, sum(tokens) AS tokens
        |FROM gq200_rel GROUP BY lang ORDER BY lang""".stripMargin)
  }

  val q200_oracle: String =
    """WITH curated AS (
      |  SELECT doc_id, lang, n_chars FROM (
      |    SELECT doc_id, lang, n_chars,
      |      row_number() OVER (PARTITION BY md5(text)
      |                         ORDER BY doc_id) AS rn
      |    FROM documents WHERE n_chars >= 200
      |  ) WHERE rn = 1
      |)
      |SELECT lang, count(*)::BIGINT AS cnt,
      |  sum(n_chars)::BIGINT AS tokens
      |FROM curated GROUP BY lang ORDER BY lang""".stripMargin

  /** METADATA TABLES ([[graft.sources.GraftMetaTable]]): 4-part names
    * `cat.<collection>.<series>.segments|.history` expose the leaf
    * manifest and the changelog as relations served by a DRIVER-LOCAL
    * scan (Spark's DSv2 `LocalScan` → `LocalTableScanExec`): metadata
    * queries cost zero Spark jobs, like the engine's own metadata
    * operations. The query appends the events table twice (two
    * revisions), REQUIRES the zero-job plan, then reconciles the
    * store's self-reported state — `sum(rows)` over `segments` now
    * and `VERSION AS OF` the first revision, plus revision count and
    * leaf row count from `history` — against the oracle's recompute
    * from the raw source. */
  def q201_meta_tables(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val cat = "gq201_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.path", root)
    s.sql(
      s"""CREATE TABLE $cat.events.ev
         |(ts TIMESTAMP, event_id BIGINT, value DOUBLE,
         | event_type STRING)
         |PARTITIONED BY (ts, event_id)""".stripMargin)
    eventsDf(s, dir).createOrReplaceTempView("gq201_src")
    s.sql(s"INSERT INTO $cat.events.ev SELECT * FROM gq201_src")
    s.sql(
      s"""INSERT INTO $cat.events.ev
         |SELECT ts + INTERVAL 1000 DAY AS ts, event_id, value,
         |  event_type
         |FROM gq201_src""".stripMargin)
    val seg = s.sql(
      s"SELECT sum(rows) AS r FROM $cat.events.ev.segments")
    require(seg.queryExecution.executedPlan.toString
      .contains("LocalTableScan"),
      "metadata tables must plan as a driver-local scan (zero jobs), " +
        s"got:\n${seg.queryExecution.executedPlan}")
    val rev = s.sql(
      s"""SELECT revision FROM $cat.events.ev.history
         |ORDER BY committed_at LIMIT 1""".stripMargin)
      .collect()(0).getString(0)
    s.sql(
      s"""SELECT t.total_rows, f.first_rows, h.n_revisions, h.leaf_rows
         |FROM (SELECT sum(rows) AS total_rows
         |      FROM $cat.events.ev.segments) t
         |CROSS JOIN (SELECT sum(rows) AS first_rows
         |            FROM $cat.events.ev.segments
         |            VERSION AS OF '$rev') f
         |CROSS JOIN (SELECT count(*) AS n_revisions,
         |              max(rows) AS leaf_rows
         |            FROM $cat.events.ev.history) h""".stripMargin)
  }

  val q201_oracle: String =
    """SELECT (2 * count(*))::BIGINT AS total_rows,
      |  count(*)::BIGINT AS first_rows,
      |  2::BIGINT AS n_revisions,
      |  (2 * count(*))::BIGINT AS leaf_rows
      |FROM events""".stripMargin

  /** `CALL sys.restore` — the Delta RESTORE / Iceberg
    * rollback_to_snapshot verb ([[graft.sources.GraftProcedures]]):
    * a bad deploy UPDATEs and DELETEs the table, then restore commits
    * the pre-deploy revision's manifest FORWARD as the new leaf (the
    * undone revisions remain time-travelable; restore is itself
    * undoable). The aggregate afterwards must equal the oracle's
    * recompute over the UNTOUCHED source — the q199 complement:
    * forget proves deletes are permanent, restore proves mistakes
    * are not. */
  def q202_restore(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val cat = "gq202_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.path", root)
    s.sql(
      s"""CREATE TABLE $cat.events.ev
         |(ts TIMESTAMP, event_id BIGINT, value DOUBLE,
         | event_type STRING)
         |PARTITIONED BY (ts, event_id)""".stripMargin)
    eventsDf(s, dir).createOrReplaceTempView("gq202_src")
    s.sql(s"INSERT INTO $cat.events.ev SELECT * FROM gq202_src")
    val rev1 = s.sql(
      s"""SELECT revision FROM $cat.events.ev.history
         |ORDER BY committed_at LIMIT 1""".stripMargin)
      .collect()(0).getString(0)
    // the bad deploy: corrupt half the values, drop a whole day
    s.sql(
      s"""UPDATE $cat.events.ev SET value = value * 1000
         |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'""".stripMargin)
    s.sql(
      s"""DELETE FROM $cat.events.ev
         |WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
         |  AND ts < TIMESTAMP '2024-01-04 00:00:00'""".stripMargin)
    val r = s.sql(
      s"CALL $cat.sys.restore('events', '$rev1')").collect()(0)
    require(r.getString(1) == rev1 && r.getLong(3) > 0L,
      s"restore must land on $rev1: $r")
    s.sql(
      s"""SELECT event_type, count(*) AS cnt,
         |  sum(event_id) AS id_sum,
         |  sum(cast(round(value * 1000000, 0) AS bigint)) AS val_micro
         |FROM $cat.events.ev
         |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val q202_oracle: String =
    """SELECT event_type, count(*)::BIGINT AS cnt,
      |  sum(event_id)::BIGINT AS id_sum,
      |  sum(round(value * 1000000)::BIGINT)::BIGINT AS val_micro
      |FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** `_file` PROVENANCE column × `.segments` metadata — the
    * surgical-repair reconciliation: every row names the segment file
    * serving it (hidden metadata column, projected as a
    * per-partition constant — zero extra IO), grouped per-file counts
    * must equal the manifest's per-segment planning lengths (exact
    * for the append-only table), and the file sets must coincide.
    * The REQUIREs prove the join; the returned aggregate is the
    * oracle-stable reconciliation summary. */
  def q203_file_provenance(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val cat = "gq203_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.path", root)
    s.sql(
      s"""CREATE TABLE $cat.events.ev
         |(ts TIMESTAMP, event_id BIGINT, value DOUBLE,
         | event_type STRING)
         |PARTITIONED BY (ts, event_id)""".stripMargin)
    eventsDf(s, dir).createOrReplaceTempView("gq203_src")
    s.sql(s"INSERT INTO $cat.events.ev SELECT * FROM gq203_src")
    // per-file row counts from the hidden provenance column...
    val perFile = s.sql(
      s"""SELECT _file AS f, count(*) AS c
         |FROM $cat.events.ev GROUP BY _file""".stripMargin)
    // ...reconciled against the manifest's segments metadata table
    val segs = s.sql(
      s"""SELECT explode(files) AS f, rows
         |FROM $cat.events.ev.segments""".stripMargin)
    val joined = perFile.join(segs, "f").collect()
    require(joined.nonEmpty && joined.forall(r =>
      r.getAs[Long]("c") == r.getAs[Long]("rows")),
      s"per-file counts must equal segment planning lengths: " +
        joined.take(3).mkString(", "))
    require(perFile.count() == segs.count(),
      "provenance and manifest must name the same file set")
    s.sql(
      s"""SELECT count(*) AS total_rows,
         |  count(_file) AS with_file,
         |  count(*) - count(_file) AS inline_rows
         |FROM $cat.events.ev""".stripMargin)
  }

  val q203_oracle: String =
    """SELECT count(*)::BIGINT AS total_rows,
      |  count(*)::BIGINT AS with_file,
      |  0::BIGINT AS inline_rows
      |FROM events""".stripMargin

  /** Persisted `page_len` table property: `CREATE TABLE ...
    * TBLPROPERTIES ('page_len'='N')` sizes segment granularity in the
    * REGISTRY (survives reopen — [[graft.api.Repo.RegEntry]]), so one
    * INSERT lands ceil(rows/N) files instead of one monolith and a
    * narrow COW UPDATE's runtime group filter rewrites only the
    * covering segments (Delta's target-file-size knob, applied to the
    * versioned store). The query asserts the BOUNDED page_len
    * contract (an exact file count would pin one AQE outcome, not
    * the contract): every segment holds ≤ page_len rows, the lengths
    * sum to the inserted row count, and the only sub-full files are
    * per-write-task remainder pages (at most one per task, tasks
    * bounded by the session's shuffle parallelism) — plus, when the
    * table has enough segments to prune, that the UPDATE scanned
    * strictly fewer than all of them. The oracle recomputes the
    * mutated aggregate. */
  def q204_page_len(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val cat = "gq204_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.path", root)
    s.sql(
      s"""CREATE TABLE $cat.events.ev
         |(ts TIMESTAMP, event_id BIGINT, value DOUBLE,
         | event_type STRING)
         |PARTITIONED BY (ts, event_id)
         |TBLPROPERTIES ('page_len' = '2000')""".stripMargin)
    eventsDf(s, dir).createOrReplaceTempView("gq204_src")
    s.sql(s"INSERT INTO $cat.events.ev SELECT * FROM gq204_src")
    val nRows = s.table("gq204_src").count()
    // page_len persists in the registry: a FRESH repo handle (no
    // session state) must reopen the collection at 2000 rows/page
    val reopened = new graft.api.Repo(root, s)
      .collection("events").get
    require(reopened.pageLen == 2000L,
      s"page_len must persist across reopen, got ${reopened.pageLen}")
    val segs = reopened.series("ev").segments().filter(_.meta.hasData)
    val nSegs = segs.size.toLong
    val expect = (nRows + 1999L) / 2000L
    // The page_len contract for a DISTRIBUTED writer: no segment
    // exceeds page_len rows, (nearly) all pages are full, and the
    // only sub-full files are the per-task remainders. The write
    // stage's task count is AQE's call (Distributions.ordered lets
    // Spark size the exchange), so the EXACT file count is
    // legitimately plan-dependent — requiring exactly
    // ceil(rows/page_len) pinned one AQE outcome, not the contract,
    // and a loaded full-suite run once planned the insert as two
    // tasks -> 51 files of <=2000 rows (each task's tail page
    // sub-full), which is a correct layout at any scale.
    val lens = segs.map(_.meta.length)
    require(lens.forall(_ <= 2000L),
      s"segment over page_len: ${lens.max} rows")
    require(lens.sum == nRows,
      s"segment lengths sum to ${lens.sum}, inserted $nRows")
    // each write task emits at most ONE sub-full remainder page, and
    // AQE cannot plan the write exchange wider than the session's
    // shuffle parallelism — a DERIVED bound (was a magic `slack = 8`
    // that a heavily loaded run planning >8 coalesced tasks would
    // have re-flaked): sub-full count ≤ max task count, and with
    // lengths ≤ page_len summing to nRows, nSegs ∈
    // [expect, expect + subFull] follows arithmetically.
    val subFull = lens.count(_ < 2000L)
    val maxTasks =
      s.conf.get("spark.sql.shuffle.partitions").toLong
    require(subFull <= maxTasks,
      s"$subFull sub-full pages exceed the $maxTasks-task bound — " +
        "some task split a page it should have filled")
    require(nSegs >= expect && nSegs <= expect + subFull,
      s"expected $expect..${expect + subFull} segments of <=2000 " +
        s"rows for $nRows rows, got $nSegs")
    graft.sources.GraftScanProbe.lastRuntimeScanned = -1
    graft.sources.GraftScanProbe.lastSegmentsTotal = -1
    s.sql(
      s"""UPDATE $cat.events.ev SET value = value * 3
         |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
         |  AND ts < TIMESTAMP '2024-01-07 00:00:00'""".stripMargin)
    // the narrow UPDATE's group selection must have pruned the
    // rewrite to a strict subset of the segments (only checkable when
    // the index span actually splits across enough pages) — and since
    // its condition is a pure index range, the selection must have
    // been STATIC (manifest bound, no runtime subquery planned)
    if (nSegs >= 8) {
      val scanned = graft.sources.GraftScanProbe.lastRuntimeScanned
      val total = graft.sources.GraftScanProbe.lastSegmentsTotal
      require(scanned > 0 && scanned < total,
        s"COW UPDATE must rewrite a strict segment subset, " +
          s"scanned $scanned of $total")
      require(graft.sources.GraftScanProbe.lastCowStatic,
        "index-range UPDATE must select groups statically")
    }
    s.sql(
      s"""SELECT event_type, count(*) AS cnt,
         |  sum(cast(round(value * 1000000, 0) AS bigint)) AS val_micro
         |FROM $cat.events.ev
         |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val q204_oracle: String =
    """SELECT event_type, count(*)::BIGINT AS cnt,
      |  sum(round(CASE WHEN ts >= TIMESTAMP '2024-01-05'
      |    AND ts < TIMESTAMP '2024-01-07' THEN value * 3
      |    ELSE value END * 1000000)::BIGINT)::BIGINT AS val_micro
      |FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Concurrent ingest at reference scale under racing maintenance
    * (reference tests/concurrent_test.py:31-91): 20 writers — each
    * with its OWN Repo handle, like the reference's per-worker
    * `Repo(pod=single_pod)` — write disjoint ~one-writer-year 1-min
    * ranges of ONE series label while a maintenance thread loops
    * defrag+trim and a final gc races the tail writers. Racing
    * commits fork the changelog; merge() heals; the read-back (which
    * resurrects any segment gc buried mid-race, Series.scala:840)
    * must reproduce every row — the oracle recomputes the full
    * 1,051,200-row grid from scratch. This is the normal production
    * mode (continuous ingest + background compaction) and the one
    * reference test family previously gated by ScalaTest only. */
  def q205_concurrent_ingest(s: SparkSession, dir: String): DataFrame = {
    val _ = dir // fixed synthetic grid: the oracle regenerates it
    val root = java.nio.file.Files
      .createTempDirectory("graft-conc205").toString
    val schema = GSchema("ts" -> "timestamp*", "value" -> "int")
    val repo = new Repo(root, s)
    repo.createCollection(schema, "conc")
    val nWriters = 20
    val per = 52560L // one writer-year of minutes; 1,051,200 total
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val errors =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writersDone = new java.util.concurrent.CountDownLatch(nWriters)
    (0 until nWriters).foreach { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          try {
            // fresh handle per writer: no shared changelog cache
            val sr = new Repo(root, s).collection("conc").get
              .series("my_label")
            sr.write(s.range(w * per, (w + 1) * per, 1, 4)
              .selectExpr("timestamp_seconds(946684800 + id * 60) AS ts",
                "cast(id % 997 AS int) AS value"))
          } catch { case t: Throwable => errors.add(t); () }
          finally writersDone.countDown()
        }
      })
    }
    // maintenance races the writers on a DEDICATED thread — submitted
    // to the 8-thread FIFO pool it would queue behind all 20 writers
    // and only ever race the last few; a separate thread contends
    // with the busiest interleavings from the first write on
    val maintDone = new java.util.concurrent.CountDownLatch(1)
    val maint = new Thread(() => {
      try {
        val c = new Repo(root, s).collection("conc").get
        var i = 0
        while (i < 10) {
          c.refresh(); c.defrag(1)
          // reference trim() cutoff: now - 2x the 600 s write
          // timeout (utils.py:40) — the operational contract that
          // makes trim SAFE against in-flight writers: a revision
          // younger than the longest possible write batch may carry
          // unmerged data and must survive
          c.trim(System.currentTimeMillis() - 1200000L)
          Thread.sleep(50); i += 1
        }
        new Repo(root, s).gc()
        ()
      } catch { case t: Throwable => errors.add(t); () }
      finally maintDone.countDown()
    }, "q205-maintenance")
    maint.start()
    require(writersDone.await(1200,
      java.util.concurrent.TimeUnit.SECONDS), "q205 writers timed out")
    require(maintDone.await(600,
      java.util.concurrent.TimeUnit.SECONDS), "q205 maintenance hung")
    pool.shutdown()
    require(errors.isEmpty,
      s"q205 concurrent write/maintenance failed: ${errors.peek()}")
    // racing commits fork; merge until the changelog converges
    val clct = repo.collection("conc").get
    clct.refresh(); clct.merge(); clct.refresh()
    var guard = 0
    while (clct.changelog.leafs().length > 1 && guard < 30) {
      clct.merge(); clct.refresh(); guard += 1
    }
    require(clct.changelog.leafs().length == 1,
      s"q205 merge did not converge: ${clct.changelog.leafs().length}")
    clct.series("my_label").frame().createOrReplaceTempView("gq205")
    s.sql(
      """SELECT cast(year(ts) AS bigint) AS y,
        |  cast(month(ts) AS bigint) AS m,
        |  count(*) AS n_rows, sum(cast(value AS bigint)) AS sum_val,
        |  min(ts) AS min_ts, max(ts) AS max_ts
        |FROM gq205 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** S3 wire-protocol POD, oracle-gated the way q132 gated HTTP: an
    * engine write lands parquet segments through the S3 REST protocol
    * (multipart PUT, ranged GET, paginated ListObjectsV2 against a
    * live [[graft.core.S3Server]] port), then the CONNECTOR reads the
    * series back over `s3net://` — SQL door in, wire protocol down.
    * The returned frame is pinned before the fixture server stops. */
  def q206_s3_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val server = new graft.core.S3Server(maxKeysCap = 7)
    val endpoint = server.start()
    try {
      graft.core.S3NetFileSystem.install(
        s.sparkContext.hadoopConfiguration, endpoint)
      // JVM-global fallback: task-side and store-private Configurations
      // are fresh copies that never saw the session conf
      graft.core.S3NetFileSystem.setDefaultEndpoint(endpoint)
      // segment parquet files big enough to exercise multipart
      s.sparkContext.hadoopConfiguration
        .setLong("fs.s3net.multipart.threshold", 64L * 1024)
      val rootUri = "s3net://gq206/repo"
      val repo = Repo(rootUri, s)
      val clct = repo.createCollection(eventsSchema, "events")
      clct.embedMaxSize = 0L // parquet segments THROUGH the http fs
      val sr = clct.series("_")
      sr.write(eventsDf(s, dir)
        .filter(col("ts") < lit("2024-01-08").cast("timestamp")))
      val got = s.read.format("graft")
        .option("path", rootUri)
        .option("collection", "events").option("series", "_").load()
        .select(out.map(col): _*)
        .orderBy(col("event_id")).localCheckpoint(true)
      require(server.listPagesServed.get() > 0,
        "listings must page through ListObjectsV2")
      require(server.rangedGets.get() > 0,
        "parquet reads must issue ranged GETs")
      got
    } finally {
      server.stop() // the JDK dispatcher thread is non-daemon:
                    // a leaked server pins the JVM open
      // the JVM-global endpoint fallback must not outlive its server:
      // a later s3net:// open relying on it would dial a dead port
      // with a confusing connection error far from this query
      graft.core.S3NetFileSystem.setDefaultEndpoint(null)
    }
  }

  val q206_oracle: String =
    """SELECT event_id, ts, value FROM events
      |WHERE ts < TIMESTAMP '2024-01-08' ORDER BY event_id""".stripMargin

  val q205_oracle: String =
    """SELECT cast(year(ts) AS BIGINT) AS y,
      |  cast(month(ts) AS BIGINT) AS m,
      |  count(*)::BIGINT AS n_rows,
      |  cast(sum(k % 997) AS BIGINT) AS sum_val,
      |  min(ts) AS min_ts, max(ts) AS max_ts
      |FROM (SELECT k, TIMESTAMP '2000-01-01' + to_minutes(k) AS ts
      |      FROM range(0, 1051200) t(k))
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Multi-PROCESS concurrent ingest (reference
    * tests/concurrent_test.py:31-57, which runs its writers in dask
    * processes): the same 20-writer × one-writer-year grid as q205,
    * but HALF the writers run in a forked `java -cp` child JVM
    * ([[ConcChild]]) racing the parent's writers and its
    * defrag+trim+gc maintenance loop against one shared file store.
    * q205's threads share a JVM, where memory effects (common locks,
    * caches, fences) could accidentally serialize the race; process
    * isolation exercises the store contract itself — atomic
    * create-if-absent, content-addressed digest names, fork-and-merge
    * healing — under OS-level concurrency. The oracle recomputes the
    * full 1,051,200-row grid from scratch (identical to q205's). */
  def q207_multiprocess_ingest(s: SparkSession, dir: String)
      : DataFrame = {
    val _ = dir // fixed synthetic grid: the oracle regenerates it
    val root = java.nio.file.Files
      .createTempDirectory("graft-conc207").toString
    val schema = GSchema("ts" -> "timestamp*", "value" -> "int")
    val repo = new Repo(root, s)
    repo.createCollection(schema, "conc")
    val nWriters = 20
    val half = nWriters / 2
    val per = 52560L // one writer-year of minutes; 1,051,200 total
    // fork the child fleet FIRST and hold the parent's writers until
    // its session is up, so both PROCESSES race from the first commit
    // (a child still booting while the parent finishes would reduce
    // this to sequential single-process ingest)
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cmd = Seq(javaBin) ++ ConcChild.jdkModuleOptions ++ Seq(
      "-Xmx6g", "-cp", System.getProperty("java.class.path"),
      "graft.ConcChild", root, half.toString, nWriters.toString,
      per.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    // a failed require must not leak the non-daemon pool threads or
    // leave the child JVM running for its full timeout
    var pool: java.util.concurrent.ExecutorService = null
    try {
    val childOut = new StringBuffer // drain thread + failure reporter
    val ready = new java.util.concurrent.CountDownLatch(1)
    val drain = new Thread(() => {
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      var line = br.readLine()
      while (line != null) {
        if (line.contains("GRAFT_CHILD_READY")) ready.countDown()
        childOut.append(line).append('\n')
        if (childOut.length > 20000) childOut.delete(0, 10000)
        line = br.readLine()
      }
    }, "q207-child-drain")
    drain.setDaemon(true)
    drain.start()
    require(ready.await(300, java.util.concurrent.TimeUnit.SECONDS),
      s"q207 child JVM never came up:\n$childOut")
    pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val errors =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val writersDone = new java.util.concurrent.CountDownLatch(half)
    (0 until half).foreach { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          try {
            val sr = new Repo(root, s).collection("conc").get
              .series("my_label")
            sr.write(s.range(w * per, (w + 1) * per, 1, 4)
              .selectExpr("timestamp_seconds(946684800 + id * 60) AS ts",
                "cast(id % 997 AS int) AS value"))
          } catch { case t: Throwable => errors.add(t); () }
          finally writersDone.countDown()
        }
      })
    }
    // maintenance on a dedicated thread, racing BOTH processes'
    // writers (same loop and trim contract as q205)
    val maintDone = new java.util.concurrent.CountDownLatch(1)
    val maint = new Thread(() => {
      try {
        val c = new Repo(root, s).collection("conc").get
        var i = 0
        while (i < 10) {
          c.refresh(); c.defrag(1)
          c.trim(System.currentTimeMillis() - 1200000L)
          Thread.sleep(50); i += 1
        }
        new Repo(root, s).gc()
        ()
      } catch { case t: Throwable => errors.add(t); () }
      finally maintDone.countDown()
    }, "q207-maintenance")
    maint.start()
    require(writersDone.await(1200,
      java.util.concurrent.TimeUnit.SECONDS), "q207 writers timed out")
    require(proc.waitFor(1200, java.util.concurrent.TimeUnit.SECONDS),
      { proc.destroyForcibly(); s"q207 child JVM timed out:\n$childOut" })
    require(maintDone.await(600,
      java.util.concurrent.TimeUnit.SECONDS), "q207 maintenance hung")
    pool.shutdown()
    require(proc.exitValue() == 0,
      s"q207 child JVM exit ${proc.exitValue()}:\n$childOut")
    require(errors.isEmpty,
      s"q207 parent write/maintenance failed: ${errors.peek()}")
    // racing commits fork (now across processes); merge until the
    // changelog converges
    val clct = repo.collection("conc").get
    clct.refresh(); clct.merge(); clct.refresh()
    var guard = 0
    while (clct.changelog.leafs().length > 1 && guard < 30) {
      clct.merge(); clct.refresh(); guard += 1
    }
    require(clct.changelog.leafs().length == 1,
      s"q207 merge did not converge: ${clct.changelog.leafs().length}")
    clct.series("my_label").frame().createOrReplaceTempView("gq207")
    s.sql(
      """SELECT cast(year(ts) AS bigint) AS y,
        |  cast(month(ts) AS bigint) AS m,
        |  count(*) AS n_rows, sum(cast(value AS bigint)) AS sum_val,
        |  min(ts) AS min_ts, max(ts) AS max_ts
        |FROM gq207 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    } finally {
      if (pool != null) pool.shutdownNow()
      if (proc.isAlive) proc.destroyForcibly()
      ()
    }
  }

  val q207_oracle: String = q205_oracle

  /** Multi-process concurrent ingest over an OBJECT STORE: the q207
    * grid (scaled to one writer-month each) against an `s3net://`
    * root — a wire-level S3 REST server with object semantics: no
    * atomic rename, PUT-wins writes, copy+delete "moves". This is
    * the hostile case for the commit protocol's create-if-absent and
    * gc's two-phase bury/resurrect (the reference runs its whole
    * concurrent family over every pod, tests/concurrent_test.py:71-91
    * with conftest.py:65-99). The child JVM dials the parent's
    * embedded server over HTTP, so BOTH processes race through the
    * same object namespace; the parent's maintenance loop runs
    * defrag+trim+gc against it concurrently. */
  def q208_multiprocess_s3(s: SparkSession, dir: String): DataFrame = {
    val _ = dir // fixed synthetic grid: the oracle regenerates it
    val server = new graft.core.S3Server()
    val endpoint = server.start()
    try {
      graft.core.S3NetFileSystem.install(
        s.sparkContext.hadoopConfiguration, endpoint)
      graft.core.S3NetFileSystem.setDefaultEndpoint(endpoint)
      val root = "s3net://gq208/repo"
      val schema = GSchema("ts" -> "timestamp*", "value" -> "int")
      val repo = new Repo(root, s)
      repo.createCollection(schema, "conc")
      val nWriters = 20
      val half = nWriters / 2
      val per = 4380L // one writer-month of minutes; 87,600 total
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val cmd = Seq(javaBin) ++ ConcChild.jdkModuleOptions ++ Seq(
        "-Xmx6g", "-cp", System.getProperty("java.class.path"),
        "graft.ConcChild", root, half.toString, nWriters.toString,
        per.toString, endpoint)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      // a failed require must not leak the non-daemon pool threads
      // or leave the child JVM running against a stopped endpoint
      var pool: java.util.concurrent.ExecutorService = null
      try {
      val childOut = new StringBuffer
      val ready = new java.util.concurrent.CountDownLatch(1)
      val drain = new Thread(() => {
        val br = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream))
        var line = br.readLine()
        while (line != null) {
          if (line.contains("GRAFT_CHILD_READY")) ready.countDown()
          childOut.append(line).append('\n')
          if (childOut.length > 20000) childOut.delete(0, 10000)
          line = br.readLine()
        }
      }, "q208-child-drain")
      drain.setDaemon(true)
      drain.start()
      require(ready.await(300, java.util.concurrent.TimeUnit.SECONDS),
        s"q208 child JVM never came up:\n$childOut")
      pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      val errors =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val writersDone = new java.util.concurrent.CountDownLatch(half)
      (0 until half).foreach { w =>
        pool.submit(new Runnable {
          def run(): Unit = {
            try {
              val sr = new Repo(root, s).collection("conc").get
                .series("my_label")
              sr.write(s.range(w * per, (w + 1) * per, 1, 4)
                .selectExpr(
                  "timestamp_seconds(946684800 + id * 60) AS ts",
                  "cast(id % 997 AS int) AS value"))
            } catch { case t: Throwable => errors.add(t); () }
            finally writersDone.countDown()
          }
        })
      }
      val maintDone = new java.util.concurrent.CountDownLatch(1)
      val maint = new Thread(() => {
        try {
          val c = new Repo(root, s).collection("conc").get
          var i = 0
          while (i < 10) {
            c.refresh(); c.defrag(1)
            c.trim(System.currentTimeMillis() - 1200000L)
            Thread.sleep(50); i += 1
          }
          new Repo(root, s).gc()
          ()
        } catch { case t: Throwable => errors.add(t); () }
        finally maintDone.countDown()
      }, "q208-maintenance")
      maint.start()
      require(writersDone.await(1200,
        java.util.concurrent.TimeUnit.SECONDS), "q208 writers timed out")
      require(proc.waitFor(1200, java.util.concurrent.TimeUnit.SECONDS),
        { proc.destroyForcibly(); s"q208 child JVM timed out:\n$childOut" })
      require(maintDone.await(600,
        java.util.concurrent.TimeUnit.SECONDS), "q208 maintenance hung")
      pool.shutdown()
      require(proc.exitValue() == 0,
        s"q208 child JVM exit ${proc.exitValue()}:\n$childOut")
      require(errors.isEmpty,
        s"q208 parent write/maintenance failed: ${errors.peek()}")
      val clct = repo.collection("conc").get
      clct.refresh(); clct.merge(); clct.refresh()
      var guard = 0
      while (clct.changelog.leafs().length > 1 && guard < 30) {
        clct.merge(); clct.refresh(); guard += 1
      }
      require(clct.changelog.leafs().length == 1,
        s"q208 merge did not converge: ${clct.changelog.leafs().length}")
      clct.series("my_label").frame().createOrReplaceTempView("gq208")
      // eager materialization: the result must be OFF the object
      // store before the embedded server stops in the finally
      s.sql(
        """SELECT cast(year(ts) AS bigint) AS y,
          |  cast(month(ts) AS bigint) AS m,
          |  count(*) AS n_rows, sum(cast(value AS bigint)) AS sum_val,
          |  min(ts) AS min_ts, max(ts) AS max_ts
          |FROM gq208 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
        .localCheckpoint(true)
      } finally {
        if (pool != null) pool.shutdownNow()
        if (proc.isAlive) proc.destroyForcibly()
        ()
      }
    } finally {
      server.stop()
      graft.core.S3NetFileSystem.setDefaultEndpoint(null)
    }
  }

  val q208_oracle: String =
    """SELECT cast(year(ts) AS BIGINT) AS y,
      |  cast(month(ts) AS BIGINT) AS m,
      |  count(*)::BIGINT AS n_rows,
      |  cast(sum(k % 997) AS BIGINT) AS sum_val,
      |  min(ts) AS min_ts, max(ts) AS max_ts
      |FROM (SELECT k, TIMESTAMP '2000-01-01' + to_minutes(k) AS ts
      |      FROM range(0, 87600) t(k))
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The q207/q208 multi-process race run over the HTTP POD
    * (reference tests/concurrent_test.py:71-91 runs the concurrent
    * family over the http pod too): a [[graft.core.StoreServer]] in
    * the parent fronts the backing store; parent threads, a child
    * JVM's writer fleet AND a defrag+trim+gc maintenance loop all
    * mutate the repo over the wire protocol (ls/read/
    * write-if-absent/mv/rm/walk round-trips — no shared JVM state,
    * no shared filesystem semantics beyond the server's). Converges
    * to one leaf holding the complete writer grid. */
  def q209_multiprocess_http(s: SparkSession, dir: String): DataFrame = {
    val _ = dir // fixed synthetic grid: the oracle regenerates it
    val served = java.nio.file.Files
      .createTempDirectory("graft-q209").toString
    val server = new graft.core.StoreServer(
      new graft.core.HadoopStore(served)).start()
    try {
      val root = s"http://127.0.0.1:${server.boundPort}"
      val schema = GSchema("ts" -> "timestamp*", "value" -> "int")
      val repo = Repo(root, s)
      repo.createCollection(schema, "conc")
      val nWriters = 20
      val half = nWriters / 2
      val per = 4380L // one writer-month of minutes; 87,600 total
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val cmd = Seq(javaBin) ++ ConcChild.jdkModuleOptions ++ Seq(
        "-Xmx6g", "-cp", System.getProperty("java.class.path"),
        "graft.ConcChild", root, half.toString, nWriters.toString,
        per.toString)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      // a failed require must not leak the non-daemon pool threads
      // (they'd pin the JVM open) or leave the 6 GB child running
      // against a stopped server for its full timeout
      var pool: java.util.concurrent.ExecutorService = null
      try {
      val childOut = new StringBuffer
      val ready = new java.util.concurrent.CountDownLatch(1)
      val drain = new Thread(() => {
        val br = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream))
        var line = br.readLine()
        while (line != null) {
          if (line.contains("GRAFT_CHILD_READY")) ready.countDown()
          childOut.append(line).append('\n')
          if (childOut.length > 20000) childOut.delete(0, 10000)
          line = br.readLine()
        }
      }, "q209-child-drain")
      drain.setDaemon(true)
      drain.start()
      require(ready.await(300, java.util.concurrent.TimeUnit.SECONDS),
        s"q209 child JVM never came up:\n$childOut")
      pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      val errors =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val writersDone = new java.util.concurrent.CountDownLatch(half)
      (0 until half).foreach { w =>
        pool.submit(new Runnable {
          def run(): Unit = {
            try {
              val sr = Repo(root, s).collection("conc").get
                .series("my_label")
              sr.write(s.range(w * per, (w + 1) * per, 1, 4)
                .selectExpr(
                  "timestamp_seconds(946684800 + id * 60) AS ts",
                  "cast(id % 997 AS int) AS value"))
            } catch { case t: Throwable => errors.add(t); () }
            finally writersDone.countDown()
          }
        })
      }
      val maintDone = new java.util.concurrent.CountDownLatch(1)
      val maint = new Thread(() => {
        try {
          val c = Repo(root, s).collection("conc").get
          var i = 0
          while (i < 10) {
            c.refresh(); c.defrag(1)
            c.trim(System.currentTimeMillis() - 1200000L)
            Thread.sleep(50); i += 1
          }
          Repo(root, s).gc()
          ()
        } catch { case t: Throwable => errors.add(t); () }
        finally maintDone.countDown()
      }, "q209-maintenance")
      maint.start()
      require(writersDone.await(1200,
        java.util.concurrent.TimeUnit.SECONDS), "q209 writers timed out")
      require(proc.waitFor(1200, java.util.concurrent.TimeUnit.SECONDS),
        { proc.destroyForcibly(); s"q209 child JVM timed out:\n$childOut" })
      require(maintDone.await(600,
        java.util.concurrent.TimeUnit.SECONDS), "q209 maintenance hung")
      pool.shutdown()
      require(proc.exitValue() == 0,
        s"q209 child JVM exit ${proc.exitValue()}:\n$childOut")
      require(errors.isEmpty,
        s"q209 parent write/maintenance failed: ${errors.peek()}")
      val clct = repo.collection("conc").get
      clct.refresh(); clct.merge(); clct.refresh()
      var guard = 0
      while (clct.changelog.leafs().length > 1 && guard < 30) {
        clct.merge(); clct.refresh(); guard += 1
      }
      require(clct.changelog.leafs().length == 1,
        s"q209 merge did not converge: ${clct.changelog.leafs().length}")
      clct.series("my_label").frame().createOrReplaceTempView("gq209")
      // eager materialization: the result must be OFF the wire store
      // before the embedded server stops in the finally
      s.sql(
        """SELECT cast(year(ts) AS bigint) AS y,
          |  cast(month(ts) AS bigint) AS m,
          |  count(*) AS n_rows, sum(cast(value AS bigint)) AS sum_val,
          |  min(ts) AS min_ts, max(ts) AS max_ts
          |FROM gq209 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
        .localCheckpoint(true)
      } finally {
        if (pool != null) pool.shutdownNow()
        if (proc.isAlive) proc.destroyForcibly()
        ()
      }
    } finally server.stop()
  }

  val q209_oracle: String =
    """SELECT cast(year(ts) AS BIGINT) AS y,
      |  cast(month(ts) AS BIGINT) AS m,
      |  count(*)::BIGINT AS n_rows,
      |  cast(sum(k % 997) AS BIGINT) AS sum_val,
      |  min(ts) AS min_ts, max(ts) AS max_ts
      |FROM (SELECT k, TIMESTAMP '2000-01-01' + to_minutes(k) AS ts
      |      FROM range(0, 87600) t(k))
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Metadata-only aggregates: `count(*) / min(ts) / max(ts)` over an
    * unfiltered connector table answer from MANIFEST row counts and
    * recorded data bounds — zero file IO, the Delta-style metadata
    * count (GraftCatalogSpec proves the no-scan plan via the probe;
    * this gates the VALUES against plain SQL over the source). */
  def q184_meta_agg(s: SparkSession, dir: String): DataFrame = {
    val sr = freshSeries(s)
    sr.write(eventsDf(s, dir))
    s.read.format("graft")
      .option("path", sr.collection.repo.rootUri)
      .option("collection", "events").option("series", "_").load()
      .createOrReplaceTempView("gq184")
    s.sql(
      """SELECT count(*) AS cnt, count(event_id) AS cnt_id,
        |  min(ts) AS ts_min, max(ts) AS ts_max
        |FROM gq184""".stripMargin)
  }

  val q184_oracle: String =
    """SELECT count(*)::BIGINT AS cnt, count(event_id)::BIGINT AS cnt_id,
      |  min(ts) AS ts_min, max(ts) AS ts_max
      |FROM events""".stripMargin

  /** Join-driven pruning shape: a (day, event_id)-indexed engine table
    * joined to a tiny day dimension — the connector declares
    * SupportsRuntimeFiltering on the head index column, so at scale
    * the broadcast join's build side prunes manifest segments at
    * runtime (DPP for the versioned store; GraftCatalogSpec gates the
    * mechanism). The oracle recomputes the join in closed form. */
  def q185_runtime_prune_join(s: SparkSession, dir: String)
      : DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val repo = new Repo(root, s)
    val schema = GSchema("day" -> "int*", "event_id" -> "int*",
      "value" -> "float")
    val clct = repo.createCollection(schema, "by_day")
    clct.pageLen = 2000L
    clct.embedMaxSize = 0L
    clct.series("_").write(eventsDf(s, dir).select(
      datediff(col("ts").cast("date"), lit("2024-01-01").cast("date"))
        .cast("long").as("day"),
      col("event_id"), col("value")))
    s.read.format("graft").option("path", root)
      .option("collection", "by_day").option("series", "_").load()
      .createOrReplaceTempView("gq185")
    s.sql(
      """SELECT g.day, count(*) AS cnt,
        |  sum(cast(round(g.value * 1000000, 0) AS bigint)) AS val_micro
        |FROM gq185 g
        |JOIN (SELECT explode(array(5L, 12L)) AS day) d
        |  ON g.day = d.day
        |GROUP BY g.day ORDER BY g.day""".stripMargin)
  }

  val q185_oracle: String =
    """SELECT date_diff('day', DATE '2024-01-01', ts::DATE)::BIGINT
      |    AS day,
      |  count(*)::BIGINT AS cnt,
      |  sum(round(value * 1000000)::BIGINT)::BIGINT AS val_micro
      |FROM events
      |WHERE date_diff('day', DATE '2024-01-01', ts::DATE) IN (5, 12)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Bulk multi-series ingest (Collection.ingestGrouped): one series
    * per event type from a single partitioned write + batched commit,
    * then an engine read of two of the series unioned back — checked
    * against plain SQL over the original parquet. */
  def q84_grouped_ingest(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val repo = new Repo(root, s)
    val schema = GSchema("ts" -> "timestamp*", "event_id" -> "int*",
      "value" -> "float")
    val c = repo.createCollection(schema, "by_type")
    c.ingestGrouped(eventsDf(s, dir), "event_type")
    val click = c.series("click").frame()
      .withColumn("event_type", lit("click"))
    val purchase = c.series("purchase").frame()
      .withColumn("event_type", lit("purchase"))
    click.unionAll(purchase)
      .select(col("event_id"), col("ts"), col("value"),
        col("event_type"))
      .orderBy(col("event_id"))
  }

  val q84_oracle: String =
    """SELECT event_id, ts, value, event_type FROM events
      |WHERE event_type IN ('click', 'purchase')
      |ORDER BY event_id""".stripMargin

  /** Snapshot diff — "what did that overlay change?": write the full
    * series, overlay a patch (every 7th event's value tripled over
    * [Jan10, Jan20)), then FULL-OUTER-join the time-travel read
    * before the patch against the current read and report the changed
    * rows per day. The audit query every versioned store owes its
    * operators after a backfill: both sides come through the engine's
    * manifest (one pruned scan each), the join keys on the series
    * index, and the oracle derives the same diff in closed form from
    * the raw events — a time-travel bug on either side fails the
    * hash. */
  def q121_snapshot_diff(s: SparkSession, dir: String): DataFrame = {
    val sr = freshSeries(s)
    val ev = eventsDf(s, dir)
    sr.write(ev)
    Thread.sleep(15)
    val cut = System.currentTimeMillis()
    Thread.sleep(15)
    // overlay the whole range with every 7th event's value tripled
    // (update() is the DENSE-aligned form — a sparse patch goes
    // through a range overlay, exactly like a backfill job would)
    val patch = ev
      .filter(col("ts") >= lit("2024-01-10").cast("timestamp") &&
        col("ts") < lit("2024-01-20").cast("timestamp"))
      .withColumn("value",
        when(col("event_id") % 7 === 0, col("value") * 3)
          .otherwise(col("value")))
    sr.write(patch, "2024-01-10 00:00:00", "2024-01-20 00:00:00",
      Closed.Left)
    val before = sr.frame(beforeMs = Some(cut))
      .select(col("event_id"), col("ts"), col("value").as("v_old"))
    val after = sr.frame()
      .select(col("event_id"), col("value").as("v_new"))
    before.join(after, Seq("event_id"), "full_outer")
      .filter(col("v_old") =!= col("v_new"))
      .groupBy(date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_changed"),
        round(sum(col("v_old")), 2).as("sum_old"),
        round(sum(col("v_new")), 2).as("sum_new"))
      .orderBy(col("day"))
  }

  val q121_oracle: String =
    """SELECT date_trunc('day', ts)::TIMESTAMP AS day,
      |  count(*)::BIGINT AS n_changed,
      |  round(sum(value), 2) AS sum_old,
      |  -- the engine stores the patched value as FLOAT: quantize the
      |  -- oracle's doubled value identically before summing
      |  round(sum((value * 3)::FLOAT), 2) AS sum_new
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
      |  AND event_id % 7 = 0
      |  AND value <> value * 3
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** fragmentation maintenance under the oracle gate: ten disjoint
    * file-segment writes (inline embedding disabled so every write
    * lands a real parquet segment), then defrag coalesces the
    * fragment runs — the visible frame must be byte-identical to the
    * raw table. MaintenanceSpec asserts the segment count shrinks;
    * this proves the REWRITE preserves every row/value. */
  def q129_series_defrag(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val clct = new Repo(root, s).createCollection(eventsSchema, "events")
    clct.embedMaxSize = 0L
    val sr = clct.series("_")
    val ev = eventsDf(s, dir)
    // ten DISJOINT ts windows (the index's leading column) — disjoint
    // coverage means the writes fragment without overlaying each other
    val b = ev.agg(min(col("ts")), max(col("ts"))).head()
    val (lo, hi) = (b.getTimestamp(0).getTime, b.getTimestamp(1).getTime)
    val step = (hi - lo) / 10 + 1
    (0 until 10).foreach { i =>
      val a = new java.sql.Timestamp(lo + i * step)
      val z = new java.sql.Timestamp(math.min(lo + (i + 1) * step, hi + 1))
      sr.write(ev.filter(col("ts") >= lit(a) && col("ts") < lit(z)))
    }
    clct.defrag()
    clct.refresh()
    sr.frame().select(out.map(col): _*).orderBy(col("event_id"))
  }

  val q129_oracle: String =
    """SELECT event_id, ts, value FROM events ORDER BY event_id"""

  /** garbage collection under the oracle gate: overlay + squash
    * orphan the original segments, gc deletes them — and the read
    * after gc must still produce the exact overlay state (gc must
    * never touch a LIVE segment). */
  def q130_series_gc(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val repo = new Repo(root, s)
    val clct = repo.createCollection(eventsSchema, "events")
    clct.embedMaxSize = 0L
    val sr = clct.series("_")
    val ev = eventsDf(s, dir)
    sr.write(ev)
    sr.write(ev.filter(col("ts") >= lit("2024-01-20").cast("timestamp"))
        .withColumn("value", col("value") + 100),
      "2024-01-20 00:00:00", "2025-01-01 00:00:00", Closed.Left)
    clct.squash()
    clct.refresh()
    require(repo.gc(timeoutMs = 0L) >= 0)
    sr.frame().select(out.map(col): _*).orderBy(col("event_id"))
  }

  val q130_oracle: String =
    """SELECT event_id, ts,
      | CASE WHEN ts >= TIMESTAMP '2024-01-20'
      |      THEN value + 100 ELSE value END AS value
      |FROM events ORDER BY event_id""".stripMargin

  /** registry prefix search under the oracle gate: one collection per
    * nation name, then `repo.search` per first letter — the registry
    * listing must equal the relational answer. */
  def q131_registry_search(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val repo = new Repo(root, s)
    val names = Tables.table(s, dir, "nation")
      .select(col("n_name")).collect().map(_.getString(0))
    val tiny = GSchema("k" -> "int*", "v" -> "float")
    names.foreach(n => repo.createCollection(tiny, n))
    // the driver tables name nations NATION_0..24: prefix NATION_1
    // matches NATION_1 and NATION_10..19 via the registry's search
    repo.search("NATION_1").toDF("label").orderBy(col("label"))
  }

  val q131_oracle: String =
    """SELECT n_name AS label FROM nation
      |WHERE substr(n_name, 1, 8) = 'NATION_1' ORDER BY label""".stripMargin

  /** the HTTP POD under the oracle gate: a StoreServer fronts a local
    * store, a second repo opens the served `http://` root, engine
    * writes+reads run through the wire — the frame must equal plain
    * SQL over the raw table. */
  def q132_http_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val served = java.nio.file.Files
      .createTempDirectory("graft-http").toString
    val server = new graft.core.StoreServer(
      new graft.core.HadoopStore(served)).start()
    val repo = Repo(s"http://127.0.0.1:${server.boundPort}", s)
    val clct = repo.createCollection(eventsSchema, "events")
    clct.embedMaxSize = 0L // segments travel over the wire
    val sr = clct.series("_")
    sr.write(eventsDf(s, dir)
      .filter(col("ts") < lit("2024-01-08").cast("timestamp")))
    // eagerly pin the read (all segment bytes travel the wire NOW),
    // then stop the server — the returned frame must not depend on a
    // fixture server outliving this call
    val got = sr.frame().select(out.map(col): _*)
      .orderBy(col("event_id")).localCheckpoint(true)
    server.stop()
    got
  }

  val q132_oracle: String =
    """SELECT event_id, ts, value FROM events
      |WHERE ts < TIMESTAMP '2024-01-08' ORDER BY event_id""".stripMargin

  /** repo-level bulk export → import into a fresh repo (the reference
    * CLI's whole-repo dump/restore): two collections travel, the read
    * back must equal plain SQL. */
  def q133_repo_export(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val repo = new Repo(root, s)
    val ev = eventsDf(s, dir)
    val c1 = repo.createCollection(eventsSchema, "events")
    c1.series("_").write(ev)
    val tiny = GSchema("k" -> "int*", "v" -> "float")
    repo.createCollection(tiny, "other").series("_")
      .write(s.range(0, 10).selectExpr("id AS k", "id * 1.0 AS v"))
    val dump = java.nio.file.Files
      .createTempDirectory("graft-dump").toString
    repo.exportTo(dump)
    val repo2 = new Repo(java.nio.file.Files
      .createTempDirectory("graft-q2").toString, s)
    repo2.importFrom(dump)
    repo2.collection("events").get.series("_").frame()
      .select(out.map(col): _*).orderBy(col("event_id"))
  }

  val q133_oracle: String =
    """SELECT event_id, ts, value FROM events ORDER BY event_id"""

  /** two-tier CacheStore under the oracle gate: writes land on the
    * back tier, reads populate the front; the read-through frame must
    * equal plain SQL — and must still be correct when served from the
    * warmed cache on the second scan. */
  def q134_cache_store(s: SparkSession, dir: String): DataFrame = {
    import graft.core.{CacheStore, HadoopStore}
    val front = new HadoopStore(java.nio.file.Files
      .createTempDirectory("graft-front").toString)
    val back = new HadoopStore(java.nio.file.Files
      .createTempDirectory("graft-back").toString)
    val repo = new Repo(back.root, s, new CacheStore(front, back))
    val clct = repo.createCollection(eventsSchema, "events")
    clct.embedMaxSize = 0L // segments must travel through the tiers
    val sr = clct.series("_")
    sr.write(eventsDf(s, dir))
    sr.frame().count() // warm the front tier
    sr.frame().select(out.map(col): _*).orderBy(col("event_id"))
  }

  val q134_oracle: String =
    """SELECT event_id, ts, value FROM events ORDER BY event_id"""

  /** memory:// repo root (the reference's default MemPOD) under the
    * oracle gate: the whole engine lifecycle in the in-JVM store,
    * including Spark's parquet segment scans. */
  def q135_memory_root(s: SparkSession, dir: String): DataFrame = {
    val repo = Repo(s"memory://q135-${System.nanoTime()}/repo", s)
    val clct = repo.createCollection(eventsSchema, "events")
    clct.embedMaxSize = 0L
    val sr = clct.series("_")
    sr.write(eventsDf(s, dir))
    sr.frame().select(out.map(col): _*).orderBy(col("event_id"))
  }

  val q135_oracle: String =
    """SELECT event_id, ts, value FROM events ORDER BY event_id"""

  /** rename collection + series under the oracle gate: data written
    * under the old names reads back under the new (physical paths are
    * stable; only registry/changelog labels move). */
  def q136_series_rename(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val repo = new Repo(root, s)
    val clct = repo.createCollection(eventsSchema, "ev_old")
    clct.series("old").write(eventsDf(s, dir))
    clct.renameSeries("old", "new")
    repo.renameCollection("ev_old", "ev_new")
    repo.collection("ev_new").get.series("new").frame()
      .select(out.map(col): _*).orderBy(col("event_id"))
  }

  val q136_oracle: String =
    """SELECT event_id, ts, value FROM events ORDER BY event_id"""

  /** archive namespace under the oracle gate: park a snapshot, delete
    * the live collection, gc — the archived copy must read back
    * intact (the gc live set spans every namespace). */
  def q138_archive_gc(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val repo = new Repo(root, s)
    val clct = repo.createCollection(eventsSchema, "events")
    clct.embedMaxSize = 0L
    clct.series("_").write(eventsDf(s, dir))
    val arc = repo.archive(clct)
    arc.series("_").write(clct.series("_").frame())
    repo.deleteCollection("events")
    require(repo.gc(timeoutMs = 0L) >= 0)
    repo.collection("events", "archive").get.series("_").frame()
      .select(out.map(col): _*).orderBy(col("event_id"))
  }

  val q138_oracle: String =
    """SELECT event_id, ts, value FROM events ORDER BY event_id"""

  /** distribution-drift monitoring against ENGINE-STORED reference
    * state: the reference window's per-(event_type, bucket) histogram
    * — plus the bucket grid's [lo, hi] — is written through the
    * series engine once, and the current window computes PSI against
    * the STORED aggregate; the reference window's raw events are
    * never re-read. The oracle is q139's full two-window recompute,
    * so a count mangled in the engine round trip (or a bucket id
    * shifted by a lost ulp of lo/hi) fails the hash. This is the
    * production monitoring shape at 100 TB: every ingest snapshot
    * stores its fixed-size histogram (overlay/time-travel/GC apply to
    * the monitoring state itself) and each drift check reads ~k rows
    * of state + one map-side-combined aggregate over the new window
    * only. */
  /** build the reference-window histogram, write it THROUGH the
    * engine, and register the stored read-back as `graft_ref_hist`
    * (shared by q140's batch drift check and q144's streaming one) */
  private[graft] def refHistView(s: SparkSession, dir: String): Unit = {
    Tables.registerAll(s, dir)
    val hist = s.sql(
      """WITH ref AS (SELECT value, event_type FROM events
        |    WHERE ts < TIMESTAMP '2024-01-15' AND value IS NOT NULL),
        |b AS (SELECT min(value) AS lo, max(value) AS hi FROM ref)
        |SELECT event_type,
        |  cast(CASE WHEN value < b.lo THEN 0
        |    WHEN value >= b.hi THEN 11
        |    ELSE cast(floor((value - b.lo) * 10.0D / (b.hi - b.lo))
        |      AS int) + 1 END AS bigint) AS bk, count(*) AS c,
        |  min(b.lo) AS lo, min(b.hi) AS hi
        |FROM ref CROSS JOIN b GROUP BY 1, 2""".stripMargin)
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val sr = new Repo(root, s)
      .createCollection(GSchema("event_type" -> "str*", "bk" -> "int*",
        "c" -> "int", "lo" -> "float", "hi" -> "float"), "drift")
      .series("ref")
    sr.write(hist)
    sr.frame().createOrReplaceTempView("graft_ref_hist")
  }

  /** PSI of a caller-supplied current-window bucket-count CTE (`cb`:
    * event_type, bk, c) against the ENGINE-STORED reference histogram
    * view — q139's exact smoothing/quantization math, shared by the
    * batch (q140) and streaming (q144) drift checks */
  private[graft] def psiAgainstStored(s: SparkSession,
      cbCtes: String): DataFrame =
    s.sql(
      s"""WITH $cbCtes,
        |rb AS (SELECT event_type, cast(bk AS int) AS bk, c
        |  FROM graft_ref_hist),
        |rt AS (SELECT event_type, sum(c) AS t FROM rb GROUP BY 1),
        |ct AS (SELECT event_type, sum(c) AS t FROM cb GROUP BY 1),
        |grid AS (SELECT rt.event_type, g.bk
        |  FROM rt CROSS JOIN (
        |    SELECT explode(sequence(0, 11)) AS bk) g),
        |terms AS (SELECT g.event_type,
        |    cast(round(
        |      ((coalesce(rb.c, 0) + 1.0D) / (rt.t + 12.0D)
        |        - (coalesce(cb.c, 0) + 1.0D) / (ct.t + 12.0D))
        |      * ln(((coalesce(rb.c, 0) + 1.0D) / (rt.t + 12.0D))
        |         / ((coalesce(cb.c, 0) + 1.0D) / (ct.t + 12.0D)))
        |      * 1000000000.0D, 0) AS bigint) AS term
        |  FROM grid g
        |  LEFT JOIN rb ON g.event_type = rb.event_type AND g.bk = rb.bk
        |  LEFT JOIN cb ON g.event_type = cb.event_type AND g.bk = cb.bk
        |  JOIN rt ON g.event_type = rt.event_type
        |  JOIN ct ON g.event_type = ct.event_type)
        |SELECT t.event_type, round(sum(t.term) / 1000000000.0D, 6) + 0
        |    AS psi,
        |  rt.t AS n_ref, ct.t AS n_cur
        |FROM terms t
        |JOIN rt ON t.event_type = rt.event_type
        |JOIN ct ON t.event_type = ct.event_type
        |GROUP BY t.event_type, rt.t, ct.t
        |ORDER BY t.event_type""".stripMargin)

  def q140_stored_drift(s: SparkSession, dir: String): DataFrame = {
    refHistView(s, dir)
    psiAgainstStored(s,
      """cur AS (SELECT value, event_type FROM events
        |    WHERE ts >= TIMESTAMP '2024-01-15' AND value IS NOT NULL),
        |b AS (SELECT min(lo) AS lo, min(hi) AS hi FROM graft_ref_hist),
        |cb AS (SELECT event_type,
        |    CASE WHEN value < b.lo THEN 0
        |      WHEN value >= b.hi THEN 11
        |      ELSE cast(floor((value - b.lo) * 10.0D / (b.hi - b.lo))
        |        AS int) + 1 END AS bk, count(*) AS c
        |  FROM cur CROSS JOIN b GROUP BY 1, 2)""".stripMargin)
  }

  /** incremental-against-stored-state must equal the full recompute */
  val q140_oracle: String = QueriesPipe.q139_oracle

  /** the CLI's TEXT output under the oracle gate: the rows printed by
    * the `read-csv` subcommand are captured from stdout, parsed back
    * into typed columns, and compared against plain SQL — closing the
    * one §2 surface (CLI text output) that rested on ScalaTest alone.
    * The printed frame is a driver-side display of an engine read, so
    * the collect is the operator's own semantics, not a scale
    * shortcut. */
  def q143_cli_read(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val repo = new Repo(root, s)
    repo.createCollection(eventsSchema, "events").series("_")
      .write(eventsDf(s, dir)
        .filter(col("ts") < lit("2024-01-08").cast("timestamp")))
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
      Cli.run(s, Array(root, "read-csv", "events", "_"))
    }
    val lines = bos.toString("UTF-8").linesIterator.toSeq
    require(lines.head == "ts,event_id,value,event_type",
      s"unexpected CLI header: ${lines.head}")
    import s.implicits._
    s.createDataset(lines.tail.filter(_.nonEmpty)).toDF("line")
      .selectExpr(
        "cast(split(line, ',')[1] AS bigint) AS event_id",
        "cast(split(line, ',')[0] AS timestamp) AS ts",
        "cast(nullif(split(line, ',')[2], '') AS double) AS value")
      .orderBy(col("event_id"))
  }

  val q143_oracle: String =
    """SELECT event_id, ts, value FROM events
      |WHERE ts < TIMESTAMP '2024-01-08' ORDER BY event_id""".stripMargin

  /** wraps a store, corrupting the FIRST read of every changelog
    * blob (first byte flipped) — the torn/concurrent-read condition
    * the revision sha1+retry loop exists for */
  private final class FlakyStore(inner: graft.core.Store)
      extends graft.core.Store {
    private val seen =
      scala.collection.concurrent.TrieMap.empty[String, Unit]
    @volatile var corrupted = 0
    def read(path: String): Array[Byte] = {
      val d = inner.read(path)
      if (path.contains("changelog") &&
          seen.putIfAbsent(path, ()).isEmpty && d.nonEmpty) {
        corrupted += 1
        val c = d.clone(); c(0) = (c(0) ^ 0x7).toByte; c
      } else d
    }
    def ls(dir: String): Seq[String] = inner.ls(dir)
    def write(path: String, data: Array[Byte]): Boolean =
      inner.write(path, data)
    def rm(path: String, recursive: Boolean): Unit =
      inner.rm(path, recursive)
    def mv(from: String, to: String): Unit = inner.mv(from, to)
    def exists(path: String): Boolean = inner.exists(path)
    def walk(prefix: String): Seq[String] = inner.walk(prefix)
    def uri(path: String): String = inner.uri(path)
  }

  /** revision-integrity retry under the oracle gate — the LAST §2
    * surface that rested on ScalaTest alone: a second repo opens the
    * store through a fault-injecting wrapper that corrupts the first
    * read of every changelog blob; the sha1-verified retry loop must
    * re-read clean bytes, and the frame must still equal plain SQL.
    * The require proves the faults actually fired (a vacuous pass is
    * impossible). */
  def q153_retry_read(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-q").toString
    val w = new Repo(root, s)
    val clct = w.createCollection(eventsSchema, "events")
    clct.embedMaxSize = 0L
    clct.series("_").write(eventsDf(s, dir))
    val flaky = new FlakyStore(new graft.core.HadoopStore(root))
    val r = new Repo(root, s, flaky)
    val f = r.collection("events").get.series("_").frame()
      .select(out.map(col): _*).orderBy(col("event_id"))
    f.count() // force changelog + manifest reads through the faults
    require(flaky.corrupted > 0, "fault injection never fired")
    f
  }

  val q153_oracle: String =
    """SELECT event_id, ts, value FROM events ORDER BY event_id"""

  /** Snapshot-to-snapshot distribution drift — "did that overlay
    * change the data's shape": the series is overlaid (values × 1.5
    * from Jan 15), then PSI runs between the TIME-TRAVEL read of the
    * pre-overlay revision and the current read — the reference
    * window is a version, not a time filter, which is what a
    * versioned store makes possible (compare q121's row-level
    * snapshot diff: this is its distributional summary). Exact q139
    * math; the oracle reconstructs both windows in closed form from
    * the raw table, so a wrong snapshot boundary or a mangled
    * overlay value fails the hash. */
  def q171_snapshot_drift(s: SparkSession, dir: String): DataFrame = {
    val sr = freshSeries(s)
    val ev = eventsDf(s, dir)
    sr.write(ev)
    Thread.sleep(15)
    val cut = System.currentTimeMillis()
    Thread.sleep(15)
    val patch = ev
      .filter(col("ts") >= lit("2024-01-15").cast("timestamp"))
      .withColumn("value", col("value") * 1.5)
    sr.write(patch, "2024-01-15 00:00:00", "2025-01-01 00:00:00",
      Closed.Left)
    sr.frame(beforeMs = Some(cut))
      .createOrReplaceTempView("graft_snap_ref")
    sr.frame().createOrReplaceTempView("graft_snap_cur")
    s.sql(
      """WITH ref AS (SELECT value, event_type FROM graft_snap_ref
        |    WHERE value IS NOT NULL),
        |cur AS (SELECT value, event_type FROM graft_snap_cur
        |    WHERE value IS NOT NULL),
        |b AS (SELECT min(value) AS lo, max(value) AS hi FROM ref),
        |rb AS (SELECT event_type,
        |    CASE WHEN value < b.lo THEN 0
        |      WHEN value >= b.hi THEN 11
        |      ELSE cast(floor((value - b.lo) * 10.0D / (b.hi - b.lo))
        |        AS int) + 1 END AS bk, count(*) AS c
        |  FROM ref CROSS JOIN b GROUP BY 1, 2),
        |cb AS (SELECT event_type,
        |    CASE WHEN value < b.lo THEN 0
        |      WHEN value >= b.hi THEN 11
        |      ELSE cast(floor((value - b.lo) * 10.0D / (b.hi - b.lo))
        |        AS int) + 1 END AS bk, count(*) AS c
        |  FROM cur CROSS JOIN b GROUP BY 1, 2),
        |rt AS (SELECT event_type, sum(c) AS t FROM rb GROUP BY 1),
        |ct AS (SELECT event_type, sum(c) AS t FROM cb GROUP BY 1),
        |grid AS (SELECT rt.event_type, g.bk
        |  FROM rt CROSS JOIN (
        |    SELECT explode(sequence(0, 11)) AS bk) g),
        |terms AS (SELECT g.event_type,
        |    cast(round(
        |      ((coalesce(rb.c, 0) + 1.0D) / (rt.t + 12.0D)
        |        - (coalesce(cb.c, 0) + 1.0D) / (ct.t + 12.0D))
        |      * ln(((coalesce(rb.c, 0) + 1.0D) / (rt.t + 12.0D))
        |         / ((coalesce(cb.c, 0) + 1.0D) / (ct.t + 12.0D)))
        |      * 1000000000.0D, 0) AS bigint) AS term
        |  FROM grid g
        |  LEFT JOIN rb ON g.event_type = rb.event_type AND g.bk = rb.bk
        |  LEFT JOIN cb ON g.event_type = cb.event_type AND g.bk = cb.bk
        |  JOIN rt ON g.event_type = rt.event_type
        |  JOIN ct ON g.event_type = ct.event_type)
        |SELECT t.event_type, round(sum(t.term) / 1000000000.0D, 6) + 0
        |    AS psi,
        |  rt.t AS n_ref, ct.t AS n_cur
        |FROM terms t
        |JOIN rt ON t.event_type = rt.event_type
        |JOIN ct ON t.event_type = ct.event_type
        |GROUP BY t.event_type, rt.t, ct.t
        |ORDER BY t.event_type""".stripMargin)
  }

  val q171_oracle: String =
    """WITH ref AS (SELECT value, event_type FROM events
      |    WHERE value IS NOT NULL),
      |cur AS (SELECT CASE WHEN ts >= TIMESTAMP '2024-01-15'
      |      THEN value * 1.5 ELSE value END AS value, event_type
      |    FROM events WHERE value IS NOT NULL),
      |b AS (SELECT min(value) AS lo, max(value) AS hi FROM ref),
      |rb AS (SELECT event_type,
      |    CASE WHEN value < b.lo THEN 0
      |      WHEN value >= b.hi THEN 11
      |      ELSE cast(floor((value - b.lo) * 10.0 / (b.hi - b.lo))
      |        AS int) + 1 END AS bk, count(*) AS c
      |  FROM ref CROSS JOIN b GROUP BY 1, 2),
      |cb AS (SELECT event_type,
      |    CASE WHEN value < b.lo THEN 0
      |      WHEN value >= b.hi THEN 11
      |      ELSE cast(floor((value - b.lo) * 10.0 / (b.hi - b.lo))
      |        AS int) + 1 END AS bk, count(*) AS c
      |  FROM cur CROSS JOIN b GROUP BY 1, 2),
      |rt AS (SELECT event_type, sum(c) AS t FROM rb GROUP BY 1),
      |ct AS (SELECT event_type, sum(c) AS t FROM cb GROUP BY 1),
      |grid AS (SELECT rt.event_type, g.bk
      |  FROM rt CROSS JOIN (SELECT unnest(range(0, 12)) AS bk) g),
      |terms AS (SELECT g.event_type,
      |    round(
      |      ((coalesce(rb.c, 0) + 1.0) / (rt.t + 12.0)
      |        - (coalesce(cb.c, 0) + 1.0) / (ct.t + 12.0))
      |      * ln(((coalesce(rb.c, 0) + 1.0) / (rt.t + 12.0))
      |         / ((coalesce(cb.c, 0) + 1.0) / (ct.t + 12.0)))
      |      * 1000000000.0)::BIGINT AS term
      |  FROM grid g
      |  LEFT JOIN rb ON g.event_type = rb.event_type AND g.bk = rb.bk
      |  LEFT JOIN cb ON g.event_type = cb.event_type AND g.bk = cb.bk
      |  JOIN rt ON g.event_type = rt.event_type
      |  JOIN ct ON g.event_type = ct.event_type)
      |SELECT t.event_type, round(sum(t.term) / 1000000000.0, 6) + 0
      |    AS psi,
      |  rt.t::BIGINT AS n_ref, ct.t::BIGINT AS n_cur
      |FROM terms t
      |JOIN rt ON t.event_type = rt.event_type
      |JOIN ct ON t.event_type = ct.event_type
      |GROUP BY t.event_type, rt.t, ct.t
      |ORDER BY t.event_type""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q171_snapshot_drift" -> q171_snapshot_drift _,
    "q153_retry_read" -> q153_retry_read _,
    "q140_stored_drift" -> q140_stored_drift _,
    "q143_cli_read" -> q143_cli_read _,
    "q138_archive_gc" -> q138_archive_gc _,
    "q133_repo_export" -> q133_repo_export _,
    "q134_cache_store" -> q134_cache_store _,
    "q135_memory_root" -> q135_memory_root _,
    "q136_series_rename" -> q136_series_rename _,
    "q129_series_defrag" -> q129_series_defrag _,
    "q130_series_gc" -> q130_series_gc _,
    "q131_registry_search" -> q131_registry_search _,
    "q132_http_roundtrip" -> q132_http_roundtrip _,
    "q121_snapshot_diff" -> q121_snapshot_diff _,
    "q123_jsonl_roundtrip" -> q123_jsonl_roundtrip _,
    "q84_grouped_ingest" -> q84_grouped_ingest _,
    "q76_sql_facade" -> q76_sql_facade _,
    "q174_connector_sql" -> q174_connector_sql _,
    "q180_connector_insert" -> q180_connector_insert _,
    "q181_connector_multiidx" -> q181_connector_multiidx _,
    "q182_connector_topn" -> q182_connector_topn _,
    "q183_catalog_sql" -> q183_catalog_sql _,
    "q186_sql_delete" -> q186_sql_delete _,
    "q187_sql_maintenance" -> q187_sql_maintenance _,
    "q188_sql_update" -> q188_sql_update _,
    "q189_schema_evolution" -> q189_schema_evolution _,
    "q191_data_skipping" -> q191_data_skipping _,
    "q192_sql_history" -> q192_sql_history _,
    "q193_analyze_backfill" -> q193_analyze_backfill _,
    "q194_crawl_refresh" -> q194_crawl_refresh _,
    "q195_token_budget" -> q195_token_budget _,
    "q196_asof_revision_join" -> q196_asof_revision_join _,
    "q197_replace_where" -> q197_replace_where _,
    "q199_forget_source" -> q199_forget_source _,
    "q200_dataset_release" -> q200_dataset_release _,
    "q201_meta_tables" -> q201_meta_tables _,
    "q202_restore" -> q202_restore _,
    "q203_file_provenance" -> q203_file_provenance _,
    "q204_page_len" -> q204_page_len _,
    "q205_concurrent_ingest" -> q205_concurrent_ingest _,
    "q206_s3_roundtrip" -> q206_s3_roundtrip _,
    "q207_multiprocess_ingest" -> q207_multiprocess_ingest _,
    "q208_multiprocess_s3" -> q208_multiprocess_s3 _,
    "q209_multiprocess_http" -> q209_multiprocess_http _,
    "q184_meta_agg" -> q184_meta_agg _,
    "q185_runtime_prune_join" -> q185_runtime_prune_join _,
    "q48_series_inline" -> q48_series_inline _,
    "q65_series_squash" -> q65_series_squash _,
    "q66_series_export" -> q66_series_export _,
    "q56_series_paginate" -> q56_series_paginate _,
    "q57_series_epoch" -> q57_series_epoch _,
    "q58_series_merge" -> q58_series_merge _,
    "q59_series_clone" -> q59_series_clone _,
    "q30_series_roundtrip" -> q30_series_roundtrip _,
    "q31_series_overlay" -> q31_series_overlay _,
    "q32_series_timetravel" -> q32_series_timetravel _,
    "q33_series_delete" -> q33_series_delete _,
    "q34_series_kv" -> q34_series_kv _)

  val oracles: Map[String, String] = Map(
    "q171_snapshot_drift" -> q171_oracle,
    "q153_retry_read" -> q153_oracle,
    "q140_stored_drift" -> q140_oracle,
    "q143_cli_read" -> q143_oracle,
    "q138_archive_gc" -> q138_oracle,
    "q133_repo_export" -> q133_oracle,
    "q134_cache_store" -> q134_oracle,
    "q135_memory_root" -> q135_oracle,
    "q136_series_rename" -> q136_oracle,
    "q129_series_defrag" -> q129_oracle,
    "q130_series_gc" -> q130_oracle,
    "q131_registry_search" -> q131_oracle,
    "q132_http_roundtrip" -> q132_oracle,
    "q84_grouped_ingest" -> q84_oracle,
    "q76_sql_facade" -> q76_oracle,
    "q174_connector_sql" -> q174_oracle,
    "q180_connector_insert" -> q180_oracle,
    "q181_connector_multiidx" -> q181_oracle,
    "q182_connector_topn" -> q182_oracle,
    "q183_catalog_sql" -> q183_oracle,
    "q186_sql_delete" -> q186_oracle,
    "q187_sql_maintenance" -> q187_oracle,
    "q188_sql_update" -> q188_oracle,
    "q189_schema_evolution" -> q189_oracle,
    "q191_data_skipping" -> q191_oracle,
    "q192_sql_history" -> q192_oracle,
    "q193_analyze_backfill" -> q193_oracle,
    "q194_crawl_refresh" -> q194_oracle,
    "q195_token_budget" -> q195_oracle,
    "q196_asof_revision_join" -> q196_oracle,
    "q197_replace_where" -> q197_oracle,
    "q199_forget_source" -> q199_oracle,
    "q200_dataset_release" -> q200_oracle,
    "q201_meta_tables" -> q201_oracle,
    "q202_restore" -> q202_oracle,
    "q203_file_provenance" -> q203_oracle,
    "q204_page_len" -> q204_oracle,
    "q205_concurrent_ingest" -> q205_oracle,
    "q206_s3_roundtrip" -> q206_oracle,
    "q207_multiprocess_ingest" -> q207_oracle,
    "q208_multiprocess_s3" -> q208_oracle,
    "q209_multiprocess_http" -> q209_oracle,
    "q184_meta_agg" -> q184_oracle,
    "q185_runtime_prune_join" -> q185_oracle,
    "q48_series_inline" -> q48_oracle,
    "q65_series_squash" -> q65_oracle,
    "q66_series_export" -> q66_oracle,
    "q56_series_paginate" -> q56_oracle,
    "q57_series_epoch" -> q57_oracle,
    "q58_series_merge" -> q58_oracle,
    "q59_series_clone" -> q59_oracle,
    "q30_series_roundtrip" -> q30_oracle,
    "q31_series_overlay" -> q31_oracle,
    "q32_series_timetravel" -> q32_oracle,
    "q33_series_delete" -> q33_oracle,
    "q34_series_kv" -> q34_oracle,
    "q121_snapshot_diff" -> q121_oracle,
    "q123_jsonl_roundtrip" -> q123_oracle)
}
