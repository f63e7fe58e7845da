package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Structured Streaming surface.
  *
  * The reference engine has no streaming layer (SURVEY.md §2.8); its
  * nearest analogues are incremental append writes and the changelog
  * as a replayable event log. Here both become first-class:
  * file-stream ingestion over event parquet, watermarked windowed
  * aggregation, stateful sessionization, and the collection changelog
  * exposed as a streaming source of revisions.
  */
object StreamOps {

  /** Stream of raw events from a parquet directory (schema must be
    * supplied — streaming reads don't infer). */
  def eventStream(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Tumbling/sliding windowed counts+sums with late-data handling. */
  def windowedStats(events: DataFrame, tsCol: String,
      windowLen: String, slide: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("event_type"),
        col("cnt"), col("total"))

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp,
      value: Double)
  final case class SessionState(nEvents: Long, total: Double,
      lastTs: Long)
  final case class SessionOut(user_id: Long, n_events: Long,
      total: Double)

  /** Stateful per-user sessionization via mapGroupsWithState: emits
    * the running session aggregate per user each batch. With
    * `gapMs > 0` a processing-time timeout closes idle sessions
    * (long-running deployments); `gapMs <= 0` keeps state forever
    * (bounded replays, tests). */
  def sessionize(events: org.apache.spark.sql.Dataset[SessionEvent],
      gapMs: Long): org.apache.spark.sql.Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeout =
      if (gapMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](timeout) {
        (userId: Long, rows: Iterator[SessionEvent],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            SessionOut(userId, st.nEvents, st.total)
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
            var n = prev.nEvents
            var tot = prev.total
            var last = prev.lastTs
            rows.foreach { e =>
              n += 1; tot += e.value; last = e.ts.getTime
            }
            state.update(SessionState(n, tot, last))
            if (gapMs > 0) state.setTimeoutDuration(gapMs)
            SessionOut(userId, n, tot)
          }
      }
  }

  final case class GapState(sessStart: Long, lastTs: Long, n: Long,
      total: Double)
  final case class SessionRow(user_id: Long,
      sess_start: java.sql.Timestamp, n_events: Long, total: Double)

  /** Event-time gap sessionization (streaming twin of the batch
    * q39_sessions): a silence longer than `gapMs` closes the session.
    * Closed sessions are emitted as they happen (append mode); the
    * still-open session per user lives in state across micro-batches.
    */
  def gapSessions(events: org.apache.spark.sql.Dataset[SessionEvent],
      gapMs: Long): org.apache.spark.sql.Dataset[SessionRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[GapState, SessionRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[SessionEvent],
         state: GroupState[GapState]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var out = List.empty[SessionRow]
          var st = state.getOption.orNull
          sorted.foreach { e =>
            val t = e.ts.getTime
            if (st == null) {
              st = GapState(t, t, 1L, e.value)
            } else if (t - st.lastTs > gapMs) {
              out ::= SessionRow(userId,
                new java.sql.Timestamp(st.sessStart), st.n, st.total)
              st = GapState(t, t, 1L, e.value)
            } else {
              // a late out-of-order event must not regress the silence
              // anchor, or the next on-time event would split spuriously
              st = st.copy(lastTs = math.max(st.lastTs, t), n = st.n + 1L,
                total = st.total + e.value)
            }
          }
          if (st != null) state.update(st)
          out.reverse.iterator
      }
  }

  /** Sink a stream INTO the versioned engine: each micro-batch becomes
    * one overlay write (one revision) on the target series — the
    * engine's append-only changelog is a natural streaming sink, and
    * every batch stays time-travelable. */
  def writeToSeries(stream: DataFrame, series: graft.api.Series)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) series.write(batch)
        val _ = batchId
    }

  /** The collection changelog as a streaming source: each revision
    * file (parent.child) becomes one row as it appears — the engine's
    * own transaction log is replayable/subscribable. */
  def revisionStream(spark: SparkSession, changelogDir: String)
      : DataFrame =
    // manifest payloads are single-line JSON → one row per revision
    spark.readStream
      .format("text")
      .load(changelogDir)
      .select(input_file_name().as("path"))
      .select(element_at(split(col("path"), "/"), -1).as("revision"))
      .select(
        split(col("revision"), "\\.").getItem(0).as("parent"),
        split(col("revision"), "\\.").getItem(1).as("child"))
}
