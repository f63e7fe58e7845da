package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-composed time-series operators Spark has no single operator
  * for: as-of join, gap sessionization, rollup totals, set ops,
  * histograms — each with an exactly mirrored DuckDB oracle.
  */
object QueriesWindow {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "events")

  /** backward as-of join composed from a carry-forward window: each
    * purchase event picks the same user's most recent prior view */
  def q38_asof_join(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev(s, dir)
      .withColumn("prior_view_ts",
        last(when(col("event_type") === "view", col("ts")),
          ignoreNulls = true).over(w))
      .withColumn("prior_view_value",
        last(when(col("event_type") === "view", col("value")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("prior_view_ts"), col("prior_view_value"))
      .orderBy(col("event_id"))
  }

  val q38_oracle: String =
    """SELECT event_id, user_id, ts, prior_view_ts, prior_view_value
      |FROM (
      |  SELECT event_id, user_id, ts, event_type,
      |   last_value(CASE WHEN event_type = 'view' THEN ts END
      |     IGNORE NULLS) OVER (PARTITION BY user_id
      |       ORDER BY ts, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |     AS prior_view_ts,
      |   last_value(CASE WHEN event_type = 'view' THEN value END
      |     IGNORE NULLS) OVER (PARTITION BY user_id
      |       ORDER BY ts, event_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |     AS prior_view_value
      |  FROM events)
      |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  /** gap-based sessionization in batch: a >30min silence starts a new
    * session; emit per-user session stats */
  def q39_sessions(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    ev(s, dir)
      .withColumn("gap_us",
        unix_micros(col("ts")) -
          unix_micros(lag(col("ts"), 1).over(byUser)))
      .withColumn("new_sess",
        when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1)
          .otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        (round(sum(col("value")), 2) + lit(0.0)).as("total"))
      .orderBy(col("user_id"), col("sess_id"))
  }

  val q39_oracle: String =
    """WITH g AS (
      |  SELECT user_id, ts, event_id, value,
      |   epoch_us(ts) - epoch_us(lag(ts, 1) OVER
      |     (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
      |  FROM events),
      |t AS (
      |  SELECT user_id, ts, event_id, value,
      |   CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END
      |     AS new_sess FROM g),
      |si AS (
      |  SELECT user_id, value,
      |   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM t)
      |SELECT user_id, sess_id::BIGINT AS sess_id, count(*) AS n_events,
      | round(sum(value),2) + 0 AS total
      |FROM si GROUP BY user_id, sess_id
      |ORDER BY user_id, sess_id""".stripMargin

  /** rollup: per (returnflag, linestatus) with subtotals and grand
    * total (superset of the reference's flat group-by) */
  def q40_rollup(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val q40_oracle: String =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity),2) AS sum_qty, count(*) AS cnt
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST,
      | l_linestatus ASC NULLS FIRST""".stripMargin

  /** set operators: users seen in week1 INTERSECT week2, and week1
    * EXCEPT week2 */
  def q41_setops(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    def week(lo: String, hi: String) = e
      .filter(col("ts") >= lit(lo).cast("timestamp") &&
        col("ts") < lit(hi).cast("timestamp"))
      .select(col("user_id"))
    val w1 = week("2024-01-01", "2024-01-08")
    val w2 = week("2024-01-08", "2024-01-15")
    w1.intersect(w2).withColumn("op", lit("both"))
      .unionByName(w1.except(w2).withColumn("op", lit("only_w1")))
      .orderBy(col("op"), col("user_id"))
  }

  val q41_oracle: String =
    """WITH w1 AS (SELECT DISTINCT user_id FROM events
      |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'),
      |w2 AS (SELECT DISTINCT user_id FROM events
      |  WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15')
      |SELECT user_id, 'both' AS op FROM w1 INTERSECT
      |  SELECT user_id, 'both' FROM w2
      |UNION ALL
      |(SELECT user_id, 'only_w1' AS op FROM w1 EXCEPT
      |  SELECT user_id, 'only_w1' FROM w2)
      |ORDER BY op, user_id""".stripMargin

  /** value histogram: fixed-width buckets over event values */
  def q42_histogram(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .withColumn("bucket", floor(col("value") / 10.0).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        (round(avg(col("value")), 4) + lit(0.0)).as("avg_v"))
      .orderBy(col("bucket"))

  val q42_oracle: String =
    """SELECT floor(value / 10.0)::BIGINT AS bucket, count(*) AS cnt,
      | round(avg(value),4) + 0 AS avg_v
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** skew-resistant distinct count: explicit two-stage aggregation
    * (pre-aggregate on (key, member) then count) — the plan shape that
    * survives a hot key at 1000-executor scale, result identical to
    * COUNT(DISTINCT) */
  def q43_twostage_distinct(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .select(col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("event_type"))

  val q43_oracle: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** KV delete semantics relationally: per-key aggregate with a set of
    * keys removed (KVSeries.deleteKeys rewrites the covering range
    * without them — this is the visible result) */
  def q46_kv_delete(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(col("user_id"))
      .agg((round(sum(col("value")), 2) + lit(0.0)).as("total"))
      .filter(!col("user_id").isin(3L, 7L, 11L))
      .orderBy(col("user_id"))

  val q46_oracle: String =
    """SELECT user_id, round(sum(value),2) + 0 AS total
      |FROM events GROUP BY user_id
      |HAVING user_id NOT IN (3, 7, 11)
      |ORDER BY user_id""".stripMargin

  /** calendar bucketing via the s-expr day_of_week_num primitive
    * (Sunday=0 in both engines: Spark dayofweek-1, DuckDB dayofweek) */
  def q47_day_of_week(s: SparkSession, dir: String): DataFrame =
    graft.engine.Ops.reduce(ev(s, dir), Seq(
        "dow" -> "(day_of_week_num self.ts)",
        "cnt" -> "(count self.event_id)",
        "total" -> "(sum self.value)"))
      .select(col("dow").cast("long").as("dow"), col("cnt"),
        (round(col("total"), 2) + lit(0.0)).as("total"))
      .orderBy(col("dow"))

  val q47_oracle: String =
    """SELECT dayofweek(ts) AS dow, count(event_id) AS cnt,
      | round(sum(value),2) + 0 AS total
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Regular-grid resample with FORWARD FILL — the timeseries-store
    * op behind "give me this metric on an hourly grid": per event
    * type, the last observation in each hour (latest (ts, event_id)
    * wins — fully deterministic), re-laid on the complete hourly grid
    * spanning the data, gaps carrying the previous hour's value
    * forward. The per-hour `last` is one map-side-combined max_by;
    * the fill window runs over GRID rows (hours × types — bounded by
    * the time span, never by event volume), so a billion-event hour
    * costs the same as an empty one. Values pass through by
    * SELECTION only — no float arithmetic, so cross-engine equality
    * is exact. */
  def q158_gap_fill(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """WITH h AS (SELECT event_type,
        |    date_trunc('HOUR', ts) AS hr,
        |    max_by(value, struct(ts, event_id)) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |b AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM h),
        |grid AS (SELECT t.event_type, g.hr
        |  FROM (SELECT DISTINCT event_type FROM h) t
        |  CROSS JOIN (SELECT explode(sequence(b.h0, b.h1,
        |      interval 1 hour)) AS hr FROM b) g),
        |f AS (SELECT grid.event_type, grid.hr, h.v,
        |    last(h.v, true) OVER (PARTITION BY grid.event_type
        |      ORDER BY grid.hr
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS filled
        |  FROM grid LEFT JOIN h
        |    ON grid.event_type = h.event_type AND grid.hr = h.hr)
        |SELECT event_type, hr, filled AS value,
        |  v IS NULL AND filled IS NOT NULL AS was_gap
        |FROM f ORDER BY event_type, hr""".stripMargin)
  }

  val q158_oracle: String =
    """WITH e AS (SELECT event_type, ts, event_id, value FROM events
      |  WHERE value IS NOT NULL),
      |r AS (SELECT event_type, date_trunc('hour', ts) AS hr, value,
      |    row_number() OVER (PARTITION BY event_type,
      |      date_trunc('hour', ts) ORDER BY ts DESC, event_id DESC)
      |      AS rn
      |  FROM e),
      |h AS (SELECT event_type, hr, value AS v FROM r WHERE rn = 1),
      |b AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM h),
      |grid AS (SELECT t.event_type, g.hr
      |  FROM (SELECT DISTINCT event_type FROM h) t
      |  CROSS JOIN (SELECT unnest(generate_series(b.h0, b.h1,
      |      INTERVAL 1 HOUR)) AS hr FROM b) g),
      |f AS (SELECT grid.event_type, grid.hr, h.v,
      |    last_value(h.v IGNORE NULLS) OVER (
      |      PARTITION BY grid.event_type ORDER BY grid.hr
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS filled
      |  FROM grid LEFT JOIN h
      |    ON grid.event_type = h.event_type AND grid.hr = h.hr)
      |SELECT event_type, hr, filled AS value,
      |  v IS NULL AND filled IS NOT NULL AS was_gap
      |FROM f ORDER BY event_type, hr""".stripMargin

  /** OHLC downsample — the canonical timeseries compaction: per
    * (event type, hour) the opening value (earliest (ts, event_id)),
    * high, low, close (latest), and tick count. All four are
    * SELECTIONS (min_by/max_by/min/max — no float arithmetic), each
    * map-side combined: one scan, one bounded aggregate, exact
    * cross-engine equality. */
  def q159_ohlc(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT event_type, date_trunc('HOUR', ts) AS hr,
        |  min_by(value, struct(ts, event_id)) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max_by(value, struct(ts, event_id)) AS close,
        |  count(*) AS n_ticks
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1, 2 ORDER BY event_type, hr""".stripMargin)
  }

  val q159_oracle: String =
    """WITH r AS (SELECT event_type, date_trunc('hour', ts) AS hr,
      |    value,
      |    row_number() OVER (PARTITION BY event_type,
      |      date_trunc('hour', ts) ORDER BY ts, event_id) AS rn_a,
      |    row_number() OVER (PARTITION BY event_type,
      |      date_trunc('hour', ts) ORDER BY ts DESC, event_id DESC)
      |      AS rn_z
      |  FROM events WHERE value IS NOT NULL)
      |SELECT event_type, hr,
      |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
      |  max(value) AS high, min(value) AS low,
      |  max(CASE WHEN rn_z = 1 THEN value END) AS close,
      |  count(*)::BIGINT AS n_ticks
      |FROM r GROUP BY 1, 2 ORDER BY event_type, hr""".stripMargin

  /** Rolling statistics over the hourly series — 24-observed-hour
    * trailing mean per event type, computed on MILLI-QUANTIZED
    * integer sums so the rolling aggregate is exact bigint (a raw
    * double rolling sum would depend on each engine's window
    * summation order — Spark's running buffer vs a segment tree —
    * and diverge in the last ulp). The window runs over HOURLY rows
    * (bounded by the time span), fed by one map-side-combined
    * per-hour aggregate over the events. */
  def q160_rolling(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """WITH h AS (SELECT event_type, date_trunc('HOUR', ts) AS hr,
        |    count(*) AS n,
        |    sum(cast(round(value * 1000.0D, 0) AS bigint)) AS sv
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT event_type, hr, n,
        |    sum(n) OVER w AS n_24h, sum(sv) OVER w AS sv_24h
        |  FROM h
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hr
        |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
        |SELECT event_type, hr, n, n_24h,
        |  sv_24h div n_24h AS mean_milli_24h
        |FROM r ORDER BY event_type, hr""".stripMargin)
  }

  val q160_oracle: String =
    """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
      |    count(*)::BIGINT AS n,
      |    sum(round(value * 1000.0)::BIGINT) AS sv
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |r AS (SELECT event_type, hr, n,
      |    sum(n) OVER w AS n_24h, sum(sv) OVER w AS sv_24h
      |  FROM h
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hr
      |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
      |SELECT event_type, hr, n, n_24h::BIGINT AS n_24h,
      |  (sv_24h // n_24h)::BIGINT AS mean_milli_24h
      |FROM r ORDER BY event_type, hr""".stripMargin

  /** CUSUM drift localization — where did this metric's level
    * change: per event type, the running sum of hourly-mean
    * deviations from the type's overall mean; the hour where |CUSUM|
    * peaks is the classic change-point estimate. All integer
    * milli-unit arithmetic (hourly means and the global mean are
    * truncating integer divisions, identical in both engines); the
    * running window is span-bounded. */
  def q161_cusum(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """WITH h AS (SELECT event_type, date_trunc('HOUR', ts) AS hr,
        |    count(*) AS n,
        |    sum(cast(round(value * 1000.0D, 0) AS bigint)) AS sv
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |g AS (SELECT event_type, sum(sv) div sum(n) AS gm FROM h
        |  GROUP BY event_type),
        |c AS (SELECT h.event_type, h.hr,
        |    sum(h.sv div h.n - g.gm) OVER (
        |      PARTITION BY h.event_type ORDER BY h.hr
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cusum
        |  FROM h JOIN g ON h.event_type = g.event_type)
        |SELECT event_type, count(*) AS n_hours,
        |  max(abs(cusum)) AS max_abs_cusum,
        |  max_by(hr, struct(abs(cusum) AS a, hr)) AS peak_hr
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val q161_oracle: String =
    """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
      |    count(*)::BIGINT AS n,
      |    sum(round(value * 1000.0)::BIGINT) AS sv
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |g AS (SELECT event_type, sum(sv) // sum(n) AS gm FROM h
      |  GROUP BY event_type),
      |c AS (SELECT h.event_type, h.hr,
      |    sum(h.sv // h.n - g.gm) OVER (
      |      PARTITION BY h.event_type ORDER BY h.hr
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS cusum
      |  FROM h JOIN g ON h.event_type = g.event_type),
      |rk AS (SELECT event_type, hr, cusum,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY abs(cusum) DESC, hr DESC) AS rn
      |  FROM c)
      |SELECT event_type, count(*)::BIGINT AS n_hours,
      |  max(abs(cusum))::BIGINT AS max_abs_cusum,
      |  max(CASE WHEN rn = 1 THEN hr END) AS peak_hr
      |FROM rk GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Interval-to-calendar alignment — how session TIME distributes
    * across the hourly grid: gap-sessionized user intervals (30-min
    * silence, the q39/q53 convention) are exploded onto the hours
    * they overlap (an in-row `sequence` — no join, no grid table)
    * and each hour accumulates its exact overlap in integer epoch
    * milliseconds. Zero-length boundary slivers are excluded except
    * the degenerate single-event session, which counts where it
    * happened. Windows partition per user (the sessionization
    * shape); the final aggregate is hours-sized. */
  def q166_session_hours(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """WITH g AS (SELECT user_id, ts,
        |    CASE WHEN unix_millis(ts) - lag(unix_millis(ts), 1) OVER (
        |        PARTITION BY user_id ORDER BY ts, event_id) > 1800000
        |      OR lag(ts, 1) OVER (
        |        PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      THEN 1 ELSE 0 END AS brk,
        |    event_id
        |  FROM events),
        |si AS (SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS sess_id
        |  FROM g),
        |sess AS (SELECT user_id, sess_id, min(ts) AS st, max(ts) AS en
        |  FROM si GROUP BY 1, 2),
        |hx AS (SELECT st, en,
        |    explode(sequence(date_trunc('HOUR', st),
        |      date_trunc('HOUR', en), interval 1 hour)) AS hr
        |  FROM sess),
        |ov AS (SELECT hr,
        |    unix_millis(least(en, hr + interval 1 hour))
        |      - unix_millis(greatest(st, hr)) AS ms,
        |    st, en
        |  FROM hx)
        |SELECT hr, count(*) AS n_sessions, sum(ms) AS session_ms
        |FROM ov WHERE ms > 0 OR st = en
        |GROUP BY hr ORDER BY hr""".stripMargin)
  }

  val q166_oracle: String =
    """WITH g AS (SELECT user_id, ts,
      |    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER (
      |        PARTITION BY user_id ORDER BY ts, event_id) > 1800000
      |      OR lag(ts, 1) OVER (
      |        PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |      THEN 1 ELSE 0 END AS brk,
      |    event_id
      |  FROM events),
      |si AS (SELECT user_id, ts,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS sess_id
      |  FROM g),
      |sess AS (SELECT user_id, sess_id, min(ts) AS st, max(ts) AS en
      |  FROM si GROUP BY 1, 2),
      |hx AS (SELECT st, en, unnest(generate_series(
      |      date_trunc('hour', st), date_trunc('hour', en),
      |      INTERVAL 1 HOUR)) AS hr
      |  FROM sess),
      |ov AS (SELECT hr,
      |    epoch_ms(least(en, hr + INTERVAL 1 HOUR))
      |      - epoch_ms(greatest(st, hr)) AS ms,
      |    st, en
      |  FROM hx)
      |SELECT hr, count(*)::BIGINT AS n_sessions,
      |  sum(ms)::BIGINT AS session_ms
      |FROM ov WHERE ms > 0 OR st = en
      |GROUP BY hr ORDER BY hr""".stripMargin

  /** First-order Markov transition matrix over event sequences —
    * P(next event type | current), the sequence-model summary behind
    * behavioral segmentation and next-action prediction baselines:
    * `lead()` per user (the sessionization-family window — partition
    * per user, never global), transition counts, probabilities in
    * exact truncating ppm. The matrix is event-types² — constant
    * size; the row-total join broadcasts. */
  def q172_transition_matrix(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """WITH seq AS (SELECT user_id, event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |m AS (SELECT event_type AS from_type, next_type AS to_type,
        |    count(*) AS n
        |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, sum(n) AS row_n FROM m GROUP BY 1)
        |SELECT m.from_type, m.to_type, m.n, t.row_n,
        |  (m.n * 1000000) div t.row_n AS p_ppm
        |FROM m JOIN t ON m.from_type = t.from_type
        |ORDER BY m.from_type, m.to_type""".stripMargin)
  }

  val q172_oracle: String =
    """WITH seq AS (SELECT user_id, event_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS next_type
      |  FROM events),
      |m AS (SELECT event_type AS from_type, next_type AS to_type,
      |    count(*)::BIGINT AS n
      |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT from_type, sum(n)::BIGINT AS row_n FROM m
      |  GROUP BY 1)
      |SELECT m.from_type, m.to_type, m.n, t.row_n,
      |  ((m.n * 1000000) // t.row_n)::BIGINT AS p_ppm
      |FROM m JOIN t ON m.from_type = t.from_type
      |ORDER BY m.from_type, m.to_type""".stripMargin

  /** Inter-arrival time distribution per event type — p50/p90/p99 of
    * the gap between consecutive events of a type, in integer
    * milliseconds: the ops metric behind rate alerting and capacity
    * planning. Gaps via `lag()` on epoch-millis (type-partitioned
    * windows); percentiles under the q13 parity convention, rounded
    * to 3 dp on an integer-valued input so both engines agree
    * (interpolation midpoints are .0 or .5 exactly). */
  def q173_interarrival(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """WITH g AS (SELECT event_type,
        |    unix_millis(ts) - lag(unix_millis(ts), 1) OVER (
        |      PARTITION BY event_type ORDER BY ts, event_id) AS gap_ms
        |  FROM events)
        |SELECT event_type, count(*) AS n_gaps,
        |  round(percentile(gap_ms, 0.5D), 3) + 0 AS p50_ms,
        |  round(percentile(gap_ms, 0.9D), 3) + 0 AS p90_ms,
        |  round(percentile(gap_ms, 0.99D), 3) + 0 AS p99_ms,
        |  max(gap_ms) AS max_ms
        |FROM g WHERE gap_ms IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val q173_oracle: String =
    """WITH g AS (SELECT event_type,
      |    epoch_ms(ts) - lag(epoch_ms(ts), 1) OVER (
      |      PARTITION BY event_type ORDER BY ts, event_id) AS gap_ms
      |  FROM events)
      |SELECT event_type, count(*)::BIGINT AS n_gaps,
      |  round(quantile_cont(gap_ms, 0.5), 3) + 0 AS p50_ms,
      |  round(quantile_cont(gap_ms, 0.9), 3) + 0 AS p90_ms,
      |  round(quantile_cont(gap_ms, 0.99), 3) + 0 AS p99_ms,
      |  max(gap_ms)::BIGINT AS max_ms
      |FROM g WHERE gap_ms IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Keep-best-k-per-group through the NAIVE window SQL — the query a
    * SQL user actually writes — executed with the engine's
    * RankToArgMin rule active (Verify/Bench sessions load
    * GraftExtensions), which rewrites the `row_number() <= k` filter
    * into the bounded TopKRows heap aggregate + posexplode: no
    * per-group sort, k-bounded map-side state (PlanSpec gates the
    * plan shape). The oracle is DuckDB's window formulation — the
    * rewrite must be result-identical to the window it replaced. */
  def q175_topk_rewrite(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT user_id, event_id, cast(rn AS bigint) AS rn FROM (
        |  SELECT user_id, event_id, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn <= 5
        |ORDER BY user_id, rn""".stripMargin)
  }

  val q175_oracle: String =
    """SELECT user_id, event_id, rn FROM (
      |  SELECT user_id, event_id, row_number() OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events) t WHERE rn <= 5
      |ORDER BY user_id, rn""".stripMargin

  /** Time-weighted average price per (event type, day) — the finance
    * downsample where irregular ticks must NOT be averaged naively
    * (a value that held for hours counts more than a 1-second
    * blip). Weight = seconds until the next tick within the day
    * (last tick of the day carries no interval — standard
    * session-TWAP). All arithmetic integer-exact: milli-quantized
    * values × whole-second intervals (products bounded ≪ 2^63),
    * truncating division at the end; groups whose ticks all landed
    * in one second (zero total weight) are excluded in both
    * dialects. One window per (type, day) partition — bounded — and
    * one map-side-combined aggregate. */
  def q179_twap(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """WITH t AS (SELECT event_type, cast(ts AS date) AS day,
        |    cast(round(value * 1000, 0) AS bigint) AS vm,
        |    unix_micros(ts) AS us, ts, event_id
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT event_type, day, vm,
        |    (lead(us) OVER (PARTITION BY event_type, day
        |      ORDER BY ts, event_id) - us) div 1000000 AS dt_s
        |  FROM t)
        |SELECT event_type, day,
        |  count(*) AS n_ticks,
        |  sum(dt_s) AS weight_s,
        |  sum(vm * dt_s) div sum(dt_s) AS twap_milli
        |FROM g WHERE dt_s IS NOT NULL
        |GROUP BY event_type, day
        |HAVING sum(dt_s) > 0
        |ORDER BY event_type, day""".stripMargin)
  }

  val q179_oracle: String =
    """WITH t AS (SELECT event_type, ts::DATE AS day,
      |    round(value * 1000)::BIGINT AS vm,
      |    epoch_us(ts) AS us, ts, event_id
      |  FROM events WHERE value IS NOT NULL),
      |g AS (SELECT event_type, day, vm,
      |    (lead(us) OVER (PARTITION BY event_type, day
      |      ORDER BY ts, event_id) - us) // 1000000 AS dt_s
      |  FROM t)
      |SELECT event_type, day,
      |  count(*)::BIGINT AS n_ticks,
      |  sum(dt_s)::BIGINT AS weight_s,
      |  (sum(vm * dt_s) // sum(dt_s))::BIGINT AS twap_milli
      |FROM g WHERE dt_s IS NOT NULL
      |GROUP BY event_type, day
      |HAVING sum(dt_s) > 0
      |ORDER BY event_type, day""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q179_twap" -> q179_twap _,
    "q175_topk_rewrite" -> q175_topk_rewrite _,
    "q173_interarrival" -> q173_interarrival _,
    "q172_transition_matrix" -> q172_transition_matrix _,
    "q166_session_hours" -> q166_session_hours _,
    "q158_gap_fill" -> q158_gap_fill _,
    "q159_ohlc" -> q159_ohlc _,
    "q160_rolling" -> q160_rolling _,
    "q161_cusum" -> q161_cusum _,
    "q46_kv_delete" -> q46_kv_delete _,
    "q47_day_of_week" -> q47_day_of_week _,
    "q43_twostage_distinct" -> q43_twostage_distinct _,
    "q38_asof_join" -> q38_asof_join _,
    "q39_sessions" -> q39_sessions _,
    "q40_rollup" -> q40_rollup _,
    "q41_setops" -> q41_setops _,
    "q42_histogram" -> q42_histogram _)

  val oracles: Map[String, String] = Map(
    "q179_twap" -> q179_oracle,
    "q175_topk_rewrite" -> q175_oracle,
    "q173_interarrival" -> q173_oracle,
    "q172_transition_matrix" -> q172_oracle,
    "q166_session_hours" -> q166_oracle,
    "q158_gap_fill" -> q158_oracle,
    "q159_ohlc" -> q159_oracle,
    "q160_rolling" -> q160_oracle,
    "q161_cusum" -> q161_oracle,
    "q46_kv_delete" -> q46_oracle,
    "q47_day_of_week" -> q47_oracle,
    "q43_twostage_distinct" -> q43_oracle,
    "q38_asof_join" -> q38_oracle,
    "q39_sessions" -> q39_oracle,
    "q40_rollup" -> q40_oracle,
    "q41_setops" -> q41_oracle,
    "q42_histogram" -> q42_oracle)
}
