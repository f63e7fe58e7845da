package graft

import graft.api.Repo
import graft.core.{Closed, GSchema}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main: headline analytic queries + engine write/read
  * throughput on SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  *
  * Engine rows mirror BASELINE.md comparables: bulk series write, full
  * read, range read, grouped aggregate over the stored series.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
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

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()

    // headline analytic queries (subset of the oracle suite)
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
      "q113_bm25", "q116_image_phash", "q117_tok_fertility")
    val qs = SparkEntry.queries
    // debug: SPARK_GRAFT_BENCH_ONLY=q23_lsh_pairs,q54_… restricts the
    // timed queries (engine metrics still run; grep the JSON line)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(',').toSet)
    headline.filter(n => only.forall(_.contains(n))).foreach { name =>
      // one failing query must not cost the whole round's bench line:
      // record it as -1 and keep going
      spark.sparkContext.setJobDescription(name) // event-log attribution
      try results(name) = time { qs(name)(spark, sfDir).count(); () }
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          results(name) = -1.0
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

    // engine throughput: bulk write / full read / range read / agg
    val root = java.nio.file.Files.createTempDirectory("graft-bench")
      .toString
    val repo = new Repo(root, spark)
    val schema = GSchema("ts" -> "timestamp*", "event_id" -> "int*",
      "value" -> "float", "event_type" -> "str")
    val series = repo.createCollection(schema, "events").series("_")
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

    spark.sparkContext.setJobDescription("engine_metrics")
    results("bulk_write") = time { series.write(ev) }
    results("full_read") = time { series.frame().count(); () }
    results("range_read") = time {
      series.frame("2024-01-10 00:00:00", "2024-01-20 00:00:00",
        closed = Closed.Left).count(); ()
    }
    results("agg_read") = time {
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
    val fragSeries = repo.createCollection(schema, "frag").series("_")
    val local = ev.limit(1000).collect().grouped(25).map { chunk =>
      spark.createDataFrame(
        java.util.Arrays.asList(chunk: _*), ev.schema)
    }.toSeq // materialized before the timed region
    results("frag_write") = time { local.foreach(fragSeries.write(_)) }
    results("frag_read") = time { fragSeries.frame().count(); () }
    val _ = nRows

    val qJson = results.map { case (k, v) =>
      "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    // a -1 failure sentinel poisons the whole total: summing only the
    // surviving queries would make a CRASHING query look like a
    // speedup, so a round with any failure reports total=-1 (invalid)
    val total =
      if (results.values.exists(_ < 0)) -1.0 else results.values.sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"sf":"$sfDir"}"""
    println(line)
    // sbt prefixes stdout with "[info] ", which breaks driver-side JSON
    // parsing — always leave a clean copy on disk as well.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
