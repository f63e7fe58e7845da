package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the training-pipeline dataset-management operators
  * (QueriesPipe): deterministic stratified sampling, train/val/test
  * split, per-source quality top-k.
  */
class PipeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("stratified sample is deterministic and respects per-stratum rates") {
    val a = QueriesPipe.q49_stratified_sample(spark, dir).collect()
    val b = QueriesPipe.q49_stratified_sample(spark, dir).collect()
    assert(a.toSeq == b.toSeq, "sample must be a pure function of the data")
    assert(a.nonEmpty)
    val total = Tables.table(spark, dir, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = a.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    // en is downsampled to ~10%, others kept at 30-50%: the en fraction
    // must be well below the others' (binomial noise at sf0.001 is a few
    // points, the gap is 20+ points)
    val enFrac = got.getOrElse("en", 0L).toDouble / total("en")
    val restFrac = (got - "en").values.sum.toDouble /
      (total - "en").values.sum
    assert(enFrac < restFrac,
      s"en sampled at $enFrac should be below rest at $restFrac")
  }

  test("train/val/test split partitions every document exactly once") {
    val rows = QueriesPipe.q50_train_split(spark, dir).collect()
    val splits = rows.map(_.getString(0)).distinct.sorted
    assert(splits.sameElements(Array("test", "train", "val")))
    val nDocs = rows.map(_.getLong(2)).sum
    val total = Tables.table(spark, dir, "documents").count()
    assert(nDocs == total, s"split counts $nDocs must cover all $total docs")
    val train = rows.filter(_.getString(0) == "train").map(_.getLong(2)).sum
    assert(train > total * 6 / 10, "train bucket should hold ~80%")
  }

  test("reliable materialize without a checkpoint dir fails loudly") {
    // a driver-local fallback would silently defeat executor-loss
    // durability — the mode must demand a cluster-visible path
    Tables.registerAll(spark, dir)
    spark.conf.set("spark.graft.materialize", "reliable")
    try {
      assume(spark.sparkContext.getCheckpointDir.isEmpty)
      val e = intercept[IllegalArgumentException] {
        QueriesSim.materialize(spark, dir,
          "SELECT doc_id FROM documents", "mm_reliable_noconf")
      }
      assert(e.getMessage.contains("spark.graft.checkpoint.dir"))
    } finally spark.conf.unset("spark.graft.materialize")
  }

  test("reliable materialize checkpoints to the cluster-durable store") {
    Tables.registerAll(spark, dir)
    spark.conf.set("spark.graft.materialize", "reliable")
    spark.conf.set("spark.graft.checkpoint.dir",
      java.nio.file.Files.createTempDirectory("graft-ckpt-spec")
        .toString)
    try {
      QueriesSim.materialize(spark, dir,
        "SELECT doc_id, lang FROM documents", "mm_reliable_probe")
      val n = spark.table("mm_reliable_probe").count()
      assert(n == Tables.table(spark, dir, "documents").count())
      // blocks must live under the reliable checkpoint dir (the form
      // that survives executor loss), not only in executor storage
      val ckptDir = spark.sparkContext.getCheckpointDir
      assert(ckptDir.isDefined, "reliable mode must set a checkpoint dir")
      val files = new java.io.File(new java.net.URI(ckptDir.get))
        .listFiles()
      assert(files != null && files.nonEmpty,
        "checkpoint dir should contain persisted RDD blocks")
    } finally {
      spark.conf.unset("spark.graft.materialize")
      spark.conf.unset("spark.graft.checkpoint.dir")
    }
  }

  test("distributed component propagation equals driver union-find") {
    // force the >MaxDriverEdges branch on the small graph, then the
    // driver branch, and require identical canonical labelings — the
    // scale path must not exist only in theory
    def labels(): Map[Long, Long] =
      QueriesPipe.q54_neardup_components(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    QueriesPipe.clearComponentCache()
    sys.props("graft.maxDriverEdges") = "0"
    val dist =
      try labels()
      finally sys.props.remove("graft.maxDriverEdges")
    QueriesPipe.clearComponentCache()
    val uf = labels()
    QueriesPipe.clearComponentCache()
    assert(dist.nonEmpty, "fixture graph must have edges")
    assert(dist == uf,
      "distributed min-label propagation and union-find disagree")
  }

  test("PII redaction scrubs every derived email and phone") {
    val rows = QueriesPipe.q67_pii_redact(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1, "each dirty doc carries >=1 email")
      assert(r.getLong(2) >= 1, "each dirty doc carries >=1 phone")
      val clean = r.getString(3)
      assert(!clean.contains("@mail-"), s"unredacted email in: $clean")
      assert(!clean.contains("+1-555-"), s"unredacted phone in: $clean")
      assert(clean.contains("<EMAIL>") && clean.contains("<PHONE>"))
    }
  }

  test("repetition filter fractions are consistent and verdicts match the rule") {
    val rows = QueriesPipe.q68_repetition(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nWords, nDistinct, topC) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nDistinct <= nWords && topC <= nWords && topC >= 1)
      val keep = nDistinct.toDouble / nWords >= 0.3 &&
        topC.toDouble / nWords <= 0.1
      assert(r.getString(5) == (if (keep) "keep" else "drop"))
    }
    assert(rows.map(_.getString(5)).distinct.length == 2,
      "corpus should contain both keeps and drops")
  }

  test("sequence packing covers every doc once, bins contiguous per (lang, shard)") {
    val rows = QueriesPipe.q69_seq_pack(spark, dir).collect()
    val total = Tables.table(spark, dir, "documents").count()
    assert(rows.map(_.getLong(3)).sum == total, "every doc packed once")
    assert(rows.map(_.getLong(1)).distinct.length > 1,
      "sub-sharding must spread each language over multiple shards")
    rows.groupBy(r => (r.getString(0), r.getLong(1))).foreach {
      case ((lang, shard), rs) =>
        val sorted = rs.sortBy(_.getLong(2))
        // bin ids strictly increase and doc ranges never overlap
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a.getLong(2) < b.getLong(2),
              s"$lang/$shard bins out of order")
            assert(a.getLong(6) < b.getLong(5),
              s"$lang/$shard doc ranges overlap across bins")
          case _ =>
        }
    }
  }

  test("temperature sampling flattens the language distribution") {
    val rows = QueriesPipe.q70_temp_sample(spark, dir).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      val (nDocs, rate, nSampled) =
        (r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(rate > 0 && rate <= 1.0)
      assert(nSampled <= nDocs)
      // binomial tolerance: sampled fraction within ±0.25 of the rate
      assert(math.abs(nSampled.toDouble / nDocs - rate) < 0.25,
        s"${r.getString(0)}: sampled ${nSampled}/${nDocs} vs rate $rate")
    }
    // the rarest language is kept at rate 1.0
    assert(rows.map(_.getDouble(2)).max == 1.0)
  }

  test("chunking covers every word, half-overlapping windows in order") {
    val rows = QueriesPipe.q73_chunking(spark, dir).collect()
    val nTok = Tables.table(spark, dir, "documents")
      .selectExpr("doc_id", "size(split(text, ' ', -1)) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_.getLong(0)).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.head.getLong(2) == 1L, s"doc $doc first chunk at 1")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(2) - a.getLong(2) == 25L,
            s"doc $doc stride must be 25")
        case _ =>
      }
      val last = sorted.last
      // the final window reaches the end of the document
      assert(last.getLong(2) + last.getLong(3) - 1 == nTok(doc),
        s"doc $doc tail words uncovered")
      assert(sorted.forall(_.getLong(3) <= 50))
    }
  }

  test("IVF ANN returns a descending top-10 drawn from probed cells") {
    val rows = QueriesExt.q72_ann_ivf(spark, dir).collect()
    assert(rows.length == 10)
    val cs = rows.map(_.getDouble(2))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
      s"not descending: ${cs.mkString(",")}")
    assert(!rows.map(_.getLong(0)).contains(0L), "query vec excluded")
    val again = QueriesExt.q72_ann_ivf(spark, dir).collect()
    assert(rows.toSeq == again.toSeq, "IVF search must be deterministic")
  }

  test("quality top-k keeps at most 5 best-scored docs per source") {
    val rows = QueriesPipe.q51_quality_topk(spark, dir).collect()
    val bySource = rows.groupBy(_.getString(0))
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, rs) =>
      assert(rs.length <= 5, s"$src has ${rs.length} rows")
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.sameElements(1L to ranks.length), s"$src ranks $ranks")
      val scores = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y },
        s"$src scores not descending: ${scores.mkString(",")}")
    }
  }

  test("bloom dedup equals the exact anti-join (no false negatives)") {
    import spark.implicits._
    val kept = QueriesPipe.q77_bloom_dedup(spark, dir).collect()
    // exact reference computed with plain DataFrame ops
    val docs = Tables.table(spark, dir, "documents")
    val key = org.apache.spark.sql.functions.array_join(
      org.apache.spark.sql.functions.slice(
        org.apache.spark.sql.functions.split($"text", " "), 1, 8), " ")
    val corpus = docs.filter(org.apache.spark.sql.functions
      .length($"source") === 4).select(key.as("k"))
    val nb = docs.filter(org.apache.spark.sql.functions
      .length($"source") === 5).select($"doc_id", key.as("k"))
    val exact = nb.join(corpus, Seq("k"), "left_anti")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.map(_.getLong(0)).sorted.sameElements(exact),
      "bloom-prefiltered dedup must equal the exact anti-join")
    assert(exact.length < nb.count(),
      "the corpus split must actually drop some near-dup prefixes")
  }

  test("bigram LM counts: probabilities in (0,1], counts descending") {
    val rows = QueriesPipe.q78_bigram_lm(spark, dir).collect()
    assert(rows.length == 30)
    val cnts = rows.map(_.getLong(2))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
      "rows must come out in count order")
    assert(rows.forall { r =>
      val p = r.getDouble(3); p > 0.0 && p <= 1.0 })
  }

  test("hll sketch estimate lands within 5% of the exact distinct count") {
    val rows = QueriesPipe.q85_sketch_profile(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(3),
      s"lang ${r.getString(0)}: sketch left the 5% band"))
    // raw-estimate probe alongside the in-query verdict: the sketch
    // value itself must track the exact count
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT count(DISTINCT doc_id) AS exact,
        |  hll_sketch_estimate(hll_sketch_agg(doc_id)) AS approx
        |FROM documents GROUP BY lang""".stripMargin)
      .collect().foreach { r =>
        val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
        assert(math.abs(approx - exact) / exact <= 0.05,
          s"hll $approx vs exact $exact")
      }
    val again = QueriesPipe.q85_sketch_profile(spark, dir).collect()
    assert(rows.toSeq == again.toSeq, "sketch must be deterministic")
  }

  test("contamination spans are 3 tokens wide and match the doc text") {
    val rows = QueriesPipe.q89_contam_spans(spark, dir).collect()
    assert(rows.nonEmpty, "eval overlap must localize some spans")
    val texts = Tables.table(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    rows.foreach { r =>
      val (doc, s, e, sh) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      assert(e - s == 3, "span must cover exactly one 3-gram")
      assert(doc >= 20, "eval docs themselves are not flagged")
      val toks = texts(doc)
      assert(toks.slice(s.toInt, e.toInt).mkString(" ") == sh,
        s"span [$s,$e) of doc $doc does not reproduce the shingle")
    }
  }

  test("duplicate spans reproduce doc text and occur in at least 2 docs") {
    val rows = QueriesPipe.q93_span_dedup(spark, dir).collect()
    assert(rows.nonEmpty, "the corpus must contain cross-doc 5-grams")
    val texts = Tables.table(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    rows.foreach { r =>
      val (doc, s, e, g) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      assert(e - s == 5, "span must cover exactly one 5-gram")
      assert(texts(doc).slice(s.toInt, e.toInt).mkString(" ") == g,
        s"span [$s,$e) of doc $doc does not reproduce the gram")
    }
    // every emitted gram really is cross-document
    rows.groupBy(_.getString(3)).foreach { case (g, rs) =>
      assert(rs.map(_.getLong(0)).distinct.length >= 2,
        s"gram '$g' flagged but seen in only one doc")
    }
  }

  test("bpe merge step ranks two-char pairs by descending frequency") {
    val rows = QueriesPipe.q95_bpe_merge(spark, dir).collect()
    assert(rows.length == 20)
    rows.foreach(r => assert(r.getString(0).length == 2))
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "merge candidates must be ordered by count")
    assert(counts.head > counts.last, "the corpus must prefer some pair")
  }

  test("quality mix keeps all of bucket 1 and thins the tail buckets") {
    val rows = QueriesPipe.q96_quality_mix(spark, dir).collect()
    assert(rows.nonEmpty)
    val byBucket = rows.groupBy(_.getLong(1))
    assert(byBucket.keySet == Set(1L, 2L, 3L, 4L))
    rows.foreach { r =>
      val (docs, kept) = (r.getLong(2), r.getLong(3))
      assert(kept <= docs)
      if (r.getLong(1) == 1L)
        assert(kept == docs, "rate 1.0 must keep the whole bucket")
    }
    def keptFrac(b: Long) = {
      val rs = byBucket(b)
      rs.map(_.getLong(3)).sum.toDouble / rs.map(_.getLong(2)).sum
    }
    assert(keptFrac(4L) < keptFrac(1L),
      "the high-perplexity bucket must be thinned hardest")
  }

  test("semdedup verdicts cover every vector; drops stay in-cluster") {
    val rows = QueriesExt.q91_semdedup(spark, dir).collect()
    val n = Tables.table(spark, dir, "embeddings").count()
    assert(rows.length == n, "one verdict per vector")
    assert(rows.map(_.getLong(0)).distinct.length == n)
    val verdicts = rows.map(_.getString(2)).toSet
    assert(verdicts.subsetOf(Set("keep", "drop")))
    assert(rows.count(_.getString(2) == "drop") > 0,
      "threshold 0.3 must drop some near-dups on this data")
    // the lowest vec_id in every cluster can never be dropped (no
    // lower-id neighbor exists to subsume it)
    rows.groupBy(_.getLong(1)).foreach { case (_, members) =>
      val first = members.minBy(_.getLong(0))
      assert(first.getString(2) == "keep")
    }
  }

  test("scalar quantization bounds the reconstruction error") {
    val rows = QueriesExt.q92_vec_quant(spark, dir).collect()
    val n = Tables.table(spark, dir, "embeddings").count()
    assert(rows.length == n)
    rows.foreach { r =>
      assert(r.getLong(1) == 64, "all embeddings are 64-dimensional")
      val (mean, max) = (r.getDouble(2), r.getDouble(3))
      assert(mean >= 0 && max >= mean,
        s"vec ${r.getLong(0)}: mean $mean / max $max inconsistent")
      // int8 quantization against per-dim ranges keeps the worst
      // per-coordinate error under half a quantization step; the
      // embedding ranges here are O(1), so half-step << 0.05
      assert(max < 0.05, s"vec ${r.getLong(0)}: max error $max")
    }
  }

  test("pq encode: 8 codes per vector, codebook vectors self-code at dist 0") {
    val rows = QueriesExt.q97_pq_codes(spark, dir).collect()
    val n = Tables.table(spark, dir, "embeddings").count()
    assert(rows.length == n * 8, "one code per (vector, subspace)")
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) < 8)
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 4, "code in codebook")
      assert(r.getDouble(3) >= 0)
    }
    // a codebook vector's nearest centroid in every subspace is itself
    rows.filter(r => r.getLong(0) >= 1 && r.getLong(0) <= 4).foreach { r =>
      assert(r.getLong(2) == r.getLong(0) && r.getDouble(3) == 0.0,
        s"codebook vec ${r.getLong(0)} mis-coded in subspace ${r.getLong(1)}")
    }
  }

  test("z-order buckets bound BOTH key ranges to their low 8 bits") {
    val rows = QueriesExt.q99_zorder(spark, dir).collect()
    assert(rows.length > 1, "the curve must spread over several buckets")
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 63,
        s"bucket ${r.getLong(0)}: partkey range exceeds 6 bits")
      assert(r.getLong(5) - r.getLong(4) <= 63,
        s"bucket ${r.getLong(0)}: suppkey range exceeds 6 bits")
    }
    // total coverage: bucket counts sum to the table size
    val n = Tables.table(spark, dir, "lineitem").count()
    assert(rows.map(_.getLong(1)).sum == n)
  }

  test("salted join spreads the hot key and matches the plain join") {
    val df = QueriesExt.q100_salted_join(spark, dir)
    // the physical join must key on the salt too (hot key spread)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("% 8") || plan.contains("pmod"),
      "join keys lack the salt component:\n" + plan.take(2000))
    // and the salt must cancel out of the result: recompute unsalted
    val got = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    Tables.registerAll(spark, dir)
    val plain = spark.sql(
      """WITH e AS (
        |  SELECT CASE WHEN event_id % 3 = 0 THEN 0 ELSE user_id END
        |    AS k, event_type FROM events),
        |dim AS (SELECT user_id AS k, count(*) AS n_events
        |  FROM events GROUP BY user_id)
        |SELECT event_type, count(*) AS n, sum(n_events) AS m
        |FROM e JOIN dim USING (k)
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == plain, "salting changed the join result")
  }

  test("pq adc search returns an ascending top-10 excluding the query") {
    val rows = QueriesExt.q98_pq_adc(spark, dir).collect()
    assert(rows.length == 10)
    assert(!rows.exists(_.getLong(0) == 0L), "query vector not a result")
    val ds = rows.map(_.getDouble(1))
    assert(ds.zip(ds.tail).forall { case (a, b) => a <= b },
      "ADC distances must ascend")
    assert(ds.forall(_ >= 0))
  }

  test("k-means refinement emits 8x64 deterministic centroids that moved") {
    val rows = QueriesExt.q88_kmeans_refine(spark, dir).collect()
    assert(rows.length == 8 * 64)
    val byCid = rows.groupBy(_.getLong(0))
    assert(byCid.keySet == (1L to 8L).toSet)
    byCid.values.foreach(cs => assert(cs.length == 64))
    // Lloyd steps must actually move the centroids off the sampled
    // seed vectors (a no-op refinement would mean broken assignment)
    import spark.implicits._
    val seeds = Tables.table(spark, dir, "embeddings")
      .filter($"vec_id".between(1, 8))
      .selectExpr("vec_id", "cast(embedding as array<double>) e")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Double](1).map(v => math.rint(v * 10000) / 10000)).toMap
    val moved = byCid.count { case (cid, cs) =>
      val cvals = cs.sortBy(_.getLong(1)).map(_.getDouble(2)).toSeq
      cvals != seeds(cid)
    }
    assert(moved >= 6, s"only $moved/8 centroids moved off their seeds")
    val again = QueriesExt.q88_kmeans_refine(spark, dir).collect()
    assert(rows.toSeq == again.toSeq, "refinement must be deterministic")
  }

  test("quota sample takes exactly min(40, group size) per language") {
    val rows = QueriesPipe.q87_quota_sample(spark, dir).collect()
    val totals = Tables.table(spark, dir, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = rows.groupBy(_.getString(1)).view
      .mapValues(_.length.toLong).toMap
    totals.foreach { case (lang, n) =>
      assert(got.getOrElse(lang, 0L) == math.min(40L, n),
        s"$lang: quota ${got.get(lang)} of $n")
    }
    val again = QueriesPipe.q87_quota_sample(spark, dir).collect()
    assert(rows.toSeq == again.toSeq, "quota pick must be deterministic")
  }

  test("cms estimates never undercount and respect the epsilon bound") {
    val rows = QueriesPipe.q86_cms_heavyhitters(spark, dir).collect()
    assert(rows.length == 20)
    // cms_ok encodes (estimate >= exact AND estimate <= exact + eps*N)
    // in the query itself — TRUE for every heavy hitter IS the CMS
    // contract, and a violating sketch also fails the driver's oracle
    rows.foreach(r => assert(r.getBoolean(2),
      s"CMS contract violated for '${r.getString(0)}'"))
    assert(rows.map(_.getLong(1)).toSeq ==
      rows.map(_.getLong(1)).sortBy(-_).toSeq,
      "heavy hitters must come out in descending exact-count order")
    // independent raw probe — NOT a re-read of cms_ok: rebuild the
    // sketch and recompute exact counts + N straight from `documents`
    // (the query derives them from doc_terms), so a wrong N source or
    // an epsN overflow in the query cannot self-certify
    Tables.registerAll(spark, dir)
    val sketchBytes = spark.sql(
      """SELECT count_min_sketch(term, 0.001d, 0.99d, 42)
        |FROM (SELECT explode(split(text, ' ', -1)) AS term
        |      FROM documents)""".stripMargin)
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    val exact = spark.sql(
      """SELECT term, count(*) AS c
        |FROM (SELECT explode(split(text, ' ', -1)) AS term
        |      FROM documents) GROUP BY term""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val n = exact.map(_._2).sum
    val epsN = math.ceil(0.001 * n).toLong
    val probes = exact.sortBy { case (t, c) => (-c, t) }.take(20)
    probes.foreach { case (t, c) =>
      val est = cms.estimateCount(t)
      assert(est >= c, s"'$t': CMS undercounts ($est < $c)")
      assert(est <= c + epsN, s"'$t': CMS overcount past epsN ($est > $c+$epsN)")
    }
    // the query's exact side must agree with the from-scratch counts
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      probes.toSeq, "doc_terms-derived top-20 diverges from raw recount")
    val again = QueriesPipe.q86_cms_heavyhitters(spark, dir).collect()
    assert(rows.toSeq == again.toSeq, "sketch probe must be deterministic")
  }

  // shared tokenized corpus for the from-scratch recomputes below:
  // (doc_id, lang, tokens) straight off the parquet, no query code
  private lazy val rawDocs: Seq[(Long, String, Array[String])] =
    Tables.table(spark, dir, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1))).toSeq

  private def md5Bucket(s: String, mod: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % mod
  }

  test("dsir weights match a from-scratch driver recompute") {
    val rows = QueriesPipe.q104_dsir_weights(spark, dir).collect()
    assert(rows.length == 30)
    assert(rows.forall(_.getLong(0) >= 20), "eval docs must not self-select")
    // independent path: recompute hashed-bucket target/raw stats and
    // per-doc weights from the raw parquet in plain Scala
    val bucketed = rawDocs.flatMap { case (id, _, toks) =>
      toks.groupBy(identity).map { case (t, o) =>
        (id, md5Bucket(t, 512), o.length.toLong) } }
    val tgt = bucketed.filter(_._1 < 20)
      .groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val raw = bucketed.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val (nt, nr) = (tgt.values.sum, raw.values.sum)
    // HALF_UP like SQL round(); math.round sends -x.5 toward +inf
    def r0(x: Double): Long = BigDecimal(x)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val qlr = raw.map { case (b, c) =>
      b -> r0(math.log(
        ((tgt.getOrElse(b, 0L) + 0.5) / (nt + 256.0)) /
          ((c + 0.5) / (nr + 256.0))) * 10000.0) }
    val weights = bucketed.filter(_._1 >= 20)
      .groupBy(_._1).view.mapValues(
        _.map { case (_, b, c) => c * qlr(b) }.sum).toMap
    val expect = weights.toSeq.sortBy { case (id, w) => (-w, id) }
      .take(30).map(_._1).sorted
    assert(rows.map(_.getLong(0)).toSeq == expect,
      "query top-30 diverges from the driver recompute")
    rows.foreach(r => assert(
      math.abs(r.getDouble(2) - weights(r.getLong(0)) / 10000.0) < 1e-9,
      s"doc ${r.getLong(0)}: weight mismatch"))
  }

  test("unimax allocation matches the iterative waterfill and its bounds") {
    val rows = QueriesPipe.q105_unimax_mix(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // independent path: the PAPER's sequential greedy (smallest first),
    // not the closed form the SQL uses
    val avail = rawDocs.groupBy(_._2).view
      .mapValues(_.map(_._3.length.toLong).sum).toMap
    val budget = avail.values.sum * 2 / 5
    var remaining = budget
    var alloc = Map.empty[String, Long]
    val asc = avail.toSeq.sortBy { case (l, n) => (n * 2, l) }
    asc.zipWithIndex.foreach { case ((l, n), i) =>
      val m = asc.length - i
      val cap = n * 2
      if (cap * m <= remaining) { alloc += l -> cap; remaining -= cap }
      else if (!alloc.contains(l)) {
        // uncapped tail: everyone left splits evenly (floor)
        val share = remaining / m
        asc.drop(i).foreach { case (l2, _) => alloc += l2 -> share }
        remaining = 0
      } }
    rows.foreach { case (lang, n, a, ep) =>
      assert(n == avail(lang), s"$lang: avail $n vs ${avail(lang)}")
      assert(a == alloc(lang),
        s"$lang: closed-form $a vs greedy ${alloc(lang)}")
      assert(a <= 2 * n, s"$lang: exceeds the 2-epoch cap")
      assert(math.abs(ep - a.toDouble / n) < 1e-4)
    }
    val spent = rows.map(_._3).sum
    assert(spent <= budget && budget - spent < avail.size * 2L,
      s"allocated $spent of $budget leaves more than rounding slack")
  }

  test("language KL matches a from-scratch recompute and is nonnegative") {
    val rows = QueriesPipe.q106_lang_kl(spark, dir).collect()
    assert(rows.nonEmpty)
    // independent path: exact same integer quantization, plain Scala
    val lt = rawDocs.flatMap { case (_, lang, toks) => toks.map((lang, _)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nl = lt.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val ct = lt.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val total = ct.values.sum
    def r0(x: Double): Long = BigDecimal(x)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val kl = nl.map { case (lang, n) =>
      val s = lt.collect { case ((l, t), c) if l == lang =>
        c * r0(math.log(
          c.toDouble * total / (n.toDouble * ct(t))) * 1e6) }.sum
      lang -> BigDecimal(s / (1e6 * n)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble }
    rows.foreach { r =>
      val lang = r.getString(0)
      assert(r.getLong(1) == nl(lang), s"$lang token total")
      assert(r.getDouble(2) >= 0.0, s"$lang: KL must be nonnegative")
      assert(math.abs(r.getDouble(2) - kl(lang)) <= 1e-4,
        s"$lang: kl ${r.getDouble(2)} vs recompute ${kl(lang)}")
    }
    val again = QueriesPipe.q106_lang_kl(spark, dir).collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("funnel steps are monotonically shrinking") {
    val rows = QueriesPipe.q82_funnel(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("step1_view", "step2_click",
      "step3_purchase"))
    assert(rows("step1_view") >= rows("step2_click"),
      "click-after-view users cannot exceed viewers")
    assert(rows("step2_click") >= rows("step3_purchase"),
      "purchasers cannot exceed clickers")
    assert(rows("step3_purchase") > 0, "sf0.001 funnel should convert")
  }

  test("retention offsets are subsets of the day-0 cohort") {
    val rows = QueriesPipe.q83_retention(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byCohort = rows.groupBy(_._1)
    assert(byCohort.nonEmpty)
    byCohort.foreach { case (day, rs) =>
      val m = rs.map(r => r._2 -> r._3).toMap
      val d0 = m.getOrElse(0L, 0L)
      assert(d0 > 0, s"cohort $day has no day-0 actives")
      (m - 0L).foreach { case (off, n) =>
        assert(n <= d0, s"cohort $day offset $off retains $n > $d0")
      }
    }
  }

  test("json extraction covers every event exactly once per type") {
    val rows = QueriesPipe.q80_json_extract(spark, dir).collect()
    val total = Tables.table(spark, dir, "events").count()
    assert(rows.map(_.getLong(1)).sum == total,
      "per-type counts must partition the events table")
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(5), "min_k <= max_k")
      val avg = r.getDouble(3)
      assert(avg >= r.getLong(4) && avg <= r.getLong(5),
        s"avg $avg outside [min,max]")
    }
  }

  test("shard assignment is a permutation: contiguous positions per shard") {
    val rows = QueriesPipe.q79_shard_assign(spark, dir).collect()
    val n = Tables.table(spark, dir, "documents").count()
    assert(rows.length.toLong == n, "every document assigned exactly once")
    assert(rows.map(_.getLong(0)).distinct.length.toLong == n)
    rows.groupBy(_.getLong(1)).foreach { case (shard, rs) =>
      assert(shard >= 0 && shard < 16)
      val pos = rs.map(_.getLong(2)).sorted
      assert(pos.sameElements(1L to pos.length),
        s"shard $shard positions not contiguous")
    }
    val again = QueriesPipe.q79_shard_assign(spark, dir).collect()
    assert(rows.toSeq == again.toSeq, "assignment must be deterministic")
  }

  test("hard negatives: 5 cross-label neighbors per probe, ranked") {
    val df = QueriesExt.q101_hard_negatives(spark, dir)
    // inspect the plan BEFORE collect(): executed AQE stages collapse
    // into leaf QueryStageExecs that hide their window operators
    val exec = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // the corpus-scale ranking window must be sharded (pid, shard) —
    // never one serialized partition per probe over the whole corpus
    val specs = exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w.partitionSpec.map(_.toString)
    }
    assert(specs.exists(_.size >= 2),
      s"no sharded first-stage window found: $specs")
    val rows = df.collect()
    val probeLabels = Tables.table(spark, dir, "embeddings")
      .filter("vec_id BETWEEN 1 AND 16")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(rows.length == probeLabels.size * 5)
    rows.foreach { r =>
      val (pid, negId, negLabel) =
        (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(negId != pid, "a probe can never be its own negative")
      assert(negLabel != probeLabels(pid),
        s"probe $pid: negative $negId shares its label")
    }
    rows.groupBy(_.getLong(0)).foreach { case (pid, rs) =>
      assert(rs.map(_.getLong(4)).sorted.sameElements(1L to 5L))
      val sims = rs.sortBy(_.getLong(4)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"probe $pid: similarities not descending")
    }
  }

  test("k-anonymity classes partition the corpus with correct flags") {
    val rows = QueriesPipe.q112_k_anonymity(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getBoolean(4))).toMap
    val expect = Tables.table(spark, dir, "documents")
      .select("lang", "source", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2) / 100))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.keySet == expect.keySet, "class keys diverge")
    rows.foreach { case (key, (size, atRisk)) =>
      assert(size == expect(key), s"$key: size $size vs ${expect(key)}")
      assert(atRisk == (size < 5), s"$key: flag wrong")
    }
    assert(rows.values.map(_._1).sum ==
      expect.values.sum, "classes must partition the corpus")
  }

  test("quantile sketch verdicts hold and the raw sketch is rank-sound") {
    val rows = QueriesPipe.q111_quantile_sketch(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4), s"${r.getString(0)}: p50 out of rank band")
      assert(r.getBoolean(5), s"${r.getString(0)}: p95 out of rank band")
      assert(r.getDouble(2) <= r.getDouble(3), "p50 must not exceed p95")
    }
    // independent raw probe: pull the sketch VALUES and bound their
    // ranks against a driver-side sort of the actual data
    Tables.registerAll(spark, dir)
    val approx = spark.sql(
      """SELECT lang, approx_percentile(n_chars, 0.5D, 100) AS a50,
        |  approx_percentile(n_chars, 0.95D, 100) AS a95
        |FROM documents GROUP BY lang""".stripMargin).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val byLang = Tables.table(spark, dir, "documents")
      .select("lang", "n_chars").collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    approx.foreach { case (lang, (a50, a95)) =>
      val xs = byLang(lang); val n = xs.length
      def rankOk(v: Long, q: Double): Boolean = {
        // value must sit within +/- (eps + 1) ranks of q*n for eps=n/100
        val lo = math.max(0, (q * n - n / 100.0 - 2).floor.toInt)
        val hi = math.min(n - 1, (q * n + n / 100.0 + 1).ceil.toInt)
        v >= xs(lo) && v <= xs(hi)
      }
      assert(rankOk(a50, 0.5), s"$lang: p50 sketch $a50 rank-unsound")
      assert(rankOk(a95, 0.95), s"$lang: p95 sketch $a95 rank-unsound")
    }
  }

  test("data card totals reconcile with the corpus and the dedup view") {
    val rows = QueriesPipe.q110_data_card(spark, dir).collect()
    assert(rows.nonEmpty)
    // slice totals must partition the corpus exactly
    assert(rows.map(_.getLong(2)).sum == rawDocs.size.toLong)
    assert(rows.map(_.getLong(3)).sum ==
      rawDocs.map(_._3.length.toLong).sum)
    // independent dup recompute: md5-free — group the raw TEXTS
    val dupDocs = Tables.table(spark, dir, "documents")
      .select("source", "lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val dupTexts = dupDocs.groupBy(_._3).filter(_._2.length > 1).keySet
    val expDup = dupDocs.groupBy(d => (d._1, d._2)).view
      .mapValues(_.count(d => dupTexts.contains(d._3)).toLong).toMap
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      assert(r.getLong(7) == expDup.getOrElse(key, 0L),
        s"$key: dup count ${r.getLong(7)} vs ${expDup.get(key)}")
      assert(r.getLong(4) <= r.getLong(5), "min > max")
      val mean = r.getLong(3).toDouble / r.getLong(2)
      assert(math.abs(r.getDouble(6) - mean) < 1e-3)
    }
  }

  test("gopher n-gram fractions match a from-scratch recompute") {
    val rows = QueriesPipe.q109_gopher_ngram(spark, dir).collect()
    val docs = rawDocs.map { case (id, _, toks) => id -> toks }.toMap
    assert(rows.length == docs.size, "one verdict row per document")
    def r0(x: Double): Long = BigDecimal(x)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def qfrac(toks: Array[String], n: Int): Long = {
      if (toks.length < n) 0L
      else {
        val top = toks.sliding(n).map(_.mkString(" ")).toSeq
          .groupBy(identity).values.map(_.size).max
        r0(top.toLong * n * 1000000.0 / toks.length)
      }
    }
    rows.foreach { r =>
      val toks = docs(r.getLong(0))
      assert(r.getLong(1) == toks.length.toLong)
      val (f2, f3, f4) =
        (qfrac(toks, 2), qfrac(toks, 3), qfrac(toks, 4))
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((f2, f3, f4)),
        s"doc ${r.getLong(0)}: fractions diverge")
      assert(r.getBoolean(5) == (toks.length < 25 ||
        (f2 <= 200000L && f3 <= 180000L && f4 <= 160000L)))
    }
    assert(rows.count(_.getBoolean(5)) > 0,
      "natural text should mostly survive the MassiveText thresholds")
  }

  test("duplicated runs are exactly the interval union of q93's spans") {
    val spans = QueriesPipe.q93_span_dedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val runs = QueriesPipe.q108_dup_runs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(runs.nonEmpty)
    runs.foreach { case (_, s, e, n) =>
      assert(e - s == n, "n_tokens must equal the run extent")
      assert(n >= 5, "a run covers at least one 5-gram") }
    // independent path: merge q93's (oracle-verified) spans in Scala
    val expect = spans.groupBy(_._1).flatMap { case (doc, ss) =>
      val sorted = ss.map(s => (s._2, s._3)).distinct.sortBy(_._1)
      val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      sorted.foreach { case (a, b) =>
        if (merged.nonEmpty && a <= merged.last._2) {
          val (la, lb) = merged.last
          merged(merged.length - 1) = (la, math.max(lb, b))
        } else merged += ((a, b)) }
      merged.map { case (a, b) => (doc, a, b, b - a) }
    }.toSet
    assert(runs.toSet == expect,
      "runs diverge from the span interval-union recompute")
  }

  test("ann recall audit matches a driver recompute of both rankings") {
    val rows = QueriesExt.q107_ann_recall(spark, dir).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r.getLong(1) == 10L)
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 10L)
      assert(math.abs(r.getDouble(3) - r.getLong(2) / 10.0) < 1e-9)
    }
    // independent path: brute-force exact top-10, IVF assignment and
    // the probed-cell top-10 all recomputed in plain Scala from the
    // raw parquet (same sequential IEEE accumulation as the kernel)
    val vs = Tables.table(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cids = (1L to 8L).filter(vs.contains)
    val pids = (Seq(0L) ++ (9L to 15L)).filter(vs.contains)
    def top10(scored: Seq[(Long, Double)]): Set[Long] =
      scored.sortBy { case (id, sc) => (-sc, id) }.take(10).map(_._1).toSet
    val assign = vs.keys.map { id =>
      id -> cids.map(c => (c, r6(cos(vs(id), vs(c)))))
        .sortBy { case (c, sc) => (-sc, c) }.head._1 }.toMap
    pids.foreach { p =>
      val corpus = (vs.keys.toSet - p).toSeq
      val exact = top10(corpus.map(id => id -> r6(cos(vs(id), vs(p)))))
      val cells = cids.map(c => (c, r6(cos(vs(p), vs(c)))))
        .sortBy { case (c, sc) => (-sc, c) }.take(2).map(_._1).toSet
      val cand = corpus.filter(id => cells.contains(assign(id)))
      val ivf = top10(cand.map(id => id -> r6(cos(vs(id), vs(p)))))
      val nHit = exact.intersect(ivf).size
      val row = rows.find(_.getLong(0) == p).get
      assert(row.getLong(2) == nHit,
        s"probe $p: query n_hit ${row.getLong(2)} vs recompute $nHit")
    }
  }

  test("embedding hygiene: per-label norms partition the table") {
    val rows = QueriesExt.q102_embed_hygiene(spark, dir).collect()
    val n = Tables.table(spark, dir, "embeddings").count()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum == n, "labels partition the table")
    rows.foreach { r =>
      val (mean, mn, mx) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(mn <= mean && mean <= mx,
        s"label ${r.getInt(0)}: $mn <= $mean <= $mx violated")
      assert(mn > 0, "synthetic embeddings never have zero norm")
      assert(r.getLong(6) == 0, "synthetic embeddings contain no NaN")
      assert(r.getLong(7) == 64 && r.getLong(8) == 64,
        "all embeddings are 64-dimensional")
    }
  }

  test("vocab OOV rates are valid fractions per language") {
    val rows = QueriesPipe.q103_vocab_oov(spark, dir).collect()
    val langs = Tables.table(spark, dir, "documents")
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(rows.map(_.getString(0)).toSet == langs,
      "every language must be scored")
    val nDocs = Tables.table(spark, dir, "documents").count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    rows.foreach { r =>
      val oov = r.getDouble(2)
      assert(oov >= 0.0 && oov <= 1.0, s"${r.getString(0)}: oov $oov")
      assert(r.getLong(3) <= r.getLong(1))
    }
    // a top-500 vocab over a zipfian corpus must cover most mass
    assert(rows.map(_.getDouble(2)).max < 0.9,
      "OOV ~1.0 means the vocabulary join matched nothing")
  }

  test("leakage-safe split never straddles a near-dup cluster") {
    val rows = QueriesPipe.q127_leakage_safe_split(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val nDocs = Tables.table(spark, dir, "documents").count()
    assert(rows.length.toLong == nDocs, "every doc gets a split")
    // the leakage property: one split per canonical cluster
    rows.groupBy(_._2).foreach { case (canon, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $canon straddles splits: ${members.map(_._3).distinct}")
    }
    // clustered docs really share their component's split (the join
    // actually happened - a broken view would default everyone to
    // their own id and the test above would pass vacuously)
    val comp = QueriesPipe.q54_neardup_components(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.nonEmpty)
    val byId = rows.map(t => t._1 -> t).toMap
    comp.foreach { case (doc, component) =>
      assert(byId(doc)._2 == component,
        s"doc $doc should carry canon $component")
      assert(byId(doc)._3 == byId(component)._3,
        s"doc $doc split differs from its canonical $component")
    }
    // the split gate still lands near 80/10/10 at cluster grain
    val frac = rows.count(_._3 == "train").toDouble / rows.length
    assert(frac > 0.6 && frac < 0.95, s"train fraction $frac")
  }

  test("length batching partitions every doc with bounded waste") {
    val rows = QueriesPipe.q126_length_batching(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val nDocs = Tables.table(spark, dir, "documents").count()
    // every document lands in exactly one batch
    assert(rows.map(_._4).sum == nDocs)
    rows.foreach { case (bucket, shard, batch, n, maxLen, waste) =>
      assert(n >= 1 && n <= 8, s"batch size $n")
      assert(shard >= 0 && shard < 16)
      assert(waste >= 0, s"negative waste $waste")
      // same-bucket docs are within one 64-token band, so padding
      // waste per batch is bounded by (n-1) * 63
      assert(waste <= (n - 1) * 63,
        s"bucket $bucket shard $shard batch $batch: waste $waste > ${(n - 1) * 63}")
      assert(maxLen <= bucket * 64 && maxLen > (bucket - 1) * 64,
        s"max_len $maxLen outside bucket $bucket band")
    }
    // within each (bucket, shard), only the LAST batch may be partial
    rows.groupBy(t => (t._1, t._2)).foreach { case (_, bs) =>
      val sorted = bs.sortBy(_._3)
      sorted.init.foreach(t => assert(t._4 == 8,
        s"non-final batch of size ${t._4}"))
    }
  }
}
