package graft

import org.scalatest.funsuite.AnyFunSuite

/** Edge-case hardening for the text-pipeline operators: a corpus of
  * adversarial documents (empty text, whitespace-only, single token,
  * pure repetition, unicode/emoji, looping boilerplate, cross-slice
  * exact duplicates) must flow through the whole text battery without
  * exceptions and with sane outputs. The driver-generated fixtures are
  * clean prose; this suite covers what a real crawl actually contains.
  */
class AdversarialCorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-adv").toString
    // non-document tables come from the small fixture unchanged
    for (n <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings")) {
      val src = java.nio.file.Paths.get(s"/root/testdata/sf0.001/$n.parquet")
      java.nio.file.Files.copy(src,
        java.nio.file.Paths.get(s"$d/$n.parquet"))
    }
    val s = spark
    import s.implicits._
    Seq(
      (0L, "", "en", "web", 0L),
      (1L, "solo", "en", "web", 4L),
      (2L, "a a a a a a a a a a a a", "de", "web", 23L),
      (3L, "naïve café über 東京 emoji 🙂 mix",
        "fr", "web", 30L),
      (4L, ("spam ham " * 50).trim, "en", "crawl", 449L),
      (5L, (1 to 200).map(i => s"w$i").mkString(" "), "de", "crawl", 999L),
      (6L, "   ", "fr", "web", 3L),
      (7L, "dup dup body shared shared tail", "en", "web", 30L),
      (8L, "dup dup body shared shared tail", "de", "crawl", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("text battery runs end to end on adversarial documents") {
    val battery = Seq(
      "q17_dedup_exact", "q18_text_stats", "q19_token_count",
      "q20_quality", "q21_lang_id", "q22_minhash_sig", "q23_lsh_pairs",
      "q24_ngram_jaccard", "q26_simhash", "q29_bpe_tokens",
      "q36_rolling_fp", "q54_neardup_components", "q55_dedup_corpus",
      "q60_tfidf_terms", "q61_decontaminate", "q64_lm_xent",
      "q67_pii_redact", "q68_repetition", "q73_chunking",
      "q77_bloom_dedup", "q78_bigram_lm", "q85_sketch_profile",
      "q86_cms_heavyhitters", "q89_contam_spans", "q93_span_dedup",
      "q95_bpe_merge", "q96_quality_mix", "q103_vocab_oov",
      "q104_dsir_weights", "q105_unimax_mix", "q106_lang_kl",
      "q108_dup_runs", "q109_gopher_ngram", "q110_data_card",
      "q111_quantile_sketch", "q112_k_anonymity",
      // sampling / packing / sharding over the same corpus
      "q49_stratified_sample", "q50_train_split", "q51_quality_topk",
      "q62_topk_native", "q69_seq_pack", "q70_temp_sample",
      "q79_shard_assign", "q87_quota_sample",
      // multimodal payloads synthesized per doc_id
      "q28_multimodal", "q90_audio", "q94_video_frames",
      // documents-sourced streaming ops (exact dedup, in-row minhash)
      "q71_stream_dedup", "q75_stream_minhash",
      // retrieval/RAG cluster (q113's query doc is #5; on this corpus
      // its terms are unique to it, so the result is legitimately
      // empty — the empty-result path is exactly what's exercised)
      "q113_bm25", "q114_rrf_fusion", "q115_mmr_diversify",
      "q116_image_phash", "q117_tok_fertility",
      "q118_incremental_dedup", "q119_context_pack",
      "q120_stream_incdedup", "q122_lsh_audit",
      "q124_webdataset_shards", "q125_crossmodal_audit",
      "q126_length_batching", "q127_leakage_safe_split")
    battery.foreach { name =>
      val rows =
        try SparkEntry.queries(name)(spark, dir).collect()
        catch { case e: Throwable =>
          fail(s"$name threw on the adversarial corpus: $e") }
      assert(rows != null, name)
    }
  }

  test("repetition filters flag the loops and keep the unique doc") {
    val gopher = QueriesPipe.q109_gopher_ngram(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(!gopher(4L), "'spam ham' looping bigram must fail")
    assert(gopher(5L), "200 distinct tokens must pass")
    // sub-25-token docs are the word-count rule's problem, not the
    // repetition rule's: a 12-token loop passes HERE (and 7 distinct
    // unicode tokens must not be collateral damage)
    assert(gopher(2L), "short docs are exempt from the ratio rules")
    assert(gopher(3L), "short unicode doc must survive")
  }

  test("exact duplicates across slices land in both slices' data card") {
    val card = QueriesPipe.q110_data_card(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(7)).toMap
    assert(card(("web", "en")) >= 1L, "doc 7 is an exact dup")
    assert(card(("crawl", "de")) >= 1L, "doc 8 is an exact dup")
  }

  test("duplicated runs cover the shared boilerplate and nothing empty") {
    val runs = QueriesPipe.q108_dup_runs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = runs.groupBy(_._1)
    // docs 7 and 8 share all 6 tokens -> one maximal run [0, 6) each
    for (doc <- Seq(7L, 8L))
      assert(byDoc.get(doc).exists(_.exists(r => r._2 == 0 && r._3 == 6)),
        s"doc $doc: shared boilerplate run missing ($byDoc)")
    // empty / whitespace / single-token docs can never host a 5-gram
    for (doc <- Seq(0L, 1L, 6L))
      assert(!byDoc.contains(doc), s"doc $doc cannot contain runs")
  }
}
