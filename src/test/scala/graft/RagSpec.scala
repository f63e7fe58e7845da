package graft

import org.scalatest.funsuite.AnyFunSuite

/** From-scratch verification of the retrieval/RAG operators
  * (QueriesRag): each test recomputes the expected answer in plain
  * driver-side Scala from the raw parquet rows — independent of both
  * the Spark SQL under test and the DuckDB oracle dialect.
  */
class RagSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  private def docs(): Seq[(Long, String, String)] =
    Tables.table(spark, dir, "documents")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  private def vecs(): Seq[(Long, Array[Double])] =
    Tables.table(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  test("q113 BM25 matches a from-scratch driver recompute") {
    val d = docs()
    val bags = d.map { case (id, text, _) =>
      id -> text.split(" ", -1).toSeq }.toMap
    val tf = bags.view.mapValues(
      _.groupBy(identity).view.mapValues(_.size.toLong).toMap).toMap
    val dl = tf.view.mapValues(_.values.sum).toMap
    val sdl = dl.values.sum.toDouble
    val ndl = dl.size.toDouble
    val n = d.size.toDouble
    val qTerms = bags(5L).distinct
    val df = qTerms.map(t =>
      t -> tf.values.count(_.contains(t)).toLong).toMap
    val scored = tf.keys.filter(_ != 5L).map { id =>
      val qsc = qTerms.flatMap { t =>
        tf(id).get(t).map { cnt =>
          val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
          val tfp = (cnt * 2.2) /
            (cnt + 1.2 * (0.25 + 0.75 * dl(id) * ndl / sdl))
          math.round(idf * tfp * 1e6)
        }
      }.sum
      id -> qsc
    }.toSeq
    val expect = scored.sortBy { case (id, sc) => (-sc, id) }.take(10)
    val got = QueriesRag.q113_bm25(spark, dir).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(3) * 1e4)))
    val want = expect.map { case (id, sc) =>
      (id, math.round(sc / 1e6 * 1e4)) }
    assert(got.toSeq == want.toSeq)
  }

  test("q114 RRF fuses exactly the two top-50 lists") {
    val v = vecs().toMap
    val qe = v(0L)
    val scored = v.toSeq.filter(_._1 != 0L).map { case (id, e) =>
      val qcos = math.round(cos(e, qe) * 1e6)
      var d2 = 0.0; var i = 0
      while (i < e.length) {
        d2 += (e(i) - qe(i)) * (e(i) - qe(i)); i += 1
      }
      (id, qcos, math.round(d2 * 1e6))
    }
    val ra = scored.sortBy(t => (-t._2, t._1)).take(50)
      .zipWithIndex.map { case (t, i) => t._1 -> (i + 1L) }.toMap
    val rb = scored.sortBy(t => (t._3, t._1)).take(50)
      .zipWithIndex.map { case (t, i) => t._1 -> (i + 1L) }.toMap
    val fused = (ra.keySet ++ rb.keySet).toSeq.map { id =>
      id -> (ra.get(id).map(r => 1000000L / (60 + r)).getOrElse(0L)
        + rb.get(id).map(r => 1000000L / (60 + r)).getOrElse(0L))
    }
    val expect = fused.sortBy { case (id, s) => (-s, id) }.take(10)
    val got = QueriesRag.q114_rrf_fusion(spark, dir).collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(2) * 1e6)))
    assert(got.toSeq == expect.toSeq)
  }

  test("q115 MMR equals a driver-side greedy replay") {
    val v = vecs().toMap
    val qe = v(0L)
    val rel = v.toSeq.filter(_._1 != 0L).map { case (id, e) =>
      id -> math.round(cos(e, qe) * 1e6) }
    val cand = rel.sortBy { case (id, r) => (-r, id) }.take(20)
    val relM = cand.toMap
    val simM = (for {
      (a, _) <- cand; (b, _) <- cand if a != b
    } yield (a, b) -> math.round(cos(v(a), v(b)) * 1e6)).toMap
    var selected = Vector.empty[(Long, Long)] // (vec_id, qmmr)
    for (_ <- 1 to 5) {
      val pick =
        if (selected.isEmpty)
          cand.map { case (id, r) => id -> 7 * r }
            .maxBy { case (id, m) => (m, -id) }
        else {
          val rest = cand.filterNot(c =>
            selected.exists(_._1 == c._1))
          rest.map { case (id, r) =>
            val ms = selected.map(s => simM((id, s._1))).max
            id -> (7 * r - 3 * ms)
          }.maxBy { case (id, m) => (m, -id) }
        }
      selected :+= pick
    }
    val got = QueriesRag.q115_mmr_diversify(spark, dir).collect()
      .map(r => (r.getLong(1), math.round(r.getDouble(2) * 1e4)))
    val want = selected.map { case (id, m) =>
      (id, math.round(m / 1e7 * 1e4)) }
    assert(got.toSeq == want.toSeq)
    // diversification must actually reorder: the MMR picks after the
    // first must not simply be relevance ranks 2..5
    val topRel = cand.take(5).map(_._1)
    assert(got.map(_._1).toSeq != topRel,
      "MMR output identical to plain relevance ranking — " +
        "diversity term had no effect on this corpus (suspicious)")
  }

  test("q116 aHash matches the closed-form pixel recompute and drops garbage") {
    import graft.functions.Multimodal.MediaCodec
    // closed form for the 16x16 gradient fixture
    def expectHash(docId: Long): (Long, Long) = {
      val g = Array.tabulate(16, 16)((y, x) =>
        ((docId + 16L * x + 7L * y) % 256).toInt)
      val total = g.flatten.map(_.toLong).sum
      var hi = 0L; var lo = 0L
      for (by <- 0 until 8; bx <- 0 until 8) {
        val cs = (for {
          y <- (2 * by) until (2 * by + 2)
          x <- (2 * bx) until (2 * bx + 2)
        } yield g(y)(x).toLong).sum
        val b = by * 8 + bx
        if (cs * 256 >= total * 4) {
          if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
        }
      }
      (hi, lo)
    }
    for (id <- Seq(0L, 7L, 255L, 256L, 4999L)) {
      val real = MediaCodec.aHash(id, MediaCodec.encodeGradientPng(id))
      assert(real.isDefined, s"decode failed for $id")
      assert((real.get.ahash_hi, real.get.ahash_lo) == expectHash(id),
        s"hash mismatch for $id")
    }
    // ids congruent mod 256 must collide (byte-identical rasters)
    assert(expectHash(3L) == expectHash(259L))
    // garbage payloads are dropped, never fatal
    assert(MediaCodec.aHash(1L, Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaCodec.aHash(1L, Array.empty[Byte]).isEmpty)
    val rows = QueriesRag.q116_image_phash(spark, dir).collect()
    val nDocs = Tables.table(spark, dir, "documents").count()
    assert(rows.map(_.getLong(2)).sum == nDocs,
      "every document must land in exactly one hash group")
  }

  test("q118 incremental dedup matches a driver recompute through the store") {
    import graft.functions.MinHashImpl
    import org.apache.spark.unsafe.types.UTF8String
    val d = docs()
    def md5hex(t: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val fp = d.map { case (id, t, _) => id -> md5hex(t) }.toMap
    val sig = d.map { case (id, t, _) =>
      id -> Option(MinHashImpl.sig(UTF8String.fromString(t)))
        .map(a => (0 until 8).map(a.getLong).toVector)
    }.toMap
    val stored = d.map(_._1).filter(_ % 2 == 0)
    val newb = d.map(_._1).filter(_ % 2 == 1)
    val expect = newb.flatMap { n =>
      val exact = stored.filter(c => fp(c) == fp(n))
      val near = stored.filter { c =>
        (sig(n), sig(c)) match {
          case (Some(a), Some(b)) => a.zip(b).count(p => p._1 == p._2) >= 6
          case _ => false
        }
      }
      if (exact.nonEmpty) Some((n, "exact", exact.min, exact.size.toLong))
      else if (near.nonEmpty) Some((n, "near", near.min, near.size.toLong))
      else None
    }.sortBy(_._1)
    val got = QueriesRag.q118_incremental_dedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expect)
    // the engine round trip must have preserved the stored half
    assert(spark.table("graft_inc_stored").count() == stored.size)
  }

  test("q119 context pack fits the budget in rank order") {
    val rows = QueriesRag.q119_context_pack(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // ranks are the consecutive prefix 1..k of the candidate list
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq)
    // cumulative token count is the running sum and respects the budget
    var cum = 0L
    rows.foreach { case (_, _, _, nTok, cumTok, score) =>
      cum += nTok
      assert(cumTok == cum)
      assert(score > 0)
    }
    assert(cum <= 256)
    // the query document itself must never be retrieved as context
    assert(!rows.exists(_._2 == 5L))
    // scores are non-increasing in rank order
    assert(rows.map(_._6).toSeq == rows.map(_._6).sortBy(-_).toSeq)
  }

  test("q124 tar shards round-trip and parse with the system tar") {
    import graft.functions.WebDataset
    val out = java.nio.file.Files
      .createTempDirectory("graft-wds-test").toString
    val s = spark
    import s.implicits._
    val samples = Seq(
      ("00000001", "hello world"),
      ("00000002", ""),                       // zero-length payload
      ("00000003", "x" * 1000),               // multi-block payload
      ("00000004", "exactly".padTo(512, '!')) // block-aligned payload
    )
    WebDataset.writeShards(
      samples.map { case (k, v) => (k, v.getBytes("UTF-8"), 0) }
        .toDF("key", "payload", "shard"), out)
    val tarPath = s"$out/shard-00000.tar"
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(tarPath))
    // in-JVM round trip: names in key order, payloads byte-identical
    val back = WebDataset.readTar(bytes)
    assert(back.map(_._1) == samples.map(_._1 + ".txt"))
    samples.zip(back).foreach { case ((_, v), (_, data)) =>
      assert(new String(data, "UTF-8") == v)
    }
    // closed-form size (what the oracle computes)
    val expect = samples.map { case (_, v) =>
      512L + (v.getBytes("UTF-8").length + 511L) / 512L * 512L
    }.sum + 1024L
    assert(bytes.length.toLong == expect)
    // external validation: GNU tar must list the same entries
    val tarBin = new java.io.File("/usr/bin/tar")
    assume(tarBin.exists())
    val pb = new ProcessBuilder("/usr/bin/tar", "-tf", tarPath)
    val p = pb.start()
    val listed = new String(p.getInputStream.readAllBytes(), "UTF-8")
      .split("\n").filter(_.nonEmpty).toSeq
    assert(p.waitFor() == 0, "system tar rejected the archive")
    assert(listed == samples.map(_._1 + ".txt"),
      s"tar listed $listed")
  }

  test("q125 cross-modal audit agrees with closed-form hashes per pair") {
    // closed form for the gradient fixture, mirrored from q116's test
    def expectHash(docId: Long): (Long, Long) = {
      val g = Array.tabulate(16, 16)((y, x) =>
        ((docId + 16L * x + 7L * y) % 256).toInt)
      val total = g.flatten.map(_.toLong).sum
      var hi = 0L; var lo = 0L
      for (by <- 0 until 8; bx <- 0 until 8) {
        val cs = (for {
          y <- (2 * by) until (2 * by + 2)
          x <- (2 * bx) until (2 * bx + 2)
        } yield g(y)(x).toLong).sum
        val b = by * 8 + bx
        if (cs * 256 >= total * 4) {
          if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
        }
      }
      (hi, lo)
    }
    val rows = QueriesRag.q125_crossmodal_audit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    assert(rows.nonEmpty, "the sf0.001 corpus has near-dup pairs")
    rows.foreach { case (a, b, m) =>
      assert(m == (expectHash(a) == expectHash(b)),
        s"pair ($a, $b): img_match should follow the pixel math")
    }
    // the audited pair set IS the pinned LSH pair set
    val nPairs = spark.table("sim_pairs").count()
    assert(rows.length.toLong == nPairs)
  }

  test("q128 incremental index reproduces the q113 full rebuild exactly") {
    // the strongest invariant an incremental index can offer: scoring
    // over engine-stored postings + fresh postings is BIT-IDENTICAL to
    // scoring over a from-scratch index of the whole corpus
    val full = QueriesRag.q113_bm25(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    val inc = QueriesRag.q128_incremental_index(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(inc.toSeq == full.toSeq)
    // the stored half really came back through the engine: the view
    // bound by q128 holds exactly the even-doc postings
    val stored = spark.table("graft_idx_stored")
    assert(stored.where("doc_id % 2 = 1").count() == 0)
    assert(stored.count() ==
      spark.table("doc_terms").where("doc_id % 2 = 0").count())
  }

  test("q117 fertility matches integer token sums") {
    val d = docs()
    val re = "[a-z]+|[0-9]+|[^a-z0-9 ]".r
    val agg = d.groupBy(_._3).view.mapValues { rows =>
      val bpe = rows.map(r => re.findAllIn(r._2.toLowerCase).size.toLong).sum
      val ws = rows.map(_._2.split(" ", -1).length.toLong).sum
      val chars = rows.map(_._2.length.toLong).sum
      (bpe, ws, chars)
    }.toMap
    val got = QueriesRag.q117_tok_fertility(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (bpe, ws, chars) = agg(r.getString(0))
      assert(r.getLong(1) == bpe && r.getLong(2) == ws)
      assert(math.abs(r.getDouble(3) - bpe.toDouble / ws) < 1e-6)
      assert(math.abs(r.getDouble(4) - chars.toDouble / bpe) < 1e-6)
    }
  }
}
