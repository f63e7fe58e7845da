package graft

import graft.functions.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extended training-data operators: multimodal binary metadata,
  * BPE-style regex tokenization, rolling-hash fingerprints, and the
  * bucketed (IVF-style) ANN scale path. Oracles mirror the arithmetic
  * exactly (document texts are pure ASCII, so char and byte math
  * agree).
  */
object QueriesExt {

  /** REAL image decode end-to-end: synthesize one PNG per document
    * (this container ships no media fixtures — dimensions and solid
    * RGB are pure functions of doc_id), then decode the actual bytes
    * with the JDK's `javax.imageio` in the Dataset.mapPartitions batch
    * shape (see [[graft.functions.Multimodal]]). The oracle recomputes
    * the deterministic dimensions/means in SQL, so a broken decoder —
    * wrong raster size, channel order, or mean math — fails the hash. */
  def q28_multimodal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val payloads = Tables.table(s, dir, "documents")
      .select(col("doc_id").cast("long"))
      .as[Long]
      .mapPartitions(_.map(id =>
        (id, Multimodal.MediaCodec.encodePng(id))))
      .toDF("doc_id", "payload")
    Multimodal.decodeImages(payloads, "doc_id", "payload")
      .toDF().orderBy(col("doc_id"))
  }

  val q28_oracle: String =
    """SELECT doc_id,
      | (doc_id % 13 + 4)::INT AS width,
      | (doc_id % 7 + 3)::INT AS height,
      | (doc_id % 256)::INT AS mean_r,
      | (doc_id * 7 % 256)::INT AS mean_g,
      | (doc_id * 13 % 256)::INT AS mean_b
      |FROM documents ORDER BY doc_id""".stripMargin

  /** BPE-ish regex tokenizer vs whitespace tokenizer, per doc */
  def q29_bpe_tokens(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT doc_id,
        |  size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))
        |    AS n_bpe_tokens,
        |  size(split(text, ' ', -1)) AS n_ws_tokens
        |FROM documents ORDER BY doc_id""".stripMargin)
  }

  val q29_oracle: String =
    """SELECT doc_id,
      | len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))
      |   AS n_bpe_tokens,
      | len(string_split(text, ' ')) AS n_ws_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** rolling polynomial fingerprint over the token stream (mod-P
    * integer math identical in both engines) */
  private val pow31 = (0 until 8).scanLeft(1L)((a, _) => a * 31L).take(8)

  def q36_rolling_fp(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      s"""WITH tk AS (
         |  SELECT doc_id, pos, tok FROM (
         |    SELECT doc_id, split(text, ' ', -1) AS toks FROM (
         |      SELECT ${Tables.spread("documents")} doc_id, text
         |      FROM documents))
         |  LATERAL VIEW posexplode(toks) t AS pos, tok),
         |h AS (SELECT doc_id, pos,
         |  cast(conv(substr(md5(tok),1,8),16,10) as bigint) % 100000 AS hv
         |  FROM tk)
         |SELECT doc_id,
         |  sum(hv * element_at(array(${pow31.mkString(",")}), pos % 8 + 1))
         |    % ${QueriesSim.P} AS fingerprint
         |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin)
  }

  val q36_oracle: String =
    s"""WITH tk AS (
       |  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos,
       |    unnest(toks) AS tok FROM (
       |    SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
       |h AS (SELECT doc_id, pos,
       |  ('0x'||substr(md5(tok),1,8))::BIGINT % 100000 AS hv FROM tk)
       |SELECT doc_id,
       |  (sum(hv * ([${pow31.mkString(",")}])[(pos % 8) + 1])
       |    % ${QueriesSim.P})::BIGINT AS fingerprint
       |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** IVF-style bucketed ANN: coarse-quantize vectors by the sign bits
    * of their first 6 dimensions (64 buckets); search only the query's
    * bucket. The scale path for q25's brute force: at 100 TB the
    * bucket join prunes ~63/64 of the corpus before the cosine math.
    */
  def q35_ann_bucketed(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    val bucketExpr = (0 until 6).map(i =>
      s"(CASE WHEN element_at(e, ${i + 1}) > 0 THEN ${1 << i} ELSE 0 END)")
      .mkString(" + ")
    s.sql(
      s"""WITH v AS (SELECT vec_id, label,
         |    cast(embedding AS array<double>) AS e FROM embeddings),
         |b AS (SELECT vec_id, label, e, $bucketExpr AS bucket FROM v),
         |q AS (SELECT e AS qe, bucket AS qb FROM b WHERE vec_id = 0),
         |cand AS (SELECT vec_id, label, e, qe FROM b, q
         |  WHERE bucket = qb AND vec_id != 0),
         |d AS (SELECT vec_id, label,
         |   aggregate(zip_with(e, qe, (x,y) -> x*y),
         |     cast(0 AS double), (a,x) -> a+x) AS dot,
         |   aggregate(e, cast(0 AS double), (a,x) -> a+x*x) AS na,
         |   aggregate(qe, cast(0 AS double), (a,x) -> a+x*x) AS nb
         |  FROM cand)
         |SELECT vec_id, label,
         |  round(dot/(sqrt(na)*sqrt(nb)), 4) + 0 AS cos
         |FROM d ORDER BY dot/(sqrt(na)*sqrt(nb)) DESC, vec_id
         |LIMIT 10""".stripMargin)
  }

  val q35_oracle: String = {
    val bucketExpr = (0 until 6).map(i =>
      s"(CASE WHEN e[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e
       |  FROM embeddings),
       |b AS (SELECT vec_id, label, e, $bucketExpr AS bucket FROM v),
       |q AS (SELECT e AS qe, bucket AS qb FROM b WHERE vec_id = 0)
       |SELECT vec_id, label,
       |  round(list_cosine_similarity(e, qe), 4) + 0 AS cos
       |FROM b, q WHERE bucket = qb AND vec_id != 0
       |ORDER BY list_cosine_similarity(e, qe) DESC, vec_id
       |LIMIT 10""".stripMargin
  }

  /** ANN top-k via the native codegen CosineSimilarity Expression
    * (graft.functions.VectorExpressions) — one fused loop per row
    * instead of zip_with+aggregate lambda chains; same math, same
    * oracle family as q25 */
  def q37_ann_native(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    graft.functions.VectorFunctions.register(s)
    s.sql(
      """WITH q AS (SELECT embedding AS qe FROM embeddings
        |  WHERE vec_id = 0)
        |SELECT vec_id, label,
        |  round(graft_cosine(embedding, qe), 4) + 0 AS cos
        |FROM embeddings, q WHERE vec_id != 0
        |ORDER BY graft_cosine(embedding, qe) DESC, vec_id
        |LIMIT 15""".stripMargin)
  }

  val q37_oracle: String =
    """WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings
      |  WHERE vec_id = 0)
      |SELECT vec_id, label,
      |  round(list_cosine_similarity(embedding::DOUBLE[], qe), 4) + 0 AS cos
      |FROM embeddings, q WHERE vec_id != 0
      |ORDER BY list_cosine_similarity(embedding::DOUBLE[], qe) DESC, vec_id
      |LIMIT 15""".stripMargin

  /** embedding-cosine near-duplicate pairs with sign-bit bucket
    * blocking (the q35 coarse quantizer): pairs are only compared
    * within their bucket, so the join is an EQUI-join on bucket — never
    * a cartesian — and prunes ~63/64 of the pair space at corpus scale.
    * The oracle applies the identical deterministic blocking, so the
    * candidate sets match 1:1. */
  def q44_embedding_neardup(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    graft.functions.VectorFunctions.register(s)
    val bucketExpr = (0 until 6).map(i =>
      s"(CASE WHEN element_at(e, ${i + 1}) > 0 THEN ${1 << i} ELSE 0 END)")
      .mkString(" + ")
    s.sql(
      s"""WITH v AS (SELECT vec_id, embedding,
         |    cast(embedding AS array<double>) AS e FROM embeddings),
         |b AS (SELECT vec_id, embedding, $bucketExpr AS bucket FROM v)
         |SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
         |  round(graft_cosine(a.embedding, c.embedding), 4) + 0 AS cos
         |FROM b a JOIN b c
         |  ON a.bucket = c.bucket AND a.vec_id < c.vec_id
         |WHERE graft_cosine(a.embedding, c.embedding) >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin)
  }

  val q44_oracle: String = {
    val bucketExpr = (0 until 6).map(i =>
      s"(CASE WHEN e[${i + 1}] > 0 THEN ${1 << i} ELSE 0 END)")
      .mkString(" + ")
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
       |  FROM embeddings),
       |b AS (SELECT vec_id, e, $bucketExpr AS bucket FROM v)
       |SELECT a.vec_id AS vec_a, c.vec_id AS vec_b,
       |  round(list_cosine_similarity(a.e, c.e), 4) + 0 AS cos
       |FROM b a JOIN b c
       |  ON a.bucket = c.bucket AND a.vec_id < c.vec_id
       |WHERE list_cosine_similarity(a.e, c.e) >= 0.4
       |ORDER BY vec_a, vec_b""".stripMargin
  }

  /** IVF ANN with a trained coarse quantizer: 8 sampled vectors act as
    * cell centroids, every vector is assigned to its nearest centroid
    * (cosine, deterministic tie-break on centroid id), and the query
    * probes only its nprobe=2 nearest cells before the exact cosine
    * top-k. Complements q35's sign-bit buckets with the
    * data-dependent cell shape real IVF indexes use: the centroid
    * table is broadcast (8 rows), assignment is a narrow map over the
    * corpus, and the probe join prunes ~3/4 of the corpus — ratios
    * that hold at any scale (k and nprobe grow with sqrt(n)).
    * Similarities are rounded to 6 decimals BEFORE the argmax/probe
    * ordering on both engines so cell assignment never hinges on a
    * final-ulp accumulation difference.
    */
  def q72_ann_ivf(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    graft.functions.VectorFunctions.register(s)
    // cell assignment runs the N×8 broadcast cross join ONCE through
    // the fused native cosine (identical sequential IEEE accumulation
    // to the oracle's list_cosine_similarity); the query's own 1×8
    // probe is a separate trivial join rather than a second pass over
    // the full assignment table.
    //
    // The argmax itself is a min_by over the lexicographic
    // (-sim, cid) struct — the same selection as the oracle's ranked
    // window, but as a MAP-SIDE-COMBINING aggregate: the 8 candidate
    // rows per vector reduce to 1 before the shuffle and nothing is
    // sort-shuffled N×8 wide (the q98 pattern). `0.0D - sim` instead
    // of `-sim` so the key can never be -0.0 (struct ordering compares
    // raw doubles, where -0.0 < 0.0 would break the tie math).
    // any_value(label)/any_value(e) are deterministic: every row in a
    // vec_id group carries the identical label/e.
    s.sql(
      s"""WITH v AS (SELECT ${Tables.spread("embeddings")} vec_id, label,
        |    cast(embedding AS array<double>) AS e FROM embeddings),
        |c AS (SELECT vec_id AS cid, e AS ce FROM v
        |  WHERE vec_id BETWEEN 1 AND 8),
        |a AS (SELECT v.vec_id, any_value(v.label) AS label,
        |    any_value(v.e) AS e,
        |    min_by(c.cid, named_struct(
        |      's', 0.0D - round(graft_cosine(v.e, c.ce), 6),
        |      'c', c.cid)) AS cid
        |  FROM v CROSS JOIN c GROUP BY v.vec_id),
        |qp AS (SELECT cid FROM v CROSS JOIN c WHERE v.vec_id = 0
        |  ORDER BY round(graft_cosine(v.e, c.ce), 6) DESC, cid LIMIT 2),
        |q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
        |d AS (SELECT a.vec_id, a.label, graft_cosine(a.e, q.qe) AS cos
        |  FROM a JOIN qp ON a.cid = qp.cid CROSS JOIN q
        |  WHERE a.vec_id != 0)
        |SELECT vec_id, label, round(cos, 4) + 0 AS cos
        |FROM d ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin)
  }

  val q72_oracle: String =
    """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e
      |  FROM embeddings),
      |c AS (SELECT vec_id AS cid, e AS ce FROM v
      |  WHERE vec_id BETWEEN 1 AND 8),
      |s AS (SELECT v.vec_id, v.label, v.e, c.cid,
      |    round(list_cosine_similarity(v.e, c.ce), 6) AS sim
      |  FROM v CROSS JOIN c),
      |a AS (SELECT vec_id, label, e, cid FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id
      |      ORDER BY sim DESC, cid) AS rn FROM s)
      |  WHERE rn = 1),
      |qp AS (SELECT cid FROM s WHERE vec_id = 0
      |  ORDER BY sim DESC, cid LIMIT 2),
      |q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
      |d AS (SELECT a.vec_id, a.label,
      |    list_cosine_similarity(a.e, q.qe) AS cos
      |  FROM a JOIN qp ON a.cid = qp.cid CROSS JOIN q
      |  WHERE a.vec_id != 0)
      |SELECT vec_id, label, round(cos, 4) + 0 AS cos
      |FROM d ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin

  /** K-means refinement of the IVF coarse quantizer (q72's sampled
    * centroids) as TWO Lloyd iterations in pure declarative SQL:
    * assign every vector to its nearest centroid (fused native cosine,
    * deterministic tie-break), recompute per-dimension means, repeat,
    * emit the refined centroids. At corpus scale each iteration is one
    * broadcast cross join (centroid table is k rows) + one
    * map-side-combined aggregate over (cluster, dim) — the exact shape
    * a distributed k-means uses, with no driver loop for a fixed
    * iteration count. Centroid means sum QUANTIZED integers (exact,
    * order-independent) so both engines compute bit-identical
    * centroids regardless of partitioning.
    */
  def q88_kmeans_refine(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    graft.functions.VectorFunctions.register(s)
    // map-side-combining argmax (the q72/q98 min_by pattern): k
    // candidate rows per vector reduce to 1 before the shuffle, no
    // N×k sort. 0.0D - sim so the struct key can never be -0.0.
    def assign(vRef: String, cRef: String, out: String): String =
      s"""$out AS (SELECT v.vec_id, any_value(v.e) AS e,
         |  min_by(c.cid, named_struct(
         |    's', 0.0D - round(graft_cosine(v.e, c.ce), 6),
         |    'c', c.cid)) AS cid
         |  FROM $vRef v CROSS JOIN $cRef c GROUP BY v.vec_id)""".stripMargin
    // order-independent mean: each addend quantizes to an integer
    // (round(v*1e6)), the sum is EXACT whatever the partition order,
    // and one identical division yields bit-identical doubles in both
    // engines — a plain float avg() differs in the last ulp with
    // summation order and occasionally flips the final rounding
    def means(aRef: String, out: String): String =
      s"""$out AS (
         |  SELECT cid, p + 1 AS dim,
         |    sum(cast(round(val * 1000000, 0) AS bigint)) /
         |      (1000000.0D * count(*)) AS val
         |  FROM $aRef LATERAL VIEW posexplode(e) AS p, val
         |  GROUP BY cid, p + 1)""".stripMargin
    def rebuild(mRef: String, out: String): String =
      s"""$out AS (
         |  SELECT cid, transform(sort_array(collect_list(
         |    struct(dim, val))), x -> x.val) AS ce
         |  FROM $mRef GROUP BY cid)""".stripMargin
    s.sql(
      s"""WITH v AS (SELECT ${Tables.spread("embeddings")} vec_id,
         |    cast(embedding AS array<double>) AS e FROM embeddings),
         |c0 AS (SELECT vec_id AS cid, e AS ce FROM v
         |  WHERE vec_id BETWEEN 1 AND 8),
         |${assign("v", "c0", "a1")},
         |${means("a1", "m1")},
         |${rebuild("m1", "c1")},
         |${assign("v", "c1", "a2")},
         |${means("a2", "m2")}
         |SELECT cid, cast(dim AS bigint) AS dim,
         |  round(val, 4) + 0 AS centroid
         |FROM m2 ORDER BY cid, dim""".stripMargin)
  }

  val q88_oracle: String = {
    def assign(vRef: String, cRef: String, out: String): String =
      s"""$out AS (SELECT vec_id, e, cid FROM (
         |  SELECT v.vec_id, v.e, c.cid,
         |    row_number() OVER (PARTITION BY v.vec_id
         |      ORDER BY round(list_cosine_similarity(v.e, c.ce), 6)
         |        DESC, c.cid) AS rn
         |  FROM $vRef v CROSS JOIN $cRef c) WHERE rn = 1)""".stripMargin
    def means(aRef: String, out: String): String =
      s"""$out AS (
         |  SELECT cid, i AS dim,
         |    sum(round(e[i] * 1000000)::BIGINT) /
         |      (1000000.0 * count(*)) AS val
         |  FROM $aRef, unnest(range(1, len(e) + 1)) AS t(i)
         |  GROUP BY cid, i)""".stripMargin
    def rebuild(mRef: String, out: String): String =
      s"""$out AS (
         |  SELECT cid, list(val ORDER BY dim) AS ce
         |  FROM $mRef GROUP BY cid)""".stripMargin
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
       |  FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, e AS ce FROM v
       |  WHERE vec_id BETWEEN 1 AND 8),
       |${assign("v", "c0", "a1")},
       |${means("a1", "m1")},
       |${rebuild("m1", "c1")},
       |${assign("v", "c1", "a2")},
       |${means("a2", "m2")}
       |SELECT cid, dim::BIGINT AS dim, round(val, 4) + 0 AS centroid
       |FROM m2 ORDER BY cid, dim""".stripMargin
  }

  /** Audio modality, same end-to-end shape as q28: one deterministic
    * constant-amplitude 16-bit mono PCM WAV per document, decoded back
    * through the JDK's `javax.sound.sampled` in the mapPartitions
    * batch shape. Frame count and peak amplitude are pure functions of
    * doc_id, so the oracle verifies the real container parse + PCM
    * math. */
  def q90_audio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val payloads = Tables.table(s, dir, "documents")
      .select(col("doc_id").cast("long"))
      .as[Long]
      .mapPartitions(_.map(id =>
        (id, Multimodal.MediaCodec.encodeWav(id))))
      .toDF("doc_id", "payload")
    Multimodal.decodeAudioCol(payloads, "doc_id", "payload")
      .toDF().orderBy(col("doc_id"))
  }

  val q90_oracle: String =
    """SELECT doc_id,
      | 8000::INT AS sample_rate,
      | 1::INT AS channels,
      | (doc_id % 50 + 20)::BIGINT AS n_samples,
      | (doc_id % 1000 * 16)::INT AS peak
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Video modality end-to-end, completing the image (q28) / audio
    * (q90) / video triple: one deterministic GVID container per
    * document (length-prefixed REAL PNG frames), every 2nd frame
    * SAMPLED off the container index and decoded through the real
    * `javax.imageio` path in the mapPartitions batch shape. Frame
    * count, dimensions, and channel means are pure functions of
    * (doc_id, frame_no), so the oracle verifies the container walk,
    * the sampling arithmetic, AND the per-frame decode. */
  def q94_video_frames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val payloads = Tables.table(s, dir, "documents")
      .select(col("doc_id").cast("long"))
      .as[Long]
      .mapPartitions(_.map(id =>
        (id, Multimodal.MediaCodec.encodeVideo(id))))
      .toDF("doc_id", "payload")
    Multimodal.decodeVideoCol(payloads, "doc_id", "payload", everyK = 2)
      .toDF().orderBy(col("doc_id"), col("frame_no"))
  }

  val q94_oracle: String =
    """WITH f AS (
      |  SELECT doc_id, i AS frame_no, doc_id * 31 + i AS fid
      |  FROM documents, unnest(range(0, doc_id % 4 + 2)) AS t(i)
      |  WHERE i % 2 = 0)
      |SELECT doc_id, frame_no::INT AS frame_no,
      |  (fid % 13 + 4)::INT AS width,
      |  (fid % 7 + 3)::INT AS height,
      |  (fid % 256)::INT AS mean_r,
      |  (fid * 7 % 256)::INT AS mean_g,
      |  (fid * 13 % 256)::INT AS mean_b
      |FROM f ORDER BY doc_id, frame_no""".stripMargin

  /** Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
    * embedding space coarsely, then drop any vector that sits within
    * cosine τ of a lower-id vector IN THE SAME CLUSTER — near-dup
    * comparison never crosses cluster boundaries, so the pair join is
    * an EQUI-join on the cluster id and the pair space shrinks by ~k×.
    * At 100 TB the cluster count grows with sqrt(n) (the q72/q88
    * k-means quantizer trains it), keeping per-cluster pair blocks
    * bounded; here the 8 sampled centroids from q72 serve as the
    * clustering. The paper keeps the member FARTHEST from the
    * centroid; we keep the lowest vec_id — deterministic under any
    * partitioning, which is what lets a SQL oracle pin the result.
    * Similarities are rounded to 6 decimals before every comparison so
    * neither assignment nor the τ threshold hinges on a final-ulp
    * accumulation difference. */
  def q91_semdedup(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    graft.functions.VectorFunctions.register(s)
    s.sql(
      s"""WITH v AS (SELECT ${Tables.spread("embeddings")} vec_id,
         |    cast(embedding AS array<double>) AS e FROM embeddings),
         |c AS (SELECT vec_id AS cid, e AS ce FROM v
         |  WHERE vec_id BETWEEN 1 AND 8),
         |a AS (SELECT v.vec_id, any_value(v.e) AS e,
         |    min_by(c.cid, named_struct(
         |      's', 0.0D - round(graft_cosine(v.e, c.ce), 6),
         |      'c', c.cid)) AS cid
         |  FROM v CROSS JOIN c GROUP BY v.vec_id),
         |drops AS (SELECT DISTINCT b.vec_id
         |  FROM a x JOIN a b ON x.cid = b.cid AND x.vec_id < b.vec_id
         |  WHERE round(graft_cosine(x.e, b.e), 6) >= 0.3)
         |SELECT a.vec_id, cast(a.cid AS bigint) AS cid,
         |  CASE WHEN d.vec_id IS NULL THEN 'keep' ELSE 'drop' END
         |    AS verdict
         |FROM a LEFT JOIN drops d ON a.vec_id = d.vec_id
         |ORDER BY a.vec_id""".stripMargin)
  }

  val q91_oracle: String =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
      |  FROM embeddings),
      |c AS (SELECT vec_id AS cid, e AS ce FROM v
      |  WHERE vec_id BETWEEN 1 AND 8),
      |a AS (SELECT vec_id, e, cid FROM (
      |    SELECT v.vec_id, v.e, c.cid,
      |      row_number() OVER (PARTITION BY v.vec_id
      |        ORDER BY round(list_cosine_similarity(v.e, c.ce), 6)
      |          DESC, c.cid) AS rn
      |    FROM v CROSS JOIN c) WHERE rn = 1),
      |drops AS (SELECT DISTINCT b.vec_id
      |  FROM a x JOIN a b ON x.cid = b.cid AND x.vec_id < b.vec_id
      |  WHERE round(list_cosine_similarity(x.e, b.e), 6) >= 0.3)
      |SELECT a.vec_id, a.cid::BIGINT AS cid,
      |  CASE WHEN d.vec_id IS NULL THEN 'keep' ELSE 'drop' END
      |    AS verdict
      |FROM a LEFT JOIN drops d ON a.vec_id = d.vec_id
      |ORDER BY a.vec_id""".stripMargin

  /** Scalar (int8) embedding quantization — the compression step every
    * 100 TB ANN index applies before storage: per-dimension min/max
    * over the corpus (one map-side-combined aggregate, 64 rows out),
    * each coordinate quantized to a 0..255 code against its
    * dimension's range, and the per-vector reconstruction error
    * reported. The range table is broadcast back (dimension-sized —
    * trivially small at any corpus scale). Per-element absolute errors
    * are quantized to integers (round(err·1e9)) BEFORE the per-vector
    * sum/max, so the reduction is exact integer math — identical in
    * both engines regardless of partitioning or order. */
  def q92_vec_quant(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      s"""WITH v AS (SELECT ${Tables.spread("embeddings")} vec_id,
         |    cast(embedding AS array<double>) AS e FROM embeddings),
         |d AS (SELECT vec_id, p + 1 AS dim, val
         |  FROM v LATERAL VIEW posexplode(e) AS p, val),
         |r AS (SELECT dim, min(val) AS mn, max(val) AS mx
         |  FROM d GROUP BY dim),
         |q AS (SELECT vec_id,
         |    cast(round((val - mn) / (mx - mn) * 255, 0) AS int)
         |      AS code,
         |    val, mn, mx
         |  FROM d JOIN r ON d.dim = r.dim),
         |err AS (SELECT vec_id,
         |    cast(round(abs(val - (mn + code * (mx - mn) / 255))
         |      * 1000000000, 0) AS bigint) AS qe,
         |    code
         |  FROM q)
         |SELECT vec_id, count(*) AS n_dims,
         |  round(sum(qe) / (1000000000.0D * count(*)), 6) + 0
         |    AS mean_abs_err,
         |  round(max(qe) / 1000000000.0D, 6) + 0 AS max_abs_err,
         |  sum(code) AS code_sum
         |FROM err GROUP BY vec_id ORDER BY vec_id""".stripMargin)
  }

  val q92_oracle: String =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
      |  FROM embeddings),
      |d AS (SELECT vec_id, i AS dim, e[i] AS val
      |  FROM v, unnest(range(1, len(e) + 1)) AS t(i)),
      |r AS (SELECT dim, min(val) AS mn, max(val) AS mx
      |  FROM d GROUP BY dim),
      |q AS (SELECT vec_id,
      |    round((val - mn) / (mx - mn) * 255)::INT AS code,
      |    val, mn, mx
      |  FROM d JOIN r ON d.dim = r.dim),
      |err AS (SELECT vec_id,
      |    round(abs(val - (mn + code * (mx - mn) / 255))
      |      * 1000000000)::BIGINT AS qe,
      |    code
      |  FROM q)
      |SELECT vec_id, count(*) AS n_dims,
      |  round(sum(qe) / (1000000000.0 * count(*)), 6) + 0
      |    AS mean_abs_err,
      |  round(max(qe) / 1000000000.0, 6) + 0 AS max_abs_err,
      |  sum(code)::BIGINT AS code_sum
      |FROM err GROUP BY vec_id ORDER BY vec_id""".stripMargin

  /** Johnson-Lindenstrauss random sign projection (Achlioptas 2003)
    * — 64-dim embeddings sketched to 8 dims for cheap pre-filtering
    * before exact rerank: the ±1 projection matrix derives from
    * md5(k:j), so the "matrix" is an expression every executor
    * recomputes — nothing to broadcast, nothing to version. Inputs
    * quantize to micro-units BEFORE the sum, so each projected
    * coordinate is an exact bigint — no float summation order
    * anywhere. The 512-row sign table broadcast-joins the exploded
    * coordinates and the per-vector aggregate map-side combines; at
    * 100 TB the only shuffle carries (vec_id, 8 sums). */
  /** shared JL-sketch CTE chain (Spark dialect): sign matrix `sj`,
    * micro-quantized coordinates `d`, long-form sketch `pl`
    * (vec_id, j, pj) — pj is an EXACT bigint */
  private def jlSparkCtes(nj: Int = 8): String =
    s"""sj AS (SELECT k.k, j.j,
       |    CASE WHEN cast(conv(substr(md5(concat(
       |        cast(k.k AS string), ':', cast(j.j AS string))),
       |        1, 8), 16, 10) AS bigint) % 2 = 0
       |      THEN 1 ELSE -1 END AS sgn
       |  FROM (SELECT explode(sequence(0, 63)) AS k) k
       |  CROSS JOIN (SELECT explode(sequence(0, ${nj - 1})) AS j) j),
       |d AS (SELECT ${Tables.spread("embeddings")} vec_id, p AS k,
       |    cast(round(cast(val AS double) * 1000000, 0) AS bigint)
       |      AS qv
       |  FROM embeddings LATERAL VIEW posexplode(embedding) AS p, val),
       |pl AS (SELECT d.vec_id, s.j, sum(qv * sgn) AS pj
       |  FROM d JOIN sj s ON d.k = s.k GROUP BY 1, 2)""".stripMargin

  /** the same chain in the DuckDB dialect */
  private def jlDuckCtes(nj: Int = 8): String =
    s"""sj AS (SELECT t1.k, t2.j,
      |    CASE WHEN ('0x' || substr(md5(
      |        t1.k::VARCHAR || ':' || t2.j::VARCHAR), 1, 8))::BIGINT
      |        % 2 = 0
      |      THEN 1 ELSE -1 END AS sgn
      |  FROM range(0, 64) t1(k), range(0, $nj) t2(j)),
      |d AS (SELECT vec_id, i - 1 AS k,
      |    round(e[i]::DOUBLE * 1000000)::BIGINT AS qv
      |  FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
      |    unnest(range(1, len(e) + 1)) AS t(i)),
      |pl AS (SELECT d.vec_id, s.j, sum(qv * sgn)::BIGINT AS pj
      |  FROM d JOIN sj s ON d.k = s.k GROUP BY 1, 2)""".stripMargin

  def q145_random_projection(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    val pcols = (0 to 7).map(j =>
      s"max(CASE WHEN j = $j THEN pj END) AS p$j").mkString(",\n  ")
    s.sql(
      s"""WITH ${jlSparkCtes()}
         |SELECT vec_id,
         |  $pcols
         |FROM pl GROUP BY vec_id ORDER BY vec_id""".stripMargin)
  }

  val q145_oracle: String = {
    val pcols = (0 to 7).map(j =>
      s"max(CASE WHEN j = $j THEN pj END) AS p$j").mkString(",\n  ")
    s"""WITH ${jlDuckCtes()}
       |SELECT vec_id,
       |  $pcols
       |FROM pl GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }

  /** The JL sketch doing its job — ANN with sketch PREFILTER + exact
    * rerank, recall-audited: candidate generation ranks by L2² on
    * 16-dim integer sketches (EXACT bigint arithmetic — 16 integer
    * multiplies per pair vs 64 float ops for true cosine, and in a
    * real deployment the sketch would further bucket via its sign
    * bits), keeps top-128 per probe through the two-stage sharded
    * rank, then reranks ONLY those 128 (6% of this corpus) by exact
    * cosine and reports recall@10 against the brute-force truth —
    * the AUDIT is the product: on these near-random synthetic
    * vectors it measures ~0.39, exactly the number a team needs
    * before trusting a sketch index (compare q122's LSH recall
    * audit). The probe sketch table is 128 rows — broadcast;
    * per-probe rerank windows run over ≤ 128 rows. Shares the pinned
    * `ann_sc` cosine table with q107, so the exact baseline is
    * computed once per session. */
  def q146_ann_jl_prefilter(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    graft.functions.VectorFunctions.register(s)
    QueriesSim.materialize(s, dir,
      s"""SELECT /*+ BROADCAST(p) */ p.pid, v.vec_id,
        |  round(graft_cosine(v.e, p.pe), 6) AS sim,
        |  pmod(hash(v.vec_id), 16) AS shard
        |FROM (SELECT ${Tables.spread("embeddings")} vec_id,
        |        cast(embedding AS array<double>) AS e
        |      FROM embeddings) v
        |JOIN (SELECT vec_id AS pid,
        |        cast(embedding AS array<double>) AS pe
        |      FROM embeddings
        |      WHERE vec_id = 0 OR vec_id BETWEEN 9 AND 15) p
        |  ON v.vec_id != p.pid""".stripMargin, "ann_sc")
    // Round 17 (verdict #6, measured A/B, kept the INLINE shape): the
    // 16-dim `pl` sketch is consumed twice — as the big join side and
    // as the broadcast probe set `pp` — and a BroadcastExchange can
    // never reuse a shuffle stage, so the pp subtree's sketch chain
    // recomputes per call. A per-call localCheckpoint pin was built
    // and measured both ways: isolated it looked faster (min 2.66 ->
    // 1.56 s, but across ambient windows), while the in-suite bench —
    // the number that counts — regressed 0.46 -> 0.78 s in a QUIET
    // window: the pin serializes (checkpoint job, then query) what
    // the single-job plan runs as CONCURRENT duplicate stages on idle
    // cores, so total CPU drops but wall rises. The duplicate is a
    // 2000-row sketch chain; at 100 TB scale the same reasoning holds
    // as long as the cluster has idle capacity during the probe
    // build, and the shuffle-side clone is already deduped by AQE
    // stage reuse (1 ReusedExchange in the executed plan).
    s.sql(
      s"""WITH ${jlSparkCtes(16)},
         |pp AS (SELECT vec_id AS pid, j, pj FROM pl
         |  WHERE vec_id = 0 OR vec_id BETWEEN 9 AND 15),
         |sd AS (SELECT /*+ BROADCAST(pp) */ pp.pid, pl.vec_id,
         |    sum((pl.pj - pp.pj) * (pl.pj - pp.pj)) AS d2
         |  FROM pl JOIN pp ON pl.j = pp.j AND pl.vec_id != pp.pid
         |  GROUP BY 1, 2),
         |sd2 AS (SELECT pid, vec_id, d2,
         |    pmod(hash(vec_id), 16) AS shard FROM sd),
         |c1 AS (SELECT pid, vec_id, d2 FROM (
         |    SELECT pid, vec_id, d2, row_number() OVER (
         |      PARTITION BY pid, shard ORDER BY d2, vec_id) AS rn
         |    FROM sd2) WHERE rn <= 128),
         |cand AS (SELECT pid, vec_id FROM (
         |    SELECT pid, vec_id, row_number() OVER (
         |      PARTITION BY pid ORDER BY d2, vec_id) AS rn
         |    FROM c1) WHERE rn <= 128),
         |rr AS (SELECT pid, vec_id FROM (
         |    SELECT sc.pid, sc.vec_id, row_number() OVER (
         |      PARTITION BY sc.pid ORDER BY sc.sim DESC, sc.vec_id)
         |      AS rn
         |    FROM ann_sc sc JOIN cand
         |      ON sc.pid = cand.pid AND sc.vec_id = cand.vec_id)
         |  WHERE rn <= 10),
         |x1 AS (SELECT pid, vec_id, sim FROM (
         |    SELECT pid, vec_id, sim, row_number() OVER (
         |      PARTITION BY pid, shard ORDER BY sim DESC, vec_id) AS rn
         |    FROM ann_sc) WHERE rn <= 10),
         |exact AS (SELECT pid, vec_id FROM (
         |    SELECT pid, vec_id, row_number() OVER (
         |      PARTITION BY pid ORDER BY sim DESC, vec_id) AS rn
         |    FROM x1) WHERE rn <= 10),
         |h AS (SELECT e.pid, count(*) AS n_hit
         |  FROM exact e JOIN rr i
         |    ON e.pid = i.pid AND e.vec_id = i.vec_id
         |  GROUP BY e.pid)
         |SELECT pr.pid, cast(10 AS bigint) AS k,
         |  cast(128 AS bigint) AS n_cand,
         |  coalesce(h.n_hit, 0) AS n_hit,
         |  round(coalesce(h.n_hit, 0) / 10.0D, 4) + 0 AS recall_at_10
         |FROM (SELECT DISTINCT pid FROM pp) pr
         |LEFT JOIN h ON pr.pid = h.pid ORDER BY pr.pid""".stripMargin)
  }

  /** Embedding-quality audit via kNN label purity — the standard
    * representation-quality probe before trusting embeddings for
    * retrieval or dedup: on a deterministic probe sample (vec_id %
    * 37), the share of each probe's exact top-10 cosine neighbors
    * that carry the probe's own label, aggregated per label in exact
    * ppm. The probe set broadcasts (it is 1/37th of the corpus and
    * would be a fixed eval set in production); neighbor ranking is
    * the two-stage sharded top-k, so no per-probe window ever sees
    * more than shards x 10 rows. */
  def q150_label_purity(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    graft.functions.VectorFunctions.register(s)
    s.sql(
      s"""WITH v AS (SELECT ${Tables.spread("embeddings")} vec_id,
         |    label, cast(embedding AS array<double>) AS e
         |  FROM embeddings),
         |p AS (SELECT vec_id AS pid, label AS plabel, e AS pe FROM v
         |  WHERE vec_id % 37 = 0),
         |sc AS (SELECT /*+ BROADCAST(p) */ p.pid, p.plabel, v.vec_id,
         |    v.label, round(graft_cosine(v.e, p.pe), 6) AS sim,
         |    pmod(hash(v.vec_id), 16) AS shard
         |  FROM v JOIN p ON v.vec_id != p.pid),
         |x1 AS (SELECT pid, plabel, vec_id, label, sim FROM (
         |    SELECT pid, plabel, vec_id, label, sim, row_number() OVER (
         |      PARTITION BY pid, shard ORDER BY sim DESC, vec_id) AS rn
         |    FROM sc) WHERE rn <= 10),
         |top AS (SELECT pid, plabel, label FROM (
         |    SELECT pid, plabel, label, row_number() OVER (
         |      PARTITION BY pid ORDER BY sim DESC, vec_id) AS rn
         |    FROM x1) WHERE rn <= 10),
         |per AS (SELECT pid, plabel,
         |    sum(CASE WHEN label = plabel THEN 1 ELSE 0 END) AS hits
         |  FROM top GROUP BY pid, plabel)
         |SELECT plabel AS label, count(*) AS n_probes,
         |  sum(hits) AS n_hits,
         |  (sum(hits) * 1000000) div (count(*) * 10) AS purity_ppm
         |FROM per GROUP BY plabel ORDER BY label""".stripMargin)
  }

  val q150_oracle: String =
    """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e
      |  FROM embeddings),
      |p AS (SELECT vec_id AS pid, label AS plabel, e AS pe FROM v
      |  WHERE vec_id % 37 = 0),
      |sc AS (SELECT p.pid, p.plabel, v.vec_id, v.label,
      |    round(list_cosine_similarity(v.e, p.pe), 6) AS sim
      |  FROM v JOIN p ON v.vec_id != p.pid),
      |top AS (SELECT pid, plabel, label FROM (
      |    SELECT pid, plabel, label, row_number() OVER (
      |      PARTITION BY pid ORDER BY sim DESC, vec_id) AS rn
      |    FROM sc) WHERE rn <= 10),
      |per AS (SELECT pid, plabel,
      |    sum(CASE WHEN label = plabel THEN 1 ELSE 0 END) AS hits
      |  FROM top GROUP BY pid, plabel)
      |SELECT plabel AS label, count(*)::BIGINT AS n_probes,
      |  sum(hits)::BIGINT AS n_hits,
      |  ((sum(hits) * 1000000) // (count(*) * 10))::BIGINT
      |    AS purity_ppm
      |FROM per GROUP BY plabel ORDER BY label""".stripMargin

  /** Embedding dimension-collapse audit — the representation-health
    * check run before spending compute on an embedding corpus: per
    * dimension, mean and variance on MILLI-QUANTIZED integers
    * (round(v*1e3)), two-pass — integer mean first, then the exact
    * integer sum of squared deviations — so magnitudes stay within
    * bigint at any corpus size (the one-pass n·Σx²-(Σx)² form
    * overflows past ~1e9 rows) and both engines agree bit-for-bit.
    * A dimension whose variance falls under 1e-3 is flagged
    * collapsed (dead feature). One explode + two map-side-combined
    * aggregates; output is embedding-width rows. */
  def q156_dim_collapse(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      s"""WITH d AS (SELECT ${Tables.spread("embeddings")} pos AS dim,
         |    cast(round(cast(v AS double) * 1000, 0) AS bigint) AS q
         |  FROM embeddings
         |  LATERAL VIEW posexplode(embedding) t AS pos, v),
         |m AS (SELECT dim, count(*) AS n,
         |    sum(q) div count(*) AS mq FROM d GROUP BY dim),
         |vr AS (SELECT d.dim, m.n, m.mq,
         |    sum((d.q - m.mq) * (d.q - m.mq)) AS ss
         |  FROM d JOIN m ON d.dim = m.dim GROUP BY d.dim, m.n, m.mq)
         |SELECT dim, n, mq AS mean_milli, ss div n AS var_milli2,
         |  (ss div n) < 1000 AS collapsed
         |FROM vr ORDER BY dim""".stripMargin)
  }

  val q156_oracle: String =
    """WITH d AS (SELECT generate_subscripts(embedding, 1) - 1 AS dim,
      |    round(unnest(embedding)::DOUBLE * 1000)::BIGINT AS q
      |  FROM embeddings),
      |m AS (SELECT dim, count(*)::BIGINT AS n,
      |    (sum(q) // count(*))::BIGINT AS mq FROM d GROUP BY dim),
      |vr AS (SELECT d.dim, m.n, m.mq,
      |    sum((d.q - m.mq) * (d.q - m.mq))::BIGINT AS ss
      |  FROM d JOIN m ON d.dim = m.dim GROUP BY d.dim, m.n, m.mq)
      |SELECT dim, n, mq AS mean_milli, ss // n AS var_milli2,
      |  (ss // n) < 1000 AS collapsed
      |FROM vr ORDER BY dim""".stripMargin

  val q146_oracle: String =
    s"""WITH ${jlDuckCtes(16)},
       |pp AS (SELECT vec_id AS pid, j, pj FROM pl
       |  WHERE vec_id = 0 OR vec_id BETWEEN 9 AND 15),
       |sd AS (SELECT pp.pid, pl.vec_id,
       |    sum((pl.pj - pp.pj) * (pl.pj - pp.pj)) AS d2
       |  FROM pl JOIN pp ON pl.j = pp.j AND pl.vec_id != pp.pid
       |  GROUP BY 1, 2),
       |cand AS (SELECT pid, vec_id FROM (
       |    SELECT pid, vec_id, row_number() OVER (
       |      PARTITION BY pid ORDER BY d2, vec_id) AS rn
       |    FROM sd) WHERE rn <= 128),
       |v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       |p AS (SELECT vec_id AS pid, e AS pe FROM v
       |  WHERE vec_id = 0 OR vec_id BETWEEN 9 AND 15),
       |sc AS (SELECT p.pid, v.vec_id,
       |    round(list_cosine_similarity(v.e, p.pe), 6) AS sim
       |  FROM v JOIN p ON v.vec_id != p.pid),
       |rr AS (SELECT pid, vec_id FROM (
       |    SELECT sc.pid, sc.vec_id, row_number() OVER (
       |      PARTITION BY sc.pid ORDER BY sc.sim DESC, sc.vec_id)
       |      AS rn
       |    FROM sc JOIN cand
       |      ON sc.pid = cand.pid AND sc.vec_id = cand.vec_id)
       |  WHERE rn <= 10),
       |exact AS (SELECT pid, vec_id FROM (
       |    SELECT pid, vec_id, row_number() OVER (
       |      PARTITION BY pid ORDER BY sim DESC, vec_id) AS rn
       |    FROM sc) WHERE rn <= 10),
       |h AS (SELECT e.pid, count(*) AS n_hit
       |  FROM exact e JOIN rr i
       |    ON e.pid = i.pid AND e.vec_id = i.vec_id
       |  GROUP BY e.pid)
       |SELECT pr.pid, 10::BIGINT AS k, 128::BIGINT AS n_cand,
       |  coalesce(h.n_hit, 0)::BIGINT AS n_hit,
       |  round(coalesce(h.n_hit, 0) / 10.0, 4) + 0 AS recall_at_10
       |FROM (SELECT DISTINCT pid FROM pp) pr
       |LEFT JOIN h ON pr.pid = h.pid ORDER BY pr.pid""".stripMargin

  /** Product quantization encode (Jégou et al. 2011) — the codebook
    * compression behind billion-scale ANN indexes: the 64-dim space
    * splits into 8 orthogonal 8-dim subspaces, each with its own tiny
    * codebook (here the 4 deterministic sample vectors 1-4, the same
    * sampled-codebook convention as q72's coarse centroids), and every
    * vector stores one code per subspace — 8 bytes instead of 256.
    * The codebook is trivially broadcast-sized at any corpus scale and
    * the per-vector argmin is in-row math, so encoding is scan-speed
    * and embarrassingly parallel. Per-element differences are
    * quantized to integers BEFORE the squared-distance sum, making the
    * argmin exact integer arithmetic — bit-identical across engines
    * and partitionings (q88's determinism trick). */
  def q97_pq_codes(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      s"""WITH v AS (SELECT ${Tables.spread("embeddings")} vec_id,
         |    cast(embedding AS array<double>) AS e FROM embeddings),
         |sub AS (SELECT vec_id, sp, slice(e, sp * 8 + 1, 8) AS sv
         |  FROM v LATERAL VIEW explode(sequence(0, 7)) AS sp),
         |cb AS (SELECT sp, vec_id AS cid, sv AS cv FROM sub
         |  WHERE vec_id BETWEEN 1 AND 4),
         |d AS (SELECT s.vec_id, s.sp, c.cid,
         |    aggregate(zip_with(s.sv, c.cv, (x, y) ->
         |        cast(round((x - y) * 1000000, 0) AS bigint)),
         |      cast(0 AS bigint), (a, x) -> a + x * x) AS dq
         |  FROM sub s JOIN cb c ON s.sp = c.sp),
         |a AS (SELECT vec_id, sp,
         |    min_by(cid, named_struct('d', dq, 'c', cid)) AS code,
         |    min(dq) AS dq
         |  FROM d GROUP BY vec_id, sp)
         |SELECT vec_id, cast(sp AS bigint) AS subspace, code,
         |  round(dq / 1000000000000.0D, 6) + 0 AS dist_sq
         |FROM a ORDER BY vec_id, subspace""".stripMargin)
  }

  val q97_oracle: String =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
      |  FROM embeddings),
      |sub AS (SELECT vec_id, sp, e[sp * 8 + 1 : sp * 8 + 8] AS sv
      |  FROM v, unnest(range(0, 8)) AS t(sp)),
      |cb AS (SELECT sp, vec_id AS cid, sv AS cv FROM sub
      |  WHERE vec_id BETWEEN 1 AND 4),
      |d AS (SELECT s.vec_id, s.sp, c.cid,
      |    list_sum(list_transform(range(1, 9), i ->
      |      round((s.sv[i] - c.cv[i]) * 1000000)::BIGINT *
      |      round((s.sv[i] - c.cv[i]) * 1000000)::BIGINT)) AS dq
      |  FROM sub s JOIN cb c ON s.sp = c.sp),
      |a AS (SELECT vec_id, sp, cid, dq, row_number() OVER (
      |    PARTITION BY vec_id, sp ORDER BY dq, cid) AS rn
      |  FROM d)
      |SELECT vec_id, sp::BIGINT AS subspace, cid AS code,
      |  round(dq / 1000000000000.0, 6) + 0 AS dist_sq
      |FROM a WHERE rn = 1 ORDER BY vec_id, subspace""".stripMargin

  /** PQ asymmetric-distance search (ADC): the query stays exact while
    * the corpus is represented only by its q97 codes — per subspace a
    * 4-entry lookup table of query-to-centroid distances is built
    * once (32 numbers total, broadcast anywhere), and every corpus
    * vector's approximate distance is the sum of 8 table lookups.
    * This is how a PQ index scans billions of codes without touching
    * a single float vector; the 8-byte codes are the only per-vector
    * state. Distances reuse q97's integer quantization, so LUT build,
    * code assignment, and the final ranking are all exact integer
    * math. Top-10 by ADC distance, deterministic tie-break on vec_id.
    * Code assignment is a min_by over the lexicographic (dq, cid)
    * struct — the same argmin as the oracle's ranked window, but as a
    * map-side-combined aggregate (4x reduced before the shuffle, no
    * per-(vec, subspace) sort). */
  def q98_pq_adc(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      s"""WITH v AS (SELECT ${Tables.spread("embeddings")} vec_id,
         |    cast(embedding AS array<double>) AS e FROM embeddings),
         |sub AS (SELECT vec_id, sp, slice(e, sp * 8 + 1, 8) AS sv
         |  FROM v LATERAL VIEW explode(sequence(0, 7)) AS sp),
         |cb AS (SELECT sp, vec_id AS cid, sv AS cv FROM sub
         |  WHERE vec_id BETWEEN 1 AND 4),
         |d AS (SELECT s.vec_id, s.sp, c.cid,
         |    aggregate(zip_with(s.sv, c.cv, (x, y) ->
         |        cast(round((x - y) * 1000000, 0) AS bigint)),
         |      cast(0 AS bigint), (a, x) -> a + x * x) AS dq
         |  FROM sub s JOIN cb c ON s.sp = c.sp),
         |codes AS (
         |  SELECT vec_id, sp,
         |    min_by(cid, named_struct('d', dq, 'c', cid)) AS code
         |  FROM d WHERE vec_id != 0 GROUP BY vec_id, sp),
         |lut AS (SELECT sp, cid, dq FROM d WHERE vec_id = 0),
         |adc AS (
         |  SELECT codes.vec_id, sum(lut.dq) AS adist
         |  FROM codes JOIN lut
         |    ON codes.sp = lut.sp AND codes.code = lut.cid
         |  GROUP BY codes.vec_id)
         |SELECT vec_id,
         |  round(adist / 1000000000000.0D, 6) + 0 AS adc_dist
         |FROM adc ORDER BY adist, vec_id LIMIT 10""".stripMargin)
  }

  val q98_oracle: String =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
      |  FROM embeddings),
      |sub AS (SELECT vec_id, sp, e[sp * 8 + 1 : sp * 8 + 8] AS sv
      |  FROM v, unnest(range(0, 8)) AS t(sp)),
      |cb AS (SELECT sp, vec_id AS cid, sv AS cv FROM sub
      |  WHERE vec_id BETWEEN 1 AND 4),
      |d AS (SELECT s.vec_id, s.sp, c.cid,
      |    list_sum(list_transform(range(1, 9), i ->
      |      round((s.sv[i] - c.cv[i]) * 1000000)::BIGINT *
      |      round((s.sv[i] - c.cv[i]) * 1000000)::BIGINT)) AS dq
      |  FROM sub s JOIN cb c ON s.sp = c.sp),
      |codes AS (SELECT vec_id, sp, cid AS code FROM (
      |    SELECT vec_id, sp, cid, row_number() OVER (
      |      PARTITION BY vec_id, sp ORDER BY dq, cid) AS rn
      |    FROM d) WHERE rn = 1),
      |lut AS (SELECT sp, cid, dq FROM d WHERE vec_id = 0),
      |adc AS (
      |  SELECT codes.vec_id, sum(lut.dq) AS adist
      |  FROM codes JOIN lut
      |    ON codes.sp = lut.sp AND codes.code = lut.cid
      |  WHERE codes.vec_id != 0
      |  GROUP BY codes.vec_id)
      |SELECT vec_id,
      |  round(adist / 1000000000000.0, 6) + 0 AS adc_dist
      |FROM adc ORDER BY adist, vec_id LIMIT 10""".stripMargin

  /** Z-order (Morton) layout key over (l_partkey, l_suppkey): the
    * space-filling-curve sort key lakehouse compaction uses so that
    * BOTH dimensions' min/max footer stats stay tight in every file —
    * a range predicate on either column then prunes most files, where
    * a single-column sort only ever prunes one. The report groups the
    * curve into 64 coarse buckets and shows each bucket spans a
    * bounded range of both keys (the property that makes the pruning
    * work). Pure bit arithmetic — identical in both engines; sorting
    * 100 TB by zval is one range-partitioned sort, the same cost as
    * any compaction pass. */
  private def zInterleave(x: String, y: String,
      spark: Boolean): String =
    (0 until 16).map { i =>
      if (spark)
        s"shiftleft(cast(shiftright($x, $i) & 1 AS bigint), ${2 * i}) + " +
          s"shiftleft(cast(shiftright($y, $i) & 1 AS bigint), ${2 * i + 1})"
      else
        s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("\n    + ")

  def q99_zorder(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    // no REPARTITION before the aggregate: the interleave is cheap
    // codegen arithmetic evaluated inside the scan's partial
    // aggregate (64 output groups, map-side combined), so an extra
    // full-width exchange of the two key columns only added a
    // shuffle — scan parallelism comes from input splits here and
    // from file count on a real corpus
    s.sql(
      s"""WITH z AS (
         |  SELECT l_partkey AS pk, l_suppkey AS sk,
         |    (${zInterleave("l_partkey", "l_suppkey", spark = true)})
         |      AS zval
         |  FROM lineitem)
         |SELECT shiftright(zval, 12) AS z_bucket, count(*) AS n,
         |  min(pk) AS pk_min, max(pk) AS pk_max,
         |  min(sk) AS sk_min, max(sk) AS sk_max
         |FROM z GROUP BY z_bucket ORDER BY z_bucket""".stripMargin)
  }

  val q99_oracle: String =
    s"""WITH z AS (
       |  SELECT l_partkey AS pk, l_suppkey AS sk,
       |    (${zInterleave("l_partkey", "l_suppkey", spark = false)})
       |      AS zval
       |  FROM lineitem)
       |SELECT (zval >> 12)::BIGINT AS z_bucket, count(*)::BIGINT AS n,
       |  min(pk) AS pk_min, max(pk) AS pk_max,
       |  min(sk) AS sk_min, max(sk) AS sk_max
       |FROM z GROUP BY z_bucket ORDER BY z_bucket""".stripMargin

  /** Skew-salted join: one synthetic hot key (a third of the events
    * collapse onto user 0 — the power-law key every clickstream has)
    * would hash every matching row to ONE reducer in a plain shuffle
    * join. The probe side salts the key with `event_id % 8`, the
    * user-stats build side replicates once per salt value (8 rows per
    * user — still broadcast-sized math, but the shape holds when the
    * dim is too big to broadcast and the join must shuffle), and the
    * equi-join runs on (key, salt): the hot key spreads over 8
    * reducers. The salt cancels out of the result, so the oracle is
    * the plain unsalted join — equality IS the correctness proof. */
  def q100_salted_join(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      s"""WITH e AS (
         |  SELECT CASE WHEN event_id % 3 = 0 THEN 0 ELSE user_id END
         |      AS k,
         |    event_id % 8 AS salt, event_type
         |  FROM (SELECT ${Tables.spread("events")}
         |          event_id, user_id, event_type FROM events)),
         |dim AS (SELECT user_id AS k, count(*) AS n_events
         |  FROM events GROUP BY user_id),
         |dim_s AS (SELECT k, n_events, salt
         |  FROM dim LATERAL VIEW explode(sequence(0, 7)) AS salt),
         |j AS (SELECT /*+ SHUFFLE_HASH(d) */ e.event_type, d.n_events
         |  FROM e JOIN dim_s d ON e.k = d.k AND e.salt = d.salt)
         |SELECT event_type, count(*) AS n_joined,
         |  sum(n_events) AS dim_mass
         |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val q100_oracle: String =
    """WITH e AS (
      |  SELECT CASE WHEN event_id % 3 = 0 THEN 0 ELSE user_id END AS k,
      |    event_type
      |  FROM events),
      |dim AS (SELECT user_id AS k, count(*) AS n_events
      |  FROM events GROUP BY user_id)
      |SELECT event_type, count(*)::BIGINT AS n_joined,
      |  sum(n_events)::BIGINT AS dim_mass
      |FROM e JOIN dim USING (k)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Hard-negative mining for retrieval training: for each probe
    * vector, the top-5 most-similar corpus vectors carrying a
    * DIFFERENT label — the "looks relevant but isn't" examples a
    * contrastive trainer wants. The probe set is broadcast (16 rows —
    * probe sets are always tiny next to the corpus), similarity is
    * in-row math over the corpus scan, and top-k per probe is the
    * two-stage shard pattern: rank inside (probe, shard) first —
    * 16x16 window keys, never a per-probe serialized window over the
    * whole corpus — then a final rank over the surviving 80 rows per
    * probe. Scores are rounded to 6 dp with vec_id tie-breaks, so
    * both engines pick identical rows. */
  def q101_hard_negatives(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    graft.functions.VectorFunctions.register(s)
    s.sql(
      s"""WITH v AS (SELECT ${Tables.spread("embeddings")} vec_id,
         |    label, cast(embedding AS array<double>) AS e
         |  FROM embeddings),
         |p AS (SELECT vec_id AS pid, label AS plabel, e AS pe FROM v
         |  WHERE vec_id BETWEEN 1 AND 16),
         |sc AS (SELECT /*+ BROADCAST(p) */ p.pid, v.vec_id, v.label,
         |    round(graft_cosine(v.e, p.pe), 6) AS sim,
         |    pmod(hash(v.vec_id), 16) AS shard
         |  FROM v JOIN p
         |    ON v.label != p.plabel AND v.vec_id != p.pid),
         |t1 AS (SELECT pid, vec_id, label, sim FROM (
         |    SELECT pid, vec_id, label, sim, row_number() OVER (
         |      PARTITION BY pid, shard ORDER BY sim DESC, vec_id) AS rn
         |    FROM sc) WHERE rn <= 5)
         |SELECT pid, vec_id AS neg_id, label AS neg_label,
         |  sim + 0 AS sim, cast(rank AS bigint) AS rank
         |FROM (SELECT pid, vec_id, label, sim, row_number() OVER (
         |    PARTITION BY pid ORDER BY sim DESC, vec_id) AS rank
         |  FROM t1)
         |WHERE rank <= 5 ORDER BY pid, rank""".stripMargin)
  }

  val q101_oracle: String =
    """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e
      |  FROM embeddings),
      |p AS (SELECT vec_id AS pid, label AS plabel, e AS pe FROM v
      |  WHERE vec_id BETWEEN 1 AND 16),
      |sc AS (SELECT p.pid, v.vec_id, v.label,
      |    round(list_cosine_similarity(v.e, p.pe), 6) AS sim
      |  FROM v JOIN p
      |    ON v.label != p.plabel AND v.vec_id != p.pid)
      |SELECT pid, vec_id AS neg_id, label AS neg_label,
      |  sim + 0 AS sim, rank
      |FROM (SELECT pid, vec_id, label, sim, row_number() OVER (
      |    PARTITION BY pid ORDER BY sim DESC, vec_id) AS rank
      |  FROM sc)
      |WHERE rank <= 5 ORDER BY pid, rank""".stripMargin

  /** Embedding-table hygiene audit — the sanity pass a pipeline runs
    * before spending GPU-hours on a corpus: per-label vector counts,
    * L2-norm distribution, near-zero-norm and NaN detection, and
    * dimension consistency. All per-vector math is in-row over the
    * scan (norms, NaN scan, dims) and the reduction is one map-side
    * combined groupBy on label. Norms are quantized to integer
    * micro-units BEFORE the sum so the aggregate is exact integer
    * math — identical across engines and partitionings (in-row
    * double summation order is fixed in both engines, so the
    * quantized norm itself is bit-stable too). */
  def q102_embed_hygiene(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      s"""WITH v AS (SELECT ${Tables.spread("embeddings")} vec_id,
         |    label, cast(embedding AS array<double>) AS e
         |  FROM embeddings),
         |n AS (SELECT label,
         |    cast(round(sqrt(aggregate(e, 0.0D,
         |      (acc, x) -> acc + x * x)) * 1000000, 0) AS bigint) AS qn,
         |    CASE WHEN exists(e, x -> isnan(x)) THEN 1 ELSE 0 END
         |      AS has_nan,
         |    cast(size(e) AS bigint) AS dims
         |  FROM v)
         |SELECT label, count(*) AS n_vecs,
         |  round(sum(qn) / (1000000.0D * count(*)), 6) + 0
         |    AS mean_norm,
         |  round(min(qn) / 1000000.0D, 6) + 0 AS min_norm,
         |  round(max(qn) / 1000000.0D, 6) + 0 AS max_norm,
         |  sum(CASE WHEN qn < 500000 THEN 1 ELSE 0 END) AS n_low_norm,
         |  sum(has_nan) AS n_nan,
         |  min(dims) AS min_dims, max(dims) AS max_dims
         |FROM n GROUP BY label ORDER BY label""".stripMargin)
  }

  val q102_oracle: String =
    """WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e
      |  FROM embeddings),
      |n AS (SELECT label,
      |    round(sqrt(list_aggregate(list_transform(e, x -> x * x),
      |      'sum')) * 1000000)::BIGINT AS qn,
      |    CASE WHEN len(list_filter(e, x -> isnan(x))) > 0
      |      THEN 1 ELSE 0 END AS has_nan,
      |    len(e) AS dims
      |  FROM v)
      |SELECT label, count(*)::BIGINT AS n_vecs,
      |  round(sum(qn) / (1000000.0 * count(*)), 6) + 0 AS mean_norm,
      |  round(min(qn) / 1000000.0, 6) + 0 AS min_norm,
      |  round(max(qn) / 1000000.0, 6) + 0 AS max_norm,
      |  sum(CASE WHEN qn < 500000 THEN 1 ELSE 0 END)::BIGINT
      |    AS n_low_norm,
      |  sum(has_nan)::BIGINT AS n_nan,
      |  min(dims)::BIGINT AS min_dims, max(dims)::BIGINT AS max_dims
      |FROM n GROUP BY label ORDER BY label""".stripMargin

  /** ANN recall audit: recall@10 of the IVF search (q72's coarse
    * cells, nprobe=2) against brute-force exact top-10 ground truth,
    * for a panel of 8 probes — the measurement a pipeline runs to
    * tune nprobe/cell count BEFORE trusting an index for corpus-scale
    * retrieval. Shapes at 100 TB: the probe panel broadcasts into one
    * scan of the corpus, and the per-(probe, vector) cosine table is
    * PINNED once (executor-side checkpoint, the sim_sig pattern) so
    * both the exact and the IVF ranking read the same blocks instead
    * of re-running the corpus-wide cosine pass;
    * both top-10s use the two-stage (probe, shard) rank so no
    * per-probe partition ever serializes the corpus; cell assignment
    * is the N×8 broadcast cross join q72 documents. Hit counting is
    * an equi-join on (probe, vector) — integers end to end, so the
    * oracle compare is exact. */
  def q107_ann_recall(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    graft.functions.VectorFunctions.register(s)
    // the (probe, vector) cosine table feeds BOTH rankings; as a
    // plain CTE Spark inlines it into each consumer (their required
    // distributions differ, so no exchange reuse applies) and the
    // corpus-wide graft_cosine pass would run TWICE — pin it once
    // (executor-side checkpoint, the sim_sig pattern) instead
    QueriesSim.materialize(s, dir,
      s"""SELECT /*+ BROADCAST(p) */ p.pid, v.vec_id,
        |  round(graft_cosine(v.e, p.pe), 6) AS sim,
        |  pmod(hash(v.vec_id), 16) AS shard
        |FROM (SELECT ${Tables.spread("embeddings")} vec_id,
        |        cast(embedding AS array<double>) AS e
        |      FROM embeddings) v
        |JOIN (SELECT vec_id AS pid,
        |        cast(embedding AS array<double>) AS pe
        |      FROM embeddings
        |      WHERE vec_id = 0 OR vec_id BETWEEN 9 AND 15) p
        |  ON v.vec_id != p.pid""".stripMargin, "ann_sc")
    s.sql(
      s"""WITH v AS (SELECT ${Tables.spread("embeddings")} vec_id,
        |    cast(embedding AS array<double>) AS e FROM embeddings),
        |c AS (SELECT vec_id AS cid, e AS ce FROM v
        |  WHERE vec_id BETWEEN 1 AND 8),
        |p AS (SELECT vec_id AS pid, e AS pe FROM v
        |  WHERE vec_id = 0 OR vec_id BETWEEN 9 AND 15),
        |sc AS (SELECT pid, vec_id, sim, shard FROM ann_sc),
        |x1 AS (SELECT pid, vec_id, sim FROM (
        |    SELECT pid, vec_id, sim, row_number() OVER (
        |      PARTITION BY pid, shard ORDER BY sim DESC, vec_id) AS rn
        |    FROM sc) WHERE rn <= 10),
        |exact AS (SELECT pid, vec_id FROM (
        |    SELECT pid, vec_id, row_number() OVER (
        |      PARTITION BY pid ORDER BY sim DESC, vec_id) AS rn
        |    FROM x1) WHERE rn <= 10),
        |a AS (SELECT v.vec_id,
        |    min_by(c.cid, named_struct(
        |      's', 0.0D - round(graft_cosine(v.e, c.ce), 6),
        |      'c', c.cid)) AS cid
        |  FROM v CROSS JOIN c GROUP BY v.vec_id),
        |pq AS (SELECT pid, cid FROM (
        |    SELECT p.pid, c.cid, row_number() OVER (PARTITION BY p.pid
        |      ORDER BY round(graft_cosine(p.pe, c.ce), 6) DESC, c.cid)
        |      AS rn
        |    FROM p CROSS JOIN c) WHERE rn <= 2),
        |i1 AS (SELECT sc.pid, sc.vec_id, sc.sim, sc.shard FROM sc
        |  JOIN a ON sc.vec_id = a.vec_id
        |  JOIN pq ON sc.pid = pq.pid AND a.cid = pq.cid),
        |i2 AS (SELECT pid, vec_id, sim FROM (
        |    SELECT pid, vec_id, sim, row_number() OVER (
        |      PARTITION BY pid, shard ORDER BY sim DESC, vec_id) AS rn
        |    FROM i1) WHERE rn <= 10),
        |ivf AS (SELECT pid, vec_id FROM (
        |    SELECT pid, vec_id, row_number() OVER (
        |      PARTITION BY pid ORDER BY sim DESC, vec_id) AS rn
        |    FROM i2) WHERE rn <= 10),
        |h AS (SELECT e.pid, count(*) AS n_hit
        |  FROM exact e JOIN ivf i
        |    ON e.pid = i.pid AND e.vec_id = i.vec_id
        |  GROUP BY e.pid)
        |SELECT p.pid, cast(10 AS bigint) AS k,
        |  coalesce(h.n_hit, 0) AS n_hit,
        |  round(coalesce(h.n_hit, 0) / 10.0D, 4) + 0 AS recall_at_10
        |FROM p LEFT JOIN h ON p.pid = h.pid ORDER BY p.pid""".stripMargin)
  }

  val q107_oracle: String =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e
      |  FROM embeddings),
      |c AS (SELECT vec_id AS cid, e AS ce FROM v
      |  WHERE vec_id BETWEEN 1 AND 8),
      |p AS (SELECT vec_id AS pid, e AS pe FROM v
      |  WHERE vec_id = 0 OR vec_id BETWEEN 9 AND 15),
      |sc AS (SELECT p.pid, v.vec_id,
      |    round(list_cosine_similarity(v.e, p.pe), 6) AS sim
      |  FROM v JOIN p ON v.vec_id != p.pid),
      |exact AS (SELECT pid, vec_id FROM (
      |    SELECT pid, vec_id, row_number() OVER (
      |      PARTITION BY pid ORDER BY sim DESC, vec_id) AS rn
      |    FROM sc) WHERE rn <= 10),
      |a AS (SELECT vec_id, cid FROM (
      |    SELECT v.vec_id, c.cid, row_number() OVER (
      |      PARTITION BY v.vec_id
      |      ORDER BY round(list_cosine_similarity(v.e, c.ce), 6)
      |        DESC, c.cid) AS rn
      |    FROM v CROSS JOIN c) WHERE rn = 1),
      |pq AS (SELECT pid, cid FROM (
      |    SELECT p.pid, c.cid, row_number() OVER (PARTITION BY p.pid
      |      ORDER BY round(list_cosine_similarity(p.pe, c.ce), 6)
      |        DESC, c.cid) AS rn
      |    FROM p CROSS JOIN c) WHERE rn <= 2),
      |ivf AS (SELECT pid, vec_id FROM (
      |    SELECT sc.pid, sc.vec_id, row_number() OVER (
      |      PARTITION BY sc.pid ORDER BY sc.sim DESC, sc.vec_id) AS rn
      |    FROM sc
      |    JOIN a ON sc.vec_id = a.vec_id
      |    JOIN pq ON sc.pid = pq.pid AND a.cid = pq.cid)
      |  WHERE rn <= 10),
      |h AS (SELECT e.pid, count(*)::BIGINT AS n_hit
      |  FROM exact e JOIN ivf i
      |    ON e.pid = i.pid AND e.vec_id = i.vec_id
      |  GROUP BY e.pid)
      |SELECT p.pid, 10::BIGINT AS k,
      |  coalesce(h.n_hit, 0)::BIGINT AS n_hit,
      |  round(coalesce(h.n_hit, 0) / 10.0, 4) + 0 AS recall_at_10
      |FROM p LEFT JOIN h ON p.pid = h.pid ORDER BY p.pid""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q107_ann_recall" -> q107_ann_recall _,
    "q88_kmeans_refine" -> q88_kmeans_refine _,
    "q72_ann_ivf" -> q72_ann_ivf _,
    "q44_embedding_neardup" -> q44_embedding_neardup _,
    "q28_multimodal" -> q28_multimodal _,
    "q29_bpe_tokens" -> q29_bpe_tokens _,
    "q35_ann_bucketed" -> q35_ann_bucketed _,
    "q36_rolling_fp" -> q36_rolling_fp _,
    "q37_ann_native" -> q37_ann_native _,
    "q90_audio" -> q90_audio _,
    "q91_semdedup" -> q91_semdedup _,
    "q92_vec_quant" -> q92_vec_quant _,
    "q145_random_projection" -> q145_random_projection _,
    "q146_ann_jl_prefilter" -> q146_ann_jl_prefilter _,
    "q150_label_purity" -> q150_label_purity _,
    "q156_dim_collapse" -> q156_dim_collapse _,
    "q94_video_frames" -> q94_video_frames _,
    "q97_pq_codes" -> q97_pq_codes _,
    "q98_pq_adc" -> q98_pq_adc _,
    "q99_zorder" -> q99_zorder _,
    "q100_salted_join" -> q100_salted_join _,
    "q101_hard_negatives" -> q101_hard_negatives _,
    "q102_embed_hygiene" -> q102_embed_hygiene _)

  val oracles: Map[String, String] = Map(
    "q107_ann_recall" -> q107_oracle,
    "q88_kmeans_refine" -> q88_oracle,
    "q72_ann_ivf" -> q72_oracle,
    "q44_embedding_neardup" -> q44_oracle,
    "q28_multimodal" -> q28_oracle,
    "q29_bpe_tokens" -> q29_oracle,
    "q35_ann_bucketed" -> q35_oracle,
    "q36_rolling_fp" -> q36_oracle,
    "q37_ann_native" -> q37_oracle,
    "q90_audio" -> q90_oracle,
    "q91_semdedup" -> q91_oracle,
    "q92_vec_quant" -> q92_oracle,
    "q145_random_projection" -> q145_oracle,
    "q146_ann_jl_prefilter" -> q146_oracle,
    "q150_label_purity" -> q150_oracle,
    "q156_dim_collapse" -> q156_oracle,
    "q94_video_frames" -> q94_oracle,
    "q97_pq_codes" -> q97_oracle,
    "q98_pq_adc" -> q98_oracle,
    "q99_zorder" -> q99_oracle,
    "q100_salted_join" -> q100_oracle,
    "q101_hard_negatives" -> q101_oracle,
    "q102_embed_hygiene" -> q102_oracle)
}
