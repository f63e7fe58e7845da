package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-pipeline dataset-management operators: deterministic
  * stratified sampling, train/val/test splitting, and per-source
  * quality top-k selection.
  *
  * All three use content-addressed (md5-prefix) hashing so the result
  * is a pure function of the data — reproducible across runs, engines
  * and cluster sizes, and embarrassingly parallel: the hash gate is a
  * narrow projection evaluated at the scan (no shuffle at all for the
  * sample), the split summary is one partial-aggregated groupBy, and
  * the top-k is a single window over a `source`-hash shuffle. At 100 TB
  * none of these plans change shape.
  */
object QueriesPipe {

  /** Spark-side deterministic [0,100) hash of an int64 id. */
  private def hash100(col: String): String =
    s"cast(conv(substr(md5(cast($col as string)),1,8),16,10) as bigint) % 100"

  /** DuckDB-side identical hash. */
  private def duckHash100(col: String): String =
    s"('0x'||substr(md5($col::VARCHAR),1,8))::BIGINT % 100"

  /** Stratified sampling: per-language sampling rates (boost the rare
    * strata, downsample the dominant one) applied via a deterministic
    * hash gate — a narrow filter, no shuffle, no RNG state. The
    * returned rows ARE the sample, so the oracle checks membership
    * exactly.
    */
  def q49_stratified_sample(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      s"""SELECT doc_id, lang, source, n_chars
         |FROM documents
         |WHERE ${hash100("doc_id")} <
         |  CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 30 ELSE 50 END
         |ORDER BY doc_id""".stripMargin)
  }

  val q49_oracle: String =
    s"""SELECT doc_id, lang, source, n_chars
       |FROM documents
       |WHERE ${duckHash100("doc_id")} <
       |  CASE lang WHEN 'en' THEN 10 WHEN 'de' THEN 30 ELSE 50 END
       |ORDER BY doc_id""".stripMargin

  /** Deterministic train/val/test split (80/10/10 by id-hash bucket),
    * summarized per (split, lang) so the oracle verifies every
    * assignment in aggregate. The assignment itself is a scan-time
    * projection; the summary is one map-side-combined groupBy.
    */
  def q50_train_split(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      s"""WITH a AS (
         |  SELECT lang, n_chars,
         |    CASE WHEN ${hash100("doc_id")} < 80 THEN 'train'
         |         WHEN ${hash100("doc_id")} < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents)
         |SELECT split, lang, count(*) AS n_docs,
         |  sum(n_chars) AS total_chars
         |FROM a GROUP BY split, lang
         |ORDER BY split, lang""".stripMargin)
  }

  val q50_oracle: String =
    s"""WITH a AS (
       |  SELECT lang, n_chars,
       |    CASE WHEN ${duckHash100("doc_id")} < 80 THEN 'train'
       |         WHEN ${duckHash100("doc_id")} < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents)
       |SELECT split, lang, count(*)::BIGINT AS n_docs,
       |  sum(n_chars)::BIGINT AS total_chars
       |FROM a GROUP BY split, lang
       |ORDER BY split, lang""".stripMargin

  /** Per-source quality top-k: score = alpha-density × length (same
    * vectorized string math as the q20 quality family), rank within
    * each source, keep the 5 best. One hash-partition shuffle on
    * `source` then a bounded per-group sort — the canonical skew-safe
    * "best documents per domain" selection.
    */
  def q51_quality_topk(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """WITH q AS (
        |  SELECT /*+ REPARTITION(32) */ doc_id, source,
        |    n_chars - 2 * (length(text) -
        |      length(regexp_replace(text, '[^a-zA-Z0-9 ]', ''))) AS score
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source, score,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY score DESC, doc_id) AS rk
        |  FROM q)
        |SELECT source, cast(rk AS bigint) AS rk, doc_id, score
        |FROM r WHERE rk <= 5
        |ORDER BY source, rk""".stripMargin)
  }

  val q51_oracle: String =
    """WITH q AS (
      |  SELECT doc_id, source,
      |    (n_chars - 2 * (length(text) -
      |      length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'))))::BIGINT
      |      AS score
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, source, score,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY score DESC, doc_id) AS rk
      |  FROM q)
      |SELECT source, rk::BIGINT AS rk, doc_id, score
      |FROM r WHERE rk <= 5
      |ORDER BY source, rk""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q49_stratified_sample" -> q49_stratified_sample _,
    "q50_train_split" -> q50_train_split _,
    "q51_quality_topk" -> q51_quality_topk _)

  val oracles: Map[String, String] = Map(
    "q49_stratified_sample" -> q49_oracle,
    "q50_train_split" -> q50_oracle,
    "q51_quality_topk" -> q51_oracle)
}
