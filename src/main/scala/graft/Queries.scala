package graft

import graft.engine.Ops
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The operator-inventory query suite (SURVEY.md §2): each entry has a
  * DataFrame implementation and (in [[Oracles]]) an equivalent DuckDB
  * SQL statement over the same parquet tables. Column names and row
  * order are aligned on both sides; double aggregates are rounded to
  * absorb summation-order differences.
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- relational core -------------------------------------------------

  /** group-by aggregate sweep (sum/avg/count) — Frame.reduce analogue */
  def q01_agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2)
          .as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("cnt"))
      .orderBy($"l_returnflag", $"l_linestatus")

  /** index-range slice, left-closed [start, stop) — Series.frame
    * closed-bound semantics on a time index */
  def q02_range(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter($"ts" >= lit("2024-01-10").cast("timestamp") &&
        $"ts" < lit("2024-01-20").cast("timestamp"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .orderBy($"event_id")

  /** projection + predicate pushdown (column pruning to parquet) */
  def q03_select(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter($"l_discount" > 0.07)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .orderBy($"l_orderkey", $"l_linenumber")

  /** multi-key sort + top-k (TakeOrdered physical op) */
  def q04_sort_limit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .orderBy($"value".desc, $"event_id")
      .select($"event_id", $"user_id", $"event_type", $"value")
      .limit(50)

  /** tail: last 100 rows in index order — Series.tail analogue */
  def q05_tail(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .orderBy($"ts".desc, $"event_id".desc).limit(100)
      .orderBy($"ts", $"event_id")
      .select($"event_id", $"ts", $"value")

  /** pagination: limit + offset — Series.paginate analogue */
  def q06_limit_offset(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .orderBy($"l_orderkey", $"l_linenumber")
      .offset(1000).limit(500)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")

  /** s-expression mask filter compiled to Column — Frame.mask */
  def q07_mask_sexpr(s: SparkSession, dir: String): DataFrame =
    Ops.mask(t(s, dir, "lineitem"),
        "(and (= (% self.l_orderkey 7) 0) (> self.l_quantity 45))")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      .orderBy($"l_orderkey", $"l_linenumber")

  /** s-expression group-by with calendar bucketing — Frame.reduce with
    * (floor ts 'D') computed group key */
  def q08_floor_day(s: SparkSession, dir: String): DataFrame =
    Ops.reduce(t(s, dir, "events"), Seq(
        "day" -> "(floor self.ts 'D')",
        "event_type" -> "self.event_type",
        "cnt" -> "(count self.event_id)",
        "total" -> "(sum self.value)"))
      .withColumn("total", round($"total", 2) + lit(0.0))
      .orderBy($"day", $"event_type")

  /** KV upsert merge: first-wins per key with new rows first —
    * KVSeries.write semantics expressed relationally */
  def q09_kv_upsert(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    def weekAgg(lo: String, hi: String, src: Int) = ev
      .filter($"ts" >= lit(lo).cast("timestamp") &&
        $"ts" < lit(hi).cast("timestamp"))
      .groupBy($"user_id", $"event_type")
      .agg(sum($"value").as("v"))
      .withColumn("src", lit(src))
    val merged = weekAgg("2024-01-08", "2024-01-15", 0)
      .unionByName(weekAgg("2024-01-01", "2024-01-08", 1))
      .groupBy($"user_id", $"event_type")
      .agg(expr("min_by(v, src)").as("v0"), min($"src").as("src"))
    merged.select($"user_id", $"event_type",
        (round($"v0", 2) + lit(0.0)).as("value"), $"src")
      .orderBy($"user_id", $"event_type")
  }

  /** aligned update: overlay new values over stored, keep old where no
    * update — Series.update join+coalesce semantics */
  def q10_update(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    def userSum(lo: String, hi: String) = ev
      .filter($"ts" >= lit(lo).cast("timestamp") &&
        $"ts" < lit(hi).cast("timestamp"))
      .groupBy($"user_id").agg(sum($"value").as("v"))
    val o = userSum("2024-01-01", "2024-01-08")
    val n = userSum("2024-01-08", "2024-01-15")
      .withColumnRenamed("v", "vn")
    o.join(n, Seq("user_id"), "full_outer")
      .select($"user_id", (round(coalesce($"vn", $"v"), 2) + lit(0.0)).as("value"),
        $"vn".isNotNull.as("updated"))
      .orderBy($"user_id")
  }

  /** range delete: overlay tombstone hides [start, stop) */
  def q11_delete_range(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(!($"ts" >= lit("2024-01-10").cast("timestamp") &&
        $"ts" < lit("2024-01-20").cast("timestamp")))
      .select($"event_id", $"ts")
      .orderBy($"event_id")

  /** concat (union-all of frames with identical schema) */
  def q12_concat(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    ev.filter($"ts" < lit("2024-01-05").cast("timestamp"))
      .unionByName(ev.filter($"ts" >= lit("2024-01-25").cast("timestamp")))
      .select($"event_id", $"ts", $"event_type")
      .orderBy($"event_id")
  }

  /** exact grouped quantiles (reference supports plain quantile only —
    * grouped is a superset) */
  def q13_quantiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        round(percentile($"l_quantity", lit(0.25)), 6).as("q25"),
        round(percentile($"l_quantity", lit(0.5)), 6).as("q50"),
        round(percentile($"l_quantity", lit(0.75)), 6).as("q75"),
        round(percentile($"l_extendedprice", lit(0.9)), 6).as("p90_price"))
      .orderBy($"l_returnflag")

  /** window functions: row_number + lag per partition (superset of
    * reference; needed for sessionization) */
  def q14_window(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_value", lag($"value", 1).over(w))
      .filter($"rn" <= 5)
      .select($"user_id", $"rn", $"event_id", $"prev_value")
      .orderBy($"user_id", $"rn")
  }

  /** multi-way broadcast join + aggregate (orders ⋈ customer ⋈ nation) */
  def q15_join_revenue(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val customer = t(s, dir, "customer")
    val nation = t(s, dir, "nation")
    orders
      .join(broadcast(customer), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_orders"),
        round(sum($"o_totalprice"), 2).as("revenue"))
      .orderBy($"n_name")
  }

  /** top-k aggregate: exact integral sums, no rounding needed */
  def q16_topk_suppliers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy($"l_suppkey")
      .agg(sum($"l_quantity").as("total_qty"))
      .orderBy($"total_qty".desc, $"l_suppkey")
      .limit(10)

  // ---- text / training-data ops ---------------------------------------

  /** exact deduplication by full-text hash. Grouping on md5(text), not
    * text, so the shuffle carries 32-byte digests instead of full
    * document bodies — at 100 TB the dedup shuffle IS the pipeline. */
  def q17_dedup_exact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(md5($"text").as("fp"))
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select($"keep_id", $"n_copies", $"fp")
      .orderBy($"keep_id")

  /** per-language corpus statistics (char/token counts) */
  def q18_text_stats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg($"n_chars"), 4).as("avg_chars"),
        round(avg(length($"text")), 4).as("avg_len"),
        round(avg(size(split($"text", " ", -1))), 4).as("avg_tokens"))
      .orderBy($"lang")

  /** token counting per source (whitespace tokenizer) */
  def q19_token_count(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy($"source")
      .agg(sum(size(split($"text", " ", -1))).as("total_tokens"),
        count(lit(1)).as("n_docs"))
      .orderBy($"source")

  /** quality scoring: length / punctuation / stopword / uniqueness
    * ratios per document */
  def q20_quality(s: SparkSession, dir: String): DataFrame = {
    val stop = Seq("the", "and", "of", "to", "in", "a", "is", "for")
    val docs = t(s, dir, "documents")
      .withColumn("toks", split($"text", " ", -1))
    docs.select(
        $"doc_id",
        size($"toks").as("n_tokens"),
        round(size(array_distinct($"toks")).cast("double") /
          size($"toks"), 4).as("uniq_ratio"),
        // nullif guard: an EMPTY doc must yield NULL, not abort the
        // whole corpus job under ANSI division-by-zero (one poisoned
        // row at 100 TB would kill the pipeline); the token-count
        // denominators are safe (split('') is [''], size 1)
        round(length(regexp_replace($"text", "[^.!?,;:]", ""))
          .cast("double") / nullif(length($"text"), lit(0)), 4)
          .as("punct_ratio"),
        round(size(filter($"toks", x =>
          array_contains(typedLit(stop), lower(x)))).cast("double") /
          size($"toks"), 4).as("stop_ratio"))
      .orderBy($"doc_id")
  }

  /** language identification: stopword-lexicon vote vs labeled lang */
  def q21_lang_id(s: SparkSession, dir: String): DataFrame = {
    val lex: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "to", "in", "is"),
      "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
      "fr" -> Seq("le", "la", "les", "et", "des", "est"),
      "es" -> Seq("el", "los", "las", "que", "es", "y"),
      "zh" -> Seq("的", "是", "了", "在", "和", "有"))
    val docs = t(s, dir, "documents")
      .withColumn("toks", split(lower($"text"), " ", -1))
    val scored = lex.foldLeft(docs) { case (df, (lang, words)) =>
      df.withColumn(s"sc_$lang",
        size(filter($"toks", x => array_contains(typedLit(words), x))))
    }
    val langs = lex.map(_._1)
    val g = greatest(langs.map(l => col(s"sc_$l")): _*)
    // first lang (in fixed order) reaching the max — same CASE chain
    // as the oracle
    val guess = langs.foldRight(lit("??")) { case (l, alt) =>
      when(col(s"sc_$l") === g, lit(l)).otherwise(alt)
    }
    scored.select($"doc_id", $"lang", guess.as("guess"), g.as("hits"))
      .orderBy($"doc_id")
  }

  /** grouped order-sensitive first/last via the s-expr reduce path:
    * compiles to min_by/max_by over the (ts, event_id) index struct —
    * deterministic under any shuffle (SURVEY §7.4-5) */
  def q45_grouped_firstlast(s: SparkSession, dir: String): DataFrame =
    Ops.reduce(t(s, dir, "events"), Seq(
        "user_id" -> "self.user_id",
        "first_value" -> "(first self.value)",
        "last_value" -> "(last self.value)",
        "n" -> "(count self.event_id)"),
      orderKeys = Seq("ts", "event_id"))
      .orderBy($"user_id")

  /** Referential-integrity and reconciliation audit — the relational
    * data-ops report run before trusting a warehouse drop: FK orphan
    * counts in both directions (lineitems without orders, orders
    * without lineitems, orders with dangling customers) and a
    * CENTS-EXACT totalprice reconciliation (each line's
    * price·(1-disc)·(1+tax) is rounded to integer cents BEFORE the
    * per-order sum, so float summation order cannot create phantom
    * mismatches; an order mismatches when its reconstructed total
    * differs from o_totalprice by more than one cent). Every check
    * is an aggregate or anti-join on its natural key — the shapes
    * AQE broadcasts when a side is small and shuffles past that. */
  def q170_integrity_audit(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """WITH lc AS (SELECT l_orderkey,
        |    sum(cast(round(l_extendedprice * (1.0D - l_discount)
        |      * (1.0D + l_tax) * 100.0D, 0) AS bigint)) AS calc_cents
        |  FROM lineitem GROUP BY l_orderkey),
        |oc AS (SELECT o_orderkey, o_custkey,
        |    cast(round(o_totalprice * 100.0D, 0) AS bigint) AS tp_cents
        |  FROM orders)
        |SELECT 'childless_orders' AS metric, count(*) AS n
        |FROM oc LEFT ANTI JOIN lc ON oc.o_orderkey = lc.l_orderkey
        |UNION ALL
        |SELECT 'customer_dangling', count(*)
        |FROM oc LEFT ANTI JOIN customer ON oc.o_custkey = c_custkey
        |UNION ALL
        |SELECT 'lineitem_orphans', count(*)
        |FROM lineitem LEFT ANTI JOIN oc ON l_orderkey = oc.o_orderkey
        |UNION ALL
        |SELECT 'orders_total', count(*) FROM oc
        |UNION ALL
        |SELECT 'totalprice_mismatch', count(*)
        |FROM oc JOIN lc ON oc.o_orderkey = lc.l_orderkey
        |WHERE abs(lc.calc_cents - oc.tp_cents) > 1
        |ORDER BY metric""".stripMargin)
  }

  val q170_oracle: String =
    """WITH lc AS (SELECT l_orderkey,
      |    sum(round(l_extendedprice * (1.0 - l_discount)
      |      * (1.0 + l_tax) * 100.0)::BIGINT) AS calc_cents
      |  FROM lineitem GROUP BY l_orderkey),
      |oc AS (SELECT o_orderkey, o_custkey,
      |    round(o_totalprice * 100.0)::BIGINT AS tp_cents
      |  FROM orders)
      |SELECT 'childless_orders' AS metric, count(*)::BIGINT AS n
      |FROM oc ANTI JOIN lc ON oc.o_orderkey = lc.l_orderkey
      |UNION ALL
      |SELECT 'customer_dangling', count(*)::BIGINT
      |FROM oc ANTI JOIN customer ON oc.o_custkey = c_custkey
      |UNION ALL
      |SELECT 'lineitem_orphans', count(*)::BIGINT
      |FROM lineitem ANTI JOIN oc ON l_orderkey = oc.o_orderkey
      |UNION ALL
      |SELECT 'orders_total', count(*)::BIGINT FROM oc
      |UNION ALL
      |SELECT 'totalprice_mismatch', count(*)::BIGINT
      |FROM oc JOIN lc ON oc.o_orderkey = lc.l_orderkey
      |WHERE abs(lc.calc_cents - oc.tp_cents) > 1
      |ORDER BY metric""".stripMargin

  // ---- registry --------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q170_integrity_audit" -> q170_integrity_audit _,
    "q01_agg" -> q01_agg _,
    "q02_range" -> q02_range _,
    "q03_select" -> q03_select _,
    "q04_sort_limit" -> q04_sort_limit _,
    "q05_tail" -> q05_tail _,
    "q06_limit_offset" -> q06_limit_offset _,
    "q07_mask_sexpr" -> q07_mask_sexpr _,
    "q08_floor_day" -> q08_floor_day _,
    "q09_kv_upsert" -> q09_kv_upsert _,
    "q10_update" -> q10_update _,
    "q11_delete_range" -> q11_delete_range _,
    "q12_concat" -> q12_concat _,
    "q13_quantiles" -> q13_quantiles _,
    "q14_window" -> q14_window _,
    "q15_join_revenue" -> q15_join_revenue _,
    "q16_topk_suppliers" -> q16_topk_suppliers _,
    "q17_dedup_exact" -> q17_dedup_exact _,
    "q18_text_stats" -> q18_text_stats _,
    "q19_token_count" -> q19_token_count _,
    "q20_quality" -> q20_quality _,
    "q21_lang_id" -> q21_lang_id _,
    "q45_grouped_firstlast" -> q45_grouped_firstlast _)

  // convenience for $"col" syntax without a SparkSession in scope
  private implicit class Dollar(val sc: StringContext) {
    def $(args: Any*): org.apache.spark.sql.Column =
      col(sc.s(args: _*))
  }
}
