package graft

/** DuckDB oracle SQL for every entry in [[Queries.all]]. Statements
  * mirror the Spark implementations exactly: same aliases, same
  * rounding, same deterministic ORDER BY.
  */
object Oracles {

  val all: Map[String, String] = Map(
    "q170_integrity_audit" -> Queries.q170_oracle,
    "q01_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        | round(avg(l_quantity),4) AS avg_qty,
        | count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_range" ->
      """SELECT event_id, ts, user_id, event_type, value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
        |ORDER BY event_id""".stripMargin,

    "q03_select" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_discount > 0.07 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q04_sort_limit" ->
      """SELECT event_id, user_id, event_type, value FROM events
        |ORDER BY value DESC, event_id LIMIT 50""".stripMargin,

    "q05_tail" ->
      """SELECT event_id, ts, value FROM
        | (SELECT * FROM events ORDER BY ts DESC, event_id DESC LIMIT 100)
        |ORDER BY ts, event_id""".stripMargin,

    "q06_limit_offset" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber LIMIT 500 OFFSET 1000""".stripMargin,

    "q07_mask_sexpr" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey % 7 = 0 AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q08_floor_day" ->
      """SELECT date_trunc('day', ts)::TIMESTAMP AS day, event_type,
        | count(event_id) AS cnt, round(sum(value),2) + 0 AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q09_kv_upsert" ->
      """WITH n AS (
        |  SELECT user_id, event_type, sum(value) AS v, 0 AS src FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
        |  GROUP BY 1, 2),
        |o AS (
        |  SELECT user_id, event_type, sum(value) AS v, 1 AS src FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  GROUP BY 1, 2),
        |u AS (SELECT * FROM n UNION ALL SELECT * FROM o)
        |SELECT user_id, event_type, round(min_by(v, src),2) + 0 AS value,
        | min(src) AS src
        |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q10_update" ->
      """WITH o AS (
        |  SELECT user_id, sum(value) AS v FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
        |  GROUP BY 1),
        |n AS (
        |  SELECT user_id, sum(value) AS vn FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
        |  GROUP BY 1)
        |SELECT coalesce(o.user_id, n.user_id) AS user_id,
        | round(coalesce(vn, v),2) + 0 AS value,
        | (vn IS NOT NULL) AS updated
        |FROM o FULL OUTER JOIN n ON o.user_id = n.user_id
        |ORDER BY user_id""".stripMargin,

    "q11_delete_range" ->
      """SELECT event_id, ts FROM events
        |WHERE NOT (ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20')
        |ORDER BY event_id""".stripMargin,

    "q12_concat" ->
      """SELECT event_id, ts, event_type FROM (
        |  SELECT event_id, ts, event_type FROM events
        |  WHERE ts < TIMESTAMP '2024-01-05'
        |  UNION ALL
        |  SELECT event_id, ts, event_type FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-25')
        |ORDER BY event_id""".stripMargin,

    "q13_quantiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.25),6) AS q25,
        | round(quantile_cont(l_quantity, 0.5),6) AS q50,
        | round(quantile_cont(l_quantity, 0.75),6) AS q75,
        | round(quantile_cont(l_extendedprice, 0.9),6) AS p90_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q14_window" ->
      """SELECT user_id, rn, event_id, prev_value FROM (
        |  SELECT user_id, event_id,
        |   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |   lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |     AS prev_value
        |  FROM events)
        |WHERE rn <= 5 ORDER BY user_id, rn""".stripMargin,

    "q15_join_revenue" ->
      """SELECT n_name, count(*) AS n_orders,
        | round(sum(o_totalprice),2) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q16_topk_suppliers" ->
      """SELECT l_suppkey, sum(l_quantity) AS total_qty FROM lineitem
        |GROUP BY 1 ORDER BY total_qty DESC, l_suppkey LIMIT 10""".stripMargin,

    "q17_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
        | md5(text) AS fp
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    "q18_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        | round(avg(n_chars),4) AS avg_chars,
        | round(avg(length(text)),4) AS avg_len,
        | round(avg(len(string_split(text, ' '))),4) AS avg_tokens
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q19_token_count" ->
      """SELECT source, sum(len(string_split(text, ' ')))::BIGINT AS total_tokens,
        | count(*) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q20_quality" ->
      """SELECT doc_id,
        | len(string_split(text, ' ')) AS n_tokens,
        | round(len(list_distinct(string_split(text, ' ')))::DOUBLE
        |   / len(string_split(text, ' ')), 4) AS uniq_ratio,
        | round(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))::DOUBLE
        |   / nullif(length(text), 0), 4) AS punct_ratio,
        | round(len(list_filter(string_split(text, ' '),
        |     x -> list_contains(['the','and','of','to','in','a','is','for'],
        |       lower(x))))::DOUBLE
        |   / len(string_split(text, ' ')), 4) AS stop_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q21_lang_id" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |   len(list_filter(string_split(lower(text),' '),
        |     x -> list_contains(['the','and','of','to','in','is'], x))) AS sc_en,
        |   len(list_filter(string_split(lower(text),' '),
        |     x -> list_contains(['der','die','und','das','ist','nicht'], x))) AS sc_de,
        |   len(list_filter(string_split(lower(text),' '),
        |     x -> list_contains(['le','la','les','et','des','est'], x))) AS sc_fr,
        |   len(list_filter(string_split(lower(text),' '),
        |     x -> list_contains(['el','los','las','que','es','y'], x))) AS sc_es,
        |   len(list_filter(string_split(lower(text),' '),
        |     x -> list_contains(['的','是','了','在','和','有'], x))) AS sc_zh
        |  FROM documents)
        |SELECT doc_id, lang,
        | CASE WHEN sc_en = greatest(sc_en, sc_de, sc_fr, sc_es, sc_zh) THEN 'en'
        |      WHEN sc_de = greatest(sc_en, sc_de, sc_fr, sc_es, sc_zh) THEN 'de'
        |      WHEN sc_fr = greatest(sc_en, sc_de, sc_fr, sc_es, sc_zh) THEN 'fr'
        |      WHEN sc_es = greatest(sc_en, sc_de, sc_fr, sc_es, sc_zh) THEN 'es'
        |      WHEN sc_zh = greatest(sc_en, sc_de, sc_fr, sc_es, sc_zh) THEN 'zh'
        |      ELSE '??' END AS guess,
        | greatest(sc_en, sc_de, sc_fr, sc_es, sc_zh) AS hits
        |FROM scored ORDER BY doc_id""".stripMargin,

    "q45_grouped_firstlast" ->
      """SELECT user_id,
        | first(value ORDER BY ts, event_id) AS first_value,
        | last(value ORDER BY ts, event_id) AS last_value,
        | count(event_id) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
}
