package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q15_join_revenue(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ QueriesSim.all ++ QueriesSeries.all ++
      QueriesExt.all ++ QueriesWindow.all ++ QueriesPipe.all ++
      QueriesStream.all ++ QueriesRag.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Oracles.all ++ QueriesSim.oracles ++ QueriesSeries.oracles ++
      QueriesExt.oracles ++ QueriesWindow.oracles ++ QueriesPipe.oracles ++
      QueriesStream.oracles ++ QueriesRag.oracles
}
