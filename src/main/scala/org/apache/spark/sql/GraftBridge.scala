package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access bridge into Spark's sql-private helpers for the graft
  * engine's native Catalyst expressions (the same pattern extension
  * libraries like Delta use to expose custom Expressions as Columns
  * and SQL functions).
  */
object GraftBridge {

  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")

  /** DataFrame over an InternalRow RDD with a known schema — the
    * package-private `internalCreateDataFrame` Spark's own sources
    * use, exposed for the engine's BSS-mode row scan. */
  def internalDf(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[
        org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** DataFrame over an anonymous DSv2 [[org.apache.spark.sql
    * .connector.catalog.Table]] — unlike [[internalDf]]'s LogicalRDD,
    * a DSv2 relation participates in Catalyst column pruning
    * (SupportsPushDownRequiredColumns), so an aggregate over one
    * column of a BSS-mode scan decodes one column, not the whole
    * schema. */
  def internalDsv2(spark: SparkSession,
      table: org.apache.spark.sql.connector.catalog.Table): DataFrame = {
    val rel = execution.datasources.v2.DataSourceV2Relation.create(
      table, None, None,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], rel)
  }

  /** Free the blocks of an eagerly localCheckpoint()'d Dataset NOW
    * instead of waiting for a driver GC + ContextCleaner cycle. */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false); ()
      case _ => ()
    }
}
