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

  /** Free the blocks of an eagerly localCheckpoint()'d Dataset NOW
    * instead of waiting for a driver GC + ContextCleaner cycle. */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false); ()
      case _ => ()
    }
}
