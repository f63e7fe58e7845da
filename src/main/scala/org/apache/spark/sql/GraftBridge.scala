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

  /** Free the blocks of an eagerly localCheckpoint()'d Dataset NOW
    * instead of waiting for a driver GC + ContextCleaner cycle. */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false); ()
      case _ => ()
    }
}
