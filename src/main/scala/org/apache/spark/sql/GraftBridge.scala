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
}
