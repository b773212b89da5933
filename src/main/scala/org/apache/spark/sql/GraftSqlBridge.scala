package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Tiny shim over Spark's `private[sql]` Column↔Expression bridge
  * (`org.apache.spark.sql.classic.ExpressionUtils`), the supported way for
  * extension libraries to expose custom Catalyst expressions as Columns on
  * Spark 4.x.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a NATIVE Catalyst expression under a SQL-callable name (the
    * codegen path — unlike `spark.udf.register`, calls from SQL stay
    * inside whole-stage codegen).
    */
  def registerExpression(spark: SparkSession, name: String,
                         builder: Seq[Expression] => Expression): Unit = {
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
      (exprs: Seq[Expression]) => builder(exprs))
  }
}
