package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression conversions.
  *
  * Spark 4 hides the classic `Column(expr)` constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`; placing this one-file
  * shim inside the `org.apache.spark.sql` package is the standard pattern
  * used by Spark-native extension libraries to expose custom Catalyst
  * expressions as first-class `Column`s (so they compose with the public
  * DataFrame API and stay inside whole-stage codegen).
  */
object GraftSqlBridge {

  /** Wrap a raw Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the Catalyst expression behind a Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register an expression builder in the session's function registry so
    * the function is callable from `spark.sql` (the imperative analogue of
    * `SparkSessionExtensions.injectFunction`, usable on an already-built
    * session).
    */
  def registerFunction(spark: SparkSession, name: String, info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}
