package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark 4's `private[sql]` Column ⇄ Expression converters, for
  * registering custom Catalyst expressions (SURVEY §4) as user-facing
  * Columns. This is the one place the library reaches into Spark's
  * package-private surface; everything else uses public APIs.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function builder on an EXISTING session's registry (the
    * runtime-registration path; for new sessions prefer
    * `spark.sql.extensions=graft.extensions.GraftExtensions`). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft", name),
      builder)
  }
}
