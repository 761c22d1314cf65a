package graft.plans

import graft.functions.FloatDot
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions, SparkSessionExtensionsProvider}
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Engine extension point: registers graft's native Catalyst expressions.
  *
  * Two activation paths:
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  *    (the standard SparkSessionExtensions mechanism), or
  *  - `GraftExtensions.register(spark)` on a live session (used by the
  *    declared queries, since the driver owns session construction).
  */
class GraftExtensions extends SparkSessionExtensionsProvider {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      FloatDot.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FloatDot(children(0), children(1))))
}

object GraftExtensions {
  /** Idempotent runtime registration on an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("float_dot"),
      FloatDot.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        FloatDot(children(0), children(1)))
}
