package graft.plans

import graft.functions.{FloatDot, MinhashAll}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions, SparkSessionExtensionsProvider}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

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
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private val functions: Seq[(FunctionIdentifier, ExpressionInfoLike, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("float_dot"), FloatDot.info,
      (children: Seq[Expression]) => FloatDot(children(0), children(1))),
    (FunctionIdentifier("minhash_all"), MinhashAll.info,
      (children: Seq[Expression]) => MinhashAll(children(0), children(1))))

  private type ExpressionInfoLike = org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  /** Idempotent runtime registration on an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
