package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** The one `private[sql]` crossing graft needs: turn a hand-built
  * [[LogicalPlan]] into a [[DataFrame]] (`Dataset.ofRows`) so custom
  * logical operators (graft.plans.TopKPerKey) can enter the public Dataset
  * world, and unwrap a Column to its Catalyst [[Expression]]. Lives under
  * `org.apache.spark.sql` solely for the access scope — the standard
  * library-extension pattern; everything referenced is Apache Spark's own
  * API surface, just package-private to `sql`.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Column → CATALYST expression through the session's converter
    * (`classic.SparkSession.expression`): `col("v").desc` becomes a real
    * `catalyst.expressions.SortOrder`, not the lazy sql-api
    * `ColumnNodeExpression` wrapper (which is neither matchable as
    * SortOrder nor serializable into task closures).
    */
  def expr(spark: SparkSession, c: org.apache.spark.sql.Column): Expression =
    spark.asInstanceOf[ClassicSparkSession].expression(c)
}
