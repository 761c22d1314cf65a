package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers. AQE's skew-join handling covers sort-merge joins
  * automatically; these cover the case AQE does not: a HOT-KEY AGGREGATION
  * where one key dominates and a single reducer becomes the straggler.
  *
  * Pattern: salt the key into `parts` subkeys → partial aggregate on
  * (key, salt) → final aggregate on key. Two shuffles, but the first spreads
  * the hot key over `parts` reducers; correct for any associative aggregate.
  */
object Skew {

  /** Salted distributive aggregation: `agg` must be expressible as a partial
    * (per salt) + final (re-aggregate of partials) pair — sum/count/min/max.
    * For sum: partial = sum, finalAgg = sum of partials. avg must be
    * decomposed by the caller into sum + count.
    */
  def saltedAgg(
      df: DataFrame,
      keyCols: Seq[String],
      parts: Int,
      partial: Map[String, Column => Column],
      finalAgg: Map[String, Column => Column]): DataFrame = {
    require(partial.nonEmpty && finalAgg.nonEmpty, "need at least one aggregate")
    def exprs(m: Map[String, Column => Column]): Seq[Column] =
      m.map { case (c, f) => f(col(c)).as(c) }.toSeq
    val pe = exprs(partial)
    val fe = exprs(finalAgg)
    df.withColumn("_salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(parts)))
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(pe.head, pe.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(fe.head, fe.tail: _*)
  }

  /** Salted broadcast-side replication for a skewed equi-join: the big
    * (skewed) side gets a random salt in [0, parts); the small side is
    * replicated `parts` times with every salt value, then the join runs on
    * (key, salt) — the hot key's rows land on `parts` different tasks.
    * Use when the small side is too big to broadcast outright but small
    * enough to replicate `parts`×.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      parts: Int): DataFrame = {
    val bigS = big.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(parts)).cast("int"))
    val smallS = small
      .withColumn("_salt", explode(sequence(lit(0), lit(parts - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }
}
