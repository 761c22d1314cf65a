package graft.core

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed counterpart of [[Quality.profile]] (SURVEY §4.2's optional
  * `Aggregator` polish): the whole DQ profile as ONE `Aggregator` buffer over
  * a `Dataset[Tx]`, merged associatively — map-side partials for free, a
  * single job, no Row reflection in the hot loop.
  *
  * Trade-off vs the untyped path: the case class pins the schema at compile
  * time, so this is the static-schema fast path; [[Quality.profile]] remains
  * the dynamic-schema path with the reference's missing-column tolerance
  * (/root/reference/flows/pipeline.py:66-89). Both produce identical
  * numbers on a full-schema frame (TypedQualitySpec proves it).
  */
object TypedQuality {

  /** The reference's implicit transaction schema (pipeline.py:66). */
  final case class Tx(
      timestamp: Option[java.sql.Timestamp],
      transaction_type: Option[String],
      amount: Option[Double],
      receiving_address: Option[String],
      location_region: Option[String],
      risk_score: Option[Double])

  final case class DqBuf(
      total: Long = 0L,
      nullTimestamp: Long = 0L,
      nullType: Long = 0L,
      nullAmount: Long = 0L,
      nullAddress: Long = 0L,
      nullRegion: Long = 0L,
      nullRisk: Long = 0L,
      negAmount: Long = 0L)

  object DqAgg extends Aggregator[Tx, DqBuf, DqBuf] {
    override def zero: DqBuf = DqBuf()
    override def reduce(b: DqBuf, t: Tx): DqBuf = DqBuf(
      b.total + 1,
      b.nullTimestamp + (if (t.timestamp.isEmpty) 1 else 0),
      b.nullType + (if (t.transaction_type.isEmpty) 1 else 0),
      b.nullAmount + (if (t.amount.isEmpty) 1 else 0),
      b.nullAddress + (if (t.receiving_address.isEmpty) 1 else 0),
      b.nullRegion + (if (t.location_region.isEmpty) 1 else 0),
      b.nullRisk + (if (t.risk_score.isEmpty) 1 else 0),
      b.negAmount + (if (t.amount.exists(_ < 0)) 1 else 0))
    override def merge(a: DqBuf, b: DqBuf): DqBuf = DqBuf(
      a.total + b.total,
      a.nullTimestamp + b.nullTimestamp,
      a.nullType + b.nullType,
      a.nullAmount + b.nullAmount,
      a.nullAddress + b.nullAddress,
      a.nullRegion + b.nullRegion,
      a.nullRisk + b.nullRisk,
      a.negAmount + b.negAmount)
    override def finish(r: DqBuf): DqBuf = r
    override def bufferEncoder: Encoder[DqBuf] = Encoders.product[DqBuf]
    override def outputEncoder: Encoder[DqBuf] = Encoders.product[DqBuf]
  }

  /** One-pass typed profile; conformity math identical to Quality.profile
    * (per-rule double-counting, the +1e-9 epsilon, pipeline.py:88-89).
    */
  def profile(ds: Dataset[Tx], phase: String): Quality.DqMetrics = {
    val b = ds.select(DqAgg.toColumn).head()
    val nulls = Map(
      "timestamp" -> b.nullTimestamp, "transaction_type" -> b.nullType,
      "amount" -> b.nullAmount, "receiving_address" -> b.nullAddress,
      "location_region" -> b.nullRegion, "risk_score" -> b.nullRisk)
    val rules = Map(
      "timestamp_not_null"        -> b.nullTimestamp,
      "transaction_type_not_null" -> b.nullType,
      "amount_not_null"           -> b.nullAmount,
      "amount_non_negative"       -> b.negAmount)
    val fails = rules.values.sum
    val conformity = math.max(0.0, 1.0 - fails / (b.total + 1e-9))
    Quality.DqMetrics(phase, b.total, nulls, rules, fails, conformity)
  }
}
