package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact second-moment accumulation as a typed `Aggregator` — the
  * user-facing UDAF face (`spark.udf.register(functions.udaf(...))`, SQL-
  * callable, struct-returning), complementing the engine-internal
  * `TypedImperativeAggregate` natives (SpaceSavingTopK) and the declarative
  * SQL UDFs (x187): this is the path an application team without a custom
  * Spark build actually has for a distributed aggregate.
  *
  * Float discipline (the x148 argument, in Aggregator form): `avg`/
  * `var_pop` built-ins accumulate IEEE doubles, so their result depends on
  * partition merge order. Here values are rounded once to integer CENTS,
  * and the buffer carries (n, Σc, Σc²) with Σc² in MANUAL 128-bit (hi/lo
  * with carry) — cents² up to ~10¹² per row overflows a signed 64-bit sum
  * within ~10⁷ rows, and doubles lose integer exactness past 2⁵³, so
  * neither primitive type survives a corpus-scale group. Every partial is
  * exact, `merge` is exact 128-bit addition (associative + commutative ⇒
  * order-free), and `finish` does the one float step: numerator
  * n·Σc² − (Σc)² formed in BigInt (exact), ONE correctly-rounded cast to
  * double, the same divide/round6 sequence the DuckDB oracle runs on its
  * HUGEINT moments.
  *
  * Scale shape: the buffer is 4 longs regardless of group size; Catalyst
  * plans udaf Aggregators with map-side partials like any hash aggregate.
  */
case class MomentBuf(n: Long, sum: Long, sumsqHi: Long, sumsqLo: Long)
case class MomentOut(n: Long, mean: Double, varPop: Double)

object TypedMoments extends Aggregator[Double, MomentBuf, MomentOut] {

  override def zero: MomentBuf = MomentBuf(0L, 0L, 0L, 0L)

  private def add128(hi: Long, lo: Long, x: Long): (Long, Long) = {
    val nlo = lo + x
    // x >= 0: unsigned overflow iff the new low word wrapped below the old
    val carry = if (java.lang.Long.compareUnsigned(nlo, lo) < 0) 1L else 0L
    (hi + carry, nlo)
  }

  override def reduce(b: MomentBuf, v: Double): MomentBuf = {
    val c = math.floor(v * 100 + 0.5).toLong // one rounding at ingest: cents
    val (hi, lo) = add128(b.sumsqHi, b.sumsqLo, c * c)
    MomentBuf(b.n + 1, b.sum + c, hi, lo)
  }

  override def merge(a: MomentBuf, b: MomentBuf): MomentBuf = {
    val nlo = a.sumsqLo + b.sumsqLo
    val carry = if (java.lang.Long.compareUnsigned(nlo, a.sumsqLo) < 0) 1L else 0L
    MomentBuf(a.n + b.n, a.sum + b.sum, a.sumsqHi + b.sumsqHi + carry, nlo)
  }

  override def finish(b: MomentBuf): MomentOut = {
    if (b.n == 0) return MomentOut(0L, 0.0, 0.0)
    val mask64 = (BigInt(1) << 64) - 1
    val sumsq = (BigInt(b.sumsqHi) << 64) | (BigInt(b.sumsqLo) & mask64)
    val numer = BigInt(b.n) * sumsq - BigInt(b.sum) * BigInt(b.sum) // exact
    val nD = b.n.toDouble
    def round6(x: Double): Double = math.floor(x * 1000000 + 0.5) / 1000000
    MomentOut(b.n,
      round6((b.sum.toDouble / nD) / 100.0),
      round6((numer.toDouble / (nD * nD)) / 10000.0))
  }

  override def bufferEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
  override def outputEncoder: Encoder[MomentOut] = Encoders.product[MomentOut]
}
