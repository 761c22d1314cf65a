package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable

/** `space_saving(item, m)` — the SpaceSaving heavy-hitter summary (Metwally
  * et al. 2005) as a custom [[TypedImperativeAggregate]]: at most `m`
  * (item, count, err) counters per group, O(m) state regardless of input
  * size — the custom-AGGREGATE extension face of the engine (the sibling
  * of the expression face `FloatDot`/`CmsEstimate`, the operator face
  * `TopKPerKey`, and the rule face `TopKRewrite`).
  *
  * Semantics: classic per-stream SpaceSaving — a new item beyond capacity
  * evicts the minimum counter (count asc, then item DESC so the
  * lexicographically-smallest of tied items survives — a deterministic
  * rule both partial and final levels apply) and inherits its count as
  * `err` (the overestimation bound: true count ∈ [cnt − err, cnt]).
  * Partial merge follows the mergeable-summaries rule (Agarwal et al.
  * 2012): for each item in either summary, the side where it is ABSENT
  * contributes its floor (min counter — the most that side could have
  * seen of it before eviction) as both count and error, then the weakest
  * counters truncate back to capacity. This keeps cnt ≥ true count for
  * every retained item across arbitrary partition merges — the naive
  * combine-then-truncate (no floor inheritance) can UNDERcount an item
  * evicted from one partial. Output: every retained counter, ordered
  * (cnt desc, item asc).
  *
  * EXACTNESS contract the declared query (x137) relies on: while the
  * number of DISTINCT items a group ever sees is ≤ m, no eviction and no
  * truncation ever happens at any level, so counts are exact, errs are 0,
  * and the result is merge-order-independent — DuckDB-oracle-checkable.
  * Under pressure (distinct > m) the summary is approximate with the
  * documented per-item bound (spec-pinned: any item with true count >
  * n/m is guaranteed retained in a single-stream summary) and the output
  * depends on partition merge order — the declared query never operates
  * in that regime; the spec exercises it single-partition.
  *
  * Scale: map-side partials are O(m) each, the exchange carries one O(m)
  * buffer per (partition × group) — the aggregate analog of TopKPerKey's
  * bounded-shuffle argument, for FREQUENCY instead of rank.
  */
case class SpaceSavingTopK(
    child: Expression,
    capacityExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingTopK.Summary] {

  private lazy val capacity: Int = capacityExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, capacityExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, capacityExpr.dataType) match {
      case (StringType, IntegerType) if capacityExpr.foldable =>
        if (capacityExpr.eval().asInstanceOf[Number].intValue() > 0)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("space_saving capacity must be > 0")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"space_saving requires (string, foldable int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): SpaceSavingTopK.Summary =
    new SpaceSavingTopK.Summary(capacity)

  override def update(b: SpaceSavingTopK.Summary, input: InternalRow): SpaceSavingTopK.Summary = {
    val v = child.eval(input)
    if (v != null) b.observe(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: SpaceSavingTopK.Summary, o: SpaceSavingTopK.Summary): SpaceSavingTopK.Summary = {
    // mergeable-summaries rule (Agarwal et al.): an item ABSENT from one
    // side may have been evicted there, so that side contributes its
    // floor (min counter; 0 while under capacity) as both count and
    // error — without it a merge UNDERcounts, the one failure mode
    // SpaceSaving exists to exclude. Floors are captured before mutation.
    val bFloor = b.floorCount
    val oFloor = o.floorCount
    val keys = b.counters.keySet ++ o.counters.keySet
    val merged = keys.toSeq.map { k =>
      val (bc, be) = b.counters.getOrElse(k, (bFloor, bFloor))
      val (oc, oe) = o.counters.getOrElse(k, (oFloor, oFloor))
      k -> ((bc + oc, be + oe))
    }
    b.counters.clear()
    merged.foreach { case (k, v) => b.counters.update(k, v) }
    b.truncateToCapacity()
    b
  }

  override def eval(b: SpaceSavingTopK.Summary): Any = {
    val rows = b.counters.toSeq
      .sortBy { case (item, (cnt, _)) => (-cnt, item) }
      .map { case (item, (cnt, err)) =>
        InternalRow(UTF8String.fromString(item), cnt, err)
      }
    new GenericArrayData(rows)
  }

  override def serialize(b: SpaceSavingTopK.Summary): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.counters.size)
    b.counters.foreach { case (item, (cnt, err)) =>
      val bytes = item.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes)
      out.writeLong(cnt); out.writeLong(err)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingTopK.Summary = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new SpaceSavingTopK.Summary(capacity)
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val len = in.readInt(); val arr = new Array[Byte](len); in.readFully(arr)
      b.put(new String(arr, "UTF-8"), in.readLong(), in.readLong())
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren(0), capacityExpr = newChildren(1))
  override def prettyName: String = "space_saving"
}

object SpaceSavingTopK {
  /** Mutable counter map with SpaceSaving eviction. */
  final class Summary(capacity: Int) extends Serializable {
    val counters: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty

    /** The summary's floor: an item NOT in the map has true count ≤ this
      * (0 while under capacity — nothing was ever evicted). */
    def floorCount: Long =
      if (counters.size < capacity) 0L else counters.valuesIterator.map(_._1).min

    /** One observation of `item`: increment, insert, or evict-and-inherit
      * per classic SpaceSaving. */
    def observe(item: String): Unit =
      counters.get(item) match {
        case Some((c, e)) => counters.update(item, (c + 1L, e))
        case None if counters.size < capacity => counters.update(item, (1L, 0L))
        case None =>
          // evict the minimum counter: count asc, item DESC — so among
          // tied minima the lexicographically smallest item SURVIVES,
          // deterministically at every level
          val (minItem, (minCnt, _)) = counters.minBy {
            case (i, (c, _)) => (c, SpaceSavingTopK.desc(i))
          }
          counters.remove(minItem)
          counters.update(item, (minCnt + 1L, minCnt))
      }

    /** Merge-path upsert: sum counts and errs, no capacity check (the
      * caller truncates once after the whole merge). */
    def put(item: String, cnt: Long, err: Long): Unit =
      counters.update(item, counters.get(item)
        .fold((cnt, err)) { case (c, e) => (c + cnt, e + err) })

    /** After a merge pushed past capacity: drop weakest counters (count
      * asc, item desc) back to capacity. */
    def truncateToCapacity(): Unit =
      if (counters.size > capacity)
        counters.toSeq
          .sortBy { case (i, (c, _)) => (c, SpaceSavingTopK.desc(i)) }
          .take(counters.size - capacity)
          .foreach { case (i, _) => counters.remove(i) }
  }

  /** Ordering adapter: sort `item DESC` inside a `sortBy` that is
    * otherwise ascending. */
  private[functions] def desc(s: String): DescString = new DescString(s)
  private[functions] final class DescString(val s: String)
      extends Ordered[DescString] {
    override def compare(that: DescString): Int = that.s.compareTo(s)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SpaceSavingTopK].getName, "space_saving")
}
