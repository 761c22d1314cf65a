package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** `cms_estimate(sketch, item)` — probe a serialized Count-Min sketch (the
  * binary emitted by Spark's built-in `count_min_sketch` aggregate) for an
  * item's estimated count, as a codegen'd expression.
  *
  * Spark ships the CMS AGGREGATE as a public SQL function but no probe
  * expression — the sketch bytes are a write-only value unless you collect
  * them to the driver. This is the read side, mirroring the design of the
  * internal `BloomFilterMightContain` (x123's machinery): the sketch child
  * must be constant-foldable (a literal or an executed scalar subquery);
  * it is deserialized ONCE per task into a transient lazy field that both
  * eval and the generated code reference, so the per-row cost is the
  * sketch's depth-many hash probes, never a deserialization.
  *
  * Item hashing matches the aggregate's exactly: `count_min_sketch` adds
  * strings via `addBinary(utf8Bytes)`, so the probe calls
  * `estimateCount(byte[])` on the same UTF-8 bytes (long items probe as
  * longs, matching `addLong`). CMS estimates NEVER undercount —
  * `estimate ≥ true count` always — which is what makes a
  * `cms_estimate(s, x) >= T` gate a SAFE heavy-hitter prefilter: false
  * positives survive to an exact recount, false negatives cannot exist
  * (x136's build-once/probe-everywhere pattern, the CMS face of x123's
  * Bloom argument).
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType | LongType) =>
        left match {
          // same contract as BloomFilterMightContain: a literal, or an
          // uncorrelated subquery whose one value is available pre-codegen
          case e if e.foldable => TypeCheckResult.TypeCheckSuccess
          case _: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] =>
            TypeCheckResult.TypeCheckSuccess
          case _ => TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires a constant sketch (literal or scalar subquery)")
        }
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string|bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_estimate"

  @transient private lazy val cms: CountMinSketch = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  /** Probe entry the generated code calls (also used by eval). */
  def estimate(item: Any): Long = item match {
    case s: UTF8String => cms.estimateCount(s.getBytes)
    case l: java.lang.Long => cms.estimateCount(l)
    case other => cms.estimateCount(other)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    if (cms == null) return null
    val item = right.eval(input)
    if (item == null) null else estimate(item)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    if (cms == null) {
      return ev.copy(code =
        code"""
              |boolean ${ev.isNull} = true;
              |long ${ev.value} = -1L;
            """.stripMargin)
    }
    val self = ctx.addReferenceObj("cmsEstimate", this,
      classOf[CmsEstimate].getName)
    val itemGen = right.genCode(ctx)
    val itemBoxed = right.dataType match {
      case LongType => s"((Object)(Long)${itemGen.value})"
      case _        => s"((Object)${itemGen.value})"
    }
    ev.copy(code =
      code"""
            |${itemGen.code}
            |boolean ${ev.isNull} = ${itemGen.isNull};
            |long ${ev.value} = -1L;
            |if (!${ev.isNull}) {
            |  ${ev.value} = $self.estimate($itemBoxed);
            |}
          """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CmsEstimate].getName, "cms_estimate")
}
