package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd EXACT micro-integer squared L2 distance over two
  * array<double> columns: Σ_d ⌊(x_d − y_d)² · 10⁶ + 0.5⌋ as a LONG — the
  * x352/x354 distance discipline (per-term round6 into an exact integer
  * sum, so the value is order-free and engine-portable: DuckDB computes
  * the identical integers with list_sum/list_transform) as a native
  * expression instead of `aggregate(zip_with(...))`, which materializes a
  * 64-element product array PER PAIR — measured 11-13 s/query at sf0.1
  * from allocation churn alone; this loop runs in whole-stage codegen
  * over the unsafe buffers ([[FloatDot]]'s pattern for distances).
  *
  * Null semantics match the higher-order formulation: null array, null
  * element, or length mismatch poisons the result to null.
  *
  * ORACLE DIVERGENCE ON NULL LANES (advice r13): the DuckDB sides of
  * x352/x354 compute the same distance as `list_sum` over per-lane floor
  * terms, and list_sum SKIPS null terms — a null embedding lane would
  * yield a partial distance there while this expression poisons the whole
  * pair to null (Spark drops it from min/top-k, DuckDB keeps it
  * understated). The engines therefore agree ONLY on lane-null-free
  * embeddings; `MicroL2Spec` pins that precondition against the fixture
  * tables (`exists(embedding, isnull)` count = 0), so a fixture
  * regeneration that introduces null lanes fails the suite instead of
  * silently desyncing the oracle.
  */
case class MicroL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "micro_l2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += math.floor(d * d * 1000000.0 + 0.5).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) { ${ev.isNull} = true; }
         |int $n = $a.numElements();
         |long $acc = 0L;
         |if (!${ev.isNull}) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += (long) java.lang.Math.floor($d * $d * 1000000.0 + 0.5);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MicroL2 =
    copy(left = newLeft, right = newRight)
}

object MicroL2 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MicroL2].getName, "micro_l2")
}
