package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `char_ngrams(text, n)` — a custom GENERATOR (table-valued) expression:
  * one output row per character n-gram of the input, the engine's sixth
  * Catalyst extension face (expression / aggregate / physical operator /
  * optimizer rule / table source / GENERATOR — the `explode` family's
  * interface, which is how SQL surfaces one-to-many row expansion).
  *
  * Character n-grams are the language-identification and fuzzy-matching
  * primitive (x15's heuristic, x83/x84's blocking) that token-level
  * shingles can't express — they cross word boundaries and survive
  * whitespace/punctuation drift. Emitting them through a Generator keeps
  * the expansion INSIDE the query plan (a `Generate` node — per-row
  * fan-out, no shuffle, downstream operators see ordinary rows) instead
  * of materializing an array column first: on a 100 TB corpus the
  * transform-then-explode form allocates every document's full gram
  * array per row; the generator streams them.
  *
  * Semantics (DuckDB-oracle-pinned by x152): n-grams at every character
  * position 1..len−n+1 in order, NFC-agnostic raw codepoints; inputs
  * shorter than n (or null) generate nothing; `n` must be a foldable
  * positive integer — enforced at analysis, not at runtime.
  */
case class CharNgrams(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, n.dataType) match {
      case (StringType, IntegerType) if n.foldable =>
        val v = n.eval().asInstanceOf[Number]
        if (v != null && v.intValue() >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("char_ngrams n must be >= 1")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"char_ngrams requires (string, foldable int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  private lazy val width: Int = n.eval().asInstanceOf[Number].intValue()

  override def elementSchema: StructType =
    StructType(Seq(StructField("gram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = child.eval(input).asInstanceOf[UTF8String]
    if (s == null) return Iterator.empty
    val len = s.numChars()
    if (len < width) return Iterator.empty
    (0 to len - width).iterator.map { i =>
      InternalRow(s.substringSQL(i + 1, width))
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CharNgrams =
    copy(child = newChildren(0), n = newChildren(1))
  override def prettyName: String = "char_ngrams"
}

object CharNgrams {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CharNgrams].getName, "char_ngrams")
}
