package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization as native codegen'd Catalyst expressions —
  * the preprocessing step every LLM tokenizer pipeline applies before
  * tokenization (NFC/NFKC canonicalization, accent folding) and that Spark
  * SQL has no built-in for. Two session functions (registered by
  * [[graft.plans.GraftExtensions]]):
  *
  *  - `nfc_normalize(s)`: canonical composition (java.text.Normalizer NFC)
  *    — decomposed base+combining-mark sequences become their precomposed
  *    codepoints, so byte-identical text hashes identically regardless of
  *    which Unicode form the source emitted (the dedup-by-md5 operators
  *    x10/x107 silently treat NFC and NFD spellings of the SAME text as
  *    different docs without this).
  *  - `strip_accents(s)`: NFD decomposition + removal of all combining
  *    marks (`\p{M}`) — accent folding for matching/blocking (x83's sorted
  *    neighborhood, language-agnostic joins).
  *
  * Both are null-preserving, allocate nothing beyond the result string,
  * and generate a single static call (the JDK Normalizer is the loop) —
  * the hot path stays inside whole-stage codegen. Semantics are pinned
  * cross-engine by x134's DuckDB oracle (utf8proc's `nfc_normalize` /
  * `strip_accents`), so the JDK and utf8proc implementations are asserted
  * to agree on every byte the fixture exercises.
  */
object UnicodeNorm {
  /** Static eval helpers: the generated code calls these (one virtual-free
    * static call per row) instead of inlining Normalizer plumbing. */
  def nfc(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))

  private val Marks = java.util.regex.Pattern.compile("\\p{M}+")
  def stripAccents(s: UTF8String): UTF8String =
    UTF8String.fromString(
      Marks.matcher(java.text.Normalizer.normalize(
        s.toString, java.text.Normalizer.Form.NFD)).replaceAll(""))

  val nfcInfo: ExpressionInfo =
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize")
  val stripInfo: ExpressionInfo =
    new ExpressionInfo(classOf[StripAccents].getName, "strip_accents")
}

sealed trait UnicodeNormExpr extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${t.simpleString}")
    }
  /** Fully-qualified static method the codegen calls. */
  protected def staticCall: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNorm.$staticCall($c)")
}

case class NfcNormalize(child: Expression) extends UnicodeNormExpr {
  override def prettyName: String = "nfc_normalize"
  override protected def staticCall: String = "nfc"
  override def nullSafeEval(s: Any): Any = UnicodeNorm.nfc(s.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
}

case class StripAccents(child: Expression) extends UnicodeNormExpr {
  override def prettyName: String = "strip_accents"
  override protected def staticCall: String = "stripAccents"
  override def nullSafeEval(s: Any): Any = UnicodeNorm.stripAccents(s.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): StripAccents = copy(child = c)
}
