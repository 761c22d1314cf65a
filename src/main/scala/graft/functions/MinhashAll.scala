package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature: `minhash_all(text, k)` returns the k
  * hex-string minima over a document's 3-token shingles — byte-identical
  * to the exploded formulation used by x13
  * (explode(shingles) → k × min(md5(concat(j, '|', shingle)))) but
  * computed per ROW in one tight loop: no 50×-row shingle explosion, no
  * hash-aggregate shuffle for the signature at all. On a 100 TB corpus
  * the signature stage becomes pure scan-side CPU; only the (tiny) band
  * buckets ever shuffle.
  *
  * CodegenFallback is deliberate and cheap HERE: the fallback cost is one
  * virtual call per DOCUMENT (the k·shingles MD5 loop inside is compiled
  * Scala), unlike per-element higher-order lambdas, whose interpreted
  * dispatch per shingle is the 5-8× trap documented in LlmQueries.
  *
  * Null/shingle-free inputs (null text, < 3 tokens) return null — the
  * same "no signature row" contract as the exploded path. Tokenization
  * matches Spark's `split(text, ' ')` exactly (trailing empties kept).
  */
case class MinhashAll(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string document, got ${left.dataType.simpleString}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a literal int k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_all"

  @transient private lazy val k: Int = {
    val v = right.eval(null).asInstanceOf[Int]
    require(v >= 1 && v <= 128, s"minhash_all k must be in 1..128, got $v")
    v
  }

  // MessageDigest is stateful; one per thread, reset per use
  @transient private lazy val digests =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(text: Any, kAny: Any): Any = {
    // limit -1 keeps trailing empty tokens, same as Spark's split(text, ' ')
    val toks = text.asInstanceOf[UTF8String].toString.split(" ", -1)
    val n = toks.length
    if (n < 3) return null
    val md = digests.get()
    val mins = new Array[String](k)
    var i = 0
    while (i <= n - 3) {
      val shingle = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
      var j = 0
      while (j < k) {
        val h = md5Hex(md, j.toString + "|" + shingle)
        if (mins(j) == null || h.compareTo(mins(j)) < 0) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => UTF8String.fromString(m): Any))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinhashAll =
    copy(left = newLeft, right = newRight)
}

object MinhashAll {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinhashAll].getName, "minhash_all")
}
