package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Minimum md5 over all `width`-character sliding windows of a string —
  * the winnowing/fingerprint primitive (x17) as ONE native expression with
  * a RUNNING min, replacing
  * `array_min(transform(sequence(1, len-w+1), i -> md5(substring(s,i,w))))`,
  * which materializes one 32-char hex string per character position (a
  * ~500-element array per fixture doc) just to scan it once — the same
  * allocation disease [[MicroL2]] cured for distances; the honest-metric
  * bench priced the HOF form at 4.3 s/rep at sf0.1. Strings shorter than
  * `width` hash whole, mirroring the declared CASE.
  *
  * Identical values by construction: same md5 per window (UTF8String
  * substring is codepoint-based like SQL substring; md5 over the UTF-8
  * bytes), and min-over-hex == min-over-digest-bytes compared unsigned
  * (hex is monotone in the underlying bytes). Null string → null;
  * CodegenFallback — per-row dispatch is noise next to the per-window
  * md5 loop that dominates the work.
  */
case class MinWindowMd5(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, int), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "min_window_md5"

  private def hex(d: Array[Byte]): UTF8String = {
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) { sb.append(f"${d(i) & 0xff}%02x"); i += 1 }
    UTF8String.fromString(sb.toString)
  }

  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  override def nullSafeEval(t: Any, w: Any): Any = {
    val s = t.asInstanceOf[UTF8String]
    val width = w.asInstanceOf[Int]
    require(width >= 1, s"width must be >= 1, got $width")
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytes = s.getBytes // ONE copy; windows are byte slices below
    val n = s.numChars()
    if (n < width) return hex(md.digest(bytes))
    // codepoint start offsets, one linear pass — windows must be
    // CODEPOINT-based (SQL substring semantics), but hashing reads the
    // underlying bytes directly so no per-window substring/getBytes
    // allocation survives (the first cut of this loop still paid one
    // UTF8String + one byte[] per window and only reached 3.7 s)
    val offs = new Array[Int](n + 1)
    var ci = 0; var off = 0
    while (ci < n) {
      offs(ci) = off
      val b = bytes(off) & 0xff
      off += (if (b < 0x80) 1 else if ((b & 0xe0) == 0xc0) 2
              else if ((b & 0xf0) == 0xe0) 3 else 4)
      ci += 1
    }
    offs(n) = bytes.length
    val out = new Array[Byte](16)
    val best = new Array[Byte](16)
    var has = false
    var i = 0
    while (i <= n - width) {
      md.reset()
      md.update(bytes, offs(i), offs(i + width) - offs(i))
      md.digest(out, 0, 16)
      if (!has || less(out, best)) {
        System.arraycopy(out, 0, best, 0, 16); has = true
      }
      i += 1
    }
    hex(best)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinWindowMd5 =
    copy(left = newLeft, right = newRight)
}

object MinWindowMd5 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinWindowMd5].getName, "min_window_md5")
}
