package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Lexicographic-min md5 over every length-`n` character shingle of a
  * text — a 1-permutation MinHash fingerprint — as one compiled pass.
  *
  * The functions-only formulation (`array_min(transform(sequence(...),
  * i => md5(substr(text, i, n))))`) walks every character position
  * through an interpreted HigherOrderFunction lambda, materializes an
  * array of hex strings, then scans it again for the min. This
  * expression keeps ONE running 16-byte minimum on the stack, reuses a
  * thread-local MessageDigest across positions and rows, and hex-encodes
  * only the winning digest. Output equals the functions form (and
  * DuckDB's `min(md5(substr(text, i, 8)))`): the unsigned byte order of
  * a digest is exactly the lexicographic order of its hex string.
  *
  * Texts shorter than `n` hash as a single whole-text shingle, matching
  * the clipped `greatest(length − n + 1, 1)` position range.
  *
  * Shingle windows are indexed by Unicode CODE POINTS (like SQL
  * `substring` and `length`, which both DuckDB and Spark define over
  * code points), not UTF-16 code units — a supplementary character
  * (emoji, rare CJK) counts as one position and is never split across
  * its surrogate pair.
  */
case class MinShingleMd5(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n > 0, "shingle length must be positive")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"min_shingle_md5 needs a string, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val md = MinShingleMd5.digests.get()
    val cpCount = s.codePointCount(0, s.length)
    val positions = math.max(cpCount - n + 1, 1)
    var best: Array[Byte] = null
    // `start` walks code-point boundaries as UTF-16 offsets; `end` leads
    // it by n code points (clipped to the text), so each window is the
    // code-point analogue of substring(text, i, n).
    var start = 0
    var end = s.offsetByCodePoints(0, math.min(n, cpCount))
    var i = 0
    while (i < positions) {
      md.reset()
      val d = md.digest(
        s.substring(start, end).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (best == null || MinShingleMd5.unsignedLess(d, best)) best = d
      i += 1
      if (i < positions) {
        start = s.offsetByCodePoints(start, 1)
        if (end < s.length) end = s.offsetByCodePoints(end, 1)
      }
    }
    UTF8String.fromString(MinShingleMd5.hex(best))
  }

  override protected def withNewChildInternal(newChild: Expression): MinShingleMd5 =
    copy(child = newChild)
}

object MinShingleMd5 {

  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  private def hex(d: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(d.length * 2)
    d.foreach(b => sb.append(Character.forDigit((b >> 4) & 0xf, 16))
      .append(Character.forDigit(b & 0xf, 16)))
    sb.toString
  }
}
