package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Hilbert-curve index of two quantized non-negative integer columns —
  * the locality-preserving alternative to [[graft.operators.Layout.zOrderKey]]'s
  * Morton interleave for write-side clustering: consecutive Hilbert
  * indexes are ALWAYS grid-adjacent (unit Manhattan step, spec-pinned),
  * where consecutive Z-order indexes jump across the plane at every
  * power-of-two boundary — so range predicates on either dimension
  * touch fewer files at the same file size (Hilbert is what Delta/
  * Iceberg offer beyond ZORDER for exactly this reason).
  *
  * The canonical xy2d walk (Hilbert 1891; the standard bit-twiddling
  * form): `bits` rounds from the top bit down, each adding
  * s²·((3·rx) XOR ry) and rotating the frame. Inputs clamp to
  * [0, 2^bits − 1] — callers quantize real columns into buckets first
  * (layout keys need rank, not exactness), same contract as zOrderKey.
  * One codegen'd loop per row, whole-stage friendly; the same rounds
  * unroll into plain SQL for the oracle replay.
  */
case class HilbertKey(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]; got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_key needs (bigint, bigint), got ($l, $r)")
    }

  private val mask: Long = (1L << bits) - 1

  override def nullSafeEval(xin: Any, yin: Any): Any = {
    var x = math.max(0L, math.min(xin.asInstanceOf[Long], mask))
    var y = math.max(0L, math.min(yin.asInstanceOf[Long], mask))
    var d = 0L
    var s = 1L << (bits - 1)
    val n = 1L << bits
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xin, yin) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      val n = 1L << bits
      s"""
         |long $x = java.lang.Math.max(0L, java.lang.Math.min($xin, ${mask}L));
         |long $y = java.lang.Math.max(0L, java.lang.Math.min($yin, ${mask}L));
         |long $d = 0L;
         |for (long $s = ${1L << (bits - 1)}L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = ${n}L - 1L - $x; $y = ${n}L - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)
}
