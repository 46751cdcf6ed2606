package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Binary (sign) quantization of an embedding: bit i of the result is
  * set iff element i is strictly positive, for the first min(64, len)
  * dimensions — the 1-bit-per-dimension code that cuts vector storage
  * 32× and turns similarity into XOR + POPCNT (Hamming distance), the
  * standard coarse filter in front of an exact rerank at corpus scale.
  * For zero-centered embeddings the sign pattern preserves angular
  * neighborhoods (it is [[graft.functions.VectorOps.hyperplaneSignature]]
  * with the axis-aligned basis as the planes — but one codegen'd loop
  * instead of 64 dot products). Null elements contribute a 0 bit.
  */
case class SignBits64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_bits64 needs array<float|double>, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(64, arr.numElements())
    var bits = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        if (v > 0.0) bits |= (1L << i)
      }
      i += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter =
      if (isFloat) (v: String, i: String) => s"(double) $v.getFloat($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val bits = ctx.freshName("bits")
      s"""
         |int $n = java.lang.Math.min(64, $a.numElements());
         |long $bits = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && ${getter(a, i)} > 0.0) {
         |    $bits |= (1L << $i);
         |  }
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignBits64 =
    copy(child = newChild)
}
