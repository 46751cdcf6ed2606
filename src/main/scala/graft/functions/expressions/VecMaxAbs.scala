package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** max(|xᵢ|) of a numeric array — the per-vector dynamic range that
  * symmetric int8 quantization divides by. Same rationale as [[VecDot]]:
  * the higher-order-function spelling (`array_max(transform(v, abs))`)
  * allocates an intermediate array and interprets a lambda per element;
  * this is one codegen'd loop with a double accumulator. Null elements
  * are skipped; an empty (or all-null) array yields 0.0 — which callers
  * treat as "zero vector, quantize to zeros".
  */
case class VecMaxAbs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_max_abs needs array<float|double>, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = math.abs(
          if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        if (v > m) m = v
      }
      i += 1
    }
    m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter =
      if (isFloat) (v: String, i: String) => s"(double) $v.getFloat($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $v = java.lang.Math.abs(${getter(a, i)});
         |    if ($v > $m) $m = $v;
         |  }
         |}
         |${ev.value} = $m;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecMaxAbs =
    copy(child = newChild)
}
