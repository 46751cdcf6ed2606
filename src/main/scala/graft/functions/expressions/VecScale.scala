package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Multiply every element of a numeric array by a scalar, in double
  * precision — one compiled loop per row. The functions-only form
  * (`transform(v, x => x * s)`) is an interpreted HigherOrderFunction
  * lambda per element; together with VecDot this keeps vector
  * normalization (`v * (1 / ‖v‖)`) entirely out of the interpreter.
  * Null elements propagate as null (like `transform` would), and the
  * output's containsNull mirrors the input's.
  */
case class VecScale(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType,
    containsNull = left.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    })

  private def elemIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_scale needs (array<float|double>, double), got ($l, $r)")
    }

  override def nullSafeEval(arr: Any, scalar: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val s = scalar.asInstanceOf[Double]
    val n = a.numElements()
    val out = new Array[Any](n)
    val isFloat = elemIsFloat
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) out(i) = null
      else {
        val v = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        out(i) = v * s
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecScale =
    copy(left = newLeft, right = newRight)
}
