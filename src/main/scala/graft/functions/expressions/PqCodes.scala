package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization encoder as a native codegen'd expression: maps a
  * `dim`-element double vector to its `m` nearest-centroid codes, one
  * per subspace (argmin of ‖c‖²−2·v_s·c per codebook — the row's own
  * subnorm is constant within a subspace, ties to the lowest code id,
  * matching the declarative array_min-over-structs form).
  *
  * Why an expression and not composed functions: the composed argmin is
  * m×codesPerSub struct terms whose centroid literals constant-fold
  * INTO the generated source — a ~128-dot expression that takes seconds
  * of Janino compile per distinct codebook and can never hit the
  * codegen cache (the source embeds the floats). Here the codebooks ride
  * the references array — generated code is a one-line call, identical
  * for every codebook, and the inner loop is tight primitive Java.
  */
case class PqCodes(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_codes needs array<double>, got $t")
    }

  @transient private lazy val cents: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val norms: Array[Array[Double]] =
    codebooks.map(_.map(c => c.map(x => x * x).sum).toArray).toArray

  /** Shared by interpreted eval and generated code. */
  def assign(v: ArrayData): ArrayData = {
    val m = cents.length
    val codes = new Array[Int](m)
    var s = 0
    var off = 0
    while (s < m) {
      val cb = cents(s)
      val ns = norms(s)
      val sub = cb(0).length
      var best = 0
      var bestD = Double.MaxValue
      var ci = 0
      while (ci < cb.length) {
        val c = cb(ci)
        var dot = 0.0
        var j = 0
        while (j < sub) { dot += v.getDouble(off + j) * c(j); j += 1 }
        val d = ns(ci) - 2.0 * dot
        if (d < bestD) { bestD = d; best = ci } // strict < keeps lowest ci on ties
        ci += 1
      }
      codes(s) = best
      off += sub
      s += 1
    }
    new GenericArrayData(codes)
  }

  override def nullSafeEval(input: Any): Any =
    assign(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodes", this,
      classOf[PqCodes].getName)
    defineCodeGen(ctx, ev, c => s"$ref.assign($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}
