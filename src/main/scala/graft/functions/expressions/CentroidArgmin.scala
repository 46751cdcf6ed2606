package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment over a FIXED centroid matrix as one
  * compiled pass: `argmin_cid (||c||² − 2·v·c)` with (distance, cid)
  * ascending tie-break — bit-identical to the declarative
  * `array_min(array(struct(d, cid)...))` literal fold
  * ([[graft.operators.SimilaritySearch.assignToCentroids]]'s small-k
  * form): the dot accumulates in element order exactly like
  * [[VecDot]], `||c||²` uses the same Scala fold the literal path
  * bakes in at plan time, and `d = cn2 − 2.0·dot` associates the same
  * way. The difference is purely mechanical: the literal fold
  * generates O(kCells · d) Java source PER PLAN — measured 63 s of
  * the 63.1 s inline IVF row at kCells = 447 / n = 200k (SCALE.md
  * r19, the AnnLaw measurement) — while this expression is a fixed
  * ~30-line eval whose cost is the irreducible n·kCells·d arithmetic.
  *
  * The centroid matrix is part of the expression instance (a fit is
  * k×d doubles, a driver-bounded object by the Lloyd sampling
  * discipline), so it ships to executors once with the serialized
  * plan, not per row.
  */
case class CentroidArgmin(child: Expression,
    centroids: Seq[(Int, Seq[Double])])
    extends UnaryExpression with CodegenFallback {

  require(centroids.nonEmpty, "need at least one centroid")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"centroid_argmin needs array<float|double>, got $t")
    }

  @transient private lazy val cids: Array[Int] = centroids.map(_._1).toArray
  @transient private lazy val cvecs: Array[Array[Double]] =
    centroids.map(_._2.toArray).toArray
  // the SAME Scala fold the literal path computes at plan time
  @transient private lazy val cn2: Array[Double] =
    centroids.map { case (_, c) => c.map(x => x * x).sum }.toArray
  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var bestD = Double.PositiveInfinity
    var bestCid = Int.MaxValue
    var j = 0
    while (j < cvecs.length) {
      val c = cvecs(j)
      val n = math.min(v.numElements(), c.length)
      var dot = 0.0
      var i = 0
      while (i < n) {
        val xv = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dot += xv * c(i)
        i += 1
      }
      val d = cn2(j) - 2.0 * dot
      val cid = cids(j)
      if (d < bestD || (d == bestD && cid < bestCid)) {
        bestD = d
        bestCid = cid
      }
      j += 1
    }
    bestCid
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidArgmin =
    copy(child = newChild)
}
