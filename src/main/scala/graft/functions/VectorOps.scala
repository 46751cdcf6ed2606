package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column expressions over `array<float>` / `array<double>`
  * embedding columns. All math is promoted to double and runs as codegen'd
  * higher-order functions — no UDFs, no driver-side loops, so the same
  * expressions distribute over any number of executors.
  */
object VectorOps {

  /** Dot product of two equal-length array columns, in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Euclidean (L2) norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared Euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Signed random-hyperplane LSH signature: bit i = (v · plane_i) > 0,
    * packed into a long. Planes must be the same on every call site —
    * generate them once with a fixed seed (see SimilaritySearch.hyperplanes).
    */
  def hyperplaneSignature(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(v, planeLit) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
}
