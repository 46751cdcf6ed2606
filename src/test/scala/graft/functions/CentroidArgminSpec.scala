package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import graft.functions.expressions.CentroidArgmin

class CentroidArgminSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random doubles (no RNG object). */
  private def pd(i: Int, j: Int): Double =
    ((i * 1103515245L + j * 12345L) % 1000L) / 500.0 - 1.0

  private def literalAssign(vecCol: String,
      centroids: Seq[(Int, Seq[Double])]) = {
    val assignments = centroids.map { case (cid, c) =>
      val cNormSq = c.map(x => x * x).sum
      struct((lit(cNormSq) - lit(2.0) *
        VectorOps.dot(col(vecCol), array(c.map(lit): _*))).as("d"),
        lit(cid).as("cid"))
    }
    array_min(array(assignments: _*)).getField("cid")
  }

  test("kernel ≡ literal fold on every row, float and double inputs") {
    val d = 16
    val centroids = (0 until 80).map(k => k -> (0 until d).map(j => pd(k, j)))
    val rows = (0 until 500).map(i => (i.toLong, (0 until d).map(j => pd(i + 7, j).toFloat)))
    val df = rows.toDF("id", "vec")
    val both = df.select(col("id"),
      literalAssign("vec", centroids).as("lit_cell"),
      ColumnShim.column(CentroidArgmin(
        ColumnShim.expression(col("vec")), centroids)).as("kernel_cell"))
    assert(both.where(col("lit_cell") =!= col("kernel_cell")).count() == 0)
    // and through the operator switch: >64 centroids routes to the kernel
    val viaOp = graft.operators.SimilaritySearch
      .assignToCentroids(df.select(col("id"), col("vec")), "vec", centroids)
    val joined = viaOp.join(both, Seq("id"))
    assert(joined.where(col("cell") =!= col("lit_cell")).count() == 0)
  }

  test("tie-break: equal distances pick the smaller cid, like array_min on (d, cid)") {
    // two identical centroids with different ids — every row ties
    val centroids = Seq(5 -> Seq(1.0, 0.0), 2 -> Seq(1.0, 0.0))
    val df = Seq((1L, Seq(0.3, 0.4))).toDF("id", "vec")
    val cell = df.select(ColumnShim.column(CentroidArgmin(
      ColumnShim.expression(col("vec").cast("array<double>")), centroids))
      .as("cell")).head().getInt(0)
    assert(cell == 2)
  }

  test("null vector propagates") {
    val centroids = Seq(0 -> Seq(1.0, 0.0))
    val r = Seq(Tuple1(null: Array[Double])).toDF("vec")
      .select(ColumnShim.column(CentroidArgmin(
        ColumnShim.expression(col("vec")), centroids)).as("cell")).head()
    assert(r.isNullAt(0))
  }
}
