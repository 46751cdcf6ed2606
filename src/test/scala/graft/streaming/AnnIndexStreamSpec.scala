package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.SimilaritySearch

case class Vec(vec_id: Long, ts: Timestamp, embedding: Seq[Float])

/** The ANN index-maintenance stream must emit exactly the rows its
  * batch form computes (quantizer APPLICATION is stateless, so the
  * equivalence is literal), and re-delivered vector ids inside the
  * watermark horizon must not produce duplicate index rows.
  */
class AnnIndexStreamSpec extends SparkSpec {

  // two clear clusters so cell assignment is unambiguous
  private def vecs: Seq[Vec] = (1 to 12).map { i =>
    val base = if (i % 2 == 0) Seq(10.0f, 0.0f, 0.0f, 0.0f)
    else Seq(0.0f, 10.0f, 0.0f, 0.0f)
    Vec(i.toLong, Timestamp.valueOf(f"2024-01-01 10:$i%02d:00"),
      base.zipWithIndex.map { case (v, j) => v + (i * (j + 1)) * 0.01f })
  }

  test("index stream ≡ batch indexRows; duplicate ids are dropped within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batchDf = vecs.toDF()
    val centroids = SimilaritySearch.fitIvf(batchDf, "embedding", k = 2)
    val codebooks = SimilaritySearch.fitPq(
      SimilaritySearch.cellResiduals(batchDf, "embedding", centroids),
      "__resid", dim = 4, m = 2, codesPerSub = 4, maxIter = 2)

    val batch = AnnIndexStream.indexRows(batchDf, "embedding", "vec_id",
      centroids, codebooks)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    assert(batch.size == 12)
    // the two clusters land in two distinct cells
    assert(batch.map(_._2).size == 2, s"expected 2 cells, got ${batch.map(_._2)}")

    val mem = MemoryStream[Vec]
    val q = AnnIndexStream.indexRowsDeduped(mem.toDF(), "embedding", "vec_id",
      "ts", "10 minutes", centroids, codebooks)
      .writeStream.format("memory").queryName("ann_index").outputMode("append")
      .start()
    try {
      mem.addData(vecs: _*)
      q.processAllAvailable()
      // re-deliver three ids (source retry) — must not append again
      mem.addData(vecs.take(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("ann_index")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
      assert(spark.table("ann_index").count() == 12,
        "re-delivered ids produced duplicate index rows")
      assert(streamed == batch)
    } finally q.stop()
  }

  test("quantizerDrift: stable distribution stays unflagged, a shifted one trips the refit trigger") {
    import spark.implicits._
    val fitDf = vecs.toDF()
    val centroids = SimilaritySearch.fitIvf(fitDf, "embedding", k = 2)
    val baseline = AnnIndexStream.residualStats(fitDf, "embedding", centroids)

    // same distribution re-measured against its own fit: every cell's
    // ratio is exactly 1 and nothing asks for a refit
    val stable = AnnIndexStream
      .quantizerDrift(baseline, baseline, threshold = 1.25)
      .collect()
    assert(stable.length == 2)
    assert(stable.forall(r => math.abs(r.getAs[Double]("drift_ratio") - 1.0) < 1e-12))
    assert(stable.forall(!_.getAs[Boolean]("refit")))

    // drifted arrivals: every vector shifted off the fit-time manifold —
    // residual norms grow in every cell, the ratio clears the threshold,
    // and the metric demands a refit
    val shifted = fitDf.select(col("vec_id"),
      transform(col("embedding"), x => x + lit(6.0f)).as("embedding"))
    val drifted = AnnIndexStream.quantizerDrift(
      AnnIndexStream.residualStats(shifted, "embedding", centroids),
      baseline, threshold = 1.25).collect()
    assert(drifted.exists(_.getAs[Boolean]("refit")),
      s"shifted distribution not flagged: ${drifted.mkString(", ")}")
    assert(drifted.filter(_.getAs[Boolean]("refit"))
      .forall(r => r.isNullAt(r.fieldIndex("drift_ratio")) ||
        r.getAs[Double]("drift_ratio") > 1.25))
  }
}
