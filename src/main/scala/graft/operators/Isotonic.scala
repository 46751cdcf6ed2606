package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Isotonic (PAV) calibration — the monotone-fit upgrade to the binned
  * reliability table (`model_calibration`): pool-adjacent-violators
  * finds THE least-squares monotone map from score bins to empirical
  * rates (the projection onto the isotone cone is unique — merge order
  * never changes the result), the calibration standard when a model's
  * scores rank well but read miscalibrated.
  *
  * Contract: input rows are (bin, 0/1 label) with INTEGER-ordered bins
  * — the caller discretizes scores first ([[DecisionSplit]]'s input
  * discipline), which is also what makes the algorithm scale-honest:
  * the data-sized work is ONE (bin → count, positives) hash aggregate;
  * PAV itself runs on the BINS-sized table at the driver (the Lloyd-
  * state / BPE-merge-loop precedent: state ∝ bins, never rows), in
  * BigInt rationals — pooled rates compare by cross-multiplication, so
  * the fit is EXACT and the ppm output replays bit for bit in a SQL
  * oracle that unrolls leftmost-violation merges (n_bins − 1 steps
  * bound the pooling regardless of merge order).
  *
  * @return (bin, n, pos, calibrated_ppm) per input bin, calibrated_ppm
  *         monotone non-decreasing in bin, Σ-preserving per block
  */
object Isotonic {

  def pavCalibrate(df: DataFrame, binCol: String, labelCol: String): DataFrame = {
    val spark = df.sparkSession
    val bins = df.select(col(binCol).cast("long").as("bin"),
        col(labelCol).cast("long").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"))
      .orderBy(col("bin"))
      .collect()
    // the driver-side loop is only honest on a DISCRETIZED axis — fail
    // loudly if a caller fed raw scores (the contract says bin first)
    require(bins.length <= 100000,
      s"pavCalibrate got ${bins.length} distinct bins — discretize the " +
        "score axis first (driver PAV state must stay bins-sized)")
    // blocks as (minBin, weight, positives); merge while decreasing
    case class Block(minBin: Long, w: BigInt, y: BigInt)
    val stack = collection.mutable.ArrayBuffer.empty[Block]
    bins.foreach { r =>
      var cur = Block(r.getLong(0), BigInt(r.getLong(1)), BigInt(r.getLong(2)))
      // strict violation y_prev/w_prev > y_cur/w_cur, cross-multiplied
      while (stack.nonEmpty && stack.last.y * cur.w > cur.y * stack.last.w) {
        val p = stack.remove(stack.length - 1)
        cur = Block(p.minBin, p.w + cur.w, p.y + cur.y)
      }
      stack += cur
    }
    // assign each bin its covering block's pooled rate (exact ppm)
    val blocks = stack.toArray
    val rows = bins.map { r =>
      val bin = r.getLong(0)
      // last block with minBin <= bin
      val b = blocks(blocks.lastIndexWhere(_.minBin <= bin))
      Row(bin, r.getLong(1), r.getLong(2),
        ((BigInt(1000000) * b.y) / b.w).toLong)
    }
    val schema = StructType(Seq(
      StructField("bin", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("pos", LongType, nullable = false),
      StructField("calibrated_ppm", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
  }
}
