package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned interval joins — the large×large complement of the broadcast
  * band join (`j5_band_join`): when NEITHER side fits in a broadcast,
  * a range predicate alone would force a nested-loop/cartesian plan.
  * Quantizing the range dimension into fixed-width bins turns the
  * range join into an EQUI-join on the bin key — a plain shuffled hash
  * join both engines and AQE know how to scale — with the exact range
  * predicate re-checked as a cheap post-filter.
  *
  * Cost model: an interval spanning `b` bins is replicated `b` times
  * (`sequence` + `explode`), so the caller picks `binWidth` near the
  * typical interval length — replication stays O(1) per interval while
  * each point hashes to exactly ONE bin. At 100 TB the bin key is also
  * the natural partition key for a stored layout: co-bucketing both
  * sides on `__bin` makes the join shuffle-free (Layout.writeBucketed).
  *
  * Bins are true floor divisions in exact long arithmetic
  * (`(x - pmod(x, w)) / w`), correct for negative epochs too — a
  * double `floor(x / w)` would mis-bin near boundaries once x exceeds
  * 2^53.
  */
object IntervalJoin {

  /** Runaway-replication guard: an interval spanning more than this
    * many bins (a mis-chosen binWidth or a corrupt end < start row)
    * fails the job with a clear message instead of silently exploding
    * the shuffle. Checked distributedly via `raise_error` — no driver
    * pass over the data.
    */
  val MaxBinsPerInterval = 10000L

  private def floorDiv(x: Column, w: Long): Column =
    (x - pmod(x, lit(w))) / lit(w)

  private def binSeq(start: Column, end: Column, w: Long): Column = {
    val lo = floorDiv(start, w).cast("long")
    val hi = floorDiv(end, w).cast("long")
    val guarded = when(end < start,
        raise_error(concat(lit("IntervalJoin: interval end < start: "),
          start.cast("string"), lit(" > "), end.cast("string"))))
      .when(hi - lo >= lit(MaxBinsPerInterval),
        raise_error(concat(lit("IntervalJoin: interval spans "),
          (hi - lo + lit(1)).cast("string"),
          lit(s" bins (> $MaxBinsPerInterval); raise binWidth"))))
      .otherwise(hi)
    sequence(lo, guarded)
  }

  /** Points with their `__bin` key — the storable left side of
    * [[joinBinned]]. Persist it bucketed by `__bin`
    * ([[Layout.writeBucketed]]) and the repeated join reads it with no
    * exchange (IntervalJoinSpec pins the zero-shuffle plan).
    */
  def binPoints(points: DataFrame, ptCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive; got $binWidth")
    points.withColumn("__bin", floorDiv(col(ptCol), binWidth).cast("long"))
  }

  /** Intervals replicated to every bin they span — the storable right
    * side of [[joinBinned]].
    */
  def binIntervals(intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive; got $binWidth")
    intervals.withColumn("__bin",
      explode(binSeq(col(startCol), col(endCol), binWidth)))
  }

  /** The join stage over pre-binned sides (from [[binPoints]] /
    * [[binIntervals]], inline or read back from bucketed storage):
    * equi-join on `__bin`, exact containment re-check, bin key
    * dropped.
    */
  def joinBinned(binnedPoints: DataFrame, ptCol: String,
      binnedIntervals: DataFrame, startCol: String, endCol: String): DataFrame =
    binnedPoints.join(binnedIntervals, Seq("__bin"))
      .where(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__bin")

  /** Each point row joined to every interval row whose
    * `[startCol, endCol]` (inclusive) contains `ptCol`. All columns of
    * both inputs survive; the two inputs must not share column names.
    * Point, start, and end columns must be integral (epoch micros,
    * epoch days, any long domain).
    */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame =
    joinBinned(binPoints(points, ptCol, binWidth), ptCol,
      binIntervals(intervals, startCol, endCol, binWidth), startCol, endCol)

  /** Every (left, right) pair whose closed intervals overlap
    * (`lStart <= rEnd && rStart <= lEnd`), each pair emitted EXACTLY
    * once: both sides replicate to their bin ranges, and a pair is
    * claimed only in the first bin the two intervals share —
    * `max(bin(lStart), bin(rStart))` — which the overlap predicate
    * guarantees lies within both bin ranges. No dedup shuffle needed.
    */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive; got $binWidth")
    val l = left.withColumn("__bin",
      explode(binSeq(col(lStart), col(lEnd), binWidth)))
    val r = right.withColumn("__bin",
      explode(binSeq(col(rStart), col(rEnd), binWidth)))
    l.join(r, Seq("__bin"))
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__bin") === greatest(
          floorDiv(col(lStart), binWidth).cast("long"),
          floorDiv(col(rStart), binWidth).cast("long")))
      .drop("__bin")
  }
}
