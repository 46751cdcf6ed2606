package graft.metrics

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass competition score (SURVEY.md §7 optional custom): a typed
  * `Aggregator[(target, pred), Buf, Double]` accumulating Σape, the
  * ape ≤ τ count and n in a single buffer, so
  * 0.2·(1−MAPE) + 0.8·P(ape ≤ τ) needs ONE partial+final aggregation
  * instead of two avg() trees. APE keeps the reference's
  * prediction-denominator (quirk X4, reference evaluate.py:19).
  *
  * Usage: `df.select(CompetitionScoreAggregator.column(threshold))` on a
  * Dataset[(Double, Double)]-shaped frame, or `.as[(Double, Double)]`
  * then `ds.select(agg.toColumn)`.
  */
object CompetitionScoreAggregator {

  final case class Buf(var apeSum: Double, var hits: Long, var n: Long)

  final class Agg(threshold: Double) extends Aggregator[(Double, Double), Buf, Double] {
    override def zero: Buf = Buf(0.0, 0L, 0L)
    override def reduce(b: Buf, row: (Double, Double)): Buf = {
      val (target, pred) = row
      // pred == 0 → skip the row entirely (don't count it into n), matching
      // Scores.ape's try_divide-null + avg-skips-null semantics.
      if (pred != 0.0) {
        val ape = math.abs(target - pred) / pred
        b.apeSum += ape
        if (ape <= threshold) b.hits += 1
        b.n += 1
      }
      b
    }
    override def merge(a: Buf, b: Buf): Buf = {
      a.apeSum += b.apeSum; a.hits += b.hits; a.n += b.n; a
    }
    override def finish(b: Buf): Double =
      if (b.n == 0) 0.0
      else 0.2 * (1.0 - b.apeSum / b.n) + 0.8 * (b.hits.toDouble / b.n)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def column(threshold: Double = 0.05): TypedColumn[(Double, Double), Double] =
    new Agg(threshold).toColumn.name("score")
}
