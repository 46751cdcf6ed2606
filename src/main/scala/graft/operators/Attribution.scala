package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch conversion attribution over an event stream: each
  * conversion event distributes credit across the same user's
  * preceding touch events inside a bounded lookback window, under the
  * standard position models (first-touch, last-touch, linear).
  *
  * Scale shape: the touch×conversion pairing is a per-user equi-join
  * with a RANGE predicate bounded by `lookbackUs` — bounded state per
  * conversion, the same discipline as the streaming joins (an
  * unbounded "all history" pairing would make hot users quadratic;
  * the lookback is the business rule AND the bound). One join + one
  * per-conversion window pass; credits are exact integer ppm
  * (parts-per-million) with the division remainder assigned to the
  * LAST touch, so every conversion's credits sum to exactly 1 000 000
  * on any engine, partitioning, or retry — no float credit drift.
  */
object Attribution {

  /** Assign per-touch credit for every conversion.
    *
    * @param events      (userCol, tsCol µs-comparable, typeCol, idCol)
    * @param touchTypes  event types that can earn credit
    * @param convType    the conversion event type
    * @param model       "first_touch" | "last_touch" | "linear"
    * @param lookbackUs  max age of a credited touch, µs (inclusive)
    * @return one row per (conversion, touch) pair:
    *         (user, conv_id, conv_ts, touch_id, touch_type, touch_pos,
    *         n_touches, credit_ppm)
    */
  def creditTouches(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String, touchTypes: Seq[String],
      convType: String, model: String, lookbackUs: Long): DataFrame = {
    require(Seq("first_touch", "last_touch", "linear").contains(model),
      s"unknown model '$model'")
    require(lookbackUs > 0, s"lookbackUs must be > 0; got $lookbackUs")
    val touches = events.where(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("user"), col(idCol).as("touch_id"),
        col(tsCol).as("touch_ts"), col(typeCol).as("touch_type"))
    val convs = events.where(col(typeCol) === convType)
      .select(col(userCol).as("user"), col(idCol).as("conv_id"),
        col(tsCol).as("conv_ts"))
    val paired = convs.join(touches, Seq("user"))
      .where(col("touch_ts") < col("conv_ts") &&
        col("touch_ts") >= col("conv_ts") - lit(lookbackUs))
    val byConv = Window.partitionBy(col("user"), col("conv_id"))
    // deterministic touch order: ts, then id tiebreak
    val pos = row_number().over(byConv.orderBy(col("touch_ts"), col("touch_id")))
    val withPos = paired
      .withColumn("touch_pos", pos.cast("long"))
      .withColumn("n_touches", count(lit(1)).over(byConv))
    val ppm = lit(1000000L)
    val credit = model match {
      case "first_touch" =>
        when(col("touch_pos") === 1, ppm).otherwise(lit(0L))
      case "last_touch" =>
        when(col("touch_pos") === col("n_touches"), ppm).otherwise(lit(0L))
      case "linear" =>
        // integer split; the floor-division remainder goes to the LAST
        // touch so each conversion's credits sum to exactly 1e6.
        // Double division is exact here (both operands < 2^53), so
        // floor() is true integer division on any engine.
        val share = floor(ppm / col("n_touches"))
        when(col("touch_pos") === col("n_touches"),
          ppm - share * (col("n_touches") - 1)).otherwise(share)
    }
    withPos.select(col("user"), col("conv_id"), col("conv_ts"),
      col("touch_id"), col("touch_type"), col("touch_pos"),
      col("n_touches"), credit.cast("long").as("credit_ppm"))
  }

  /** Channel-level rollup of [[creditTouches]]: total credited
    * conversions (ppm) per touch type — the report the model feeds.
    */
  def channelCredit(credits: DataFrame): DataFrame =
    credits.groupBy(col("touch_type"))
      .agg(countDistinct(col("user"), col("conv_id")).as("n_conversions_touched"),
        sum(col("credit_ppm")).as("credit_ppm_total"))
}
