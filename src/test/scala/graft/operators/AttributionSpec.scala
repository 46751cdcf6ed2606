package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AttributionSpec extends SparkSpec {

  // user 1: view(t=100), click(t=200), view(t=300), purchase(t=400)
  // user 2: click(t=50) ... purchase(t=10_000_050) — outside 1s lookback
  // user 3: purchase with no touches at all
  private def events = {
    import spark.implicits._
    Seq(
      (1L, 1L, 100L, "view"), (2L, 1L, 200L, "click"),
      (3L, 1L, 300L, "view"), (4L, 1L, 400L, "purchase"),
      (5L, 2L, 50L, "click"), (6L, 2L, 10000050L, "purchase"),
      (7L, 3L, 999L, "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
  }

  private def credits(model: String) = Attribution.creditTouches(
    events, "user_id", "ts", "event_type", "event_id",
    touchTypes = Seq("view", "click"), convType = "purchase",
    model = model, lookbackUs = 1000000L)

  test("linear: integer ppm credits sum to exactly 1e6, remainder on last touch") {
    val rows = credits("linear").collect()
      .map(r => (r.getAs[Long]("touch_id"),
        r.getAs[Long]("touch_pos"), r.getAs[Long]("credit_ppm")))
    assert(rows.length == 3) // only user 1's conversion has touches in window
    val byId = rows.map(r => r._1 -> r._3).toMap
    assert(byId(1L) == 333333L && byId(2L) == 333333L && byId(3L) == 333334L)
    assert(rows.map(_._3).sum == 1000000L)
  }

  test("first/last touch: full credit to one end, zero elsewhere") {
    val first = credits("first_touch").collect()
      .map(r => r.getAs[Long]("touch_id") -> r.getAs[Long]("credit_ppm")).toMap
    assert(first == Map(1L -> 1000000L, 2L -> 0L, 3L -> 0L))
    val last = credits("last_touch").collect()
      .map(r => r.getAs[Long]("touch_id") -> r.getAs[Long]("credit_ppm")).toMap
    assert(last == Map(1L -> 0L, 2L -> 0L, 3L -> 1000000L))
  }

  test("lookback bounds the pairing; touch-less conversions emit nothing") {
    val users = credits("linear").select("user").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(users == Set(1L)) // user 2's touch aged out, user 3 had none
    // widen the lookback: user 2's click now earns credit
    val wide = Attribution.creditTouches(events, "user_id", "ts",
      "event_type", "event_id", Seq("view", "click"), "purchase",
      "linear", lookbackUs = 20000000L)
    assert(wide.where(col("user") === 2L).count() == 1)
  }

  test("channelCredit rolls up ppm by touch type") {
    val ch = Attribution.channelCredit(credits("linear"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_conversions_touched"), r.getAs[Long]("credit_ppm_total"))).toMap
    assert(ch("view") == (1L, 666667L))  // positions 1 and 3
    assert(ch("click") == (1L, 333333L))
  }
}
