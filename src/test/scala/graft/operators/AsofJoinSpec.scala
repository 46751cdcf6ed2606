package graft.operators

import org.apache.spark.sql.execution.window.WindowExec
import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {

  private def frames = {
    import spark.implicits._
    // trades(key, t) pick up the latest quote with q.t <= trade.t
    val trades = Seq(
      (1L, "A", 10L), (2L, "A", 20L), (3L, "A", 5L),
      (4L, "B", 100L), (5L, "B", 15L)
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", 8L, 1.0), ("A", 10L, 2.0), ("A", 19L, 3.0),
      ("B", 50L, 4.0)
    ).toDF("sym", "t", "px")
    (trades, quotes)
  }

  test("latest right row at-or-before each left row; unmatched stay null") {
    val (trades, quotes) = frames
    val out = AsofJoin.asofJoin(trades, quotes, "sym", "t", Seq("px"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(1L) == Some(2.0)) // exact-time quote (t=10) matches: ≤
    assert(out(2L) == Some(3.0)) // latest of 8/10/19
    assert(out(3L) == None)      // t=5 precedes all A quotes
    assert(out(4L) == Some(4.0))
    assert(out(5L) == None)      // B trade at 15 precedes quote at 50
  }

  test("plans one key-partitioned window, never partitionless") {
    val (trades, quotes) = frames
    val out = AsofJoin.asofJoin(trades, quotes, "sym", "t", Seq("px"))
    val windows = out.queryExecution.sparkPlan.collectWithSubqueries {
      case w: WindowExec => w
    }
    assert(windows.nonEmpty)
    assert(windows.forall(_.partitionSpec.nonEmpty),
      out.queryExecution.sparkPlan.toString)
  }
}
