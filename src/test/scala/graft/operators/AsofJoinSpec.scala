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

  test("forward direction: earliest right at-or-after; tolerance nulls distant matches") {
    val (trades, quotes) = frames
    val fwd = AsofJoin.asofJoin(trades, quotes, "sym", "t", Seq("px"),
        direction = "forward")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(fwd(1L) == Some(2.0)) // exact-time quote (t=10) matches: ≥
    assert(fwd(2L) == None)      // nothing after t=20 for A
    assert(fwd(3L) == Some(1.0)) // earliest of 8/10/19
    assert(fwd(4L) == None)      // B trade at 100 follows the only quote
    assert(fwd(5L) == Some(4.0)) // next B quote at 50
    // tolerance 10: trade 3 (t=5) still reaches quote at 8; trade 5
    // (t=15) no longer reaches the quote at 50
    val tol = AsofJoin.asofJoin(trades, quotes, "sym", "t", Seq("px"),
        direction = "forward", tolerance = Some(10L))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(tol(3L) == Some(1.0))
    assert(tol(5L) == None)
    assert(tol(1L) == Some(2.0)) // zero-distance match survives any tolerance
    // backward with tolerance: trade 2 (t=20) keeps quote at 19, trade
    // 4 (t=100) loses the quote at 50
    val btol = AsofJoin.asofJoin(trades, quotes, "sym", "t", Seq("px"),
        tolerance = Some(10L))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(btol(2L) == Some(3.0))
    assert(btol(4L) == None)
  }

  test("forward ≡ brute-force θ-join + per-left argmin on random data") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val lefts = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(8)}", rnd.nextInt(1000).toLong))
      .toDF("lid", "k", "t")
    val rights = (1 to 200).map(i =>
      (s"k${rnd.nextInt(10)}", rnd.nextInt(1000).toLong, i.toDouble))
      .toDF("k", "t", "v")
    val got = AsofJoin.asofJoin(lefts, rights, "k", "t", Seq("v"),
        direction = "forward")
      .select(col("lid"), col("v_asof"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val brute = lefts.as("l").join(rights.as("r"),
        col("l.k") === col("r.k") && col("r.t") >= col("l.t"), "left")
      .groupBy(col("lid"))
      .agg(min(struct(col("r.t"), col("v"))).as("m"))
      .select(col("lid"), col("m.v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == brute)
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
