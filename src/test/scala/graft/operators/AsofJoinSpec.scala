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

  test("nearest: closest side wins, ties resolve backward, tolerance per side") {
    val (trades, quotes) = frames
    val near = AsofJoin.asofJoin(trades, quotes, "sym", "t", Seq("px"),
        direction = "nearest")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(near(1L) == Some(2.0)) // Δ=0 beats the quote 1 away
    assert(near(2L) == Some(3.0)) // only backward exists (19)
    assert(near(3L) == Some(1.0)) // only forward exists (8)
    assert(near(4L) == Some(4.0))
    assert(near(5L) == Some(4.0))
    // equidistant: trade A t=9 sits exactly between quotes 8 and 10 →
    // the BACKWARD candidate (px 1.0) must win deterministically
    import spark.implicits._
    val mid = AsofJoin.asofJoin(Seq((9L, "A", 9L)).toDF("trade_id", "sym", "t"),
      quotes, "sym", "t", Seq("px"), direction = "nearest").head()
    assert(mid.getDouble(3) == 1.0)
    // tolerance gates per side BEFORE the pick: trade B t=15 is 35 from
    // the only quote → null at tol 10, matched at tol 40
    val tol = AsofJoin.asofJoin(trades, quotes, "sym", "t", Seq("px"),
        direction = "nearest", tolerance = Some(10L))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(tol(5L) == None && tol(1L) == Some(2.0))
    // out of range on the only side: trade A t=30 has backward 19
    // (Δ=11) and no forward → null at tol 10
    val t30 = AsofJoin.asofJoin(Seq((9L, "A", 30L)).toDF("trade_id", "sym", "t"),
      quotes, "sym", "t", Seq("px"), direction = "nearest",
      tolerance = Some(10L)).head()
    assert(t30.isNullAt(3))
    // near side gated out, far side in range: trade A t=18 at tol 1
    // has backward 10 (Δ=8, out) but forward 19 (Δ=1, in) → matches
    val t18 = AsofJoin.asofJoin(Seq((9L, "A", 18L)).toDF("trade_id", "sym", "t"),
      quotes, "sym", "t", Seq("px"), direction = "nearest",
      tolerance = Some(1L)).head()
    assert(t18.getDouble(3) == 3.0)
  }

  test("nearest ≡ brute-force argmin by (|Δt|, side) on random data") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(13)
    val lefts = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(8)}", rnd.nextInt(1000).toLong))
      .toDF("lid", "k", "t")
    // right timestamps UNIQUE per key (7·Δi ≢ 0 mod 997 within a
    // residue class): duplicate (k, t) rights would make the brute
    // argmin and the window's struct-order tie-break diverge on v
    val rights = (1 to 200).map(i =>
      (s"k${i % 10}", (i * 7L) % 997L, i.toDouble))
      .toDF("k", "t", "v")
    val got = AsofJoin.asofJoin(lefts, rights, "k", "t", Seq("v"),
        direction = "nearest")
      .select(col("lid"), col("v_asof"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // brute force: per left, min (|Δt|, after-bit, right-struct) —
    // backward wins distance ties, equal-time equals backward
    val brute = lefts.as("l").join(rights.as("r"),
        col("l.k") === col("r.k"), "left")
      .groupBy(col("lid"))
      .agg(min(struct(abs(col("r.t") - col("l.t")).as("d"),
        when(col("r.t") > col("l.t"), 1).otherwise(0).as("side"),
        col("r.t"), col("v"))).as("m"))
      .select(col("lid"), col("m.v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == brute)
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
