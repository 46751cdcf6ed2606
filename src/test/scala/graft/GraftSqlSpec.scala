package graft

/** The view-producing SQL facade ([[GraftSql]]): the oracle-gated
  * `sql_*` rows prove each wrapper end-to-end against DuckDB; this spec
  * covers the wrapper-LOCAL logic those rows can't vary — the generic
  * N-stage funnel's strict-order semantics, quantile reads through the
  * facade ≡ the operator called directly, and that registration is
  * lazy (a view, not a materialization).
  */
class GraftSqlSpec extends SparkSpec {

  private def funnelRows(rows: Seq[(Long, String, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("user_id", "event_type", "ts")
      .createOrReplaceTempView("gs_events")
  }

  test("registerFunnel: strict order — equal timestamps do NOT advance") {
    funnelRows(Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "buy", 30L), // full
      (2L, "view", 10L), (2L, "click", 10L),                   // tie: stops
      (3L, "click", 5L), (3L, "view", 10L),                    // reversed
      (4L, "view", 10L)))                                      // stage 1 only
    GraftSql.registerFunnel(spark, "gs_events", "user_id", "event_type",
      "ts", Seq("view", "click", "buy"), "gs_funnel")
    val r = spark.table("gs_funnel").head()
    assert(r.getLong(r.fieldIndex("n_users")) == 4L)
    assert(r.getLong(r.fieldIndex("n_reach_1")) == 4L) // all saw a view
    assert(r.getLong(r.fieldIndex("n_reach_2")) == 1L) // only user 1
    assert(r.getLong(r.fieldIndex("n_reach_3")) == 1L)
  }

  test("registerFunnel: first occurrence per stage is what orders") {
    // user clicks BEFORE their first view and again after — the FIRST
    // click (t=5) precedes the first view (t=10), so stage 2 is NOT
    // reached even though a later click exists
    funnelRows(Seq(
      (1L, "click", 5L), (1L, "view", 10L), (1L, "click", 50L)))
    GraftSql.registerFunnel(spark, "gs_events", "user_id", "event_type",
      "ts", Seq("view", "click"), "gs_funnel")
    val r = spark.table("gs_funnel").head()
    assert(r.getLong(r.fieldIndex("n_reach_1")) == 1L)
    assert(r.getLong(r.fieldIndex("n_reach_2")) == 0L)
  }

  test("registerFunnel: a single stage degenerates to presence counting") {
    funnelRows(Seq((1L, "view", 1L), (2L, "other", 1L)))
    GraftSql.registerFunnel(spark, "gs_events", "user_id", "event_type",
      "ts", Seq("view"), "gs_funnel")
    val r = spark.table("gs_funnel").head()
    assert(r.getLong(r.fieldIndex("n_users")) == 2L)
    assert(r.getLong(r.fieldIndex("n_reach_1")) == 1L)
  }

  test("registerQuantiles ≡ QuantileSketch called directly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = (1L to 500L).map(i => (s"g${i % 3}", i, (i * 37 % 101).toDouble))
    rows.toDF("grp", "id", "v").createOrReplaceTempView("gs_rows")
    GraftSql.registerQuantiles(spark, "gs_rows", Seq("grp"), "v", "id",
      k = 32, qPpms = Seq(500000L, 900000L), outView = "gs_q")
    val direct = graft.operators.QuantileSketch.quantiles(
      graft.operators.QuantileSketch.sketch(
        spark.table("gs_rows"), Seq("grp"), "v", "id", 32),
      Seq("grp"), Seq(500000L, 900000L))
    val a = spark.table("gs_q").orderBy(col("grp"), col("q_ppm")).collect()
    val b = direct.orderBy(col("grp"), col("q_ppm")).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("registerAttribution: linear credits sum to exactly 1e6 per conversion") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 3 touches → 333333 + 333333 + 333334 (remainder on the LAST touch)
    Seq(
      (1L, 1L, 10L, "view"), (2L, 1L, 20L, "click"), (3L, 1L, 30L, "view"),
      (4L, 1L, 40L, "buy"),
      (5L, 2L, 10L, "view"), (6L, 2L, 20L, "buy"))
      .toDF("event_id", "user_id", "ts_us", "event_type")
      .createOrReplaceTempView("gs_attr")
    GraftSql.registerAttribution(spark, "gs_attr", "user_id", "ts_us",
      "event_type", "event_id", touchTypes = Seq("view", "click"),
      convType = "buy", model = "linear", lookbackUs = 1000L,
      outView = "gs_credit")
    val total = spark.table("gs_credit")
      .agg(org.apache.spark.sql.functions.sum(col("credit_ppm_total")))
      .head().getLong(0)
    assert(total == 2000000L, s"2 conversions must credit exactly 2e6, got $total")
    val byType = spark.table("gs_credit").collect()
      .map(r => r.getString(0) -> r.getLong(r.fieldIndex("credit_ppm_total")))
      .toMap
    // user 1: view 333333 + 333334(last) ; user 2: view 1000000
    assert(byType("view") == 333333L + 333334L + 1000000L)
    assert(byType("click") == 333333L)
  }

  test("registerAttribution: lookback boundary — conv-time touch excluded, edge included") {
    import spark.implicits._
    Seq(
      (1L, 1L, 100L, "view"),  // exactly conv_ts - lookback: INCLUDED (>=)
      (2L, 1L, 200L, "view"),  // exactly conv_ts: EXCLUDED (strict <)
      (3L, 1L, 200L, "buy"))
      .toDF("event_id", "user_id", "ts_us", "event_type")
      .createOrReplaceTempView("gs_attr")
    GraftSql.registerAttribution(spark, "gs_attr", "user_id", "ts_us",
      "event_type", "event_id", touchTypes = Seq("view"), convType = "buy",
      model = "linear", lookbackUs = 100L, outView = "gs_credit")
    val rows = spark.table("gs_credit").collect()
    assert(rows.length == 1 &&
      rows.head.getLong(rows.head.fieldIndex("credit_ppm_total")) == 1000000L)
  }

  test("registerSessionize: a gap EQUAL to gapUs keeps the session open") {
    import spark.implicits._
    Seq((1L, 0L, 1.0), (1L, 100L, 1.0),   // gap == 100 → same session
        (1L, 201L, 1.0))                   // gap 101 > 100 → new session
      .toDF("user_id", "ts_us", "value")
      .createOrReplaceTempView("gs_sess_events")
    GraftSql.registerSessionize(spark, "gs_sess_events", gapUs = 100L,
      outView = "gs_sessions")
    val sess = spark.table("gs_sessions").collect()
    assert(sess.length == 2, s"expected 2 sessions, got ${sess.length}")
    val n = sess.map(r => r.getLong(r.fieldIndex("n_events"))).sorted.toSeq
    assert(n == Seq(1L, 2L))
  }

  test("registerHistogram: a constant column lands every row in bucket 0") {
    import spark.implicits._
    (1 to 50).map(i => (7.0, i.toDouble)).toDF("c_const", "c_var")
      .createOrReplaceTempView("gs_hist_rows")
    GraftSql.registerHistogram(spark, "gs_hist_rows",
      Seq("c_const", "c_var"), bins = 10, outView = "gs_hist")
    val rows = spark.table("gs_hist")
      .where(org.apache.spark.sql.functions.col("col_name") === "c_const")
      .collect()
    assert(rows.length == 1 && rows.head.getLong(1) == 0L &&
      rows.head.getLong(2) == 50L)
  }

  test("registerAbsorption: a 2-state chain reaches the hand-computed probability") {
    import spark.implicits._
    // a → buy (3), a → a (1): P(absorb within k) = 1 − 0.25^k; at
    // iters=2 → 0.9375 exactly → 937500 ppm
    Seq(("a", "buy", 3L), ("a", "a", 1L))
      .toDF("src", "dst", "n").createOrReplaceTempView("gs_trans")
    GraftSql.registerAbsorption(spark, "gs_trans", "src", "dst", "n",
      absorbing = "buy", iters = 2, outView = "gs_absorb")
    val p = spark.table("gs_absorb").collect()
      .map(r => r.getString(0) -> r.getLong(r.fieldIndex("p_ppm"))).toMap
    assert(p("buy") == 1000000L)
    assert(p("a") == 937500L, s"expected 937500 ppm, got ${p("a")}")
  }

  test("registerCuped fails loudly on a stray arm value") {
    import spark.implicits._
    Seq(("A", 10L, 1L), ("B", 20L, 2L), ("C", 30L, 3L))
      .toDF("arm", "y", "x").createOrReplaceTempView("gs_units")
    GraftSql.registerCuped(spark, "gs_units", "arm", "y", "x",
      armA = "A", armB = "B", outView = "gs_cuped")
    val e = intercept[Exception] { spark.table("gs_cuped").collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("other arm values")), e.getMessage)
  }

  test("registerWeightedSample: zero-weight rows never sampled; n > rows keeps all") {
    import spark.implicits._
    Seq((1L, 5L), (2L, 0L), (3L, 2L)).toDF("id", "w")
      .createOrReplaceTempView("gs_wrows")
    GraftSql.registerWeightedSample(spark, "gs_wrows", "id", "w", n = 10,
      outView = "gs_ws")
    val ids = spark.table("gs_ws").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 3L))
  }

  test("registration is lazy: the wrapper captures a logical plan") {
    import spark.implicits._
    Seq((1L, "t", 1L)).toDF("user_id", "event_type", "ts")
      .createOrReplaceTempView("gs_events")
    // a view over a one-row frame must register without running a job
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    GraftSql.registerFunnel(spark, "gs_events", "user_id", "event_type",
      "ts", Seq("t"), "gs_lazy")
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "registerFunnel must not execute eagerly")
  }
}
