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
