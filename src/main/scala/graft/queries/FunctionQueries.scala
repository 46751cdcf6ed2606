package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scalar-function queries — SURVEY.md §2.8 (F1-F7). All pure column
  * expressions inside whole-stage codegen; no UDFs anywhere.
  */
object FunctionQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1 — "L*W*H" dimension-string parse → derived geometry features
    // (data.py:92-102). The dimension string is synthesized from lineitem
    // keys, then parsed back — both sides of the oracle do the same. The
    // ×4 surface-area formula is the reference's own (non-physical) one,
    // preserved deliberately.
    "f1_dimparse" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        concat_ws("*", col("l_suppkey"), col("l_partkey"), col("l_linenumber")).as("dims"))
      val p = split(col("dims"), "\\*")
      l.select(
        col("l_orderkey"), col("l_linenumber"),
        try_element_at(p, lit(1)).cast("long").as("len"),
        try_element_at(p, lit(2)).cast("long").as("width"),
        try_element_at(p, lit(3)).cast("long").as("height"))
        .withColumn("volume", col("len") * col("width") * col("height"))
        .withColumn("perimeter", lit(4) * (col("len") + col("width") + col("height")))
        .withColumn("surface", lit(4) * (col("len") * col("width")
          + col("len") * col("height") + col("width") * col("height")))
    }),

    // F2 — embedded-JSON value extraction with fallback (utils.py:292-309):
    // the adjusted price if present, else the push price. events.props plays
    // the JSON column; `value` the fallback.
    "f2_jsonmap" -> ((s, dir) => {
      Tables.events(s, dir).select(
        col("event_id"),
        coalesce(get_json_object(col("props"), "$.k").cast("double"), col("value"))
          .as("final_value"))
    }),

    // F3 — date → (year−2000, month−1, day−1) embedding indices
    // (data.py:35-37).
    "f3_datecomp" -> ((s, dir) => {
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        (year(col("l_shipdate")) - 2000).cast("long").as("y_idx"),
        (month(col("l_shipdate")) - 1).cast("long").as("m_idx"),
        (dayofmonth(col("l_shipdate")) - 1).cast("long").as("d_idx"))
    }),

    // F4 — YYYYMM integer → first-of-month date (data.py:18,246).
    "f4_yyyymm" -> ((s, dir) => {
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).cast("long").as("ym"))
        .withColumn("month_start", to_date(col("ym").cast("string"), "yyyyMM"))
    }),

    // F5 — date difference in days (utils.py:226-231 — dead code there,
    // implemented live here): ship lag of each line vs its order date.
    "f5_datediff" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("ship_lag_days"))
    }),

    // F6 — "col:value" vocabulary-key canonicalization (utils.py:167,173):
    // numeric columns are stringified integrally, exactly like the loader
    // keeps discrete columns integral.
    "f6_canon" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      c.select(concat(lit("c_mktsegment:"), col("c_mktsegment")).as("key"))
        .union(c.select(concat(lit("c_nationkey:"), col("c_nationkey").cast("string"))))
        .distinct()
    }),

    // F7 — 0/1 label from a null test (utils.py:245).
    "f7_label" -> ((s, dir) => {
      Tables.orders(s, dir).select(
        col("o_orderkey"),
        when(col("o_orderstatus") === "F", col("o_orderdate")).isNotNull
          .cast("long").as("deal_label"))
    }),

    // The first.py INFERENCE SLICE end-to-end as one gated query
    // (reference first.py:21-128 dataflow, evaluate.py:69-95 submission
    // shape): repair (P5 sentinel→null→fill) → F1 dims parse →
    // F3 date components → A2 z-normalize → a DETERMINISTIC linear
    // scorer standing in for the learned head (literal weights over
    // 6dp-snapped z-features — the MLlib fit itself is lib-tested in
    // LifecyclesSpec; a float model trajectory can never hash-gate) →
    // A4 denormalize with the SAME label stats → (carid, price)
    // submission rows. One scan + one broadcast stats row; every stage
    // is the already-gated component's exact math, composed.
    "first_submission" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      // one row per carid (the synthetic lineitem re-uses (orderkey,
      // linenumber) pairs) — deterministic min-aggregation picks the
      // canonical attributes, the submission contract is one price per
      // car (evaluate.py:69-95 keys the score on carid)
      val cars = li
        .groupBy((col("l_orderkey") * 10 + col("l_linenumber")).as("carid"))
        .agg(min(col("l_suppkey")).as("__s"), min(col("l_partkey")).as("__p"),
          min(col("l_linenumber")).as("__ln"),
          min(col("l_shipdate")).as("tradeTime"),
          min(col("l_quantity")).as("__q"),
          min(col("l_extendedprice")).as("price"))
        .select(col("carid"),
          concat_ws("*", col("__s"), col("__p"), col("__ln")).as("dims"),
          col("tradeTime"),
          // P5 repair on the quantity: the max-domain value plays the
          // sentinel (X6-as-coded: sentinel → null → fill 0)
          coalesce(when(col("__q") >= 50.0, lit(null))
            .otherwise(col("__q")), lit(0.0)).as("qty_r"),
          col("price"))
      val p = split(col("dims"), "\\*")
      val feat = cars.select(col("carid"), col("qty_r"), col("price"),
        (try_element_at(p, lit(1)).cast("long")
          * try_element_at(p, lit(2)).cast("long")
          * try_element_at(p, lit(3)).cast("long")).cast("double").as("volume"),
        year(col("tradeTime")).cast("double").as("trade_year"),
        month(col("tradeTime")).cast("double").as("trade_month"))
      val stats = feat.agg(
        avg(col("volume")).as("m_v"), stddev_samp(col("volume")).as("s_v"),
        avg(col("trade_year")).as("m_y"), stddev_samp(col("trade_year")).as("s_y"),
        avg(col("trade_month")).as("m_m"), stddev_samp(col("trade_month")).as("s_m"),
        avg(col("qty_r")).as("m_q"), stddev_samp(col("qty_r")).as("s_q"),
        avg(col("price")).as("m_p"), stddev_samp(col("price")).as("s_p"))
      def z(x: String, m: String, s: String) =
        round((col(x) - col(m)) / col(s), 6)
      feat.crossJoin(broadcast(stats))
        .select(col("carid"),
          round((z("volume", "m_v", "s_v") * 0.3
            + z("trade_year", "m_y", "s_y") * 0.2
            + z("trade_month", "m_m", "s_m") * 0.1
            + z("qty_r", "m_q", "s_q") * 0.4) * col("s_p") + col("m_p"), 4)
            .as("price"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "f1_dimparse" ->
      """WITH d AS (SELECT l_orderkey, l_linenumber,
             concat(CAST(l_suppkey AS VARCHAR), '*', CAST(l_partkey AS VARCHAR), '*',
                    CAST(l_linenumber AS VARCHAR)) AS dims FROM lineitem),
         p AS (SELECT l_orderkey, l_linenumber,
             CAST(string_split(dims, '*')[1] AS BIGINT) AS len,
             CAST(string_split(dims, '*')[2] AS BIGINT) AS width,
             CAST(string_split(dims, '*')[3] AS BIGINT) AS height FROM d)
         SELECT l_orderkey, l_linenumber, len, width, height,
                len*width*height AS volume,
                4*(len+width+height) AS perimeter,
                4*(len*width + len*height + width*height) AS surface FROM p""",
    "f2_jsonmap" ->
      """SELECT event_id,
           coalesce(CAST(json_extract_string(props, '$.k') AS DOUBLE), value) AS final_value
         FROM events""",
    "f3_datecomp" ->
      """SELECT l_orderkey, l_linenumber,
           CAST(year(l_shipdate) - 2000 AS BIGINT) AS y_idx,
           CAST(month(l_shipdate) - 1 AS BIGINT) AS m_idx,
           CAST(day(l_shipdate) - 1 AS BIGINT) AS d_idx
         FROM lineitem""",
    "f4_yyyymm" ->
      """SELECT o_orderkey,
           CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
           CAST(strptime(CAST(CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS VARCHAR), '%Y%m') AS DATE) AS month_start
         FROM orders""",
    "f5_datediff" ->
      """SELECT l_orderkey, l_linenumber,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_lag_days
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",
    "f6_canon" ->
      """SELECT DISTINCT key FROM (
           SELECT concat('c_mktsegment:', c_mktsegment) AS key FROM customer
           UNION ALL SELECT concat('c_nationkey:', CAST(c_nationkey AS VARCHAR)) FROM customer)""",
    "f7_label" ->
      "SELECT o_orderkey, CAST(o_orderstatus = 'F' AS BIGINT) AS deal_label FROM orders",
    "first_submission" ->
      """WITH c0 AS (SELECT l_orderkey * 10 + l_linenumber AS carid,
             min(l_suppkey) AS s, min(l_partkey) AS p,
             min(l_linenumber) AS ln, min(l_shipdate) AS ship,
             min(l_quantity) AS q, min(l_extendedprice) AS price
           FROM lineitem GROUP BY 1),
         cars AS (SELECT carid,
             CAST(s AS DOUBLE) * p * ln AS volume,
             CAST(EXTRACT(year FROM ship) AS DOUBLE) AS trade_year,
             CAST(EXTRACT(month FROM ship) AS DOUBLE) AS trade_month,
             coalesce(CASE WHEN q >= 50.0 THEN NULL ELSE q END, 0.0) AS qty_r,
             price
           FROM c0),
         st AS (SELECT avg(volume) AS m_v, stddev_samp(volume) AS s_v,
                  avg(trade_year) AS m_y, stddev_samp(trade_year) AS s_y,
                  avg(trade_month) AS m_m, stddev_samp(trade_month) AS s_m,
                  avg(qty_r) AS m_q, stddev_samp(qty_r) AS s_q,
                  avg(price) AS m_p, stddev_samp(price) AS s_p
                FROM cars)
         SELECT carid,
           round((round((volume - m_v) / s_v, 6) * 0.3
             + round((trade_year - m_y) / s_y, 6) * 0.2
             + round((trade_month - m_m) / s_m, 6) * 0.1
             + round((qty_r - m_q) / s_q, 6) * 0.4) * s_p + m_p, 4) AS price
         FROM cars CROSS JOIN st"""
  )
}
