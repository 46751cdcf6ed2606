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
      "SELECT o_orderkey, CAST(o_orderstatus = 'F' AS BIGINT) AS deal_label FROM orders"
  )
}
