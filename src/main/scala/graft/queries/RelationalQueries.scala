package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scan / projection / filter / join / set-op queries covering SURVEY.md §2.1-2.3,
  * §2.7 over the driver TESTDATA tables.
  *
  * Conventions shared by every query in this package (driver hash-compare):
  *  - computed integers are cast to long (BIGINT in the oracle SQL);
  *  - computed floating-point values are rounded to 4 decimals on both sides;
  *  - raw columns pass through bit-exact from parquet.
  */
object RelationalQueries {

  /** The canonical xy2d Hilbert rounds as CTE stages over a source CTE
    * `q` exposing (passCols..., x, y, d) — shared by the hilbert_key
    * and layout_audit oracles. One stage per round, top bit down:
    * rx/ry from bit `sh`, d += s²·((3rx) XOR ry), then the frame
    * rotation (reflect iff rx=1, swap) applied iff ry=0.
    */
  private def hilbertStages(passCols: String): String =
    (7 to 0 by -1).zipWithIndex.map { case (sh, i) =>
      val prev = if (i == 0) "q" else s"st${sh + 1}"
      val s2 = (1L << sh) * (1L << sh)
      s"""st$sh AS (SELECT $passCols,
            CASE WHEN ((y >> $sh) & 1) = 0
                 THEN (CASE WHEN ((x >> $sh) & 1) = 1 THEN 255 - y ELSE y END)
                 ELSE x END AS x,
            CASE WHEN ((y >> $sh) & 1) = 0
                 THEN (CASE WHEN ((x >> $sh) & 1) = 1 THEN 255 - x ELSE x END)
                 ELSE y END AS y,
            d + $s2 * xor(3 * ((x >> $sh) & 1), (y >> $sh) & 1) AS d
          FROM $prev)"""
    }.mkString(",\n         ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1 — scan with projection + predicate pushdown (utils.py:30-49 analog:
    // schema-on-read scan; here the filter and 2-column ReadSchema reach the
    // parquet reader).
    "s1_scan" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") < to_timestamp(lit("1995-06-01")))
        .select(col("l_orderkey"), col("l_quantity"))
    }),

    // P2 — projection-by-drop (utils.py:239,251-254).
    "p2_drop" -> ((s, dir) => {
      Tables.orders(s, dir).drop("o_orderpriority", "o_totalprice")
    }),

    // P3 — derived column (utils.py:250,308; data.py:99-102).
    "p3_derive" -> ((s, dir) => {
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
    }),

    // P5 — sentinel null repair (utils.py:92-131). TESTDATA has no nulls, so
    // nulls are manufactured with nullif first, then repaired with na.fill —
    // the operator under test is the fill map.
    "p5_nullrepair" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "O", lit(null)).otherwise(col("o_orderstatus")).as("status_n"),
          when(col("o_totalprice") > 200000.0, lit(null)).otherwise(col("o_totalprice")).as("price_n"))
        .na.fill(Map("status_n" -> "-1", "price_n" -> 0.0))
    }),

    // P4 — column select by role list (data.py:9-11): the "continuous"
    // role columns of lineitem, driven by a config list not literals.
    "p4_role_select" -> ((s, dir) => {
      val continuousRoles = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      Tables.lineitem(s, dir)
        .select((Seq("l_orderkey", "l_linenumber") ++ continuousRoles).map(col): _*)
    }),

    // P6 — equality-predicate row filter (utils.py:244), standalone form.
    "p6_filter_eq" -> ((s, dir) => {
      Tables.customer(s, dir)
        .where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"))
    }),

    // P6/P7 — equality + null-test predicates (utils.py:244,275-276).
    "p7_filter_null" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "F", col("o_orderdate")).as("deal_date"))
        .where(col("deal_date").isNotNull)
        .select(col("o_orderkey"))
    }),

    // P8 — deterministic positional slice (utils.py:214-215): global sort + limit.
    "p8_slice" -> ((s, dir) => {
      Tables.orders(s, dir).orderBy(col("o_orderkey")).limit(100)
        .select(col("o_orderkey"), col("o_custkey"))
    }),

    // J1 — inner equi-join + derived binary label (utils.py:233-262): the
    // reference's 10^4-iteration nested-loop join as a broadcast-hash join.
    "j1_join_label" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = broadcast(Tables.customer(s, dir))
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .select(col("o_orderkey"), col("c_custkey"), col("c_mktsegment"),
          (col("o_orderstatus") === "F").cast("long").as("deal_label"))
    }),

    // J2 — join restricted to "sold" rows (utils.py:263-290).
    "j2_join_sold" -> ((s, dir) => {
      val o = Tables.orders(s, dir).where(col("o_orderstatus") === "F")
      val c = broadcast(Tables.customer(s, dir))
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .select(col("o_orderkey"), col("o_totalprice"), col("c_name"))
    }),

    // J4 — dictionary lookup as broadcast join against a small vocabulary
    // (data.py:21-23): nation is the vocab table.
    "j4_dict_lookup" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val n = broadcast(Tables.nation(s, dir))
      c.join(n, c("c_nationkey") === n("n_nationkey"), "inner")
        .select(col("c_custkey"), col("n_name"))
    }),

    // U1 — vertical union (utils.py:248,279).
    "u1_union" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      o.where(col("o_orderstatus") === "F").select(col("o_orderkey"))
        .unionByName(o.where(col("o_orderstatus") === "O").select(col("o_orderkey")))
    }),

    // U2 — set-union of value sets (utils.py:79).
    "u2_union_distinct" -> ((s, dir) => {
      Tables.lineitem(s, dir).select(col("l_returnflag").as("v"))
        .union(Tables.orders(s, dir).select(col("o_orderstatus").as("v")))
        .distinct()
    }),

    // U3 — exact dedup (utils.py:161-162 set-dedup): groupBy-min keeps a
    // deterministic representative, unlike dropDuplicates.
    "u3_dedup_exact" -> ((s, dir) => {
      // group by the 16-byte md5, not the text: shuffling multi-KB
      // string keys is the classic exact-dedup mistake at corpus scale
      // (identical output — the oracle groups by text)
      Tables.documents(s, dir)
        .groupBy(md5(col("text").cast("binary")).as("__fp"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_count"))
        .select(col("doc_id"), col("dup_count"))
    }),

    // U4 — set-difference as left-anti join (evaluate.py:133-136):
    // customers with no high-value order.
    "u4_anti_join" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).where(col("o_totalprice") > 150000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"))
    }),

    // P9 — pivot (long → wide) with EXPLICIT pivot values: no
    // distinct-collect against the driver, and the plan is one groupBy
    // with a conditional aggregate per value — the only pivot shape that
    // survives when the fact side is 100 TB (a values-discovering pivot
    // runs a distinct job first and caps at
    // spark.sql.pivotMaxValues anyway).
    "p9_pivot" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(sum(col("o_totalprice")) / lit(1e6), 4))
    }),

    // P10 — unpivot/melt (the inverse of P9): wide measure columns to
    // long (key, measure, value) rows — the reshape every per-column
    // statistics sweep starts from. Spark's native unpivot is a pure
    // Expand projection: one scan, zero shuffles, rows × measures out.
    "p10_unpivot" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "measure", "value")
    }),

    // J5 — non-equi range join against a derived band dimension: the
    // 10-row bands table broadcasts, so the fact side never shuffles
    // (BroadcastNestedLoopJoin). The same shape serves calendar /
    // interval dimension joins at scale; an equi-join rewrite
    // (precompute the band id arithmetically) is the next optimization
    // when the bands are uniform — kept non-equi here because that is
    // the operator under test.
    "j5_band_join" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val stats = o.agg(min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      val bands = s.range(10).select(col("id").as("band_id"))
        .crossJoin(broadcast(stats))
        .select(col("band_id"),
          (col("lo") + (col("hi") - col("lo")) * col("band_id") / lit(10.0)).as("b_lo"),
          (col("lo") + (col("hi") - col("lo")) * (col("band_id") + 1) / lit(10.0)).as("b_hi"))
      o.join(broadcast(bands),
          col("o_totalprice") >= col("b_lo") &&
            (col("o_totalprice") < col("b_hi") || col("band_id") === 9))
        .groupBy(col("band_id"))
        .agg(count(lit(1)).as("n_orders"),
          round(avg(col("o_totalprice")), 4).as("avg_price"))
    }),

    // R-extension — stratified sample: per-class Bernoulli fractions in
    // ONE pass. The gate is the same md5 uniform draw mixture_sample
    // uses (first 16 md5 bits of the row key < fraction·2¹⁶) instead of
    // `stat.sampleBy`'s seeded RNG: identical per-stratum Bernoulli
    // marginal, but reproducible across engines/retries/AQE re-plans and
    // auditable in plain SQL — which also upgrades the check from
    // rows-only to a full DuckDB oracle. Row key = orderkey·10 +
    // linenumber (linenumber ∈ [1,7], so the composite is unique).
    "strat_sample" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .withColumn("__sk", col("l_orderkey") * lit(10L) + col("l_linenumber"))
      graft.operators.CorpusPrep.mixtureSample(li, "__sk", "l_returnflag",
          Map("A" -> 0.2, "N" -> 0.5, "R" -> 0.8))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
    }),

    // J6 — LEFT OUTER join (the join kind the reference never needs but
    // a user of the engine immediately would): every customer with
    // their order count/total, zero-order customers preserved through
    // coalesce. Aggregate-then-join keeps the outer side's row count
    // exact and the join input small; decimal totals for
    // order-independence.
    "j6_outer_join" -> ((s, dir) => {
      val oc = Tables.orders(s, dir).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,6)")).as("tot"))
      Tables.customer(s, dir)
        .join(oc, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          round(coalesce(col("tot").cast("double"), lit(0.0)), 4).as("total_spend"))
    }),

    // J7 — left-semi join: existence filter without duplicating or
    // widening the left side (the relational complement of U4's anti
    // join). Catalyst broadcasts the DISTINCT-keyed right side; at 100 TB
    // a semi join beats the equivalent inner-join + dropDuplicates by
    // never materializing the multiplicity.
    "j7_semi_join" -> ((s, dir) => {
      val urgent = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      Tables.customer(s, dir)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
    }),

    // Z-order layout key (Morton interleave of quantized price ×
    // quantity) — the write-side clustering that makes min/max file
    // stats prune 2-d range predicates at 100 TB (the Delta/Iceberg
    // ZORDER BY technique). Pure codegen'd bit arithmetic; writing the
    // layout is repartitionByRange(z_key) + sortWithinPartitions.
    "zorder_key" -> ((s, dir) => {
      val qa = floor(col("l_extendedprice") / lit(1000.0)).cast("long")
      val qb = floor(col("l_quantity")).cast("long")
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        graft.operators.Layout.zOrderKey(qa, qb, bits = 8).as("z_key"))
    }),

    // Layout-effectiveness audit: the hilbert-vs-morton file-pruning
    // claim MEASURED, not argued. Rows cluster into deterministic
    // 4096-row "files" by key order (global rank via PrefixSum — never
    // a partitionless window), each file gets its (qa, qb) min/max box,
    // and six 2-d range queries count the files whose box they
    // intersect — exactly the min/max skipping a parquet reader does.
    // The oracle replays both key functions, the rank, the boxes, and
    // the intersection test; LayoutSpec pins that hilbert touches no
    // more files than morton in total.
    "layout_audit" -> ((s, dir) => {
      val base = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        least(floor(col("l_extendedprice") / lit(1000.0)).cast("long"),
          lit(255L)).as("qa"),
        least(floor(col("l_quantity")).cast("long"), lit(255L)).as("qb"))
      def boxesFor(layout: String,
          key: org.apache.spark.sql.Column): DataFrame = {
        val keyed = base.withColumn("key", key).withColumn("__one", lit(1L))
        graft.operators.PrefixSum
          .withRunningTotal(keyed, "__one", "rk",
            "key", "l_orderkey", "l_linenumber")
          .withColumn("file_id", expr("(rk - 1) div 4096"))
          .groupBy(col("file_id"))
          .agg(min(col("qa")).as("qalo"), max(col("qa")).as("qahi"),
            min(col("qb")).as("qblo"), max(col("qb")).as("qbhi"))
          .withColumn("layout", lit(layout))
      }
      val boxes = boxesFor("morton",
          graft.operators.Layout.zOrderKey(col("qa"), col("qb"), bits = 8))
        .unionByName(boxesFor("hilbert",
          graft.operators.Layout.hilbertKey(col("qa"), col("qb"), bits = 8)))
      import s.implicits._
      val ranges = Seq((1L, 0L, 7L, 0L, 255L), (2L, 0L, 255L, 0L, 3L),
        (3L, 40L, 55L, 20L, 30L), (4L, 0L, 31L, 0L, 15L),
        (5L, 64L, 95L, 0L, 255L), (6L, 0L, 3L, 0L, 3L))
        .toDF("q_id", "a1", "a2", "b1", "b2")
      boxes.join(broadcast(ranges),
          col("qalo") <= col("a2") && col("qahi") >= col("a1") &&
            col("qblo") <= col("b2") && col("qbhi") >= col("b1"))
        .groupBy(col("layout"), col("q_id"))
        .agg(count(lit(1)).as("n_files_touched"))
    }),

    // Hilbert layout key over the same quantized pair as zorder_key —
    // the stronger-locality clustering (consecutive keys are ALWAYS
    // grid-adjacent; HilbertKeySpec pins the curve property and the
    // neighbor-distance win over Morton). One codegen'd loop per row;
    // the oracle unrolls the 8 xy2d rounds into plain SQL.
    "hilbert_key" -> ((s, dir) => {
      val qa = floor(col("l_extendedprice") / lit(1000.0)).cast("long")
      val qb = floor(col("l_quantity")).cast("long")
      Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        graft.operators.Layout.hilbertKey(qa, qb, bits = 8).as("h_key"))
    }),

    // TPC-H Q3 shape (shipping priority): the canonical 3-way
    // fact-to-fact join with filters on every input and a top-k by
    // aggregated revenue. Scale shape: each scan filters BEFORE the
    // join (pushed to parquet), revenue accumulates in exact DECIMAL
    // (order-independent), and the top-10 is TakeOrdered — never a
    // global sort materialization. No forced broadcast: at real scale
    // every side here is large; AQE picks the right strategy per SF.
    // TPC-H Q18 shape (large-volume customers): the HAVING-gated
    // semi-join pattern — aggregate the fact table once, gate orders on
    // the aggregate, then enrich. Quantities are integer-valued, so the
    // per-order sums are exact whatever the partial order; the top-100
    // is TakeOrdered, never a global sort.
    // TPC-H Q1 shape (pricing summary): the scan+agg plan-regression
    // canary — one lineitem pass, pushed shipdate filter, partial
    // aggregation into 6 tiny groups. Every sum accumulates in
    // DECIMAL(18,6) (order-independent); averages divide the exact
    // decimal sum as a double by the count, so both engines perform
    // the identical single float op.
    "tpch_q1" -> ((s, dir) => {
      val cut = lit("1998-09-01 00:00:00").cast("timestamp")
      Tables.lineitem(s, dir).where(col("l_shipdate") <= cut)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("decimal(18,6)").as("qty"),
          col("l_extendedprice").cast("decimal(18,6)").as("px"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,6)").as("disc_px"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).cast("decimal(18,6)").as("charge"),
          col("l_discount").cast("decimal(18,6)").as("disc"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("qty")).cast("double"), 4).as("sum_qty"),
          round(sum(col("px")).cast("double"), 4).as("sum_base_price"),
          round(sum(col("disc_px")).cast("double"), 4).as("sum_disc_price"),
          round(sum(col("charge")).cast("double"), 4).as("sum_charge"),
          round(sum(col("qty")).cast("double") / count(lit(1)), 4)
            .as("avg_qty"),
          round(sum(col("px")).cast("double") / count(lit(1)), 4)
            .as("avg_price"),
          round(sum(col("disc")).cast("double") / count(lit(1)), 4)
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // TPC-H Q9 shape (product-type profit rollup): the join-ORDER
    // canary — the part/supplier/nation dimensions prune and broadcast
    // while lineitem⋈orders shuffles once on orderkey. The testdata
    // has no partsupp table, so supply cost is modeled as
    // 0.6·p_retailprice (the profit expression keeps Q9's
    // revenue-minus-cost shape); the name filter keeps dimension
    // pruning on the probe side like Q9's '%green%'.
    "tpch_q9" -> ((s, dir) => {
      val parts = Tables.part(s, dir)
        .where(col("p_name").like("%bolt%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val supp = Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey"))
      val nat = Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("n_name").as("nation"), col("o_year").cast("long").as("o_year"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            - lit(0.6) * col("p_retailprice") * col("l_quantity"))
            .cast("decimal(18,6)").as("amount"))
        .groupBy(col("nation"), col("o_year"))
        .agg(round(sum(col("amount")).cast("double"), 4).as("sum_profit"))
    }),

    "tpch_q18" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .where(col("total_qty") > 250)
      Tables.orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 4).as("o_totalprice"),
          round(col("total_qty"), 4).as("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    "tpch_q3" -> ((s, dir) => {
      val cut = lit("1998-06-15 00:00:00").cast("timestamp")
      val cust = Tables.customer(s, dir)
        .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val ord = Tables.orders(s, dir).where(col("o_orderdate") < cut)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val li = Tables.lineitem(s, dir).where(col("l_shipdate") > cut)
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,6)").as("rev"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("rev")).cast("double"), 4).as("revenue"))
        .select(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_orderpriority").as("order_priority"), col("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc).limit(10)
    }),

    // TPC-H Q5 shape (local supplier volume): the 6-way snowflake join
    // with the extra c_nationkey = s_nationkey locality condition.
    // nation and region are genuinely tiny at ANY scale — broadcast
    // them explicitly; the customer⋈orders⋈lineitem⋈supplier spine
    // shuffles on its keys and aggregates partially per nation.
    "tpch_q5" -> ((s, dir) => {
      val lo = lit("1997-01-01 00:00:00").cast("timestamp")
      val hi = lit("1998-01-01 00:00:00").cast("timestamp")
      val asiaNations = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)
          .where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val ord = Tables.orders(s, dir)
        .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select(col("o_orderkey"), col("o_custkey"))
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,6)").as("rev"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey")
            && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("rev")).cast("double"), 4).as("revenue"))
        .select(col("n_name").as("nation"), col("revenue"))
    }),

    // TPC-H Q21 shape (suppliers who kept orders waiting): the
    // EXISTS / NOT-EXISTS plan-regression canary — the remaining
    // classic join-planning class after Q1 (scan+agg) and Q9
    // (join order): correlated exists pairs must plan as left-SEMI and
    // left-ANTI hash joins on the correlation key with the supplier
    // inequality as a residual condition, never a nested-loop product.
    // The testdata carries no receipt/commit dates, so the "late line"
    // marker is l_returnflag = 'R' (a per-line property, preserving
    // Q21's exact subquery structure): count, per supplier of the
    // region-0 nations, the late F-order lines where at least one
    // OTHER supplier shares the order (EXISTS → semi) and no other
    // supplier's line in it is late (NOT EXISTS → anti). At scale all
    // three lineitem legs shuffle once on l_orderkey; supplier⋈nation
    // broadcasts; PlanSpec pins the semi/anti/no-nested-loop shape.
    "tpch_q21" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val l1 = li.where(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_suppkey"))
      val l2 = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val l3 = li.where(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
      val supp = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .where(col("n_regionkey") === 0).select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      l1
        .join(l2, col("l_orderkey") === col("o2")
          && col("l_suppkey") =!= col("s2"), "left_semi")
        .join(l3, col("l_orderkey") === col("o3")
          && col("l_suppkey") =!= col("s3"), "left_anti")
        .join(Tables.orders(s, dir).where(col("o_orderstatus") === "F")
          .select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(100)
    }),

    // TPC-H Q2 shape (min-cost supplier per part): the CORRELATED
    // SCALAR AGGREGATE plan canary — the remaining classic planning
    // class after Q1 (scan+agg), Q9 (join order) and Q21 (exists/anti):
    // `cost = (SELECT min(cost) WHERE partkey = outer.partkey)` must
    // NEVER execute per outer row. Of the two standard de-correlations
    // (aggregate + hash rejoin vs min-over-window on the shared build),
    // this takes the window form: the naive rejoin re-aggregates the
    // whole lineitem leg per consuming branch (measured: the static
    // plan duplicated the ps subtree, 6 aggregate execs), while the
    // window keeps ONE lineitem pass by construction — candidate cost
    // and per-part minimum live in the same row stream, so there is no
    // rejoin at all. The testdata has no partsupp, so the cost relation
    // is derived (min l_extendedprice per (part, supplier)); the
    // region-0 supplier restriction applies BEFORE the build, like
    // Q2's inner subquery. At scale: lineitem shuffles once on
    // (partkey, suppkey), once on partkey for the window;
    // supplier⋈nation broadcasts; PlanSpec pins one-lineitem-scan +
    // 2-aggregate-execs + no-nested-loop.
    "tpch_q2" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val region0 = Tables.nation(s, dir)
        .where(col("n_regionkey") === 0)
        .select(col("n_nationkey"), col("n_name"))
      val supp = Tables.supplier(s, dir)
        .join(broadcast(region0), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      val ps = Tables.lineitem(s, dir)
        .join(broadcast(supp.select(col("s_suppkey").as("__sk"))),
          col("l_suppkey") === col("__sk"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("l_extendedprice")).as("cost"))
      val best = ps
        .withColumn("__min_cost",
          min(col("cost")).over(Window.partitionBy(col("l_partkey"))))
        .where(col("cost") === col("__min_cost"))
      Tables.part(s, dir)
        .where(col("p_size") === 15)
        .join(best, col("p_partkey") === col("l_partkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .select(round(col("s_acctbal"), 4).as("s_acctbal"), col("s_name"),
          col("n_name"), col("p_partkey"), col("p_type"),
          round(col("cost"), 4).as("supplycost"))
        .orderBy(col("s_acctbal").desc, col("n_name").asc,
          col("s_name").asc, col("p_partkey").asc)
        .limit(100)
    }),

    // SQL frontend — the ONE dialect-neutral statement runs verbatim on
    // both engines (spark.sql over temp views here; the oracle map holds
    // the identical text for DuckDB). Catalyst plans it exactly like the
    // DataFrame form: dimension broadcasts, pushed filter, partial aggs.
    // Decimal revenue accumulation for order-independent sums (see
    // stream_hourly_agg).
    "sql_frontend" -> ((s, dir) => {
      Seq("nation", "customer", "orders", "lineitem").foreach { t =>
        Tables.load(s, dir, t).createOrReplaceTempView(t)
      }
      s.sql(FrontendSql)
    })
  )

  /** Shared Spark/DuckDB SQL for `sql_frontend` (dialect-neutral). */
  private val FrontendSql: String =
    """SELECT n.n_name AS nation,
              CAST(count(*) AS BIGINT) AS n_items,
              round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,6))) AS DOUBLE), 4) AS revenue
       FROM nation n
       JOIN customer c ON c.c_nationkey = n.n_nationkey
       JOIN orders o   ON o.o_custkey = c.c_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE o.o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
       GROUP BY n.n_name"""

  def oracleSql: Map[String, String] = Map(
    "tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
              round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
                    AS DOUBLE), 4) AS sum_qty,
              round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
                    AS DOUBLE), 4) AS sum_base_price,
              round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_disc_price,
              round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                    * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE), 4)
                AS sum_charge,
              round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6)))
                    AS DOUBLE) / count(*), 4) AS avg_qty,
              round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
                    AS DOUBLE) / count(*), 4) AS avg_price,
              round(CAST(sum(CAST(l_discount AS DECIMAL(18,6)))
                    AS DOUBLE) / count(*), 4) AS avg_disc,
              CAST(count(*) AS BIGINT) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         GROUP BY 1, 2""",
    "tpch_q9" ->
      """SELECT n.n_name AS nation,
              CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
              round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                    - 0.6 * p.p_retailprice * l.l_quantity
                    AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_profit
         FROM lineitem l
         JOIN part p ON l.l_partkey = p.p_partkey
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE p.p_name LIKE '%bolt%'
         GROUP BY 1, 2""",
    "tpch_q18" ->
      """WITH big AS (SELECT l_orderkey, sum(l_quantity) AS total_qty
              FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250)
         SELECT c_custkey, o_orderkey,
                round(o_totalprice, 4) AS o_totalprice,
                round(total_qty, 4) AS total_qty
         FROM orders JOIN big ON o_orderkey = l_orderkey
         JOIN customer ON o_custkey = c_custkey
         ORDER BY total_qty DESC, o_orderkey ASC LIMIT 100""",
    "tpch_q21" ->
      """SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
         FROM lineitem l1
         JOIN orders o ON o.o_orderkey = l1.l_orderkey
                      AND o.o_orderstatus = 'F'
         JOIN supplier s ON s.s_suppkey = l1.l_suppkey
         JOIN nation n ON n.n_nationkey = s.s_nationkey
                      AND n.n_regionkey = 0
         WHERE l1.l_returnflag = 'R'
           AND EXISTS (SELECT 1 FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey
                         AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
                           WHERE l3.l_orderkey = l1.l_orderkey
                             AND l3.l_suppkey <> l1.l_suppkey
                             AND l3.l_returnflag = 'R')
         GROUP BY s.s_name
         ORDER BY numwait DESC, s.s_name ASC LIMIT 100""",
    // Q2 shape: the oracle states the correlated scalar subquery
    // DIRECTLY (DuckDB de-correlates it itself) — matching it proves
    // the engine's aggregate+rejoin formulation computes exactly the
    // per-part scalar minimum the subquery semantics define.
    "tpch_q2" ->
      """WITH supp AS (SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
              FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
              WHERE n.n_regionkey = 0),
         ps AS (SELECT l.l_partkey, l.l_suppkey,
                  min(l.l_extendedprice) AS cost
                FROM lineitem l
                WHERE l.l_suppkey IN (SELECT s_suppkey FROM supp)
                GROUP BY 1, 2)
         SELECT round(su.s_acctbal, 4) AS s_acctbal, su.s_name, su.n_name,
                p.p_partkey, p.p_type, round(ps.cost, 4) AS supplycost
         FROM part p
         JOIN ps ON p.p_partkey = ps.l_partkey
         JOIN supp su ON ps.l_suppkey = su.s_suppkey
         WHERE p.p_size = 15
           AND ps.cost = (SELECT min(ps2.cost) FROM ps ps2
                          WHERE ps2.l_partkey = p.p_partkey)
         ORDER BY s_acctbal DESC, su.n_name ASC, su.s_name ASC,
                  p.p_partkey ASC LIMIT 100""",
    "sql_frontend" -> FrontendSql, // the SAME text Spark executes
    "tpch_q3" ->
      """SELECT l.l_orderkey,
              strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
              o.o_orderpriority AS order_priority,
              round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,6))) AS DOUBLE), 4) AS revenue
         FROM customer c
         JOIN orders o ON o.o_custkey = c.c_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         WHERE c.c_mktsegment = 'BUILDING'
           AND o.o_orderdate < TIMESTAMP '1998-06-15 00:00:00'
           AND l.l_shipdate > TIMESTAMP '1998-06-15 00:00:00'
         GROUP BY 1, o.o_orderdate, 3
         ORDER BY revenue DESC, l.l_orderkey ASC
         LIMIT 10""",
    "tpch_q5" ->
      """SELECT n.n_name AS nation,
              round(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,6))) AS DOUBLE), 4) AS revenue
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
                        AND c.c_nationkey = s.s_nationkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         WHERE r.r_name = 'ASIA'
           AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY 1""",
    "j6_outer_join" ->
      """WITH oc AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
                  sum(CAST(o_totalprice AS DECIMAL(18,6))) AS tot
                FROM orders GROUP BY o_custkey)
         SELECT c_custkey,
                coalesce(n_orders, 0) AS n_orders,
                round(coalesce(CAST(tot AS DOUBLE), 0.0), 4) AS total_spend
         FROM customer LEFT JOIN oc ON c_custkey = o_custkey""",
    "zorder_key" -> {
      // the same bit interleave Layout.zOrderKey emits, as plain SQL
      val interleave = (0 until 8).map(i =>
        s"(((qa >> $i) & 1) << ${2 * i}) | (((qb >> $i) & 1) << ${2 * i + 1})")
        .mkString(" | ")
      s"""WITH q AS (SELECT l_orderkey, l_linenumber,
              least(CAST(floor(l_extendedprice / 1000.0) AS BIGINT), 255) AS qa,
              least(CAST(floor(l_quantity) AS BIGINT), 255) AS qb
            FROM lineitem)
          SELECT l_orderkey, l_linenumber, $interleave AS z_key FROM q"""
    },
    "hilbert_key" ->
      s"""WITH q AS (SELECT l_orderkey, l_linenumber,
            greatest(CAST(0 AS BIGINT),
              least(CAST(floor(l_extendedprice / 1000.0) AS BIGINT), 255)) AS x,
            greatest(CAST(0 AS BIGINT),
              least(CAST(floor(l_quantity) AS BIGINT), 255)) AS y,
            CAST(0 AS BIGINT) AS d
          FROM lineitem),
         ${hilbertStages("l_orderkey, l_linenumber")}
         SELECT l_orderkey, l_linenumber, CAST(d AS BIGINT) AS h_key
         FROM st0""",
    "layout_audit" -> {
      val interleave = (0 until 8).map(i =>
        s"(((qa >> $i) & 1) << ${2 * i}) | (((qb >> $i) & 1) << ${2 * i + 1})")
        .mkString(" | ")
      s"""WITH q0 AS (SELECT l_orderkey, l_linenumber,
            least(CAST(floor(l_extendedprice / 1000.0) AS BIGINT), 255) AS qa,
            least(CAST(floor(l_quantity) AS BIGINT), 255) AS qb
          FROM lineitem),
         q AS (SELECT l_orderkey, l_linenumber, qa, qb,
                 qa AS x, qb AS y, CAST(0 AS BIGINT) AS d FROM q0),
         ${hilbertStages("l_orderkey, l_linenumber, qa, qb")},
         mz AS (SELECT l_orderkey, l_linenumber, qa, qb,
                  $interleave AS key FROM q0),
         r AS (SELECT 'morton' AS layout, qa, qb,
                 row_number() OVER (ORDER BY key, l_orderkey, l_linenumber)
                   AS rk
               FROM mz
               UNION ALL
               SELECT 'hilbert', qa, qb,
                 row_number() OVER (ORDER BY d, l_orderkey, l_linenumber)
               FROM st0),
         f AS (SELECT layout, (rk - 1) // 4096 AS file_id,
                 min(qa) AS qalo, max(qa) AS qahi,
                 min(qb) AS qblo, max(qb) AS qbhi
               FROM r GROUP BY 1, 2),
         qs(q_id, a1, a2, b1, b2) AS (VALUES
           (1, 0, 7, 0, 255), (2, 0, 255, 0, 3),
           (3, 40, 55, 20, 30), (4, 0, 31, 0, 15),
           (5, 64, 95, 0, 255), (6, 0, 3, 0, 3))
         SELECT layout, CAST(q_id AS BIGINT) AS q_id,
           CAST(count(*) AS BIGINT) AS n_files_touched
         FROM f JOIN qs ON qalo <= a2 AND qahi >= a1
                       AND qblo <= b2 AND qbhi >= b1
         GROUP BY 1, 2"""
    },
    "strat_sample" ->
      """WITH w AS (SELECT * FROM (VALUES ('A', 0.2), ('N', 0.5), ('R', 0.8))
                    AS t(l_returnflag, w)),
         g AS (SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, w.w,
                 CAST(('0x' || substr(md5(CAST(l.l_orderkey * 10 + l.l_linenumber
                   AS VARCHAR)), 1, 4)) AS INTEGER) AS gate
               FROM lineitem l JOIN w USING (l_returnflag))
         SELECT l_orderkey, l_linenumber, l_returnflag
         FROM g WHERE gate < w * 65536""",
    "j7_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey
                         AND o_orderpriority = '1-URGENT')""",
    "s1_scan" ->
      "SELECT l_orderkey, l_quantity FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-06-01'",
    "p2_drop" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate FROM orders",
    "p3_derive" ->
      "SELECT l_orderkey, l_linenumber, round(l_extendedprice * (1 - l_discount), 4) AS revenue FROM lineitem",
    "p5_nullrepair" ->
      """SELECT o_orderkey,
         coalesce(CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END, '-1') AS status_n,
         coalesce(CASE WHEN o_totalprice > 200000.0 THEN NULL ELSE o_totalprice END, 0.0) AS price_n
         FROM orders""",
    "p4_role_select" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax FROM lineitem",
    "p6_filter_eq" ->
      "SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'",
    "p7_filter_null" ->
      "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'",
    "p8_slice" ->
      "SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey LIMIT 100",
    "j1_join_label" ->
      """SELECT o_orderkey, c_custkey, c_mktsegment,
         CAST(o_orderstatus = 'F' AS BIGINT) AS deal_label
         FROM orders JOIN customer ON o_custkey = c_custkey""",
    "j2_join_sold" ->
      """SELECT o_orderkey, o_totalprice, c_name
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_orderstatus = 'F'""",
    "j4_dict_lookup" ->
      "SELECT c_custkey, n_name FROM customer JOIN nation ON c_nationkey = n_nationkey",
    "u1_union" ->
      """SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
         UNION ALL SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'""",
    "u2_union_distinct" ->
      "SELECT DISTINCT v FROM (SELECT l_returnflag AS v FROM lineitem UNION ALL SELECT o_orderstatus AS v FROM orders)",
    "u3_dedup_exact" ->
      "SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS dup_count FROM documents GROUP BY text",
    "u4_anti_join" ->
      """SELECT c_custkey FROM customer c WHERE NOT EXISTS
         (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000.0)""",
    "p9_pivot" ->
      """SELECT o_orderpriority,
              round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END) / 1000000.0, 4) AS "F",
              round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END) / 1000000.0, 4) AS "O",
              round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END) / 1000000.0, 4) AS "P"
         FROM orders GROUP BY o_orderpriority""",
    "p10_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem""",
    "j5_band_join" ->
      """WITH stats AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders),
         bands AS (SELECT i AS band_id,
                lo + (hi - lo) * i / 10.0 AS b_lo,
                lo + (hi - lo) * (i + 1) / 10.0 AS b_hi
              FROM stats CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS i)),
         j AS (SELECT band_id, o_totalprice FROM orders JOIN bands
                 ON o_totalprice >= b_lo AND (o_totalprice < b_hi OR band_id = 9))
         SELECT band_id, CAST(count(*) AS BIGINT) AS n_orders,
                round(avg(o_totalprice), 4) AS avg_price
         FROM j GROUP BY band_id"""
  )
}
