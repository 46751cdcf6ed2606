package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.GraftSql
import graft.sources.Tables

/** The SQL-only user's path to the operator library ([[graft.GraftSql]]
  * view-producing wrappers + the GraftExtensions scalar functions):
  * each query here stages base tables as temp views, invokes an
  * operator THROUGH the facade, and then composes the result with
  * further plain SQL — proving a `spark.sql`-only session can run the
  * engine's graph/dedup/as-of capabilities end to end. Every query is
  * oracle-matched, so the facade path is held to the same hash gate as
  * the DataFrame path.
  */
object SqlFacadeQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PageRank reached purely via SQL: edge view in SQL, the operator
    // through the facade, the top-20 consumption in SQL again. pr_fx
    // is the exact fixed-point integer, so the SQL ORDER BY/LIMIT cut
    // is engine-independent.
    "sql_pagerank" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
      s.sql("""CREATE OR REPLACE TEMP VIEW supply_edges AS
               SELECT concat('s', l_suppkey) AS src,
                      concat('p', l_partkey) AS dst FROM lineitem""")
      GraftSql.registerPageRank(s, "supply_edges", "src", "dst",
        iters = 5, outView = "graft_ranks")
      s.sql("""SELECT node, pr_fx FROM graft_ranks
               ORDER BY pr_fx DESC, node ASC LIMIT 20""")
    }),

    // Exact dedup through the facade, then a SQL rollup over the
    // surviving groups — the "how duplicated is this corpus" report a
    // SQL analyst would write against the dedup view.
    "sql_dedup" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      GraftSql.registerDedupExact(s, "documents", "doc_id", "text",
        outView = "graft_dedup")
      s.sql("""SELECT dup_count, CAST(count(*) AS BIGINT) AS n_groups
               FROM graft_dedup GROUP BY dup_count""")
    }),

    // Backward as-of join through the facade (clicks ← latest prior
    // purchase per user), then per-user attributed spend in SQL.
    // The sum accumulates in DECIMAL over the 4dp-rounded matches —
    // order-independent, so the aggregate hash-matches exactly.
    "sql_asof_spend" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events_ns")
      s.sql("""CREATE OR REPLACE TEMP VIEW clicks AS
               SELECT event_id, user_id, ts_ns div 1000 AS ts_us
               FROM events_ns WHERE event_type = 'click'""")
      s.sql("""CREATE OR REPLACE TEMP VIEW purchases AS
               SELECT user_id, ts_ns div 1000 AS ts_us,
                      value FROM events_ns WHERE event_type = 'purchase'""")
      GraftSql.registerAsofJoin(s, "clicks", "purchases", "user_id",
        "ts_us", Seq("value"), outView = "graft_asof")
      s.sql("""SELECT user_id,
                 CAST(count(value_asof) AS BIGINT) AS n_attributed,
                 CAST(sum(CAST(round(value_asof, 4) AS DECIMAL(18,4)))
                   AS DOUBLE) AS attributed
               FROM graft_asof GROUP BY user_id""")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "sql_pagerank" ->
      s"""SELECT node, pr_fx FROM (${GraphQueries.PageRankOracle})
          ORDER BY pr_fx DESC, node ASC LIMIT 20""",
    "sql_dedup" ->
      """SELECT dup_count, CAST(count(*) AS BIGINT) AS n_groups
         FROM (SELECT min(doc_id) AS doc_id,
                      CAST(count(*) AS BIGINT) AS dup_count
               FROM documents GROUP BY text)
         GROUP BY dup_count""",
    // the asof replay (see asof_join_events): union both sides with a
    // side bit so equal-time purchases land inside the click's frame,
    // one IGNORE NULLS running last_value per user — then the same
    // DECIMAL-accumulated per-user rollup
    "sql_asof_spend" ->
      """WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
                event_type, value FROM events),
         u AS (
           SELECT user_id, ts_us AS t, 0 AS side, value AS rval,
                  NULL::BIGINT AS event_id
           FROM ev WHERE event_type = 'purchase'
           UNION ALL
           SELECT user_id, ts_us, 1, NULL::DOUBLE, event_id
           FROM ev WHERE event_type = 'click'),
         w AS (SELECT *, last_value(rval IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY t, side, rval
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS am
               FROM u)
         SELECT user_id,
                CAST(count(am) AS BIGINT) AS n_attributed,
                CAST(sum(CAST(round(am, 4) AS DECIMAL(18,4))) AS DOUBLE)
                  AS attributed
         FROM w WHERE side = 1 GROUP BY user_id"""
  )
}
