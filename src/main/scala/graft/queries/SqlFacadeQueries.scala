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
      // the degree-annotated canonical edge table and node set are the
      // warehouse's shared graph artifacts — every ranking query in the
      // suite starts from them instead of re-deriving the annotation
      GraphQueries.storedDegreeEdges(s, dir)
        .createOrReplaceTempView("supply_degree_edges")
      GraphQueries.storedGraphNodes(s, dir)
        .createOrReplaceTempView("supply_nodes")
      GraftSql.registerPageRankPrepared(s, "supply_degree_edges",
        "supply_nodes", iters = 5, outView = "graft_ranks")
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
    }),

    // Exact k-NN join through the facade: query view carved in SQL,
    // the join through the wrapper, the top-3 cut in SQL. Same oracle
    // as knn_join_bruteforce, filtered on the integer rank.
    "sql_knn" -> ((s, dir) => {
      Tables.embeddings(s, dir).createOrReplaceTempView("embeddings")
      s.sql("""CREATE OR REPLACE TEMP VIEW knn_queries AS
               SELECT * FROM embeddings WHERE vec_id % 50 = 0""")
      GraftSql.registerKnnJoin(s, "embeddings", "knn_queries",
        "embedding", "vec_id", k = 5, outView = "graft_knn")
      s.sql("""SELECT query_id, neighbor_id, rank, cosine
               FROM graft_knn WHERE rank <= 3""")
    }),

    // MinHash-LSH near-dup pairs through the facade, then a per-doc
    // rollup in SQL. round(max) = max(round) (round is monotone), so
    // the 4dp figure matches the oracle's rounded-then-maxed value.
    "sql_minhash_dedup" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      GraftSql.registerMinHashDedup(s, "documents", "doc_id", "text",
        outView = "graft_neardups")
      s.sql("""SELECT doc_a, CAST(count(*) AS BIGINT) AS n_pairs,
                 round(max(jaccard), 4) AS max_jaccard
               FROM graft_neardups GROUP BY doc_a""")
    }),

    // SCD2 build + point-in-time slice through the facade, then a
    // per-state census in SQL — epoch-µs integers end to end.
    "sql_scd2" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events_ns")
      s.sql("""CREATE OR REPLACE TEMP VIEW change_log AS
               SELECT user_id, ts_ns div 1000 AS ts_us, event_id,
                      event_type AS state FROM events_ns""")
      GraftSql.registerScd2History(s, "change_log", "user_id", "ts_us",
        "event_id", "state", outView = "graft_scd2")
      // 2024-01-15T00:00:00Z in epoch µs — the same mid-span slice
      // point as scd2_asof
      GraftSql.registerScd2AsOf(s, "graft_scd2", 1705276800000000L,
        outView = "graft_scd2_asof")
      s.sql("""SELECT state, CAST(count(*) AS BIGINT) AS n_users,
                 min(valid_from) AS first_valid_from
               FROM graft_scd2_asof GROUP BY state""")
    }),

    // PSI drift report through the facade: baseline/current views
    // carved in SQL, the report consumed with an integer-column filter.
    "sql_psi_drift" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
      s.sql("""CREATE OR REPLACE TEMP VIEW li_base AS SELECT * FROM lineitem
               WHERE l_shipdate < TIMESTAMP '1999-01-01'""")
      s.sql("""CREATE OR REPLACE TEMP VIEW li_cur AS SELECT * FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '1999-01-01'""")
      GraftSql.registerPsiDrift(s, "li_base", "li_cur", "l_extendedprice",
        k = 10, outView = "graft_psi")
      s.sql("""SELECT CAST(bin AS BIGINT) AS bin, n_base, n_cur,
                 CAST(psi_term AS DOUBLE) AS psi_term
               FROM graft_psi WHERE n_cur > 0""")
    }),

    // Strict-order funnel through the facade, conversion ppm in SQL —
    // all-integer math over the one-row report.
    "sql_funnel" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events_ns")
      s.sql("""CREATE OR REPLACE TEMP VIEW funnel_events AS
               SELECT user_id, event_type, ts_ns div 1000 AS ts_us
               FROM events_ns""")
      GraftSql.registerFunnel(s, "funnel_events", "user_id", "event_type",
        "ts_us", Seq("view", "click", "purchase"), outView = "graft_funnel")
      s.sql("""SELECT n_users, n_reach_1 AS n_view,
                 n_reach_2 AS n_view_click, n_reach_3 AS n_full_funnel,
                 (1000000 * n_reach_3) div n_reach_1 AS full_conv_ppm
               FROM graft_funnel""")
    }),

    // Connected components through the facade: the basket edge
    // derivation staged in plain SQL (collect_set + transform —
    // Catalyst built-ins), the contraction through the wrapper, a
    // component-size census in SQL after.
    "sql_components" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
      s.sql("""CREATE OR REPLACE TEMP VIEW basket_edges AS
               SELECT e.a, e.b FROM (
                 SELECT explode(transform(sequence(0, size(ps) - 2),
                   i -> struct(ps[i] AS a, ps[i + 1] AS b))) AS e
                 FROM (SELECT sort_array(collect_set(l_partkey)) AS ps
                       FROM lineitem GROUP BY l_orderkey)
                 WHERE size(ps) >= 2)""")
      GraftSql.registerComponents(s, "basket_edges", "a", "b",
        outView = "graft_components")
      s.sql("""SELECT cluster, CAST(count(*) AS BIGINT) AS n_nodes
               FROM graft_components GROUP BY cluster""")
    }),

    // Absorption probability through the facade: the transition counts
    // staged with a plain SQL lead() window, the 8-step value iteration
    // through the wrapper, the converting states read back in SQL.
    // Same exact-integer oracle as markov_conversion.
    "sql_markov" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events_ns")
      s.sql("""CREATE OR REPLACE TEMP VIEW markov_trans AS
               SELECT src, dst, count(*) AS n FROM (
                 SELECT event_type AS src,
                        lead(event_type, 1) OVER (
                          PARTITION BY user_id
                          ORDER BY ts_ns div 1000, event_id) AS dst
                 FROM events_ns)
               WHERE dst IS NOT NULL GROUP BY src, dst""")
      GraftSql.registerAbsorption(s, "markov_trans", "src", "dst", "n",
        absorbing = "purchase", iters = 8, outView = "graft_conv")
      s.sql("SELECT state, p_ppm FROM graft_conv WHERE p_ppm > 0")
    }),

    // Sessionization through the facade: the event view carved in SQL,
    // the 30-minute-gap session build through the wrapper, the
    // multi-event sessions read back in SQL — exact integer µs bounds.
    "sql_sessionize" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events_ns")
      s.sql("""CREATE OR REPLACE TEMP VIEW session_events AS
               SELECT user_id, ts_ns div 1000 AS ts_us, value
               FROM events_ns""")
      GraftSql.registerSessionize(s, "session_events",
        gapUs = 30L * 60L * 1000L * 1000L, outView = "graft_sessions")
      s.sql("""SELECT user_id, session_id, start_us, end_us, n_events,
                 total_value
               FROM graft_sessions WHERE n_events >= 3""")
    }),

    // Histogram sweep through the facade: three columns binned in two
    // passes total, one column's distribution consumed in SQL.
    "sql_histogram" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
      GraftSql.registerHistogram(s, "lineitem",
        Seq("l_extendedprice", "l_quantity", "l_discount"), bins = 40,
        outView = "graft_hist")
      s.sql("""SELECT col_name, bucket, cnt FROM graft_hist
               WHERE col_name = 'l_quantity'""")
    }),

    // CUPED through the facade: the per-user pre/post DECIMAL sums and
    // the md5 arm gate staged in plain SQL (the same integers ab_cuped
    // builds with DataFrame code), the estimator through the wrapper.
    "sql_cuped" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events_ns")
      s.sql("""CREATE OR REPLACE TEMP VIEW ab_units AS
               SELECT CASE WHEN CAST(conv(substr(md5(CAST(user_id AS STRING)),
                             1, 4), 16, 10) AS BIGINT) < 32768
                           THEN 'A' ELSE 'B' END AS arm,
                      CAST(sum(CASE WHEN event_type = 'purchase'
                            AND ts_ns div 1000 >= 1705276800000000
                          THEN CAST(value AS DECIMAL(18,6))
                          ELSE CAST(0 AS DECIMAL(18,6)) END)
                        * 1000000 AS BIGINT) AS y_micro,
                      CAST(sum(CASE WHEN event_type = 'purchase'
                            AND ts_ns div 1000 < 1705276800000000
                          THEN CAST(value AS DECIMAL(18,6))
                          ELSE CAST(0 AS DECIMAL(18,6)) END)
                        * 1000000 AS BIGINT) AS x_micro
               FROM events_ns GROUP BY user_id""")
      GraftSql.registerCuped(s, "ab_units", "arm", "y_micro", "x_micro",
        armA = "A", armB = "B", outView = "graft_cuped")
      s.sql("SELECT * FROM graft_cuped")
    }),

    // Winsorization through the facade: the slim projection staged in
    // SQL, the per-group [p05, p95] clamp through the wrapper, a
    // keyed slice read back. Same oracle as a19_winsorize, filtered.
    "sql_winsorize" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
      s.sql("""CREATE OR REPLACE TEMP VIEW li_slim AS
               SELECT l_orderkey, l_linenumber, l_returnflag,
                      l_extendedprice FROM lineitem""")
      GraftSql.registerWinsorize(s, "li_slim", "l_extendedprice",
        Seq("l_returnflag"), lo = 0.05, hi = 0.95, outView = "graft_wins")
      s.sql("""SELECT l_orderkey, l_linenumber,
                 round(l_extendedprice_w, 4) AS price_w
               FROM graft_wins WHERE l_orderkey % 10 = 0""")
    }),

    // Deterministic weighted sampling through the facade: token-count
    // weights staged in SQL (split keeps trailing empties — string_split
    // parity), the md5-Gumbel top-100 through the wrapper.
    "sql_weighted_sample" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      s.sql("""CREATE OR REPLACE TEMP VIEW doc_weights AS
               SELECT doc_id,
                      CAST(size(split(text, ' ', -1)) AS BIGINT) AS n_tokens
               FROM documents""")
      GraftSql.registerWeightedSample(s, "doc_weights", "doc_id",
        "n_tokens", n = 100, outView = "graft_sample")
      s.sql("SELECT doc_id, n_tokens FROM graft_sample")
    }),

    // Linear multi-touch attribution through the facade: the event view
    // carved in SQL, credit assignment + channel rollup through the
    // wrapper, whole-conversion equivalents derived in SQL after —
    // integer ppm end to end.
    "sql_attribution" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events_ns")
      s.sql("""CREATE OR REPLACE TEMP VIEW attr_events AS
               SELECT event_id, user_id, ts_ns div 1000 AS ts_us,
                      event_type FROM events_ns""")
      GraftSql.registerAttribution(s, "attr_events", "user_id", "ts_us",
        "event_type", "event_id", touchTypes = Seq("view", "click"),
        convType = "purchase", model = "linear",
        lookbackUs = 86400000000L, outView = "graft_attr")
      s.sql("""SELECT touch_type, n_conversions_touched, credit_ppm_total,
                 credit_ppm_total div 1000000 AS full_credits
               FROM graft_attr""")
    }),

    // Winnowing contamination screen through the facade: the pairs view
    // through the wrapper, the high-overlap cut in SQL.
    "sql_winnowing" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      GraftSql.registerWinnowingPairs(s, "documents", "doc_id", "text",
        outView = "graft_winnow")
      s.sql("""SELECT doc_a, doc_b, n_shared_fp, fp_jaccard
               FROM graft_winnow WHERE fp_jaccard >= 0.5""")
    }),

    // Snake sharding through the facade: token weights staged in SQL,
    // the placement through the wrapper, the per-shard balance report
    // in SQL — the same census shard_snake_balance gates directly.
    "sql_shards" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      s.sql("""CREATE OR REPLACE TEMP VIEW doc_weights AS
               SELECT doc_id,
                      CAST(size(split(text, ' ', -1)) AS BIGINT) AS n_tokens
               FROM documents""")
      GraftSql.registerSnakeShards(s, "doc_weights", "doc_id", "n_tokens",
        nShards = 8, outView = "graft_shards")
      s.sql("""SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_tokens) AS BIGINT) AS total_tokens
               FROM graft_shards GROUP BY shard""")
    }),

    // Leakage-safe split through the facade, CHAINED behind another
    // facade operator: MinHash near-dup pairs feed the cluster-aware
    // gate, the split census reads back in SQL — a SQL-only user
    // composing two engine operators end to end.
    "sql_leakage_split" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      GraftSql.registerMinHashDedup(s, "documents", "doc_id", "text",
        outView = "graft_neardups")
      GraftSql.registerLeakageSplit(s, "documents", "doc_id",
        "graft_neardups", testFraction = 0.2, outView = "graft_split")
      s.sql("""SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters
               FROM graft_split GROUP BY split""")
    }),

    // Batch BM25 retrieval through the facade: the prefix-query view
    // carved in SQL, the inverted-index scoring through the wrapper,
    // the best hit per query read back.
    "sql_retrieval" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      s.sql("""CREATE OR REPLACE TEMP VIEW prefix_queries AS
               SELECT doc_id AS query_id,
                      array_join(slice(split(text, ' ', -1), 1, 8), ' ')
                        AS qtext
               FROM documents WHERE doc_id % 50 = 0""")
      GraftSql.registerBm25TopK(s, "documents", "prefix_queries", k = 5,
        outView = "graft_hits")
      s.sql("""SELECT query_id, doc_id, bm25 FROM graft_hits
               WHERE rank = 1""")
    }),

    // PRF retrieval through the facade: the expanded-query hits,
    // compared per query against what the literal query found — the
    // expansion-gain report an IR engineer reads.
    "sql_prf" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      s.sql("""CREATE OR REPLACE TEMP VIEW prefix_queries AS
               SELECT doc_id AS query_id,
                      array_join(slice(split(text, ' ', -1), 1, 8), ' ')
                        AS qtext
               FROM documents WHERE doc_id % 50 = 0""")
      GraftSql.registerBm25Prf(s, "documents", "prefix_queries", k = 5,
        outView = "graft_prf")
      s.sql("""SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits,
                 min(rank) AS best_rank, round(max(bm25), 4) AS top_score
               FROM graft_prf GROUP BY query_id""")
    }),

    // Epoch ordering through the facade: the per-(epoch, shard) census
    // a reader fleet provisions from, read back in SQL.
    "sql_epoch_order" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      GraftSql.registerEpochOrder(s, "documents", "doc_id", epochs = 2,
        shards = 4, outView = "graft_order")
      s.sql("""SELECT epoch, shard, CAST(count(*) AS BIGINT) AS n_docs,
                 max(ord) AS max_ord
               FROM graft_order GROUP BY epoch, shard""")
    }),

    // Sequence packing through the facade: the shard-capacity report a
    // training-infra owner reads off the packed layout — total
    // sequences and the boundary-spanning fraction in exact ppm.
    "sql_pack" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      s.sql("""CREATE OR REPLACE TEMP VIEW doc_tokens AS
               SELECT doc_id,
                      CAST(size(split(text, ' ', -1)) AS BIGINT) AS n_tokens
               FROM documents""")
      GraftSql.registerPackContiguous(s, "doc_tokens", "n_tokens",
        seqLen = 512L, outView = "graft_packed", orderCol = "doc_id")
      s.sql("""SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 max(seq_id) + 1 AS total_seqs,
                 CAST(sum(CASE WHEN n_seqs > 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_spanning,
                 (1000000 * sum(CASE WHEN n_seqs > 1 THEN 1 ELSE 0 END))
                   div count(*) AS spanning_ppm
               FROM graft_packed""")
    }),

    // Mixture reweighting through the facade: the per-doc scored view
    // is itself a registered view (the engine's fused scorer), the
    // update rule a second view — a SQL-only user composes both and
    // reads the weights table.
    "sql_doremi" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.CorpusLm.bigramBothNll(docs, "text", "doc_id")
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
        .createOrReplaceTempView("graft_lm_scored")
      GraftSql.registerDoremi(s, "graft_lm_scored", "source",
        lossCol = "kn_score", refCol = "lm_score", eta = 1.0,
        smoothPermille = 100L, outView = "graft_doremi")
      s.sql("SELECT * FROM graft_doremi")
    }),

    // Preference-pair construction through the facade: the pair-yield
    // report a reward-model data owner reads — pairs and mean margin
    // per (chosen_rank, rejected_rank) cell. Margins round to 4dp
    // BEFORE the DECIMAL accumulation so the mean is order-free.
    "sql_preference" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      GraftSql.registerPreferencePairs(s, "events", "user_id", "event_id",
        "value", topM = 3, bottomM = 3, minMargin = 5.0,
        outView = "graft_pref")
      s.sql("""SELECT chosen_rank, rejected_rank,
                 CAST(count(*) AS BIGINT) AS n_pairs,
                 round(CAST(sum(CAST(round(margin, 4) AS DECIMAL(18,6)))
                   AS DOUBLE) / count(*), 4) AS avg_margin
               FROM graft_pref GROUP BY chosen_rank, rejected_rank""")
    }),

    // Blocklist screen through the facade: the keep/drop tally against
    // the shared taxonomy dictionary ('perf' category blocked above 2
    // hits) — the corpus-gate read a curation owner runs first.
    "sql_taxonomy" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      GraftSql.registerDictScreen(s, "documents", "doc_id", "text",
        TextQueries.TagDict, blockCategories = Set("perf"), maxHits = 2L,
        outView = "graft_screen")
      s.sql("""SELECT keep, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(blocked_hits) AS BIGINT) AS total_hits
               FROM graft_screen GROUP BY keep""")
    }),

    // Arena leaderboard through the facade: the match table built in
    // SQL (per-user best-vs-worst windows), Bradley-Terry registered
    // over it, the leaderboard read back in SQL.
    "sql_bt" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""CREATE OR REPLACE TEMP VIEW bt_matches AS
               WITH ranked AS (SELECT user_id, event_id, event_type, value,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY value DESC, event_id ASC) AS top_rk,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY value ASC, event_id ASC) AS bot_rk
                 FROM events),
               wm AS (SELECT user_id, event_type AS winner, value AS wv
                      FROM ranked WHERE top_rk = 1),
               lm AS (SELECT user_id, event_type AS loser, value AS lv
                      FROM ranked WHERE bot_rk = 1)
               SELECT winner, loser FROM wm JOIN lm USING (user_id)
               WHERE winner <> loser AND wv > lv""")
      GraftSql.registerBradleyTerry(s, "bt_matches", "winner", "loser",
        iters = 3, outView = "graft_bt")
      s.sql("""SELECT player, n_wins, rating, rank FROM graft_bt
               WHERE rank <= 3""")
    }),

    // FIM prep through the facade: the objective-mix report a pretrain
    // owner reads off the transformed corpus — docs, tokens, and output
    // characters per arm (character totals are exact integers, so the
    // aggregate hash-gates the full transform text through the view).
    "sql_fim" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      GraftSql.registerFim(s, "documents", "text", "doc_id",
        ratePermille = 500, outView = "graft_fim")
      s.sql("""SELECT fim, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                 CAST(sum(length(out_text)) AS BIGINT) AS total_chars
               FROM graft_fim GROUP BY fim""")
    }),

    // Own-HLL distinct counts through the facade: per-type estimates
    // from the registered view, totalled in DECIMAL over the already-
    // 4dp-rounded per-group estimates (order-free).
    "sql_hll_distinct" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events")
      GraftSql.registerHllDistinct(s, "events", "user_id", "event_type",
        p = 4, outView = "graft_hll")
      s.sql("""SELECT CAST(count(*) AS BIGINT) AS n_groups,
                 CAST(sum(n_obs) AS BIGINT) AS total_registers,
                 round(CAST(sum(CAST(est AS DECIMAL(18,6))) AS DOUBLE), 4)
                   AS total_est
               FROM graft_hll""")
    }),

    // Warm-start rank refresh through the facade: two more rounds
    // CONTINUED from the stored rank artifact (the warehouse's "refresh
    // the ranks, don't recompute" path), top-20 read in SQL.
    "sql_warm_pagerank" -> ((s, dir) => {
      GraphQueries.storedDegreeEdges(s, dir)
        .createOrReplaceTempView("supply_degree_edges")
      GraphQueries.storedGraphNodes(s, dir)
        .createOrReplaceTempView("supply_nodes")
      GraphQueries.storedPageRankRanks(s, dir)
        .createOrReplaceTempView("supply_ranks5")
      GraftSql.registerPageRankContinue(s, "supply_degree_edges",
        "supply_nodes", "supply_ranks5", moreIters = 2,
        outView = "graft_ranks7")
      s.sql("""SELECT node, pr_fx FROM graft_ranks7
               ORDER BY pr_fx DESC, node ASC LIMIT 20""")
    }),

    // CDC chunk dedup through the facade: the repeated-chunk report a
    // storage engineer reads off the chunk view — which fingerprints
    // recur, how many copies, how big. Chunk text never leaves the
    // view; the rollup runs on the 16-byte fingerprints.
    "sql_cdc_dedup" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      GraftSql.registerCdcChunks(s, "documents", "doc_id", "text",
        w = 4, divisor = 8, outView = "graft_chunks")
      s.sql("""SELECT chunk_md5, CAST(count(*) AS BIGINT) AS n_copies,
                 CAST(max(n_tokens) AS BIGINT) AS n_tokens
               FROM graft_chunks GROUP BY chunk_md5
               HAVING count(*) >= 3
               ORDER BY n_copies DESC, chunk_md5 LIMIT 25""")
    }),

    // The SAME dedup report read off the PERSISTED chunk store (the
    // sql_warm_pagerank discipline applied to chunks): a real
    // content-addressed store is chunked once at ingest
    // (ChunkStoreStream / the stored fixture) and every audit after
    // that rolls up 16-byte fingerprints — the token-linear re-chunk
    // that made sql_cdc_dedup the suite's worst sf1 ratio (10.5×)
    // never runs here. Gated by the SAME oracle text: stored ≡
    // re-chunked is exactly the fixture's bit-identity claim.
    "sql_cdc_dedup_stored" -> ((s, dir) => {
      PretrainQueries.storedCdcChunks(s, dir)
        .createOrReplaceTempView("graft_chunk_store")
      s.sql("""SELECT chunk_md5, CAST(count(*) AS BIGINT) AS n_copies,
                 CAST(max(n_tokens) AS BIGINT) AS n_tokens
               FROM graft_chunk_store GROUP BY chunk_md5
               HAVING count(*) >= 3
               ORDER BY n_copies DESC, chunk_md5 LIMIT 25""")
    }),

    // Span-corruption pairs through the facade: the objective-shape
    // census (how many spans per doc, how much noise) a pretrain-data
    // owner reads before committing a corpus build.
    "sql_span_pairs" -> ((s, dir) => {
      Tables.documents(s, dir).createOrReplaceTempView("documents")
      GraftSql.registerSpanCorruption(s, "documents", "doc_id", "text",
        noisePct = 15, outView = "graft_spans")
      s.sql("""SELECT n_spans, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_noise) AS BIGINT) AS tot_noise
               FROM graft_spans GROUP BY n_spans""")
    }),

    // Own deterministic Lloyd k-means through the facade: the fit
    // sample carved in SQL (the same 1/16 xxhash64 gate the stored
    // quantizer uses), the fit through the wrapper, the centroid frame
    // read back in SQL. Gated by the SAME unrolled-Lloyd oracle as
    // ann_quantizer_ivf8 — facade ≡ direct by the hash gate.
    "sql_kmeans" -> ((s, dir) => {
      Tables.embeddings(s, dir).createOrReplaceTempView("embeddings")
      s.sql("""CREATE OR REPLACE TEMP VIEW kmeans_sample AS
               SELECT vec_id, embedding FROM embeddings
               WHERE pmod(xxhash64(vec_id), 16) = 0""")
      GraftSql.registerKmeansFit(s, "kmeans_sample", "embedding",
        "vec_id", k = 8, rounds = 3, outView = "graft_centroids")
      s.sql("""SELECT cell, pos, value FROM graft_centroids
               ORDER BY cell, pos""")
    }),

    // Deterministic quantile sketch through the facade: p90 per event
    // type read in SQL. Same oracle as sketch_quantiles_kmv, filtered
    // on the integer q_ppm.
    "sql_quantiles" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events_ns")
      s.sql("""CREATE OR REPLACE TEMP VIEW metric_rows AS
               SELECT event_type, event_id, value FROM events_ns""")
      GraftSql.registerQuantiles(s, "metric_rows", Seq("event_type"),
        "value", "event_id", k = 256, qPpms = Seq(500000L, 900000L, 990000L),
        outView = "graft_quantiles")
      s.sql("""SELECT event_type, q_ppm, n_sample, round(est, 4) + 0.0 AS est
               FROM graft_quantiles WHERE q_ppm = 900000""")
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
         FROM w WHERE side = 1 GROUP BY user_id""",
    // the facade rows below REUSE the already-passing oracle body of
    // the operator they wrap, with the same SQL composition applied on
    // top — the gate proves wrapper + composition add nothing
    "sql_knn" ->
      s"""SELECT query_id, neighbor_id, rank, cosine
          FROM (${VectorQueries.oracleSql("knn_join_bruteforce")})
          WHERE rank <= 3""",
    "sql_minhash_dedup" ->
      s"""SELECT doc_a, CAST(count(*) AS BIGINT) AS n_pairs,
            max(jaccard) AS max_jaccard
          FROM (${TextQueries.oracleSql("dedup_minhash")})
          GROUP BY doc_a""",
    "sql_scd2" ->
      s"""SELECT state, CAST(count(*) AS BIGINT) AS n_users,
            min(valid_from) AS first_valid_from
          FROM (${WarehouseQueries.oracleSql("scd2_asof")})
          GROUP BY state""",
    "sql_psi_drift" ->
      s"""SELECT bin, n_base, n_cur, psi_term
          FROM (${MlPrepQueries.oracleSql("drift_psi")})
          WHERE n_cur > 0""",
    "sql_funnel" ->
      s"""SELECT n_users, n_view, n_view_click, n_full_funnel,
            (1000000 * n_full_funnel) // n_view AS full_conv_ppm
          FROM (${StreamQueries.oracleSql("funnel_conversion")})""",
    "sql_quantiles" ->
      s"""SELECT * FROM (${WarehouseQueries.oracleSql("sketch_quantiles_kmv")})
          WHERE q_ppm = 900000""",
    // facade ≡ direct: the same unrolled own-Lloyd replay gates both
    "sql_kmeans" -> KmeansSql.ivfOwnOracleSql(k = 8, rounds = 3,
      normalized = false),
    "sql_bt" ->
      s"""SELECT player, n_wins, rating, rank
         FROM (${MlPrepQueries.oracleSql("bt_ratings")})
         WHERE rank <= 3""",
    "sql_fim" ->
      s"""WITH f AS (${PretrainQueries.oracleSql("fim_transform")})
         SELECT fim, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                CAST(sum(length(out_text)) AS BIGINT) AS total_chars
         FROM f GROUP BY fim""",
    "sql_hll_distinct" ->
      s"""WITH h AS (${WarehouseQueries.oracleSql("distinct_hll_replay")})
         SELECT CAST(count(*) AS BIGINT) AS n_groups,
                CAST(sum(n_obs) AS BIGINT) AS total_registers,
                round(CAST(sum(CAST(est AS DECIMAL(18,6))) AS DOUBLE), 4)
                  AS total_est
         FROM h""",
    // facade ≡ direct operator: the SAME oracle text gates both rows
    "sql_doremi" -> TextQueries.oracleSql("mixture_doremi"),
    "sql_preference" ->
      s"""WITH pref AS (${MlPrepQueries.oracleSql("preference_pairs")})
         SELECT chosen_rank, rejected_rank,
                CAST(count(*) AS BIGINT) AS n_pairs,
                round(CAST(sum(CAST(margin AS DECIMAL(18,6))) AS DOUBLE)
                  / count(*), 4) AS avg_margin
         FROM pref GROUP BY chosen_rank, rejected_rank""",
    "sql_taxonomy" ->
      s"""WITH tags AS (${TextQueries.oracleSql("taxonomy_tag")}),
         blocked AS (SELECT doc_id, sum(n_hits) AS blocked_hits
                     FROM tags WHERE category = 'perf' GROUP BY doc_id),
         scr AS (SELECT d.doc_id,
                   coalesce(b.blocked_hits, 0) AS blocked_hits,
                   coalesce(b.blocked_hits, 0) <= 2 AS keep
                 FROM documents d LEFT JOIN blocked b USING (doc_id))
         SELECT keep, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(blocked_hits) AS BIGINT) AS total_hits
         FROM scr GROUP BY keep""",
    "sql_pack" ->
      s"""WITH packed AS (${PretrainQueries.oracleSql("pack_contiguous")})
         SELECT CAST(count(*) AS BIGINT) AS n_docs,
                CAST(max(seq_id) + 1 AS BIGINT) AS total_seqs,
                CAST(sum(CASE WHEN n_seqs > 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_spanning,
                CAST((1000000 * sum(CASE WHEN n_seqs > 1 THEN 1 ELSE 0 END))
                  // count(*) AS BIGINT) AS spanning_ppm
         FROM packed""",
    "sql_warm_pagerank" ->
      s"""SELECT node, pr_fx
          FROM (${GraphQueries.oracleSql("pagerank_warmstart")})
          ORDER BY pr_fx DESC, node ASC LIMIT 20""",
    "sql_cdc_dedup" ->
      s"""${PretrainQueries.chunkCte},
         per AS (SELECT md5(array_to_string(toks[CAST(st AS INT):CAST(fin AS INT)], ' ')) AS chunk_md5,
                   count(*) AS n_copies, max(fin - st + 1) AS n_tokens
                 FROM cc GROUP BY 1)
         SELECT chunk_md5, CAST(n_copies AS BIGINT) AS n_copies,
                CAST(n_tokens AS BIGINT) AS n_tokens
         FROM per WHERE n_copies >= 3
         ORDER BY n_copies DESC, chunk_md5 LIMIT 25""",
    // stored ≡ re-chunked: ONE oracle text gates both facade rows
    "sql_cdc_dedup_stored" ->
      s"""${PretrainQueries.chunkCte},
         per AS (SELECT md5(array_to_string(toks[CAST(st AS INT):CAST(fin AS INT)], ' ')) AS chunk_md5,
                   count(*) AS n_copies, max(fin - st + 1) AS n_tokens
                 FROM cc GROUP BY 1)
         SELECT chunk_md5, CAST(n_copies AS BIGINT) AS n_copies,
                CAST(n_tokens AS BIGINT) AS n_tokens
         FROM per WHERE n_copies >= 3
         ORDER BY n_copies DESC, chunk_md5 LIMIT 25""",
    "sql_span_pairs" ->
      s"""SELECT n_spans, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(n_noise) AS BIGINT) AS tot_noise
          FROM (${PretrainQueries.oracleSql("span_corruption")})
          GROUP BY n_spans""",
    "sql_markov" ->
      s"""SELECT state, p_ppm
          FROM (${StreamQueries.oracleSql("markov_conversion")})
          WHERE p_ppm > 0""",
    "sql_sessionize" ->
      s"""SELECT * FROM (${StreamQueries.oracleSql("stream_sessionize")})
          WHERE n_events >= 3""",
    "sql_histogram" ->
      s"""SELECT * FROM (${AggregateQueries.oracleSql("a12_histogram_sweep")})
          WHERE col_name = 'l_quantity'""",
    "sql_cuped" -> WarehouseQueries.oracleSql("ab_cuped"),
    "sql_winsorize" ->
      s"""SELECT * FROM (${AggregateQueries.oracleSql("a19_winsorize")})
          WHERE l_orderkey % 10 = 0""",
    "sql_weighted_sample" -> TextQueries.oracleSql("weighted_sample"),
    "sql_attribution" ->
      s"""SELECT touch_type, n_conversions_touched, credit_ppm_total,
            credit_ppm_total // 1000000 AS full_credits
          FROM (${WarehouseQueries.oracleSql("attribution_linear")})""",
    "sql_winnowing" ->
      s"""SELECT * FROM (${TextQueries.oracleSql("dedup_winnowing")})
          WHERE fp_jaccard >= 0.5""",
    "sql_retrieval" ->
      s"""SELECT query_id, doc_id, bm25
          FROM (${TextQueries.oracleSql("bm25_batch_topk")})
          WHERE rank = 1""",
    "sql_epoch_order" ->
      s"""SELECT epoch, shard, CAST(count(*) AS BIGINT) AS n_docs,
            max(ord) AS max_ord
          FROM (${TextQueries.oracleSql("training_order")})
          GROUP BY epoch, shard""",
    "sql_prf" ->
      s"""SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits,
            min(rank) AS best_rank, round(max(bm25), 4) AS top_score
          FROM (${TextQueries.oracleSql("bm25_prf_topk")})
          GROUP BY query_id""",
    "sql_shards" -> TextQueries.oracleSql("shard_snake_balance"),
    "sql_leakage_split" ->
      s"""WITH RECURSIVE
         mh_pairs AS (${TextQueries.oracleSql("dedup_minhash")}),
         edges AS (SELECT doc_a AS src, doc_b AS dst FROM mh_pairs
                   UNION SELECT doc_b, doc_a FROM mh_pairs),
         reach(doc, r) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT reach.doc, e.dst FROM reach JOIN edges e ON reach.r = e.src),
         cl AS (SELECT doc AS id, CAST(min(r) AS BIGINT) AS cluster
                FROM reach GROUP BY doc),
         g AS (SELECT id, cluster,
                 CASE WHEN CAST(('0x' || substr(md5(CAST(cluster AS VARCHAR)),
                        1, 4)) AS BIGINT) < 0.2 * 65536
                      THEN 'test' ELSE 'train' END AS split
               FROM cl)
         SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT cluster) AS BIGINT) AS n_clusters
         FROM g GROUP BY split""",
    "sql_components" ->
      s"""SELECT cluster, CAST(count(*) AS BIGINT) AS n_nodes
          FROM (${WarehouseQueries.oracleSql("graph_components")})
          GROUP BY cluster"""
  )
}
