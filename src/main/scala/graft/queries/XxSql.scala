package graft.queries

/** DuckDB-SQL replay of Spark's `xxhash64` over LONG inputs, plus the
  * oracle bodies for the hash-seeded vector-graph queries built on it.
  *
  * Spark's `xxhash64(c1, c2, …)` folds XXH64 over the columns' byte
  * encodings: `h = hashLong(c_i, h)` starting from seed 42, where
  * `hashLong` is the 8-byte-input specialization of XXH64 (one k1
  * round + avalanche). That is pure 64-bit modular integer arithmetic,
  * so it replays EXACTLY in DuckDB — multiplication mod 2^64 via
  * 32-bit limb splitting in HUGEINT, rotation via disjoint-range
  * shift-and-add, xor through UBIGINT. Each hash unrolls to a chain of
  * ~9 single-column CTE steps (nesting the expressions instead would
  * blow up exponentially: every `mul64` references its operand four
  * times).
  *
  * This is what moves NN-descent (`knn_graph`), graph-guided beam
  * search (`graph_search_topk`), and the incremental graph maintenance
  * pair (`knn_graph_insert` / `knn_graph_remove`) from rows-only to
  * full DuckDB hash oracles: their ONLY non-SQL ingredient was the
  * seeded-hash init / seed election; every other step (cosine scoring,
  * top-k windows, frontier set algebra) is plain relational algebra
  * both engines already agree on. Doubles are compared after
  * round-to-4dp, internal rank windows tie-break on ids, and the
  * maintenance merges rank over ALREADY-ROUNDED edge scores, so
  * last-ulp accumulation differences between the engines' dot products
  * cannot flip a row.
  */
private[queries] object XxSql {

  private val M = "18446744073709551616" // 2^64
  private val P1 = "11400714785074694791" // 0x9E3779B185EBCA87 as u64
  private val P2 = "14029467366897019727" // 0xC2B2AE3D27D4EB4F
  private val P3 = "1609587929392839161" // 0x165667B19E3779F9
  private val P4 = "9650029242287828579" // 0x85EBCA77C2B2AE63
  private val P5 = "2870177450012600261" // 0x27D4EB2F165667C5

  /** a·b mod 2^64 with a,b < 2^64, in HUGEINT: split b into 32-bit
    * limbs so every intermediate stays under 2^97 (HUGEINT holds 2^127).
    */
  private def mul64(a: String, b: String): String =
    s"((($a) * (($b) % 4294967296) + ((($a) * (($b) // 4294967296)) % 4294967296) * 4294967296) % $M)"

  /** rotl64: the two shifted halves occupy disjoint bit ranges, so
    * OR = ADD and the left shift is an exact sub-2^64 product.
    */
  private def rotl(a: String, r: Int): String = {
    val lo = BigInt(1) << (64 - r)
    val hi = BigInt(1) << r
    s"(((($a) % $lo) * $hi) + (($a) // $lo))"
  }

  private def xor(a: String, b: String): String =
    s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)"

  private def shr(a: String, n: Int): String = s"(($a) // ${BigInt(1) << n})"

  /** Signed BIGINT expr → its two's-complement u64 value as HUGEINT. */
  def u64(v: String): String =
    s"(((CAST(($v) AS HUGEINT) % $M) + $M) % $M)"

  /** u64 HUGEINT expr → the signed BIGINT Spark's xxhash64 returns. */
  def toSigned(h: String): String =
    s"CAST(CASE WHEN ($h) >= 9223372036854775808 THEN ($h) - $M ELSE ($h) END AS BIGINT)"

  /** The XXH64-of-one-long round as (columnName, expr) steps — apply
    * with [[chain]]. `v` and `seed` are u64 HUGEINT exprs (or prior
    * step columns); the final step lands in column `out`.
    */
  def xx64Steps(v: String, seed: String, out: String, tag: String): Seq[(String, String)] = Seq(
    s"${tag}_h0" -> s"((($seed) + $P5 + 8) % $M)",
    s"${tag}_k3" -> mul64(rotl(mul64(v, P2), 31), P1),
    s"${tag}_h1" -> xor(s"${tag}_h0", s"${tag}_k3"),
    s"${tag}_h2" -> s"((${mul64(rotl(s"${tag}_h1", 27), P1)} + $P4) % $M)",
    s"${tag}_h3" -> xor(s"${tag}_h2", shr(s"${tag}_h2", 33)),
    s"${tag}_h4" -> mul64(s"${tag}_h3", P2),
    s"${tag}_h5" -> xor(s"${tag}_h4", shr(s"${tag}_h4", 29)),
    s"${tag}_h6" -> mul64(s"${tag}_h5", P3),
    out -> xor(s"${tag}_h6", shr(s"${tag}_h6", 32)))

  /** The XXH64-of-one-INT round (Spark hashes 4-byte values through a
    * shorter mix: `h ^= (i & 0xFFFFFFFF)·P1; h = rotl(h,23)·P2 + P3`
    * then the shared avalanche) — needed wherever an IntegerType column
    * or literal sits inside an `xxhash64(...)` fold (`explode(sequence)`
    * positions, small int literals).
    */
  def xxIntSteps(i: String, seed: String, out: String, tag: String): Seq[(String, String)] = Seq(
    s"${tag}_h0" -> s"((($seed) + $P5 + 4) % $M)",
    s"${tag}_h1" -> xor(s"${tag}_h0",
      mul64(s"((($i) % 4294967296 + 4294967296) % 4294967296)", P1)),
    s"${tag}_h2" -> s"((${mul64(rotl(s"${tag}_h1", 23), P2)} + $P3) % $M)",
    s"${tag}_h3" -> xor(s"${tag}_h2", shr(s"${tag}_h2", 33)),
    s"${tag}_h4" -> mul64(s"${tag}_h3", P2),
    s"${tag}_h5" -> xor(s"${tag}_h4", shr(s"${tag}_h4", 29)),
    s"${tag}_h6" -> mul64(s"${tag}_h5", P3),
    out -> xor(s"${tag}_h6", shr(s"${tag}_h6", 32)))

  /** Render hash steps as a chain of one-column-per-layer CTEs rooted
    * at CTE `base`; returns (sqlFragment, lastCteName). Layer-per-step
    * keeps the generated text LINEAR in the number of steps.
    */
  def chain(base: String, steps: Seq[(String, String)], prefix: String): (String, String) = {
    var prev = base
    val sb = new StringBuilder
    steps.zipWithIndex.foreach { case ((name, ex), i) =>
      val cte = s"$prefix$i"
      sb.append(s", $cte AS (SELECT *, $ex AS $name FROM $prev)")
      prev = cte
    }
    (sb.toString, prev)
  }

  /** The `join_size_cms` replay: the FULL count-min inner-product
    * estimator in SQL. Spark's cell key is
    * `pmod(xxhash64(l_partkey, 42 + d), width)` — two chained
    * hashLong rounds (Spark folds each column: partkey under the
    * default seed 42, then the per-depth seed literal under the first
    * round's output). `width` must be a power of two so the u64
    * modulo equals Spark's pmod of the signed value (identical low
    * bits). Per-depth dots are self-products (A = B: the query
    * estimates a self-join), min over depth, ascending per-depth list.
    */
  def cmsJoinSizeOracleSql(width: Int, depth: Int): String = {
    require((width & (width - 1)) == 0, s"width $width must be a power of two")
    val (hashSql, last) = chain("base",
      xx64Steps(u64("k"), "42", "hin", "ca") ++
        xx64Steps("sd", "hin", "hout", "cb"), "cms")
    s"""WITH keys AS (SELECT l_partkey AS k, count(*) AS cnt
         FROM lineitem GROUP BY 1),
       dd AS (SELECT unnest(generate_series(0, ${depth - 1})) AS d),
       base AS (SELECT k, cnt, d, CAST(42 + d AS HUGEINT) AS sd
                FROM keys CROSS JOIN dd)
       $hashSql,
       counters AS (SELECT d, hout % $width AS bucket, sum(cnt) AS c
                    FROM $last GROUP BY 1, 2),
       dots AS (SELECT d, sum(c * c) AS dot FROM counters GROUP BY d)
       SELECT CAST(min(dot) AS BIGINT) AS join_size_est,
              string_agg(CAST(dot AS VARCHAR), ',' ORDER BY dot)
                AS depth_estimates
       FROM dots"""
  }

  // ---------------------------------------------------------------
  // Shared relational fragments for the vector-graph oracles
  // ---------------------------------------------------------------

  /** Exact-cosine scoring of a (src, dst) pair CTE against the `vecs` /
    * `nrm` base CTEs — DuckDB mirror of KnnGraph's score(): dot via
    * unnest-sum in double, divided by precomputed norms. `vecs`/`nrm`
    * always cover the FULL embeddings table (per-id vectors and norms
    * do not depend on which subset a query ranges over — subset
    * semantics live entirely in the pair sets). MATERIALIZED: every
    * consumer references it at least twice and DuckDB would otherwise
    * inline (and re-scan the parquet for) each reference.
    */
  private def scoreSql(pairsCte: String, out: String): String =
    s""", $out AS MATERIALIZED (
       SELECT p.src, p.dst, dp.dp / (ns.nm * nd.nm) AS cos
       FROM $pairsCte p
       JOIN (SELECT p2.src, p2.dst,
               sum(CAST(es.embedding[CAST(g.i AS INT)] AS DOUBLE) * CAST(ed.embedding[CAST(g.i AS INT)] AS DOUBLE)) AS dp
             FROM $pairsCte p2
             JOIN vecs es ON es.id = p2.src
             JOIN vecs ed ON ed.id = p2.dst,
             LATERAL (SELECT unnest(generate_series(1, len(es.embedding))) AS i) g
             GROUP BY p2.src, p2.dst) dp ON dp.src = p.src AND dp.dst = p.dst
       JOIN nrm ns ON ns.id = p.src
       JOIN nrm nd ON nd.id = p.dst)"""

  /** Per-src top-k by (cos DESC, dst ASC) — KnnGraph's topK window. */
  private def topkSql(scoredCte: String, out: String, k: Int): String =
    s""", $out AS MATERIALIZED (SELECT src, dst, cos FROM (
       SELECT src, dst, cos, row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst ASC) AS rk
       FROM $scoredCte) WHERE rk <= $k)"""

  /** The full NN-descent replay as a WITH-clause body over the corpus
    * subset `corpusWhere` (a predicate on `id`): seeded double-bucket
    * init (`pmod(xxhash64(id, seed+salt), n div (k+1))`), then `iters`
    * rounds of 2-hop candidate generation + rescoring + top-k.
    * Returns (sql, finalGraphCte) where the graph CTE is
    * (src, dst, cos) with UNROUNDED cos; `sql` opens with "WITH" so
    * callers append their own CTEs and final SELECT.
    */
  def nnDescentReplay(k: Int, iters: Int, corpusWhere: String = "TRUE"): (String, String) = {
    val sb = new StringBuilder
    sb.append(s"""WITH vecs AS MATERIALIZED (SELECT vec_id AS id, embedding FROM embeddings),
       nrm AS MATERIALIZED (SELECT id, sqrt(sum(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * CAST(embedding[CAST(i AS INT)] AS DOUBLE))) AS nm
               FROM (SELECT id, unnest(generate_series(1, len(embedding))) AS i, embedding FROM vecs) GROUP BY id),
       corpus AS MATERIALIZED (SELECT id FROM vecs WHERE $corpusWhere),
       nn AS (SELECT greatest(CAST(1 AS HUGEINT), CAST(count(*) AS HUGEINT) // ${k + 1}) AS nb FROM corpus),
       hbase AS (SELECT id, ${u64("id")} AS uid FROM corpus)""")
    val (s0, l0) = chain("hbase", xx64Steps("uid", "42", "t_h", "ta"), "hx")
    sb.append(s0)
    val (s1, l1) = chain(l0, xx64Steps("42", "t_h", "b0h", "sa"), "hy")
    sb.append(s1)
    val (s2, l2) = chain(l1, xx64Steps("43", "t_h", "b1h", "sb"), "hz")
    sb.append(s2)
    sb.append(s""",
       bk AS MATERIALIZED (SELECT id,
         (((${toSigned("b0h")} % nb) + nb) % nb) AS b0,
         (((${toSigned("b1h")} % nb) + nb) % nb) AS b1
         FROM $l2 CROSS JOIN nn),
       pairs0 AS MATERIALIZED (
         SELECT DISTINCT src, dst FROM (
           SELECT a.id AS src, b.id AS dst FROM bk a JOIN bk b ON a.b0 = b.b0 WHERE a.id <> b.id
           UNION ALL
           SELECT a.id AS src, b.id AS dst FROM bk a JOIN bk b ON a.b1 = b.b1 WHERE a.id <> b.id))""")
    sb.append(scoreSql("pairs0", "sc0"))
    sb.append(topkSql("sc0", "g0", k))
    var g = "g0"
    (1 to iters).foreach { it =>
      sb.append(s""",
       und$it AS (SELECT src, dst FROM $g UNION ALL SELECT dst AS src, src AS dst FROM $g),
       cand$it AS MATERIALIZED (
         SELECT DISTINCT a.src, b.dst FROM und$it a JOIN und$it b ON a.dst = b.src
         WHERE a.src <> b.dst),
       fresh$it AS MATERIALIZED (SELECT c.src, c.dst FROM cand$it c ANTI JOIN $g e ON c.src = e.src AND c.dst = e.dst)""")
      sb.append(scoreSql(s"fresh$it", s"scn$it"))
      sb.append(s""",
       mrg$it AS (SELECT src, dst, cos FROM scn$it UNION ALL SELECT src, dst, cos FROM $g)""")
      sb.append(topkSql(s"mrg$it", s"g$it", k))
      g = s"g$it"
    }
    (sb.toString, g)
  }

  /** The graph-guided beam search replay (KnnGraph.graphSearch): elect
    * `seedsPerQuery` shared entry nodes from the `seedsWhere` corpus
    * subset by the salted-hash order, then `hops` rounds of frontier =
    * (beam ⋈ undirected `graphCte` edges) \ beam, rescored and merged
    * under the per-query top-`beam` window. Returns (sql, beamCte)
    * where the beam CTE is (src = query_id, dst = node_id, cos)
    * UNROUNDED, pre-top-k — callers cut to k and round.
    */
  def beamSearchReplay(graphCte: String, seedsWhere: String,
      queriesWhere: String, beam: Int, hops: Int,
      seedsPerQuery: Int): (String, String) = {
    val sb = new StringBuilder
    sb.append(s""",
       sbase AS (SELECT id, ${u64("id")} AS uid FROM vecs WHERE $seedsWhere)""")
    val (q0, lq0) = chain("sbase", xx64Steps("uid", "42", "q_t", "qa"), "qx")
    sb.append(q0)
    val (q1, lq1) = chain(lq0, xx64Steps("42", "q_t", "q_h", "qb"), "qy")
    sb.append(q1)
    sb.append(s""",
       seeds AS MATERIALIZED (SELECT id AS node_id FROM $lq1
         ORDER BY ${toSigned("q_h")} ASC, id ASC LIMIT $seedsPerQuery),
       queries AS MATERIALIZED (SELECT id AS query_id FROM vecs WHERE $queriesWhere),
       seeded AS (SELECT q.query_id AS src, s.node_id AS dst FROM queries q CROSS JOIN seeds s
                  WHERE s.node_id <> q.query_id)""")
    val (walk, bm) = beamSearchReplayFromSeeded(graphCte, "seeded", beam, hops)
    sb.append(walk)
    (sb.toString, bm)
  }

  /** The beam walk given an ALREADY-BUILT entry-pair CTE
    * `(src=query_id, dst=seed node)` — per-query IVF medoid seeds,
    * precomputed warm starts, anything. The caller's CTE must mirror
    * graphSearch's seed semantics: self-pairs excluded, multiplicity
    * preserved (duplicate seed rows score twice there too).
    */
  def beamSearchReplayFromSeeded(graphCte: String, seededCte: String,
      beam: Int, hops: Int): (String, String) = {
    val sb = new StringBuilder
    sb.append(scoreSql(seededCte, "bs0"))
    sb.append(topkSql("bs0", "beam0", beam))
    sb.append(s""",
       gund AS MATERIALIZED (SELECT src AS a, dst AS b FROM $graphCte UNION ALL SELECT dst AS a, src AS b FROM $graphCte)""")
    var bm = "beam0"
    (1 to hops).foreach { h =>
      sb.append(s""",
       fr$h AS MATERIALIZED (
         SELECT f.src, f.dst FROM (
           SELECT DISTINCT bmr.src, u.b AS dst FROM $bm bmr JOIN gund u ON u.a = bmr.dst) f
         ANTI JOIN $bm e ON f.src = e.src AND f.dst = e.dst
         WHERE f.src <> f.dst)""")
      sb.append(scoreSql(s"fr$h", s"bs$h"))
      sb.append(s""",
       bmrg$h AS (SELECT src, dst, cos FROM $bm UNION ALL SELECT src, dst, cos FROM bs$h)""")
      sb.append(topkSql(s"bmrg$h", s"beam$h", beam))
      bm = s"beam$h"
    }
    (sb.toString, bm)
  }

  /** Final (id, neighbor_id, rank, cosine) projection shared by every
    * graph-shaped oracle: per-src rank over (cos DESC, dst ASC), cos
    * rounded iff `roundCos` (the maintenance merges rank over
    * already-rounded scores and must NOT round twice).
    */
  private def rankedOut(fromCte: String, srcAs: String,
      roundCos: Boolean): String = {
    val cosOut = if (roundCos) "round(cos, 4)" else "cos"
    s"""
       SELECT src AS $srcAs, dst AS neighbor_id,
         CAST(row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst ASC) AS BIGINT) AS rank,
         $cosOut AS cosine
       FROM $fromCte"""
  }

  /** Oracle for `knn_graph`: the NN-descent replay plus the final
    * rank/round projection.
    */
  def knnGraphOracleSql(k: Int, iters: Int): String = {
    val (body, g) = nnDescentReplay(k, iters)
    body + rankedOut(g, "id", roundCos = true)
  }

  /** Oracle for `graph_search_topk`: rebuild the stored graph, elect
    * hash seeds over the full corpus, beam-search the `id % queryMod`
    * queries, top-`searchK`.
    */
  def graphSearchOracleSql(k: Int, iters: Int, beam: Int, hops: Int,
      seedsPerQuery: Int, searchK: Int, queryMod: Int): String = {
    val sb = new StringBuilder
    val (body, g) = nnDescentReplay(k, iters)
    sb.append(body)
    val (search, bm) = beamSearchReplay(g, "TRUE", s"id % $queryMod = 0",
      beam, hops, seedsPerQuery)
    sb.append(search)
    sb.append(topkSql(bm, "bfin", searchK))
    sb.append(rankedOut("bfin", "query_id", roundCos = true))
    sb.toString
  }

  /** Oracle for `graph_search_ivf_seeded`: the same NN-descent graph +
    * beam walk as [[graphSearchOracleSql]], but entered from per-query
    * IVF medoid seeds derived from the DUMPED `ann_quantizer_ivf8`
    * centroids — KnnGraph.ivfSeeds replayed exactly: cell assignment by
    * the reduced ||c||²−2·v·c form with (d, cell) ties, medoid election
    * by TRUE squared distance (the member's own Σv² added back) with
    * (d, id) ties, the query's `nprobe` cells by the reduced form, and
    * seed multiplicity preserved (two probed cells sharing a medoid
    * score it twice, as Spark does).
    */
  def graphSearchIvfSeededOracleSql(k: Int, iters: Int, beam: Int,
      hops: Int, searchK: Int, queryMod: Int, nprobe: Int): String = {
    val sb = new StringBuilder
    val (body, g) = nnDescentReplay(k, iters)
    sb.append(body)
    sb.append(s""",
       icent AS (SELECT CAST(cell AS INT) AS cell, CAST(pos AS INT) AS pos, value
         FROM read_parquet('__VERIFY_OUT__/ann_quantizer_ivf8/*.parquet')),
       icn AS (SELECT cell, sum(value * value) AS n2 FROM icent GROUP BY cell),
       ivd AS (SELECT v.id, c.cell,
           sum(CAST(v.embedding[c.pos + 1] AS DOUBLE) * c.value) AS dp
         FROM vecs v CROSS JOIN icent c GROUP BY v.id, c.cell),
       vsq AS (SELECT id,
           sum(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
             * CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS s2
         FROM (SELECT id, unnest(generate_series(1, len(embedding))) AS i,
                 embedding FROM vecs) GROUP BY id),
       iasg AS (SELECT id, cell, d FROM (
           SELECT v.id, v.cell, icn.n2 - 2 * v.dp AS d,
             row_number() OVER (PARTITION BY v.id
               ORDER BY icn.n2 - 2 * v.dp ASC, v.cell ASC) AS rk
           FROM ivd v JOIN icn USING (cell)) WHERE rk = 1),
       med AS (SELECT cell, id AS node_id FROM (
           SELECT a.cell, a.id,
             row_number() OVER (PARTITION BY a.cell
               ORDER BY a.d + v.s2 ASC, a.id ASC) AS rk
           FROM iasg a JOIN vsq v ON v.id = a.id) WHERE rk = 1),
       qpr AS (SELECT id AS query_id, cell FROM (
           SELECT v.id, v.cell,
             row_number() OVER (PARTITION BY v.id
               ORDER BY icn.n2 - 2 * v.dp ASC, v.cell ASC) AS rk
           FROM ivd v JOIN icn USING (cell)
           WHERE v.id % $queryMod = 0) WHERE rk <= $nprobe),
       iseeded AS (SELECT q.query_id AS src, m.node_id AS dst
         FROM qpr q JOIN med m USING (cell)
         WHERE m.node_id <> q.query_id)""")
    val (search, bm) = beamSearchReplayFromSeeded(g, "iseeded", beam, hops)
    sb.append(search)
    sb.append(topkSql(bm, "bfin", searchK))
    sb.append(rankedOut("bfin", "query_id", roundCos = true))
    sb.toString
  }

  /** Oracle for `knn_graph_insert`: NN-descent on the `id % 10 <> 0`
    * corpus, beam-search the fresh batch into it (new→old), reverse
    * those edges (old→new), exact new↔new top-k within the batch, then
    * the incumbent ∪ all three merged under max-dedup + per-src top-k —
    * every merge input carries its ROUNDED score, exactly as the Spark
    * operator consumes its sub-results.
    */
  def knnGraphInsertOracleSql(k: Int, iters: Int, beam: Int,
      hops: Int, seedsPerQuery: Int, batchMod: Int): String = {
    val oldW = s"id % $batchMod <> 0"
    val newW = s"id % $batchMod = 0"
    val sb = new StringBuilder
    val (body, g) = nnDescentReplay(k, iters, oldW)
    sb.append(body)
    val (search, bm) = beamSearchReplay(g, oldW, newW, beam, hops, seedsPerQuery)
    sb.append(search)
    // new→old: beam output cut to k, rounded (graphSearch's contract)
    sb.append(topkSql(bm, "no_k", k))
    // new↔new: brute-force top-k within the batch (knnJoinBruteForce —
    // ranks on the unrounded cos, outputs rounded)
    sb.append(s""",
       newids AS MATERIALIZED (SELECT id FROM vecs WHERE $newW),
       nnp AS (SELECT a.id AS src, b.id AS dst FROM newids a JOIN newids b ON a.id <> b.id)""")
    sb.append(scoreSql("nnp", "nnsc"))
    sb.append(topkSql("nnsc", "nn_k", k))
    sb.append(s""",
       merged AS (
         SELECT src, dst, max(cos) AS cos FROM (
           SELECT src, dst, round(cos, 4) AS cos FROM $g
           UNION ALL SELECT src, dst, round(cos, 4) AS cos FROM no_k
           UNION ALL SELECT dst AS src, src AS dst, round(cos, 4) AS cos FROM no_k
           UNION ALL SELECT src, dst, round(cos, 4) AS cos FROM nn_k)
         GROUP BY src, dst),
       ranked AS (SELECT src, dst, cos FROM (
         SELECT src, dst, cos, row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst ASC) AS rk
         FROM merged) WHERE rk <= $k)""")
    sb.append(rankedOut("ranked", "id", roundCos = false))
    sb.toString
  }

  /** Oracle for `knn_graph_remove`: NN-descent on the full corpus,
    * prune every edge touching a removed id, re-search ONLY the nodes
    * that lost a neighbor against the pruned graph (seeds elected from
    * survivors), merge kept ∪ refill under max-dedup + per-src top-k.
    */
  def knnGraphRemoveOracleSql(k: Int, iters: Int, beam: Int,
      hops: Int, seedsPerQuery: Int, removeMod: Int): String = {
    val remW = s"id % $removeMod = 0"
    val survW = s"id % $removeMod <> 0"
    val sb = new StringBuilder
    val (body, g) = nnDescentReplay(k, iters)
    sb.append(body)
    sb.append(s""",
       kept AS MATERIALIZED (
         SELECT src, dst, round(cos, 4) AS cos FROM $g
         WHERE NOT (src % $removeMod = 0) AND NOT (dst % $removeMod = 0)),
       keptg AS (SELECT src, dst FROM kept)""")
    // affected: survivors whose list lost a neighbor
    sb.append(s""",
       affected AS MATERIALIZED (
         SELECT DISTINCT src AS id FROM $g
         WHERE dst % $removeMod = 0 AND NOT (src % $removeMod = 0))""")
    val (search, bm) = beamSearchReplay("keptg", survW,
      s"($survW) AND id IN (SELECT id FROM affected)", beam, hops, seedsPerQuery)
    sb.append(search)
    sb.append(topkSql(bm, "rf_k", k))
    sb.append(s""",
       merged AS (
         SELECT src, dst, max(cos) AS cos FROM (
           SELECT src, dst, cos FROM kept
           UNION ALL SELECT src, dst, round(cos, 4) AS cos FROM rf_k)
         GROUP BY src, dst),
       ranked AS (SELECT src, dst, cos FROM (
         SELECT src, dst, cos, row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst ASC) AS rk
         FROM merged) WHERE rk <= $k)""")
    sb.append(rankedOut("ranked", "id", roundCos = false))
    sb.toString
  }

  /** Oracle for `embedding_top_pc` — the power iteration unrolled:
    * per-pos mean, trace from the total second moment, then `iters`
    * rounds of y = E[x(x·v)] − µ(µ·v) and L2 renormalization, each
    * round one (rid ⋈ pos) join-aggregate pair over the flattened
    * vectors. No hashing here at all — the operator was rows-only only
    * because of its iterative double math, but power iteration
    * CONTRACTS toward the dominant eigenvector, so cross-engine ulp
    * dust decays instead of compounding and the 4dp gate holds (unlike
    * g7's epoch 2, where SGD drift compounds — that one stays
    * rows-only by design).
    */
  def topPcOracleSql(iters: Int): String = {
    val sb = new StringBuilder
    sb.append("""WITH x AS MATERIALIZED (
      SELECT vec_id AS rid, CAST(i AS INT) - 1 AS pos,
             CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS val
      FROM (SELECT vec_id, unnest(generate_series(1, len(embedding))) AS i, embedding
            FROM embeddings WHERE embedding IS NOT NULL)),
     nct AS (SELECT CAST(count(DISTINCT rid) AS DOUBLE) AS n FROM x),
     mu AS MATERIALIZED (SELECT pos, sum(val) / (SELECT n FROM nct) AS mu FROM x GROUP BY pos),
     ss AS (SELECT sum(val * val) AS s2 FROM x),
     trace AS (SELECT (SELECT s2 FROM ss) / (SELECT n FROM nct)
               - (SELECT sum(mu * mu) FROM mu) AS tr),
     v0 AS (SELECT pos, 1.0 / (pos + 1) AS val FROM mu)""")
    var prev = "v0"
    (1 to iters).foreach { k =>
      sb.append(s""",
     dk$k AS MATERIALIZED (SELECT x.rid, sum(x.val * v.val) AS s
            FROM x JOIN $prev v USING (pos) GROUP BY x.rid),
     yk$k AS (SELECT x.pos, sum(x.val * d.s) / (SELECT n FROM nct) AS y
            FROM x JOIN dk$k d USING (rid) GROUP BY x.pos),
     md$k AS (SELECT sum(m.mu * v.val) AS mdv FROM mu m JOIN $prev v USING (pos)),
     cy$k AS MATERIALIZED (SELECT y.pos, y.y - m.mu * (SELECT mdv FROM md$k) AS c
            FROM yk$k y JOIN mu m USING (pos)),
     nr$k AS (SELECT sqrt(sum(c * c)) AS nrm FROM cy$k),
     v$k AS MATERIALIZED (SELECT pos, c / (SELECT nrm FROM nr$k) AS val FROM cy$k)""")
      prev = s"v$k"
    }
    sb.append(s"""
     SELECT CAST(pos AS BIGINT) AS pos, val AS loading,
            (SELECT nrm FROM nr$iters) AS eigenvalue,
            CASE WHEN (SELECT tr FROM trace) > 0
                 THEN (SELECT nrm FROM nr$iters) / (SELECT tr FROM trace)
                 ELSE 0.0 END AS variance_share
     FROM v$iters""")
    sb.toString
  }

  /** Oracle for `g7_embedding_epoch1` — ONE epoch of the KG-embedding
    * trainer unrolled (EmbeddingTrainer.train with epochs = 1,
    * batchFraction = 1, negRate = 1, trackLoss = false):
    *
    *  1. init: value(id,pos) = (pmod(xxhash64(id, pos, tableSeed), 1e6)
    *     / 5e5 − 1) / √dim, with tableSeed 42 for entities / 43 for
    *     relations — the (long, int, long) hash fold, replayed with
    *     [[xx64Steps]] + [[xxIntSteps]];
    *  2. negatives: per positive, a coin and a corrupt-entity draw from
    *     the (head, rel, tail, rep, epochSeed) fold + its rehash —
    *     exactly Triplets.negativeSample(rate = 1, seed = 43);
    *  3. scores s_h + r_r − s_t from per-id value sums, g = σ(score) −
    *     label, per-id mean gradients, weight-decayed SGD step.
    *
    * Doubles flow unrounded to the final round-4dp projection, matching
    * the trainer; both engines' sums/exp differ by ulps at most, and
    * the gate canonicalizes at 4dp.
    */
  def embeddingEpoch1OracleSql(dim: Int, lr: Double, regRatio: Double,
      numRelations: Int): String =
    embeddingEpochsOracleSql(dim, lr, regRatio, numRelations, epochs = 1)

  /** The N-epoch generalization: each epoch re-draws its negatives with
    * that epoch's seed (cfg.seed + epoch = 42 + ep, exactly the
    * trainer's loop) and steps from the PREVIOUS epoch's unrounded
    * values. Epoch 2's cross-engine drift is bounded by epoch 1's ulp
    * dust times one more lr-scaled arithmetic layer — far inside the
    * 4dp gate for small epoch counts, which is what lets the full
    * `g7_embedding_train` (2 epochs) hash-match, not just epoch 1.
    */
  def embeddingEpochsOracleSql(dim: Int, lr: Double, regRatio: Double,
      numRelations: Int, epochs: Int): String = {
    require(epochs >= 1, s"need epochs >= 1; got $epochs")
    val b = 1.0 / math.sqrt(dim.toDouble)
    val sb = new StringBuilder
    sb.append(s"""WITH nct AS (SELECT count(*) AS n FROM embeddings),
       ids AS (SELECT vec_id AS id FROM embeddings),
       rids AS (SELECT unnest(generate_series(0, ${numRelations - 1})) AS id),
       ebase AS (SELECT 'e' AS tbl, id, unnest(generate_series(0, ${dim - 1})) AS pos FROM ids
                 UNION ALL SELECT 'r' AS tbl, id, unnest(generate_series(0, ${dim - 1})) AS pos FROM rids),
       ub AS (SELECT *, ${u64("id")} AS uid FROM ebase)""")
    val (i0, li0) = chain("ub", xx64Steps("uid", "42", "i_t1", "ia"), "ix")
    sb.append(i0)
    val (i1, li1) = chain(li0, xxIntSteps("pos", "i_t1", "i_t2", "ib"), "iy")
    sb.append(i1)
    val (i2, li2) = chain(li1,
      xx64Steps("CASE WHEN tbl = 'e' THEN 42 ELSE 43 END", "i_t2", "i_h", "ic"), "iz")
    sb.append(i2)
    sb.append(s""",
       init AS MATERIALIZED (SELECT tbl, id, pos,
         ((((${toSigned("i_h")} % 1000000) + 1000000) % 1000000) / 500000.0 - 1.0) * $b AS value
         FROM $li2),
       edges AS (SELECT vec_id AS head_id, vec_id % $numRelations AS relation_id,
                 (vec_id + 7) % (SELECT n FROM nct) AS tail_id FROM embeddings),
       ebu AS (SELECT *, ${u64("head_id")} AS uh FROM edges)""")
    var state = "init"
    for (ep <- 1 to epochs) {
      val negSeed = 42 + ep
      val (n0, ln0) = chain("ebu", xx64Steps("uh", "42", "n_t1", s"na$ep"), s"nx${ep}_")
      sb.append(n0)
      val (n1, ln1) = chain(ln0, xx64Steps(u64("relation_id"), "n_t1", "n_t2", s"nb$ep"), s"ny${ep}_")
      sb.append(n1)
      val (n2, ln2) = chain(ln1, xx64Steps(u64("tail_id"), "n_t2", "n_t3", s"nc$ep"), s"nz${ep}_")
      sb.append(n2)
      val (n3, ln3) = chain(ln2, xxIntSteps("0", "n_t3", "n_t4", s"nd$ep"), s"nw${ep}_")
      sb.append(n3)
      val (n4, ln4) = chain(ln3, xx64Steps(s"$negSeed", "n_t4", "n_h", s"ne$ep"), s"nv${ep}_")
      sb.append(n4)
      val (c0, lc0) = chain(ln4, xx64Steps(u64(toSigned("n_h")), "42", "c_t", s"ca$ep"), s"cx${ep}_")
      sb.append(c0)
      val (c1, lc1) = chain(lc0, xxIntSteps("1", "c_t", "c_h", s"cb$ep"), s"cy${ep}_")
      sb.append(c1)
      sb.append(s""",
       negs$ep AS MATERIALIZED (
         SELECT CASE WHEN coin THEN ce ELSE head_id END AS head_id,
                relation_id,
                CASE WHEN NOT coin THEN ce ELSE tail_id END AS tail_id,
                0 AS label
         FROM (SELECT head_id, relation_id, tail_id,
                 (((${toSigned("n_h")} % 2) + 2) % 2) = 0 AS coin,
                 (((${toSigned("c_h")} % (SELECT n FROM nct)) + (SELECT n FROM nct)) % (SELECT n FROM nct)) AS ce
               FROM $lc1)),
       batch$ep AS MATERIALIZED (
         SELECT * FROM negs$ep
         UNION ALL SELECT head_id, relation_id, tail_id, 1 AS label FROM edges),
       sums$ep AS MATERIALIZED (SELECT tbl, id, sum(value) AS vsum FROM $state GROUP BY tbl, id),
       scored$ep AS MATERIALIZED (
         SELECT b.head_id, b.relation_id, b.tail_id, b.label,
                1.0 / (1.0 + exp(-(hs.vsum + rs.vsum - ts.vsum))) - CAST(b.label AS DOUBLE) AS g
         FROM batch$ep b
         JOIN (SELECT id, vsum FROM sums$ep WHERE tbl = 'e') hs ON hs.id = b.head_id
         JOIN (SELECT id, vsum FROM sums$ep WHERE tbl = 'r') rs ON rs.id = b.relation_id
         JOIN (SELECT id, vsum FROM sums$ep WHERE tbl = 'e') ts ON ts.id = b.tail_id),
       grad$ep AS MATERIALIZED (
         SELECT tbl, id, sum(g) / count(*) AS grad FROM (
           SELECT 'e' AS tbl, head_id AS id, g FROM scored$ep
           UNION ALL SELECT 'e' AS tbl, tail_id AS id, -g AS g FROM scored$ep
           UNION ALL SELECT 'r' AS tbl, relation_id AS id, g FROM scored$ep)
         GROUP BY tbl, id),
       stepped$ep AS MATERIALIZED (
         SELECT i.tbl, i.id, i.pos,
           i.value * (CASE WHEN i.tbl = 'e'
               THEN 1.0 - $lr * 2.0 * $regRatio / ((SELECT CAST(n AS DOUBLE) FROM nct) * $dim)
               ELSE 1.0 - $lr * 2.0 * $regRatio / (${numRelations.toDouble} * $dim) END)
             - $lr * coalesce(g.grad, 0.0) AS value
         FROM $state i LEFT JOIN grad$ep g ON g.tbl = i.tbl AND g.id = i.id)""")
      state = s"stepped$ep"
    }
    sb.append(s"""
       SELECT id AS entity_id, CAST(pos AS BIGINT) AS pos, round(value, 4) AS value
       FROM $state WHERE tbl = 'e'""")
    sb.toString
  }
}
