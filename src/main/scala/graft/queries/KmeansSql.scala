package graft.queries

/** DuckDB-SQL replay of [[graft.operators.LloydKmeans]] — the unrolled
  * deterministic Lloyd fits that hash-gate the IVF quantizer and PQ
  * codebook dumps themselves (previously rows-only "MLlib float
  * trajectory" census entries).
  *
  * Round structure mirrors the operator exactly:
  *   - sample filter + seed ranking share ONE [[XxSql]] hash chain
  *     (`pmod(xxhash64(vec_id), 16) = 0` picks the fit sample; the
  *     same signed hash ranks the init seeds);
  *   - element values are grid-snapped (`CAST(double AS DECIMAL(20,10))
  *     AS DOUBLE`) before any distance math;
  *   - each round: assignment by `argmin(||c||² − 2·v·c)` with
  *     (d, cell) ties, then the DECIMAL-snapped mean
  *     `CAST(CAST(Σ DECIMAL(30,10) AS DOUBLE)/n AS DECIMAL(20,10))`,
  *     empty cells keeping their previous centroid via the LEFT JOIN
  *     coalesce.
  */
private[queries] object KmeansSql {

  /** Mean-update snap: decimal-sum the grid values (order-free),
    * divide in double, land back on the grid.
    */
  private def snapMean(v: String): String =
    s"CAST(CAST(CAST(sum(CAST($v AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS DECIMAL(20,10)) AS DOUBLE)"

  /** Shared prologue: grid-snapped per-element values `elems(vec_id,
    * i, v)` (raw or L2-normalized), the xxhash64 chain, and the
    * `samp(vec_id, h)` 1/16 fit sample with its signed hash.
    *
    * ACCEPTED CROSS-ENGINE FREEDOM (r18 advice): in the normalized
    * prologue the L2 norm itself is a plain double sum of squares —
    * Spark folds the array in element order, DuckDB streams the group
    * in storage order — so the PRE-snap product `v · (1/nrm)` can
    * differ in its last ulp between engines. The 1e-10 snap then maps
    * both to the same grid point unless the true value sits within
    * ~1 ulp (≈1e-16 at |v|≤1) of a grid MIDPOINT: per element that is
    * a ~1e-6 event, and the driver's gate runs on the sf0.01 sample
    * (~31 vectors × d=16 elements), putting the expected failure rate
    * below 1e-3 per full verify run. The same freedom applies to the
    * assignment dot products (documented below). If one of the six
    * quantizer/codebook gates ever hash-fails in isolation while its
    * raw sibling passes, re-run before diagnosing — see the verify
    * skill's gotcha note. Snapping per-element SQUARES before the norm
    * sum would remove the freedom but changes the fitted trajectory on
    * both engines (every downstream ANN fixture re-baselines), so the
    * documented-freedom route was chosen deliberately.
    */
  private def prologue(normalized: Boolean): String = {
    val elems =
      if (!normalized)
        """elems AS MATERIALIZED (SELECT vec_id, CAST(i AS INT) AS i,
             CAST(CAST(CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS DECIMAL(20,10)) AS DOUBLE) AS v
           FROM (SELECT vec_id, embedding,
                   unnest(generate_series(1, len(embedding))) AS i
                 FROM embeddings))"""
      else
        """nrm0 AS (SELECT vec_id,
             sqrt(sum(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
                    * CAST(embedding[CAST(i AS INT)] AS DOUBLE))) AS nrm
           FROM (SELECT vec_id, embedding,
                   unnest(generate_series(1, len(embedding))) AS i
                 FROM embeddings)
           GROUP BY vec_id),
           elems AS MATERIALIZED (SELECT vec_id, CAST(i AS INT) AS i,
             CAST(CAST(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * (1.0 / nrm)
               AS DECIMAL(20,10)) AS DOUBLE) AS v
           FROM (SELECT e.vec_id, e.embedding, n.nrm,
                   unnest(generate_series(1, len(e.embedding))) AS i
                 FROM embeddings e JOIN nrm0 n USING (vec_id)))"""
    val sb = new StringBuilder
    sb.append(s"""WITH $elems,
       hb AS (SELECT vec_id, ${XxSql.u64("vec_id")} AS uid FROM embeddings)""")
    val (hash, last) = XxSql.chain("hb",
      XxSql.xx64Steps("uid", "42", "km_h", "kma"), "kmx")
    sb.append(hash)
    sb.append(s""",
       samp AS MATERIALIZED (SELECT vec_id, ${XxSql.toSigned("km_h")} AS h
         FROM $last
         WHERE ((${XxSql.toSigned("km_h")} % 16) + 16) % 16 = 0),
       se AS MATERIALIZED (SELECT e.vec_id, e.i, e.v
         FROM elems e JOIN samp USING (vec_id))""")
    sb.toString
  }

  /** Oracle for the `ann_quantizer_*` dumps: `rounds` unrolled Lloyd
    * iterations of a k-cell coarse quantizer over the 1/16 sample of
    * (raw | normalized) grid-snapped embeddings. Output matches
    * `centroidsToDF`'s (cell INT, pos INT, value DOUBLE).
    */
  def ivfOwnOracleSql(k: Int, rounds: Int, normalized: Boolean): String = {
    val sb = new StringBuilder
    sb.append(prologue(normalized))
    sb.append(s""",
       rk AS (SELECT vec_id, row_number() OVER (ORDER BY h ASC, vec_id ASC) AS r
              FROM samp),
       c0 AS MATERIALIZED (SELECT r.r - 1 AS cell, se.i - 1 AS pos, se.v AS value
              FROM rk r JOIN se ON se.vec_id = r.vec_id WHERE r.r <= $k)""")
    val (roundsSql, last) = lloydRoundsSql(rounds)
    sb.append(roundsSql)
    sb.append(s"""
       SELECT CAST(cell AS INT) AS cell, CAST(pos AS INT) AS pos, value
       FROM $last""")
    sb.toString
  }

  /** The unrolled Lloyd round CTEs shared by both generators: reads the
    * `se(vec_id, i, v)` sample elements and the `c0(cell, pos, value)`
    * init; returns (sql, finalCentroidCte).
    */
  private def lloydRoundsSql(rounds: Int): (String, String) = {
    val sb = new StringBuilder
    var prev = "c0"
    for (t <- 1 to rounds) {
      sb.append(s""",
       cn$t AS (SELECT cell, sum(value * value) AS n2 FROM $prev GROUP BY cell),
       vd$t AS (SELECT s.vec_id, c.cell, sum(s.v * c.value) AS dp
                FROM se s JOIN $prev c ON c.pos + 1 = s.i
                GROUP BY s.vec_id, c.cell),
       asg$t AS (SELECT vec_id, cell FROM (
                 SELECT vd.vec_id, vd.cell,
                   row_number() OVER (PARTITION BY vd.vec_id
                     ORDER BY cn.n2 - 2 * vd.dp ASC, vd.cell ASC) AS rk2
                 FROM vd$t vd JOIN cn$t cn USING (cell)) WHERE rk2 = 1),
       mu$t AS (SELECT a.cell, s.i - 1 AS pos, ${snapMean("s.v")} AS mu
                FROM se s JOIN asg$t a USING (vec_id)
                GROUP BY a.cell, s.i),
       c$t AS MATERIALIZED (SELECT c.cell, c.pos, coalesce(m.mu, c.value) AS value
                FROM $prev c LEFT JOIN mu$t m
                  ON m.cell = c.cell AND m.pos = c.pos)""")
      prev = s"c$t"
    }
    (sb.toString, prev)
  }

  /** Generic fit-then-ASSIGN replay over caller-provided feature
    * vectors: `elemsSql` is a WITH-body fragment (no leading WITH)
    * whose last CTE is `elems(vec_id BIGINT, i INT 1-based, v DOUBLE
    * grid-snapped)`. The fit trains on ALL ids (no sample filter —
    * callers cluster bounded feature frames), seeds rank by the same
    * xxhash64 chain, and the output is every row's final-round cluster
    * — `(idOut, cluster)`, matching LloydKmeans.fitIvfOwn +
    * assignToCentroids on the same snapped vectors.
    */
  def ivfOwnAssignOracleSql(k: Int, rounds: Int, elemsSql: String,
      idOut: String): String = {
    val sb = new StringBuilder
    sb.append(s"""WITH $elemsSql,
       hb AS (SELECT vec_id, ${XxSql.u64("vec_id")} AS uid
              FROM (SELECT DISTINCT vec_id FROM elems))""")
    val (hash, last) = XxSql.chain("hb",
      XxSql.xx64Steps("uid", "42", "km_h", "kma"), "kmx")
    sb.append(hash)
    sb.append(s""",
       samp AS MATERIALIZED (SELECT vec_id, ${XxSql.toSigned("km_h")} AS h
         FROM $last),
       se AS MATERIALIZED (SELECT e.vec_id, e.i, e.v
         FROM elems e JOIN samp USING (vec_id)),
       rk AS (SELECT vec_id, row_number() OVER (ORDER BY h ASC, vec_id ASC) AS r
              FROM samp),
       c0 AS MATERIALIZED (SELECT r.r - 1 AS cell, se.i - 1 AS pos, se.v AS value
              FROM rk r JOIN se ON se.vec_id = r.vec_id WHERE r.r <= $k)""")
    val (roundsSql, fin) = lloydRoundsSql(rounds)
    sb.append(roundsSql)
    sb.append(s""",
       fcn AS (SELECT cell, sum(value * value) AS n2 FROM $fin GROUP BY cell),
       fvd AS (SELECT s.vec_id, c.cell, sum(s.v * c.value) AS dp
               FROM se s JOIN $fin c ON c.pos + 1 = s.i
               GROUP BY s.vec_id, c.cell),
       fasg AS (SELECT vec_id, cell FROM (
                SELECT vd.vec_id, vd.cell,
                  row_number() OVER (PARTITION BY vd.vec_id
                    ORDER BY cn.n2 - 2 * vd.dp ASC, vd.cell ASC) AS rk2
                FROM fvd vd JOIN fcn cn USING (cell)) WHERE rk2 = 1)
       SELECT vec_id AS $idOut, CAST(cell AS BIGINT) AS cluster FROM fasg""")
    sb.toString
  }

  /** Oracle for the `ann_codebook_*` dumps: the grouped Lloyd loop of
    * [[graft.operators.LloydKmeans.fitPqOwn]] unrolled — per subspace,
    * the first `codesPerSub` DISTINCT subvectors in (hash, id) order
    * seed the codebook, then `rounds` of per-(vector, subspace) argmin
    * assignment + DECIMAL-snapped (s, code, pos) means. With
    * `residualOf = Some(dump)` the fitted values are residuals of the
    * snapped NORMALIZED sample against that dumped coarse quantizer
    * (the IVFPQ composition — subtraction of identical doubles is
    * itself engine-identical, so residuals need no re-snap). Output
    * matches `codebooksToDF`'s (sub INT, code INT, pos INT, value
    * DOUBLE).
    */
  def pqOwnOracleSql(m: Int, subDim: Int, codesPerSub: Int, rounds: Int,
      residualOf: Option[String]): String = {
    val sb = new StringBuilder
    sb.append(prologue(normalized = residualOf.isDefined))
    val inputCte = residualOf match {
      case None => "se"
      case Some(dump) =>
        sb.append(s""",
       cent AS (SELECT CAST(cell AS INT) AS cell, CAST(pos AS INT) AS pos, value
           FROM read_parquet('__VERIFY_OUT__/$dump/*.parquet')),
       cnq AS (SELECT cell, sum(value * value) AS n2 FROM cent GROUP BY cell),
       vdq AS (SELECT s.vec_id, c.cell, sum(s.v * c.value) AS dp
           FROM se s JOIN cent c ON c.pos + 1 = s.i
           GROUP BY s.vec_id, c.cell),
       asgq AS (SELECT vec_id, cell FROM (
           SELECT vd.vec_id, vd.cell,
             row_number() OVER (PARTITION BY vd.vec_id
               ORDER BY cn.n2 - 2 * vd.dp ASC, vd.cell ASC) AS rk2
           FROM vdq vd JOIN cnq cn USING (cell)) WHERE rk2 = 1),
       rse AS MATERIALIZED (SELECT s.vec_id, s.i, s.v - c.value AS v
           FROM se s JOIN asgq a USING (vec_id)
           JOIN cent c ON c.cell = a.cell AND c.pos + 1 = s.i)""")
        "rse"
    }
    sb.append(s""",
       sx AS MATERIALIZED (SELECT vec_id, CAST((i - 1) // $subDim AS INT) AS s,
              CAST((i - 1) % $subDim AS INT) AS p, v FROM $inputCte),
       sv AS (SELECT vec_id, s, list(v ORDER BY p ASC) AS subv
              FROM sx GROUP BY vec_id, s),
       rkd AS (SELECT v.vec_id, v.s, v.subv,
                row_number() OVER (PARTITION BY v.s
                  ORDER BY sm.h ASC, v.vec_id ASC) AS rn
              FROM sv v JOIN samp sm USING (vec_id)),
       fs AS (SELECT s, subv, min(rn) AS frn FROM rkd GROUP BY s, subv),
       cbr AS (SELECT s, subv,
                row_number() OVER (PARTITION BY s ORDER BY frn ASC) - 1 AS code
              FROM fs),
       pc0 AS MATERIALIZED (SELECT s, code, CAST(g.i AS INT) - 1 AS p,
                subv[CAST(g.i AS INT)] AS value
              FROM cbr,
                LATERAL (SELECT unnest(generate_series(1, len(subv))) AS i) g
              WHERE code < $codesPerSub)""")
    var prev = "pc0"
    for (t <- 1 to rounds) {
      sb.append(s""",
       pn$t AS (SELECT s, code, sum(value * value) AS n2
                FROM $prev GROUP BY s, code),
       pd$t AS (SELECT x.vec_id, x.s, c.code, sum(x.v * c.value) AS dp
                FROM sx x JOIN $prev c ON c.s = x.s AND c.p = x.p
                GROUP BY x.vec_id, x.s, c.code),
       pa$t AS (SELECT vec_id, s, code FROM (
                SELECT d.vec_id, d.s, d.code,
                  row_number() OVER (PARTITION BY d.vec_id, d.s
                    ORDER BY n.n2 - 2 * d.dp ASC, d.code ASC) AS rk2
                FROM pd$t d JOIN pn$t n ON n.s = d.s AND n.code = d.code)
                WHERE rk2 = 1),
       pm$t AS (SELECT a.s, a.code, x.p, ${snapMean("x.v")} AS mu
                FROM sx x JOIN pa$t a ON a.vec_id = x.vec_id AND a.s = x.s
                GROUP BY a.s, a.code, x.p),
       pc$t AS MATERIALIZED (SELECT c.s, c.code, c.p, coalesce(m.mu, c.value) AS value
                FROM $prev c LEFT JOIN pm$t m
                  ON m.s = c.s AND m.code = c.code AND m.p = c.p)""")
      prev = s"pc$t"
    }
    sb.append(s"""
       SELECT CAST(s AS INT) AS sub, CAST(code AS INT) AS code,
              CAST(p AS INT) AS pos, value
       FROM $prev""")
    sb.toString
  }
}
