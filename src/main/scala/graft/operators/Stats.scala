package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One-pass distributed statistics for feature understanding at corpus
  * scale — the EDA layer a training-data pipeline runs before deciding
  * what to keep, re-weight, or drop. Three shapes, one shared
  * discipline: k columns (or k² pairs, or B replicates) never cost k
  * scans — every operator here is one or two aggregate passes whose
  * width, not depth, grows with the requested breadth (the
  * `Outliers.winsorizeAll` / `Drift.psiAll` shape), and every
  * accumulation is exact (DECIMAL / integer fixed-point) so results
  * are partition-order invariant and oracle-reproducible; doubles
  * appear only in the closed-form finish on identical exact inputs
  * (the [[TimeSeries.olsTrend]] discipline).
  *
  *  - [[corrMatrix]]: all pairwise Pearson correlations of k integer-
  *    valued columns from ONE aggregate (k first moments + k(k+1)/2
  *    exact product moments), not k² corr() scans.
  *  - [[chiSquareRelevance]]: χ² independence + Cramér's V of every
  *    categorical feature against a label in one exploded counting
  *    pass — the feature-relevance screen for stratification /
  *    mixture design.
  *  - [[bootstrapMeanCI]]: Poisson-bootstrap confidence intervals for
  *    per-group means — the resampling scheme that works on a stream
  *    of partitions (each row draws its replicate multiplicities
  *    independently; nothing ever materializes a resampled copy of
  *    the data), with a deterministic seedless md5 gate so retries,
  *    partitionings, and the SQL oracle all reproduce the draws.
  */
object Stats {

  private val dec19 = DecimalType(19, 0)

  /** All pairwise Pearson correlations of `cols` in ONE aggregate pass.
    *
    * Contract (the [[TimeSeries.olsTrend]] one): columns hold integer
    * values with ≤19 digits — pre-scale doubles to fixed-point µ-ints
    * upstream. 19-digit factors multiply into exact DECIMAL(38,0)
    * products, the ceiling both engines share. Rows with a null in ANY
    * requested column are excluded (listwise deletion), so every pair
    * shares the same n and the matrix is positive semi-definite.
    *
    * Shape: one aggregate emits k sums + k(k+1)/2 product sums; the
    * single moments row then fans out to pair rows by exploding a
    * LITERAL pair array against map-typed moment lookups — no second
    * scan, no driver collect, no per-pair job. The finish
    * (n·sxy − sx·sy) / √((n·sxx − sx²)·(n·syy − sy²)) runs in double
    * on the exact sums, identically on any engine.
    *
    * @return (col_x, col_y, n, corr) for every unordered pair x < y in
    *         `cols` order; corr is null for a zero-variance column.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame =
    corrFromState(corrState(df, cols), cols)

  /** The MERGEABLE moment state behind [[corrMatrix]]: one row of
    * (n, k sums, k(k+1)/2 product sums) as exact decimals. Because
    * every entry is an exact sum, states merge by columnwise addition
    * with NO approximation — yesterday's corpus state plus today's
    * delta state is bit-identical to a full recompute
    * ([[mergeCorrStates]]; the `agg_delta_merge` incremental-rollup
    * discipline applied to second moments). That is what maintains a
    * 100 TB correlation matrix without re-scanning history: shards/
    * days keep their own one-row states, any union of them answers.
    */
  def corrState(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns; got ${cols.size}")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    val complete = df.where(cols.map(col(_).isNotNull).reduce(_ && _))
    val pairs = statePairs(cols)
    val aggs =
      cols.map(c => sum(col(c).cast(dec19)).as(s"__s_$c")) ++
        pairs.map { case (a, b) =>
          sum(col(a).cast(dec19) * col(b).cast(dec19)).as(s"__p_${a}__$b")
        }
    complete.agg(count(lit(1)).as("__n"), aggs: _*)
  }

  /** Columnwise-sum merge of [[corrState]] rows — exact, so
    * merge ≡ rebuild (StatsSpec pins the equality; the gate's
    * `corr_delta_merge` hash match against the full-rebuild oracle
    * proves it end to end).
    */
  def mergeCorrStates(states: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = statePairs(cols)
    val aggs = cols.map(c => sum(col(s"__s_$c")).as(s"__s_$c")) ++
      pairs.map { case (a, b) => sum(col(s"__p_${a}__$b")).as(s"__p_${a}__$b") }
    states.agg(sum(col("__n")).as("__n"), aggs: _*)
  }

  /** Mergeable PER-GROUP second-moment state — the incremental-rollup
    * discipline ([[graft.operators.IncrementalAgg]]) extended to
    * variance: (key…, n, Σx, Σx²) with exact decimal sums, so shard/
    * day states merge by columnwise addition with NO approximation
    * and merged-state variance is bit-identical to a full recompute
    * (the gate's `var_delta_merge` hash match against the full-
    * rebuild oracle is the proof). Values are integer-valued µ-ints
    * ≤19 digits (the olsTrend contract).
    */
  def groupMomentsState(df: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame = {
    val x = col(valueCol).cast(dec19)
    df.where(col(valueCol).isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(x).as("__sx"),
        sum(x * x).as("__sxx"))
  }

  /** Columnwise-sum merge of [[groupMomentsState]] tables. */
  def mergeGroupMoments(states: DataFrame, keyCols: Seq[String]): DataFrame =
    states.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__n")).as("__n"), sum(col("__sx")).as("__sx"),
        sum(col("__sxx")).as("__sxx"))

  /** Mean / sample variance / sample stddev from a (possibly merged)
    * moment state — double-only closed form on the exact sums:
    * var = (n·Σx² − (Σx)²) / (n·(n−1)), null for n < 2.
    */
  def momentsReport(state: DataFrame, keyCols: Seq[String]): DataFrame = {
    def d(c: String) = col(c).cast("double")
    val n = d("__n")
    val varC = (n * d("__sxx") - d("__sx") * d("__sx")) / (n * (n - lit(1.0)))
    state.select(keyCols.map(col) ++ Seq(
      col("__n").as("n"),
      (d("__sx") / n).as("mean"),
      when(col("__n") >= 2, varC).as("variance"),
      when(col("__n") >= 2, sqrt(varC)).as("stddev")): _*)
  }

  private def statePairs(cols: Seq[String]): Seq[(String, String)] =
    for { i <- cols.indices; j <- i until cols.size } yield (cols(i), cols(j))

  /** Closed-form pair correlations from a (possibly merged) one-row
    * [[corrState]].
    */
  def corrFromState(state: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = statePairs(cols)
    val m = state
    // map-typed lookups let the exploded pair rows pick their moments
    // without a join; the exact decimal sums convert to double ONCE here
    val sums = map(cols.flatMap(c =>
      Seq(lit(c), col(s"__s_$c").cast("double"))): _*)
    val prods = map(pairs.flatMap { case (a, b) =>
      Seq(lit(s"$a|$b"), col(s"__p_${a}__$b").cast("double"))
    }: _*)
    val offDiag = array(pairs.collect { case (a, b) if a != b =>
      struct(lit(a).as("x"), lit(b).as("y"))
    }: _*)
    val n = col("__n").cast("double")
    // centered co-moment from the MATERIALIZED maps (the raw __s_/__p_
    // columns are gone after the first select)
    def cm(x: Column, y: Column) =
      n * element_at(col("__prods"), concat(x, lit("|"), y)) -
        element_at(col("__sums"), x) * element_at(col("__sums"), y)
    m.select(col("__n"), sums.as("__sums"), prods.as("__prods"),
        explode(offDiag).as("p"))
      .select(col("p.x").as("col_x"), col("p.y").as("col_y"),
        col("__n").as("n"),
        when(cm(col("p.x"), col("p.x")) > 0 &&
             cm(col("p.y"), col("p.y")) > 0,
          cm(col("p.x"), col("p.y")) /
            sqrt(cm(col("p.x"), col("p.x")) *
                 cm(col("p.y"), col("p.y")))).as("corr"))
  }

  /** χ² test of independence + Cramér's V for every categorical
    * feature against `labelCol`, all features in ONE exploded counting
    * pass (k features ≠ k scans — the [[Drift.psiAll]] shape): each row
    * emits k (feature, value, label) triples, one count aggregate
    * builds every contingency table at once, and the marginals derive
    * from the cell table (never a second data scan).
    *
    * Exactness: observed counts and marginals are exact integers; the
    * per-cell term (o − e)²/e runs in double on those exact integers
    * and snaps to DECIMAL(20,8) BEFORE the per-feature sum (the
    * `text_bm25` discipline), so χ² is summation-order invariant and
    * engine-reproducible. Rows where the feature value or the label is
    * null are excluded per feature. Cramér's V =
    * √(χ² / (n·min(r−1, c−1))) — the [0,1] effect size that lets
    * features with different cardinalities rank against each other.
    *
    * @return (feature, n, r_levels, c_levels, dof, chi2, cramers_v)
    */
  def chiSquareRelevance(df: DataFrame, featureCols: Seq[String],
      labelCol: String): DataFrame = {
    require(featureCols.nonEmpty, "need >= 1 feature column")
    val triples = df.where(col(labelCol).isNotNull)
      .select(col(labelCol).cast("string").as("__lbl"),
        explode(array(featureCols.map(c =>
          struct(lit(c).as("f"), col(c).cast("string").as("v"))): _*)).as("fv"))
      .where(col("fv.v").isNotNull)
      .select(col("fv.f").as("feature"), col("fv.v").as("v"), col("__lbl"))
    val cells = triples.groupBy(col("feature"), col("v"), col("__lbl"))
      .agg(count(lit(1)).as("o"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // marginals from the cell table: feature-level totals are two
    // aggregates over the (small) contingency cells, not data re-scans
    val rowTot = cells.groupBy(col("feature"), col("v"))
      .agg(sum(col("o")).as("rc"))
    val colTot = cells.groupBy(col("feature"), col("__lbl"))
      .agg(sum(col("o")).as("cc"))
    val nTot = cells.groupBy(col("feature")).agg(sum(col("o")).as("n"),
      countDistinct(col("v")).as("r_levels"),
      countDistinct(col("__lbl")).as("c_levels"))
    val e = col("rc").cast("double") * col("cc").cast("double") /
      col("n").cast("double")
    val term = ((col("o").cast("double") - e) * (col("o").cast("double") - e) / e)
      .cast(DecimalType(20, 8))
    // the FULL r×c grid, not just observed cells: a zero-observed cell
    // still contributes (0−e)²/e = e (dropping them halves χ² exactly
    // on a perfect-association table). The grid is marginal × marginal
    // per feature — contingency-table sized, never data sized.
    val grid = rowTot.join(colTot, Seq("feature"))
      .join(cells, Seq("feature", "v", "__lbl"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    val result = grid
      .join(broadcast(nTot), Seq("feature"))
      .groupBy(col("feature"))
      .agg(first(col("n")).as("n"),
        first(col("r_levels")).as("r_levels"),
        first(col("c_levels")).as("c_levels"),
        sum(term).as("__chi2d"))
      .withColumn("dof", (col("r_levels") - 1) * (col("c_levels") - 1))
      .withColumn("chi2", col("__chi2d").cast("double"))
      .withColumn("cramers_v",
        when(col("dof") > 0,
          sqrt(col("chi2") / (col("n").cast("double") *
            least(col("r_levels") - 1, col("c_levels") - 1).cast("double")))))
      .select(col("feature"), col("n"), col("r_levels"), col("c_levels"),
        col("dof").cast("long").as("dof"), col("chi2"), col("cramers_v"))
    val out = result.localCheckpoint(true)
    cells.unpersist(false)
    out
  }

  /** Mutual information I(feature; label) in nats for k categorical
    * features from ONE exploded pass — the information-theoretic
    * complement of [[chiSquareRelevance]] (χ² asks "is there
    * dependence", MI says "how many nats does knowing the feature buy
    * about the label"). Same contingency-cell shape; only OBSERVED
    * cells contribute (0·ln 0 = 0, so no full-grid expansion is
    * needed), each term is a double computed from exact integer counts
    * then fixed to DECIMAL(20,8) BEFORE the sum (the text_entropy
    * discipline — the per-feature total is aggregation-order
    * invariant).
    */
  def mutualInformation(df: DataFrame, featureCols: Seq[String],
      labelCol: String): DataFrame = {
    require(featureCols.nonEmpty, "need >= 1 feature column")
    val triples = df.where(col(labelCol).isNotNull)
      .select(col(labelCol).cast("string").as("__lbl"),
        explode(array(featureCols.map(c =>
          struct(lit(c).as("f"), col(c).cast("string").as("v"))): _*)).as("fv"))
      .where(col("fv.v").isNotNull)
      .select(col("fv.f").as("feature"), col("fv.v").as("v"), col("__lbl"))
    val cells = triples.groupBy(col("feature"), col("v"), col("__lbl"))
      .agg(count(lit(1)).as("o"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rowTot = cells.groupBy(col("feature"), col("v"))
      .agg(sum(col("o")).as("rc"))
    val colTot = cells.groupBy(col("feature"), col("__lbl"))
      .agg(sum(col("o")).as("cc"))
    val nTot = cells.groupBy(col("feature")).agg(sum(col("o")).as("n"))
    val term = ((col("o").cast("double") / col("n").cast("double")) *
      log(col("o").cast("double") * col("n").cast("double") /
        (col("rc").cast("double") * col("cc").cast("double"))))
      .cast(DecimalType(20, 8))
    val result = cells
      .join(rowTot, Seq("feature", "v"))
      .join(colTot, Seq("feature", "__lbl"))
      .join(broadcast(nTot), Seq("feature"))
      .groupBy(col("feature"))
      .agg(first(col("n")).as("n"), sum(term).as("__mi"))
      .select(col("feature"), col("n"),
        round(col("__mi").cast("double"), 4).as("mi_nats"))
    val out = result.localCheckpoint(true)
    cells.unpersist(false)
    out
  }

  /** Exact per-group WEIGHTED quantiles — the survey-statistics /
    * importance-weighted form of `percentile`: the q-quantile is the
    * smallest value whose cumulative weight reaches q of the group's
    * total (the lower weighted quantile, inclusive). One window pass
    * (cumulative weight over the value order) + one aggregate; the
    * threshold test is EXACT integer arithmetic — `100·cumw ≥ p·totw`
    * with `p = qPct` — so no double q·total rounding can flip a
    * boundary row on any engine (the md5-gate philosophy applied to
    * quantile selection). Weights must be non-negative integers
    * (counts, µ-int importance weights); ties on value resolve by the
    * cumulative order of the value itself, which is well-defined
    * because equal values are interchangeable at a quantile boundary.
    * Rows with a null value are excluded entirely (value AND weight) —
    * a null is a missingness signal, not a position in the
    * distribution (the psiAll convention).
    *
    * @param qPcts quantile percents (e.g. Seq(25, 50, 75))
    * @return one row per group: (…groupCols, total_weight,
    *         q<p> for each requested percent)
    */
  def weightedQuantiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, weightCol: String, qPcts: Seq[Int]): DataFrame = {
    require(qPcts.nonEmpty && qPcts.forall(p => p >= 1 && p <= 100),
      s"quantile percents must be in [1, 100]; got $qPcts")
    import org.apache.spark.sql.expressions.Window
    val grp = groupCols.map(col)
    val byVal = Window.partitionBy(grp: _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(grp: _*)
    // null values must not accumulate weight: they sort first under the
    // value order, so their weight would shift every quantile threshold
    // while min(when(...)) could never select them as a candidate
    val cum = df.where(col(weightCol) >= 0 && col(valueCol).isNotNull)
      .withColumn("__cw", sum(col(weightCol)).over(byVal))
      .withColumn("__tw", sum(col(weightCol)).over(all))
    val qAggs = qPcts.map { p =>
      min(when(col("__cw") * 100 >= col("__tw") * p, col(valueCol)))
        .as(s"q$p")
    }
    cum.groupBy(grp: _*)
      .agg(first(col("__tw")).as("total_weight"), qAggs: _*)
  }

  /** Top principal component of an embedding column by distributed
    * POWER ITERATION — the dominant-direction/variance probe (data
    * drift, anisotropy checks, whitening prep) without ever
    * materializing the d×d covariance or centering the data: using
    * C·v = E[x(x·v)] − µ(µ·v), each iteration is ONE pass of
    * codegen'd dot products (`VecDot`) plus a pos-keyed aggregate;
    * the driver only ever holds d-length vectors (the Lloyd-state
    * collect discipline). No array lambdas anywhere — the 391 s
    * interpreted-zip_with lesson.
    *
    * Deterministic init (e₀ + e₁/2 + … scaled 1/(i+1), fixed), fixed
    * iteration count; double aggregation keeps partition-order noise
    * at ulp level — StatsSpec pins alignment with the exact
    * eigenvector, not bit equality.
    *
    * @return d rows: (pos, loading, eigenvalue, variance_share) —
    *         loading the unit component, eigenvalue its variance,
    *         variance_share = λ / trace(C)
    */
  def topPrincipalComponent(df: DataFrame, vecCol: String,
      iters: Int = 15): DataFrame = {
    require(iters >= 1, s"need iters >= 1; got $iters")
    import graft.functions.VectorOps
    val spark = df.sparkSession
    val vecs = df.select(col(vecCol).cast("array<double>").as("__v"))
      .where(col("__v").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val d = vecs.select(size(col("__v"))).head().getInt(0)
      val n = vecs.count().toDouble
      // mean vector + total second moment: one flat aggregate each
      val mu: Array[Double] = vecs
        .select(posexplode(col("__v")))
        .groupBy(col("pos")).agg(sum(col("col")).as("s"))
        .collect().sortBy(_.getInt(0)).map(_.getDouble(1) / n)
      val sumSq = vecs.agg(sum(VectorOps.dot(col("__v"), col("__v"))))
        .head().getDouble(0)
      val trace = sumSq / n - mu.map(m => m * m).sum
      var v = Array.tabulate(d)(i => 1.0 / (i + 1))
      var lambda = 0.0
      for (_ <- 1 to iters) {
        val vLit = array(v.map(lit): _*)
        // y = E[x (x·v)] − µ (µ·v): one scan, dot codegen'd
        val y = vecs
          .select(VectorOps.dot(col("__v"), vLit).as("__s"), posexplode(col("__v")))
          .groupBy(col("pos")).agg(sum(col("col") * col("__s")).as("yy"))
          .collect().sortBy(_.getInt(0)).map(_.getDouble(1) / n)
        val muDotV = mu.zip(v).map { case (a, b) => a * b }.sum
        val cy = y.zip(mu).map { case (a, m) => a - m * muDotV }
        val nrm = math.sqrt(cy.map(x => x * x).sum)
        require(nrm > 0, "degenerate input: zero covariance action")
        lambda = nrm // ‖Cv‖ → λ as v aligns
        v = cy.map(_ / nrm)
      }
      import spark.implicits._
      v.zipWithIndex.map { case (x, i) =>
        (i.toLong, x, lambda, if (trace > 0) lambda / trace else 0.0)
      }.toSeq.toDF("pos", "loading", "eigenvalue", "variance_share")
    } finally vecs.unpersist(false)
  }

  /** Decile lift / calibration table for a binary-label score — the
    * model-eval staple: rank rows by score descending, cut into
    * `buckets` equal-count bands, report each band's response rate
    * and lift vs the base rate. Deterministic at any scale: the
    * global rank comes from [[DenseId.withOrderedId]] (range-
    * partitioned sort + zipWithIndex — NO partitionless window), ties
    * break on `idCol`, and the band cut is integer math
    * `rid·buckets div n`, so band membership can't wobble across
    * engines or retries. Rates and lift are exact integer ppm
    * (truncating div — both engines agree); lift_ppm = 1 000 000
    * means "this band converts at exactly the base rate".
    *
    * @param scoreCol integer-valued score (µ-int; higher = better)
    * @param labelCol 0/1 outcome
    * @return one row per band 0..buckets−1 (0 = top scores):
    *         (bucket, n_rows, n_pos, response_ppm, lift_ppm)
    */
  def liftTable(df: DataFrame, scoreCol: String, labelCol: String,
      idCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets; got $buckets")
    val prep = df.select((-col(scoreCol)).cast("long").as("__neg"),
      col(idCol).cast("long").as("__id"), col(labelCol).cast("long").as("__y"))
    val ranked = DenseId.withOrderedId(prep, "__rid", "__neg", "__id")
    val tot = ranked.agg(count(lit(1)).as("__n"), sum(col("__y")).as("__pos"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("bucket", expr(s"(__rid * $buckets) div __n"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__y")).as("n_pos"),
        first(col("__n")).as("__n"), first(col("__pos")).as("__pos"))
      .withColumn("response_ppm", expr("(n_pos * 1000000) div n_rows"))
      // lift = (n_pos/n_rows)/(__pos/__n) in exact integer ppm; the
      // int64 headroom (n_pos·__n·1e6) holds to ~10^12-row inputs —
      // swap the literals to DECIMAL beyond that
      .withColumn("lift_ppm",
        when(col("__pos") > 0,
          expr("(n_pos * __n * 1000000) div (n_rows * __pos)")))
      .select(col("bucket"), col("n_rows"), col("n_pos"),
        col("response_ppm"), col("lift_ppm"))
  }

  /** Calibration table (the reliability-diagram data + per-band ECE
    * terms): rows rank by predicted score (a µ-ppm integer in
    * [0, 10⁶]), split into `buckets` equal-population bands, and each
    * band reports its mean PREDICTED probability next to its OBSERVED
    * positive rate — the gap column is the per-band |expected −
    * observed| whose n-weighted sum is expected calibration error.
    * Everything is exact integer ppm ([[liftTable]] discipline), and
    * the global rank comes from [[DenseId.withOrderedId]] — no
    * partitionless window at any input size.
    */
  def calibrationTable(df: DataFrame, scorePpmCol: String, labelCol: String,
      idCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets; got $buckets")
    val prep = df.select((-col(scorePpmCol)).cast("long").as("__neg"),
      col(idCol).cast("long").as("__id"), col(labelCol).cast("long").as("__y"))
    val ranked = DenseId.withOrderedId(prep, "__rid", "__neg", "__id")
    val tot = ranked.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("bucket", expr(s"(__rid * $buckets) div __n"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__y")).as("n_pos"),
        sum(-col("__neg")).as("__sum_pred"))
      .withColumn("mean_pred_ppm", expr("__sum_pred div n_rows"))
      .withColumn("response_ppm", expr("(n_pos * 1000000) div n_rows"))
      .withColumn("gap_ppm", abs(col("mean_pred_ppm") - col("response_ppm")))
      .select(col("bucket"), col("n_rows"), col("n_pos"),
        col("mean_pred_ppm"), col("response_ppm"), col("gap_ppm"))
  }

  /** Pair-counting agreement between two clusterings of the same rows
    * (Rand index + pair precision/recall — the standard way to score a
    * candidate dedup/clustering against a reference without matching
    * cluster LABELS, which are arbitrary on both sides): every row
    * pair either co-clusters in A, in B, in both (TP) or neither (TN).
    * The four cells come from the contingency table via exact binomial
    * sums — C(n,2) on int64 counts, one groupBy over (a, b) plus two
    * marginal aggregates; the pair space is NEVER enumerated.
    *
    * All outputs are exact integers (counts + ppm ratios), so the row
    * is hash-checkable cross-engine. int64 headroom: C(N,2) ≤ 2⁶³
    * holds to N ≈ 4·10⁹ rows.
    */
  def clusteringAgreement(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.select(col(aCol).cast("string").as("__a"),
        col(bCol).cast("string").as("__b"))
      .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__n"))
    def pairs(c: String) = expr(s"($c * ($c - 1)) div 2")
    val tpF = cells.agg(sum(pairs("__n")).cast("long").as("tp"),
      sum(col("__n")).cast("long").as("n"))
    val aF = cells.groupBy(col("__a")).agg(sum(col("__n")).as("__na"))
      .agg(sum(pairs("__na")).cast("long").as("pa"))
    val bF = cells.groupBy(col("__b")).agg(sum(col("__n")).as("__nb"))
      .agg(sum(pairs("__nb")).cast("long").as("pb"))
    tpF.crossJoin(aF).crossJoin(bF)
      .withColumn("all_pairs", expr("(n * (n - 1)) div 2"))
      .withColumn("fp", col("pa") - col("tp"))
      .withColumn("fn", col("pb") - col("tp"))
      .withColumn("tn", col("all_pairs") - col("pa") - col("pb") + col("tp"))
      .select(col("n"), col("tp"), col("fp"), col("fn"), col("tn"),
        expr("((tp + tn) * 1000000L) div all_pairs").as("rand_ppm"),
        when(col("pa") > 0, expr("(tp * 1000000L) div pa")).as("precision_ppm"),
        when(col("pb") > 0, expr("(tp * 1000000L) div pb")).as("recall_ppm"))
  }

  /** Cumulative Poisson(1) CDF gates on a 16-bit md5 draw:
    * floor(65536 · P(X ≤ k)) for k = 0..4; a draw ≥ the last gate gets
    * multiplicity 5 (P(X > 5) ≈ 0.06%, negligible truncation shared by
    * construction with any oracle that replays the same literals).
    */
  val PoissonGates16: Seq[Int] = Seq(24109, 48218, 60273, 64291, 65296)

  /** Poisson-bootstrap confidence intervals for per-group means of an
    * integer-valued (µ-int) column — the bootstrap that scales: instead
    * of materializing B resampled datasets, every row draws B
    * independent Poisson(1) multiplicities (the n→∞ limit of
    * multinomial resampling) and each replicate's mean is
    * Σwᵥ·v / Σwᵥ. One explode(×B) feeds one partial-aggregating
    * groupBy — the shuffle carries groups×B skinny sum rows, never the
    * data, and no executor ever holds a resample.
    *
    * Deterministic and oracle-reproducible: the multiplicity comes
    * from a seedless 16-bit md5 gate on (id, replicate) against the
    * integer [[PoissonGates16]] literals — exact integer comparisons,
    * no doubles, so Spark, retries, AND a SQL oracle draw identical
    * weights. Replicate means divide exact integer sums; the CI is the
    * exact-interpolation percentile over the B replicate means (the
    * `funnel_latency` discipline).
    *
    * @param replicates B, the bootstrap replicate count
    * @return one row per group: (…groupCols, n_rows, mean_micro,
    *         ci_lo, ci_mid, ci_hi) where mean_micro is the full-sample
    *         mean of the µ-int column and the ci_* are the
    *         (α/2, 0.5, 1−α/2) bootstrap quantiles of replicate means.
    */
  def bootstrapMeanCI(df: DataFrame, valueCol: String, idCol: String,
      groupCols: Seq[String], replicates: Int = 50,
      alpha: Double = 0.05): DataFrame = {
    require(replicates >= 2, s"need >= 2 replicates; got $replicates")
    require(alpha > 0 && alpha < 1, s"alpha in (0,1); got $alpha")
    val gate = conv(substring(md5(concat(col(idCol).cast("string"),
      lit(":"), col("b").cast("string"))), 1, 4), 16, 10).cast("int")
    val w = PoissonGates16.zipWithIndex
      .foldRight(lit(PoissonGates16.size): Column) { case ((g, k), rest) =>
        when(gate < g, lit(k)).otherwise(rest)
      }
    val grp = groupCols.map(col)
    val reps = df
      .select(grp ++ Seq(col(idCol), col(valueCol).cast(dec19).as("__v")): _*)
      .withColumn("b", explode(sequence(lit(1), lit(replicates))))
      .withColumn("__w", w)
      .groupBy(grp :+ col("b"): _*)
      .agg(sum(col("__w") * col("__v")).as("__sw"),
        sum(col("__w")).as("__nw"))
      .withColumn("__mean",
        when(col("__nw") > 0, col("__sw").cast("double") / col("__nw").cast("double")))
    val ci = reps.groupBy(grp: _*)
      .agg(expr(s"percentile(__mean, array(${alpha / 2}, 0.5, ${1 - alpha / 2}))")
        .as("__q"))
    val full = df.groupBy(grp: _*)
      .agg(count(lit(1)).as("n_rows"),
        (sum(col(valueCol).cast(dec19)).cast("double") /
          count(lit(1)).cast("double")).as("mean_micro"))
    full.join(ci, groupCols)
      .select(grp ++ Seq(col("n_rows"), col("mean_micro"),
        col("__q").getItem(0).as("ci_lo"),
        col("__q").getItem(1).as("ci_mid"),
        col("__q").getItem(2).as("ci_hi")): _*)
  }

  /** Quantile normalization across groups (the cross-source
    * distribution aligner: genomics' quantile normalization / the
    * "make every source's length distribution comparable" prep step):
    * each value is replaced by the POOLED distribution's type-1
    * quantile at the value's within-group percent rank, so after
    * normalization every group draws from the same (pooled) value
    * distribution regardless of how shifted or stretched it started.
    *
    * All rank math is exact integers: within-group rank `r` of `n_g`
    * (ordered by value, id), pooled position `ceil(r·N / n_g)` into the
    * N pooled values ordered by (value, group, id) — no percentile
    * interpolation, no floats, so the mapping is bit-identical across
    * engines and replayable in SQL. `r·N` is int64 — exact to ~3·10⁹
    * rows; beyond that widen to decimal.
    *
    * Scale shape: the within-group rank is one group-partitioned
    * window; the pooled order comes from [[DenseId.withOrderedId]]
    * (range-partitioned sort + zipWithIndex — NO partitionless window
    * at any size); the mapping itself is an equi-join on the dense
    * integer position. Three shuffles total, each on keys that
    * distribute.
    */
  /** Distribution-free confidence interval for the MEDIAN by order
    * statistics (the binomial/sign argument, Conover's normal
    * approximation for the ranks): the interval [x₍ₗ₎, x₍ᵤ₎] with
    * l = ⌊(n − z√n)/2⌋, u = ⌈(n + z√n)/2 + 1⌉ (clamped to [1, n])
    * covers the population median at ≈ the z-level with NO
    * distributional assumption — the right error bar for the skewed
    * metrics this suite medians (prices, latencies).
    *
    * Exactness: the interval endpoints and the median itself are ORDER
    * STATISTICS of the integer value column — selected rows, not
    * arithmetic — so every output is an exact input value (the median
    * is reported as its lower/upper middle pair rather than their
    * possibly-fractional mean). The only doubles are the rank formulas
    * over (n, z): identical IEEE ops both engines. One group-partitioned
    * rank window + one gather aggregate.
    *
    * @param valueCol integer-typed (caller micro-scales)
    * @return per group: (…groupCols, n, median_lo, median_hi, ci_lo,
    *         ci_hi)
    */
  def medianCi(df: DataFrame, groupCols: Seq[String], valueCol: String,
      z: Double = 1.96): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val grp = groupCols.map(col)
    val ranked = df.where(col(valueCol).isNotNull)
      .select(grp :+ col(valueCol).cast("long").as("__v"): _*)
      .withColumn("__r", row_number().over(
        Window.partitionBy(grp: _*).orderBy(col("__v"))).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(grp: _*)))
      .withColumn("__mlo", expr("(__n + 1) div 2"))
      .withColumn("__mhi", expr("(__n + 2) div 2"))
      .withColumn("__cl", greatest(lit(1L), expr(
        s"CAST(floor((CAST(__n AS DOUBLE) - $z * sqrt(CAST(__n AS DOUBLE))) / 2.0) AS BIGINT)")))
      .withColumn("__cu", least(col("__n"), expr(
        s"CAST(ceil((CAST(__n AS DOUBLE) + $z * sqrt(CAST(__n AS DOUBLE))) / 2.0 + 1.0) AS BIGINT)")))
    ranked.groupBy(grp: _*)
      .agg(max(col("__n")).as("n"),
        min(when(col("__r") === col("__mlo"), col("__v"))).as("median_lo"),
        min(when(col("__r") === col("__mhi"), col("__v"))).as("median_hi"),
        min(when(col("__r") === col("__cl"), col("__v"))).as("ci_lo"),
        min(when(col("__r") === col("__cu"), col("__v"))).as("ci_hi"))
  }

  def quantileNormalize(df: DataFrame, valueCol: String, groupCol: String,
      idCol: String): DataFrame = {
    val base = df.select(col(idCol), col(groupCol), col(valueCol))
    val pooled = DenseId.withOrderedId(
        base.select(col(valueCol), col(groupCol), col(idCol)),
        "__pos", valueCol, groupCol, idCol)
      .select((col("__pos") + 1L).as("__pos1"), col(valueCol).as("__pooled_v"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol), col(idCol))
    val sizes = Window.partitionBy(col(groupCol))
    val ranked = base
      .withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("__ng", count(lit(1)).over(sizes))
    val n = base.count()
    ranked
      .withColumn("__pos1",
        expr(s"(__r * ${n}L + __ng - 1L) DIV __ng"))
      .join(pooled, Seq("__pos1"))
      .select(col(idCol), col(groupCol), col(valueCol),
        col("__pooled_v").as(s"${valueCol}_qnorm"))
  }
}
