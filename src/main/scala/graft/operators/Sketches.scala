package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable summary sketches — the pre-aggregation layer a 100 TB
  * pipeline leans on when exact per-key state is too big or must compose
  * across shards/partitions/time windows without a re-scan.
  *
  *  - [[hllRollup]]: per-group HyperLogLog distinct-count sketches
  *    (Spark's `hll_sketch_agg`, an Apache DataSketches HLL) plus the
  *    union of those same sketches — the point is that the rollup row
  *    comes from MERGING the per-group sketches (register-wise max, an
  *    exact lattice join), never from re-scanning the data. That is the
  *    pattern that lets daily shard sketches answer "distinct over any
  *    date range" at constant cost.
  *  - [[cmsFit]]/[[cmsEstimate]]/[[cmsHeavyHitters]]: a count-min sketch
  *    as a (depth × width) counter TABLE built in one aggregate pass.
  *    Counters are additive, so shard sketches merge by summing the
  *    matching cells — and the estimate's one-sided guarantee
  *    (est ≥ true, always; est ≤ true + εN with probability 1−δ) is
  *    what makes "count anything later" possible in bounded memory
  *    when the key universe (n-grams, URLs) is unbounded.
  *
  * Both sketches are deterministic here — HLL hashes are fixed by the
  * library, CMS rows are seeded `xxhash64` — so results are stable
  * across runs, retries, and partitionings (rows-only in the oracle
  * gate: no SQL engine replays the hash functions).
  */
object Sketches {

  /** Per-group approximate distinct counts plus an `__all` rollup row
    * computed by MERGING the group sketches (`hll_union_agg`), not by
    * re-aggregating the input. `lgConfigK` is the DataSketches accuracy
    * knob (2^k registers; 12 ≈ 1.6% RSE in ~4 KB per sketch).
    */
  def hllRollup(df: DataFrame, valueCol: String, groupCol: String,
      lgConfigK: Int = 12): DataFrame = {
    val perGroup = df.groupBy(col(groupCol))
      .agg(expr(s"hll_sketch_agg($valueCol, $lgConfigK)").as("__sk"))
    val groups = perGroup.select(col(groupCol).cast("string").as("grp"),
      expr("hll_sketch_estimate(__sk)").as("n_distinct_est"))
    val rollup = perGroup.agg(
      // hll_union_agg's optional 2nd arg is the BOOLEAN
      // allowDifferentLgConfigK, NOT a lgConfigK — the per-group sketches
      // above already share this rollup's lgConfigK, so the default
      // (strict) union is what we want.
      expr("hll_sketch_estimate(hll_union_agg(__sk))")
        .as("n_distinct_est"))
      .select(lit("__all").as("grp"), col("n_distinct_est"))
    groups.unionByName(rollup)
  }

  /** Approximate distinct counts over TRAILING slot windows: one HLL
    * sketch per (group, slot), then `hll_union_agg` over a sliding
    * row frame — the mergeable-sketch answer to "unique users in the
    * trailing 24 h, every hour". An exact COUNT(DISTINCT) over a
    * sliding window either recounts the raw window per slot (w×
    * re-reads) or holds every distinct key in window state; sketches
    * make each slot a ~KB blob and the slide a union of `window`
    * blobs, so state is slots×KB regardless of key cardinality — the
    * only shape that survives 100 TB of events. One shuffle on
    * (group, slot); the window pass unions slot-count-sized blobs.
    *
    * @param window trailing slot count (current slot inclusive)
    * @return (group, slot, n_in_slot, distinct_trailing_est)
    */
  def hllTrailingDistinct(df: DataFrame, valueCol: String, groupCol: String,
      slotCol: String, window: Int, lgConfigK: Int = 12): DataFrame = {
    require(window >= 1, s"window must be >= 1; got $window")
    import org.apache.spark.sql.expressions.Window
    val perSlot = df.groupBy(col(groupCol), col(slotCol))
      .agg(expr(s"hll_sketch_agg($valueCol, $lgConfigK)").as("__sk"),
        count(lit(1)).as("n_in_slot"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col(slotCol))
      .rowsBetween(-(window - 1), Window.currentRow)
    perSlot
      .withColumn("__u", expr("hll_union_agg(__sk)").over(w))
      .withColumn("distinct_trailing_est",
        expr("hll_sketch_estimate(__u)").cast("long"))
      .drop("__sk", "__u")
  }

  /** The (d, bucket, cnt) counter table of a depth×width count-min
    * sketch over `termCol` (one count per input row): row `d` buckets a
    * term by `xxhash64(term, seed+d) mod width`. ONE exchange — the
    * depth replication is a map-side Expand (`inline`), the counts a
    * partial+final aggregate over ≤ depth·width cells. Shard sketches
    * merge by summing matching cells; `cnt` is additive.
    */
  def cmsFit(df: DataFrame, termCol: String, width: Int, depth: Int,
      seed: Long = 42L): DataFrame = {
    require(width > 0 && depth > 0, s"need positive width/depth, got $width x $depth")
    df.select(inline(array((0 until depth).map(d =>
      struct(lit(d).as("d"),
        pmod(xxhash64(col(termCol), lit(seed + d)), lit(width.toLong))
          .as("bucket"))): _*)))
      .groupBy(col("d"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Own-implementation HyperLogLog over LONG keys — the sketch
    * ALGORITHM itself oracle-checkable, unlike the DataSketches/HLL++
    * rows whose blob internals no other engine reproduces: the hash is
    * Spark's `xxhash64` (replayed in DuckDB by the XxSql hashLong
    * unroll), the bucket is the low `p` bits, rho is exact integer
    * bit-length arithmetic on the remaining 64−p bits, and the
    * estimator's harmonic denominator is accumulated as an EXACT
    * 2^62-scaled integer (powers of two summed in DECIMAL — a double
    * sum of 2^-rho terms would be partial-order-dependent once the
    * exponent span exceeds the mantissa). Registers are (group, bucket,
    * rho_max) rows: mergeable by max, 2^p per group forever.
    */
  def hllLongFit(df: DataFrame, keyCol: String, groupCols: Seq[String],
      p: Int): DataFrame = {
    // p >= 3: the estimator scales by 2^62, which requires rho ≤ 62
    // (i.e. suffix width 64-p ≤ 61) — at p=2 a rho of 63 would turn
    // shiftleft(1, 62-rho) into a negative-amount shift
    require(p >= 3 && p <= 16, s"p must be in [3,16], got $p")
    val m = 1L << p
    val w = 64 - p
    df
      .withColumn("__h", xxhash64(col(keyCol)))
      .withColumn("__bucket", pmod(col("__h"), lit(m)))
      // >>> p: the high 64-p bits as a non-negative long
      .withColumn("__suffix", expr(s"shiftrightunsigned(__h, $p)"))
      // rho = leading zeros within the w-bit suffix + 1
      //     = w - bitLength(suffix) + 1; all-zero suffix → w + 1
      .withColumn("__rho",
        when(col("__suffix") === 0, lit(w + 1))
          .otherwise(lit(w + 1) -
            length(conv(col("__suffix").cast("string"), 10, 2))))
      .groupBy(groupCols.map(col) :+ col("__bucket").as("bucket"): _*)
      .agg(max(col("__rho")).cast("int").as("rho_max"))
  }

  def hllLongFit(df: DataFrame, keyCol: String, groupCol: String,
      p: Int): DataFrame = hllLongFit(df, keyCol, Seq(groupCol), p)

  /** Max-merge of own-HLL register frames with the same (groupCols, p):
    * the HLL mergeability law — a register only ever grows, so shard/
    * batch sketches fold losslessly (merge ≡ one-shot, exactly).
    */
  def hllLongMerge(a: DataFrame, b: DataFrame,
      groupCols: Seq[String]): DataFrame =
    a.select((groupCols :+ "bucket" :+ "rho_max").map(col): _*)
      .unionByName(b.select((groupCols :+ "bucket" :+ "rho_max").map(col): _*))
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("rho_max")).cast("int").as("rho_max"))

  /** Trailing-window distinct via the own HLL — the hash-gated sibling
    * of [[hllTrailingDistinct]], with CALENDAR-slot semantics: output
    * slot s merges the registers of slots s-window+1..s (an offset
    * broadcast join — the slide never re-touches the data), restricted
    * to (group, slot) pairs that actually occur. State per output slot
    * is 2^p registers whatever the key cardinality.
    */
  def hllLongTrailingDistinct(df: DataFrame, keyCol: String,
      groupCol: String, slotCol: String, window: Int, p: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1; got $window")
    val regs = hllLongFit(df, keyCol, Seq(groupCol, slotCol), p)
    val offs = df.sparkSession.range(window).select(col("id").as("__off"))
    val present = df.select(col(groupCol), col(slotCol)).distinct()
    val slid = regs.crossJoin(broadcast(offs))
      .select(col(groupCol), (col(slotCol) + col("__off")).as(slotCol),
        col("bucket"), col("rho_max"))
      .join(present, Seq(groupCol, slotCol))
      .groupBy(col(groupCol), col(slotCol), col("bucket"))
      .agg(max(col("rho_max")).cast("int").as("rho_max"))
    hllLongEstimate(slid, Seq(groupCol, slotCol), p)
  }

  /** Distinct-count estimates from [[hllLongFit]] registers: the raw
    * HLL harmonic estimate with the standard small-range
    * linear-counting switch (E ≤ 2.5m with empty registers → m·ln(m/V)).
    * Empty registers contribute 2^0 to the harmonic sum, folded in as
    * (m − n_obs)·2^62 on the scaled-integer side.
    */
  def hllLongEstimate(registers: DataFrame, groupCol: String,
      p: Int): DataFrame = hllLongEstimate(registers, Seq(groupCol), p)

  def hllLongEstimate(registers: DataFrame, groupCols: Seq[String],
      p: Int): DataFrame = {
    val m = 1L << p
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    registers.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_obs"),
        sum(expr("shiftleft(1L, 62 - rho_max)").cast("decimal(38,0)"))
          .as("__ds"))
      .withColumn("__denom",
        col("__ds") + (lit(m) - col("n_obs")).cast("decimal(38,0)")
          * lit(1L << 62).cast("decimal(38,0)"))
      .withColumn("__eraw",
        lit(alpha * m * m) * lit(math.pow(2, 62))
          / col("__denom").cast("double"))
      .select(groupCols.map(col) :+ col("n_obs") :+
        round(when(col("__eraw") <= lit(2.5 * m) && col("n_obs") < m,
          lit(m.toDouble) * log(lit(m.toDouble) / (lit(m) - col("n_obs"))))
          .otherwise(col("__eraw")), 4).as("est"): _*)
  }

  /** Pairwise overlap matrix from OWN-HLL registers — the hash-gated
    * sibling of [[hllOverlapMatrix]]: per-group registers built once,
    * every pair's union a lossless max-merge of the two register sets,
    * intersection by inclusion-exclusion over the (already-4dp-rounded)
    * estimates, clamped at 0. The pair expansion touches only the
    * G·2^p register frame — broadcast-sized by construction — never
    * the data; the whole matrix replays in SQL.
    */
  def hllLongOverlapMatrix(df: DataFrame, keyCol: String, groupCol: String,
      p: Int): DataFrame = {
    // eager checkpoint: the G·2^p register frame is read three times
    // (singles, group list, pair expansion) — recomputing it would
    // re-scan the corpus per read
    val regs = hllLongFit(df, keyCol, Seq(groupCol), p)
      .localCheckpoint(true)
    val singles = hllLongEstimate(regs, Seq(groupCol), p)
    val grps = regs.select(col(groupCol)).distinct()
    val pairs = grps.select(col(groupCol).as("grp_a"))
      .crossJoin(grps.select(col(groupCol).as("grp_b")))
      .where(col("grp_a") < col("grp_b"))
    val pairRegs = pairs
      .join(regs.withColumnRenamed(groupCol, "__g"),
        col("__g") === col("grp_a") || col("__g") === col("grp_b"))
      .groupBy(col("grp_a"), col("grp_b"), col("bucket"))
      .agg(max(col("rho_max")).cast("int").as("rho_max"))
    val unions = hllLongEstimate(pairRegs, Seq("grp_a", "grp_b"), p)
      .select(col("grp_a"), col("grp_b"), col("est").as("union_est"))
    val out = pairs
      .join(singles.select(col(groupCol).as("grp_a"), col("est").as("est_a")),
        Seq("grp_a"))
      .join(singles.select(col(groupCol).as("grp_b"), col("est").as("est_b")),
        Seq("grp_b"))
      .join(unions, Seq("grp_a", "grp_b"))
      .select(col("grp_a"), col("grp_b"), col("est_a"), col("est_b"),
        col("union_est"),
        (round(greatest(lit(0.0),
          col("est_a") + col("est_b") - col("union_est")), 4) + lit(0.0))
          .as("intersect_est"),
        (round(greatest(lit(0.0),
          col("est_a") + col("est_b") - col("union_est"))
          / col("union_est"), 4) + lit(0.0)).as("jaccard"))
    out
  }

  /** The (term, d, bucket) hash-cell mapping for every distinct term —
    * the dumped-artifact bridge that converts the CMS consumers to
    * exact oracles (the ann_quantizer_* technique): the mapping is
    * vocab-bounded (depth·|vocab| rows), and WITH it both engines agree
    * on every counter cell, estimate, and top-k; only the hash VALUES
    * themselves stay engine-specific, so this dump's own gate is
    * rows-only while everything downstream of it hash-matches. Hash
    * parameters must match the [[cmsFit]] call being audited.
    */
  def cmsBuckets(df: DataFrame, termCol: String, width: Int, depth: Int,
      seed: Long = 42L): DataFrame = {
    require(width > 0 && depth > 0, s"need positive width/depth, got $width x $depth")
    df.select(col(termCol)).distinct()
      .select(col(termCol), inline(array((0 until depth).map(d =>
        struct(lit(d).as("d"),
          pmod(xxhash64(col(termCol), lit(seed + d)), lit(width.toLong))
            .as("bucket"))): _*)))
  }

  /** Additive CMS merge: counter tables with the SAME (width, depth,
    * seed) sum cell-wise — the mergeability law that lets shard/batch
    * sketches fold into a corpus sketch without re-scanning anything.
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("d"), col("bucket"), col("cnt"))
      .unionByName(b.select(col("d"), col("bucket"), col("cnt")))
      .groupBy(col("d"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for `terms` (one row per distinct term in its
    * `termCol`) against a fitted counter table: min over the depth rows
    * of the term's bucket counts. The counter table is ≤ depth·width
    * rows — broadcast by construction. A term the sketch never saw reads
    * 0-count cells (left join + coalesce), estimating 0, not null.
    * Hash parameters must match the [[cmsFit]] call.
    */
  def cmsEstimate(terms: DataFrame, counters: DataFrame, termCol: String,
      width: Int, depth: Int, seed: Long = 42L): DataFrame = {
    val probes = terms.select(col(termCol)).distinct()
      .select(col(termCol), inline(array((0 until depth).map(d =>
        struct(lit(d).as("d"),
          pmod(xxhash64(col(termCol), lit(seed + d)), lit(width.toLong))
            .as("bucket"))): _*)))
    probes.join(broadcast(counters), Seq("d", "bucket"), "left")
      .groupBy(col(termCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Top-`k` terms by CMS estimate (ties broken by term). Candidates
    * default to the input's own distinct terms; at scale the candidate
    * set comes from somewhere bounded (a sample, a prior window's heavy
    * hitters) while the sketch summarizes the full stream — the sketch
    * is the part that never grows with the key universe.
    */
  def cmsHeavyHitters(df: DataFrame, termCol: String, k: Int,
      width: Int = 2048, depth: Int = 4, seed: Long = 42L): DataFrame = {
    val counters = cmsFit(df, termCol, width, depth, seed)
    cmsEstimate(df, counters, termCol, width, depth, seed)
      .orderBy(col("est").desc, col(termCol).asc)
      .limit(k)
  }

  /** Equi-join OUTPUT-SIZE estimate from two CMS counter tables — the
    * classic count-min inner-product estimator: the true join size is
    * Σ_k cA(k)·cB(k), and for each depth row the bucket-wise dot
    * product Σ_b A[d,b]·B[d,b] over-counts it only by hash collisions,
    * so min over depth rows gives est ≥ true with
    * est ≤ true + (e/width)·|A|·|B| w.h.p. The planning use: decide
    * salting / broadcast / bucketing for a join WITHOUT running it,
    * from two sketches that each cost one scan and merge additively
    * across shards. Both sketches must share width/depth/seed.
    *
    * @return one row: (join_size_est, depth_estimates array — the
    *         per-row dots, monotone evidence for the min)
    */
  def cmsJoinSizeEstimate(countersA: DataFrame, countersB: DataFrame,
      depth: Int): DataFrame = {
    require(depth > 0, s"need positive depth, got $depth")
    val dots = countersA
      .join(countersB.select(col("d"), col("bucket"), col("cnt").as("cntB")),
        Seq("d", "bucket"))
      .groupBy(col("d"))
      .agg(sum(col("cnt") * col("cntB")).as("dot"))
    // densify: a depth row with NO shared buckets dots to 0 (the min)
    dots.sparkSession.range(depth).select(col("id").as("d"))
      .join(dots, Seq("d"), "left")
      .agg(min(coalesce(col("dot"), lit(0L))).as("join_size_est"),
        sort_array(collect_list(coalesce(col("dot"), lit(0L))))
          .as("depth_estimates"))
  }

  /** Pairwise audience-overlap matrix from per-group HLL sketches:
    * |A∩B| for every group pair by inclusion-exclusion over MERGED
    * sketches (inter ≈ |A| + |B| − |A∪B|, clamped at 0), plus the
    * estimated overlap Jaccard. The 100 TB point: the data is scanned
    * ONCE to build G sketches; every pair answer is register math on
    * ~KB blobs — the segment-overlap question ("how many users do
    * these two cohorts share?") never re-touches the data, and the
    * same sketches answer any future pair or union-of-pairs query.
    * The pair join is G², on G sketch rows — broadcast-sized by
    * construction.
    *
    * Inclusion-exclusion error compounds three estimates, so the
    * relative error on SMALL intersections of LARGE sets is
    * proportionally worse than HLL's per-set RSE — SketchSpec pins
    * both the large-overlap accuracy and the near-disjoint behavior.
    *
    * @return (grp_a, grp_b, n_a_est, n_b_est, union_est,
    *         intersect_est, jaccard_est) for grp_a < grp_b
    */
  def hllOverlapMatrix(df: DataFrame, valueCol: String, groupCol: String,
      lgConfigK: Int = 12): DataFrame = {
    val per = df.groupBy(col(groupCol).cast("string").as("grp"))
      .agg(expr(s"hll_sketch_agg($valueCol, $lgConfigK)").as("__sk"))
    val a = per.select(col("grp").as("grp_a"), col("__sk").as("__ska"))
    val b = per.select(col("grp").as("grp_b"), col("__sk").as("__skb"))
    a.join(broadcast(b), col("grp_a") < col("grp_b"))
      .withColumn("n_a_est", expr("hll_sketch_estimate(__ska)").cast("long"))
      .withColumn("n_b_est", expr("hll_sketch_estimate(__skb)").cast("long"))
      .withColumn("union_est",
        expr("hll_sketch_estimate(hll_union(__ska, __skb))").cast("long"))
      .withColumn("intersect_est",
        greatest(col("n_a_est") + col("n_b_est") - col("union_est"), lit(0L)))
      .withColumn("jaccard_est",
        round(col("intersect_est") / col("union_est"), 4))
      .select(col("grp_a"), col("grp_b"), col("n_a_est"), col("n_b_est"),
        col("union_est"), col("intersect_est"), col("jaccard_est"))
  }
}
