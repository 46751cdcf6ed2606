package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus preparation operators: the steps between "deduped
  * documents" and "token stream a trainer consumes".
  *
  *  - [[packByTokenBudget]]: assign documents to fixed-token-budget packs
  *    (sequence packing). A global greedy first-fit is inherently
  *    sequential, so the scalable form shards the corpus by id hash and
  *    packs within each shard independently: the only window runs
  *    PARTITIONED by shard (never a global single-partition sort), and
  *    shard count scales with the cluster while pack quality is
  *    unaffected (packing loses nothing by being computed per shard —
  *    packs never needed to span shards in the first place).
  *  - [[mixtureSample]]: deterministic per-source downsampling to hit
  *    target mixture weights. The keep/drop gate is a pure function of
  *    the row id (md5 prefix as a uniform draw), so the sample is
  *    reproducible across runs, executors and retries — rand() sampling
  *    is none of those — and any engine can audit it (the gate is plain
  *    SQL). Weights ride in as a broadcast dimension table, the fact
  *    scan never shuffles.
  */
object CorpusPrep {

  /** Pack documents into contiguous token-budget blocks per shard.
    * `pack_id` = which budget-sized block the document's running token
    * offset starts in (block packing: a document straddling a boundary
    * stays in the pack where it starts, so packs can overflow by at most
    * one document — the standard streaming-packer behavior).
    */
  def packByTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long, shards: Int): DataFrame = {
    // explicit ROWS frame: the default RANGE frame makes tied idCol rows
    // peers (each would see ALL peers' tokens in its running sum, so the
    // offset stops being a per-row prefix and packs can overflow by more
    // than one document); ROWS keeps the sum a strict running offset even
    // when ids collide, matching the oracle's explicit ROWS frame.
    // PRECONDITION for a deterministic row→pack MAPPING: idCol unique.
    // With duplicate ids the ROWS frame still bounds every pack (the
    // running offset is a strict prefix whatever order ties land in),
    // but WHICH of the tied rows gets which prefix is tie-order
    // dependent — pinned by CorpusPrepSpec's duplicate-id case.
    val byShard = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", pmod(col(idCol), lit(shards.toLong)))
      .withColumn("cum_before",
        sum(col(tokenCol)).over(byShard) - col(tokenCol))
      .withColumn("pack_id",
        floor(col("cum_before") / lit(budget.toDouble)).cast("long"))
      .drop("cum_before")
  }

  /** Curriculum ordering: bucket rows into difficulty stages and give
    * each a deterministic shuffle key, so "sort by (stage, shuffle_key)"
    * yields easy→hard training order with a reproducible shuffle inside
    * each stage. stage = min(floor(difficulty / stageWidth), maxStage);
    * shuffle_key = md5 of the id — the same engine-agnostic uniform draw
    * [[mixtureSample]] uses, so reruns and retries emit identical order.
    * Materializing the order at scale is
    * `repartitionByRange($"stage", $"shuffle_key")` + sortWithinPartitions
    * — a range sort, never a single-partition window.
    */
  def curriculumOrder(df: DataFrame, idCol: String, difficultyCol: String,
      stageWidth: Long, maxStage: Long): DataFrame =
    df.withColumn("stage",
        least(floor(col(difficultyCol) / lit(stageWidth.toDouble)), lit(maxStage))
          .cast("long"))
      .withColumn("shuffle_key", md5(col(idCol).cast("string")))

  /** Fixed-quota per-group sampling: the k rows per group whose md5 hash
    * ranks lowest — a deterministic stand-in for per-group reservoir
    * sampling (same uniform-without-replacement marginal, but
    * reproducible across runs/retries and auditable in plain SQL, which
    * rand()-reservoirs are not). The window is group-PARTITIONED and
    * Catalyst plans the rank ≤ k filter as WindowGroupLimit, so ~k rows
    * per (input partition, group) shuffle — never full groups.
    */
  def samplePerGroup(df: DataFrame, idCol: String, groupCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= k)
  }

  /** Keep each row iff a uniform md5-prefix draw on its id falls under
    * its source's weight. Weights are (source, w) with w ∈ [0, 1]:
    * w = 1 keeps everything, w = 0.25 keeps a deterministic quarter.
    * Sources missing from `weights` are dropped (inner join) — the
    * explicit-allowlist behavior a curated training mix wants.
    */
  def mixtureSample(df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.toDF(sourceCol, "w")
    // first 16 bits of md5(id) as an integer in [0, 65536) — a seedless
    // uniform hash both Spark and any SQL oracle compute identically
    val gate = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
      .cast("long")
    df.join(broadcast(wdf), Seq(sourceCol))
      .where(gate < col("w") * lit(65536.0))
      .drop("w")
  }

  /** Weighted sampling WITHOUT replacement, deterministic: the
    * Efraimidis-Spirakis / Gumbel-top-k trick. Each row draws the
    * seedless md5 uniform `u ∈ (0,1)` and keys itself by `ln(u)/w` —
    * taking the top `n` keys is EXACTLY a weighted sample without
    * replacement (a row with twice the weight is twice as likely at
    * every selection step). One projection + TakeOrdered: no
    * sequential selection loop, no rand(), reproducible across
    * executors/retries/engines, and the whole draw is auditable in
    * plain SQL. `u` is offset to the bucket midpoint `(g+0.5)/2¹⁶` so
    * ln never sees 0.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      n: Int): DataFrame = {
    require(n >= 1, "sample size must be positive")
    df.where(col(weightCol) > 0)
      .withColumn("__key", gumbelKey(col(idCol), col(weightCol)))
      .orderBy(col("__key").desc, col(idCol).asc)
      .limit(n)
      .drop("__key")
  }

  /** Per-GROUP weighted sample without replacement: the same Gumbel
    * keys ranked inside a group-partitioned window, so Catalyst plans a
    * map-side WindowGroupLimit — at most k rows per (partition, group)
    * reach the shuffle, same plan shape as [[samplePerGroup]] but
    * weight-proportional instead of uniform.
    */
  def weightedSamplePerGroup(df: DataFrame, idCol: String,
      groupCol: String, weightCol: String, k: Int): DataFrame = {
    require(k >= 1, "sample size must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(gumbelKey(col(idCol), col(weightCol)).desc, col(idCol).asc)
    df.where(col(weightCol) > 0)
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .where(col("sample_rank") <= k)
  }

  /** EXACT class rebalancing by deterministic oversampling: every class
    * in `classCol` is replicated up to the size of the largest class —
    * each row gets `base = target div n` copies, and the `target mod n`
    * rows with the smallest md5 draw on their id get one extra, so the
    * output has EXACTLY `maxClassSize` rows per class (not merely in
    * expectation, unlike a fraction gate). The md5 rank makes the
    * remainder assignment a pure function of the ids: bit-identical
    * across engines, retries, and partitionings, and replayable by a
    * SQL oracle — the R1 hashSplit discipline applied to oversampling.
    *
    * Scale shape: class sizes are one tiny aggregate (broadcast back);
    * the only shuffle is the class-partitioned rank window, and
    * replication itself is a zero-shuffle `explode(sequence)` whose
    * fan-out is data (the oversampled rows), not overhead. A severely
    * skewed class layout concentrates the rank window on the SMALL
    * classes (the big class has base=1, rem=0 and never needs extras) —
    * exactly the side that fits; the `__needs_rank` split below keeps
    * the majority class out of the window entirely.
    *
    * Output = input columns + `copy` (1-based replica index; copy = 1
    * rows are the original multiset).
    */
  def oversampleToMax(df: DataFrame, idCol: String, classCol: String): DataFrame = {
    val sizes = df.groupBy(col(classCol)).agg(count(lit(1)).as("__n"))
    val target = sizes.agg(max(col("__n")).as("__target"))
    val plan = broadcast(sizes.crossJoin(target)
      .select(col(classCol), col("__n"),
        // integer div, not double /: double division truncates past
        // 2^53, letting __base disagree with the exact % remainder
        expr("__target div __n").as("__base"),
        (col("__target") % col("__n")).as("__rem")))
    val joined = df.join(plan, Seq(classCol))
    // rank only where the remainder matters: classes with __rem = 0
    // (including the majority class itself) skip the window
    val flat = joined.where(col("__rem") === 0)
      .withColumn("__copies", col("__base"))
    val w = Window.partitionBy(col(classCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val ranked = joined.where(col("__rem") > 0)
      .withColumn("__rank", row_number().over(w))
      .withColumn("__copies",
        col("__base") + when(col("__rank") <= col("__rem"), 1L).otherwise(0L))
      .drop("__rank")
    flat.unionByName(ranked)
      .withColumn("copy", explode(sequence(lit(1L), col("__copies"))))
      .drop("__n", "__base", "__rem", "__copies")
  }

  /** Length-bucketed batch assignment (the padding-efficiency batcher:
    * group sequences of similar length so a fixed-size batch pads each
    * row only to its BUCKET's max, not the corpus max). Rows bucket by
    * `length div bucketWidth`; within a bucket they shuffle
    * deterministically by the md5 draw on their id (so batches are not
    * length-sorted WITHIN the bucket — consecutive batches stay
    * i.i.d.-ish draws from the bucket) and chunk into `batchSize`-row
    * batches by integer division on the rank.
    *
    * Every assignment is a pure function of (id, length): bit-identical
    * across engines/retries/partitionings, SQL-replayable, and stable
    * under re-runs — the property a resumable tokenize-and-pack job
    * needs so a retried stage refills exactly the same batches.
    *
    * Scale shape: one window partitioned by bucket (the only shuffle);
    * a pathological bucket holding most of the corpus concentrates that
    * window — widen `bucketWidth` asymmetrically or pre-salt by
    * `pmod(md5, s)` and treat (bucket, salt) as the batch scope if a
    * single bucket outgrows an executor.
    *
    * Output = input + `bucket`, `batch_id` (0-based within bucket).
    */
  def lengthBucketBatches(df: DataFrame, idCol: String, lenCol: String,
      bucketWidth: Long, batchSize: Int): DataFrame = {
    require(bucketWidth >= 1 && batchSize >= 1,
      s"need positive bucketWidth/batchSize; got $bucketWidth/$batchSize")
    val w = Window.partitionBy(col("bucket"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("bucket", expr(s"cast(`$lenCol` as bigint) div ${bucketWidth}L"))
      .withColumn("__r", row_number().over(w).cast("long"))
      .withColumn("batch_id", expr(s"(__r - 1L) div ${batchSize}L"))
      .drop("__r")
  }

  /** Token-balanced shard assignment by sorted snake (boustrophedon)
    * placement — the data-parallel trainer's "give every worker the
    * same token load" step. Documents rank globally by weight
    * descending (id tiebreak); rank r goes to shard `pos` on even
    * rounds and `nShards − 1 − pos` on odd rounds (round = ⌊(r−1)/N⌋,
    * pos = (r−1) mod N), so each consecutive N-row band distributes its
    * biggest-to-smallest items against the running totals — shard
    * totals differ by at most one document's weight, without any
    * sequential greedy loop.
    *
    * The global rank comes from [[PrefixSum]] (range-sort + two scans +
    * a partition-count driver array), never a partitionless window; the
    * snake itself is pure arithmetic on the rank — codegen'd on Spark,
    * plain SQL anywhere else, bit-identical across engines, retries,
    * and partitionings.
    *
    * Output = (idCol, weightCol, rank, shard).
    */
  def snakeShards(df: DataFrame, idCol: String, weightCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"need >= 1 shard; got $nShards")
    val ranked = PrefixSum.withRunningTotal(
      df.select(col(idCol), col(weightCol).cast("long").as(weightCol))
        .withColumn("__neg_w", -col(weightCol))
        .withColumn("__one", lit(1L)),
      "__one", "rank", "__neg_w", idCol)
    ranked
      .withColumn("shard",
        when(expr(s"((rank - 1L) div ${nShards}L) % 2 = 0"),
          expr(s"(rank - 1L) % ${nShards}L"))
          .otherwise(expr(s"${nShards - 1}L - (rank - 1L) % ${nShards}L")))
      .drop("__neg_w", "__one")
  }

  /** Leakage-safe holdout: every member of a near-duplicate CLUSTER
    * lands on the same side of the split. A row-level md5 gate (R1)
    * leaks — a test document's near-duplicate trains the model on the
    * answer — so the gate here draws on the CLUSTER id: one uniform
    * draw per cluster, inherited by every member. `clustered` is the
    * (id, cluster) frame [[Dedup.duplicateClusters]] /
    * [[Dedup.duplicateClustersStar]] produce (singletons are their own
    * cluster, so un-duplicated documents still split at `testFraction`).
    *
    * The gate is the [[graft.car.Splits.hashSplit]] discipline applied
    * to clusters: a pure function of the cluster id — reproducible
    * across runs/engines, auditable in SQL, zero extra shuffles (one
    * codegen'd projection over the cluster frame).
    *
    * Output = input + `split` ∈ {'test', 'train'}.
    */
  def leakageSafeSplit(clustered: DataFrame, idCol: String,
      clusterCol: String, testFraction: Double): DataFrame = {
    require(testFraction > 0.0 && testFraction < 1.0,
      s"testFraction must be in (0, 1); got $testFraction")
    val gate = conv(substring(md5(col(clusterCol).cast("string")), 1, 4),
      16, 10).cast("long")
    clustered.withColumn("split",
      when(gate < lit(testFraction) * lit(65536), lit("test"))
        .otherwise(lit("train")))
  }

  /** Deterministic per-epoch training order: each epoch reshuffles the
    * corpus with a fresh seedless draw — `key = md5₄₈("epoch:id")` — so
    * shard assignment AND within-shard order change every epoch (the
    * "different data order per epoch" a trainer wants) while staying a
    * pure function of (epoch, id): bit-identical across engines,
    * retries, and partitionings, SQL-replayable, and resumable
    * mid-epoch (re-running the job regenerates exactly the order the
    * crashed run was consuming — a rand() shuffle gives a DIFFERENT
    * epoch on retry, silently skewing what the model saw).
    *
    * Scale shape: epochs fan out as an explode (no extra scans), the
    * only shuffle is the (epoch, shard)-partitioned rank window, and
    * shard count scales with the reader fleet.
    *
    * Output = (epoch, idCol, shard, ord) — ord is 1-based within
    * (epoch, shard).
    */
  def epochOrder(df: DataFrame, idCol: String, epochs: Int,
      shards: Int): DataFrame = {
    require(epochs >= 1 && shards >= 1,
      s"need positive epochs/shards; got $epochs/$shards")
    val keyed = df.select(col(idCol))
      .withColumn("epoch", explode(sequence(lit(0L), lit(epochs - 1L))))
      .withColumn("__key", KmvSketch.hash48(
        concat(col("epoch").cast("string"), lit(":"), col(idCol).cast("string"))))
      .withColumn("shard", pmod(col("__key"), lit(shards.toLong)))
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("__key"), col(idCol))
    keyed
      .withColumn("ord", row_number().over(w).cast("long"))
      .select(col("epoch"), col(idCol), col("shard"), col("ord"))
  }

  /** Contrastive triplet mining — the (anchor, positive, negative)
    * training set an embedding model learns from, assembled from two
    * artifacts the pipeline already has: near-duplicate CLUSTERS
    * supply positives (a cluster-mate is a semantic paraphrase by
    * construction), and a k-NN hit list supplies HARD negatives (the
    * nearest neighbor that is NOT a cluster-mate — close enough to be
    * informative, provably not a duplicate). Anchors are the members
    * of multi-member clusters; positive = the smallest other member id,
    * negative = the lowest-rank cross-cluster hit (both deterministic).
    * Anchors whose entire hit list is same-cluster drop out (no valid
    * negative at this k — raise k rather than accept a random one).
    *
    * `clustered` is (id, cluster) from [[Dedup.duplicateClustersStar]];
    * `knn` is (query_id, neighbor_id, rank, cosine) from
    * [[SimilaritySearch.knnJoinBruteForce]] / the IVF variants, queried
    * on the anchors. All joins are keyed by id/cluster; the only window
    * is per-anchor over ≤ k rows.
    *
    * @return (anchor, positive, negative, neg_rank, neg_cosine)
    */
  def contrastiveTriplets(clustered: DataFrame, knn: DataFrame): DataFrame = {
    val sizes = clustered.groupBy(col("cluster"))
      .agg(count(lit(1)).as("__n"))
    val multi = clustered
      .join(sizes.where(col("__n") >= 2), Seq("cluster"))
      .select(col("id"), col("cluster"))
    val pos = multi.alias("a")
      .join(multi.alias("b"), col("a.cluster") === col("b.cluster")
        && col("a.id") =!= col("b.id"))
      .groupBy(col("a.id").as("anchor"))
      .agg(min(col("b.id")).as("positive"))
    val cross = knn
      .join(multi.select(col("id").as("query_id"),
        col("cluster").as("__ac")), Seq("query_id"))
      .join(clustered.select(col("id").as("neighbor_id"),
        col("cluster").as("__nc")), Seq("neighbor_id"))
      .where(col("__nc") =!= col("__ac"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rank"))
    val neg = cross
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select(col("query_id"), col("neighbor_id").as("negative"),
        col("rank").as("neg_rank"), col("cosine").as("neg_cosine"))
    pos.join(neg, col("anchor") === col("query_id"))
      .select(col("anchor"), col("positive"), col("negative"),
        col("neg_rank"), col("neg_cosine"))
  }

  /** Efraimidis-Spirakis selection key ln(u)/w from the seedless md5
    * uniform `u = (g + 0.5)/2¹⁶` — ranking by it descending IS weighted
    * sampling without replacement. Pure column math, identical in SQL.
    */
  /** Exact-proportion stratified split: within every stratum, rank rows
    * by a deterministic md5 shuffle key and cut at EXACT integer
    * boundaries (rank·10 ≤ n·8 → train, ≤ n·9 → val, else test) — the
    * guarantee an md5-GATE split (r1/r9's shape) cannot give: every
    * stratum lands within one row of 80/10/10 regardless of its size,
    * which is what a small eval stratum needs (a 5% gate miss on a
    * 200-row stratum is 10 eval rows gained or lost). One per-stratum
    * window (partitioned, never global); integer comparisons only.
    */
  def stratifiedExactSplit(df: DataFrame, idCol: String,
      stratumCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df.select(col(idCol), col(stratumCol))
      .withColumn("__r", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(stratumCol))))
      .select(col(idCol), col(stratumCol),
        when(col("__r") * 10 <= col("__n") * 8, lit("train"))
          .when(col("__r") * 10 <= col("__n") * 9, lit("val"))
          .otherwise(lit("test")).as("split"))
  }

  /** False-negative-free contrastive batch layout: assign clustered
    * items to training batches such that NO batch holds two members of
    * the same near-dup cluster — in-batch-negative training (InfoNCE,
    * CLIP-style) treats every other batch member as a negative, so a
    * near-duplicate in the same batch is a FALSE negative that directly
    * fights the objective. Construction is collision-free by
    * arithmetic, not by search: within-cluster rank r (one per-cluster
    * window — the only exchange) stratifies members, and batch_id =
    * r·G + md5(cluster) mod G scatters clusters across G batch groups
    * per stratum; two members of one cluster share the md5 term but
    * never the stratum, so they can never share a batch. Pure row
    * functions after the rank — no global sort, engine-replayable.
    */
  def contrastiveBatches(clustered: DataFrame, idCol: String,
      clusterCol: String, groupsPerStratum: Int = 16): DataFrame = {
    require(groupsPerStratum >= 1, s"need G >= 1, got $groupsPerStratum")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(clusterCol)).orderBy(col(idCol))
    clustered.select(col(idCol), col(clusterCol))
      .withColumn("__r", row_number().over(w) - 1)
      .select(col(idCol), col(clusterCol),
        (col("__r") * groupsPerStratum
          + conv(substring(md5(col(clusterCol).cast("string")), 1, 4),
            16, 10).cast("long") % groupsPerStratum)
          .cast("long").as("batch_id"))
  }

  /** Data-repetition budget — the data-constrained-scaling planner
    * (Muennighoff et al., NeurIPS 2023: repeating data beyond ~4 epochs
    * stops buying loss): given per-source token totals, integer-permille
    * mixture weights, and a target training-token count, compute each
    * source's demanded share, the EFFECTIVE EPOCHS that share implies
    * (ppm), whether it crosses the repetition ceiling, and the
    * cap-adjusted tokens actually obtainable. Pure integer arithmetic
    * over one grouped aggregate — the plan costs one scan whatever the
    * corpus size, because the question is about TOTALS, not rows.
    * Weights are renormalized over the sources PRESENT (a missing
    * source should inflate everyone else's share, not silently lose
    * its tokens). The converse also holds: a source present in the
    * data but absent from `weightPermille` is kept with weight 0 —
    * a visible zero-budget row, never a silent drop.
    */
  def repetitionBudget(tokensPerSource: DataFrame, sourceCol: String,
      nTokensCol: String, weightPermille: Map[String, Long],
      targetTokens: Long, maxEpochsPpm: Long = 4000000L): DataFrame = {
    require(targetTokens > 0, s"need a positive target, got $targetTokens")
    val spark = tokensPerSource.sparkSession
    import spark.implicits._
    val w = weightPermille.toSeq.toDF(sourceCol, "weight_permille")
    // left join: unweighted-but-present sources surface as weight-0
    // rows (share/epochs/cap all 0) instead of vanishing from the plan
    val joined = tokensPerSource.join(broadcast(w), Seq(sourceCol), "left")
      .withColumn("weight_permille",
        coalesce(col("weight_permille"), lit(0L)))
    val totalPerm = joined.agg(sum(col("weight_permille")).as("__tp"))
    joined.crossJoin(broadcast(totalPerm))
      .select(col(sourceCol), col(nTokensCol).as("n_tokens"),
        col("weight_permille"),
        expr(s"($targetTokens * weight_permille) div greatest(__tp, 1L)")
          .as("share_tokens"),
        col("__tp"))
      .select(col(sourceCol), col("n_tokens"), col("weight_permille"),
        col("share_tokens"),
        expr("(share_tokens * 1000000L) div n_tokens").as("epochs_ppm"),
        (expr("(share_tokens * 1000000L) div n_tokens") > maxEpochsPpm)
          .as("over_budget"),
        least(col("share_tokens"),
          expr(s"($maxEpochsPpm * n_tokens) div 1000000L"))
          .as("capped_tokens"))
  }

  /** DoReMi-style domain reweighting (Xie et al., NeurIPS 2023): the
    * multiplicative-weights UPDATE RULE over per-domain excess loss —
    * domains where the proxy loss exceeds the reference floor get
    * exponentially upweighted, then the distribution is smoothed
    * toward uniform (`smoothPermille`/1000 mass) so no domain starves.
    * The rule is the operator; the loss columns are pluggable (the
    * `mixture_doremi` query feeds the engine's own KN-smoothed LM loss
    * against the MLE floor).
    *
    * Engine-replay discipline: per-doc losses snap to DECIMAL(18,6)
    * before the per-domain sums (order-free), each mean is ONE double
    * division of the exact sum, exp(η·excess) snaps to DECIMAL(18,8)
    * before the normalizing sum, and the final weight is one identical
    * double expression — so the whole update replays in SQL. One
    * per-domain exchange + a broadcast of the domain-count-sized
    * totals; the domain frame is checkpointed so the (expensive)
    * per-doc scoring lineage never executes twice.
    *
    * @return (domainCol, n_docs, loss, ref_loss, excess, weight_ppm);
    *         weight_ppm sums to ~1e6 over domains (each domain rounds
    *         its ppm independently, so the total can drift from 1e6
    *         by up to ~k/2 — renormalize downstream if an exact ppm
    *         simplex is required)
    */
  def doremiWeights(perDoc: DataFrame, domainCol: String, lossCol: String,
      refCol: String, eta: Double = 1.0,
      smoothPermille: Long = 100L): DataFrame = {
    require(smoothPermille >= 0 && smoothPermille <= 1000,
      s"smoothPermille in [0,1000], got $smoothPermille")
    val perDomain = perDoc.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(lossCol).cast("decimal(18,6)")).as("__sl"),
        sum(col(refCol).cast("decimal(18,6)")).as("__sr"))
      .select(col(domainCol), col("n_docs"),
        (col("__sl").cast("double") / col("n_docs")).as("__loss"),
        (col("__sr").cast("double") / col("n_docs")).as("__ref"))
      .withColumn("__excess", greatest(col("__loss") - col("__ref"), lit(0.0)))
      .withColumn("__w", exp(lit(eta) * col("__excess")).cast("decimal(18,8)"))
      .localCheckpoint(true)
    val tot = perDomain.agg(sum(col("__w")).as("__tw"),
      count(lit(1)).as("__k"))
    // exact double literals — (1000-sp)/1000 parses to the same double
    // as the oracle's decimal literal, where 1.0 - sp/1000.0 would not
    val keep = (1000L - smoothPermille).toDouble / 1000.0
    val floorPpm = (smoothPermille * 1000L).toDouble
    perDomain.crossJoin(broadcast(tot))
      .select(col(domainCol), col("n_docs"),
        round(col("__loss"), 4).as("loss"),
        round(col("__ref"), 4).as("ref_loss"),
        round(col("__excess"), 4).as("excess"),
        round(lit(keep)
            * (col("__w").cast("double") / col("__tw").cast("double"))
            * lit(1000000.0)
          + lit(floorPpm) / col("__k"), 0)
          .cast("long").as("weight_ppm"))
  }

  /** ITERATED DoReMi (Xie et al., NeurIPS 2023, Algorithm 1 proper):
    * the published loop is reweight → RETRAIN the proxy on the new
    * mixture → rescore → multiplicative-weights update, which
    * [[doremiWeights]]'s single update cannot capture. With an n-gram
    * proxy the retrain step is computable in dataflow: round r refits
    * the interpolated-KN bigram model on DOMAIN-WEIGHTED counts
    * (each domain's count contribution scaled by its round-(r−1)
    * weight), rescores every document under the refitted model, and
    * updates `w_r = w_{r−1} · exp(η · excess_r)` — so a domain that
    * gets upweighted sees its bigrams better supported, its KN loss
    * falls toward its MLE floor, and its excess self-limits: the
    * weights CONVERGE instead of compounding forever.
    *
    * Exact-replay discipline (every round unrolls in SQL, the
    * bt_ratings pattern):
    *  - weighted counts are INTEGERS: the per-domain multiplier is
    *    `weight_ppm · k` (uniform start = exactly 1,000,000 per
    *    domain), so `c2w = Σ ppmk·c2d` is an order-free BIGINT sum and
    *    the absolute discount scales to `D·10⁶` — round 1 is the
    *    unweighted fit in exact arithmetic;
    *  - per-bigram NLL snaps to DECIMAL(20,8), per-doc means round to
    *    4dp, per-domain sums accumulate DECIMAL(18,6) — the
    *    [[graft.operators.CorpusLm]] scoring discipline unchanged;
    *  - the MW state is k-domain-bounded and steps on the DRIVER with
    *    the same HALF_UP decimal snaps the SQL replay uses (the
    *    Lloyd-state collect pattern): `w` snaps to DECIMAL(18,8), the
    *    ppm projection is `round(keep·w/Σw·10⁶ + floor/k)`.
    *
    * Scale: each round is ONE distributed rescoring pass (bigram
    * stream ⋈ the bigram-vocab-bounded weighted count table — the
    * stream is deliberately recomputed, not cached: at 100 TB the
    * token re-scan is cheaper than materializing it); only k-sized
    * domain stats ever reach the driver.
    *
    * @return one row per (round, domain): (round, domainCol, n_docs,
    *         loss, ref_loss, excess, weight_ppm) — the full k-round
    *         trajectory, dumped like bpe_dict_states.
    */
  def doremiIterate(docs: DataFrame, textCol: String, idCol: String,
      domainCol: String, rounds: Int, eta: Double = 1.0,
      smoothPermille: Long = 100L, discount: Double = 0.5): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"rounds in [1,8], got $rounds")
    require(smoothPermille > 0 && smoothPermille <= 1000,
      s"smoothPermille in (0,1000] (a zero floor could zero a domain's counts), got $smoothPermille")
    require(discount > 0 && discount < 1, s"discount in (0,1), got $discount")
    val spark = docs.sparkSession
    val toks = docs
      .select(col(idCol), col(domainCol).as("__dom"),
        posexplode(split(col(textCol), " ")))
      .select(col(idCol), col("__dom"), col("pos"), col("col").as("w"))
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val bi = toks.withColumn("w1", lag(col("w"), 1).over(byDoc))
      .where(col("w1").isNotNull)
      .select(col(idCol), col("__dom"), col("w1"), col("w").as("w2"))
    // the one per-domain count table every round reweights — (domain ×
    // bigram-vocab)-bounded, snapshotted once
    val c2d = bi.groupBy(col("__dom"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2d"))
      .localCheckpoint(true)
    val c2 = c2d.groupBy(col("w1"), col("w2")).agg(sum(col("c2d")).as("c2"))
      .localCheckpoint(true)
    val left = c2.groupBy(col("w1"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1f"))
    val right = c2.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val types = c2.agg(count(lit(1)).as("nt"))
    // static reference floor: the per-domain mean of per-doc MLE NLL
    val refDom = bi.join(c2, Seq("w1", "w2"))
      .join(broadcast(left.select(col("w1"), col("c1"))), Seq("w1"))
      .select(col(idCol), col("__dom"),
        (-log(col("c2") / col("c1"))).cast("decimal(20,8)").as("mle"))
      .groupBy(col(idCol), col("__dom"))
      .agg(round(sum(col("mle")).cast("double") / count(lit(1)), 4)
        .as("__ref"))
      .groupBy(col("__dom"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__ref").cast("decimal(18,6)")).as("__sr"))
      .select(col("__dom"), col("n_docs"),
        (col("__sr").cast("double") / col("n_docs")).as("__ref0"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val domains = refDom.keys.toSeq.sorted
    val kd = domains.length
    val keep = (1000L - smoothPermille).toDouble / 1000.0
    val floorPpm = (smoothPermille * 1000L).toDouble
    val dScaled = lit(discount * 1000000.0)
    def snap8(x: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(x).setScale(8, java.math.RoundingMode.HALF_UP)
    def round4(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP)
        .doubleValue
    var ppmk: Map[String, Long] = domains.map(_ -> 1000000L).toMap
    var w: Map[String, java.math.BigDecimal] =
      domains.map(_ -> snap8(1.0)).toMap
    val out = Seq.newBuilder[(Long, String, Long, Double, Double, Double, Long)]
    for (r <- 1 to rounds) {
      val wlit = typedLit(ppmk)
      // DECIMAL(38,0) accumulation: the ppm·k-scaled counts are ~1e6·k
      // per domain row, and Spark's sum(long) wraps SILENTLY at 2^63
      // while the DuckDB oracle widens BIGINT sums to HUGEINT — the
      // engines would diverge before either errors. Order-free and
      // overflow-safe up to 10^38 (r18 advice).
      val c2w = c2d.select(col("w1"), col("w2"),
          (element_at(wlit, col("__dom")) * col("c2d"))
            .cast("decimal(38,0)").as("__sc"))
        .groupBy(col("w1"), col("w2")).agg(sum(col("__sc")).as("c2w"))
      val leftW = c2w.groupBy(col("w1")).agg(sum(col("c2w")).as("c1w"))
      val domLoss = bi.join(c2w, Seq("w1", "w2"))
        .join(broadcast(leftW), Seq("w1"))
        .join(broadcast(left.select(col("w1"), col("n1f"))), Seq("w1"))
        .join(broadcast(right), Seq("w2"))
        .crossJoin(broadcast(types))
        .select(col(idCol), col("__dom"),
          (-log(greatest(col("c2w") - dScaled, lit(0.0)) / col("c1w")
            + (dScaled * col("n1f") / col("c1w"))
              * (col("n1b") / col("nt"))))
            .cast("decimal(20,8)").as("nll"))
        .groupBy(col(idCol), col("__dom"))
        .agg(round(sum(col("nll")).cast("double") / count(lit(1)), 4)
          .as("__kn"))
        .groupBy(col("__dom"))
        .agg(sum(col("__kn").cast("decimal(18,6)")).as("__sl"),
          count(lit(1)).as("__nd"))
        .collect()
        .map(x => x.getString(0) ->
          (x.getDecimal(1).doubleValue / x.getLong(2)))
        .toMap
      // the k-bounded MW step, with the SAME snap points the SQL
      // replay applies (double mul/exp, DECIMAL(18,8) snap, double
      // normalize, round-to-ppm)
      val stepped = domains.map { d =>
        val loss0 = domLoss(d)
        val ref0 = refDom(d)._2
        val excess = math.max(loss0 - ref0, 0.0)
        val wNew = snap8(w(d).doubleValue * math.exp(eta * excess))
        (d, loss0, ref0, excess, wNew)
      }
      val tw = stepped.map(_._5).reduce(_ add _)
      val ppm = stepped.map { case (d, _, _, _, wNew) =>
        d -> math.round(keep * (wNew.doubleValue / tw.doubleValue)
          * 1000000.0 + floorPpm / kd)
      }.toMap
      stepped.foreach { case (d, loss0, ref0, excess, wNew) =>
        out += ((r.toLong, d, refDom(d)._1, round4(loss0), round4(ref0),
          round4(excess), ppm(d)))
        w += d -> wNew
      }
      ppmk = domains.map(d => d -> ppm(d) * kd).toMap
    }
    import spark.implicits._
    out.result().toDF("round", domainCol, "n_docs", "loss", "ref_loss",
      "excess", "weight_ppm")
  }

  private def gumbelKey(id: Column, weight: Column): Column = {
    val g = conv(substring(md5(id.cast("string")), 1, 4), 16, 10)
      .cast("double")
    log((g + lit(0.5)) / lit(65536.0)) / weight
  }
}
