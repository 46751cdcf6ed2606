package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - `bruteForceTopK`: exact cosine top-k — a single scan with a 1-row
  *    broadcast of the query vector; the correctness baseline.
  *  - `lshTopK`: random-hyperplane LSH buckets prune the scan, then exact
  *    cosine reranks inside the probed buckets — the 100 TB path (bucket
  *    column can be partition/bucket key of the stored table so probes
  *    become partition pruning).
  *  - `ivfTopK`/`knnJoinIvf`: KMeans coarse cells + nprobe + exact
  *    rerank — probes become partition pruning on a cell-keyed table.
  *  - `fitPq`/`pqEncode`/`pqTopK`: product quantization with ADC scan +
  *    exact rerank — the compressed-storage path (m ints per vector).
  */
object SimilaritySearch {

  /** Seed-fixed random hyperplanes (deterministic across runs). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Exact cosine top-k of `queryId`'s vector against all other vectors.
    * The query's norm rides along in the broadcast row; each data row
    * computes its own norm + one dot, all codegen'd.
    */
  def bruteForceTopK(df: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = df.where(col(idCol) === queryId)
      .select(col(vecCol).as("qv"), VectorOps.l2Norm(col(vecCol)).as("qn"))
    df.where(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        round(VectorOps.cosineWithNorms(col(vecCol), col("qv"),
          VectorOps.l2Norm(col(vecCol)), col("qn")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Rocchio vector pseudo-relevance feedback (Rocchio, SMART 1971 —
    * the embedding sibling of the BM25 PRF pass): retrieve the query's
    * top-`fb` neighbors exactly, move the query to
    * q′ = α·q + β·centroid(feedback), re-search with q′. The feedback
    * centroid accumulates per-dimension in DECIMAL(20,10) (a double sum
    * over the feedback rows would be partition-order-dependent), only
    * fb ids and the d-sized centroid reach the driver (the Lloyd-state
    * collect pattern), and feedback docs are excluded from the final
    * ranking alongside the query itself — they are already known
    * relevant. Both passes are the [[bruteForceTopK]] scan shape; at
    * corpus scale pass 2 swaps to the IVF stack exactly as the
    * brute-force siblings document.
    */
  def rocchioTopK(df: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, fb: Int = 5, alpha: Double = 0.5,
      beta: Double = 0.5): DataFrame = {
    require(k >= 1 && fb >= 1, s"need k, fb >= 1; got k=$k fb=$fb")
    val fbIds = bruteForceTopK(df, vecCol, idCol, queryId, fb)
      .select(col(idCol)).collect().map(_.getLong(0)).toSeq
    val cent = df.where(col(idCol).isin(fbIds: _*))
      .select(posexplode(col(vecCol)))
      .groupBy(col("pos"))
      .agg((sum(col("col").cast("double").cast("decimal(20,10)"))
        .cast("double") / count(lit(1))).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val q0 = df.where(col(idCol) === queryId)
      .select(col(vecCol)).head().getSeq[Float](0)
    val qPrime = q0.indices.map(i => alpha * q0(i) + beta * cent(i))
    val qLit = array(qPrime.map(v => lit(v)): _*)
    // q′ norm: square terms snap to DECIMAL(20,10) before the sum so
    // the value matches the oracle's decimal-summed norm exactly (a
    // plain double fold could differ from SQL's sum order by an ulp)
    val qn = math.sqrt(qPrime.map(v =>
      BigDecimal.valueOf(v * v).setScale(10, BigDecimal.RoundingMode.HALF_UP))
      .sum.toDouble)
    df.where(col(idCol) =!= queryId && !col(idCol).isin(fbIds: _*))
      .select(col(idCol),
        round(VectorOps.cosineWithNorms(col(vecCol), qLit,
          VectorOps.l2Norm(col(vecCol)), lit(qn)), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Filtered exact search: same scan as [[bruteForceTopK]] but the
    * CANDIDATE set is restricted by a metadata predicate (the query
    * vector is looked up unfiltered) — the "filtered vector search"
    * every retrieval stack needs (search within a language / license /
    * label). The filter sits directly on the candidate scan, so it
    * pushes into the parquet reader; with the vector table partitioned
    * or z-ordered on the filter column it becomes partition pruning
    * BEFORE any distance math.
    */
  def bruteForceTopKFiltered(df: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, candidateFilter: Column): DataFrame = {
    val q = df.where(col(idCol) === queryId)
      .select(col(vecCol).as("qv"), VectorOps.l2Norm(col(vecCol)).as("qn"))
    df.where(col(idCol) =!= queryId).where(candidateFilter)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        round(VectorOps.cosineWithNorms(col(vecCol), col("qv"),
          VectorOps.l2Norm(col(vecCol)), col("qn")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** LSH-bucketed ANN: signature match on `probePlanes` of the hyperplane
    * bits selects candidate rows; exact cosine reranks them. Recall is
    * tunable via number of planes (fewer planes = bigger buckets).
    */
  def lshTopK(df: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val signed = df.withColumn("bucket",
      VectorOps.hyperplaneSignature(col(vecCol), planes))
    val q = signed.where(col(idCol) === queryId)
      .select(col(vecCol).as("qv"), col("bucket").as("qbucket"))
    signed.where(col(idCol) =!= queryId)
      .join(broadcast(q), col("bucket") === col("qbucket"))
      .select(col(idCol),
        round(VectorOps.cosine(col(vecCol), col("qv")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Fit IVF coarse-quantizer centroids with MLlib KMeans (k-means||
    * init, distributed Lloyd iterations — the real thing, not a
    * first-k-rows placeholder). Seeded → deterministic across runs.
    * Returns centroids in [[assignToCentroids]]'s shape. The features
    * frame is persisted for the iterations and released afterwards.
    */
  def fitIvf(df: DataFrame, vecCol: String, k: Int, seed: Long = 42L,
      maxIter: Int = 5): Seq[(Int, Seq[Double])] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val features = df
      .select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
      // a coarse quantizer fits on a sample-sized frame; keeping dozens
      // of near-empty partitions makes every Lloyd job pay scheduler
      // overhead, so bound the task count
      .coalesce(8)
      .persist()
    try {
      val model = new KMeans()
        .setK(k).setSeed(seed).setMaxIter(maxIter).setFeaturesCol("features")
        // seeded random init: one pass, vs k-means||'s multiple init
        // rounds of jobs — for COARSE cells the refinement iterations
        // dominate quality anyway
        .setInitMode("random")
        .fit(features)
      model.clusterCenters.toSeq.zipWithIndex
        .map { case (c, i) => i -> c.toArray.toSeq }
    } finally features.unpersist(blocking = false)
  }

  /** IVF-style coarse quantization: assign every vector to its nearest of
    * `centroids` (broadcast), producing a clustering column to partition or
    * bucket the stored table by — queries then scan only the probed cells.
    */
  def assignToCentroids(df: DataFrame, vecCol: String, centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    // argmin ||v−c||² = argmin (||c||² − 2·v·c): the row's own norm is
    // common to every cell, so each centroid costs ONE codegen'd dot
    // (||c||² folds to a literal at plan time). Above 64 cells the
    // literal fold's O(kCells·d) GENERATED SOURCE dominates (measured
    // 63 s of a 63.1 s inline IVF run at kCells=447 — SCALE.md r19);
    // the compiled CentroidArgmin kernel computes the IDENTICAL double
    // sequence (element-order dot, same ||c||² fold, same (d, cid)
    // tie-break — CentroidArgminSpec pins path equality) in a fixed
    // ~30-line eval. Both paths stay: the small-k literal form is the
    // whole-stage-codegen fast path the gate rows run.
    if (centroids.size > 64) {
      import org.apache.spark.sql.graftshim.ColumnShim
      df.withColumn("cell", ColumnShim.column(
        graft.functions.expressions.CentroidArgmin(
          ColumnShim.expression(col(vecCol)), centroids)))
    } else {
      val assignments = centroids.map { case (cid, c) =>
        val cNormSq = c.map(x => x * x).sum
        struct((lit(cNormSq) - lit(2.0) * VectorOps.dot(col(vecCol), array(c.map(lit): _*))).as("d"),
          lit(cid).as("cid"))
      }
      df.withColumn("cell", array_min(array(assignments: _*)).getField("cid"))
    }
  }

  /** The `nprobe` cells nearest to a query vector (driver-side math over
    * the centroid list — centroids are by construction a tiny driver
    * object). More probes trade scan volume for recall, the standard
    * IVF knob.
    */
  def probeCells(query: Seq[Double], centroids: Seq[(Int, Seq[Double])],
      nprobe: Int): Seq[Int] =
    centroids
      .map { case (cid, c) =>
        cid -> c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum
      }
      .sortBy { case (cid, d) => (d, cid) }
      .take(nprobe).map(_._1)

  /** Batch k-NN join, exact: top-k cosine neighbors for EVERY row of a
    * bounded query batch against the corpus — the many-queries shape
    * retrieval / near-dup audit actually runs (the single-`queryId`
    * variants above are its 1-row special case). The query batch
    * broadcasts (it is bounded by construction — a probe set, not a
    * second corpus), the corpus scans ONCE with all per-pair math
    * codegen'd map-side, and the only shuffle is the per-query top-k
    * window, partitioned by query id — never a partitionless sort.
    * |Q|·|C| scored rows is the inherent brute-force cost; the scale
    * path is [[knnJoinIvf]], which prunes scoring to probed cells.
    */
  def knnJoinBruteForce(corpus: DataFrame, queries: DataFrame,
      vecCol: String, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorOps.l2Norm(col(vecCol)).as("qn"))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("v"),
        VectorOps.l2Norm(col(vecCol)).as("vn"))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosineWithNorms(col("v"), col("qv"), col("vn"), col("qn")).as("cos"))
    val byQuery = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(byQuery).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cosine"))
  }

  /** Batch k-NN join, IVF-pruned: each query scores only the corpus rows
    * inside its `nprobe` nearest cells. Per-query probed cells are picked
    * declaratively (sort the centroid-distance structs, slice, explode —
    * all codegen'd, no driver loop over queries), so the whole join is
    * one broadcast-hash join on the `cell` key: with the corpus stored
    * partitioned/bucketed by cell this is partition pruning per query —
    * the 100 TB retrieval shape. Exact cosine reranks the survivors;
    * top-k via the same query-partitioned window as the brute-force form.
    */
  def knnJoinIvf(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, centroids: Seq[(Int, Seq[Double])],
      nprobe: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quantized = assignToCentroids(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v"),
        VectorOps.l2Norm(col(vecCol)).as("vn")), "v", centroids)
    val cellDists = centroids.map { case (cid, c) =>
      val cNormSq = c.map(x => x * x).sum
      struct(
        (lit(cNormSq) - lit(2.0) * VectorOps.dot(col(vecCol), array(c.map(lit): _*))).as("d"),
        lit(cid).as("cid"))
    }
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorOps.l2Norm(col(vecCol)).as("qn"),
      explode(slice(array_sort(array(cellDists: _*)), 1, nprobe)
        .getField("cid")).as("cell"))
    val scored = quantized.join(broadcast(q), Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosineWithNorms(col("v"), col("qv"), col("vn"), col("qn")).as("cos"))
    val byQuery = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(byQuery).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cosine"))
  }

  /** Product-quantization codebooks: the vector space split into `m`
    * equal subspaces, each with its own `codesPerSub`-centroid codebook
    * over the corresponding slice of the (caller-sampled) training
    * vectors. Returns one (cid, centroid) list per subspace, the input
    * shape of [[pqEncode]]/[[pqTopK]].
    *
    * All `m` codebooks train TOGETHER as one grouped Lloyd loop over an
    * exploded (subspace, subvector) frame: seeded-hash initialization is
    * one job, and each Lloyd round is ONE aggregate job that refines
    * every codebook at once (assignment = per-subspace argmin via the
    * ||c||²−2·v·c literal fold, re-estimation = a (s, code, pos) mean).
    * Training the subspaces as m separate KMeans fits costs m× the
    * per-job scheduling/codegen floor — ~40 jobs for m=8 — for the same
    * arithmetic; the grouped loop is 1 + maxIter jobs regardless of m.
    * Deterministic for a fixed seed and input partitioning.
    */
  def fitPq(df: DataFrame, vecCol: String, dim: Int, m: Int,
      codesPerSub: Int = 16, seed: Long = 42L,
      maxIter: Int = 5): Seq[Seq[(Int, Seq[Double])]] = {
    import org.apache.spark.sql.expressions.Window
    require(m >= 1 && dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    val sub = dim / m
    val subRows = df.select(inline(array((0 until m).map(s =>
      struct(lit(s).as("s"), slice(col(vecCol).cast("array<double>"),
        s * sub + 1, sub).as("subv"))): _*)))
      // codebooks fit on a sample-sized frame (same rationale as
      // fitIvf): every Lloyd job over 32 near-empty partitions pays 32
      // tasks of scheduler overhead for microseconds of arithmetic —
      // bound the task count before the persist
      .coalesce(8)
      .persist()
    try {
      // seeded init: the codesPerSub distinct sub-vectors per subspace
      // that sort first by their salted hash — deterministic, spread
      // uniformly over the data, one job for every subspace at once
      val byHash = Window.partitionBy(col("s"))
        .orderBy(xxhash64(col("subv"), lit(seed)), col("subv"))
      var centroids: Map[Int, Vector[Seq[Double]]] = subRows
        .dropDuplicates("s", "subv")
        .withColumn("rn", row_number().over(byHash))
        .where(col("rn") <= codesPerSub)
        .collect()
        .groupBy(_.getInt(0))
        .map { case (s, rows) =>
          s -> rows.sortBy(_.getInt(2)).map(_.getSeq[Double](1)).toVector }
      for (_ <- 1 to maxIter) {
        // per-row nearest code: ONE codesPerSub-term argmin shared by
        // every subspace — each term picks its centroid/norm out of flat
        // (s × code)-indexed typedLit literals with the row's own `s`.
        // Two codegen properties matter: the literals live in the
        // references array (not inlined doubles), so the generated
        // source is byte-identical across Lloyd rounds and fitPq calls
        // and the codegen cache hits; and the expression is K terms, not
        // m×K when-chain branches. Subspaces whose codebook came up
        // short of codesPerSub pad with +∞ norms that can never win.
        val normsFlat = typedLit((0 until m).flatMap(s =>
          (0 until codesPerSub).map(ci =>
            centroids(s).lift(ci).map(c => c.map(x => x * x).sum)
              .getOrElse(Double.PositiveInfinity))))
        val centsFlat = typedLit((0 until m).flatMap(s =>
          (0 until codesPerSub).map(ci =>
            centroids(s).lift(ci).getOrElse(Seq.fill(sub)(0.0)))))
        val structs = (0 until codesPerSub).map { ci =>
          val idx = col("s") * codesPerSub + ci + 1
          struct((element_at(normsFlat, idx) - lit(2.0) *
            VectorOps.dot(col("subv"), element_at(centsFlat, idx))).as("d"),
            lit(ci).as("cid"))
        }
        val codeExpr = array_min(array(structs: _*)).getField("cid")
        // re-estimate every codebook in ONE aggregate: (s, code, pos) mean
        val means = subRows.withColumn("code", codeExpr)
          .select(col("s"), col("code"), posexplode(col("subv")))
          .groupBy(col("s"), col("code"), col("pos"))
          .agg(avg(col("col")).as("mu"))
          .collect()
          .groupBy(r => (r.getInt(0), r.getInt(1)))
          .map { case (k, rows) =>
            k -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq }
        centroids = centroids.map { case (s, cb) =>
          s -> cb.zipWithIndex.map { case (old, ci) =>
            means.getOrElse((s, ci), old) // empty cluster keeps its centroid
          }
        }
      }
      (0 until m).map(s => centroids(s).zipWithIndex.map {
        case (c, ci) => ci -> c })
    } finally subRows.unpersist(blocking = false)
  }

  /** Encode every vector to its `m` PQ codes via the
    * [[graft.functions.expressions.PqCodes]] expression — the codebooks
    * ride the codegen references (one tight primitive loop, a one-line
    * generated call whose source is identical for every codebook), where
    * a composed argmin would constant-fold m×codesPerSub centroid
    * literals into seconds of per-codebook Janino compile. The 100 TB
    * point: persist (id, pq_code) as the SCAN table — m small ints per
    * vector instead of dim floats (16-64× smaller), so the ADC candidate
    * scan reads codes only and the full vectors are fetched for nothing
    * but the bounded rerank set.
    */
  def pqEncode(df: DataFrame, vecCol: String,
      codebooks: Seq[Seq[(Int, Seq[Double])]]): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnShim
    df.withColumn("pq_code", ColumnShim.column(
      graft.functions.expressions.PqCodes(
        ColumnShim.expression(col(vecCol).cast("array<double>")),
        codebooks.map(_.sortBy(_._1).map(_._2)))))
  }

  /** PQ-ADC top-k with exact rerank: the query builds `m` driver-side
    * lookup tables (per-subspace L2² from its slice to every code
    * centroid — m×codesPerSub doubles, folded into the plan as
    * literals), each row's approximate distance is m O(1) array
    * lookups summed — never a vector op — and the `rerank` best
    * candidates get the exact cosine. Candidate selection is a
    * TakeOrdered over the codes scan, so with a persisted
    * [[pqEncode]] table the whole ANN query reads m ints per row until
    * the final `rerank`-sized exact pass. ADC ranks by L2 while the
    * rerank ranks by cosine — `rerank ≫ k` absorbs the metric gap
    * (SimilaritySpec measures the recall).
    */
  def pqTopK(df: DataFrame, vecCol: String, idCol: String, queryId: Long,
      k: Int, codebooks: Seq[Seq[(Int, Seq[Double])]],
      rerank: Int = 50): DataFrame = {
    val qVec = df.where(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>")).head().getSeq[Double](0)
    val luts = codebooks.zipWithIndex.map { case (cb, s) =>
      val sub = cb.head._2.length
      val qs = qVec.slice(s * sub, s * sub + sub)
      val arr = new Array[Double](cb.map(_._1).max + 1)
      cb.foreach { case (cid, c) =>
        arr(cid) = c.zip(qs).map { case (a, b) => (a - b) * (a - b) }.sum }
      arr.toSeq
    }
    val adc = luts.zipWithIndex.map { case (lut, s) =>
      element_at(typedLit(lut), element_at(col("pq_code"), s + 1) + 1)
    }.reduce(_ + _)
    val q = df.where(col(idCol) === queryId)
      .select(col(vecCol).as("qv"), VectorOps.l2Norm(col(vecCol)).as("qn"))
    pqEncode(df, vecCol, codebooks)
      .where(col(idCol) =!= queryId)
      .withColumn("adc", adc)
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(rerank)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        round(VectorOps.cosineWithNorms(col(vecCol), col("qv"),
          VectorOps.l2Norm(col(vecCol)), col("qn")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Batch k-NN join over a FULL ADC scan: every query of a bounded
    * batch scores every corpus code — per (row, query) m element_at
    * picks into its precomputed LUT, never a full-vector op — then the
    * per-query `rerank` best candidates get the exact cosine. Same
    * broadcast-batch + query-partitioned-window shape as
    * [[knnJoinBruteForce]]; with a persisted [[pqEncode]] table the
    * candidate stage reads m ints per corpus row. ADC ranks by L2, the
    * rerank by cosine — `rerank ≫ k` absorbs the metric gap.
    *
    * The |Q|×|C| candidate product is this form's inherent cost: exact
    * over the code table (rerank=all ≡ brute force, SimilaritySpec), but
    * every query still touches every corpus row — compression without
    * pruning. The scale path is [[knnJoinIvfPq]], which bounds the ADC
    * to each query's probed coarse cells.
    */
  /** The query-side half of the textbook ADC split, shared by
    * [[knnJoinPq]] and [[knnJoinIvfPq]]: each QUERY row precomputes its
    * `m` lookup tables (distance from its slice to every code centroid)
    * ONCE — m×codesPerSub dots on the bounded batch — so the candidate
    * stage is m array picks + adds per (row, query) pair, with no dot,
    * slice, or allocation in the hot loop. Returns the per-subspace
    * `__lut<s>` columns (centroid components and ||c||² folded into the
    * plan as literal tables indexed by code).
    */
  /** The whole m×codesPerSub table as ONE `array<array<double>>`
    * expression (`__lut2d[s][ci]` = L2² from the vector's subspace-`s`
    * slice to code `ci`), built with nested `transform` lambdas over the
    * FLAT literal codebook. The naive alternative — m separate array
    * columns of codesPerSub scalar dot-expressions — is m×codesPerSub
    * distinct expression trees; at m=64×16 that is ~1000 trees whose
    * analysis + Janino compile costs >10 s of DRIVER time before a row
    * moves (measured — it was most of knn_join_pq's wall clock). The
    * LUT frame is query-batch-sized, so the interpreted higher-order
    * lambda is irrelevant at runtime; only the per-CANDIDATE path
    * ([[pqAdc]]'s m codegen'd picks) needs codegen. Codebooks that came
    * up short of the max code count pad with +∞-norm entries — codes
    * never index them.
    */
  private def pqLut2d(vec: org.apache.spark.sql.Column,
      codebooks: Seq[Seq[(Int, Seq[Double])]]): org.apache.spark.sql.Column = {
    val m = codebooks.length
    val sub = codebooks.head.head._2.length
    val cps = codebooks.map(_.length).max
    val sorted = codebooks.map(_.sortBy(_._1).map(_._2))
    val centsFlat = typedLit(sorted.flatMap(cb =>
      cb.padTo(cps, Seq.fill(sub)(0.0))))
    val normsFlat = typedLit(sorted.flatMap(cb =>
      cb.map(c => c.map(x => x * x).sum).padTo(cps, Double.PositiveInfinity)))
    val v = vec.cast("array<double>")
    transform(sequence(lit(0), lit(m - 1)), s =>
      transform(sequence(lit(0), lit(cps - 1)), ci => {
        val idx = s * cps + ci + lit(1)
        element_at(normsFlat, idx) - lit(2.0) *
          aggregate(
            zip_with(slice(v, s * lit(sub) + lit(1), lit(sub)),
              element_at(centsFlat, idx), (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x)
      }))
  }

  /** Append each row's RESIDUAL from its coarse cell's centroid —
    * `__resid = v − centroid[cell]` (centroid table folded in as a
    * literal, the subtraction one codegen'd zip_with). Residuals are
    * what IVFPQ actually quantizes: within a cell they span only the
    * cell's diameter, not the whole space, so the same m×codesPerSub
    * codebook budget spends its resolution where the candidates
    * actually are. Feed this frame to [[fitPq]] (on `__resid`) and to
    * [[knnJoinIvfPq]]'s corpus-side encoding.
    */
  def cellResiduals(df: DataFrame, vecCol: String,
      centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    val centArr = typedLit(centroids.sortBy(_._1).map(_._2))
    assignToCentroids(df, vecCol, centroids)
      .withColumn("__resid",
        zip_with(col(vecCol).cast("array<double>"),
          element_at(centArr, col("cell") + 1), (a, b) => a - b))
  }

  /** Approximate L2² of a coded corpus row to a query: sum of m
    * `__lut2d` picks indexed by the row's `pq_code` — the HOT path, m
    * codegen'd array reads + adds per (row, query) pair, no lambda. */
  private def pqAdc(m: Int): org.apache.spark.sql.Column =
    (0 until m).map { s =>
      element_at(element_at(col("__lut2d"), s + 1),
        element_at(col("pq_code"), s + 1) + 1)
    }.reduce(_ + _)

  def knnJoinPq(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, codebooks: Seq[Seq[(Int, Seq[Double])]],
      rerank: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = codebooks.length
    val qLuts = queries.select(col(idCol).as("query_id"),
      pqLut2d(col(vecCol), codebooks).as("__lut2d"))
    val adc = pqAdc(m)
    // the |Q|×|C| stage stays SKINNY: ids + the adc scalar only. The
    // LUTs, query vectors, and corpus vectors must NOT ride the pair
    // rows into the top-`rerank` window's shuffle — with them a
    // |Q|×|C| candidate set shuffles gigabytes of repeated payload;
    // without, the rank-filter's map-side WindowGroupLimit leaves
    // ~rerank skinny rows per (query, input-partition).
    val cands = pqEncode(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v")),
      "v", codebooks)
      .join(broadcast(qLuts), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), adc.as("adc"))
    val byQueryAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    val top = cands
      .withColumn("arank", row_number().over(byQueryAdc))
      .where(col("arank") <= rerank)
      .select(col("query_id"), col("neighbor_id"))
    // vectors re-enter only for the bounded rerank set: corpus side by
    // equi-join on the candidate ids, query side re-broadcast
    val qVecs = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), VectorOps.l2Norm(col(vecCol)).as("qn"))
    val reranked = top
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v")),
        Seq("neighbor_id"))
      .join(broadcast(qVecs), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosineWithNorms(col("v"), col("qv"),
          VectorOps.l2Norm(col("v")), col("qn")).as("cos"))
    val byQuery = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    reranked.withColumn("rank", row_number().over(byQuery).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cosine"))
  }

  /** Batch k-NN join, IVF-PQ with residual encoding: the coarse
    * quantizer composed with the code scan — the FAISS IVFPQ shape, and
    * the form that survives 100×. The corpus is assigned to IVF cells
    * and PQ-encoded on its RESIDUALS (`codebooks` must come from
    * [[fitPq]] over [[cellResiduals]]' `__resid` — residuals span a
    * cell's diameter, not the whole space, so the codebook budget
    * resolves the distances that actually rank candidates); each query
    * explodes to its `nprobe` nearest cells (declarative sort-slice-
    * explode over the literal centroid table, no driver loop) carrying
    * per-(query, cell) residual ADC LUTs, and the candidate stage is a
    * broadcast hash join on the CELL key — a query scores only the codes
    * inside its probed cells, |Q|·|C|·(nprobe/kCells) pairs instead of
    * [[knnJoinPq]]'s flat |Q|×|C| product. With the code table stored
    * partitioned/bucketed by cell the probe join is partition pruning,
    * and each partition holds m ints per vector: scan volume drops by
    * BOTH the cell fraction and the PQ compression before a single full
    * vector is touched.
    *
    * The ADC carries the per-(query, cell) `||q−c||²` term: LUT sums
    * alone omit it, and it varies ACROSS a query's probed cells, so
    * without it candidates from different cells would not be comparable.
    * With it, adc ≈ ‖q − (c + r̂)‖² — the true L2 to the reconstruction.
    * Per-query top-`rerank` ADC candidates (skinny rows — ids + adc
    * scalar only into the window shuffle) then get the exact cosine,
    * same rerank discipline as [[knnJoinPq]].
    *
    * Recall knobs: `nprobe` bounds which cells are seen (misses cost
    * recall like [[knnJoinIvf]]), `rerank ≫ k` absorbs the ADC→cosine
    * metric gap (SimilaritySpec pins recall@10 ≥ 0.9 at the bench
    * configuration so speed can't silently trade it away).
    *
    * Broadcast budget: each (query, cell) row carries its LUT —
    * m·codesPerSub doubles (~8 KB at m=64×16), an ~30× inflation over
    * the raw vector. The broadcast is |Q|·nprobe·lutBytes, so a
    * 100k-query batch at nprobe=6 is ~5 GB. The budget is ENFORCED:
    * batches beyond `batchSize` queries (default 10k ≈ 500 MB at the
    * bench config) are split by a deterministic id hash and the chunk
    * results unioned — each chunk's LUT broadcast stays bounded, the
    * corpus side (the expensive, cell-partitioned scan) is unchanged
    * per chunk, and the LUT stays the textbook per-query precompute
    * instead of degrading to per-pair dot products. Chunking is
    * result-invariant (per-query top-k never looks across queries);
    * SimilaritySpec asserts chunked ≡ unchunked literally. The one
    * up-front cost is a count() of the query side — query batches are
    * tiny next to the corpus, and a silent multi-GB driver broadcast
    * is the alternative. Callers chunking a RECOMPUTED corpus should
    * persist/store the coded table once (see [[graft.streaming
    * .AnnIndexStream.indexRows]]) so chunks don't re-encode it.
    */
  def knnJoinIvfPq(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, centroids: Seq[(Int, Seq[Double])],
      codebooks: Seq[Seq[(Int, Seq[Double])]], nprobe: Int = 2,
      rerank: Int = 50, batchSize: Int = 10000): DataFrame = {
    // corpus side: coarse cell + m-int residual codes; full vectors
    // leave the plan here and re-enter only for the bounded rerank set
    val coded = pqEncode(
      cellResiduals(
        corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v")),
        "v", centroids),
      "__resid", codebooks)
      .select(col("cell"), col("neighbor_id"), col("pq_code"))
    chunkedByQueryId(queries, idCol, batchSize) { q =>
      ivfPqRank(coded, corpus, q, vecCol, idCol, k, centroids, codebooks,
        nprobe, rerank)
    }
  }

  /** [[knnJoinIvfPq]] against a MAINTAINED code table (the
    * `(id, cell, pq_code)` rows [[graft.streaming.AnnIndexStream
    * .indexRows]] produces, stored `partitionBy("cell")`): the corpus is
    * never re-encoded, and the union of the batch's probed cells is
    * pushed as a literal IN-list on `cell` BEFORE the probe join — with
    * the table cell-partitioned, the scan is static directory pruning
    * (no reliance on runtime DPP), reading nprobe-ish cells' worth of
    * m-int codes out of the full index. SimilaritySpec pins both the
    * pruned file set and stored ≡ inline results. `corpus` is still
    * needed for the exact-cosine rerank of the bounded candidate set
    * (the code table holds codes, not vectors). The probed-cell
    * collection is one tiny job over the query batch (≤ kCells rows).
    */
  def knnJoinIvfPqStored(codeTable: DataFrame, corpus: DataFrame,
      queries: DataFrame, vecCol: String, idCol: String, k: Int,
      centroids: Seq[(Int, Seq[Double])],
      codebooks: Seq[Seq[(Int, Seq[Double])]], nprobe: Int = 2,
      rerank: Int = 50, batchSize: Int = 10000): DataFrame = {
    val probed = probedCells(queries, vecCol, centroids, nprobe)
    val coded = codeTable
      .select(col(idCol).as("neighbor_id"), col("cell"), col("pq_code"))
      .where(col("cell").isin(probed: _*))
    chunkedByQueryId(queries, idCol, batchSize) { q =>
      ivfPqRank(coded, corpus, q, vecCol, idCol, k, centroids, codebooks,
        nprobe, rerank)
    }
  }

  /** The distinct cells any query in the batch probes — the partition
    * IN-list for a cell-partitioned code table. Bounded by the centroid
    * count regardless of batch size.
    */
  def probedCells(queries: DataFrame, vecCol: String,
      centroids: Seq[(Int, Seq[Double])], nprobe: Int): Seq[Int] = {
    val cellDists = centroids.map { case (cid, c) =>
      val cNormSq = c.map(x => x * x).sum
      struct(
        (lit(cNormSq) - lit(2.0) * VectorOps.dot(col(vecCol), array(c.map(lit): _*))).as("d"),
        lit(cid).as("cid"))
    }
    queries
      .select(explode(slice(array_sort(array(cellDists: _*)), 1, nprobe)
        .getField("cid")).as("cell"))
      .distinct().collect().map(_.getInt(0)).toSeq
  }

  /** Split a query batch into ≤`batchSize` deterministic id-hash chunks
    * and union `f` over them — the broadcast-budget enforcement for the
    * per-(query, cell) LUT joins. Result-invariant: per-query top-k
    * never looks across queries. Costs one count() of the query side.
    */
  private def chunkedByQueryId(queries: DataFrame, idCol: String,
      batchSize: Int)(f: DataFrame => DataFrame): DataFrame = {
    require(batchSize >= 1, s"need batchSize >= 1, got $batchSize")
    val nQueries = queries.count()
    if (nQueries <= batchSize) f(queries)
    else {
      val nChunks = ((nQueries + batchSize - 1) / batchSize).toInt
      (0 until nChunks).map { i =>
        f(queries.where(pmod(xxhash64(col(idCol)), lit(nChunks)) === i))
      }.reduce(_ unionAll _)
    }
  }

  private def ivfPqRank(coded: DataFrame, corpus: DataFrame,
      queries: DataFrame, vecCol: String, idCol: String, k: Int,
      centroids: Seq[(Int, Seq[Double])],
      codebooks: Seq[Seq[(Int, Seq[Double])]], nprobe: Int,
      rerank: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = codebooks.length
    val centArr = typedLit(centroids.sortBy(_._1).map(_._2))
    // query side: probed cells first, then per-(query, cell) LUTs over
    // the query's residual from THAT cell's centroid — the same frame
    // carries ||q−c||² so cross-cell candidates stay comparable
    val cellDists = centroids.map { case (cid, c) =>
      val cNormSq = c.map(x => x * x).sum
      struct(
        (lit(cNormSq) - lit(2.0) * VectorOps.dot(col(vecCol), array(c.map(lit): _*))).as("d"),
        lit(cid).as("cid"))
    }
    val qCells = queries.select(
      col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"),
      explode(slice(array_sort(array(cellDists: _*)), 1, nprobe)
        .getField("cid")).as("cell"))
    val qRes = zip_with(col("__qv"), element_at(centArr, col("cell") + 1),
      (a, b) => a - b)
    val qLuts = qCells.select(
      col("query_id"), col("cell"),
      VectorOps.dot(qRes, qRes).as("__qres_n2"),
      pqLut2d(qRes, codebooks).as("__lut2d"))
    val cands = coded.join(broadcast(qLuts), Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (pqAdc(m) + col("__qres_n2")).as("adc"))
    val byQueryAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    val top = cands
      .withColumn("arank", row_number().over(byQueryAdc))
      .where(col("arank") <= rerank)
      .select(col("query_id"), col("neighbor_id"))
    val qVecs = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), VectorOps.l2Norm(col(vecCol)).as("qn"))
    val rerankedIvf = top
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("v")),
        Seq("neighbor_id"))
      .join(broadcast(qVecs), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosineWithNorms(col("v"), col("qv"),
          VectorOps.l2Norm(col("v")), col("qn")).as("cos"))
    val byQuery = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    rerankedIvf.withColumn("rank", row_number().over(byQuery).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cosine"))
  }

  /** IVF ANN end-to-end: quantize the table, probe the query's `nprobe`
    * nearest cells, exact-cosine rerank inside them. The cell filter is
    * a literal IN-list — stored as a partition/bucket column it becomes
    * partition pruning, which is the 100 TB point of IVF. The single
    * 1-row collect fetches the query vector (bounded by one embedding).
    */
  def ivfTopK(df: DataFrame, vecCol: String, idCol: String, queryId: Long,
      k: Int, centroids: Seq[(Int, Seq[Double])], nprobe: Int = 1): DataFrame = {
    val qRow = df.where(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>")).head()
    val qVec = qRow.getSeq[Double](0)
    val cells = probeCells(qVec, centroids, nprobe)
    val quantized = assignToCentroids(df, vecCol, centroids)
    val q = df.where(col(idCol) === queryId)
      .select(col(vecCol).as("qv"), VectorOps.l2Norm(col(vecCol)).as("qn"))
    quantized
      .where(col("cell").isin(cells: _*) && col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        round(VectorOps.cosineWithNorms(col(vecCol), col("qv"),
          VectorOps.l2Norm(col(vecCol)), col("qn")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Binary-quantized (sign-bit) search: every vector compresses to ONE
    * 64-bit word ([[graft.functions.expressions.SignBits64]] — 32×
    * smaller than float32), the coarse filter is Hamming distance =
    * `bit_count(xor)` (two instructions per candidate), and the
    * `rerank` smallest-Hamming candidates get the exact cosine. The
    * memory-bound regime's standard first stage at corpus scale: the
    * sign table fits where the vectors do not, and the scan is pure
    * codegen'd long math. Fully deterministic (Hamming ties break on
    * id, rerank ties on rounded cosine then id) → exact DuckDB oracle.
    */
  def hammingTopK(df: DataFrame, vecCol: String, idCol: String,
      queryId: Long, k: Int, rerank: Int = 50): DataFrame = {
    require(k >= 1 && rerank >= k, s"need 1 <= k <= rerank; got k=$k rerank=$rerank")
    import org.apache.spark.sql.graftshim.ColumnShim
    def sig(c: Column) = ColumnShim.column(
      graft.functions.expressions.SignBits64(ColumnShim.expression(c)))
    val signed = df.select(col(idCol), col(vecCol), sig(col(vecCol)).as("__sig"))
    val q = signed.where(col(idCol) === queryId)
      .select(col(vecCol).as("qv"), col("__sig").as("__qsig"),
        VectorOps.l2Norm(col(vecCol)).as("qn"))
    signed.where(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol), col(vecCol), col("qv"), col("qn"),
        bit_count(col("__sig").bitwiseXOR(col("__qsig"))).cast("long").as("hamming"))
      .orderBy(col("hamming").asc, col(idCol).asc)
      .limit(rerank)
      .select(col(idCol), col("hamming"),
        round(VectorOps.cosineWithNorms(col(vecCol), col("qv"),
          VectorOps.l2Norm(col(vecCol)), col("qn")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Hard-negative mining for contrastive/embedding training: for each
    * query vector, the `k` NEAREST corpus vectors with a DIFFERENT
    * label — the "confusable but wrong" examples a trainer wants.
    * Exact brute-force form (the oracle/truth baseline — the IVF
    * variants are the scale path, same as [[knnJoinIvf]] vs
    * [[knnJoinBruteForce]]): one broadcast of the query batch, label
    * inequality fused into the join predicate so same-label pairs
    * never materialize.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, labelCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("qlabel"), VectorOps.l2Norm(col(vecCol)).as("qn"))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("v"),
        col(labelCol).as("nlabel"), VectorOps.l2Norm(col(vecCol)).as("vn"))
      .join(broadcast(q),
        col("neighbor_id") =!= col("query_id") && col("nlabel") =!= col("qlabel"))
      .select(col("query_id"), col("neighbor_id"), col("nlabel"),
        VectorOps.cosineWithNorms(col("v"), col("qv"), col("vn"), col("qn")).as("cos"))
    val byQuery = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(byQuery).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("nlabel").cast("long").as("neg_label"), col("rank"),
        round(col("cos"), 4).as("cosine"))
  }
}
