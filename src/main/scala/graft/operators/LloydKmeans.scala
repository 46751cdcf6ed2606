package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Own deterministic Lloyd k-means — the quantizer fit that replays
  * EXACTLY in DuckDB SQL, converting the IVF/PQ quantizer dumps from
  * rows-only census entries into hash-gated rows (the own-HLL
  * conversion pattern from Sketches, applied to clustering).
  *
  * Three ingredients make the float trajectory engine-independent:
  *
  *  1. **Grid-snapped inputs** ([[snapVec]]): every element lands on the
  *     1e-10 decimal grid before any distance math, so normalization
  *     ulp dust (Spark sums norms in array order, DuckDB in whatever
  *     order the group streams) cannot leak into the state.
  *  2. **Hash-ranked init**: the k seed vectors are the sample rows
  *     that sort first by `(xxhash64(id), id)` — pure 64-bit integer
  *     arithmetic, replayed bit-exact in SQL by
  *     [[graft.queries.XxSql]]'s HUGEINT chain. No RNG object, no
  *     partition-order dependence.
  *  3. **DECIMAL-snapped updates**: each Lloyd round's centroid mean
  *     accumulates `Σ value` in DECIMAL (aggregation-order-free by
  *     construction), divides in double, and snaps the result back to
  *     the DECIMAL(20,10) grid — the `bt_ratings` MM-update discipline.
  *     k unrolled rounds therefore replay exactly; the only remaining
  *     cross-engine freedom is the double dot in the ASSIGNMENT argmin,
  *     which both engines compute over identical grid operands (the
  *     same last-ulp robustness every hash-passing assignment oracle
  *     in VectorQueries already relies on).
  *
  * Assignment ties break on (distance, cell) ascending — identical to
  * [[SimilaritySearch.assignToCentroids]]; empty cells keep their
  * previous centroid — identical to [[SimilaritySearch.fitPq]].
  *
  * Scale: the fit consumes a caller-bounded SAMPLE (the FAISS
  * discipline — a coarse quantizer needs cluster shape, not every
  * vector), each round is one assignment+aggregate job, and only
  * k×d (or m×codes×subdim) doubles ever reach the driver.
  */
object LloydKmeans {

  /** Snap every element of an array column onto the 1e-10 decimal
    * grid (cast double → DECIMAL(20,10) → double). Idempotent.
    */
  def snapVec(v: Column): Column =
    transform(v.cast("array<double>"),
      x => x.cast("decimal(20,10)").cast("double"))

  /** Deterministic IVF coarse-quantizer fit: k centroids, `rounds`
    * Lloyd iterations over `df`'s (already caller-sampled) rows.
    * Inputs are grid-snapped internally; returns centroids in
    * [[SimilaritySearch.assignToCentroids]]'s shape.
    */
  def fitIvfOwn(df: DataFrame, vecCol: String, idCol: String, k: Int,
      rounds: Int): Seq[(Int, Seq[Double])] = {
    require(k >= 1 && rounds >= 0, s"need k >= 1, rounds >= 0; got k=$k rounds=$rounds")
    val base = df.select(col(idCol).cast("long").as("__id"),
        snapVec(col(vecCol)).as("__v"))
      // quantizers fit on sample-sized frames; bound the task count so
      // Lloyd jobs don't pay 32 tasks of scheduler overhead each
      .coalesce(8).persist()
    try {
      var cents: Vector[Seq[Double]] = base
        .orderBy(xxhash64(col("__id")), col("__id")).limit(k)
        .collect().map(_.getSeq[Double](1).toVector).toVector
      for (_ <- 1 to rounds) {
        val assigns = cents.zipWithIndex.map { case (c, cid) =>
          val n2 = c.map(x => x * x).sum
          struct((lit(n2) - lit(2.0) * VectorOps.dot(col("__v"),
            array(c.map(lit): _*))).as("d"), lit(cid).as("cid"))
        }
        val means = base
          .withColumn("__cell", array_min(array(assigns: _*)).getField("cid"))
          .select(col("__cell"), posexplode(col("__v")))
          .groupBy(col("__cell"), col("pos"))
          .agg((sum(col("col").cast("decimal(30,10)")).cast("double")
            / count(lit(1))).cast("decimal(20,10)").cast("double").as("mu"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (cid, rows) =>
            cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toVector }
        cents = cents.zipWithIndex.map { case (old, cid) =>
          means.getOrElse(cid, old) }
      }
      cents.zipWithIndex.map { case (c, i) => i -> c }
    } finally base.unpersist(blocking = false)
  }

  /** Deterministic PQ codebook fit — [[SimilaritySearch.fitPq]]'s
    * grouped-Lloyd shape (all m codebooks refine together, one
    * aggregate job per round) with the replayable init and update:
    * each subspace's initial codebook is its first `codesPerSub`
    * DISTINCT subvectors in `(xxhash64(id), id)` order, and means snap
    * to the DECIMAL grid. `df`'s `vecCol` must already be cross-engine
    * exact — [[snapVec]]-snapped values, or residuals of snapped
    * values against grid centroids (an IEEE double subtraction of
    * identical operands is itself identical on both engines).
    */
  def fitPqOwn(df: DataFrame, vecCol: String, idCol: String, dim: Int,
      m: Int, codesPerSub: Int, rounds: Int): Seq[Seq[(Int, Seq[Double])]] = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    require(codesPerSub >= 1 && rounds >= 0)
    val sub = dim / m
    val subRows = df.select(col(idCol).cast("long").as("__id"),
        inline(array((0 until m).map(s =>
          struct(lit(s).as("s"), slice(col(vecCol).cast("array<double>"),
            s * sub + 1, sub).as("subv"))): _*)))
      .coalesce(8).persist()
    try {
      // init: distinct subvectors ranked by the FIRST (hash, id)-ordered
      // row that carries them — "first k distinct in hash order",
      // expressible identically in both engines
      val byHash = Window.partitionBy(col("s"))
        .orderBy(xxhash64(col("__id")), col("__id"))
      val byFirst = Window.partitionBy(col("s")).orderBy(col("__frn"))
      var centroids: Map[Int, Vector[Seq[Double]]] = subRows
        .withColumn("__rn", row_number().over(byHash))
        .groupBy(col("s"), col("subv"))
        .agg(min(col("__rn")).as("__frn"))
        .withColumn("__crn", row_number().over(byFirst))
        .where(col("__crn") <= codesPerSub)
        .collect()
        .groupBy(_.getInt(0))
        .map { case (s, rows) =>
          s -> rows.sortBy(_.getInt(3)).map(_.getSeq[Double](1).toVector).toVector }
      for (_ <- 1 to rounds) {
        // flat (s × code)-indexed literal tables — same codegen-cache
        // shape as fitPq (references-array literals, K argmin terms)
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
        val means = subRows.withColumn("code", codeExpr)
          .select(col("s"), col("code"), posexplode(col("subv")))
          .groupBy(col("s"), col("code"), col("pos"))
          .agg((sum(col("col").cast("decimal(30,10)")).cast("double")
            / count(lit(1))).cast("decimal(20,10)").cast("double").as("mu"))
          .collect()
          .groupBy(r => (r.getInt(0), r.getInt(1)))
          .map { case (key, rows) =>
            key -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toVector }
        centroids = centroids.map { case (s, cb) =>
          s -> cb.zipWithIndex.map { case (old, ci) =>
            means.getOrElse((s, ci), old) }
        }
      }
      (0 until m).map(s => centroids(s).zipWithIndex.map {
        case (c, ci) => ci -> c })
    } finally subRows.unpersist(blocking = false)
  }
}
