package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values, "theta") distinct sketches — the SET-OPERATION
  * member of the sketch family: [[Sketches]]' HLL unions cardinalities
  * but cannot intersect; a KMV sketch is a uniform sample of the hash
  * space below a per-set threshold θ, so union, INTERSECTION, and
  * difference all estimate from the merged sample (Beyer et al. 2007,
  * the Theta-sketch framework's core).
  *
  * Determinism contract: the "random" hash is 48 bits of md5 (the
  * [[GraphAlgs.randomWalks]] draw discipline), so a sketch is a pure
  * function of the value set and every estimate is exact integer
  * arithmetic — `n̂ = ((k−1)·2⁴⁸) div h_k` — replayable bit for bit by a
  * SQL oracle, unlike a seeded-RNG sketch. Estimator error is the
  * standard KMV ~1/√(k−2) regardless of set size.
  *
  * Scale shape: one distinct on (group, value) — the only data-sized
  * shuffle — then ONE group-partitioned window keeps k rows per group;
  * everything pairwise runs on (groups·k)-sized frames. Sketches are
  * mergeable by construction (union = re-rank the concatenation), so
  * per-partition/per-day sketches roll up without touching raw data —
  * the 100 TB pattern: sketch once, combine cheap forever.
  */
object KmvSketch {

  /** 48-bit md5 hash of a value — the shared draw for sketch and
    * oracle. 2⁴⁸ value space: collision-safe to ~10⁷ distinct per set
    * (birthday bound), the right trade for an exact-replay contract.
    */
  def hash48(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast("long")

  val HashSpace: Long = 1L << 48

  /** Per-group bottom-k sketch: ≤ k rows (group, h, rk), rk 1-based in
    * ascending hash order. Duplicate values collapse before ranking
    * (a sketch sees the SET).
    */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2; got $k")
    val grp = groupCols.map(col)
    val w = Window.partitionBy(grp: _*).orderBy(col("__h"))
    df.select(grp :+ hash48(col(valueCol)).as("__h"): _*)
      .distinct()
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .select(grp :+ col("__h").as("h") :+ col("__rk").as("rk"): _*)
  }

  /** Distinct-count estimates from a sketch: exact when the set had
    * < k members (the sketch IS the set), `((k−1)·2⁴⁸) div h_k` when
    * saturated. The one unguarded corner: a value hashing to exactly 0
    * makes h_k = 0 possible only when the k-th SMALLEST of ≥ k hashes
    * is 0 — i.e. k distinct values all collide on 0, probability
    * ~2⁻⁴⁸ᵏ — so the integral division's null-on-zero is left as the
    * (unreachable in practice) honest answer rather than a fabricated
    * estimate.
    *
    * @return per group: (…groupCols, n_kept, est_distinct)
    */
  def estimate(sk: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val grp = groupCols.map(col)
    sk.groupBy(grp: _*)
      // long, not the window's int: the oracle's max(rk) exports int64
      // through Arrow, and the driver's typed canonicalization should
      // never depend on integer-width forgiveness (the pack lesson)
      .agg(max(col("rk")).cast("long").as("n_kept"),
        max(when(col("rk") === k, col("h"))).as("__hk"))
      .select(grp :+ col("n_kept") :+
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"(${k - 1}L * ${HashSpace}L) div __hk"))
          .as("est_distinct"): _*)
  }

  /** Pairwise set-operation estimates between every two groups of a
    * single-key sketch table: merge the two sketches, re-rank, θ = the
    * k-th merged hash (or the max when the union is small — then
    * everything is exact); hashes below θ present in BOTH sketches
    * estimate the intersection by inclusion ρ = |both < θ| / k:
    * |A∩B| = (ρ·(k−1)·2⁴⁸) div θ, one integral division. Union and
    * Jaccard follow from the same merged sample.
    *
    * @return (grp_a, grp_b, est_a, est_b, est_union, est_inter,
    *         jaccard_ppm) for every unordered pair, grp_a < grp_b
    */
  def pairOps(sk: DataFrame, groupCol: String, k: Int): DataFrame = {
    val est = estimate(sk, Seq(groupCol), k)
    val a = sk.select(col(groupCol).as("grp_a"), col("h"))
    val b = sk.select(col(groupCol).as("grp_b"), col("h"))
    val pairs = est.select(col(groupCol).as("grp_a")).crossJoin(
        broadcast(est.select(col(groupCol).as("grp_b"))))
      .where(col("grp_a") < col("grp_b"))
    // merged sample per pair: union of the two sketches' hash sets
    val merged = pairs.join(a, Seq("grp_a"))
      .select(col("grp_a"), col("grp_b"), col("h"), lit(1).as("in_a"),
        lit(0).as("in_b"))
      .unionByName(pairs.join(b, Seq("grp_b"))
        .select(col("grp_a"), col("grp_b"), col("h"), lit(0).as("in_a"),
          lit(1).as("in_b")))
      .groupBy(col("grp_a"), col("grp_b"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val w = Window.partitionBy(col("grp_a"), col("grp_b")).orderBy(col("h"))
    // the merged sample is ranks 1..k: every hash ≤ θ of EITHER input
    // sketch survives merging (θ_merged ≤ min(θ_A, θ_B)), so sketch
    // membership below θ IS set membership — the theta-framework
    // invariant that makes the intersection estimate sound
    val sample = merged.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
    sample.groupBy(col("grp_a"), col("grp_b"))
      .agg(count(lit(1)).as("__m"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
          .as("__both"),
        max(when(col("rk") === k, col("h"))).as("__hk"))
      // __hk null → the union had < k members: the sample is the whole
      // set and the estimates are exact counts
      .withColumn("est_union", when(col("__hk").isNull, col("__m"))
        .otherwise(expr(s"(${k - 1}L * ${HashSpace}L) div __hk")))
      .withColumn("est_inter", when(col("__hk").isNull, col("__both"))
        .otherwise(expr(
          s"""(CAST(__both AS DECIMAL(38,0)) * ${k - 1} * ${HashSpace}L)
              div (${k}L * __hk)""")))
      .join(broadcast(est.select(col(groupCol).as("grp_a"),
        col("est_distinct").as("est_a"))), Seq("grp_a"))
      .join(broadcast(est.select(col(groupCol).as("grp_b"),
        col("est_distinct").as("est_b"))), Seq("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("est_a"), col("est_b"),
        col("est_union"), col("est_inter"),
        expr("(1000000 * est_inter) div est_union").as("jaccard_ppm"))
  }
}
