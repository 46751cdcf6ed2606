package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit, replayable Bloom-filter semi-join prune — the ingest-side
  * gate of incremental dedup at 100 TB: a few KB of bit positions built
  * from the corpus fingerprint index, broadcast to the arriving batch,
  * classify every new document as DEFINITELY-new (skip the expensive
  * exact anti-join entirely) or maybe-seen (only those rows reach the
  * exact check). No false negatives by construction; the false-positive
  * rate is measured, not assumed.
  *
  * Spark's own `bloom_filter_agg` keeps its bit array in an opaque
  * binary blob; this operator instead materializes the SET of set bit
  * positions (≤ m rows, m a few thousand) from the same md5-48 family
  * every other replayable operator uses (two Kirsch-Mitzenmacher-style
  * independent draws, k=2), so a DuckDB oracle replays membership
  * decisions bit-exactly — the same determinism contract as
  * [[KmvSketch]].
  *
  * Scale shape: the bits frame is bounded by m regardless of corpus
  * size (build = one map-side-partial distinct over fingerprints); the
  * probe is two broadcast hash joins — the big batch side never
  * shuffles. Reference scope: none — the reference has no membership
  * pruning; this is part of the training-data-pipeline extension
  * surface (dedup family at ingest) this engine adds.
  */
object BloomPrune {

  /** Filter size for a ~1% false-positive rate at the k = 2 draws this
    * operator uses: inverting fp = (1 − e^(−kn/m))^k at fp = 0.01 gives
    * m = 2n / −ln(1 − 0.1) ≈ 18.98·n, so the rule is THE SMALLEST POWER
    * OF TWO ≥ 19·n. Power-of-two m keeps the modulo arithmetic stable,
    * and because 19·n is never itself a power of two (19 is odd), an
    * engine replaying the rule as ⌈log2(19n)⌉ in floating point lands
    * on the same m — the sizing is cross-engine deterministic, so a SQL
    * oracle can derive m from its own corpus count.
    */
  def sizeFor(n: Long): Long = {
    require(n >= 1, s"corpus count must be >= 1; got $n")
    require(n <= (1L << 56), s"corpus count $n too large for 19n sizing")
    val target = 19L * n
    var m = 1L
    while (m < target) m <<= 1
    m
  }

  /** The k = 2 independent probabilities of fp at n keys in m bits —
    * (1 − e^(−2n/m))², the classical Bloom false-positive estimate the
    * spec pins measured rates against. */
  def expectedFp(n: Long, m: Long): Double = {
    val p = 1.0 - math.exp(-2.0 * n / m)
    p * p
  }

  /** The two k=2 bit draws for a key: independent md5-48 hashes of the
    * salted key, reduced mod m. */
  def bitDraws(key: Column, m: Long): (Column, Column) =
    (KmvSketch.hash48(concat(lit("b1:"), key)) % m,
     KmvSketch.hash48(concat(lit("b2:"), key)) % m)

  /** Distinct set bit positions (single `bit` column, ≤ m rows) for the
    * build side's key column. */
  def buildBits(build: DataFrame, keyCol: String, m: Long): DataFrame = {
    require(m >= 2, s"m must be >= 2; got $m")
    val (g1, g2) = bitDraws(col(keyCol), m)
    build.select(explode(array(g1, g2)).as("bit")).distinct()
  }

  /** Probe: append a `bloom_hit` flag to every probe row — true iff BOTH
    * of the key's bits are set. The bits frame broadcasts; the probe side
    * keeps its partitioning.
    */
  def probe(probeDf: DataFrame, keyCol: String, bits: DataFrame,
      m: Long): DataFrame = {
    val (g1, g2) = bitDraws(col(keyCol), m)
    val b1 = broadcast(bits.select(col("bit").as("__b1")))
    val b2 = broadcast(bits.select(col("bit").as("__b2")))
    probeDf.withColumn("__g1", g1).withColumn("__g2", g2)
      .join(b1, col("__g1") === col("__b1"), "left")
      .join(b2, col("__g2") === col("__b2"), "left")
      .withColumn("bloom_hit", col("__b1").isNotNull && col("__b2").isNotNull)
      .drop("__g1", "__g2", "__b1", "__b2")
  }
}
