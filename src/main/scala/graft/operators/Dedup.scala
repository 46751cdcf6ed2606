package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextOps, VectorOps}

/** Deduplication operators for large text/embedding corpora.
  *
  * Every variant is expressed so the candidate-generation step is a
  * key-equality join (shuffle on a small key, never an n² cross join):
  *  - exact:     group by content (or content hash at scale);
  *  - shingle:   inverted index on shingles → pairs sharing a shingle;
  *  - MinHash:   LSH bands → pairs sharing a band bucket;
  *  - SimHash:   16-bit segments → pairs sharing a segment (≤3-bit
  *               Hamming neighbors always share one of four 16-bit
  *               segments — pigeonhole);
  *  - embedding: exact cosine within blocking keys.
  * All hashes are seed-fixed xxhash64 — deterministic across runs,
  * executors and retries (rand()-based signatures are not).
  */
object Dedup {

  /** Exact dedup: one representative (min id) + duplicate count per
    * distinct content value. At 100 TB, group by xxhash64(text) first and
    * only compare full texts within hash buckets; for TESTDATA-sized
    * verification the direct groupBy is the oracle-comparable form.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** Exact word-shingle Jaccard near-dup pairs via an inverted shingle
    * index. `minJaccard` filters after an exact |A∩B| / |A∪B| computation;
    * only pairs sharing ≥1 shingle are ever materialized.
    */
  def shingleJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      shingleLen: Int, minJaccard: Double): DataFrame = {
    val shingles = df.select(col(idCol).as("doc"),
        explode(array_distinct(TextOps.wordShingles(col(textCol), shingleLen))).as("g"))
    val card = shingles.groupBy(col("doc")).agg(count(lit(1)).as("n"))
    val inter = shingles.join(shingles.select(col("doc").as("doc2"), col("g")), Seq("g"))
      .where(col("doc") < col("doc2"))
      .groupBy(col("doc"), col("doc2")).agg(count(lit(1)).as("inter"))
    inter
      .join(card, Seq("doc"))
      .join(card.select(col("doc").as("doc2"), col("n").as("n2")), Seq("doc2"))
      .withColumn("jaccard", col("inter") / (col("n") + col("n2") - col("inter")))
      .where(col("jaccard") >= minJaccard)
      .select(col("doc").as("doc_a"), col("doc2").as("doc_b"),
        round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash + LSH near-dup candidates, verified with exact Jaccard.
    * numHashes = bands × rowsPerBand. Candidate pairs are those agreeing on
    * at least one full band — the standard S-curve trade-off; verification
    * then computes exact Jaccard only on candidates.
    */
  def minHashLshPairs(df: DataFrame, textCol: String, idCol: String,
      shingleLen: Int = 5, bands: Int = 8, rowsPerBand: Int = 2,
      minJaccard: Double = 0.5): DataFrame = {
    val k = bands * rowsPerBand
    val docs = df.select(col(idCol).as("doc"),
      array_distinct(TextOps.wordShingles(col(textCol), shingleLen)).as("shingles"))
    val sigs = docs.select(col("doc"), col("shingles"),
      TextOps.minHashSignature(col("shingles"), k).as("sig"))
    val banded = sigs.select(col("doc"), col("shingles"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand)
              .map(i => element_at(col("sig"), i + 1)): _*).as("bucket"))
        }: _*)).as("bb"))
      .select(col("doc"), col("shingles"), col("bb.band"), col("bb.bucket"))
    val candidates = banded.alias("x")
      .join(banded.alias("y"), Seq("band", "bucket"))
      .where(col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("x.shingles").as("sh_a"),
        col("y.doc").as("doc_b"), col("y.shingles").as("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
    candidates
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .where(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming (≤ 3 with
    * the default 4 × 16-bit segments guarantees no false negatives by
    * pigeonhole). Candidates share a (segment index, segment value) key.
    */
  def simHashPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("doc"),
      TextOps.simHash(TextOps.tokens(col(textCol))).as("sig"))
    val segments = sigs.select(col("doc"), col("sig"),
        explode(array((0 until 4).map { seg =>
          struct(lit(seg).as("seg"),
            shiftrightunsigned(col("sig"), seg * 16).bitwiseAND(lit(0xFFFFL)).as("segval"))
        }: _*)).as("ss"))
      .select(col("doc"), col("sig"), col("ss.seg"), col("ss.segval"))
    segments.alias("x").join(segments.alias("y"), Seq("seg", "segval"))
      .where(col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"),
        TextOps.hamming64(col("x.sig"), col("y.sig")).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .where(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup pairs: exact cosine ≥ minCosine within a blocking
    * key (e.g. a cluster/label id or an LSH bucket) so the pair space is
    * per-block, not global n².
    */
  def embeddingCosinePairs(df: DataFrame, vecCol: String, idCol: String,
      blockCol: String, minCosine: Double): DataFrame = {
    val e = df.select(col(blockCol).as("block"), col(idCol).as("id"), col(vecCol).as("v"))
    e.alias("x")
      .join(e.alias("y"), Seq("block"))
      .where(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        VectorOps.cosine(col("x.v"), col("y.v")).as("cos"))
      .where(col("cos") >= minCosine)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cosine"))
  }
}
