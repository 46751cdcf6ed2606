package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-phrase dictionary tagging — the blocklist / topic-taxonomy
  * screen every curation pipeline runs before training: given a
  * category → phrase dictionary (phrases of one or two tokens), count
  * every phrase occurrence per document in ONE corpus scan.
  *
  * The Aho-Corasick shape without the automaton: instead of scanning
  * the text once per pattern (regex alternation degrades to exactly
  * that, and can't attribute hits to categories), the document's token
  * stream and its adjacent-token bigram stream are generated as array
  * expressions — zero shuffle, inside codegen — and matched against the
  * broadcast dictionary with a single equi-join. The only exchange in
  * the whole plan is the final (doc, category) rollup. At 100 TB the
  * dictionary is KBs by construction (it's curated by humans) while the
  * corpus side never replicates or re-scans; overlapping phrases count
  * independently (a bigram hit does not suppress its unigram members),
  * which is the usual screen semantics — each list entry is its own
  * evidence.
  */
object DictTag {

  /** (idCol, category, n_hits) — occurrences of each dictionary phrase
    * per document, rolled up to the phrase's category. Documents with
    * no hits emit no rows (screen verdicts join this back as an
    * existence test). `dict` entries are (category, phrase); phrases
    * are 1 or 2 space-separated tokens.
    */
  def tag(docs: DataFrame, textCol: String, idCol: String,
      dict: Seq[(String, String)]): DataFrame = {
    require(dict.nonEmpty, "empty dictionary")
    require(dict.forall(_._2.split(" ", -1).length <= 2),
      "phrases must be 1 or 2 tokens")
    val spark = docs.sparkSession
    import spark.implicits._
    val dictDf = dict.toDF("category", "phrase")
    val toks = docs.select(col(idCol), split(col(textCol), " ").as("__t"))
    // unigram stream ∪ adjacent-bigram stream, built from the token
    // array in place (no per-doc window, no shuffle before the join)
    // slice+zip_with, not sequence(1, n-1): Spark's sequence DESCENDS
    // when the stop is below the start, so a 1-token doc would index
    // element 0 — slices of length 0 are just empty
    val grams = toks.select(col(idCol), explode(concat(col("__t"),
      expr("zip_with(slice(__t, 1, size(__t) - 1), " +
        "slice(__t, 2, size(__t) - 1), (a, b) -> concat(a, ' ', b))")
    )).as("gram"))
    grams.join(broadcast(dictDf), col("gram") === col("phrase"))
      .groupBy(col(idCol), col("category"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Per-document screen verdict against `blockCategories`: total hits
    * in blocked categories and the boolean gate. Docs without any
    * dictionary hit pass with 0 — the left join keeps them.
    */
  def screen(docs: DataFrame, textCol: String, idCol: String,
      dict: Seq[(String, String)], blockCategories: Set[String],
      maxHits: Long = 0L): DataFrame = {
    val blocked = tag(docs, textCol, idCol, dict)
      .where(col("category").isin(blockCategories.toSeq: _*))
      .groupBy(col(idCol)).agg(sum(col("n_hits")).as("blocked_hits"))
    docs.select(col(idCol)).join(blocked, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("blocked_hits"), lit(0L)).as("blocked_hits"),
        (coalesce(col("blocked_hits"), lit(0L)) <= maxHits).as("keep"))
  }
}
