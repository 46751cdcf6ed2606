package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RAKE keyword extraction (Rose et al. 2010) — corpus keyphrases
  * without a model: candidate phrases are the maximal stopword-free
  * token runs, each word scores deg/freq (degree counts the total
  * length of every phrase the word appears in — long-phrase words
  * borrow salience from their neighbors), and a phrase scores the sum
  * of its words' scores. The cheap, surprisingly strong baseline for
  * "what is this corpus about" at any scale.
  *
  * Determinism contract: degree and frequency are exact integer
  * aggregates; each word's score is ONE integral division at ppm scale
  * and a phrase sums those longs — hash-exact (the per-term-div
  * discipline). Phrase segmentation is gaps-and-islands: one
  * doc-partitioned window numbers the runs between stopword/empty
  * positions (the sessionize shape, never partitionless).
  *
  * Scale shape: one tokenize+posexplode scan, one window, then
  * everything is phrases- and vocab-sized aggregates with a vocab-keyed
  * score join. Stopword list is a literal IN — caller-tuned, corpus
  * engines broadcast theirs the same way.
  *
  * @return (phrase, n_occurrences, n_words, score_ppm) — all phrases;
  *         callers order/limit
  */
object Rake {

  def keywordScores(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String]): DataFrame = {
    require(stopwords.nonEmpty, "need a stopword list (phrase boundaries)")
    val toks = docs
      .select(col(idCol).as("__doc"),
        posexplode(split(col(textCol), " ")).as(Seq("__pos", "__w")))
      .withColumn("__stop",
        (col("__w").isin(stopwords: _*) || col("__w") === "").cast("long"))
    val w = Window.partitionBy(col("__doc")).orderBy(col("__pos"))
    val runs = toks
      .withColumn("__run", sum(col("__stop")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .where(col("__stop") === 0)
    val phrases = runs.groupBy(col("__doc"), col("__run"))
      .agg(array_sort(collect_list(struct(col("__pos"), col("__w"))))
        .as("__ws"))
      .select(expr("transform(__ws, s -> s.__w)").as("__words"))
      .withColumn("phrase", concat_ws(" ", col("__words")))
    // word stats over every phrase occurrence: deg += phrase length,
    // freq += 1 per occurrence
    val wordStats = phrases
      .select(explode(col("__words")).as("__w"),
        size(col("__words")).cast("long").as("__len"))
      .groupBy(col("__w"))
      .agg(sum(col("__len")).as("__deg"), count(lit(1)).as("__freq"))
      .withColumn("__score", expr("(1000000 * __deg) div __freq"))
    val occ = phrases.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"),
        first(col("__words")).as("__words"))
    occ.select(col("phrase"), col("n_occurrences"),
        explode(col("__words")).as("__w"))
      .join(wordStats.select(col("__w"), col("__score")), Seq("__w"))
      .groupBy(col("phrase"), col("n_occurrences"))
      .agg(count(lit(1)).as("n_words"), sum(col("__score")).as("score_ppm"))
  }
}
