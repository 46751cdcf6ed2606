package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** T5-style span-corruption pairs (Raffel et al., JMLR'20 §3.1.4): mask
  * random token spans, emit (input with one sentinel per span, target =
  * sentinels + the dropped tokens) — the denoising-objective data-prep
  * step of a pretraining pipeline, built relationally.
  *
  * The randomness is the shared md5-48 draw on (doc_id:pos), so the mask
  * is a pure function of the row — reproducible across runs, partitions,
  * AND engines (the DuckDB oracle replays every pair bit-exactly). Spans
  * arise as runs of independently-masked tokens (gaps-and-islands over
  * the Bernoulli mask) rather than a sequential draw of span lengths:
  * same objective shape, but order-free and therefore distributable.
  *
  * Scale shape: one shuffle (by doc_id, for the position windows and the
  * ordered re-assembly); everything else is column math. The aggregation
  * buffer per doc is bounded by the document's own token count.
  *
  * Reference scope: none — the reference has no generative text
  * objective. Span corruption is part of the training-data-pipeline
  * extension surface (text-objective family) this engine adds.
  */
object SpanCorrupt {

  /** Fill-in-the-middle transform (Bavarian et al., 2022: "Efficient
    * Training of Language Models to Fill in the Middle"): split each
    * selected document at two deterministic points and emit the
    * PSM-reordered text `<fim_prefix> P <fim_suffix> S <fim_middle> M`,
    * so an autoregressive model learns infilling for free. The FIM gate
    * and both cut points are md5-derived uniforms on the doc id — pure
    * row functions, reproducible across runs, partitions, and engines.
    * Zero shuffle: token arrays never explode; cuts are array slices.
    *
    * @return (doc_id, fim, n_tokens, cut_a, cut_b, out_text) — `fim`
    *         false rows pass the original text through (the 1−rate
    *         complement every FIM recipe keeps for plain AR loss).
    */
  def fimTransform(df: DataFrame, textCol: String, idCol: String,
      ratePermille: Int = 500): DataFrame = {
    require(ratePermille >= 0 && ratePermille <= 1000,
      s"ratePermille must be in [0,1000]; got $ratePermille")
    def draw(salt: String): org.apache.spark.sql.Column =
      conv(substring(md5(concat(col(idCol).cast("string"), lit(salt))),
        1, 8), 16, 10).cast("long")
    df
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"),
        split(col(textCol), " ").as("__t"))
      .withColumn("n_tokens", size(col("__t")).cast("long"))
      .withColumn("fim", draw(":fim") % 1000 < ratePermille)
      .withColumn("cut_a", least(draw(":a") % (col("n_tokens") + 1),
        draw(":b") % (col("n_tokens") + 1)))
      .withColumn("cut_b", greatest(draw(":a") % (col("n_tokens") + 1),
        draw(":b") % (col("n_tokens") + 1)))
      .select(col("doc_id"), col("fim"), col("n_tokens"),
        when(col("fim"), col("cut_a")).otherwise(lit(null)).as("cut_a"),
        when(col("fim"), col("cut_b")).otherwise(lit(null)).as("cut_b"),
        when(col("fim"), concat(
          lit("<fim_prefix> "),
          concat_ws(" ", expr("slice(__t, 1, CAST(cut_a AS INT))")),
          lit(" <fim_suffix> "),
          concat_ws(" ",
            expr("slice(__t, CAST(cut_b + 1 AS INT), CAST(n_tokens - cut_b AS INT))")),
          lit(" <fim_middle> "),
          concat_ws(" ",
            expr("slice(__t, CAST(cut_a + 1 AS INT), CAST(cut_b - cut_a AS INT))"))))
          .otherwise(col("__text")).as("out_text"))
  }

  /** (doc_id, input_text, target_text, n_noise, n_spans): one row per
    * document. Token at 1-based position p is noise iff
    * hash48(doc_id:p) mod 100 < noisePct. Span k is replaced by
    * `<extra_id_k>` in the input; the target lists `<extra_id_k>`
    * followed by the span's tokens, in order.
    */
  def pairs(df: DataFrame, textCol: String, idCol: String,
      noisePct: Int = 15): DataFrame = {
    require(noisePct >= 1 && noisePct <= 99,
      s"noisePct must be in [1,99]; got $noisePct")
    val tok = df
      .select(col(idCol).as("doc_id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("p0", "tokn")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("tokn"))
      .withColumn("noise",
        KmvSketch.hash48(concat(col("doc_id").cast("string"), lit(":"),
          col("pos").cast("string"))) % 100 < noisePct)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val marked = tok
      .withColumn("is_start",
        col("noise") && !lag(col("noise"), 1, false).over(w))
      .withColumn("k",
        sum(when(col("is_start"), 1L).otherwise(0L)).over(w))
    val sentinel = concat(lit("<extra_id_"), col("k").cast("string"), lit(">"))
    val inPiece = when(!col("noise"), col("tokn"))
      .when(col("is_start"), sentinel)
    val tgtPiece = when(col("is_start"), concat(sentinel, lit(" "), col("tokn")))
      .when(col("noise"), col("tokn"))
    def ordered(piece: org.apache.spark.sql.Column) =
      array_join(transform(
        array_sort(collect_list(when(piece.isNotNull,
          struct(col("pos"), piece.as("piece"))))),
        x => x.getField("piece")), " ")
    marked.groupBy(col("doc_id")).agg(
      ordered(inPiece).as("input_text"),
      ordered(tgtPiece).as("target_text"),
      sum(when(col("noise"), 1L).otherwise(0L)).as("n_noise"),
      sum(when(col("is_start"), 1L).otherwise(0L)).as("n_spans"))
  }
}
