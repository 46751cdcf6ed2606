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
