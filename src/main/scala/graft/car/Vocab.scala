package graft.car

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A1/G1/J4 — dictionary (vocabulary) construction and application
  * (reference utils.py:69-90, data.py:131-182).
  *
  * The reference's `Dictionary` is a driver-side hash map "col:value" ↔
  * dense int id shared across columns. Here the vocabulary is itself a
  * DataFrame `(col_name, value, id)` BUILT in one distributed pass
  * (unpivot → distinct) — construction scales to any number of columns
  * × distinct values — and APPLIED as a codegen'd hash-table probe
  * ([[encode]]), the side-input pattern the reference's dict probe is:
  * the table rides the task-binary broadcast, each cell costs one O(1)
  * lookup, no joins enter the plan.
  */
object Vocab {

  /** Build one global vocabulary over `columns` of all `datasets`
    * (reference: set(train[col]) ∪ set(dev[col]) per column,
    * utils.py:69-90). Ids are dense, deterministic (ordered by
    * (col_name, value)), 0-based.
    */
  def build(datasets: Seq[DataFrame], columns: Seq[String]): DataFrame = {
    require(datasets.nonEmpty && columns.nonEmpty)
    val unpivoted = datasets.map { df =>
      val pairs = columns.filter(df.columns.contains).map { c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("value"))
      }
      df.select(explode(array(pairs: _*)).as("p"))
        .select(col("p.col_name"), col("p.value"))
    }.reduce(_ union _)
    val distinctVals = unpivoted.where(col("value").isNotNull).distinct()
    // Dense 0-based ids via range sort + zipWithIndex (DenseId): same ids
    // as row_number()-1, but no single-partition WindowExec — works
    // unchanged when the vocabulary outgrows one partition.
    graft.operators.DenseId.withOrderedId(distinctVals, "id", "col_name", "value")
  }

  /** S4 — persist the vocabulary as the reference's Dictionary JSON
    * (data.py:160-174: `{"ind2token": [...], "token2ind": {...}}`, token
    * = "col:value", id = position). Driver-side by design: the artifact
    * is a small side input (the reference holds it fully in memory too);
    * the DISTRIBUTED form of the vocabulary is the DataFrame itself.
    */
  def saveJson(vocab: DataFrame, path: String): Unit = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val rows = vocab.select(col("col_name"), col("value"), col("id"))
      .collect().sortBy(_.getLong(2))
    val tokens = rows.map(r => s"${r.getString(0)}:${r.getString(1)}")
    val json = ("ind2token" -> tokens.toList) ~
      ("token2ind" -> tokens.zipWithIndex.map { case (t, i) => t -> i }.toList.toMap)
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      JsonMethods.compact(JsonMethods.render(json))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Load a [[saveJson]] artifact back into the (col_name, value, id)
    * frame. Tokens split on the FIRST ':' — values may contain colons.
    */
  def loadJson(spark: SparkSession, path: String): DataFrame = {
    import org.json4s.jackson.JsonMethods
    import org.json4s.DefaultFormats
    implicit val fmts: DefaultFormats.type = DefaultFormats
    val txt = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8)
    val tokens = (JsonMethods.parse(txt) \ "ind2token").extract[List[String]]
    import spark.implicits._
    tokens.zipWithIndex.map { case (t, i) =>
      val cut = t.indexOf(':')
      (t.substring(0, cut), t.substring(cut + 1), i.toLong)
    }.toDF("col_name", "value", "id")
  }

  /** Encode `columns` of `df` to their vocabulary ids, producing
    * `<col>Id` columns (reference data.py:21-23's per-cell dict probe).
    *
    * One driver-side collect of the (side-input-sized, see [[saveJson]])
    * vocabulary feeds a shared hash table applied as a codegen'd
    * [[graft.functions.expressions.DictLookup]] probe per column — a
    * pure map-side projection: zero joins, zero shuffles, O(1) per cell,
    * and a plan whose size no longer grows a broadcast join per encoded
    * column (the previous shape folded one join per column — 22 for the
    * car schema — re-probing the same vocab relation each time).
    * Missing values encode as null, the left-join convention.
    */
  def encode(df: DataFrame, vocab: DataFrame, columns: Seq[String]): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnShim
    import org.apache.spark.unsafe.types.UTF8String
    val dict = new java.util.HashMap[UTF8String, java.lang.Long]()
    vocab.select(col("col_name"), col("value"), col("id")).collect().foreach { r =>
      dict.put(UTF8String.fromString(r.getString(0) + ":" + r.getString(1)),
        r.getLong(2))
    }
    // key = "col:value", the saveJson token convention; a null cell makes
    // concat null and DictLookup passes the null through
    val idCols = columns.map { c =>
      ColumnShim.column(graft.functions.expressions.DictLookup(
        ColumnShim.expression(concat(lit(c + ":"), col(c).cast("string"))),
        dict)).as(s"${c}Id")
    }
    df.select(df.columns.map(col).toSeq ++ idCols: _*)
  }
}
