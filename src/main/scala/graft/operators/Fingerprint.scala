package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-invariant dataset fingerprints — "is this copy the same
  * dataset" answered with one aggregate instead of a sorted diff. The
  * reproducibility primitive a 100 TB pipeline needs at every
  * hand-off: after a migration, a recompaction, or a re-run, the
  * fingerprints match iff the row multisets match (up to the 64-bit
  * collision bound), regardless of partitioning, file layout, or row
  * order — because the combiner is ADDITION of per-row hashes, which
  * is commutative/associative (the same reason the md5-gate splits
  * are retry-safe).
  *
  * Per-row hash = the leading 60 bits of md5 over the '|'-joined
  * column values with an explicit null marker — not xxhash64, so a
  * non-Spark engine (the DuckDB gate, a Python auditor) reproduces
  * the exact integer; the sum accumulates as exact DECIMAL(38,0)
  * (room for 10^12+ rows of 2^60 values). Columns should be
  * string-stable types (ints, strings, dates) — float→string
  * rendering differs across engines, so fingerprint keys, codes and
  * fixed-point integers, not raw doubles.
  */
object Fingerprint {

  /** Per-row 60-bit md5 hash of the given columns. */
  def rowHash(cols: Seq[Column]): Column = {
    require(cols.nonEmpty, "need at least one column")
    val joined = concat_ws("|",
      cols.map(c => coalesce(c.cast("string"), lit("\u0000null"))): _*)
    conv(substring(md5(joined), 1, 15), 16, 10).cast("long")
  }

  /** One-row (n_rows, fingerprint) for the multiset of the selected
    * columns. The `cast(DecimalType(38,0))` BEFORE `sum` is
    * load-bearing: it makes the whole accumulation decimal, exact for
    * any realistic row count (2^60-bounded hashes would wrap an int64
    * accumulator after ~16 rows of worst-case magnitude under non-ANSI
    * sum(long)). FingerprintSpec pins the >10⁴-row sum against a
    * BigInt reference so a "simplification" to sum(long) fails loudly.
    * Map-side combined, the driver sees one row.
    */
  def of(df: DataFrame, colNames: Seq[String]): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
      sum(rowHash(colNames.map(col))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
        .as("fingerprint"))
}
