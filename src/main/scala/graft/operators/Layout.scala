package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: the write-side clustering that decides how much
  * a 100 TB table can be PRUNED at read time. A table sorted by a
  * single column clusters one predicate dimension; interleaving the bits
  * of two dimensions (Morton / Z-order, the technique behind
  * Delta/Iceberg `ZORDER BY`) keeps range predicates on EITHER column
  * selective: rows close in the key are close in both dimensions, so
  * min/max file statistics prune files for 2-d slices instead of only
  * the leading sort column.
  *
  * The key is pure bit arithmetic (shifts, masks, or) — whole-stage
  * codegen on Spark, and plain SQL on any engine, so the layout is
  * auditable and reproducible off-cluster. Writing the layout is
  * `repartitionByRange(zKey)` + `sortWithinPartitions(zKey)` — a range
  * sort, never a single-partition window.
  */
object Layout {

  /** Interleave the low `bits` bits of two non-negative integer columns:
    * result bit 2i holds a's bit i, bit 2i+1 holds b's bit i. Values are
    * SATURATED at 2^bits − 1 (callers quantize real columns into buckets
    * first — layout keys need rank, not exactness): an out-of-range row
    * lands at the high end of the layout, adjacent to its nearest
    * in-range neighbors, instead of wrapping modulo 2^bits to the
    * opposite end and poisoning that file's min/max stats.
    */
  def zOrderKey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val mask = (1L << bits) - 1
    val am = least(a.cast("long"), lit(mask))
    val bm = least(b.cast("long"), lit(mask))
    (0 until bits)
      .map { i =>
        shiftleft(shiftrightunsigned(am, i).bitwiseAND(lit(1L)), 2 * i)
          .bitwiseOR(
            shiftleft(shiftrightunsigned(bm, i).bitwiseAND(lit(1L)), 2 * i + 1))
      }
      .reduce(_.bitwiseOR(_))
  }

  /** Hilbert-curve key of two quantized columns — stronger locality
    * than [[zOrderKey]] at the same cost model: consecutive key values
    * are ALWAYS grid-adjacent (unit Manhattan step —
    * [[graft.functions.expressions.HilbertKey]] pins it), where the
    * Morton interleave jumps across the plane at every power-of-two
    * boundary, so 2-d range slices touch fewer files at the same file
    * size. Same contract as zOrderKey: quantize first, values clamp to
    * [0, 2^bits − 1]; write with `repartitionByRange(key)` +
    * `sortWithinPartitions(key)`. One codegen'd loop per row.
    */
  def hilbertKey(a: Column, b: Column, bits: Int = 16): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.functions.expressions.HilbertKey(
      ColumnShim.expression(a.cast("long")),
      ColumnShim.expression(b.cast("long")), bits))
  }

  /** Persist `df` hash-bucketed (and optionally sorted) on the join/agg
    * key — the write-side answer to "this join shuffles 100 TB every
    * night". Two tables bucketed by the same key into the same bucket
    * count join with ZERO exchanges: each task reads bucket i of both
    * sides, because the on-disk layout IS the shuffle output, paid once
    * at write time instead of per query. Same for `groupBy(bucketCol)` —
    * the scan already satisfies the required hash distribution. With
    * `sortCols` the files are also sorted inside each bucket, so a
    * single-file-per-bucket sort-merge join skips its sort too.
    *
    * Spark's bucketing rides the session catalog (`saveAsTable`); read
    * the result back with `spark.table(table)`. Bucket counts should be
    * sized like shuffle partitions: data size / bucket ≈ a comfortable
    * task (128-512 MB) — at 100 TB that is thousands of buckets, and the
    * bucket count must MATCH across tables meant to co-join (or be an
    * integer multiple once coalesced bucket joins are enabled).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(nBuckets >= 1, "nBuckets must be positive")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Compact a small-file parquet directory into ~`targetBytes` output
    * files — the maintenance pass every incremental pipeline needs:
    * streaming sinks and per-batch appends write one file per task per
    * trigger, and a 100 TB table fragmented into millions of KB-files
    * pays NameNode/listing/open overhead that dwarfs the scan itself.
    *
    * The output file count is sized from the directory's ACTUAL bytes
    * (file-index metadata — no data read), and rows are redistributed
    * with a round-robin `repartition(n)`, which splits as well as
    * coalesces: `coalesce(n)` alone cannot split a skewed source file
    * and chains the reader onto few tasks. Writes to a fresh directory
    * and never deletes the source — swap is the caller's (atomic-
    * rename / metastore) concern.
    *
    * @return the number of output files written
    */
  def compact(spark: org.apache.spark.sql.SparkSession, srcDir: String,
      destDir: String, targetBytes: Long = 128L << 20): Int = {
    require(targetBytes >= (1L << 20), s"targetBytes unreasonably small: $targetBytes")
    val df = spark.read.parquet(srcDir)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = math.max(1L,
      (bytes + BigInt(targetBytes) - 1) / BigInt(targetBytes) match {
        case b if b > Int.MaxValue => Int.MaxValue.toLong
        case b => b.toLong
      }).toInt
    df.repartition(n).write.mode("errorifexists").parquet(destDir)
    n
  }
}
