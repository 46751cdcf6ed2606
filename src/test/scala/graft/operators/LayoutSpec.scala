package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  private def z(a: Long, b: Long, bits: Int = 8): Long = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(Layout.zOrderKey(col("a"), col("b"), bits)).head().getLong(0)
  }

  test("zOrderKey interleaves bits (a even positions, b odd)") {
    assert(z(0, 0) == 0)
    assert(z(1, 0) == 1) // a bit 0 → result bit 0
    assert(z(0, 1) == 2) // b bit 0 → result bit 1
    assert(z(5, 3) == 27) // 101 ⨯ 011 → 011011
    assert(z(255, 0, bits = 8) == 0x5555L)
    assert(z(0, 255, bits = 8) == 0xAAAAL)
  }

  test("zOrderKey saturates out-of-range values at 2^bits - 1 (no modulo wrap)") {
    // 256 with bits=8 must land at the TOP of the layout next to 255 —
    // a wrap to key 0 would scatter the row to the opposite end and
    // poison that file's min/max stats
    assert(z(256, 0, bits = 8) == z(255, 0, bits = 8))
    assert(z(1000, 99999, bits = 8) == 0xFFFFL)
    // saturation preserves rank against in-range neighbors
    assert(z(256, 0, bits = 8) > z(254, 0, bits = 8))
  }

  test("zOrderKey clusters quadrants: every 2^k-aligned block is a contiguous key range") {
    import spark.implicits._
    val pts = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val keyed = pts.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zOrderKey(col("a"), col("b"), 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // all 256 keys distinct (the interleave is a bijection on the grid)
    assert(keyed.values.toSet.size == 256)
    // 8x8-aligned quadrants occupy contiguous 64-key ranges: a 2-d range
    // predicate on either dimension prunes by key min/max — the layout's
    // point at 100 TB
    for (qa <- 0 to 1; qb <- 0 to 1) {
      val quad = keyed.collect {
        case ((a, b), zk) if a / 8 == qa && b / 8 == qb => zk
      }
      assert(quad.max - quad.min == 63, (qa, qb))
    }
  }

  test("bucketed tables join and aggregate with ZERO exchanges, same results") {
    import spark.implicits._
    val left = spark.range(0, 4000)
      .select((col("id") % 500).as("k"), col("id").as("lv"))
    val right = spark.range(0, 2000)
      .select((col("id") % 500).as("k"), (col("id") * 7).as("rv"))
    Layout.writeBucketed(left, "bkt_left", "k", 8, sortCols = Seq("k"))
    Layout.writeBucketed(right, "bkt_right", "k", 8, sortCols = Seq("k"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a real shuffle join so the pin proves BUCKETS removed the
      // exchange, not a broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), Seq("k"))
      val joinPlan = joined.queryExecution.executedPlan.toString
      assert(!joinPlan.contains("Exchange"), joinPlan)
      val agged = spark.table("bkt_left").groupBy(col("k")).agg(sum(col("lv")).as("s"))
      val aggPlan = agged.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), aggPlan)
      // layout changes plans, never results
      val expected = left.join(right, Seq("k"))
        .select(col("k"), col("lv"), col("rv"))
        .collect().map(_.toSeq).toSet
      assert(joined.select(col("k"), col("lv"), col("rv"))
        .collect().map(_.toSeq).toSet == expected)
      assert(agged.count() == 500)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }

  test("compact: many tiny files collapse to few, data multiset preserved") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_compact_src").toString
    val dest = src + "_out"
    // 64 tiny files (one per partition)
    (0L until 2000L).map(i => (i, s"payload $i")).toDF("id", "s")
      .repartition(64).write.mode("overwrite").parquet(src)
    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(src) == 64)
    val n = Layout.compact(spark, src, dest, targetBytes = 1L << 20)
    // a few KB of data at a 1 MB target → far fewer files than the source
    assert(parquetFiles(dest) == n && n < 64, s"wrote $n files")
    val a = spark.read.parquet(src).collect().map(_.toString).sorted.toSeq
    val b = spark.read.parquet(dest).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("layout_audit: hilbert clustering never touches more files than morton") {
    // the claim the audit query exists to measure, pinned as an
    // inequality over the real gate data: summed across the six 2-d
    // range queries, hilbert's file count ≤ morton's (and each query's
    // own count is ≤ the layout's total file count)
    val out = graft.queries.RelationalQueries
      .queries("layout_audit")(spark, sf("sf0.001")).collect()
    val byLayout = out.groupBy(_.getString(0))
      .map { case (k, v) => k -> v.map(_.getLong(2)).sum }
    assert(byLayout("hilbert") <= byLayout("morton"), byLayout)
    assert(byLayout.values.forall(_ > 0), byLayout)
  }
}
