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
}
