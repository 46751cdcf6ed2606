package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise frequent-itemset mining (the support-counting core of
  * association-rule learning): which item pairs co-occur in at least
  * `minSupport` baskets, with the marginal counts a caller needs for
  * confidence/lift — kept as EXACT integers; ratios are one column
  * expression away and deliberately not baked in (floats would cost
  * cross-engine determinism for no information).
  *
  * Scale shape: the pair blow-up is per-basket k² via a self-equi-join
  * on the basket key — distributed, never a driver loop — and bounded
  * by `maxBasketSize`: a degenerate hot basket (one customer buying
  * the whole catalog) would otherwise contribute k² rows alone; the
  * cap drops those baskets outright (the same hot-key discipline as
  * `Dedup.shingleJaccardPairs`' document-frequency cap), and marginals
  * are computed on the SAME capped basket set so every ratio derived
  * downstream stays internally consistent.
  */
object Association {

  /** @return (item_a, item_b, n_ab, n_a, n_b) for pairs with
    *         `n_ab >= minSupport`, `item_a < item_b`
    */
  def pairSupports(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, maxBasketSize: Long = 1000L): DataFrame = {
    require(minSupport >= 1, s"need minSupport >= 1; got $minSupport")
    val d = df.select(col(basketCol).as("__b"), col(itemCol).as("__i")).distinct()
    val sizes = d.groupBy(col("__b")).agg(count(lit(1)).as("__sz"))
    val capped = d.join(sizes.where(col("__sz") <= maxBasketSize)
      .select(col("__b")), Seq("__b"))
    val itemCounts = capped.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
    val pairs = capped.join(capped.select(col("__b"), col("__i").as("__j")), Seq("__b"))
      .where(col("__i") < col("__j"))
      .groupBy(col("__i"), col("__j")).agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    pairs
      .join(itemCounts.select(col("__i"), col("__n").as("n_a")), Seq("__i"))
      .join(itemCounts.select(col("__i").as("__j"), col("__n").as("n_b")), Seq("__j"))
      .select(col("__i").as("item_a"), col("__j").as("item_b"),
        col("n_ab"), col("n_a"), col("n_b"))
  }
}
