package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Population Stability Index — the standard "did this feature's
  * distribution move" monitor between a baseline snapshot (training
  * time) and a current one (serving time):
  *
  * {{{ PSI = Σ_bins (p_cur − p_base) · ln(p_cur / p_base) }}}
  *
  * over the BASELINE's equal-frequency bins ([[Discretize]] — the
  * baseline owns the binning so a shifted current distribution shows
  * up as unequal bin masses, not as different bins). Conventional
  * read: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.
  *
  * Scale shape: one quantile fit on the baseline + one
  * codegen'd literal-cuts assignment and one k-bins aggregate per
  * side — two scans total, no joins wider than the k-row bin tables.
  * Laplace-smoothed proportions (`+1` per bin) keep empty bins off
  * the ln(0) rail without changing the verdict at any real row count.
  *
  * Exactness: bin counts are exact integers; each bin's PSI term is
  * decimal-fixed (DECIMAL(20,8)) before the k-term sum, so engines
  * agree (the text_lm_score discipline).
  */
object Drift {

  /** Per-bin drift rows: (bin, n_base, n_cur, psi_term) plus the
    * summable term — [[psi]] is their sum.
    */
  def psiByBin(base: DataFrame, current: DataFrame, valueCol: String,
      k: Int = 10): DataFrame = {
    val cuts = Discretize.cutsOf(Discretize.fitQuantileBins(base, valueCol, k))
    def binned(df: DataFrame) =
      Discretize.assignBinsLit(df.select(col(valueCol)), valueCol, cuts)
        .groupBy(col("bin")).agg(count(lit(1)).as("n"))
    val b = binned(base).select(col("bin"), col("n").as("n_base"))
    val c = binned(current).select(col("bin"), col("n").as("n_cur"))
    val joined = b.join(c, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(sum(col("n_base")).as("__tb"),
      sum(col("n_cur")).as("__tc"))
    joined.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_base"), col("n_cur"),
        (((col("n_cur") + 1).cast("double") / (col("__tc") + k)
          - (col("n_base") + 1).cast("double") / (col("__tb") + k))
          * log((col("n_cur") + 1).cast("double") / (col("__tc") + k)
            / ((col("n_base") + 1).cast("double") / (col("__tb") + k))))
          .cast(DecimalType(20, 8)).as("psi_term"))
  }

  /** The scalar PSI (1-row frame). */
  def psi(base: DataFrame, current: DataFrame, valueCol: String,
      k: Int = 10): DataFrame =
    psiByBin(base, current, valueCol, k)
      .agg(round(sum(col("psi_term")).cast("double"), 4).as("psi"))

  /** EXACT two-sample Kolmogorov-Smirnov statistic — the
    * binning-free complement of [[psi]] (PSI needs bin edges and can
    * hide a shift inside one bin; KS is the sup-distance between the
    * two EMPIRICAL CDFs, sensitive to any location/shape change):
    *
    * {{{ KS = max_v |F_a(v) − F_b(v)| = max_v |C_a(v)·n_b − C_b(v)·n_a| / (n_a·n_b) }}}
    *
    * evaluated at distinct-value boundaries (the only places the sup
    * can occur), entirely in int64 — counts per distinct value, TWO
    * passes of [[PrefixSum.withRunningTotal]] for the cumulative
    * counts (no partitionless window), cross-multiplied so no ratio is
    * ever a float. Output is one row: (n_a, n_b, ks_ppm).
    *
    * Scale shape: the per-value count table is distinct-value-sized;
    * the prefix sums are 2 scans + partition-count driver state each.
    * int64 headroom: |C·n|·10⁶ needs n_a·n_b ≤ 9·10¹² — beyond ~3M
    * rows per side, sample or widen to DECIMAL.
    */
  def ksStatistic(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val av = a.select(col(valueCol).as("v")).where(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("k1"))
    val bv = b.select(col(valueCol).as("v")).where(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("k2"))
    val merged = av.join(bv, Seq("v"), "full")
      .select(col("v"), coalesce(col("k1"), lit(0L)).as("k1"),
        coalesce(col("k2"), lit(0L)).as("k2"))
    val cums = PrefixSum.withRunningTotal(
      PrefixSum.withRunningTotal(merged, "k1", "c1", "v"), "k2", "c2", "v")
    val tot = cums.agg(max(col("c1")).as("n_a"), max(col("c2")).as("n_b"))
    cums.crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"),
        abs(col("c1") * col("n_b") - col("c2") * col("n_a")).as("__d"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("__d")).as("__dmax"))
      .select(col("n_a"), col("n_b"),
        expr("(__dmax * 1000000L) div (n_a * n_b)").as("ks_ppm"))
  }

  /** PSI for EVERY listed column in a shared set of passes — the
    * whole-feature-table drift sweep, priced like one column
    * (the winsorizeAll discipline: k columns ≠ k scans):
    * ONE percentile-array aggregate over the baseline fits all cut
    * sets, then each side pays ONE scan whose per-row work is the
    * codegen'd per-column bin chain, exploded to (column, bin) rows
    * for a single count aggregate. Everything after runs on
    * cols×bins-sized tables. Null values are excluded from a
    * column's distribution (they are a missingness signal, not a
    * position in it — track them with DataQuality).
    *
    * @return (feature, psi) — one row per input column
    */
  def psiAll(base: DataFrame, current: DataFrame, cols: Seq[String],
      k: Int = 10, statScale: Int = 6): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val qList = (1 until k).map(i => s"${i.toDouble / k}").mkString(",")
    val fitRow = base.agg(
      transform(expr(s"percentile(${cols.head}, array($qList))"),
        c => round(c, statScale)).as(cols.head),
      cols.tail.map(c =>
        transform(expr(s"percentile($c, array($qList))"),
          cq => round(cq, statScale)).as(c)): _*).head()
    val cuts: Map[String, Seq[Double]] =
      cols.map(c => c -> fitRow.getSeq[Double](fitRow.fieldIndex(c))).toMap
    def binCounts(df: DataFrame, as: String) = df
      .select(explode(array(cols.map { c =>
        val bin = cuts(c).map(cv => when(col(c) > lit(cv), 1).otherwise(0))
          .reduce(_ + _)
        struct(lit(c).as("feature"),
          when(col(c).isNotNull, bin).as("bin"))
      }: _*)).as("cb"))
      .select(col("cb.feature").as("feature"), col("cb.bin").as("bin"))
      .where(col("bin").isNotNull)
      .groupBy(col("feature"), col("bin")).agg(count(lit(1)).as(as))
    val joined = binCounts(base, "n_base")
      .join(binCounts(current, "n_cur"), Seq("feature", "bin"), "full_outer")
      .select(col("feature"), col("bin"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.groupBy(col("feature"))
      .agg(sum(col("n_base")).as("__tb"), sum(col("n_cur")).as("__tc"))
    val pB = (col("n_base") + 1).cast("double") / (col("__tb") + k)
    val pC = (col("n_cur") + 1).cast("double") / (col("__tc") + k)
    joined.join(broadcast(totals), Seq("feature"))
      .select(col("feature"),
        ((pC - pB) * log(pC / pB)).cast(DecimalType(20, 8)).as("__t"))
      .groupBy(col("feature"))
      .agg(round(sum(col("__t")).cast("double"), 4).as("psi"))
  }
}
