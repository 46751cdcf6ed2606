package graft.car

import org.apache.spark.sql.DataFrame

/** P5 — sentinel null repair (reference utils.py:92-131), replicated
  * AS-CODED, not as-commented (quirk X6, SURVEY.md §2.13):
  *  - gearbox is filled with 0 although the comment says −1
  *    (reference utils.py:108-109);
  *  - the "anonymousFeature10" comment actually re-fills `country`
  *    (reference utils.py:120-121) — so country is (redundantly) covered
  *    and anonymousFeature10 is filled under the next comment
  *    (reference utils.py:123);
  *  - anonymousFeature13 gets "200001" although the comment says 190001
  *    (reference utils.py:124-125);
  *  - anonymousFeature15 gets "2000-01-01" although the comment says 1900
  *    (reference utils.py:126-127);
  *  - anonymousFeature2/3/5/6/14 are never filled (FIXTURES.md §1).
  */
object Repair {

  val longFills: Map[String, Long] = Map(
    "carCode" -> -1L, "country" -> -1L, "maketype" -> -1L,
    "modelyear" -> -1L, "anonymousFeature1" -> -1L,
    "anonymousFeature4" -> -1L, "anonymousFeature8" -> -1L,
    "anonymousFeature9" -> -1L, "anonymousFeature10" -> -1L)

  val doubleFills: Map[String, Double] = Map(
    "gearbox" -> 0.0) // as-coded: 0, not the commented −1 (X6)

  val stringFills: Map[String, String] = Map(
    "anonymousFeature7" -> "2000-01-01",
    "anonymousFeature11" -> "-1",
    "anonymousFeature12" -> "0*0*0",
    "anonymousFeature13" -> "200001",
    "anonymousFeature15" -> "2000-01-01")

  /** Apply every fill whose column exists in the frame. */
  def repair(df: DataFrame): DataFrame = {
    val cols = df.columns.toSet
    df.na.fill(longFills.filter(kv => cols(kv._1)))
      .na.fill(doubleFills.filter(kv => cols(kv._1)))
      .na.fill(stringFills.filter(kv => cols(kv._1)))
  }
}
