package graft

import org.apache.spark.sql.execution.window.WindowExec

/** Plan-shape regressions: the round-1 verdict's scale-killer was a
  * partitionless `Window.orderBy` (whole dataset sorted on ONE partition)
  * in the id-assignment queries. These tests pin the fixed plans.
  */
class PlanSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  // queries that previously planned a partitionless WindowExec
  private val fixed =
    Seq("g1_vocab_entities", "r2_seq_split", "r5_relabel", "r4_negsample")

  fixed.foreach { name =>
    test(s"$name plans without a partitionless Window") {
      val df = SparkEntry.queries(name)(spark, dir)
      val bad = df.queryExecution.sparkPlan.collectWithSubqueries {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"partitionless WindowExec in $name:\n${df.queryExecution.sparkPlan}")
    }
  }

  test("r2_seq_split plans as TakeOrdered (per-partition top-k), not a global sort") {
    val df = SparkEntry.queries("r2_seq_split")(spark, dir)
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("DenseId ids equal row_number-1 over the sort order") {
    import spark.implicits._
    val df = Seq("d", "b", "a", "c", "e").toDF("k")
    val got = graft.operators.DenseId.withOrderedId(df, "id", "k")
      .orderBy("id").as[(String, Long)].collect().toSeq
    assert(got == Seq("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L, "e" -> 4L))
  }
}
