package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the batch-27/28/29 operators (q48/q49, g32/g33,
  * t23/t24, e25, m15/m16, d22, s37, v11): the shapes their 100 TB
  * stories depend on. */
class Round7PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q48: triple generation joins on the ORDER key only — no part-keyed blowup") {
    val plan = planOf(SparkEntry.queries("q48_itemset3")(spark, dir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "per-order self-joins must stay equi")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-100 must not materialize a global sort")
  }

  test("q49: the lag window orders only the month summary, after partial aggregation") {
    val plan = planOf(SparkEntry.queries("q49_mom_growth")(spark, dir))
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      "month rollup must map-side combine before the window")
    // the single-partition window is over the |months|-row summary — the
    // aggregate must sit BELOW the window in the plan
    val aggIdx = plan.indexOf("HashAggregate")
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0 && aggIdx >= 0 && winIdx < plan.lastIndexOf("HashAggregate"),
      "window must consume the aggregated summary, not raw orders")
  }

  test("e25: WAU is equi-join + explode — no nested-loop range join") {
    val plan = planOf(SparkEntry.queries("e25_dau_wau")(spark, dir))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "the 7-day cover must explode, not range-join")
    assert(plan.contains("Generate explode") || plan.contains("Generate"),
      "the sequence explode must be present")
  }

  test("t23/t24/m15: one pass — partial aggregation, no join back to the corpus") {
    for (q <- Seq("t23_boilerplate", "m15_magic_sniff")) {
      val plan = planOf(SparkEntry.queries(q)(spark, dir))
      assert("HashAggregate".r.findAllIn(plan).length >= 2,
        s"$q must map-side combine")
      assert(!plan.contains("SortMergeJoin"), s"$q needs no corpus join")
    }
  }

  test("g32: modularity broadcasts the one-row S frame, never shuffles it") {
    val plan = planOf(SparkEntry.queries("g32_modularity")(spark, dir))
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin")
      || plan.contains("BroadcastNestedLoopJoin"),
      "the scalar S frame must ride a broadcast")
  }

  test("d22: the weight join keys on doc ids — no corpus-wide shuffle of text") {
    val plan = planOf(SparkEntry.queries("d22_rep_weights")(spark, dir))
    assert(!plan.toLowerCase.contains("text#"),
      "document text must be pruned before the weight joins")
  }

  test("s37: descent rescoring keeps the bounded top-k aggregate shape") {
    val plan = planOf(SparkEntry.queries("s37_nn_descent")(spark, dir))
    assert(plan.contains("graft_top_neighbors5") || plan.contains("TopNeighbors"),
      "bounded mergeable top-k aggregate expected")
    assert(!plan.contains("row_number"), "no per-query window sort")
  }

  test("v11: the threshold frame broadcasts; the packing scan stays codegen'd") {
    val plan = planOf(SparkEntry.queries("v11_ternary_quantize")(spark, dir))
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoopJoin"),
      "the 64-cell threshold frame must broadcast")
    assert(plan.contains("*("), "mask packing must stay in whole-stage codegen")
  }

  test("m16: the clip census aggregates per-(doc, byte-value) — bounded state") {
    val plan = planOf(SparkEntry.queries("m16_gain_normalize")(spark, dir))
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      "per-value counts must map-side combine")
  }
}
