package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the round-6 closing batches (q41+, g28+, d18+, s33+,
  * t20+, e20+, m11+): the shapes their 100 TB stories depend on. */
class Round6PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q41: the band join is an EQUI join — no nested-loop fallback") {
    val plan = planOf(SparkEntry.queries("q41_band_join")(spark, dir))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "the cell rewrite must hash, not loop")
    assert(plan.contains("Join"), "still a join")
  }

  test("q42: the per-row windows partition by shard/cents — never unpartitioned") {
    val plan = planOf(SparkEntry.queries("q42_skyline")(spark, dir))
    // the only unpartitioned window may be the |shards|-row summary; the
    // windows over part rows carry a partition spec
    val partRowWindows = "Window \\[min\\(psize".r.findAllIn(plan).length
    assert(partRowWindows >= 1, "expected windows over part rows")
    assert(plan.contains("[shard") || plan.contains("shard#"),
      "per-shard window partitioning must survive in the plan")
  }

  test("q43/q44/e20/e22: heavy windows all partition on grow-with-data keys") {
    for ((q, key) <- Seq(
        "q43_rank_functions" -> "o_custkey",
        "q44_pit_features" -> "o_custkey",
        "e20_interarrival" -> "user_id",
        "e22_lateness_audit" -> "user_id")) {
      val plan = planOf(SparkEntry.queries(q)(spark, dir))
      val specs = s"windowspecdefinition\\($key".r.findAllIn(plan).length +
        s"Window \\[.*\\], \\[$key".r.findAllIn(plan).length
      assert(plan.contains(key), s"$q window must reference $key")
      assert(!plan.contains("Window [], []"), s"$q must not have a global window")
    }
  }

  test("s33: per-vector top-K lists come from the bounded aggregate, not a window sort") {
    val plan = planOf(SparkEntry.queries("s33_mutual_knn")(spark, dir))
    assert(plan.contains("graft_top_neighbors5") || plan.contains("TopNeighbors"),
      "bounded mergeable top-k aggregate expected")
    assert(!plan.contains("row_number"), "no per-query window sort")
  }

  test("t20: corpus token frequencies partial-aggregate before the join") {
    val plan = planOf(SparkEntry.queries("t20_rare_tokens")(spark, dir))
    assert("HashAggregate".r.findAllIn(plan).length >= 4,
      "freq build and rollup must both map-side combine")
  }

  test("m13: the patch manifest runs in-row — only the output sort exchanges") {
    val plan = planOf(SparkEntry.queries("m13_grid_patches")(spark, dir))
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected only the output range sort, saw $exchanges exchanges")
    assert(plan.contains("Generate"), "patch rows generate in-row")
  }

  test("g28/q45 share one cached co-purchase pair build") {
    planOf(SparkEntry.queries("g28_copurchase")(spark, dir))
    val plan2 = planOf(SparkEntry.queries("q45_basket_lift")(spark, dir))
    assert(plan2.contains("InMemoryTableScan"),
      "q45 must read the DfCache'd pair table g28 built")
  }

  test("v10: the matryoshka profile is one narrow pass — no join, no agg exchange") {
    val plan = planOf(SparkEntry.queries("v10_matryoshka")(spark, dir))
    assert(!plan.contains("Join"), "no join expected")
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected at most cache+sort exchanges, saw $exchanges")
  }
}
