package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the round-10 batch (q73/q74 — the adapted TPC-H
  * Q2/Q9 shapes): the properties their 100 TB stories depend on. */
class Round10PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  private def planOf(df: DataFrame): String = {
    df.collect()
    // AQE appends an "== Initial Plan ==" copy — count the FINAL plan
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q73: dims broadcast, argmin is two aggregates — no window, no join-back") {
    val plan = planOf(SparkEntry.queries("q73_min_cost_supplier")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      "the filtered part slice and region supplier dim must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "no fact-side shuffle join: Q2's correlated re-probe must not appear")
    assert(!plan.contains("Window"),
      "the argmin is min(struct(...)), not a ranking window")
    // exactly one scan of the big table: the classic Q2 plan reads the
    // supply pairs twice (once for min, once for the join-back)
    assert(plan.linesIterator.count(_.contains("lineitem.parquet")) == 1,
      "the supply catalog must be scanned exactly once (no join-back)")
  }

  test("q73: part filter and column pruning reach the scans") {
    val df = SparkEntry.queries("q73_min_cost_supplier")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val partScan = plan.linesIterator.find(_.contains("part.parquet")).get
    assert(partScan.contains("p_size"),
      "the p_size predicate must push down to the part scan")
    val liScan = plan.linesIterator.find(_.contains("lineitem.parquet")).get
    for (c <- Seq("l_partkey", "l_suppkey", "l_extendedprice"))
      assert(liScan.contains(c), s"lineitem scan must read $c")
    assert(!liScan.contains("l_comment") && !liScan.contains("l_shipdate"),
      "lineitem scan must prune unused columns")
  }

  test("g40: bounded-component driver fast path ≡ the distributed double sweep") {
    // the over-cap path must produce the SAME single row as the
    // fast path (same seed/far conventions, ecc, reach counts)
    import graft.operators.graph.GraphOps
    val fast = SparkEntry.queries("g40_pseudo_diameter")(spark, dir).collect()
    val dist = GraphOps.g40Distributed(spark, dir).collect()
    assert(fast.length == 1 && dist.length == 1)
    val cols = Seq("seed_node", "ecc_seed", "n_reached_seed",
      "far_node", "ecc_far", "n_reached_far")
    for (c <- cols)
      assert(fast(0).getAs[Long](c) == dist(0).getAs[Long](c),
        s"column $c diverged: fast=${fast(0).getAs[Long](c)} " +
          s"distributed=${dist(0).getAs[Long](c)}")
  }

  test("q75-q79: dims broadcast, no cartesian products, single fact scan each") {
    for (q <- Seq("q75_volume_shipping", "q76_market_share",
        "q77_top_share_suppliers", "q78_returned_items",
        "q79_supplier_variety")) {
      val plan = planOf(SparkEntry.queries(q)(spark, dir))
      assert(plan.contains("BroadcastHashJoin"), s"$q must broadcast its dims")
      assert(!plan.contains("CartesianProduct"), s"$q: no cartesian products")
      // q77's pair table is localCheckpointed (its scan happens at
      // build time and shows as an ExistingRDD here) — so ≤ 1, and
      // the double-instantiation the checkpoint fixed can never
      // silently return
      assert(plan.linesIterator.count(_.contains("lineitem.parquet")) <= 1,
        s"$q must scan lineitem at most once in one plan")
      assert(!plan.contains("Window"), s"$q needs no window")
    }
  }

  test("q76: the conditional numerator rides the same aggregate pass (no self-join)") {
    val plan = planOf(SparkEntry.queries("q76_market_share")(spark, dir))
    // one aggregate computes nation_vol and total_vol together
    assert(!plan.contains("SortMergeJoin"),
      "q76's share must not re-join the fact stream against itself")
  }

  test("q74: supplier dim broadcasts; single pass — one aggregate over the joined facts") {
    val plan = planOf(SparkEntry.queries("q74_profit")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      "supplier⋈nation must broadcast into the fact stream")
    assert(!plan.contains("Window"), "q74 needs no window")
    assert(plan.linesIterator.count(_.contains("lineitem.parquet")) == 1,
      "profit is one pass over lineitem")
    // signed arithmetic stays integral: no Decimal sum in the agg
    assert(!plan.contains("CartesianProduct"), "no cartesian products")
  }
}
