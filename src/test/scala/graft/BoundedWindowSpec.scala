package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExecBase
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bounded-input contract at every global-window site in the
  * library (the `WindowExec: No Partition Defined` warning class).
  *
  * A window with NO partition spec moves its whole input to one
  * partition — correct and cheap ONLY because every such site in this
  * repo windows a domain-bounded SUMMARY (months, brands, price
  * shards, days, deciles, frequency classes, 64 dims), never corpus
  * rows. This spec makes that argument executable: it runs each
  * gated query that contains a global window, walks the FINAL
  * adaptive physical plan, and asserts the row count flowing into
  * every unpartitioned window stays under the site's documented
  * domain bound. A future edit that feeds corpus rows into one of
  * these windows fails here instead of shipping a 100 TB
  * single-partition sort.
  *
  * Sites and bounds (sf-independent domains, so the bound holds at
  * ANY corpus scale, not just the gate's):
  *  - q53/q65/q49: order-date months — TPC-H date domain 1992–1998 ⇒ ≤ 120
  *  - q40: part brands — TPC-H brand domain is 25 values ⇒ ≤ 64
  *  - q42: price shards (retail cents div 1000) — price domain ≤ ~$2.1k ⇒ ≤ 4096
  *  - e27/e34: event-time days ⇒ ≤ 4096 (a decade of days)
  *  - e33: distinct per-user activity levels (sub-linear, NOT
  *    sf-independent: Σ levels ≤ total events ⇒ #levels ≤
  *    √(2·events)) and deciles (≤ 11) — bound COMPUTED from the
  *    tested dataset's event count, so the pin scales with the test
  *    sf instead of failing spuriously past ~8.4M events
  *  - t26: distinct doc-frequency classes — same √ argument over
  *    total token occurrences, bound computed from the corpus
  */
class BoundedWindowSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.01"
  private lazy val spark = GraftSession.local(threads = 8, shufflePartitions = 8)

  override def afterAll(): Unit = spark.stop()

  /** Final (post-AQE) plan nodes, unwrapping adaptive and stage shells. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
    case q: QueryStageExec => q +: allNodes(q.plan)
    case other => other +: other.children.flatMap(allNodes)
  }

  /** Rows flowing INTO `p`: the topmost `numOutputRows` metric at or
    * below p's input chain (sort/shuffle/codegen shells between carry
    * no row metric but preserve counts). */
  private def inputRows(p: SparkPlan): Option[Long] = {
    def fromOutput(n: SparkPlan): Option[Long] = n match {
      case a: AdaptiveSparkPlanExec => fromOutput(a.executedPlan)
      case q: QueryStageExec => fromOutput(q.plan)
      case other =>
        other.metrics.get("numOutputRows").map(_.value)
          .orElse(other.children.headOption.flatMap(fromOutput))
    }
    p.children.headOption.flatMap(fromOutput)
  }

  private def auditGlobalWindows(query: String, bound: Long): Unit = {
    val df: DataFrame = SparkEntry.queries(query)(spark, dir)
    df.collect()
    val windows = allNodes(df.queryExecution.executedPlan).collect {
      case w: WindowExecBase if w.partitionSpec.isEmpty => w
    }
    assert(windows.nonEmpty,
      s"$query: expected ≥1 global window in the final plan — if the " +
        "plan changed shape, update this audit, don't drop the pin")
    windows.foreach { w =>
      val rows = inputRows(w)
      assert(rows.isDefined,
        s"$query: no numOutputRows metric found under ${w.nodeName}")
      assert(rows.get <= bound,
        s"$query: global window over ${rows.get} rows exceeds the " +
          s"documented domain bound $bound — corpus rows are reaching " +
          "an unpartitioned window")
    }
  }

  test("q53: cumulative-distinct windows months only (≤120)") {
    auditGlobalWindows("q53_cumulative_distinct", 120)
  }
  test("q65: catalog-growth windows months only (≤120)") {
    auditGlobalWindows("q65_catalog_growth", 120)
  }
  test("q49: MoM growth windows months only (≤120)") {
    auditGlobalWindows("q49_mom_growth", 120)
  }
  test("q40: pareto windows brands only (≤64)") {
    auditGlobalWindows("q40_pareto", 64)
  }
  test("q42: skyline prefix-min windows price shards only (≤4096)") {
    auditGlobalWindows("q42_skyline", 4096)
  }
  test("e27: new-vs-returning windows days only (≤4096)") {
    auditGlobalWindows("e27_new_vs_returning", 4096)
  }
  test("e33: lorenz windows activity levels + deciles only (≤⌈√(2·events)⌉)") {
    // distinct per-user event counts: Σ levels ≤ events ⇒
    // #levels ≤ √(2·events). Computed from THIS dataset so the pin
    // stays valid at any test sf (a fixed 4096 would fail spuriously
    // past ~8.4M events without any corpus rows reaching the window).
    val events = graft.sources.Tables.load(spark, dir, "events").count()
    val bound = math.ceil(math.sqrt(2.0 * events)).toLong max 16L
    auditGlobalWindows("e33_activity_lorenz", bound)
  }
  test("e34: peak-concurrency carry windows days only (≤4096)") {
    auditGlobalWindows("e34_peak_concurrency", 4096)
  }
  test("t26: zipf profile windows frequency classes only (≤⌈√(2·occurrences)⌉)") {
    // distinct term-frequency values: Σ distinct frequencies ≤ total
    // token occurrences ⇒ #classes ≤ √(2·N). N is bounded above by
    // total text characters (every token is ≥1 char), which is one
    // cheap column aggregate — same √ argument, dataset-derived.
    import org.apache.spark.sql.functions.{length, sum, col}
    val chars = graft.sources.Tables.load(spark, dir, "documents")
      .agg(sum(length(col("text")))).head.getLong(0)
    val bound = math.ceil(math.sqrt(2.0 * chars)).toLong max 16L
    auditGlobalWindows("t26_zipf_profile", bound)
  }

  test("s50: OPQ alloc permutation windows exactly the 64 dims") {
    // the s50 window (SimilarityOps.allocPerm) runs inside a cached
    // artifact build, so it is not visible in the gated query's plan;
    // its input IS dimVariance — pin that table's cardinality to the
    // embedding dimensionality directly
    val n = graft.operators.similarity.SimilarityOps.dimVariance(spark, dir).count()
    assert(n == 64L, s"dimVariance must be one row per dim (64), got $n")
  }
}
