package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the round-8 batch (q69–q72, t37, e39, d33, m23,
  * s49/s50/v16): the shapes their 100 TB stories depend on. */
class Round8PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  private def planOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q69: orders aggregate BELOW the outer join — the fact stream shuffles pre-combined") {
    val plan = planOf(SparkEntry.queries("q69_count_distribution")(spark, dir))
    // the per-customer count must be a HashAggregate that feeds the
    // join, not an outer join of raw orders rows
    val joinIdx = math.max(plan.indexOf("SortMergeJoin"),
      plan.indexOf("BroadcastHashJoin"))
    assert(joinIdx >= 0, "q69 needs the customer left join")
    val tail = plan.substring(joinIdx)
    assert(tail.contains("HashAggregate"),
      "the per-customer order count must sit below the join")
  }

  test("q70/q72: the one-row scalar frame broadcasts; no window anywhere") {
    for (q <- Seq("q70_global_share", "q72_prospects")) {
      val plan = planOf(SparkEntry.queries(q)(spark, dir))
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
        s"$q must broadcast the scalar frame")
      assert(!plan.contains("Window"), s"$q needs no window")
    }
  }

  test("q71: one combined per-order aggregate — no self-join of the fact table") {
    val plan = planOf(SparkEntry.queries("q71_sole_blame")(spark, dir))
    assert(!plan.contains("SortMergeJoin"),
      "the exists/not-exists pair must be the combined aggregate, " +
        "not Q21's textbook fact self-join")
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      "per-order stats must map-side combine")
  }

  test("t37: the vocabulary self-join is token-keyed equi, never broadcast or nested-loop") {
    val plan = planOf(SparkEntry.queries("t37_lang_vocab_jaccard")(spark, dir))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      "vocab ⋈ vocab must be a shuffled equi-join (vocabulary grows with the corpus)")
    assert(!plan.contains("CartesianProduct"),
      "only the |langs|-row size table may cross-join (broadcast)")
  }

  test("e39: the lag window consumes the aggregated (type, day) summary") {
    val plan = planOf(SparkEntry.queries("e39_value_drift")(spark, dir))
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0, "e39 needs the lag window")
    assert(plan.substring(winIdx).contains("HashAggregate"),
      "the window must sit above the daily aggregate, not raw events")
  }

  test("m23: the gate is one scan — no join, no shuffle beyond the output sort") {
    val plan = planOf(SparkEntry.queries("m23_media_gate")(spark, dir))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "flags derive from one per-doc frame; no join needed")
  }

  test("s50: re-encoding broadcasts the trained cells against the corpus scan") {
    val plan = planOf(SparkEntry.queries("s50_opq_codes")(spark, dir))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      "the 128-row trained codebook must broadcast")
    assert(!plan.contains("Window"), "the argmin is min(struct), never a window")
  }

  test("v16: one per-row scan — no join, no aggregate, no window") {
    val plan = planOf(SparkEntry.queries("v16_rotation_check")(spark, dir))
    assert(!plan.contains("Join") && !plan.contains("HashAggregate")
      && !plan.contains("Window"),
      "v16 is embarrassingly parallel; only the output ordering may exchange")
  }
}
