package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e23's streaming form: the per-user transition counter as stateful
  * O(1)-per-user streaming state (last event's (type, us, event_id)),
  * emitting one (prev_type, event_type) increment per arriving event.
  * Proves the claim e23's Scaladoc makes: summed over the run, the
  * stream's increments equal the batch transition matrix exactly —
  * including out-of-order arrival WITHIN a batch, where state must
  * follow (us, event_id) event-time order, not arrival order.
  */
class TransitionStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-transition-stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(minute: Int) = new Timestamp(1704067200000L + minute * 60000L)

  /** (user, sorted events) → per-batch transition increments; state =
    * the last event in event-time order. Events arriving within one
    * batch sort by (us, event_id) before folding — the same order the
    * batch window uses. */
  private def transitions(
      events: Dataset[(Long, Long, String, Long)]): Dataset[(String, String)] = {
    val sq = events.sparkSession
    import sq.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, String), (String, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[(Long, Long, String, Long)],
         state: GroupState[(Long, String)]) =>
          val sorted = rows.toSeq.sortBy(r => (r._4, r._2))
          var prev = state.getOption
          val out = sorted.flatMap { r =>
            val o = prev.map { case (_, pt) => (pt, r._3) }
            prev = Some((r._4, r._3))
            o
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  test("streamed transition increments sum to the batch matrix") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    // user 1: a→b→a; user 2: b→b; plus an out-of-order arrival inside
    // one batch (user 1's minute-5 event arrives after its minute-9)
    val batch1 = Seq(
      (1L, 10L, "a", ts(1).getTime * 1000),
      (1L, 12L, "b", ts(9).getTime * 1000),
      (1L, 11L, "b", ts(5).getTime * 1000), // out-of-order arrival
      (2L, 20L, "b", ts(2).getTime * 1000))
    val batch2 = Seq(
      (1L, 13L, "a", ts(20).getTime * 1000),
      (2L, 21L, "b", ts(30).getTime * 1000))

    val mem = MemoryStream[(Long, Long, String, Long)]
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    val q = transitions(mem.toDS()).writeStream
      .outputMode("append")
      .foreachBatch { (b: Dataset[(String, String)], _: Long) =>
        b.collect().foreach(p => counts(p) = counts.getOrElse(p, 0L) + 1)
      }
      .start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    // batch reference: the same fold over fully-sorted per-user events
    val all = (batch1 ++ batch2).sortBy(r => (r._1, r._4, r._2))
    val expected = all.groupBy(_._1).values.flatMap { rows =>
      rows.sliding(2).collect { case Seq(a, b) => (a._3, b._3) }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(counts.toMap == expected,
      s"stream=$counts batch=$expected")
    // the out-of-order arrival must produce a→b and b→b (event-time
    // order), NOT a→b and b→b reversed into arrival order's a→b, b→b
    assert(counts(("a", "b")) == 1L && counts(("b", "a")) == 1L
      && counts(("b", "b")) == 2L)
  }
}
