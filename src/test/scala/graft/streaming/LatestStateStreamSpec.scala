package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e28's streaming form (latestStateStream): per-key O(1) upsert
  * state. Proves the CDC snapshot laws: the consumer's latest rows
  * equal the batch max-struct over ALL input; a late arrival older
  * than the held version changes nothing; replaying a batch changes
  * nothing (idempotence under at-least-once delivery). */
class LatestStateStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-latest-state-stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("streamed snapshots reproduce the batch latest-state exactly") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    // key 1 versions v1 < v2 < v3 with v3 arriving BEFORE v2 (late
    // row must not regress); key 2 sees a same-ts id tie; batch 3
    // replays batch 1 wholesale
    val b1 = Seq((1L, 10L, 100L, "v1"), (2L, 10L, 200L, "a"),
      (1L, 30L, 102L, "v3"))
    val b2 = Seq((1L, 20L, 101L, "v2"), (2L, 10L, 201L, "b"))
    val b3 = b1

    val mem = MemoryStream[(Long, Long, Long, String)]
    val latest = scala.collection.mutable.Map.empty[Long, (Long, Long, String)]
    val q = EventStreams.latestStateStream(mem.toDS()).writeStream
      .outputMode("update")
      .foreachBatch { (b: Dataset[(Long, Long, Long, String)], _: Long) =>
        b.collect().foreach { case (k, ts, id, p) => latest(k) = (ts, id, p) }
        ()
      }
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val afterB2 = latest.toMap
      mem.addData(b3: _*); q.processAllAvailable()
      assert(latest.toMap == afterB2, "replay must be a no-op")
    } finally q.stop()

    val batchRef = (b1 ++ b2).groupBy(_._1).map { case (k, rs) =>
      val w = rs.maxBy(r => (r._2, r._3))
      (k, (w._2, w._3, w._4))
    }
    assert(latest.toMap == batchRef, s"stream=$latest batch=$batchRef")
    assert(latest(1L) == (30L, 102L, "v3"), "late v2 must not regress v3")
    assert(latest(2L) == (10L, 201L, "b"), "same-ts tie breaks on row id")
  }
}
