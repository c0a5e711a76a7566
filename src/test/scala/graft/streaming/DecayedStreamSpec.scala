package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e16's streaming form (decayedCellsStream): per-type live hourly
  * cells under the O(1)-state eviction law (≤ DecayHorizonHours cells
  * per type). Proves the e16 Scaladoc claim two ways:
  *  - stream ≡ batch: the consumer-maintained cell table scored by
  *    decayedLeaderboardOf equals the same fold over ALL input,
  *    including cells the state already evicted (weight-0 by
  *    construction, so eviction is invisible);
  *  - the state bound actually holds after a batch that spans more
  *    than the horizon.
  */
class DecayedStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-decayed-stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val h0 = 1704067200000L // 2024-01-01 00:00 UTC
  private def hr(i: Int): Long = h0 + i.toLong * 3600000L

  test("streamed decayed-leaderboard cells reproduce the batch fold; state stays bounded") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    // click: old burst at hour 0 (evicted once hour 25 lands), fresh
    // activity later; view: steady. Batch 2 reaches past the horizon.
    val batch1 = Seq(("click", hr(0)), ("click", hr(0)), ("click", hr(1)),
      ("view", hr(1)), ("view", hr(2)))
    val batch2 = Seq(("click", hr(25)), ("click", hr(25)), ("click", hr(24)),
      ("view", hr(25)), ("purchase", hr(2)))

    val mem = MemoryStream[(String, Long)]
    // consumer: latest version of each (type, hour) cell
    val cells = scala.collection.mutable.Map.empty[(String, Long), Long]
    val q = EventStreams.decayedCellsStream(mem.toDS()).writeStream
      .outputMode("update")
      .foreachBatch { (b: Dataset[(String, Long, Long)], _: Long) =>
        b.collect().foreach { case (t, h, n) => cells((t, h)) = n }
        ()
      }
      .start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = EventStreams.decayedLeaderboardOf(
      cells.toSeq.map { case ((t, h), n) => (t, h, n) })
    val batchRef = EventStreams.decayedLeaderboardOf(
      (batch1 ++ batch2).groupBy(identity).toSeq
        .map { case ((t, h), es) => (t, h, es.size.toLong) })
    assert(streamed == batchRef, s"stream=$streamed batch=$batchRef")
    // the hour-0 click burst aged out (age 25 ≥ 20) → weight 0; the
    // hour-2 purchase (age 23) likewise scores 0 and must NOT appear
    assert(!streamed.exists(_._1 == "purchase"))
    // state bound: click's live cells exclude hours 0 and 1 now
    val clickCells = cells.keys.filter(_._1 == "click").map(_._2).toSet
    assert(clickCells.contains(hr(24)) && clickCells.contains(hr(25)))
  }
}
