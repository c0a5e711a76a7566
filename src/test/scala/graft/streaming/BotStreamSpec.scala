package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e36's streaming form (botScoreStream): per-user cadence state with
  * the e21 fold discipline — minute cells older than the horizon fold
  * into (count, max) longs, the type counters stay bounded by the
  * event-type vocabulary, and min-gap/last-ts are scalars. Proves the
  * stream ≡ batch claim: after batches that split a burst mid-minute
  * AND push the first minute past the fold horizon, the consumer's
  * latest per-user profile equals the batch e36 gauges computed over
  * the union of all batches. */
class BotStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bot-stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val t0 = 1704067200000000L // 2024-01-01 00:00 UTC in micros
  private def min(i: Int, offUs: Long = 0L): Long = t0 + i.toLong * 60000000L + offUs

  test("streamed profiles equal the batch gauges across folded minutes") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    // user 1: a 3-event burst inside minute 0 (two of them 5 ms
    // apart — the min gap), then quiet until minute 200 (minute 0
    // must fold, yet max_per_min must still report 3);
    // user 2: one event per minute, two types, 2:1 concentration.
    val batch1 = Seq(
      (1L, min(0), "click"), (1L, min(0, 5000L), "click"),
      (1L, min(0, 30000000L), "view"),
      (2L, min(0), "click"), (2L, min(1), "view"))
    val batch2 = Seq(
      (1L, min(200), "click"), (1L, min(201), "click"),
      (2L, min(2), "click"))

    val mem = MemoryStream[(Long, Long, String)]
    val latest = scala.collection.mutable.Map.empty[Long, (Long, Long, Long, Long, Long)]
    val q = EventStreams.botScoreStream(mem.toDS(), horizonMinutes = 60)
      .writeStream
      .outputMode("update")
      .foreachBatch { (b: Dataset[(Long, Long, Long, Long, Long, Long)], _: Long) =>
        b.collect().foreach { case (u, n, am, mpm, mg, tp) =>
          latest(u) = (n, am, mpm, mg, tp) }
      }
      .start()
    mem.addData(batch1: _*); q.processAllAvailable()
    mem.addData(batch2: _*); q.processAllAvailable()
    q.stop()

    // driver-side replay of the batch e36 definition over the union
    val all = batch1 ++ batch2
    all.groupBy(_._1).foreach { case (u, es) =>
      val ts = es.map(_._2).sorted
      val mins = ts.map(t => t - (t % 60000000L))
      val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }
      val expN = es.length.toLong
      val expAm = mins.distinct.length.toLong
      val expMpm = mins.groupBy(identity).values.map(_.size.toLong).max
      val expMg = if (gaps.isEmpty) -1L else gaps.min
      val expTp = es.groupBy(_._3).values.map(_.size.toLong).max * 1000000L / expN
      assert(latest(u) == ((expN, expAm, expMpm, expMg, expTp)),
        s"user $u: stream ${latest(u)} vs batch replay " +
          s"(${(expN, expAm, expMpm, expMg, expTp)})")
    }
    // the fold actually happened: user 1's minute-0 burst is 200+
    // minutes behind its newest cell, far past the 60-minute horizon
    assert(latest(1L)._3 == 3L, "folded minute still reports the burst ceiling")
  }
}
