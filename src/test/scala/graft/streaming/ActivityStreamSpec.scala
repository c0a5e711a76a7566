package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e21's streaming form (activityProfileStream): per-user open-hour
  * state — hours older than the horizon fold into a three-long
  * summary, so state is O(horizon) cells per user, not O(lifetime).
  * Proves the e21 Scaladoc claim: the consumer's latest per-user
  * profile equals the batch e21 roll-up (n_active_hours,
  * max_per_hour, n_events, peak_ppm, is_bursty) even after hours
  * have been folded closed, provided arrivals respect the horizon
  * (the watermark contract e22 sizes).
  */
class ActivityStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-activity-stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val h0 = 1704067200000L // 2024-01-01 00:00 UTC
  private def hr(i: Int): Long = h0 + i.toLong * 3600000L

  test("streamed per-user profiles reproduce the batch roll-up across folded hours") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    // user 1: burst (3 events) in hour 0, then activity 30+ hours
    // later — hour 0 must FOLD into the summary yet still dominate
    // max_per_hour; user 2: steady 1-per-hour, never folds.
    val batch1 = Seq((1L, hr(0)), (1L, hr(0)), (1L, hr(0)), (1L, hr(1)),
      (2L, hr(0)), (2L, hr(1)))
    val batch2 = Seq((1L, hr(30)), (1L, hr(31)), (1L, hr(31)),
      (2L, hr(2)))

    val mem = MemoryStream[(Long, Long)]
    val latest = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    val q = EventStreams.activityProfileStream(mem.toDS(), horizonHours = 24)
      .writeStream
      .outputMode("update")
      .foreachBatch { (b: Dataset[(Long, Long, Long, Long)], _: Long) =>
        b.collect().foreach { case (u, nh, mx, ne) => latest(u) = (nh, mx, ne) }
        ()
      }
      .start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    // batch e21 reference over the union of all input
    val all = batch1 ++ batch2
    val batchRef = all.groupBy(_._1).map { case (u, es) =>
      val perHour = es.groupBy(_._2).view.mapValues(_.size.toLong)
      (u, (perHour.size.toLong, perHour.values.max, es.size.toLong))
    }
    assert(latest.toMap == batchRef, s"stream=$latest batch=$batchRef")
    // derived gauges match the e21 columns
    val (nh, mx, ne) = latest(1L)
    assert(mx == 3L && nh == 4L && ne == 7L)
    assert(mx * 1000000L / ne == 428571L) // peak_ppm
    assert(mx >= 3L)                      // is_bursty
  }
}
