package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e34's streaming form (peakConcurrencyStream): the sweep state is
  * O(open intervals) — current concurrency, pending end points, and
  * the day-peak map. Proves stream ≡ batch on the REAL sf0.001
  * session intervals with the batch boundary placed so that open
  * intervals straddle it (ends pending across batches), plus a hand
  * case pinning the per-instant netting (a start and an end at the
  * same microsecond must not create a phantom peak).
  */
class PeakConcurrencyStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-peakconc-stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def runStream(batches: Seq[Seq[(Long, Long)]]): Map[Long, Long] = {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val latest = scala.collection.mutable.Map.empty[Long, Long]
    val q = EventStreams.peakConcurrencyStream(mem.toDS()).writeStream
      .outputMode("update")
      .foreachBatch { (b: Dataset[(Long, Long)], _: Long) =>
        b.collect().foreach { case (d, p) => latest(d) = p }
        ()
      }
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      mem.addData((Long.MaxValue, Long.MaxValue)); q.processAllAvailable()
    } finally q.stop()
    latest.toMap
  }

  private val us0 = 1704067200000000L // 2024-01-01 UTC, microseconds
  private val DayUs = 86400000000L

  test("hand case: same-instant start/end nets; carry crosses empty days") {
    val h = 3600000000L
    // i1 spans days 0–2 (carry through day 1, which has no points);
    // i2 ends at the exact instant i3 starts (net 0 at that point);
    // i4+i5 overlap inside day 2 for the peak of 3 (i1 still open)
    val i1 = (us0 + h, us0 + 2 * DayUs + 4 * h)
    val i2 = (us0 + 2 * h, us0 + 2 * DayUs + h)
    val i3 = (us0 + 2 * DayUs + h, us0 + 2 * DayUs + 3 * h)
    val i4 = (us0 + 2 * DayUs + 90 * 60000000L, us0 + 2 * DayUs + 2 * h)
    // batch split leaves i1/i2 open across the boundary
    val got = runStream(Seq(Seq(i1, i2), Seq(i3, i4)))
    // day 0: i1, i2 open → peak 2; day 1: no points (absent);
    // day 2: carry 2; at i3.start net 0 (i2 closes) → 2; i4 opens → 3
    assert(got == Map(us0 -> 2L, (us0 + 2 * DayUs) -> 3L), got.toString)
  }

  test("stream equals batch e34 on sf0.001 with open intervals split across batches") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.load(spark, dir, "events")
    val ivs = EventStreams.sessions(ev)
      .select(unix_micros(col("session_start")), unix_micros(col("session_end")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity).toSeq
    assert(ivs.nonEmpty)
    // cut strictly inside the longest interval: it is guaranteed
    // still open at the boundary, so its end crosses batches pending
    val longest = ivs.maxBy(iv => iv._2 - iv._1)
    val cut = longest._1 + (longest._2 - longest._1) / 2
    val (b1, b2) = ivs.partition(_._1 < cut)
    val openAcross = b1.count(_._2 > cut)
    assert(openAcross > 0, "the cut must split at least one open interval")
    val got = runStream(Seq(b1, b2))
    val want = EventOps.e34PeakConcurrency(spark, dir)
      .select(unix_micros(col("day").cast("timestamp")),
        col("peak_concurrent"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want,
      s"stream days=${got.size} batch days=${want.size}; " +
        s"diff=${(got.toSet diff want.toSet).take(5)} / ${(want.toSet diff got.toSet).take(5)}")
  }
}
