package graft.streaming

import java.sql.Timestamp
import scala.collection.mutable.ListBuffer
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e10's stream mode: the trending leaderboard over FINALIZED
  * watermark windows. Proves the two properties the batch gate can't:
  *  - append-mode emission: every window's leaderboard is produced in
  *    exactly ONE foreachBatch call (when the watermark passes the
  *    window end), never revised afterwards;
  *  - the emitted rows are bit-identical to the batch rankWindows over
  *    the same events — the stream is the batch plan incrementalized,
  *    not a reimplementation.
  * State stays e1's watermark-bounded window state; the ranking step
  * is stateless per batch.
  */
class TrendingStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-trending-stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(minute: Int) = new Timestamp(1704067200000L + minute * 60000L)

  // hour 0: click×3 view×2 purchase×1; hour 1: view×3 purchase×2
  // click×1; hour 2: purchase×1 click×1 (a count TIE — the
  // event_type tie-break must order click before purchase)
  private val phase1: Seq[(Timestamp, Long, String, Double)] = Seq(
    (ts(1), 1L, "click", 1.0), (ts(5), 2L, "click", 1.0), (ts(9), 3L, "click", 1.0),
    (ts(15), 1L, "view", 1.0), (ts(30), 2L, "view", 1.0), (ts(50), 1L, "purchase", 1.0),
    (ts(61), 1L, "view", 1.0), (ts(70), 2L, "view", 1.0), (ts(80), 3L, "view", 1.0),
    (ts(90), 1L, "purchase", 1.0), (ts(100), 2L, "purchase", 1.0), (ts(110), 3L, "click", 1.0),
    (ts(121), 1L, "purchase", 1.0), (ts(170), 2L, "click", 1.0))
  private val advancers: Seq[(Timestamp, Long, String, Double)] = Seq(
    (ts(600), 9L, "click", 1.0), (ts(900), 9L, "view", 1.0),
    (ts(1300), 9L, "click", 1.0), (ts(1800), 9L, "view", 1.0))

  test("stream emits each finalized window's leaderboard once, equal to the batch rank") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val stream = mem.toDF().toDF("ts", "user_id", "event_type", "value")
    val batches = ListBuffer[Array[Row]]()
    val q = EventStreams.trendingStream(stream, 3)(b => batches += b.collect()).start()
    try {
      mem.addData(phase1: _*)
      q.processAllAvailable()
      advancers.foreach { row =>
        mem.addData(row)
        q.processAllAvailable()
      }
    } finally q.stop()

    val emitted = batches.toSeq.map(_.toSeq)
    // exactly-once: no window_start appears in more than one batch
    val windowToBatches = emitted.zipWithIndex
      .flatMap { case (rows, i) =>
        rows.map(_.getAs[Timestamp]("window_start")).distinct.map(w => (w, i))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(windowToBatches.nonEmpty, "no windows finalized — spec is vacuous")
    windowToBatches.foreach { case (w, bs) =>
      assert(bs.size == 1, s"window $w emitted in batches $bs — must emit exactly once")
    }
    assert(windowToBatches.size >= 3,
      s"expected at least the 3 phase-1 hours to finalize, got ${windowToBatches.keys}")

    // emitted leaderboards equal the batch rank restricted to those windows
    val batchDf = (phase1 ++ advancers).toDF("ts", "user_id", "event_type", "value")
    val expected = EventStreams.rankWindows(EventStreams.tumbling(batchDf), 3)
      .collect()
      .filter(r => windowToBatches.contains(r.getAs[Timestamp]("window_start")))
      .map(_.toSeq).toSet
    val got = emitted.flatten.map(_.toSeq).toSet
    assert(got == expected,
      s"missing=${expected.diff(got)} extra=${got.diff(expected)}")

    // the tie in hour 2 resolved by event_type: click ranks above purchase
    val hour2 = emitted.flatten.filter(_.getAs[Timestamp]("window_start") == ts(120))
    if (hour2.nonEmpty) {
      val ranked = hour2.sortBy(_.getAs[Int]("rank")).map(_.getAs[String]("event_type"))
      assert(ranked == Seq("click", "purchase"), s"tie-break order wrong: $ranked")
    }
  }
}
