package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e30's streaming form (funnelLatencyStream): two scalars of state
  * per user detect the first-view → first-qualifying-purchase
  * conversion. Proves the emitted pair set equals the batch
  * recompute on real sf0.001 events across micro-batch splits, that
  * the gated e30 per-dow counts aggregate from it, and the laws
  * (purchase before any view never converts; one emission per user;
  * same-instant view+purchase converts with zero latency). */
class FunnelLatencyStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-funnel-latency-stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private type In = (Long, Long, String)

  private def runStream(batches: Seq[Seq[In]]): Seq[(Long, Long, Long)] = {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val mem = MemoryStream[In]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = EventStreams.funnelLatencyStream(mem.toDS()).writeStream
      .outputMode("append")
      .foreachBatch { (b: Dataset[(Long, Long, Long)], _: Long) =>
        got ++= b.collect(); ()
      }
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    got.toSeq
  }

  test("laws: pre-view purchase ignored, one emission, same-instant converts") {
    val out = runStream(Seq(
      // user 1: purchase BEFORE any view (ignored), view at 100,
      // purchase at 100 (same instant, converts, lat 0), later
      // purchase at 200 (no second emission)
      Seq((1L, 50L, "purchase"), (1L, 100L, "view"), (1L, 100L, "purchase")),
      Seq((1L, 200L, "purchase"),
        // user 2: view only — never emits
        (2L, 10L, "view"))))
    assert(out == Seq((1L, 100L, 100L)), out.toString)
  }

  test("stream conversions equal the batch recompute; gated e30 aggregates from them") {
    val sq = spark
    import sq.implicits._
    val typed = graft.sources.Tables.load(spark, dir, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .as[In].collect()
      .sortBy { case (_, ts, tpe) => (ts, if (tpe == "view") 0 else 1) }
    val n = typed.length
    val batches = Seq(typed.slice(0, n / 3), typed.slice(n / 3, 2 * n / 3),
      typed.slice(2 * n / 3, n)).map(_.toSeq)
    val streamed = runStream(batches).map(t => t._1 -> (t._2, t._3)).toMap

    // driver-side batch recompute: first view, first purchase >= it
    val byUser = typed.groupBy(_._1)
    val expected = byUser.flatMap { case (u, evs) =>
      val views = evs.filter(_._3 == "view").map(_._2)
      if (views.isEmpty) None
      else {
        val v = views.min
        val ps = evs.filter(e => e._3 == "purchase" && e._2 >= v).map(_._2)
        if (ps.isEmpty) None else Some(u -> (v, ps.min))
      }
    }
    assert(streamed == expected,
      s"stream ${streamed.size} vs batch ${expected.size}")
    assert(streamed.nonEmpty)

    // the gated e30 rows aggregate from exactly these conversions
    val e30 = EventOps.e30FunnelLatency(spark, dir).collect()
      .map(r => r.getAs[Long]("dow") -> r.getAs[Long]("n_converted")).toMap
    // dow as e30 emits it (0 = Sunday): epoch day 0 was a Thursday
    val counts = expected.values
      .groupBy { case (v, _) => ((v / 86400000000L + 4) % 7) }
      .map { case (d, xs) => d -> xs.size.toLong }
    assert(e30 == counts, s"e30 $e30 vs stream-derived $counts")
  }
}
