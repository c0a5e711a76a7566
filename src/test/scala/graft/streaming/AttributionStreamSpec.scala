package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e18's streaming form (attributionStream): two scalars of state
  * per user attribute each purchase to the in-effect touch. Proves
  * per-purchase stream ≡ batch on real sf0.001 events across
  * micro-batch splits, and the boundary laws: same-instant touch
  * with smaller event_id counts, purchases never become touches,
  * the 30-minute lookback is inclusive. */
class AttributionStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-attribution-stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private type In = (Long, Long, Long, String)

  private def runStream(batches: Seq[Seq[In]]): Map[Long, (String, Long)] = {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val mem = MemoryStream[In]
    val got = scala.collection.mutable.Map.empty[Long, (String, Long)]
    val q = EventStreams.attributionStream(mem.toDS()).writeStream
      .outputMode("append")
      .foreachBatch { (b: Dataset[(Long, String, Long)], _: Long) =>
        b.collect().foreach(o => got(o._1) = (o._2, o._3)); ()
      }
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    got.toMap
  }

  test("laws: same-instant ordering, inclusive 30-min bound, purchases are not touches") {
    val halfHour = 1800000000L
    val out = runStream(Seq(
      // u1: click(eid 1) and purchase(eid 2) at the SAME ts — touch
      // counts (smaller eid precedes); purchase(eid 3) later at
      // exactly the 30-min bound — inclusive, still 'click'
      Seq((1L, 1000L, 1L, "click"), (1L, 1000L, 2L, "purchase")),
      Seq((1L, 1000L + halfHour, 3L, "purchase"),
        // u2: purchase with NO prior touch; an earlier purchase must
        // not act as a touch for the next one
        (2L, 500L, 4L, "purchase"), (2L, 600L, 5L, "purchase"),
        // u3: view then purchase one µs past the bound -> direct
        (3L, 0L, 6L, "view"), (3L, halfHour + 1L, 7L, "purchase"))))
    assert(out(2L) == (("click", 0L)))
    assert(out(3L) == (("click", halfHour)))
    assert(out(4L) == (("direct", Long.MinValue)))
    assert(out(5L) == (("direct", Long.MinValue)))
    assert(out(7L) == (("direct", halfHour + 1L)))
  }

  test("per-purchase stream equals the batch window recompute on real events") {
    val sq = spark
    import sq.implicits._
    val typed = graft.sources.Tables.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"))
      .as[In].collect()
      .sortBy { case (_, ts, eid, _) => (ts, eid) }
    val n = typed.length
    val batches = Seq(typed.slice(0, n / 3), typed.slice(n / 3, 2 * n / 3),
      typed.slice(2 * n / 3, n)).map(_.toSeq)
    val streamed = runStream(batches)

    // driver-side replay of the batch window semantics
    val expected = scala.collection.mutable.Map.empty[Long, (String, Long)]
    typed.groupBy(_._1).foreach { case (_, evs) =>
      var (tt, tu) = ("", Long.MinValue)
      evs.sortBy { case (_, ts, eid, _) => (ts, eid) }.foreach {
        case (_, ts, eid, tpe) =>
          if (tpe == "purchase") {
            expected(eid) =
              if (tu == Long.MinValue) ("direct", Long.MinValue)
              else {
                val lat = ts - tu
                (if (lat <= 1800000000L) tt else "direct", lat)
              }
          } else { tt = tpe; tu = ts }
      }
    }
    assert(streamed == expected.toMap,
      s"stream ${streamed.size} vs batch ${expected.size}")
    // and the gated e18 counts aggregate from exactly these rows
    val e18 = EventOps.e18Attribution(spark, dir).collect()
      .map(r => r.getAs[String]("channel") -> r.getAs[Long]("n_conversions"))
      .toMap
    val counts = streamed.values.groupBy(_._1).map { case (c, xs) => c -> xs.size.toLong }
    assert(e18 == counts, s"e18 $e18 vs stream-derived $counts")
  }
}
