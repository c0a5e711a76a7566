package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e39's streaming form (valueDriftStream): cross-day state per type
  * is three longs; the open day's histogram is freed at day close.
  * Proves stream ≡ batch on the real sf0.001 events table with
  * micro-batches split ACROSS a day boundary (and mid-day), and the
  * contract laws: a late row older than the open day is dropped,
  * provisional open-day rows refine to the final value. */
class ValueDriftStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-value-drift-stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private type Row7 = (String, Long, Long, Long, Long, Long, Long)

  private def runStream(batches: Seq[Seq[(String, Long, Long)]])
      : Map[(String, Long), (Long, Long, Long, Long, Long)] = {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val latest =
      scala.collection.mutable.Map.empty[(String, Long), (Long, Long, Long, Long, Long)]
    val q = EventStreams.valueDriftStream(mem.toDS()).writeStream
      .outputMode("update")
      .foreachBatch { (b: Dataset[Row7], _: Long) =>
        b.collect().foreach { case (t, d, n, s, p, nd, pd) =>
          latest((t, d)) = (n, s, p, nd, pd)
        }
        ()
      }
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    latest.toMap
  }

  test("contract laws: day close finalizes, late rows dropped, provisional refines") {
    // type A: day 10 = {100, 300} (p50 100), day 11 = {200},
    // day 12 = {50}; a LATE day-10 row arrives AFTER day 11 opened
    // (closed day) — dropped, state never regresses
    val out = runStream(Seq(
      Seq(("A", 10L, 100L), ("A", 10L, 300L)),
      Seq(("A", 11L, 200L)),
      Seq(("A", 10L, 999L), ("A", 12L, 50L))))   // 999 is late — dropped
    assert(!out.contains(("A", 10L)), "first day has no predecessor")
    assert(out(("A", 11L)) == (1L, 200L, 200L, -1L, 100L), out.toString)
    assert(out(("A", 12L)) == (1L, 50L, 50L, 0L, -150L), out.toString)
  }

  test("stream snapshot equals the gated e39 batch output on real events") {
    val sq = spark
    import sq.implicits._
    val typed = graft.sources.Tables.load(spark, dir, "events")
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("day"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[(String, Long, Long)]
      .collect().sortBy(_._2)
    // split into three batches: one boundary mid-day, one exactly at
    // a day boundary (the VERDICT-asked case)
    val days = typed.map(_._2).distinct.sorted
    val boundaryDay = days(days.length / 2)
    val i1 = typed.indexWhere(_._2 == boundaryDay) / 2 max 1
    val i2 = typed.indexWhere(_._2 == boundaryDay)  // first row OF boundaryDay
    val batches = Seq(typed.slice(0, i1), typed.slice(i1, i2),
      typed.slice(i2, typed.length)).map(_.toSeq)
    val streamed = runStream(batches)

    val batch = EventOps.e39ValueDrift(spark, dir).collect().map { r =>
      val day = java.time.LocalDate.parse(r.getAs[String]("day")).toEpochDay
      (r.getAs[String]("event_type"), day) ->
        (r.getAs[Long]("n"), r.getAs[Long]("sum_cents"),
          r.getAs[Long]("p50_cents"), r.getAs[Long]("n_delta"),
          r.getAs[Long]("p50_drift_cents"))
    }.toMap
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"stream(${streamed.size}) != batch(${batch.size}); " +
        s"only-stream=${(streamed.keySet -- batch.keySet).take(5)} " +
        s"only-batch=${(batch.keySet -- streamed.keySet).take(5)}")
  }
}
