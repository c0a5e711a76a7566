package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e40's streaming form (scd2LookupStream): three scalars of state
  * per user enrich every fact with the in-effect SCD2 version.
  * Proves stream ≡ the gated e40 batch as-of on the real sf0.001
  * events table under event-time-ordered delivery split across
  * version boundaries, plus the contract laws (pre-first-version
  * facts unknown, same-instant purchase-then-fact ordering, late
  * facts carry the newest state with negative age). */
class Scd2LookupStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-scd2-lookup-stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private type In = (Long, Long, Long, String, Long)
  private type Out = (Long, Long, Long, String, Long, Long, Long, Boolean)

  private def runStream(batches: Seq[Seq[In]]): Map[Long, Out] = {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val mem = MemoryStream[In]
    val got = scala.collection.mutable.Map.empty[Long, Out]
    val q = EventStreams.scd2LookupStream(mem.toDS()).writeStream
      .outputMode("append")
      .foreachBatch { (b: Dataset[Out], _: Long) =>
        b.collect().foreach(o => got(o._1) = o)
        ()
      }
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    got.toMap
  }

  test("contract laws: unknown before first version, same-instant order, late facts") {
    val out = runStream(Seq(
      // user 1: fact before any purchase → unknown; purchase at 100
      // (v1, 500c); fact at 100 SAME instant sees v1; purchase at
      // 200 (v2, 700c); fact at 250 sees v2
      Seq((1L, 50L, 10L, "view", 0L), (1L, 100L, 11L, "purchase", 500L),
        (1L, 100L, 12L, "click", 0L)),
      Seq((1L, 200L, 13L, "purchase", 700L), (1L, 250L, 14L, "view", 0L)),
      // LATE fact at 150 after v2 opened: newest state, negative age
      Seq((1L, 150L, 15L, "view", 0L))))
    assert(out(10L) == ((10L, 1L, 50L, "view", 0L, 0L, 0L, false)))
    assert(out(12L) == ((12L, 1L, 100L, "click", 1L, 500L, 0L, true)))
    assert(out(14L) == ((14L, 1L, 250L, "view", 2L, 700L, 50L, true)))
    assert(out(15L) == ((15L, 1L, 150L, "view", 2L, 700L, -50L, true)),
      "late fact carries newest state with negative age, never fake history")
  }

  test("stream equals the gated e40 batch as-of on real events") {
    val sq = spark
    import sq.implicits._
    val all = graft.sources.Tables.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[In].collect()
      .sortBy { case (_, ts, eid, tpe, _) =>
        (ts, if (tpe == "purchase") 0 else 1, eid)
      }
    val n = all.length
    val batches = Seq(all.slice(0, n / 3), all.slice(n / 3, 2 * n / 3),
      all.slice(2 * n / 3, n)).map(_.toSeq)
    val streamed = runStream(batches)

    val batch = graft.streaming.EventOps.e40Scd2Lookup(spark, dir).collect()
    assert(batch.nonEmpty && streamed.size == batch.length,
      s"${streamed.size} vs ${batch.length}")
    batch.foreach { r =>
      val o = streamed(r.getAs[Long]("event_id"))
      if (r.getAs[Boolean]("is_known")) {
        assert(o._8, s"event ${r.getAs[Long]("event_id")} known")
        assert(o._5 == r.getAs[Long]("state_version"))
        assert(o._6 == math.round(r.getAs[Double]("state_value") * 100))
        assert(o._7 == r.getAs[Long]("state_age_us"))
      } else assert(!o._8)
    }
  }
}
