package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e32's streaming form (streakStateStream): per-user state is five
  * longs regardless of history length. Proves stream ≡ batch: the
  * final streamed snapshot equals the gated e32 gaps-and-islands
  * output on the real sf0.001 events table across micro-batch
  * splits, and the contract laws hold — same-day repeats are
  * idempotent, a late older day never regresses state.
  */
class StreakStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streak-stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def runStream(batches: Seq[Seq[(Long, Long)]])
      : Map[Long, (Long, Long, Long)] = {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val latest = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    val q = EventStreams.streakStateStream(mem.toDS()).writeStream
      .outputMode("update")
      .foreachBatch { (b: Dataset[(Long, Long, Long, Long)], _: Long) =>
        b.collect().foreach { case (u, d, s, l) => latest(u) = (d, s, l) }
        ()
      }
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    latest.toMap
  }

  test("contract laws: streak transitions, idempotent repeats, late days held") {
    // user 1: days 10,11,12 then 20 (streaks 3+1); user 2: day 5
    // twice in one batch + again later (idempotent); user 3: day 8
    // then a LATE day 6 (ignored — state never regresses)
    val out = runStream(Seq(
      Seq((1L, 10L), (1L, 11L), (2L, 5L), (2L, 5L), (3L, 8L)),
      Seq((1L, 12L), (2L, 5L), (3L, 6L)),
      Seq((1L, 20L))))
    assert(out(1L) == (4L, 2L, 3L), s"user 1: ${out(1L)}")
    assert(out(2L) == (1L, 1L, 1L), s"user 2: ${out(2L)}")
    assert(out(3L) == (1L, 1L, 1L), s"user 3: ${out(3L)}")
  }

  test("stream snapshot equals the gated e32 batch output on real events") {
    val sq = spark
    import sq.implicits._
    val ud = graft.sources.Tables.load(spark, dir, "events")
      .select(col("user_id"),
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
      .distinct()
      .as[(Long, Long)]
      .collect().sortBy(d => (d._2, d._1))
    // split the in-order day stream into three micro-batches
    val n = ud.length
    val batches = Seq(ud.slice(0, n / 3), ud.slice(n / 3, 2 * n / 3),
      ud.slice(2 * n / 3, n)).map(_.toSeq)
    val streamed = runStream(batches)
    val batch = EventOps.e32Streaks(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("n_streaks"),
          r.getAs[Long]("longest_streak"))).toMap
    assert(streamed == batch,
      s"stream/batch drift: ${streamed.toSeq.diff(batch.toSeq).take(3)}")
  }
}
