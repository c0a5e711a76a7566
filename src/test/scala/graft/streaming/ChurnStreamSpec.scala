package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e19's streaming form (churnStateStream): per-user state is exactly
  * two longs (last_ts, n_events). Proves the e19 Scaladoc claim: the
  * consumer's latest per-user scalars, binned against the global max
  * at read time, reproduce the batch idle-days histogram exactly —
  * including out-of-order arrivals (a late event must not move
  * last_ts backwards) and multi-batch accumulation of n_events.
  */
class ChurnStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-churn-stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val us0 = 1704067200000000L // 2024-01-01 UTC, microseconds
  private def day(d: Int, frac: Long = 0L): Long = us0 + d * 86400000000L + frac

  test("streamed per-user scalars reproduce the batch idle-days histogram") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    // user 1 active through day 9 (fresh), user 2 stops day 2
    // (churn-risk), user 3 stops day 0; batch 2 delivers user 3's
    // day-0 event LATE (after its day-1 event) — last_ts must hold.
    val batch1 = Seq((1L, day(0)), (1L, day(3, 5L)), (2L, day(1)),
      (2L, day(2)), (3L, day(1)))
    val batch2 = Seq((1L, day(9)), (3L, day(0)), (2L, day(2, 42L)))

    val mem = MemoryStream[(Long, Long)]
    val latest = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    val q = EventStreams.churnStateStream(mem.toDS()).writeStream
      .outputMode("update")
      .foreachBatch { (b: Dataset[(Long, Long, Long)], _: Long) =>
        b.collect().foreach { case (u, hi, n) => latest(u) = (hi, n) }
        ()
      }
      .start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    def histogram(perUser: Map[Long, (Long, Long)]): Map[Long, (Long, Long, Boolean)] = {
      val now = perUser.values.map(_._1).max
      perUser.values.groupBy { case (hi, _) => (now - hi) / 86400000000L }
        .view.mapValues { us =>
          (us.size.toLong, us.map(_._2).sum, false) }.toMap
        .map { case (d, (nu, ne, _)) => (d, (nu, ne, d >= 7L)) }
    }
    val all = batch1 ++ batch2
    val batchRef = histogram(all.groupBy(_._1).map { case (u, es) =>
      (u, (es.map(_._2).max, es.size.toLong)) })
    assert(histogram(latest.toMap) == batchRef,
      s"stream=${histogram(latest.toMap)} batch=$batchRef")
    // the late day-0 arrival did not regress user 3's last_ts
    assert(latest(3L) == (day(1), 2L))
  }
}
