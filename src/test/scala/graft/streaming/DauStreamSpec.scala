package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e25's streaming form: DAU as stateful first-seen dedup — state per
  * user is the SET OF DAYS already counted (bounded by the stream's
  * lifetime in days, the e4 dedup posture keyed coarser), and each
  * batch emits one (day, user) increment only for genuinely new
  * (user, day) pairs. Proves the e25 Scaladoc's claim: the stream's
  * increments sum to the batch DAU exactly — replays and duplicate
  * arrivals across batches count zero (exactly-once per user-day).
  * WAU then derives downstream from the SAME emitted pairs (the batch
  * op's 7-day explode over the incrementally-maintained user-day
  * table), so proving the pair stream proves the pipeline's input.
  */
class DauStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-dau-stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val day0 = 1704067200000L // 2024-01-01 UTC midnight
  private def ts(day: Int, hour: Int) =
    new Timestamp(day0 + day * 86400000L + hour * 3600000L)

  /** (user_id, ts_millis) → newly-seen (user, epoch_day) pairs. */
  private def newUserDays(
      events: Dataset[(Long, Long)]): Dataset[(Long, Long)] = {
    val sq = events.sparkSession
    import sq.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[Set[Long], (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[Set[Long]]) =>
          val seen = state.getOption.getOrElse(Set.empty[Long])
          val days = rows.map(r => r._2 / 86400000L).toSet
          val fresh = days -- seen
          state.update(seen ++ fresh)
          fresh.iterator.map(d => (user, d))
      }
  }

  test("streamed user-day increments reproduce the batch DAU exactly") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    // user 1 active days 0,0,1 (dup within day 0); user 2 active day 0;
    // batch 2 REPLAYS user 1 day 0 (late duplicate) and adds day 2
    val batch1 = Seq((1L, ts(0, 9).getTime), (1L, ts(0, 17).getTime),
      (2L, ts(0, 12).getTime), (1L, ts(1, 8).getTime))
    val batch2 = Seq((1L, ts(0, 23).getTime), (1L, ts(2, 7).getTime),
      (2L, ts(2, 10).getTime))

    val mem = MemoryStream[(Long, Long)]
    val pairs = scala.collection.mutable.Set.empty[(Long, Long)]
    var emitted = 0
    val q = newUserDays(mem.toDS()).writeStream
      .outputMode("append")
      .foreachBatch { (b: Dataset[(Long, Long)], _: Long) =>
        val rows = b.collect()
        emitted += rows.length
        pairs ++= rows
        ()
      }
      .start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    val batchRef = (batch1 ++ batch2).map { case (u, t) => (u, t / 86400000L) }.toSet
    assert(pairs.toSet == batchRef, s"stream=$pairs batch=$batchRef")
    // exactly-once: the day-0 replay and the within-day dup added NOTHING
    assert(emitted == batchRef.size, s"emitted $emitted, expected ${batchRef.size}")
    val epochDay0 = day0 / 86400000L
    val dau = pairs.groupBy(_._2).view.mapValues(_.size).toMap
    assert(dau == Map(epochDay0 -> 2, epochDay0 + 1 -> 1, epochDay0 + 2 -> 2))
  }
}
