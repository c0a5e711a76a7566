package graft.streaming

import java.sql.Timestamp
import scala.collection.mutable.ListBuffer
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e11's stream mode: the spike against flat history is flagged
  * exactly once as its window finalizes, with the SAME integer
  * algebra as the batch rule — and windows finalize via the event-
  * time timeout path even when their own type goes silent. */
class AnomalyStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-anomaly-stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val t0 = 1704067200000L // 2024-01-01 00:00 UTC
  private def ts(hour: Int, k: Int) =
    new Timestamp(t0 + hour * 3600000L + k * 60000L)

  // type "click": hours 0..39 at 2 events/hour, hour 30 spikes to 50;
  // flat history has zero variance so ONLY the spike trips the rule
  private val clicks: Seq[(Timestamp, Long, String, Double)] =
    (0 until 40).flatMap { h =>
      val n = if (h == 30) 50 else 2
      (0 until n).map(k => (ts(h, k % 60), (k % 7).toLong, "click", 1.0))
    }
  // a second type whose late events push the watermark past hour 42
  // while "click" is silent — its last windows must finalize via the
  // event-time timeout, not via new click data
  private def advancer(hour: Int) =
    (ts(hour, 0), 99L, "view", 1.0)

  test("stream flags the spike once, bit-equal to the batch rule, and flushes by timeout") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val stream = mem.toDF().toDF("ts", "user_id", "event_type", "value")
    val batches = ListBuffer[Array[Row]]()
    val q = AnomalyStream.anomalyStream(stream)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[AnomalyStream.AnomalyRow], _: Long) =>
        batches += b.toDF().collect(); ()
      }
      .start()
    try {
      mem.addData(clicks: _*)
      q.processAllAvailable()
      Seq(44, 46, 48).foreach { h =>
        mem.addData(advancer(h))
        q.processAllAvailable()
      }
    } finally q.stop()

    val emitted = batches.toSeq.flatten
    val anomalies = emitted.filter(_.getAs[String]("event_type") == "click")
    assert(anomalies.length == 1, s"exactly the spike: ${anomalies.toSeq}")
    val a = anomalies.head
    assert(a.getAs[Timestamp]("window_start") == new Timestamp(t0 + 30 * 3600000L))
    assert(a.getAs[Long]("n_events") == 50L)

    // bit-equal to the batch rule over the same events
    val batchCounts = clicks.toDF("ts", "user_id", "event_type", "value")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("window_start"))
      .agg(count(lit(1)).as("c"))
    val batchRows = EventOps.anomaliesOf(batchCounts).collect()
    assert(batchRows.length == 1)
    val b = batchRows.head
    assert(b.getAs[Timestamp]("window_start") == a.getAs[Timestamp]("window_start"))
    assert(b.getAs[Long]("dev2") == a.getAs[Long]("dev2"))
    assert(b.getAs[Long]("var_num") == a.getAs[Long]("var_num"))
    assert(b.getAs[Long]("hist_n") == a.getAs[Long]("hist_n"))

    // no window emitted twice across batches
    val keys = batches.toSeq.zipWithIndex.flatMap { case (rows, i) =>
      rows.map(r => (r.getAs[String]("event_type"),
        r.getAs[Timestamp]("window_start"))).distinct.map(k => (k, i))
    }
    keys.groupBy(_._1).foreach { case (k, bs) =>
      assert(bs.map(_._2).distinct.size == 1, s"window $k emitted twice")
    }
  }
}
