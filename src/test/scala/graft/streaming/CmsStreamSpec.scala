package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The incremental CMS cell sink (e15's stream mode): stream ≡ batch
  * across micro-batch boundaries, and the batch-id high-watermark
  * makes the non-idempotent sum-merge exactly-once — a replayed epoch
  * leaves the store untouched (the contrast with e13's naturally
  * absorbing max-merge). */
class CmsStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-cms-stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(minute: Int) = new Timestamp(1704067200000L + minute * 60000L)

  private def cellsOf(rows: Seq[(Timestamp, Long)]): Map[(String, Long, Long), Long] = {
    val sq = spark
    import sq.implicits._
    import graft.operators.Relational.{CmsRows, cmsBucket}
    rows.toDF("ts", "user_id")
      .select(date_trunc("hour", col("ts")).as("w"),
        col("user_id").cast("long").as("k"))
      .select(col("w"), col("k"), explode(expr(s"sequence(0, ${CmsRows - 1})")).as("r"))
      .withColumn("bucket", expr(cmsBucket("k", "r")))
      .groupBy(col("w"), col("r"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.get(0).toString, num(r.get(1)), num(r.get(2))) -> num(r.get(3))).toMap
  }

  private def num(v: Any): Long = v.asInstanceOf[Number].longValue

  private def storeOf(path: String): Map[(String, Long, Long), Long] =
    spark.read.parquet(path)
      .collect()
      .map(r => (r.get(0).toString, num(r.get(1)), num(r.get(2))) -> num(r.get(3))).toMap

  test("stream cell store equals batch cells; replayed batch id is skipped") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val store = java.nio.file.Files.createTempDirectory("cmsstream").toString + "/cells"
    val batch1 = (1 to 40).map(i => (ts(i), (i % 7).toLong))
    val batch2 = (41 to 80).map(i => (ts(i * 2), (i % 11).toLong))

    val mem = MemoryStream[(Timestamp, Long)]
    val q = EventStreams.cmsCellStream(mem.toDF().toDF("ts", "user_id"), store).start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = storeOf(store)
      val batch = cellsOf(batch1 ++ batch2)
      assert(streamed.nonEmpty && streamed == batch,
        "store after two micro-batches must equal batch cells of the union")
      // at-least-once delivery: re-presenting an ALREADY-PROCESSED
      // epoch (same batchId) must be skipped by the watermark — with
      // sum-merge a real re-merge would double-count
      EventStreams.mergeCmsBatch(
        batch2.toDF("ts", "user_id"), store, batchId = 0L)
      assert(storeOf(store) == batch, "replayed epoch must not re-merge")
      // a genuinely NEW epoch still merges (the watermark only blocks replays)
      val batch3 = Seq((ts(5), 99L))
      EventStreams.mergeCmsBatch(batch3.toDF("ts", "user_id"), store, batchId = 99L)
      assert(storeOf(store) == cellsOf(batch1 ++ batch2 ++ batch3))
    } finally q.stop()
  }
}
