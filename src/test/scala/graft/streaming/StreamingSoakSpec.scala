package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Soak the cluster-shaped streaming pipeline: a live rate source →
  * watermark → stateful dedup → parquet files under a write-ahead
  * checkpoint, STOPPED MID-STREAM and restarted from the same
  * checkpoint. The assertions pin the recovery semantics the 100-TB
  * deployment depends on: the restarted query resumes from committed
  * offsets (no gaps), the file-sink transaction log keeps the output
  * exactly-once (no duplicates), and reads of the sink directory honor
  * `_spark_metadata` (uncommitted files invisible).
  */
class StreamingSoakSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming-soak")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("rate-source soak: parquet sink resumes exactly-once from its checkpoint") {
    val out = java.nio.file.Files.createTempDirectory("graft_soak_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_soak_ckpt").toString
    def start() = spark.readStream
      .format("rate").option("rowsPerSecond", "200").load()
      .withWatermark("timestamp", "10 seconds")
      .dropDuplicates("value")
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

    val q1 = start()
    try Thread.sleep(12000L) finally q1.stop()
    val afterPhase1 = spark.read.parquet(out).count()
    assert(afterPhase1 > 0, "phase 1 must commit at least one batch")

    val q2 = start()
    try Thread.sleep(8000L) finally q2.stop()

    val back = spark.read.parquet(out).select("value")
    val n = back.count()
    assert(n > afterPhase1, "restarted query must keep appending")
    assert(back.distinct().count() == n,
      "no duplicate values across the restart (file-sink exactly-once)")
    val mm = back.agg(min("value").as("lo"), max("value").as("hi")).collect()(0)
    assert(mm.getAs[Long]("hi") - mm.getAs[Long]("lo") + 1 == n,
      "contiguous value sequence — the restart resumed from committed offsets")
    assert(new java.io.File(ckpt, "commits").exists(), "commit log expected")
    assert(new java.io.File(out, "_spark_metadata").exists(),
      "file-sink transaction log expected")
  }
}
