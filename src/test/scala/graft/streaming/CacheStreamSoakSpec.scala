package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The full long-lived-server story in one test (round-3 verdict item
  * 7): a streaming pipeline soaks — including a mid-stream restart
  * from its checkpoint — WHILE a sibling session on the same context
  * churns the DfCache (build → read → evict → rebuild of a real
  * derived table). Asserts no cross-interference in either direction:
  * the stream's exactly-once/contiguity invariants survive the cache
  * churn, and every cache rebuild cycle returns identical results
  * while the stream holds executor threads. */
class CacheStreamSoakSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-cache-stream-soak")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("streaming soak + sibling-session cache churn: no cross-interference") {
    val batchSess = spark.newSession()
    graft.functions.GraftFunctions.registerAll(batchSess)

    val out = java.nio.file.Files.createTempDirectory("graft_css_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_css_ckpt").toString
    def start() = spark.readStream
      .format("rate").option("rowsPerSecond", "200").load()
      .withWatermark("timestamp", "10 seconds")
      .dropDuplicates("value")
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()

    // one churn cycle: build the cached edge table in the sibling
    // session, read it, then evict — the long-lived server's
    // session-close path — and return the observable result
    def churn(): Long = {
      val n = graft.operators.graph.GraphOps.edgesWithDeg(batchSess, dir).count()
      graft.util.DfCache.evict(batchSess)
      n
    }

    val q1 = start()
    val phase1 = try (1 to 3).map(_ => churn()) finally q1.stop()
    val afterPhase1 = spark.read.parquet(out).count()
    assert(afterPhase1 > 0, "phase 1 must commit at least one batch")

    val q2 = start()
    val phase2 = try (1 to 3).map(_ => churn()) finally q2.stop()

    val cycles = phase1 ++ phase2
    assert(cycles.distinct.size == 1,
      s"cache rebuild cycles must all agree, got $cycles")
    assert(cycles.head > 0)

    val back = spark.read.parquet(out).select("value")
    val n = back.count()
    assert(n > afterPhase1, "restarted query must keep appending")
    assert(back.distinct().count() == n,
      "no duplicate values across the restart despite concurrent cache churn")
    val mm = back.agg(min("value").as("lo"), max("value").as("hi")).collect()(0)
    assert(mm.getAs[Long]("hi") - mm.getAs[Long]("lo") + 1 == n,
      "contiguous value sequence — offsets resumed cleanly under churn")
  }
}
