package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The incremental HLL register sink (e13's stream mode): proves
  * stream ≡ batch across micro-batch boundaries and the replay
  * idempotence that max-merge buys (exactly-once-equivalence under
  * at-least-once delivery). */
class HllStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-hll-stream-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(minute: Int) = new Timestamp(1704067200000L + minute * 60000L)

  private def regsOf(rows: Seq[(Timestamp, Long)]): Map[(String, Long), Int] = {
    val sq = spark
    import sq.implicits._
    graft.operators.Relational.hllRegistersOf(
      rows.toDF("ts", "user_id")
        .select(date_trunc("hour", col("ts")).as("grp"), col("user_id").as("k")))
      .collect().map(r => (r.get(0).toString, r.getLong(1)) -> r.getInt(2)).toMap
  }

  private def storeOf(path: String): Map[(String, Long), Int] =
    spark.read.parquet(path)
      .collect().map(r => (r.get(0).toString, r.getLong(1)) -> r.getInt(2)).toMap

  test("stream register store equals batch registers; replay is a no-op") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val store = java.nio.file.Files.createTempDirectory("hllstream").toString + "/regs"
    val batch1 = (1 to 40).map(i => (ts(i), (i % 7).toLong))
    val batch2 = (41 to 80).map(i => (ts(i * 2), (i % 11).toLong))

    val mem = MemoryStream[(Timestamp, Long)]
    val q = EventStreams.hllRegisterStream(
      mem.toDF().toDF("ts", "user_id"), store).start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = storeOf(store)
      val batch = regsOf(batch1 ++ batch2)
      assert(streamed.nonEmpty && streamed == batch,
        "store after two micro-batches must equal batch registers of the union")
      // at-least-once delivery: re-delivering batch2 must not move the store
      mem.addData(batch2: _*)
      q.processAllAvailable()
      assert(storeOf(store) == batch, "replayed batch must be absorbed by max-merge")
    } finally q.stop()
  }
}
