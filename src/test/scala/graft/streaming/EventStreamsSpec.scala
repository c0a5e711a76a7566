package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Drives [[EventStreams]] through a real Structured Streaming query
  * (MemoryStream source -> watermark -> window agg -> memory sink) and
  * checks the streamed result equals the batch run of the same
  * transform — the contract EventOps' DuckDB oracles rely on.
  */
class EventStreamsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ts(minute: Int) = new Timestamp(1704067200000L + minute * 60000L)

  private def sampleRows: Seq[(Timestamp, Long, String, Double)] = Seq(
    (ts(1), 1L, "click", 1.0), (ts(5), 1L, "click", 2.0),
    (ts(20), 2L, "view", 3.0), (ts(65), 1L, "click", 4.0),
    (ts(70), 2L, "view", 5.0), (ts(140), 1L, "click", 6.0))

  test("streamed tumbling agg equals batch tumbling agg") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val streamDf = mem.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = EventStreams.tumbling(streamDf, withWatermark = true)
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try {
      mem.addData(sampleRows: _*)
      q.processAllAvailable()
      val streamed = sq.table("tumbling_out")
        .orderBy("window_start", "event_type")
        .collect().map(_.toSeq).toSeq
      val batchDf = sampleRows.toDF("ts", "user_id", "event_type", "value")
      val batch = EventStreams.tumbling(batchDf)
        .orderBy("window_start", "event_type")
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streamed session windows equal batch session windows") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val streamDf = mem.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = EventStreams.sessions(streamDf, withWatermark = true)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("complete").start()
    try {
      mem.addData(sampleRows: _*)
      q.processAllAvailable()
      val streamed = sq.table("sessions_out")
        .orderBy("user_id", "session_start")
        .collect().map(_.toSeq).toSeq
      val batchDf = sampleRows.toDF("ts", "user_id", "event_type", "value")
      val batch = EventStreams.sessions(batchDf)
        .orderBy("user_id", "session_start")
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      // user 1: events at minutes 1,5 then 65,70(no - 65 is user1, 70 user2)
      // gap > 30min splits sessions; expect multiple sessions for user 1
      assert(streamed.count(_.head == 1L) >= 2)
    } finally q.stop()
  }

  test("custom-state sessions: incremental stream equals batch run") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val streamDf = mem.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = CustomSessions.streamingSessions(sq, streamDf)
      .writeStream.format("memory").queryName("custom_sessions_out")
      .outputMode("append").start()
    try {
      // two micro-batches: sessions must close across batch boundaries,
      // and the watermark (max ts - 2h) must pass the gap horizon for
      // the state-store timeout to flush them
      mem.addData(sampleRows.take(3): _*)
      q.processAllAvailable()
      mem.addData(sampleRows.drop(3): _*)
      q.processAllAvailable()
      mem.addData((ts(600), 9L, "click", 0.0)) // push watermark forward
      q.processAllAvailable()
      val streamed = sq.table("custom_sessions_out")
        .orderBy("user_id", "session_start")
        .collect().map(_.toSeq).toSeq
      val batch = CustomSessions
        .batchSessions(sq, sampleRows.toDF("ts", "user_id", "event_type", "value"))
        .orderBy("user_id", "session_start")
        .collect().map(_.toSeq).toSeq
      assert(batch.nonEmpty)
      // every batch session except possibly still-open tails must have
      // streamed out; closed sessions must agree exactly
      assert(batch.forall(streamed.contains(_)))
      // and the custom-state path agrees with the built-in session_window
      val builtIn = EventStreams
        .sessions(sampleRows.toDF("ts", "user_id", "event_type", "value"))
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
        .orderBy("user_id", "session_start")
        .collect().map(_.toSeq).toSeq
      assert(batch == builtIn)
    } finally q.stop()
  }

  test("stream-stream interval join equals batch interval join") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val streamDf = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.intervalJoin(streamDf, withWatermark = true)
      .writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    val rows = Seq(
      (1L, ts(1), 1L, "click", 0.0),    // within 30 min of purchase@20
      (2L, ts(20), 1L, "purchase", 9.0),
      (3L, ts(25), 1L, "click", 0.0),   // after the purchase — no match
      (4L, ts(40), 2L, "click", 0.0),
      (5L, ts(90), 2L, "purchase", 5.0), // click@40 is 50 min old — no match
      (6L, ts(80), 2L, "click", 0.0),   // within 10 min — match
      (7L, ts(95), 1L, "purchase", 1.0)) // click@25 is 70 min old... no; none
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = sq.table("ij_out")
        .orderBy("purchase_id", "click_id").collect().map(_.toSeq).toSeq
      val batch = EventStreams
        .intervalJoin(rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
        .orderBy("purchase_id", "click_id").collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      assert(batch.map(r => (r.head, r(3))) == Seq((2L, 1L), (5L, 6L)))
    } finally q.stop()
  }

  test("streaming dedup drops duplicate event ids within watermark") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val streamDf = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val deduped = streamDf.withWatermark("ts", "2 hours")
      .dropDuplicates("event_id")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("complete").start()
    try {
      mem.addData(
        (1L, ts(1), 1L, "click", 1.0), (1L, ts(1), 1L, "click", 1.0),
        (2L, ts(2), 1L, "view", 2.0), (2L, ts(2), 1L, "view", 2.0),
        (3L, ts(3), 2L, "click", 3.0))
      q.processAllAvailable()
      val out = sq.table("dedup_out").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out == Map("click" -> 2L, "view" -> 1L))
    } finally q.stop()
  }

  test("parquet sink: streamed append lands in files under a recoverable checkpoint") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sink_ckpt").toString
    // the cluster-shaped sink: readStream → dedup → parquet files +
    // write-ahead checkpoint (exactly-once on restart)
    val q = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", "2 hours")
      .dropDuplicates("event_id")
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    try {
      mem.addData(
        (1L, ts(1), 1L, "click", 1.0), (1L, ts(1), 1L, "click", 1.0),
        (2L, ts(2), 2L, "view", 2.0))
      q.processAllAvailable()
      mem.addData((3L, ts(3), 1L, "click", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.parquet(out)
    assert(back.count() == 3, "duplicate must be dropped, both batches persisted")
    assert(back.select("event_id").distinct().count() == 3)
    assert(new java.io.File(ckpt, "offsets").exists(), "write-ahead offsets log expected")
  }

  test("exact 30-minute gap: custom state, session_window and oracle rule all merge") {
    val sq = spark
    import sq.implicits._
    // Spark's session_window merges an event landing EXACTLY gap after
    // the previous one (adjacent [t, t+gap) windows touch). The custom
    // state and the gaps-and-islands oracle (`diff > gap` starts a new
    // session) deliberately use the same inclusive bound, so all three
    // agree on the boundary; an event 1 µs past the gap splits.
    val rows = Seq(
      (ts(0), 1L, "click", 1.0),
      (ts(30), 1L, "click", 2.0),   // exactly the gap later -> merges
      (ts(61), 1L, "click", 3.0))   // 31 min after ts(30) -> NEW session
    val df = rows.toDF("ts", "user_id", "event_type", "value")
    def shape(out: org.apache.spark.sql.DataFrame): Seq[(Timestamp, Long)] =
      out.orderBy("session_start").collect()
        .map(r => (r.getAs[Timestamp]("session_start"), r.getAs[Long]("n_events"))).toSeq
    val custom = shape(CustomSessions.batchSessions(sq, df))
    val builtin = shape(EventStreams.sessions(df))
    assert(custom == Seq((ts(0), 2L), (ts(61), 1L)))
    assert(custom == builtin)
  }

  test("streamed stream-static enrichment equals batch (dim joined per micro-batch)") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val dim = Seq((1L, "GERMANY"), (2L, "FRANCE"))
      .toDF("c_custkey", "n_name")
    val mem = MemoryStream[(Timestamp, Long, String, Double)]
    val streamDf = mem.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = EventStreams.enrichedTumbling(streamDf, broadcast(dim), withWatermark = true)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("complete").start()
    try {
      mem.addData(sampleRows: _*)
      q.processAllAvailable()
      val streamed = sq.table("enrich_out")
        .orderBy("window_start", "n_name")
        .collect().map(_.toSeq).toSeq
      val batchDf = sampleRows.toDF("ts", "user_id", "event_type", "value")
      val batch = EventStreams.enrichedTumbling(batchDf, broadcast(dim))
        .orderBy("window_start", "n_name")
        .collect().map(_.toSeq).toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
      // both users' nations present: the static side never ages out
      assert(streamed.map(_(1)).distinct.toSet == Set("GERMANY", "FRANCE"))
    } finally q.stop()
  }
}
