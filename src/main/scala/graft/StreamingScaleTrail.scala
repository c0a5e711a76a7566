package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.{AnomalyStream, CustomSessions, EventStreams}

/** Streaming soak at real event volume (r11 verdict item 6 + r12
  * item 3): the 10 STREAM-MODE forms are MemoryStream-spec'd at toy
  * scale; this trail re-runs the state-shape-distinct ones (e6
  * custom-session state, e11 rolling-window detector state, e28
  * per-key CDC state, and the e18/e30 per-user funnel-scalar family)
  * as a RATE-LIMITED FILE-SOURCE stream over the tiled sf1 events
  * table and asserts, per form:
  *   - stream ≡ batch on the final snapshot (0 mismatches), and
  *   - the state store stays WATERMARK/KEY-BOUNDED: peak and final
  *     state rows/bytes are recorded from the progress feed, with the
  *     final count pinned to its design bound (≈0 open sessions after
  *     the flush sentinel; ≤ |event types| detector rows; = |users|
  *     CDC rows).
  *
  * Rate limiting: the events table is re-sliced into 16 time-ordered
  * parquet files and streamed with maxFilesPerTrigger=1, so the
  * watermark advances across 16+1 micro-batches exactly as a live
  * ingest would, and state-store eviction is actually exercised
  * (a single-batch run would finalize everything trivially). A
  * far-future sentinel row (user −1 / type "wm_sentinel") in the last
  * slice pushes the final watermark past every real session/window so
  * the stream's append output is COMPLETE and can be compared to the
  * batch run exactly, not modulo open tails.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.StreamingScaleTrail /tmp/sf1"
  * Prints one JSON line per form.
  */
object StreamingScaleTrail {

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete()
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val only = args.drop(1).toSet
    def want(n: String): Boolean = only.isEmpty || only.contains(n)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, cpus)
    // host-health stamp per row (r12 verdict #2)
    val hs = new HostStamp(spark)
    import spark.implicits._

    val work = s"/tmp/graft_stream_trail_${System.nanoTime()}"
    val sliceDir = s"$work/slices"
    new java.io.File(sliceDir).mkdirs()
    val events = graft.sources.Tables.load(spark, dir, "events")
      .select(col("ts"), col("user_id"), col("event_type"), col("value"),
        col("event_id"))
    val (tsLo, tsHi) = {
      val r = events.agg(min(unix_micros(col("ts"))),
        max(unix_micros(col("ts")))).head
      (r.getLong(0), r.getLong(1))
    }
    val nSlices = 16
    // time-ordered slices written sequentially: FileStreamSource
    // processes pre-existing files in (modTime, path) order, so both
    // orderings agree with event time and the watermark advances
    // monotonically batch over batch
    val span = (tsHi - tsLo) / nSlices + 1
    (0 until nSlices).foreach { i =>
      val lo = tsLo + i * span
      val hi = lo + span
      val slice = events.filter(unix_micros(col("ts")) >= lo &&
        (if (i == nSlices - 1) lit(true) else unix_micros(col("ts")) < hi))
      val tmp = s"$work/stage_$i"
      slice.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(f"$sliceDir/slice_$i%02d.parquet"))
      rmTree(new java.io.File(tmp))
    }
    // flush sentinels: 10/20/30 days past the corpus horizon, their
    // own user and type, excluded from every comparison below. THREE
    // files, not one: the watermark only advances at the END of the
    // batch that read the sentinel, and event-time timeouts fire in a
    // LATER batch's state pass — so flushing every real session/window
    // needs follow-up batches after the watermark has moved (the same
    // reason the MemoryStream specs feed 3 advancer batches).
    (0 until 3).foreach { k =>
      val sentinelUs = tsHi + (10L + 10 * k) * 86400 * 1000000
      Seq((sentinelUs, -1L, "wm_sentinel", 0.0, -1L))
        .toDF("us", "user_id", "event_type", "value", "event_id")
        .select(timestamp_micros(col("us")).as("ts"), col("user_id"),
          col("event_type"), col("value"), col("event_id"))
        .coalesce(1).write.mode("overwrite").parquet(s"$work/stage_s")
      java.nio.file.Files.move(
        new java.io.File(s"$work/stage_s").listFiles()
          .find(_.getName.endsWith(".parquet")).get.toPath,
        java.nio.file.Paths.get(s"$sliceDir/slice_9${7 + k}_sentinel.parquet"))
    }

    def streamEvents(): DataFrame = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(sliceDir)

    /** Runs `q`'s stream to completion, returns (peakRows, peakBytes,
      * finalRows, nBatches) from the progress feed. */
    def soak(q: org.apache.spark.sql.streaming.StreamingQuery): (Long, Long, Long, Int) = {
      q.processAllAvailable()
      q.stop()
      val ps = q.recentProgress.toSeq.filter(_.stateOperators.nonEmpty)
      val rows = ps.map(_.stateOperators.map(_.numRowsTotal).sum)
      val bytes = ps.map(_.stateOperators.map(_.memoryUsedBytes).sum)
      (if (rows.isEmpty) 0L else rows.max,
        if (bytes.isEmpty) 0L else bytes.max,
        if (rows.isEmpty) 0L else rows.last,
        q.recentProgress.count(_.numInputRows > 0))
    }

    def report(op: String, mode: String, rows: Long, mismatches: Long,
        peakRows: Long, peakBytes: Long, finalRows: Long, boundOk: Boolean,
        nBatches: Int, sec: Double): Unit =
      println(
        s"""{"op":"$op","sf":"$dir","mode":"$mode","rows":$rows,""" +
          s""""mismatches":$mismatches,"batches":$nBatches,""" +
          s""""peak_state_rows":$peakRows,"peak_state_bytes":$peakBytes,""" +
          s""""final_state_rows":$finalRows,"final_bound_ok":$boundOk,""" +
          s""""total_sec":${"%.1f".format(sec)}${hs.stamp()}}""")

    // ---- e6: custom-session state ----------------------------------
    if (want("e6_custom_sessions")) {
      val t0 = System.nanoTime()
      val out = s"$work/e6_out"
      val q = CustomSessions.streamingSessions(spark, streamEvents())
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$work/e6_ckpt")
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.write.mode("append").parquet(out); ()
        }.start()
      val (peakR, peakB, finalR, nB) = soak(q)
      val streamed = spark.read.parquet(out).filter(col("user_id") =!= -1L)
      val batch = CustomSessions.batchSessions(spark, events)
      val j = streamed.as("a").join(batch.as("b"),
          Seq("user_id", "session_start"), "full_outer")
        .agg(count(lit(1)).as("n"),
          sum(when(col("a.n_events") === col("b.n_events") &&
            col("a.session_end") === col("b.session_end") &&
            col("a.sum_value") === col("b.sum_value"), 0L).otherwise(1L)).as("bad"))
        .head
      // after the sentinel flush only the sentinel's own session can
      // still be open
      report("e6_custom_sessions", "file_stream_soak", j.getLong(0),
        j.getLong(1), peakR, peakB, finalR, finalR <= 1,
        nB, (System.nanoTime() - t0) / 1e9)
    }

    // ---- e11: rolling-window detector state ------------------------
    if (want("e11_anomaly")) {
      val t0 = System.nanoTime()
      val out = s"$work/e11_out"
      val q = AnomalyStream.anomalyStream(streamEvents())
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$work/e11_ckpt")
        .foreachBatch { (b: Dataset[AnomalyStream.AnomalyRow], _: Long) =>
          b.write.mode("append").parquet(out); ()
        }.start()
      val (peakR, peakB, finalR, nB) = soak(q)
      val streamed = spark.read.parquet(out)
        .filter(col("event_type") =!= "wm_sentinel")
      val hourly = events
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("window_start"))
        .agg(count(lit(1)).as("c"))
      val batch = graft.streaming.EventOps.anomaliesOf(hourly)
      val j = streamed.as("a").join(batch.as("b"),
          Seq("event_type", "window_start"), "full_outer")
        .agg(count(lit(1)).as("n"),
          sum(when(col("a.n_events") === col("b.n_events") &&
            col("a.dev2") === col("b.dev2") &&
            col("a.var_num") === col("b.var_num") &&
            col("a.hist_n") === col("b.hist_n"), 0L).otherwise(1L)).as("bad"))
        .head
      val nTypes = events.select(col("event_type")).distinct().count() + 1
      report("e11_anomaly", "file_stream_soak", j.getLong(0), j.getLong(1),
        peakR, peakB, finalR, finalR <= nTypes,
        nB, (System.nanoTime() - t0) / 1e9)
    }

    // ---- e28: per-key CDC state -------------------------------------
    if (want("e28_latest_state")) {
      val t0 = System.nanoTime()
      val out = s"$work/e28_out"
      val rows = streamEvents()
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("event_type"))
        .as[(Long, Long, Long, String)]
      val q = EventStreams.latestStateStream(rows)
        .writeStream.outputMode("update")
        .option("checkpointLocation", s"$work/e28_ckpt")
        .foreachBatch { (b: Dataset[(Long, Long, Long, String)], _: Long) =>
          b.write.mode("append").parquet(out); ()
        }.start()
      val (peakR, peakB, finalR, nB) = soak(q)
      // the appended update feed replays the same max-(ts,id) algebra
      // the operator runs, so its per-key winner IS the final snapshot
      val streamed = spark.read.parquet(out)
        .toDF("user_id", "us", "event_id", "event_type")
        .filter(col("user_id") =!= -1L)
        .groupBy(col("user_id"))
        .agg(max(struct(col("us"), col("event_id"), col("event_type"))).as("s"))
        .select(col("user_id"), col("s.us").as("us"),
          col("s.event_id").as("event_id"), col("s.event_type").as("event_type"))
      val batch = events
        .groupBy(col("user_id"))
        .agg(max(struct(unix_micros(col("ts")).as("us"), col("event_id"),
          col("event_type"))).as("s"))
        .select(col("user_id"), col("s.us").as("us"),
          col("s.event_id").as("event_id"), col("s.event_type").as("event_type"))
      val j = streamed.as("a").join(batch.as("b"), Seq("user_id"), "full_outer")
        .agg(count(lit(1)).as("n"),
          sum(when(col("a.us") === col("b.us") &&
            col("a.event_id") === col("b.event_id") &&
            col("a.event_type") === col("b.event_type"), 0L).otherwise(1L)).as("bad"))
        .head
      val nUsers = events.select(col("user_id")).distinct().count() + 1
      report("e28_latest_state", "file_stream_soak", j.getLong(0), j.getLong(1),
        peakR, peakB, finalR, finalR == nUsers,
        nB, (System.nanoTime() - t0) / 1e9)
    }

    // ---- e30: per-user funnel-conversion state (r12 verdict #3) -----
    // The multi-step funnel shape the first soak round didn't cover:
    // flatMapGroupsWithState holding TWO scalars per user (first
    // view's µs + converted flag), emitting one append row per
    // converting user. State is KEY-bounded (O(1) per user forever),
    // not watermark-bounded — the bound under test is |users|.
    if (want("e30_funnel_latency")) {
      val t0 = System.nanoTime()
      val out = s"$work/e30_out"
      val typed = streamEvents()
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_type"))
        .as[(Long, Long, String)]
      val q = EventStreams.funnelLatencyStream(typed)
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$work/e30_ckpt")
        .foreachBatch { (b: Dataset[(Long, Long, Long)], _: Long) =>
          b.write.mode("append").parquet(out); ()
        }.start()
      val (peakR, peakB, finalR, nB) = soak(q)
      val streamed = spark.read.parquet(out)
        .toDF("user_id", "view_us", "purchase_us")
        .filter(col("user_id") =!= -1L)
      // batch law: first view, then first purchase at-or-after it
      // (inclusive — the stream's views-first same-instant sort)
      val views = events.filter(col("event_type") === "view")
        .groupBy(col("user_id"))
        .agg(min(unix_micros(col("ts"))).as("view_us"))
      val batch = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("pus"))
        .join(views, Seq("user_id"))
        .filter(col("pus") >= col("view_us"))
        .groupBy(col("user_id"), col("view_us"))
        .agg(min(col("pus")).as("purchase_us"))
      val j = streamed.as("a").join(batch.as("b"), Seq("user_id"), "full_outer")
        .agg(count(lit(1)).as("n"),
          sum(when(col("a.view_us") === col("b.view_us") &&
            col("a.purchase_us") === col("b.purchase_us"), 0L).otherwise(1L))
            .as("bad"))
        .head
      val nUsers = events.select(col("user_id")).distinct().count() + 1
      report("e30_funnel_latency", "file_stream_soak", j.getLong(0),
        j.getLong(1), peakR, peakB, finalR, finalR <= nUsers,
        nB, (System.nanoTime() - t0) / 1e9)
    }

    // ---- e18: last-touch attribution state (r12 verdict #3) ---------
    // Same state family as e30 (per-user scalars: last non-purchase
    // touch's type + µs) but a DIFFERENT emission shape: one append
    // row per PURCHASE, attributed to the touch in effect under the
    // inclusive 30-minute lookback. Batch comparator is the window
    // recompute (strictly-preceding rows ordered by (us, event_id)),
    // run distributed — per-purchase equality, not just counts.
    if (want("e18_attribution")) {
      val t0 = System.nanoTime()
      val out = s"$work/e18_out"
      val typed = streamEvents()
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("event_type"))
        .as[(Long, Long, Long, String)]
      val q = EventStreams.attributionStream(typed)
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$work/e18_ckpt")
        .foreachBatch { (b: Dataset[(Long, String, Long)], _: Long) =>
          b.write.mode("append").parquet(out); ()
        }.start()
      val (peakR, peakB, finalR, nB) = soak(q)
      val streamed = spark.read.parquet(out)
        .toDF("event_id", "channel", "lat_us")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val batch = events
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("event_type"))
        .withColumn("touch", last(
          when(col("event_type") =!= "purchase",
            struct(col("us").as("tus"), col("event_type").as("tt"))),
          ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"),
          when(col("touch").isNull, lit("direct"))
            .when(col("us") - col("touch.tus") <= 1800000000L, col("touch.tt"))
            .otherwise(lit("direct")).as("channel"),
          // the stream encodes "no prior touch at all" as Long.MinValue
          coalesce(col("us") - col("touch.tus"), lit(Long.MinValue))
            .as("lat_us"))
      val j = streamed.as("a").join(batch.as("b"), Seq("event_id"), "full_outer")
        .agg(count(lit(1)).as("n"),
          sum(when(col("a.channel") === col("b.channel") &&
            col("a.lat_us") === col("b.lat_us"), 0L).otherwise(1L)).as("bad"))
        .head
      val nUsers = events.select(col("user_id")).distinct().count() + 1
      report("e18_attribution", "file_stream_soak", j.getLong(0),
        j.getLong(1), peakR, peakB, finalR, finalR <= nUsers,
        nB, (System.nanoTime() - t0) / 1e9)
    }

    rmTree(new java.io.File(work))
    spark.stop()
  }
}
