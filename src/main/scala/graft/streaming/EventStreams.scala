package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-stream transforms, usable on BOTH a Structured Streaming
  * source (`readStream`) and the batch `events` table — the same
  * declarative plan, so the driver's batch oracle checks the exact
  * code the streaming runtime executes.
  *
  * Watermarks bound state at scale: tumbling/sliding aggregates drop
  * windows older than the watermark; session windows are pruned the
  * same way (state never grows unboundedly on a 1000-executor
  * cluster). `value` sums go through DECIMAL(18,2) so batch oracle
  * comparison is exact; final cast back to double for the API.
  */
object EventStreams {

  private val sumVal =
    sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value")

  /** Tumbling 1-hour windows per event_type. */
  def tumbling(events: DataFrame, withWatermark: Boolean = false): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "2 hours") else events
    src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sumVal)
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** Stream-static enrichment: events joined to a (c_custkey, n_name)
    * dimension frame — broadcast by the caller, so in stream mode each
    * micro-batch hash-joins against the dim WITHOUT shuffling the
    * stream (the standard stream-static join; the dim is loaded once
    * per batch, never watermarked) — then tumbling per-nation totals.
    * Batch and stream run this same transform (the e1 contract). */
  def enrichedTumbling(events: DataFrame, dim: DataFrame,
      withWatermark: Boolean = false): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "2 hours") else events
    src.join(dim, src("user_id") === dim("c_custkey"))
      .groupBy(window(col("ts"), "1 hour"), col("n_name"))
      .agg(count(lit(1)).as("n_events"), sumVal)
      .select(col("window.start").as("window_start"), col("n_name"),
        col("n_events"), col("sum_value"))
  }

  /** Sliding 1-hour windows every 30 minutes per event_type. */
  def sliding(events: DataFrame, withWatermark: Boolean = false): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "2 hours") else events
    src.groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sumVal)
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  /** 30-minute-gap session windows per user. */
  def sessions(events: DataFrame, withWatermark: Boolean = false): DataFrame = {
    val src = if (withWatermark) events.withWatermark("ts", "2 hours") else events
    src.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sumVal)
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"), col("sum_value"))
  }

  /** Per-batch ranking body of the trending leaderboard (e10): top-k
    * event types within each window of `counts`. Shared verbatim by
    * the batch gate and [[trendingStream]]'s foreachBatch — in stream
    * mode the input holds only windows the watermark just FINALIZED,
    * so the rank sort covers |types| rows per closed window, never
    * open state. */
  def rankWindows(counts: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start"))
      .orderBy(col("n_events").desc, col("event_type"))
    counts.select(col("window_start"), col("event_type"), col("n_events"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** e10 as a stream: watermarked tumbling counts in APPEND mode —
    * each window emits exactly once, when the watermark passes its
    * end — ranked per emitted window in foreachBatch (rank-on-
    * finalized-window). State is exactly e1's watermark-bounded
    * window state; the leaderboard step itself is stateless, so the
    * streaming cost profile is the tumbling aggregate's. The sink
    * callback receives each batch's ranked leaderboard rows. */
  def trendingStream(stream: DataFrame, k: Int)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    tumbling(stream, withWatermark = true)
      .writeStream.outputMode("append")
      .foreachBatch((batch: DataFrame, _: Long) => sink(rankWindows(batch, k)))

  /** e13's STREAM MODE: an incremental per-window HLL register sink.
    * Each micro-batch computes its OWN register table
    * ([[graft.operators.Relational.hllRegistersOf]] keyed by tumbling
    * hour) and merges it into a parquet store by cell-wise max — the
    * e13 merge law as the runtime. Two properties fall out of
    * max-merge, both spec-pinned (HllStreamSpec):
    *  - the store after any batch sequence equals the batch registers
    *    of the union of all input (stream ≡ batch);
    *  - replaying a batch is a NO-OP (max is absorbing), so the sink
    *    is exactly-once-equivalent under at-least-once delivery with
    *    no offset bookkeeping.
    * Store size is ≤ 64 rows per stream-lifetime hour, regardless of
    * event volume — the sketch IS the state. The old store is
    * materialized (localCheckpoint) before the overwrite so the read
    * and the rewrite of the same path can't race. */
  def hllRegisterStream(stream: DataFrame, storePath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val items = batch
          .select(date_trunc("hour", col("ts")).as("grp"), col("user_id").as("k"))
        val regs = graft.operators.Relational.hllRegistersOf(items)
        val merged =
          if (new java.io.File(storePath).exists())
            spark.read.parquet(storePath).localCheckpoint()
              .union(regs)
              .groupBy(col("grp"), col("bucket")).agg(max(col("m")).as("m"))
          else regs
        merged.write.mode("overwrite").parquet(storePath)
        ()
      }

  /** e15's STREAM MODE: an incremental per-window count-min cell
    * sink. Where e13's HLL registers merge by MAX (absorbing —
    * replays are free no-ops), CMS cells merge by SUM, which is NOT
    * idempotent: a replayed micro-batch would double-count. The
    * standard foreachBatch answer is the batch-id high-watermark —
    * Structured Streaming guarantees a retried epoch re-presents the
    * SAME (batchId, data), so `mergeCmsBatch` skips any batchId ≤ the
    * stored watermark and the sink is exactly-once. The watermark
    * rides IN the store (a `_meta` parquet beside the cells), so
    * recovery needs no external state. CmsStreamSpec pins both laws:
    * stream ≡ batch across splits, and a replayed batchId leaves the
    * store untouched. Store size: ≤ 256 cells + 1 meta row per
    * stream-lifetime hour, regardless of event volume. */
  def cmsCellStream(stream: DataFrame, storePath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeCmsBatch(batch, storePath, batchId)
      }

  /** One epoch of the CMS sink — factored so the spec can drive
    * replayed batch ids directly. */
  def mergeCmsBatch(batch: DataFrame, storePath: String, batchId: Long): Unit = {
    import graft.operators.Relational.{CmsRows, cmsBucket}
    val spark = batch.sparkSession
    val metaPath = storePath + "_meta"
    val seen = new java.io.File(metaPath).exists()
    val last =
      if (seen) spark.read.parquet(metaPath)
        .agg(max(col("batch_id"))).collect()(0).getLong(0)
      else -1L
    if (batchId <= last) return
    val cells = batch
      .select(date_trunc("hour", col("ts")).as("w"),
        col("user_id").cast("long").as("k"))
      .select(col("w"), col("k"), explode(expr(s"sequence(0, ${CmsRows - 1})")).as("r"))
      .withColumn("bucket", expr(cmsBucket("k", "r")))
      .groupBy(col("w"), col("r"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val merged =
      if (new java.io.File(storePath).exists())
        spark.read.parquet(storePath).localCheckpoint()
          .union(cells)
          .groupBy(col("w"), col("r"), col("bucket")).agg(sum(col("c")).as("c"))
      else cells
    merged.write.mode("overwrite").parquet(storePath)
    import spark.implicits._
    Seq(batchId).toDF("batch_id").write.mode("append").parquet(metaPath)
  }

  /** Interval join: purchase ⋈ clicks of the same user in the 30
    * minutes up to (and including) the purchase. On streams both sides
    * carry watermarks and the time-range bound lets Spark evict join
    * state (a click older than watermark − 30 min can never match) —
    * the canonical bounded-state stream-stream join. In batch the same
    * plan is an equality hash join on user with a range post-filter. */
  def intervalJoin(events: DataFrame, withWatermark: Boolean = false): DataFrame = {
    def side(tpe: String, pfx: String) = {
      val s = events.filter(col("event_type") === tpe)
        .select(col("event_id").as(s"${pfx}_id"), col("user_id").as(s"${pfx}_user"),
          col("ts").as(s"${pfx}_ts"))
      if (withWatermark) s.withWatermark(s"${pfx}_ts", "1 hour") else s
    }
    val purchases = side("purchase", "purchase")
    val clicks = side("click", "click")
    purchases.join(clicks,
      col("purchase_user") === col("click_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") > col("purchase_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("purchase_id"), col("purchase_user").as("user_id"),
        col("purchase_ts"), col("click_id"), col("click_ts"))
  }
}
