package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  // ------------------------------------------------------------------
  // Stateful stream modes of the e16/e19/e21 batch gauges. Each batch
  // op's Scaladoc claims its streaming form needs only O(1) state per
  // key; these are those forms, with the bound enforced IN the state
  // transition (not just asserted), and a MemoryStream spec apiece
  // (Decayed/Churn/ActivityStreamSpec) pinning stream ≡ batch.
  // ------------------------------------------------------------------

  /** Hours of history that can still carry weight in e16's decayed
    * leaderboard: 1e6 >> 20 == 0, so any cell ≥ 20 hours behind its
    * key's newest hour scores zero under ANY global "now" at least as
    * new (global max ≥ key max) — evicting it cannot change the
    * leaderboard. This is what makes the per-type state O(1): ≤ 20
    * live (hour, count) cells per event type, forever. */
  val DecayHorizonHours = 20

  /** e16's STREAM MODE: per-event-type live hourly cells. Input rows
    * are (event_type, hour_start_millis); state per type is the
    * cell map of its last [[DecayHorizonHours]] hours. Each batch
    * emits the key's UPDATED cells (update semantics — the consumer
    * keeps the latest (type, hour) version, then applies the e16
    * weight 1e6 >> age against the global max hour; stale evicted
    * cells re-surface there with weight 0, so consumer-side staleness
    * is harmless by construction). */
  def decayedCellsStream(typedHours: Dataset[(String, Long)])
      : Dataset[(String, Long, Long)] = {
    val sq = typedHours.sparkSession
    import sq.implicits._
    typedHours.groupByKey(_._1)
      .flatMapGroupsWithState[Map[Long, Long], (String, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (tpe: String, rows: Iterator[(String, Long)],
         state: GroupState[Map[Long, Long]]) =>
          val prev = state.getOption.getOrElse(Map.empty[Long, Long])
          val add = rows.foldLeft(Map.empty[Long, Long]) { case (m, (_, h)) =>
            m.updated(h, m.getOrElse(h, 0L) + 1L)
          }
          val merged = add.foldLeft(prev) { case (m, (h, n)) =>
            m.updated(h, m.getOrElse(h, 0L) + n)
          }
          val hi = merged.keys.max
          val live = merged.filter { case (h, _) =>
            (hi - h) / 3600000L < DecayHorizonHours }
          state.update(live)
          // emit only cells this batch touched (and still live)
          add.keys.iterator.filter(live.contains)
            .map(h => (tpe, h, live(h)))
      }
  }

  /** The e16 scoring fold over a maintained cell table — shared by
    * the spec's batch reference and the stream consumer, so the
    * equivalence test compares maintained STATE, not re-derivations.
    * `cells`: (event_type, hour_millis, n). Returns (event_type,
    * decayed_micro, n_recent) sorted like the batch gate. */
  def decayedLeaderboardOf(cells: Seq[(String, Long, Long)]): Seq[(String, Long, Long)] = {
    if (cells.isEmpty) return Seq.empty
    val now = cells.map(_._2).max
    cells.groupBy(_._1).toSeq.map { case (tpe, cs) =>
      val scored = cs.map { case (_, h, n) =>
        val age = ((now - h) / 3600000L).toInt
        val w = if (age < DecayHorizonHours) 1000000L >> age else 0L
        (w * n, if (w > 0) n else 0L)
      }
      (tpe, scored.map(_._1).sum, scored.map(_._2).sum)
    }.filter(_._2 > 0L).sortBy { case (t, d, _) => (-d, t) }
  }

  /** e19's STREAM MODE: per-user churn scalars. State per user is
    * exactly (last_ts_us, n_events) — two longs, O(1) regardless of
    * volume or stream lifetime. Update semantics: each batch emits
    * the new scalars for users it touched; the consumer keeps the
    * latest row per user and bins idle days against the global max
    * at read time (the batch op's broadcast-anchor step). */
  def churnStateStream(userTs: Dataset[(Long, Long)])
      : Dataset[(Long, Long, Long)] = {
    val sq = userTs.sparkSession
    import sq.implicits._
    userTs.groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), (Long, Long, Long)](
        GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)],
         state: GroupState[(Long, Long)]) =>
          val (lastUs, n) = state.getOption.getOrElse((Long.MinValue, 0L))
          var hi = lastUs; var cnt = n
          rows.foreach { case (_, us) => if (us > hi) hi = us; cnt += 1 }
          state.update((hi, cnt))
          (user, hi, cnt)
      }
  }

  /** e21's STREAM MODE: per-user activity profile with open-hour
    * state. State per user = (closed-hour summary: n_hours, max_n,
    * n_events) + the OPEN cells of the trailing `horizonHours` —
    * hours older than that fold irrevocably into the summary, so
    * state is O(horizon), not O(lifetime). Exact vs batch whenever
    * no event arrives more than `horizonHours` behind its user's max
    * (the watermark contract; e22 is the gauge that sizes it).
    * Emits the user's full updated profile per batch (update
    * semantics): (user, n_active_hours, max_per_hour, n_events). */
  def activityProfileStream(userHours: Dataset[(Long, Long)],
      horizonHours: Int = 24): Dataset[(Long, Long, Long, Long)] = {
    val sq = userHours.sparkSession
    import sq.implicits._
    // state: closed-hour summary (n_hours, max_n, n_events) + open cells
    userHours.groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long, Map[Long, Long]), (Long, Long, Long, Long)](
        GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)],
         state: GroupState[(Long, Long, Long, Map[Long, Long])]) =>
          val (cH, cMax, cN, open0) =
            state.getOption.getOrElse((0L, 0L, 0L, Map.empty[Long, Long]))
          val open = rows.foldLeft(open0) { case (m, (_, h)) =>
            m.updated(h, m.getOrElse(h, 0L) + 1L)
          }
          val hi = open.keys.max
          val (close, keep) = open.partition { case (h, _) =>
            (hi - h) / 3600000L >= horizonHours }
          val st = (cH + close.size, (cMax +: close.values.toSeq).max,
            cN + close.values.sum, keep)
          state.update(st)
          (user, st._1 + keep.size, (st._2 +: keep.values.toSeq).max,
            st._3 + keep.values.sum)
      }
  }

  /** e34's STREAM MODE: open-interval peak concurrency. Input is the
    * closed session intervals (startUs, endUs) ordered by start (the
    * watermark contract — and all the points of one timestamp arrive
    * in one batch, so per-instant netting matches the batch sweep).
    * State is the sweep line's O(open intervals) residue: the current
    * concurrency, the PENDING end points — ends later than the last
    * processed start stay open across batch boundaries, which is
    * exactly the open-interval split the spec exercises — and the
    * per-day peak map. An interval with startUs == Long.MaxValue is
    * the flush marker (remaining ends sweep out; nothing is counted).
    * A global running count is serial by definition; the scale path
    * is range-sharding by day with the batch operator's carry
    * decomposition seeding each shard — this stream form is the
    * per-shard kernel. Emits the full updated (day_us, peak) map per
    * batch (update semantics). */
  def peakConcurrencyStream(intervals: Dataset[(Long, Long)])
      : Dataset[(Long, Long)] = {
    val sq = intervals.sparkSession
    import sq.implicits._
    val DayUs = 86400000000L
    intervals.groupByKey(_ => 0)
      .flatMapGroupsWithState[(Long, List[Long], Map[Long, Long]), (Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: Int, rows: Iterator[(Long, Long)],
         state: GroupState[(Long, List[Long], Map[Long, Long])]) =>
          var (conc, pend, peaks) = state.getOption
            .getOrElse((0L, List.empty[Long], Map.empty[Long, Long]))
          val batch = rows.toArray
          val flush = batch.exists(_._1 == Long.MaxValue)
          val starts = batch.filter(_._1 != Long.MaxValue).sortBy(x => (x._1, x._2))
          // one net step of the sweep at instant ts: a day's peak is
          // max(carry at first touch, running concurrency after each
          // netted instant) — the batch greatest(carry, carry+max_run)
          def applyTs(ts: Long, net: Long): Unit = {
            val d = Math.floorDiv(ts, DayUs)
            val floor = peaks.getOrElse(d, conc)
            conc += net
            peaks = peaks.updated(d, math.max(floor, conc))
          }
          // apply pending ends with ts < upTo, netted per instant
          def drainEnds(upTo: Long): Unit =
            while (pend.nonEmpty && pend.head < upTo) {
              val ts = pend.head
              var k = 0L
              while (pend.nonEmpty && pend.head == ts) { k += 1; pend = pend.tail }
              applyTs(ts, -k)
            }
          var i = 0
          while (i < starts.length) {
            val s = starts(i)._1
            var k = 0L
            val newEnds = scala.collection.mutable.ArrayBuffer.empty[Long]
            while (i < starts.length && starts(i)._1 == s) {
              k += 1; newEnds += starts(i)._2; i += 1
            }
            drainEnds(s)
            // ends at exactly this instant net WITH the starts
            var m = 0L
            while (pend.nonEmpty && pend.head == s) { m += 1; pend = pend.tail }
            applyTs(s, k - m)
            pend = (pend ++ newEnds).sorted
          }
          if (flush) drainEnds(Long.MaxValue)
          state.update((conc, pend, peaks))
          peaks.iterator.map { case (d, p) => (d * DayUs, p) }
      }
  }

  /** e36's STREAM MODE: live bot-cadence triage. Per-user state is
    * O(horizon): the bounded per-type counter map (|event types| is
    * a small vocabulary), one last-timestamp long, the running
    * min-gap/max-per-minute scalars, and open minute cells — cells
    * older than `horizonMinutes` behind the newest fold into two
    * longs (count + max), the e21 fold discipline, so a user's state
    * never grows with lifetime. Contract: per-user timestamps arrive
    * non-decreasing across batches (the e21/e22 watermark contract);
    * within a batch rows are sorted before folding. Emits the full
    * updated profile per batch (update semantics): (user, n_events,
    * active_minutes, max_per_min, min_gap_us, top_type_ppm) — the
    * exact e36 row shape, which BotStreamSpec pins against the batch
    * operator. */
  def botScoreStream(events: Dataset[(Long, Long, String)],
      horizonMinutes: Int = 60): Dataset[(Long, Long, Long, Long, Long, Long)] = {
    val sq = events.sparkSession
    import sq.implicits._
    // state: (nEvents, lastUs, minGap, closedMinutes, closedMax,
    // typeCounts, openCells)
    events.groupByKey(_._1)
      .mapGroupsWithState[
        (Long, Long, Long, Long, Long, Map[String, Long], Map[Long, Long]),
        (Long, Long, Long, Long, Long, Long)](
        GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, String)],
         state: GroupState[(Long, Long, Long, Long, Long,
           Map[String, Long], Map[Long, Long])]) =>
          var (n, last, minGap, cMin, cMax, types, open) =
            state.getOption.getOrElse(
              (0L, Long.MinValue, Long.MaxValue, 0L, 0L,
                Map.empty[String, Long], Map.empty[Long, Long]))
          rows.toSeq.sortBy(_._2).foreach { case (_, us, tp) =>
            if (us >= last) {
              if (last != Long.MinValue && us - last < minGap) minGap = us - last
              last = us
              n += 1
              types = types.updated(tp, types.getOrElse(tp, 0L) + 1L)
              val m = us - (us % 60000000L)
              open = open.updated(m, open.getOrElse(m, 0L) + 1L)
            }
          }
          if (open.nonEmpty) {
            val hi = open.keys.max
            val (close, keep) = open.partition { case (m, _) =>
              (hi - m) / 60000000L >= horizonMinutes }
            cMin += close.size
            if (close.nonEmpty) cMax = math.max(cMax, close.values.max)
            open = keep
          }
          state.update((n, last, minGap, cMin, cMax, types, open))
          val maxPerMin = math.max(cMax, if (open.isEmpty) 0L else open.values.max)
          val top = if (types.isEmpty) 0L else types.values.max
          (user, n, cMin + open.size, maxPerMin,
            if (minGap == Long.MaxValue) -1L else minGap,
            if (n == 0L) 0L else top * 1000000L / n)
      }
  }

  /** e32's STREAM MODE: per-user streak maintenance with O(1) state
    * — five longs per user (last_day, current_len, longest, n_days,
    * n_streaks), regardless of history length. Contract: days
    * arrive NON-DECREASING per user (the e21/e22 watermark
    * contract); a repeat of the held day is idempotent, a day
    * older than the held one is late and ignored (state never
    * regresses). Within a batch days are sorted before folding, so
    * any intra-batch order is fine. Emits the user's full updated
    * streak summary per batch (update semantics): (user, n_days,
    * n_streaks, longest) — the exact e32 row shape, which
    * StreakStreamSpec pins against the batch gaps-and-islands. */
  def streakStateStream(userDays: Dataset[(Long, Long)])
      : Dataset[(Long, Long, Long, Long)] = {
    val sq = userDays.sparkSession
    import sq.implicits._
    userDays.groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long, Long, Long), (Long, Long, Long, Long)](
        GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)],
         state: GroupState[(Long, Long, Long, Long, Long)]) =>
          var (last, cur, longest, nDays, nStreaks) =
            state.getOption.getOrElse((Long.MinValue, 0L, 0L, 0L, 0L))
          rows.map(_._2).toSeq.distinct.sorted.foreach { d =>
            if (d > last) {
              if (d == last + 1) cur += 1
              else { nStreaks += 1; cur = 1 }
              last = d; nDays += 1
              if (cur > longest) longest = cur
            }
          }
          state.update((last, cur, longest, nDays, nStreaks))
          (user, nDays, nStreaks, longest)
      }
  }

  /** e39's STREAM MODE: day-over-day value drift as running state.
    * Input rows are (event_type, epoch_day, cents); key = event_type.
    * State per type is the PREVIOUS day's (day, n, p50) — three longs
    * — plus the one OPEN day's cents histogram (distinct values of a
    * single day, freed at day close): cross-day state is O(1) per
    * type, exactly the lag-shape e39's batch window computes. A row
    * for a NEW day closes the open day (its drift row becomes final);
    * the open day re-emits a refreshed provisional row per batch
    * (update mode, last write per (type, day) wins), so the final
    * snapshot needs no end-of-stream sentinel. A late row older than
    * the open day is DROPPED (beyond-watermark late data — the e32
    * convention: state never regresses); stream ≡ batch holds for
    * day-ordered delivery, which a daily-rollup pipeline has by
    * construction. p50 is percentile_disc(0.5): sorted index
    * ceil(n/2)−1 (QuantileConventionSpec pins this against both
    * engines). Output: (type, day, n, sum_cents, p50, n_delta,
    * p50_drift_cents) for every day with a present predecessor. */
  def valueDriftStream(typed: Dataset[(String, Long, Long)])
      : Dataset[(String, Long, Long, Long, Long, Long, Long)] = {
    val sq = typed.sparkSession
    import sq.implicits._
    // state: (prevDay, prevN, prevP50, curDay, hist); out: 7-tuple row
    type O = (String, Long, Long, Long, Long, Long, Long)
    def p50Of(hist: Map[Long, Long]): Long = {
      val n = hist.valuesIterator.sum
      val target = (n + 1) / 2  // ceil(n/2), 1-based rank of percentile_disc(0.5)
      var cum = 0L
      for ((v, c) <- hist.toSeq.sortBy(_._1)) {
        cum += c
        if (cum >= target) return v
      }
      throw new IllegalStateException("empty histogram")
    }
    def driftRow(tpe: String, day: Long, hist: Map[Long, Long],
        prevDay: Long, prevN: Long, prevP50: Long): Option[O] =
      if (prevDay == Long.MinValue) None
      else {
        val n = hist.valuesIterator.sum
        val s = hist.iterator.map { case (v, c) => v * c }.sum
        val p = p50Of(hist)
        Some((tpe, day, n, s, p, n - prevN, p - prevP50))
      }
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Long, Map[Long, Long]),
          (String, Long, Long, Long, Long, Long, Long)](
          OutputMode.Update, GroupStateTimeout.NoTimeout()) {
        (tpe: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[(Long, Long, Long, Long, Map[Long, Long])]) =>
          var (prevDay, prevN, prevP50, curDay, hist) =
            state.getOption.getOrElse(
              (Long.MinValue, 0L, 0L, Long.MinValue, Map.empty[Long, Long]))
          val out = scala.collection.mutable.ArrayBuffer.empty[O]
          rows.toSeq.sortBy(_._2).foreach { case (_, day, cents) =>
            if (curDay == Long.MinValue) { curDay = day; hist = Map(cents -> 1L) }
            else if (day == curDay)
              hist = hist.updated(cents, hist.getOrElse(cents, 0L) + 1L)
            else if (day > curDay) {
              // close the open day: its drift row is final
              driftRow(tpe, curDay, hist, prevDay, prevN, prevP50).foreach(out += _)
              prevDay = curDay; prevN = hist.valuesIterator.sum; prevP50 = p50Of(hist)
              curDay = day; hist = Map(cents -> 1L)
            }
            // else: late beyond the open day — dropped, state never regresses
          }
          if (curDay != Long.MinValue)
            driftRow(tpe, curDay, hist, prevDay, prevN, prevP50).foreach(out += _)
          state.update((prevDay, prevN, prevP50, curDay, hist))
          out.iterator
      }
  }

  /** e40's STREAM MODE: SCD2 point-in-time enrichment as running
    * state — the stream-side temporal join every feature pipeline
    * runs against a changing dimension. Input is the UNIFIED event
    * stream (user_id, ts_us, event_id, event_type, cents): purchases
    * ARE the dimension changelog (the e37 convention), everything
    * else is a fact to enrich. State per user is THREE scalars — the
    * open version's (version, valid_from_us, cents) — O(1) however
    * long the history, because under event-time-ordered delivery
    * (the e39 convention; a daily/ordered replay has it by
    * construction) a fact only ever needs the LATEST version.
    * Within a batch rows sort by (ts, purchase-first, event_id), so
    * a fact at exactly valid_from sees that version and same-instant
    * purchases resolve to the higher event_id — bit-for-bit e40's
    * batch as-of semantics (Scd2LookupStreamSpec pins stream ≡
    * batch on real events split across a version boundary). A LATE
    * fact (older than the open version) is enriched with the
    * newest-known state — its state_age_us goes negative rather
    * than lying about history; downstream filters on it. */
  def scd2LookupStream(rows: Dataset[(Long, Long, Long, String, Long)])
      : Dataset[(Long, Long, Long, String, Long, Long, Long, Boolean)] = {
    val sq = rows.sparkSession
    import sq.implicits._
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long),
          (Long, Long, Long, String, Long, Long, Long, Boolean)](
          OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[(Long, Long, Long, String, Long)],
         state: GroupState[(Long, Long, Long)]) =>
          var (version, validFromUs, cents) =
            state.getOption.getOrElse((0L, Long.MinValue, 0L))
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Long, Long, String, Long, Long, Long, Boolean)]
          it.toSeq
            .sortBy { case (_, ts, eid, tpe, _) =>
              (ts, if (tpe == "purchase") 0 else 1, eid)
            }
            .foreach { case (_, ts, eid, tpe, c) =>
              if (tpe == "purchase") {
                version += 1; validFromUs = ts; cents = c
              } else if (version > 0L) {
                out += ((eid, user, ts, tpe, version, cents,
                  ts - validFromUs, true))
              } else {
                out += ((eid, user, ts, tpe, 0L, 0L, 0L, false))
              }
            }
          state.update((version, validFromUs, cents))
          out.iterator
      }
  }

  /** e30's STREAM MODE: funnel conversion detection as running
    * state — per user TWO scalars (first view's µs, converted flag),
    * O(1) over any history. Emits ONE append row per converting
    * user: (user_id, view_us, purchase_us) at the first purchase at
    * or after their first view; e30's per-dow latency percentiles
    * are a bounded batch aggregate over this conversion stream
    * (FunnelLatencyStreamSpec proves the emitted pair set equals
    * the batch first-view ⋈ first-qualifying-purchase recompute on
    * real events, and that the gated e30 aggregates from it).
    * Within a batch rows sort by (ts, views-first, event ties) so a
    * same-instant view+purchase converts, matching the batch
    * `p.ts >= view_ts` inclusive bound under event-time-ordered
    * delivery (the e39/e40 convention). */
  def funnelLatencyStream(typed: Dataset[(Long, Long, String)])
      : Dataset[(Long, Long, Long)] = {
    val sq = typed.sparkSession
    import sq.implicits._
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Boolean), (Long, Long, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[(Long, Long, String)],
         state: GroupState[(Long, Boolean)]) =>
          var (viewUs, done) = state.getOption.getOrElse((Long.MinValue, false))
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          it.toSeq.sortBy { case (_, ts, tpe) => (ts, if (tpe == "view") 0 else 1) }
            .foreach { case (_, ts, tpe) =>
              if (tpe == "view" && viewUs == Long.MinValue) viewUs = ts
              else if (tpe == "purchase" && !done && viewUs != Long.MinValue &&
                  ts >= viewUs) {
                out += ((user, viewUs, ts)); done = true
              }
            }
          state.update((viewUs, done))
          out.iterator
      }
  }

  /** e18's STREAM MODE: last-touch attribution as running state —
    * per user TWO scalars (last non-purchase touch's type and µs).
    * Each purchase emits ONE append row (event_id, channel, lat_us)
    * attributed to the touch in effect: within the 30-minute
    * lookback (inclusive, e18's batch bound) the touch type wins,
    * else 'direct'; lat_us is Long.MinValue when the user has no
    * prior touch at all (the batch NULL). Within-batch ordering
    * (ts, event_id) reproduces the batch window's strictly-
    * preceding-rows semantics: a same-instant touch with a smaller
    * event_id counts, a larger one does not, and a purchase never
    * becomes a touch. AttributionStreamSpec pins stream ≡ batch
    * per-purchase on real events plus the boundary laws. */
  def attributionStream(typed: Dataset[(Long, Long, Long, String)])
      : Dataset[(Long, String, Long)] = {
    val sq = typed.sparkSession
    import sq.implicits._
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(String, Long), (Long, String, Long)](
          OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[(Long, Long, Long, String)],
         state: GroupState[(String, Long)]) =>
          var (touchType, touchUs) = state.getOption.getOrElse(("", Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]
          it.toSeq.sortBy { case (_, ts, eid, _) => (ts, eid) }
            .foreach { case (_, ts, eid, tpe) =>
              if (tpe == "purchase") {
                if (touchUs == Long.MinValue) out += ((eid, "direct", Long.MinValue))
                else {
                  val lat = ts - touchUs
                  out += ((eid, if (lat <= 1800000000L) touchType else "direct", lat))
                }
              } else { touchType = tpe; touchUs = ts }
            }
          state.update((touchType, touchUs))
          out.iterator
      }
  }

  /** e28's STREAM MODE: per-key latest-state maintenance (the CDC
    * upsert primitive as running state). Input rows are
    * (key, ts, row_id, payload); state per key is exactly the
    * current winning row — O(1) regardless of log volume. Update
    * semantics: a batch that touches a key emits that key's
    * refreshed snapshot row; a LATE arrival older than the held
    * (ts, row_id) version leaves state untouched and re-emits the
    * unchanged winner (idempotent under replay — the law
    * LatestStateStreamSpec pins against the batch max-struct). */
  def latestStateStream(rows: Dataset[(Long, Long, Long, String)])
      : Dataset[(Long, Long, Long, String)] = {
    val sq = rows.sparkSession
    import sq.implicits._
    rows.groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, String), (Long, Long, Long, String)](
        GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[(Long, Long, Long, String)],
         state: GroupState[(Long, Long, String)]) =>
          var best = state.getOption.getOrElse((Long.MinValue, Long.MinValue, ""))
          it.foreach { case (_, ts, id, p) =>
            if (ts > best._1 || (ts == best._1 && id > best._2))
              best = (ts, id, p)
          }
          state.update(best)
          (key, best._1, best._2, best._3)
      }
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
