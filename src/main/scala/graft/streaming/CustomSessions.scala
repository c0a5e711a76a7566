package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key session state via `flatMapGroupsWithState` — the
  * escape hatch for session semantics the built-in `session_window`
  * can't express (per-session derived metrics, conditional closes,
  * cross-session carry-over). Here it reimplements the 30-minute-gap
  * session so the driver's gaps-and-islands oracle (shared with e3)
  * gates the custom-state code path itself.
  *
  * Scale notes:
  *  - state per key is ONE open session (constant size); closed
  *    sessions are emitted immediately — state never accumulates.
  *  - in streaming, event-time timeout (watermark + gap) closes idle
  *    sessions, so the state store is pruned exactly like the
  *    built-in operator's.
  *  - the per-invocation sort buffers one key's NEW events for the
  *    micro-batch (bounded per user); sessionization needs per-key
  *    time order, which Spark does not guarantee on the iterator.
  *
  * Money values go through HALF_UP cents (the DECIMAL(18,2) cast both
  * engines apply), so sums are bit-exact against the oracle.
  */
object CustomSessions {

  private val GapMicros: Long = 30L * 60 * 1000000
  private val GapMs: Long = 30L * 60 * 1000

  /** Open-session state: [start, last] bounds + running aggregates. */
  case class SessionState(startUs: Long, lastUs: Long, n: Long, cents: Long)

  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  private def cents(v: Double): Long =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .*(100).toLongExact

  // micro-second-exact Timestamp <-> long conversions (getTime alone
  // truncates to milliseconds; ts carries microseconds)
  private def toUs(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  private def fromUs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def out(user: Long, s: SessionState): SessionOut =
    SessionOut(user, fromUs(s.startUs), fromUs(s.lastUs + GapMicros),
      s.n, s.cents / 100.0)

  /** The state-transition function, shared by batch and streaming. */
  private def sessionize(streaming: Boolean)(user: Long,
      rows: Iterator[(Long, Timestamp, Double)],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val closed = state.getOption.map(out(user, _)).iterator
      state.remove()
      return closed
    }
    val evs = rows.toArray.sortBy(r => (toUs(r._2), r._3))
    var open = state.getOption
    val closed = Seq.newBuilder[SessionOut]
    evs.foreach { case (_, ts, value) =>
      val us = toUs(ts)
      open match {
        // within the gap of EITHER bound (inclusive) → extend. The
        // inclusive bound is deliberate: Spark's built-in
        // session_window merges an event landing EXACTLY `gap` after
        // the previous one (windows [t, t+gap) and [t+gap, t+2gap)
        // touch and are merged), and the e3/e6 gaps-and-islands
        // oracle uses the same `diff > gap` new-session rule — all
        // three semantics agree on every input, including exact-gap
        // events (EventStreamsSpec pins the boundary case).
        case Some(s) if us >= s.startUs - GapMicros && us <= s.lastUs + GapMicros =>
          open = Some(SessionState(math.min(s.startUs, us), math.max(s.lastUs, us),
            s.n + 1, s.cents + cents(value)))
        case Some(s) if us > s.lastUs + GapMicros =>
          closed += out(user, s)
          open = Some(SessionState(us, us, 1, cents(value)))
        case Some(s) =>
          // too-late event, > gap before the open session: emit it as
          // its own closed session (single-open-session state can't
          // retro-merge; bounded approximation for very late data)
          closed += out(user, SessionState(us, us, 1, cents(value)))
        case None =>
          open = Some(SessionState(us, us, 1, cents(value)))
      }
    }
    open match {
      case Some(s) =>
        state.update(s)
        if (streaming) {
          // close when the watermark passes the session's gap horizon;
          // a timeout must sit above the current watermark, so late
          // sessions close at the next possible instant
          val horizon = s.lastUs / 1000 + GapMs
          state.setTimeoutTimestamp(math.max(horizon, state.getCurrentWatermarkMs() + 1))
        }
      case None => ()
    }
    closed.result().iterator
  }

  private def grouped(spark: SparkSession, events: DataFrame) = {
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("ts"), col("value").cast("double"))
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
  }

  /** Batch run: every group processed once, all sessions emitted
    * (flatMapGroupsWithState in batch mode never times out, so the
    * still-open tail session is flushed inside the function by a
    * final sentinel pass — here by emitting it directly). */
  def batchSessions(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    grouped(spark, events)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Timestamp, Double)],
         state: GroupState[SessionState]) =>
          // batch: single invocation per key — flush the open tail too
          val closed = sessionize(streaming = false)(user, rows, state)
          val tail = state.getOption.map(out(user, _))
          state.remove()
          closed ++ tail.iterator
      }.toDF()
  }

  /** Streaming run (append mode): closed sessions stream out as the
    * watermark passes them; the event-time timeout flushes idle keys. */
  def streamingSessions(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    grouped(spark, events.withWatermark("ts", "2 hours"))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionize(streaming = true)).toDF()
  }
}
