package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** e11's stream mode: the trailing-window z-score rule as a SINGLE
  * stateful operator — `flatMapGroupsWithState` keyed by event_type
  * holding (open hour-buckets, last-24 finalized counts). A windowed
  * aggregation feeding a downstream flatMapGroupsWithState is not a
  * supported stateful chain, so the operator owns its own bucketing:
  * events increment open buckets; buckets FINALIZE (in hour order)
  * when the watermark passes their end, at which point the batch rule
  * runs against the trailing history — the same integer algebra as
  * [[EventOps.anomaliesOf]], so the spec can compare row-for-row.
  *
  * State per type is bounded by construction: ≤ (watermark delay /
  * 1h + 1) open buckets + 24 history longs — independent of event
  * volume, the flatMapGroupsWithState analog of a watermark-bounded
  * window aggregate. Event-time timeouts flush types that stop
  * receiving events (a silent type still finalizes its open buckets
  * — exactly the window an anomaly detector most wants to see).
  */
object AnomalyStream {
  val Hist = 24
  val MinHist = 12
  val Z2 = 9
  val HourMs: Long = 3600L * 1000

  case class St(open: Map[Long, Long], hist: List[(Long, Long)])
  case class AnomalyRow(event_type: String, window_start: Timestamp,
      n_events: Long, hist_n: Long, dev2: Long, var_num: Long)

  /** One group invocation: fold new events into open buckets,
    * finalize watermark-passed buckets in hour order, emit rule hits.
    * Runs identically on a data batch and on a timeout firing (empty
    * `rows`). */
  def detect(key: String, rows: Iterator[(String, Timestamp)],
      state: GroupState[St]): Iterator[AnomalyRow] = {
    val st0 = state.getOption.getOrElse(St(Map.empty, Nil))
    var open = st0.open
    rows.foreach { case (_, ts) =>
      val ms = ts.getTime
      val h = ms - java.lang.Math.floorMod(ms, HourMs)
      open = open.updated(h, open.getOrElse(h, 0L) + 1L)
    }
    val wm = state.getCurrentWatermarkMs()
    val (closed, stillOpen) = open.partition { case (h, _) => h + HourMs <= wm }
    var hist = st0.hist
    val out = List.newBuilder[AnomalyRow]
    closed.toSeq.sortBy(_._1).foreach { case (h, c) =>
      val n = hist.size.toLong
      if (n >= MinHist) {
        val s = hist.iterator.map(_._2).sum
        val ssq = hist.iterator.map(x => x._2 * x._2).sum
        val dev = n * c - s
        val varNum = n * ssq - s * s
        if (dev * dev > Z2 * varNum)
          out += AnomalyRow(key, new Timestamp(h), c, n, dev * dev, varNum)
      }
      hist = (hist :+ ((h, c))).takeRight(Hist)
    }
    state.update(St(stillOpen, hist))
    if (stillOpen.nonEmpty)
      state.setTimeoutTimestamp(stillOpen.keys.min + HourMs)
    out.result().iterator
  }

  /** The streaming query body over a raw (ts, event_type, ...)
    * stream. The typed tuple keeps the watermarked `ts` column alive
    * into the stateful operator (a `.map` to a case class would break
    * watermark tracking — the e6 lesson). */
  def anomalyStream(stream: DataFrame): Dataset[AnomalyRow] = {
    val sp = stream.sparkSession
    import sp.implicits._
    stream.select(col("event_type"), col("ts"))
      .withWatermark("ts", "2 hours")
      .as[(String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout)(detect)
  }
}
