package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.dedup.DedupOps

/** Streaming incremental dedup — d9's warm-start loop run as a
  * structured stream: documents arrive in micro-batches, each batch
  * PROBES the persisted band index for near-dup pairs (corpus×new ∪
  * new×new within the batch), hands the Jaccard-verified pairs to
  * the sink, then folds its own band/shingle rows into the index so
  * every LATER batch dedups against it too. After any prefix of
  * batches, the pairs emitted so far are exactly the pairs of the
  * full-corpus batch dedup that involve at least one streamed doc —
  * StreamingDedupSpec pins that equivalence across two batches.
  *
  * Scale posture: per batch the work is d9's probe — the persisted
  * side stays bucketed (exchange-free, never re-shuffled, never
  * rebuilt), the batch side is micro-batch-sized, and the index grows
  * by appending files into bucket lanes. State lives entirely in the
  * bucketed tables, not in executor memory, so a year-long stream
  * holds no more executor state than its current batch.
  *
  * Delivery is foreachBatch's at-least-once: a replayed batch would
  * re-emit its pairs (and re-append its rows — the bucket cap and
  * the pair `distinct()` make that benign for candidates, but an
  * exactly-once sink should dedup on (doc_a, doc_b), which is the
  * pair's natural key).
  */
object StreamingDedup {

  /** `docsStream` must be documents-shaped (doc_id, text), doc_ids
    * disjoint from the corpus the index at `name` was built from. */
  def dedupStream(spark: SparkSession, docsStream: DataFrame, name: String)(
      sink: DataFrame => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    docsStream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(DedupOps.dedupNewShard(spark, batch, name))
        DedupOps.appendToDedupIndex(spark, batch, name)
      }
}
