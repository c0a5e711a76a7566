package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Final KMV summary: number of retained distinct hashes (≤ k) and the
  * k-th smallest (the sketch threshold the estimator divides by). */
case class KmvSummary(k: Long, hk: Long)

/** Mergeable k-minimum-values distinct-count sketch.
  *
  * Buffer = the (up to) k smallest DISTINCT hash values seen, kept in a
  * sorted set; `reduce` inserts and trims, `merge` is union + trim —
  * the defining property of a KMV sketch, and what makes it a real
  * partial aggregate: each partition maintains its own k-min buffer
  * in memory (ObjectHashAggregate keeps it as a live object) and the
  * shuffle moves only k·P pre-combined values, never the full distinct
  * stream. Replaces the `distinct → sort → limit k` formulation, which
  * shuffles every distinct hash (billions of rows at 100 TB) before
  * taking the top-k.
  *
  * Deterministic and engine-independent: the result depends only on the
  * SET of input hashes, not on partitioning or merge order, so the
  * DuckDB oracle (`SELECT DISTINCT … ORDER BY h LIMIT k`) is exact.
  * (ArrayStore.java:27's int[] summaries are the reference's analogous
  * merge-friendly per-round state.)
  */
class KmvAggregator(k: Int)
    extends Aggregator[Long, java.util.TreeSet[java.lang.Long], KmvSummary] {

  override def zero: java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def reduce(
      b: java.util.TreeSet[java.lang.Long], h: Long): java.util.TreeSet[java.lang.Long] = {
    if (b.size < k || h < b.last) {
      b.add(h)
      if (b.size > k) b.pollLast()
    }
    b
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    a.addAll(b)
    while (a.size > k) a.pollLast()
    a
  }

  override def finish(b: java.util.TreeSet[java.lang.Long]): KmvSummary =
    KmvSummary(b.size.toLong, if (b.isEmpty) 0L else b.last.longValue())

  override def bufferEncoder: Encoder[java.util.TreeSet[java.lang.Long]] =
    Encoders.kryo[java.util.TreeSet[java.lang.Long]]

  override def outputEncoder: Encoder[KmvSummary] = Encoders.product[KmvSummary]
}
