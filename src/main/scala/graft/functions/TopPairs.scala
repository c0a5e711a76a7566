package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate pair (field order = the aggregator's input
  * struct shape: struct(cosine, vec_a, vec_b)). */
case class ScoredPair(cosine: Double, vec_a: Long, vec_b: Long)

/** One scored neighbor candidate for a query (input shape
  * struct(cosine, neighbor_id)). */
case class ScoredNeighbor(cosine: Double, neighbor_id: Long)

/** Rank order for top-pairs: best = highest cosine, ties broken by
  * ascending (vec_a, vec_b) — identical to
  * `row_number() OVER (ORDER BY cosine DESC, vec_a, vec_b)`. */
object ScoredPairOrdering extends java.util.Comparator[ScoredPair] with Serializable {
  override def compare(p: ScoredPair, q: ScoredPair): Int = {
    val c = java.lang.Double.compare(q.cosine, p.cosine)
    if (c != 0) c
    else {
      val a = java.lang.Long.compare(p.vec_a, q.vec_a)
      if (a != 0) a else java.lang.Long.compare(p.vec_b, q.vec_b)
    }
  }
}

/** Rank order for top-neighbors: highest cosine first, ties broken by
  * ascending neighbor_id — identical to
  * `row_number() OVER (ORDER BY cosine DESC, neighbor_id)`. */
object ScoredNeighborOrdering
    extends java.util.Comparator[ScoredNeighbor] with Serializable {
  override def compare(p: ScoredNeighbor, q: ScoredNeighbor): Int = {
    val c = java.lang.Double.compare(q.cosine, p.cosine)
    if (c != 0) c else java.lang.Long.compare(p.neighbor_id, q.neighbor_id)
  }
}

/** Bounded mergeable top-k aggregate.
  *
  * Buffer = the k best elements seen, in a sorted set; merge = union +
  * trim. This is what replaces the `row_number() OVER (PARTITION BY
  * group ORDER BY …)` window for per-group top-k at scale: the window
  * sorts EVERY candidate row of a group (unbounded memory/spill as
  * candidate volume grows), while this aggregate keeps O(k) state per
  * group, combines map-side, and shuffles only k·P pre-trimmed rows.
  * Deterministic: the result depends only on the input SET (total
  * order via the id tie-break), so the window-based DuckDB oracles are
  * exact. Output is rank-ordered (best first).
  */
abstract class BoundedTopKAggregator[T](k: Int, ord: java.util.Comparator[T])
    extends Aggregator[T, java.util.TreeSet[T], Seq[T]] {

  override def zero: java.util.TreeSet[T] = new java.util.TreeSet[T](ord)

  override def reduce(b: java.util.TreeSet[T], p: T): java.util.TreeSet[T] = {
    if (b.size < k || ord.compare(p, b.last) < 0) {
      b.add(p)
      if (b.size > k) b.pollLast()
    }
    b
  }

  override def merge(
      a: java.util.TreeSet[T], b: java.util.TreeSet[T]): java.util.TreeSet[T] = {
    a.addAll(b)
    while (a.size > k) a.pollLast()
    a
  }

  override def finish(b: java.util.TreeSet[T]): Seq[T] = {
    val out = Seq.newBuilder[T]
    val it = b.iterator()
    while (it.hasNext) out += it.next()
    out.result()
  }

  override def bufferEncoder: Encoder[java.util.TreeSet[T]] =
    Encoders.kryo[java.util.TreeSet[T]]
}

/** Per-group top-k scored PAIRS (s3's per-label most-similar pairs). */
class TopPairsAggregator(k: Int)
    extends BoundedTopKAggregator[ScoredPair](k, ScoredPairOrdering) {
  override def outputEncoder: Encoder[Seq[ScoredPair]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredPair]]()
}

/** Per-query top-k scored NEIGHBORS (the kNN ranking step shared by
  * s1/s2/s4 — replaces the per-query window sort of the full scored
  * candidate set). */
class TopNeighborsAggregator(k: Int)
    extends BoundedTopKAggregator[ScoredNeighbor](k, ScoredNeighborOrdering) {
  override def outputEncoder: Encoder[Seq[ScoredNeighbor]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredNeighbor]]()
}
