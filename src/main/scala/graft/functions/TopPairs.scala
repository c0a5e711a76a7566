package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate pair (field order = the aggregator's input
  * struct shape: struct(cosine, vec_a, vec_b)). */
case class ScoredPair(cosine: Double, vec_a: Long, vec_b: Long)

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

/** Bounded mergeable top-k aggregate over scored pairs.
  *
  * Buffer = the k best pairs seen, in a sorted set; merge = union +
  * trim. This is what replaces the `row_number() OVER (PARTITION BY
  * group ORDER BY …)` window for per-group top-k at scale: the window
  * sorts EVERY candidate row of a group (unbounded memory/spill as
  * candidate volume grows), while this aggregate keeps O(k) state per
  * group, combines map-side, and shuffles only k·P pre-trimmed rows.
  * Deterministic: the result depends only on the input SET (total
  * order via the id tie-break), so the window-based DuckDB oracle is
  * exact. Output is rank-ordered (best first).
  */
class TopPairsAggregator(k: Int)
    extends Aggregator[ScoredPair, java.util.TreeSet[ScoredPair], Seq[ScoredPair]] {

  override def zero: java.util.TreeSet[ScoredPair] =
    new java.util.TreeSet[ScoredPair](ScoredPairOrdering)

  override def reduce(
      b: java.util.TreeSet[ScoredPair], p: ScoredPair): java.util.TreeSet[ScoredPair] = {
    if (b.size < k || ScoredPairOrdering.compare(p, b.last) < 0) {
      b.add(p)
      if (b.size > k) b.pollLast()
    }
    b
  }

  override def merge(
      a: java.util.TreeSet[ScoredPair],
      b: java.util.TreeSet[ScoredPair]): java.util.TreeSet[ScoredPair] = {
    a.addAll(b)
    while (a.size > k) a.pollLast()
    a
  }

  override def finish(b: java.util.TreeSet[ScoredPair]): Seq[ScoredPair] = {
    val out = Seq.newBuilder[ScoredPair]
    val it = b.iterator()
    while (it.hasNext) out += it.next()
    out.result()
  }

  override def bufferEncoder: Encoder[java.util.TreeSet[ScoredPair]] =
    Encoders.kryo[java.util.TreeSet[ScoredPair]]

  override def outputEncoder: Encoder[Seq[ScoredPair]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredPair]]()
}
