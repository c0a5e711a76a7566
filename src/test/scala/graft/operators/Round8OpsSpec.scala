package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession
import graft.operators.graph.GraphOps
import graft.operators.similarity.SimilarityOps
import graft.operators.text.TextOps

/** Semantic invariants of the round-8 batch beyond the row-hash gate:
  * the Bloom filter's no-false-negative law, assortativity on hand
  * graphs with known mixing, the kNN-classifier vote conventions, and
  * the winnowing guarantee (window coverage + shared fingerprints on
  * overlapping docs). */
class Round8OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("q37: every member key passes the Bloom filter (no false negatives)") {
    import spark.implicits._
    val keys = (1L to 400L by 2).toDF("k")
    val probes = (1L to 800L).toDF("k")
    val v = Relational.bloomVerdictOf(keys, probes).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), !r.isNullAt(2))).toMap
    assert(v.size == 800)
    val falseNeg = v.collect { case (k, (pass, true)) if !pass => k }
    assert(falseNeg.isEmpty, s"member keys rejected: $falseNeg")
    // non-members exist and SOME pass (the measured false-positive
    // branch is live) while others are pruned — both verdicts occur
    val fp = v.count { case (_, (pass, isTrue)) => pass && !isTrue }
    val pruned = v.count { case (_, (pass, isTrue)) => !pass && !isTrue }
    assert(fp > 0 && pruned > 0, s"fp=$fp pruned=$pruned")
  }

  test("g24: star graph is perfectly disassortative, clique perfectly flat") {
    import spark.implicits._
    // K1,3 star: every edge joins deg 3 to deg 1 ⇒ r = −1 exactly.
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L),
      (1L, 0L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val rs = GraphOps.assortativityOf(star).collect()(0)
    assert(rs.getLong(0) == 6L)
    assert(rs.getDouble(1) == -1.0, s"star r = ${rs.getDouble(1)}")
    // K3 triangle: all degrees equal ⇒ zero variance ⇒ NULL (q32's
    // degenerate-group convention, not a divide error).
    val k3 = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    assert(GraphOps.assortativityOf(k3).collect()(0).isNullAt(1))
  }

  test("s27: majority vote wins; ties go to the smaller label") {
    import spark.implicits._
    val neighbors = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),            // labels 7,7,8 → majority 7
      (11L, 4L), (11L, 5L), (11L, 6L), (11L, 7L)) // labels 8,8,9,9 → tie → 8
      .toDF("query_id", "neighbor_id")
    val labels = Seq((1L, 7), (2L, 7), (3L, 8), (4L, 8), (5L, 8),
      (6L, 9), (7L, 9), (10L, 7), (11L, 9)).toDF("vec_id", "label")
    val out = SimilarityOps.knnClassifyOf(neighbors, labels).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out(10L) == ((7, 2L, true)), s"got ${out(10L)}")
    assert(out(11L) == ((8, 2L, false)), s"tie must pick smaller label: ${out(11L)}")
  }

  test("t17: every window covered; overlapping docs share a fingerprint") {
    import spark.implicits._
    val run = (1 to 20).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma delta $run epsilon zeta"),
      (2L, s"one two three four five six seven $run eight"),
      (3L, "totally different words with no overlap at all here " +
        "and some more filler to pass the span minimum")).toDF("doc_id", "text")
    val sel = TextOps.winnowedOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = sel.groupBy(_._1)
    // coverage: every window of 4 consecutive span positions contains
    // a selected fingerprint position (the winnowing contract)
    for ((doc, rows) <- byDoc) {
      val m = rows.head._2
      val posSet = rows.map { case (_, _, s) => 4194303L - (s % 4194304L) }.toSet
      for (i <- 1L to math.max(1L, m - 3)) {
        assert((i until math.min(i + 4, m + 1)).exists(posSet.contains),
          s"doc $doc window at $i uncovered")
      }
    }
    // guarantee: a shared run of ≥ SpanN+WinW−1 = 11 words ⇒ at least
    // one COMMON selected hash between docs 1 and 2; doc 3 shares none
    def hashes(doc: Long) = byDoc(doc).map { case (_, _, s) => s / 4194304L }.toSet
    assert((hashes(1L) & hashes(2L)).nonEmpty, "overlapping docs share no fingerprint")
    assert((hashes(1L) & hashes(3L)).isEmpty, "disjoint docs share a fingerprint")
  }

  test("s28: cosine to the label SUM classifies like cosine to the mean; ties to smaller label") {
    import spark.implicits._
    // label 1's two training vectors average to direction (1, 1, 0);
    // label 2's single vector points at (0, 0, 1). The n=2 vs n=1
    // asymmetry exercises the no-division identity: a query along
    // (1, 1, 0) must go to label 1 even though label 1's SUM has 2×
    // the magnitude of its mean.
    val train = Seq(
      (100L, 1, Seq(2000000L, 0L, 0L)),
      (101L, 1, Seq(0L, 2000000L, 0L)),
      (102L, 2, Seq(0L, 0L, 1000000L))).toDF("vec_id", "label", "qv")
    val queries = Seq(
      (1L, 1, Seq(1000000L, 1000000L, 0L)),   // along label 1's mean
      (2L, 2, Seq(0L, 0L, 5000000L)),         // along label 2, any magnitude
      (3L, 2, Seq(1000000L, 1000000L, 1414214L))) // near-tie → must not crash
      .toDF("vec_id", "label", "qv")
    val out = SimilarityOps.centroidClassifyOf(queries, train).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getBoolean(3))).toMap
    assert(out(1L) == ((1, true)), s"got ${out(1L)}")
    assert(out(2L) == ((2, true)), s"got ${out(2L)}")
    // an EXACT cosine tie must pick the smaller label deterministically
    val tie = Seq((4L, 2, Seq(1000000L, 0L))).toDF("vec_id", "label", "qv")
    val tieTrain = Seq(
      (200L, 1, Seq(1000000L, 1000000L)),
      (201L, 2, Seq(1000000L, -1000000L))).toDF("vec_id", "label", "qv")
    val tieOut = SimilarityOps.centroidClassifyOf(tie, tieTrain).collect()(0)
    assert(tieOut.getInt(2) == 1, "equal cosines must break to the smaller label")
  }

  test("t17: rollup counts match the selected set and density is bounded") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 60).map(i => s"w${i % 13}x$i").mkString(" ")))
      .toDF("doc_id", "text")
    val sel = TextOps.winnowedOf(docs).collect()
    val roll = TextOps.winnowingOf(docs).collect()(0)
    assert(roll.getLong(1) == sel.head.getLong(1))
    assert(roll.getLong(2) == sel.length.toLong)
    assert(roll.getLong(2) <= roll.getLong(1), "n_fp must not exceed n_spans")
  }
}
