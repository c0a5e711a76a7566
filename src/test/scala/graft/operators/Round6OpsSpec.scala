package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession
import graft.operators.dedup.DedupOps
import graft.operators.similarity.SimilarityOps
import graft.operators.text.TextOps

/** Semantic invariants of the round-6 operators beyond the row-hash
  * gate: the IVF-PQ probe-everything collapse law, recall bounds for
  * the composed index, span-dedup ground truths on synthetic corpora
  * with known overlap, and the mixture sampler's cap/determinism
  * contract. */
class Round6OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("s12: probing every coarse cluster collapses IVF-PQ to the full ADC scan (≡ s10)") {
    // 16 trained centroids exist at most (seeded from vec_id < 16);
    // nprobe = 16 probes them all, so the candidate set is the whole
    // corpus and the result must equal s10 row-for-row — same LUTs,
    // same fold order, same top-k tie-breaks
    val full = SimilarityOps.s12IvfPqWith(spark, dir, nprobe = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val s10 = SimilarityOps.s10PqKnn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(full.nonEmpty)
    assert(full.toSeq == s10.toSeq, "probe-all IVF-PQ must be bit-identical to s10")
  }

  test("s13: composed-index recall is within [0,1] and the restricted probe loses candidates") {
    val rows = SimilarityOps.s13IvfPqRecall(spark, dir).collect()
    assert(rows.length == 10, "one recall row per query")
    rows.foreach { r =>
      val (nExact, nHit, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nExact > 0 && nHit >= 0 && nHit <= nExact)
      assert(recall >= 0.0 && recall <= 1.0)
    }
  }

  test("d10: exact copies are fully duplicated spans, disjoint text is zero") {
    import spark.implicits._
    val a = (1 to 10).map(i => s"alpha$i").mkString(" ")   // 10 words -> 3 spans
    val c = (1 to 10).map(i => s"gamma$i").mkString(" ")   // disjoint vocabulary
    val docs = Seq((1L, a), (2L, a), (3L, c)).toDF("doc_id", "text")
    val out = DedupOps.spanDedupOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((3L, 3L, 1.0)), "copy A: every span duplicated")
    assert(out(2L) == ((3L, 3L, 1.0)), "copy B: every span duplicated")
    assert(out(3L) == ((3L, 0L, 0.0)), "disjoint doc: no span duplicated")
  }

  test("d10: partial overlap counts exactly the shared positional spans") {
    import spark.implicits._
    val words = (1 to 10).map(i => s"w$i")
    val full = words.mkString(" ")                  // 10 words -> spans at i=1,2,3
    val prefix = words.take(9).mkString(" ")        // 9 words  -> spans at i=1,2
    val docs = Seq((1L, full), (2L, prefix)).toDF("doc_id", "text")
    val out = DedupOps.spanDedupOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((3L, 2L)), "full doc shares its first two spans only")
    assert(out(2L) == ((2L, 2L)), "prefix doc is entirely covered")
  }

  test("d10: a doc below SpanN words contributes no spans and is absent") {
    import spark.implicits._
    val docs = Seq((1L, "one two three")).toDF("doc_id", "text")
    assert(DedupOps.spanDedupOf(docs).count() == 0)
  }

  test("t11: sampler caps, keeps uncapped strata whole, and is deterministic") {
    val a = TextOps.t11MixtureSample(spark, dir).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      val (n, ppm, sampled) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ppm >= 1L && ppm <= 1000000L)
      assert(sampled <= n, "cannot sample more than the stratum holds")
      if (ppm == 1000000L)
        assert(sampled == n, "rate 1.0 keeps the whole stratum")
    }
    val b = TextOps.t11MixtureSample(spark, dir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "hash-based sampling is reproducible run-to-run")
  }
}
