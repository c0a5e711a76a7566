package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession
import graft.operators.graph.GraphOps
import graft.operators.multimodal.MultimodalOps
import graft.operators.text.TextOps
import graft.streaming.EventOps

/** Semantic invariants of the second round-6 operator batch beyond
  * the row-hash gate: the count-min overestimate law, LPA community
  * convergence on graphs with known structure, spike detection with a
  * known anomaly, repetition scores on constructed degenerate text,
  * and aHash equality/filter contracts. */
class Round6bOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("q31: the count-min estimate never undershoots the exact count") {
    val rows = Relational.q31CountMin(spark, dir).collect()
    assert(rows.length == 20, "one row per exact heavy hitter")
    rows.foreach { r =>
      val (exact, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(est >= exact, "CMS collisions add, never subtract")
      assert(over == est - exact)
    }
  }

  test("g17: two disjoint triangles each converge to their min-id community") {
    import spark.implicits._
    def tri(a: Long, b: Long, c: Long) =
      Seq((a, b), (b, a), (b, c), (c, b), (a, c), (c, a))
    val sym = (tri(1, 2, 3) ++ tri(10, 11, 12)).toDF("src", "dst")
    val start = sym.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
    val out = GraphOps.labelPropagation(sym, start, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(out(_) == 1L), "left triangle -> community 1")
    assert(Seq(10L, 11L, 12L).forall(out(_) == 10L), "right triangle -> community 10")
  }

  test("g17: neighbor majority beats smaller label") {
    import spark.implicits._
    // node 99 has three neighbors labeled 7 and one labeled 1: the
    // majority label (7) must win even though 1 is smaller
    val edges = Seq((21L, 99L), (22L, 99L), (23L, 99L), (1L, 99L))
    val sym = (edges ++ edges.map(_.swap)).toDF("src", "dst")
    val start = Seq((21L, 7L), (22L, 7L), (23L, 7L), (1L, 1L), (99L, 99L))
      .toDF("node", "lbl")
    val out = GraphOps.labelPropagation(sym, start, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(99L) == 7L, "count DESC ranks above label ASC")
  }

  test("e11: a spike against flat history is flagged, its echo is not") {
    import spark.implicits._
    // 40 hourly windows of constant 10 with one 100-spike at t=30:
    // flat history has zero variance, so only the spike trips the rule
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val counts = (0 until 40).map { i =>
      ("click", new java.sql.Timestamp(t0.getTime + i * 3600L * 1000),
        if (i == 30) 100L else 10L)
    }.toDF("event_type", "window_start", "c")
    val flagged = EventOps.anomaliesOf(counts).collect()
    assert(flagged.length == 1, "exactly the spike is anomalous")
    assert(flagged.head.getLong(2) == 100L)
  }

  test("e11: windows with under-min history are never flagged") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // an immediate spike at t=5: deviant, but history is too short
    val counts = (0 until 8).map { i =>
      ("view", new java.sql.Timestamp(t0.getTime + i * 3600L * 1000),
        if (i == 5) 1000L else 10L)
    }.toDF("event_type", "window_start", "c")
    assert(EventOps.anomaliesOf(counts).count() == 0)
  }

  test("t12: degenerate repetition scores high, distinct text scores zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam"),             // top_frac 1, dup2 2/3
      (2L, (1 to 10).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextOps.repetitionOf(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(3), r.getDouble(5), r.getBoolean(6))).toMap
    assert(out(1L) == ((1.0, 2.0 / 3.0, false)), "spam doc dropped")
    assert(out(2L) == ((0.1, 0.0, true)), "distinct doc kept")
  }

  test("q32: correlation is bounded and sign-consistent with cov and slope") {
    val rows = Relational.q32Corr(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cov, corr, slope) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(corr >= -1.0 && corr <= 1.0)
      assert(math.signum(cov) == math.signum(corr))
      assert(math.signum(slope) == math.signum(corr))
    }
  }

  test("g18: harmonic twelfths are bounded by reach (each term in [3,12])") {
    import graft.operators.graph.GraphOps
    val rows = GraphOps.g18HarmonicCentrality(spark, dir).collect()
    assert(rows.length == 5, "one row per sampled source")
    rows.foreach { r =>
      val (n, h12, h) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      // every reached node contributes 12/d with d in 1..4
      assert(h12 >= 3 * n && h12 <= 12 * n)
      assert(h == h12.toDouble / 12.0)
    }
  }

  test("s14: one Lloyd round never increases total reconstruction error") {
    import graft.operators.similarity.SimilarityOps
    import graft.operators.vector.VectorOps
    // centroid update (means minimize SSE for a fixed assignment) then
    // re-assignment (argmin minimizes per vector) each weakly decrease
    // total SSE; the 1e-6 slack covers the micro-unit rounding of the
    // trained means
    val seeded = VectorOps.v4PqCodes(spark, dir)
      .agg(sum(col("recon_err"))).collect().head.getDouble(0)
    val trained = SimilarityOps.s14PqTrained(spark, dir)
      .agg(sum(col("recon_err"))).collect().head.getDouble(0)
    assert(trained <= seeded + 1e-6,
      s"Lloyd must not regress: trained $trained vs seeded $seeded")
  }

  test("s15: trained-ADC recall rows are one per query, bounded in [0,1]") {
    import graft.operators.similarity.SimilarityOps
    val rows = SimilarityOps.s15PqTrainedRecall(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (nExact, nHit, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nExact > 0 && nHit >= 0 && nHit <= nExact)
      assert(recall >= 0.0 && recall <= 1.0)
    }
  }

  test("g20: peeling cascades one node per round until only the 3-core clique survives") {
    import spark.implicits._
    // K4 on {1,2,3,4} (the 3-core) plus a pendant chain whose removal
    // cascades: 7 (deg 1) peels round 1, exposing 6 (deg 2) round 2,
    // exposing 5 (deg 2) round 3 — a genuine multi-round peel, not a
    // one-shot degree filter.
    val und = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 1L), (5L, 2L), (5L, 6L), (6L, 3L), (6L, 7L))
    val sym = (und ++ und.map(_.swap)).toDF("src", "dst")
    val core = GraphOps.kcorePeel(sym, k = 3, rounds = 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      "only the K4 survives, each with in-core degree 3")
    // fewer rounds than the cascade depth leaves chain remnants alive
    val shallow = GraphOps.kcorePeel(sym, k = 3, rounds = 1).collect()
    assert(shallow.length > 4, "a 1-round peel has not yet converged")
  }

  test("m5: identical payloads hash identically; short payloads are absent") {
    import spark.implicits._
    val long1 = (0 until 100).map(i => ('a' + i % 26).toChar).mkString
    val long2 = long1.reverse
    val docs = Seq((1L, long1), (2L, long1), (3L, long2), (4L, "short"))
      .toDF("doc_id", "text")
    val h = MultimodalOps.aHashesOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(h.keySet == Set(1L, 2L, 3L), "sub-64-char doc filtered out")
    assert(h(1L) == h(2L), "equal payload -> equal 64-bit hash")
    h.values.foreach { case (lo, hi) =>
      assert(lo >= 0L && lo < (1L << 32) && hi >= 0L && hi < (1L << 32),
        "halves stay in unsigned-32 range")
    }
  }
}
