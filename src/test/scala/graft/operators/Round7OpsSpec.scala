package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession
import graft.operators.graph.GraphOps
import graft.operators.similarity.SimilarityOps
import graft.streaming.EventOps

/** Semantic invariants of the round-7 batch beyond the row-hash gate:
  * HITS integer mechanics on a hand graph, the two-stage retrieval
  * collapse law (candidates = everything ⇒ ≡ exact kNN bit-for-bit),
  * and the windowed HLL sketch's micro-batch merge law. */
class Round7OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("g23: HITS hand-graph — exact integer scores, hubs and authorities separate") {
    import spark.implicits._
    // 1 and 2 are pure hubs (out-edges only), 3 and 4 pure authorities;
    // 1 reaches both authorities so it out-ranks 2, 3 has two in-hubs
    // so it out-ranks 4.
    val edges = Seq((1L, 3L), (1L, 4L), (2L, 3L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val out = GraphOps.hitsOf(edges, edges, nodes).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // hand-unrolled 2 rounds of the max-normalized integer iteration
    assert(out(1L) == (1000000L, 0L), s"node 1 got ${out(1L)}")
    assert(out(2L) == (625000L, 0L), s"node 2 got ${out(2L)}")
    assert(out(3L) == (0L, 625000L), s"node 3 got ${out(3L)}")
    assert(out(4L) == (0L, 375000L), s"node 4 got ${out(4L)}")
  }

  test("s23: rerank of the complete candidate set collapses to exact kNN bit-for-bit") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.operators.vector.VectorExprs.embFeatures(spark, dir)
    val allCand = e.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"))
      .crossJoin(e.select(col("vec_id").as("neighbor_id")))
      .filter(col("query_id") =!= col("neighbor_id"))
    val collapsed = SimilarityOps.rerankOf(spark, dir, allCand).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = SimilarityOps.s1KnnBrute(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(exact.nonEmpty && collapsed == exact,
      "stage 2 over every pair must equal the exact baseline to the bit")
  }

  test("e13: window-keyed HLL registers merge across micro-batch splits") {
    val dir = "/root/testdata/sf0.001"
    val items = graft.sources.Tables.load(spark, dir, "events")
      .select(date_trunc("hour", col("ts")).as("grp"), col("user_id").as("k"))
    def regMap(d: org.apache.spark.sql.DataFrame) =
      Relational.hllRegistersOf(d).collect()
        .map(r => (r.get(0).toString, r.getLong(1)) -> r.getInt(2)).toMap
    val whole = regMap(items)
    val left = regMap(items.filter(col("k") % 2 === 0))
    val right = regMap(items.filter(col("k") % 2 === 1))
    val merged = (left.keySet ++ right.keySet).map { key =>
      key -> math.max(left.getOrElse(key, 0), right.getOrElse(key, 0))
    }.toMap
    assert(whole.nonEmpty && merged == whole,
      "per-window registers(A ∪ B) ≡ cellwise-max — the incremental-sink law")
    // and the gated frame covers every hour the stream contains
    val nWindows = EventOps.queries("e13_hll_window")(spark, dir).count()
    val nHours = items.select(col("grp")).distinct().count()
    assert(nWindows == nHours)
  }

  test("s25: probing every cluster collapses trained IVF-PQ to the trained full ADC scan") {
    val dir = "/root/testdata/sf0.001"
    def keyed(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2))).toMap
    val all = keyed(SimilarityOps.s25TrainedIvfPqWith(spark, dir, nprobe = 16))
    val full = keyed(SimilarityOps.pqTrainedKnn(spark, dir))
    assert(all.nonEmpty && all == full,
      "nprobe = #clusters must erase the coarse restriction bit-for-bit")
  }

  test("d14: the cross-source matrix partitions d4's verified pair set") {
    val dir = "/root/testdata/sf0.001"
    val matrix = graft.operators.dedup.DedupOps.d14CrossSourceDup(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nPairs = graft.operators.dedup.DedupOps.d4NgramJaccard(spark, dir).count()
    assert(matrix.map(_._3).sum == nPairs,
      "every verified pair lands in exactly one (source_a, source_b) cell")
    matrix.foreach { case (a, b, _) =>
      assert(a <= b, "pair direction must be normalized (least, greatest)")
    }
  }

  test("q36: RANGE frame equals an independent per-customer interval recompute") {
    val dir = "/root/testdata/sf0.001"
    val rows = Relational.q36RangeFrames(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byCust = rows.groupBy(_._1)
    byCust.take(20).foreach { case (_, os) =>
      os.foreach { case (_, d, _, trail) =>
        val expected = os.filter(o => o._2 >= d - 30 && o._2 <= d).map(_._3).sum
        assert(trail == expected,
          s"trailing-30d sum must include ALL same-day peers (got $trail, want $expected)")
      }
    }
  }

  test("m7: silence counts bound runs; a doc can never be entirely below its own mean") {
    val out = graft.operators.multimodal.MultimodalOps
      .m7SilenceDetect(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (nf, nSilent, maxRun) =>
      assert(maxRun <= nSilent, "longest run can't exceed the silent count")
      assert((nSilent == 0) == (maxRun == 0), "run iff any silent frame")
      assert(nSilent < nf, "at least one frame sits at or above the doc mean")
    }
    assert(out.exists(_._2 > 0), "threshold must be live at gate scale")
  }

  test("t16: discrete percentiles are order statistics and counts cover the corpus") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.text.TextOps.t16LengthPercentiles(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    out.foreach { case (p50, p90, p99, _) =>
      assert(p50 <= p90 && p90 <= p99, "percentiles must be monotone")
    }
    val total = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(out.map(_._4).sum == total, "per-source counts partition the corpus")
  }
}
