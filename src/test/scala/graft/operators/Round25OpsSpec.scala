package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariant laws for the round-7 closing batch: streak accounting
  * (q52/q53), winsorization bounds (q54), wedge-family consistency
  * (g38/g39), held-out scoring (t28/e31), divergence bounds (t29),
  * seasonality arithmetic (e29/e30), weighted-Jaccard laws (d26) and
  * CAS chunk accounting (m18). The driver gate proves value-exactness
  * vs DuckDB; these pin the internal consistency a refactor could
  * silently break while staying "oracle-matching" on both sides.
  */
class Round25OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("q52: streak accounting laws per customer") {
    val rows = Relational.q52GapsIslands(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, mx, act) = (r.getAs[Long]("n_streaks"),
        r.getAs[Long]("max_streak"), r.getAs[Long]("active_months"))
      assert(n >= 1L && mx >= 1L)
      assert(mx <= act - n + 1, s"max streak too long: $r")
      assert(n <= act, s"more streaks than active months: $r")
    }
  }

  test("q53: cumulative distinct is monotone and closes at the true total") {
    val rows = Relational.q53CumulativeDistinct(spark, dir).collect()
    val cum = rows.map(_.getAs[Long]("cumulative_customers"))
    cum.sliding(2).foreach { case Array(a, b) => assert(b >= a) }
    rows.foreach { r =>
      assert(r.getAs[Long]("new_customers") <= r.getAs[Long]("active_customers"))
      assert(r.getAs[Long]("active_customers") <= r.getAs[Long]("cumulative_customers"))
    }
    val total = graft.sources.Tables.load(spark, dir, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(cum.last == total)
    assert(cum.sum == rows.map(_.getAs[Long]("new_customers")).scanLeft(0L)(_ + _).drop(1).sum)
  }

  test("q54: winsorized mean sits inside the clip bounds; tails clip at most 1%") {
    val rows = Relational.q54Winsorized(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, lo, hi) = (r.getAs[Long]("n"),
        r.getAs[Long]("lo_cents"), r.getAs[Long]("hi_cents"))
      assert(lo <= hi)
      val wm = r.getAs[Long]("wmean_cents")
      assert(wm >= lo && wm <= hi, s"winsorized mean escaped bounds: $r")
      // percentile_disc(0.01) is the smallest value with cum share
      // >= 1%, so strictly-below rows are < 1% of n (and mirrored on
      // the upper tail)
      assert(r.getAs[Long]("n_clip_lo") * 100 <= n, s"lower tail clipped too much: $r")
      assert(r.getAs[Long]("n_clip_hi") * 100 <= n, s"upper tail clipped too much: $r")
    }
  }

  test("g38: closed wedges are exactly 3 triangles and never exceed wedges") {
    val r = graph.GraphOps.g38Transitivity(spark, dir).collect().head
    val (w, t3, cw) = (r.getAs[Long]("n_wedges"),
      r.getAs[Long]("n_triangles"), r.getAs[Long]("closed_wedges"))
    assert(cw == 3 * t3)
    assert(cw <= w, s"more closed wedges than wedges: $r")
    val ppm = r.getAs[Long]("transitivity_ppm")
    assert(ppm >= 0L && ppm <= 1000000L)
  }

  test("g39: same pair set as g21; AA dominates RA per pair (1/log2 >= 1/deg)") {
    val aa = graph.GraphOps.g39AdamicAdar(spark, dir)
    val cnp = graph.GraphOps.g21CommonNeighbors(spark, dir)
    assert(aa.count() == cnp.count())
    assert(aa.join(cnp, Seq("node_a", "node_b"), "left_anti").count() == 0L)
    // every wedge center has deg >= 2, where floor(log2 d) <= d, so
    // the per-wedge AA weight >= the RA weight, summed per pair
    val viol = aa.join(
        graph.GraphOps.g22ResourceAllocation(spark, dir)
          .select(col("node_a"), col("node_b"), col("ra_nano")),
        Seq("node_a", "node_b"))
      .filter(col("aa_nano") < col("ra_nano")).count()
    assert(viol == 0L)
    assert(aa.filter(col("aa_nano") > col("cn") * 1000000000L).count() == 0L)
  }

  test("t28: every scored doc is in the val split with OOV <= bigram count") {
    val rows = text.TextOps.t28LmScore(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(((id % 2147483647L) * 2654435761L) % 2147483647L % 100 >= 90,
        s"train doc leaked into val scoring: $id")
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_bigrams"))
      assert(r.getAs[Long]("lm_score_milli") >= 0L)
    }
  }

  test("t29: one row per unordered source pair; TV bounded by [0, 1e6]") {
    val rows = text.TextOps.t29SourceDivergence(spark, dir).collect()
    val nSources = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("source")).distinct().count()
    assert(rows.length == (nSources * (nSources - 1) / 2).toInt)
    rows.foreach { r =>
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
      val tv = r.getAs[Long]("tv_ppm")
      assert(tv >= 0L && tv <= 1000000L, s"TV out of range: $r")
    }
  }

  test("e29: per-type shares sum to <= 1e6; burst flag matches the ratio") {
    val rows = graft.streaming.EventOps.e29Seasonality(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("how") >= 0L && r.getAs[Long]("how") <= 167L)
      // floor(168x) >= 168*floor(x): the ratio is computed before
      // truncation, so it can only beat 168 * the truncated share
      assert(r.getAs[Long]("ratio_ppm") >= 168L * r.getAs[Long]("share_ppm"))
      assert(r.getAs[Boolean]("is_burst") == (r.getAs[Long]("ratio_ppm") > 2000000L))
    }
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("share_ppm")).sum <= 1000000L)
    }
  }

  test("e30: latency percentiles are ordered within every cohort") {
    val rows = graft.streaming.EventOps.e30FunnelLatency(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, p99, mx) = (r.getAs[Long]("p50_us"), r.getAs[Long]("p90_us"),
        r.getAs[Long]("p99_us"), r.getAs[Long]("max_us"))
      assert(p50 >= 0L && p50 <= p90 && p90 <= p99 && p99 <= mx)
      assert(r.getAs[Long]("dow") >= 0L && r.getAs[Long]("dow") <= 6L)
    }
  }

  test("e31: hits never exceed evals; accuracy is the exact integer ratio") {
    val rows = graft.streaming.EventOps.e31MarkovAccuracy(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (e, h) = (r.getAs[Long]("n_eval"), r.getAs[Long]("n_hit"))
      assert(h <= e)
      assert(r.getAs[Long]("acc_ppm") == h * 1000000L / e)
    }
  }

  test("d26: weighted Jaccard covers exactly d4's verified pairs, bounded") {
    val w = dedup.DedupOps.d26IdfJaccard(spark, dir)
    val jp = dedup.DedupOps.d4NgramJaccard(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    assert(w.count() == jp.count())
    assert(w.join(jp, Seq("doc_a", "doc_b"), "left_anti").count() == 0L)
    assert(w.filter(col("inter_w") > col("union_w")).count() == 0L)
    assert(w.filter(col("wjaccard_ppm") > 1000000L).count() == 0L)
  }

  test("q55: matrix partitions the part population; classes cover A-C x X-Z") {
    val rows = Relational.q55AbcXyz(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    rows.foreach { r =>
      assert(Set("A", "B", "C")(r.getAs[String]("abc")))
      assert(Set("X", "Y", "Z")(r.getAs[String]("xyz")))
      assert(r.getAs[Long]("n_parts") > 0L)
    }
    val nParts = graft.sources.Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_parts")).sum == nParts)
  }

  test("v13: 64 bit rows; skew is exactly |2*ones - n|") {
    val rows = vector.VectorOps.v13BitBalance(spark, dir).collect()
    assert(rows.length == 64)
    val n = rows.head.getAs[Long]("n")
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == n) // every bit sees every vector
      val ones = r.getAs[Long]("ones")
      assert(ones >= 0L && ones <= n)
      assert(r.getAs[Long]("skew") == math.abs(2 * ones - n))
      assert(r.getAs[Long]("ones_ppm") == ones * 1000000L / n)
    }
  }

  test("g40: the second sweep's eccentricity dominates the first") {
    val r = graph.GraphOps.g40PseudoDiameter(spark, dir).collect().head
    val (e1, e2) = (r.getAs[Long]("ecc_seed"), r.getAs[Long]("ecc_far"))
    // dist(seed, far) = ecc_seed, so far's eccentricity is >= it
    assert(e2 >= e1, s"double sweep shrank the bound: $r")
    assert(e1 >= 1L && e2 <= 8L)
    assert(r.getAs[Long]("n_reached_seed") > 1L)
    assert(r.getAs[Long]("n_reached_far") > 1L)
  }

  test("t30: at most 5 contiguous ranks per source, concentration bounded") {
    val rows = text.TextOps.t30DistinctiveTerms(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted
      assert(ranks.length <= 5)
      assert(ranks.toSeq == (1L to ranks.length).toSeq)
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("cnt") <= r.getAs[Long]("total"))
      assert(r.getAs[Long]("total") >= 5L)
      assert(r.getAs[Long]("conc_ppm") <= 1000000L)
    }
  }

  test("m18: chunk accounting laws per source") {
    val rows = multimodal.MultimodalOps.m18ChunkDedup(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dup_chunks") <= r.getAs[Long]("n_chunks"))
      assert(r.getAs[Long]("reclaimable_units") <= r.getAs[Long]("total_units"))
      // a chunk is at most CasChunk units, so totals bound counts
      assert(r.getAs[Long]("total_units") <= 256L * r.getAs[Long]("n_chunks"))
      assert(r.getAs[Long]("total_units") >= r.getAs[Long]("n_chunks"))
    }
  }
}
