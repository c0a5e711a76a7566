package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 additions: the s42 descent-curve laws, the g17/g20 split
  * re-execution laws at spec scale (ScaleTrail re-runs them at sf10),
  * and g33's parquet-round-checkpoint hygiene. */
class Round24OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("s42: recall curve is monotone non-decreasing with constant denominator") {
    val rows = graft.operators.similarity.SimilarityOps
      .s42NndCurve(spark, dir).collect()
    assert(rows.length == 5) // seed + 4 rounds
    val recalls = rows.map(_.getAs[Double]("recall"))
    recalls.sliding(2).foreach { case Array(a, b) =>
      assert(b >= a, s"descent round regressed recall: $a -> $b")
    }
    val denominators = rows.map(_.getAs[Long]("n_exact")).distinct
    assert(denominators.length == 1)
    val hits = rows.map(_.getAs[Long]("n_hit"))
    rows.indices.foreach { i =>
      assert(hits(i) <= denominators.head)
      assert(recalls(i) == hits(i).toDouble / denominators.head)
    }
  }

  test("g17: 3 LPA rounds == 1 round then 2 warm-started rounds (bit-exact)") {
    val (full, split) = graft.operators.graph.GraphOps.g17SplitPair(spark, dir)
    val bad = full.as("a").join(split.as("b"), Seq("node"), "full_outer")
      .filter(!(col("a.lbl") <=> col("b.lbl")))
      .count()
    assert(bad == 0L)
  }

  test("g20: 6 peel rounds == 2 rounds then 4 from the survivor set (bit-exact)") {
    val (full, split) = graft.operators.graph.GraphOps.g20SplitPair(spark, dir)
    val bad = full.as("a").join(split.as("b"), Seq("node_id"), "full_outer")
      .filter(!(col("a.deg_in_core") <=> col("b.deg_in_core")))
      .count()
    assert(bad == 0L)
  }

  test("g35: coreness bounded to the ladder; rung 3 members == g20's core set") {
    val core = graft.operators.graph.GraphOps.g35Coreness(spark, dir).collect()
    assert(core.forall { r =>
      val c = r.getAs[Long]("coreness"); c >= 1L && c <= 4L
    })
    val atLeast3 = core.filter(_.getAs[Long]("coreness") >= 3L)
      .map(_.getAs[Long]("node_id")).toSet
    val g20 = graft.operators.graph.GraphOps.g20Kcore(spark, dir)
      .collect().map(_.getAs[Long]("node_id")).toSet
    assert(atLeast3 == g20,
      s"coreness>=3 set diverges from g20's 3-core: ${atLeast3.size} vs ${g20.size}")
  }

  test("t26: buckets are contiguous from 0 and partition the vocabulary") {
    val rows = graft.operators.text.TextOps.t26ZipfProfile(spark, dir).collect()
    val buckets = rows.map(_.getAs[Long]("rank_bucket"))
    assert(buckets.head == 0L && buckets.toSeq == (0L until buckets.length).toSeq)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_count") <= r.getAs[Long]("max_count"))
      assert(r.getAs[Long]("n_words") > 0L)
    }
    // bucket b covers ranks [2^b, 2^(b+1)) — so except the tail
    // bucket, n_words must be exactly the bucket width
    rows.dropRight(1).zipWithIndex.foreach { case (r, b) =>
      assert(r.getAs[Long]("n_words") == (1L << b),
        s"bucket $b not full: ${r.getAs[Long]("n_words")}")
    }
  }

  test("d24: bloom passes cover every true dup (no false negatives)") {
    val r = graft.operators.dedup.DedupOps
      .d24BloomPrefilter(spark, dir).collect()(0)
    val (nShard, nPass, nTrue, nFp) = (r.getAs[Long]("n_shard"),
      r.getAs[Long]("n_pass_bloom"), r.getAs[Long]("n_true_dup"),
      r.getAs[Long]("n_false_pos"))
    assert(nPass == nTrue + nFp, "passes must split exactly into TP + FP")
    assert(nPass <= nShard && nTrue <= nPass)
  }

  test("q51: grouping_id is the standard bit combination of grouping()") {
    val rows = graft.SparkEntry.queries("q51_grouping_id")(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("gid") ==
        2L * r.getAs[Long]("g_flag") + r.getAs[Long]("g_status"))
    }
    // a cube over 2 columns emits all 4 levels
    assert(rows.map(_.getAs[Long]("gid")).distinct.sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L))
  }

  test("s43: 16 shift rows, all non-negative, members cover the corpus") {
    val rows = graft.operators.similarity.SimilarityOps
      .s43CentroidShift(spark, dir).collect()
    assert(rows.length == 16)
    assert(rows.forall(_.getAs[Double]("shift_scaled") >= 0.0))
    val corpus = graft.operators.similarity.SimilarityOps
      .embQuantized(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_members")).sum == corpus)
  }

  test("t27: contamination bounded to [0, 1e6] ppm and consistent with its parts") {
    val rows = graft.operators.text.TextOps
      .t27SpanContamination(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, c, ppm) = (r.getAs[Long]("n_spans"),
        r.getAs[Long]("n_contaminated"), r.getAs[Long]("contam_ppm"))
      assert(c >= 0L && c <= n)
      assert(ppm == c * 1000000L / n)
    }
  }

  test("e27: active splits into new + returning; cumulative is monotone; day 1 is all-new") {
    val rows = graft.streaming.EventOps.e27NewVsReturning(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("active_users") ==
        r.getAs[Long]("new_users") + r.getAs[Long]("returning_users"))
      assert(r.getAs[Long]("returning_users") >= 0L)
    }
    assert(rows.head.getAs[Long]("returning_users") == 0L,
      "the first day has no one to return")
    val cums = rows.map(_.getAs[Long]("cumulative_users"))
    cums.sliding(2).foreach { case Array(a, b) => assert(b >= a) }
  }

  test("m17: reclaim never exceeds total; keeper accounting is consistent") {
    val rows = graft.operators.multimodal.MultimodalOps
      .m17DedupReclaim(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dup_blobs") <= r.getAs[Long]("n_blobs"))
      assert(r.getAs[Long]("reclaimable_bytes") <= r.getAs[Long]("total_bytes"))
    }
  }

  test("g36: the size histogram's node mass equals the node count") {
    val rows = graft.operators.graph.GraphOps
      .g36ComponentSizes(spark, dir).collect()
    val v = graft.operators.graph.GraphOps.g1Degree(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == v)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_nodes") ==
        r.getAs[Long]("component_size") * r.getAs[Long]("n_components"))
    }
  }

  test("plan pins: d24 bloom bits broadcast; new ops never cartesian/nested-loop") {
    def planOf(name: String): String = {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    val d24 = planOf("d24_bloom_prefilter")
    assert(d24.contains("BroadcastHashJoin"),
      "the bloom word table must broadcast into the probe scan")
    for (q <- Seq("d24_bloom_prefilter", "g35_coreness", "t26_zipf_profile",
        "m17_dedup_reclaim", "e27_new_vs_returning", "t27_span_contamination")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q must stay on equi-joins")
    }
  }

  test("e28: snapshot keys are unique; versions sum to the log size") {
    val rows = graft.streaming.EventOps.e28LatestState(spark, dir).collect()
    val users = rows.map(_.getAs[Long]("user_id"))
    assert(users.distinct.length == users.length, "one snapshot row per key")
    val logSize = graft.sources.Tables.load(spark, dir, "events").count()
    assert(rows.map(_.getAs[Long]("n_versions")).sum == logSize)
  }

  test("g37: mixing-matrix edge mass equals the canonical edge count") {
    val rows = graft.operators.graph.GraphOps.g37JointDegree(spark, dir).collect()
    rows.foreach(r =>
      assert(r.getAs[Long]("bin_lo") <= r.getAs[Long]("bin_hi")))
    val canon = graft.operators.graph.GraphOps.g1Degree(spark, dir)
      .agg(org.apache.spark.sql.functions.sum(col("degree"))).collect()(0).getLong(0) / 2
    assert(rows.map(_.getAs[Long]("n_edges")).sum == canon)
  }

  test("d25: bins confined to [0,10]; mass ≥ the verified-pair count") {
    val rows = graft.operators.dedup.DedupOps.d25SimHistogram(spark, dir).collect()
    rows.foreach { r =>
      val b = r.getAs[Long]("sim_bin")
      assert(b >= 0L && b <= 10L)
    }
    val verified = graft.operators.dedup.DedupOps.d4NgramJaccard(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum >= verified,
      "the histogram covers at least every pair that verified")
  }

  test("g33: every peel round's parquet checkpoint is deleted by completion") {
    graft.operators.graph.GraphOps.g33Ktruss(spark, dir).collect()
    val dirKey = dir.replaceAll("[^A-Za-z0-9]", "_")
    val base = new java.io.File(
      s"${graft.operators.graph.GraphOps.checkpointRoot(spark)}/graft_ckpt_g33_$dirKey")
    val rounds = Option(base.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("round_"))
    assert(rounds.isEmpty,
      s"retired peel rounds left on scratch: ${rounds.map(_.getName).mkString(",")}")
  }
}
