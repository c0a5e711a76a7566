package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariant laws for the d27/m19/s44 batch: keeper-policy accounting
  * (d27 rides d6's clusters, so its per-cluster argmax must agree with
  * the fixpoint labels), compressibility dictionary bounds (m19's
  * unigram/bigram counts obey string-combinatorics laws), and the IVF
  * tuning curve (s44 must be monotone in nprobe and consistent with
  * the gated s9 point at the default setting). The driver gate proves
  * value-exactness vs DuckDB; these pin cross-operator consistency a
  * refactor could break while staying oracle-matching on both sides.
  */
class Round26OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("d27: one row per d6 cluster; min-id keeper IS the cluster label") {
    val pol = dedup.DedupOps.d27KeeperPolicies(spark, dir)
    val nClusters = dedup.DedupOps.d6DupClusters(spark, dir)
      .select(col("cluster_id")).distinct().count()
    val rows = pol.collect()
    assert(rows.length.toLong == nClusters)
    rows.foreach { r =>
      assert(r.getAs[Long]("keep_minid") == r.getAs[Long]("cluster_id"),
        s"d6 labels clusters by min doc_id: $r")
      assert(r.getAs[Long]("cluster_size") >= 2L, s"singleton cluster: $r")
    }
  }

  test("d27: longest keeper dominates; differs iff it strictly gains chars") {
    val rows = dedup.DedupOps.d27KeeperPolicies(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val gained = r.getAs[Long]("chars_gained")
      assert(gained >= 0L, s"longest keeper lost chars: $r")
      // tie-break is the smaller doc_id, and keep_minid is the
      // smallest id in the cluster — so an equal-length winner IS the
      // min-id doc, making `differs` equivalent to a strict gain
      assert(r.getAs[Boolean]("differs") == (gained > 0L), s"tie-break drift: $r")
      assert(r.getAs[Long]("longest_chars") >= r.getAs[Long]("minid_chars"))
    }
  }

  test("m19: dictionary counts obey string-combinatorics bounds") {
    val rows = multimodal.MultimodalOps.m19Compressibility(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, u1, u2) = (r.getAs[Long]("n"),
        r.getAs[Long]("uniq1"), r.getAs[Long]("uniq2"))
      assert(u1 >= 1L && u1 <= n)
      assert(u2 >= 1L && u2 <= n - 1, s"more bigrams than positions: $r")
      // only the final character can fail to start a bigram, so the
      // bigram dictionary covers at least uniq1 - 1 distinct starts;
      // and every bigram is a pair over the unigram alphabet
      assert(u2 >= u1 - 1, s"bigram dictionary too small for alphabet: $r")
      assert(u2 <= u1 * u1, s"bigram dictionary exceeds alphabet^2: $r")
      val ppm = r.getAs[Long]("bigram_ratio_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
      assert(ppm == u2 * 1000000L / (n - 1))
    }
  }

  test("s44: recall is monotone in nprobe and anchored to the gated s9 point") {
    val rows = similarity.SimilarityOps.s44NprobeCurve(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 4L, 8L))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_exact"))
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // probing MORE lists can only add candidates — recall never drops
    rows.map(_.getAs[Double]("recall")).sliding(2).foreach {
      case Array(a, b) => assert(b >= a, "recall dropped as nprobe grew")
      case _           =>
    }
    // the default-nprobe point must agree with s9's per-query gauge
    val s9 = similarity.SimilarityOps.s9IvfRecall(spark, dir)
      .agg(sum(col("n_hit")).cast("long")).collect().head.getLong(0)
    val at2 = rows.find(_.getAs[Long]("nprobe") == 2L).get
    assert(at2.getAs[Long]("n_hit") == s9, "s44@nprobe=2 disagrees with s9")
  }
}
