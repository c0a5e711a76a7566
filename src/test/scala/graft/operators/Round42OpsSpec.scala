package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the t37/e39/d33/s50 batch. */
class Round42OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("t37: complete pair domain, set-algebra bounds, recount") {
    val rows = graft.operators.text.TextOps.t37LangVocabJaccard(spark, dir).collect()
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val vocab = docs.groupBy(_._1).view
      .mapValues(_.flatMap(_._2.split(" ")).filter(_.nonEmpty).toSet).toMap
    val langs = vocab.keys.toSeq.sorted
    assert(rows.length == langs.size * (langs.size - 1) / 2)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("lang_a"), r.getAs[String]("lang_b"))
      val (va, vb) = (vocab(a), vocab(b))
      assert(r.getAs[Long]("va") == va.size.toLong)
      assert(r.getAs[Long]("n_inter") == (va intersect vb).size.toLong)
      assert(r.getAs[Long]("n_union") == (va union vb).size.toLong)
      val j = r.getAs[Long]("jaccard_ppm")
      assert(j >= 0L && j <= 1000000L)
      assert(r.getAs[Long]("n_inter") <= math.min(va.size, vb.size).toLong)
    }
  }

  test("e39: deltas telescope and every type covers days-1 rows") {
    val rows = graft.streaming.EventOps.e39ValueDrift(spark, dir).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    val nDays = graft.sources.Tables.load(spark, dir, "events")
      .select(to_date(col("ts"))).distinct().count()
    byType.foreach { case (tpe, rs) =>
      assert(rs.length.toLong == nDays - 1, s"$tpe rows")
      val sorted = rs.sortBy(_.getAs[String]("day"))
      // telescoping: Σ n_delta = n(last) − n(first day, recovered
      // from the first row's n − its delta)
      val firstN = sorted.head.getAs[Long]("n") - sorted.head.getAs[Long]("n_delta")
      assert(sorted.map(_.getAs[Long]("n_delta")).sum ==
        sorted.last.getAs[Long]("n") - firstN, s"$tpe telescope")
    }
  }

  test("d33: histogram conserves clustered docs; n_sources <= size") {
    val rows = graft.operators.dedup.DedupOps.d33DupSourceMix(spark, dir).collect()
    val clustered = graft.operators.dedup.DedupOps.d6DupClusters(spark, dir).count()
    assert(rows.map(r => r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters")).sum
      == clustered)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sources") >= 1L)
      assert(r.getAs[Long]("n_sources") <= r.getAs[Long]("cluster_size"))
    }
  }

  test("m23: keep is exactly the conjunction of cleared flags; both outcomes occur") {
    val rows = graft.operators.multimodal.MultimodalOps.m23MediaGate(spark, dir).collect()
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .filter(length(col("text")) >= 2).count()
    assert(rows.length.toLong == docs)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("keep") ==
        (!r.getAs[Boolean]("flag_low_entropy") && !r.getAs[Boolean]("flag_size")))
      assert(r.getAs[Boolean]("flag_size") ==
        (r.getAs[Long]("n") < 64L || r.getAs[Long]("n") > 512L))
      assert(r.getAs[Boolean]("flag_low_entropy") ==
        (r.getAs[Long]("bigram_ratio_ppm") < 220000L))
    }
    assert(rows.exists(_.getAs[Boolean]("keep")))
    assert(rows.exists(!_.getAs[Boolean]("keep")))
  }

  test("s50: codes cover the corpus with valid nibbles and non-negative error") {
    import graft.operators.vector.VectorOps.{PqM, PqK}
    val rows = graft.operators.similarity.SimilarityOps.s50OpqCodes(spark, dir).collect()
    val n = graft.sources.Tables.load(spark, dir, "embeddings").count()
    assert(rows.length.toLong == n)
    rows.foreach { r =>
      val code = r.getAs[Long]("pq_code")
      (0 until PqM).foreach { m =>
        assert(((code >> (4 * m)) % PqK) >= 0 && ((code >> (4 * m)) % PqK) < PqK)
      }
      assert(r.getAs[Double]("recon_err") >= 0.0)
    }
  }
}
