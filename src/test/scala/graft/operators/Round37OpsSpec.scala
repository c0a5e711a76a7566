package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariant laws for the q66/s48 batch: the LTV triangle must
  * conserve total revenue and cohort membership with monotone
  * cumulative rows (q66); the MMR overlap gauge must agree with a
  * set recount of the two gated frames, and MMR's first pick (the
  * plain argmax) guarantees n_kept ≥ 1 (s48). */
class Round37OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("q66: triangle conserves revenue and membership; cum is monotone") {
    val rows = Relational.q66CohortLtv(spark, dir).collect()
    val orders = graft.sources.Tables.load(spark, dir, "orders")
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_.getAs[Long]("revenue_cents")).sum == orders.map(_._2).sum,
      "every order's cents land in exactly one cell")
    val nCust = orders.map(_._1).distinct.length.toLong
    val cohortSizes = rows.groupBy(_.getAs[String]("cohort"))
      .map { case (_, rs) => rs.head.getAs[Long]("n_customers") }
    assert(cohortSizes.sum == nCust, "cohorts partition the customers")
    rows.groupBy(_.getAs[String]("cohort")).foreach { case (c, rs) =>
      val o = rs.sortBy(_.getAs[Long]("month_n"))
      assert(o.head.getAs[Long]("month_n") == 0L,
        s"$c: a cohort's first cell is its own month")
      var cum = 0L
      o.foreach { r =>
        assert(r.getAs[Long]("month_n") >= 0L)
        cum += r.getAs[Long]("revenue_cents")
        assert(r.getAs[Long]("cum_cents") == cum, s"$c: running sum")
        assert(r.getAs[Long]("ltv_cents") ==
          cum / r.getAs[Long]("n_customers"), s"$c: LTV division")
      }
    }
  }

  test("q67: shares of one parent sum to ~1e6 with truncation slack only") {
    val rows = Relational.q67ShareOfParent(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("region")).foreach { case (reg, rs) =>
      val s = rs.map(_.getAs[Long]("share_of_region_ppm")).sum
      assert(s <= 1000000L && s >= 1000000L - rs.length,
        s"$reg: nation shares sum to 1e6 up to one ppm per nation, got $s")
      // region share is constant across the region's rows
      assert(rs.map(_.getAs[Long]("region_share_ppm")).distinct.length == 1)
    }
    val regShares = rows.groupBy(_.getAs[String]("region"))
      .map { case (_, rs) => rs.head.getAs[Long]("region_share_ppm") }
    val rsSum = regShares.sum
    assert(rsSum <= 1000000L && rsSum >= 1000000L - regShares.size)
    val total = rows.map(_.getAs[Long]("cents")).sum
    rows.foreach { r =>
      val regTotal = rows.filter(_.getAs[String]("region") == r.getAs[String]("region"))
        .map(_.getAs[Long]("cents")).sum
      assert(r.getAs[Long]("share_of_region_ppm") ==
        r.getAs[Long]("cents") * 1000000L / regTotal)
      assert(r.getAs[Long]("region_share_ppm") == regTotal * 1000000L / total)
    }
  }

  test("s48: overlap equals a set recount; the argmax pick always survives") {
    val rows = similarity.SimilarityOps.s48MmrOverlap(spark, dir).collect()
    assert(rows.length == 10)
    val mmr = similarity.SimilarityOps.s47Mmr(spark, dir).collect()
      .groupBy(_.getAs[Long]("query_id"))
    val exact = similarity.SimilarityOps.s1KnnBrute(spark, dir).collect()
      .groupBy(_.getAs[Long]("query_id"))
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val ms = mmr(q).map(_.getAs[Long]("neighbor_id")).toSet
      val es = exact(q).map(_.getAs[Long]("neighbor_id")).toSet
      val kept = (ms & es).size.toLong
      assert(r.getAs[Long]("n_kept") == kept, s"query $q recount")
      assert(r.getAs[Long]("overlap_ppm") == kept * 1000000L / ms.size)
      // MMR's rank 1 is the plain relevance argmax = exact rank 1
      assert(kept >= 1L, s"query $q: the first pick is shared by definition")
    }
  }
}
