package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariant laws for the q68/d32 batch: rank deltas are a
  * permutation bookkeeping identity (they sum to zero over any
  * complete month pair and reproduce from an independent re-rank),
  * and the calibration matrix conserves the d13 pair population with
  * cell means equal to a driver recount. */
class Round38OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("q68: deltas reproduce from an independent re-rank") {
    val rows = Relational.q68TopMovers(spark, dir).collect()
    assert(rows.nonEmpty)
    val li = graft.sources.Tables.load(spark, dir, "lineitem")
      .join(graft.sources.Tables.load(spark, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("m"),
        col("p_brand"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val rev = li.groupBy(t => (t._1, t._2))
      .map { case ((m, b), xs) => (m, b, xs.map(_._3).sum) }
    val rankOf = rev.groupBy(_._1).flatMap { case (m, cells) =>
      cells.toSeq.sortBy(c => (-c._3, c._2)).zipWithIndex
        .map { case ((_, b, _), i) => (m, b) -> (i + 1L) }
    }
    def mi(m: String) = m.take(4).toLong * 12 + m.substring(5).toLong
    rows.foreach { r =>
      val (m, b) = (r.getAs[String]("month"), r.getAs[String]("brand"))
      assert(r.getAs[Long]("rank") == rankOf((m, b)), s"$m/$b rank")
      val prevM = rankOf.keys.find(k => k._2 == b && mi(k._1) == mi(m) - 1)
      assert(prevM.isDefined, s"$m/$b must have a predecessor month")
      assert(r.getAs[Long]("prev_rank") == rankOf(prevM.get))
      assert(r.getAs[Long]("delta") ==
        r.getAs[Long]("prev_rank") - r.getAs[Long]("rank"))
    }
    // permutation identity: when every brand appears in both months,
    // rank deltas over that month-pair sum to zero
    rows.groupBy(_.getAs[String]("month")).foreach { case (m, rs) =>
      val brandsNow = rankOf.keys.filter(_._1 == m).map(_._2).toSet
      val prevMonth = rankOf.keys.map(_._1).filter(pm => mi(pm) == mi(m) - 1)
      val brandsPrev = prevMonth.headOption
        .map(pm => rankOf.keys.filter(_._1 == pm).map(_._2).toSet)
        .getOrElse(Set.empty)
      if (brandsNow == brandsPrev)
        assert(rs.map(_.getAs[Long]("delta")).sum == 0L,
          s"$m: complete-pair deltas must sum to zero")
    }
  }

  test("g47: closure census is consistent with the g21 prediction frame") {
    val rows = graph.GraphOps.g47ClosureByDegree(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_closed") <= r.getAs[Long]("n_pairs"))
      val ppm = r.getAs[Long]("closure_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
      assert(ppm ==
        r.getAs[Long]("n_closed") * 1000000L / r.getAs[Long]("n_pairs"))
      assert(r.getAs[Long]("deg_bin") >= 0L)
    }
    // open wedge pairs are exactly what g21 predicts over (minus its
    // cn >= MinCommon floor): every g21 row is an OPEN pair here, so
    // total open pairs must be >= g21's row count
    val open = rows.map(r => r.getAs[Long]("n_pairs") - r.getAs[Long]("n_closed")).sum
    val g21n = graph.GraphOps.g21CommonNeighbors(spark, dir).count()
    assert(open >= g21n, s"open wedge pairs $open vs g21 rows $g21n")
  }

  test("d32: calibration matrix conserves and means match a recount") {
    val rows = dedup.DedupOps.d32SimCalibration(spark, dir).collect()
    val pairs = dedup.DedupOps.d13MinhashEstimate(spark, dir).collect()
      .map(r => (r.getAs[Long]("est_ppm"), r.getAs[Long]("exact_ppm"),
        r.getAs[Long]("err_ppm")))
    assert(rows.map(_.getAs[Long]("n_pairs")).sum == pairs.length,
      "every d13 pair lands in exactly one cell")
    rows.foreach { r =>
      val (eb, td) = (r.getAs[Long]("est_bin"), r.getAs[Long]("true_decile"))
      assert(eb >= 0 && eb <= 15 && td >= 0 && td <= 9)
      val cell = pairs.filter(p =>
        math.min(15L, p._1 * 16 / 1000000) == eb &&
          math.min(9L, p._2 * 10 / 1000000) == td)
      assert(r.getAs[Long]("n_pairs") == cell.length)
      val s = cell.map(_._3).sum
      val mean = math.signum(s) * (math.abs(s) / cell.length)
      assert(r.getAs[Long]("mean_err_ppm") == mean, s"cell ($eb,$td) mean")
    }
  }
}
