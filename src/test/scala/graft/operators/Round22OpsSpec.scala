package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Semantic invariants of the round-22 batch: AMS error band and
  * RFM code laws. */
class Round22OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("q50: the AMS estimate lands inside a 2x band and err_ppm is exact") {
    val r = graft.SparkEntry.queries("q50_f2_sketch")(spark, dir).collect()(0)
    val (ex, est, err) = (r.getAs[Long]("exact_f2"), r.getAs[Long]("est_f2"),
      r.getAs[Long]("err_ppm"))
    assert(ex > 0 && est > 0)
    // rel-σ ≈ √(2/64) ≈ 18%; a fixed deterministic hash landing outside
    // ±100% would mean the sign hash regressed to the affine failure
    assert(math.abs(err) < 1000000L, s"estimate off by ${err / 10000.0}%")
    val expected = math.signum((est - ex).toDouble).toLong *
      (math.abs(est - ex) * 1000000L / ex)
    assert(err == expected, "err_ppm must be the exact signed ratio")
  }

  test("e26: RFM codes are quintile codes and the composite is positional") {
    val r = graft.SparkEntry.queries("e26_rfm")(spark, dir)
    for (c <- Seq("r_code", "f_code", "m_code"))
      assert(r.filter(col(c) < 1L || col(c) > 5L).isEmpty, s"$c out of 1..5")
    assert(r.filter(
      col("rfm_code") =!= col("r_code") * 100 + col("f_code") * 10 + col("m_code")).isEmpty)
    // the coding must actually discriminate — all-constant codes would
    // mean the thresholds collapsed
    assert(r.select(col("f_code")).distinct().count() > 1)
    assert(r.select(col("m_code")).distinct().count() > 1)
    // monotone: sort by n_events, codes must be non-decreasing
    val byF = r.orderBy(col("n_events")).select(col("f_code")).collect().map(_.getLong(0))
    assert(byF.zip(byF.tail).forall { case (a, b) => b >= a },
      "f_code must be monotone in n_events")
  }
}
