package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Semantic invariants of d23's band-tuning table. */
class Round23OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("d23: cost and recall both fall as bands get wider") {
    val r = graft.SparkEntry.queries("d23_band_tuning")(spark, dir)
      .orderBy(col("rows_per_band")).collect()
    assert(r.length == 3)
    val cand = r.map(_.getAs[Long]("n_candidates"))
    assert(cand.zip(cand.tail).forall { case (a, b) => b <= a },
      "wider bands can only drop candidates")
    val curve = r.map(_.getAs[Long]("s_curve_ppm"))
    assert(curve.zip(curve.tail).forall { case (a, b) => b <= a })
    r.foreach { row =>
      assert(row.getAs[Long]("n_caught") <= row.getAs[Long]("n_truth"))
      assert(row.getAs[Long]("recall_ppm") <= 1000000L)
    }
    // truth must be non-empty or the measured column gauges nothing
    assert(r.head.getAs[Long]("n_truth") > 0)
  }

  test("d23: exact-duplicate truth is caught by EVERY config") {
    // identical texts -> identical shingle sets -> identical minhash
    // vectors -> identical band keys under any (b, r) cut; since this
    // corpus's truth pairs are exact copies, recall must be total
    val r = graft.SparkEntry.queries("d23_band_tuning")(spark, dir).collect()
    r.foreach { row =>
      assert(row.getAs[Long]("n_caught") == row.getAs[Long]("n_truth"),
        s"config ${row.getAs[Int]("bands")}x${row.getAs[Int]("rows_per_band")} missed an exact dup")
    }
  }
}
