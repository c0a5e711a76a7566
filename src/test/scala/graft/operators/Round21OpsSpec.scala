package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Semantic invariants of the round-21 batch: rich-club geometry,
  * density-sweep monotonicity, stopword filter laws. */
class Round21OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("g34: rich sets shrink with k and density stays a density") {
    val r = graft.SparkEntry.queries("g34_rich_club")(spark, dir)
      .orderBy(col("k")).collect()
    assert(r.length == 7)
    val rich = r.map(_.getAs[Long]("n_rich"))
    assert(rich.zip(rich.tail).forall { case (a, b) => b <= a },
      "raising the degree bar cannot grow the club")
    r.foreach { row =>
      val (nr, nw) = (row.getAs[Long]("n_rich"), row.getAs[Long]("n_within"))
      assert(nw <= nr * (nr - 1) / 2, s"within-edges exceed C($nr,2)")
      if (nr >= 2) assert(row.getAs[Long]("phi_ppm") <= 1000000L)
    }
  }

  test("s41: the ε-graph shrinks monotonically with the radius") {
    val r = graft.SparkEntry.queries("s41_density_sweep")(spark, dir)
      .orderBy(col("theta_ppm")).collect()
    assert(r.length == 6, "every grid point must emit, zero-hit ones included")
    val pairs = r.map(_.getAs[Long]("n_pairs"))
    val vecs = r.map(_.getAs[Long]("n_vecs"))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => b <= a })
    assert(vecs.zip(vecs.tail).forall { case (a, b) => b <= a })
    r.foreach { row =>
      assert(row.getAs[Long]("n_vecs") <= 2 * row.getAs[Long]("n_pairs"),
        "each pair contributes at most two endpoints")
    }
    assert(pairs.head > 0, "the loosest radius must catch something")
  }

  test("t25: every candidate passes both integer filters against the corpus") {
    val r = graft.SparkEntry.queries("t25_stopword_induction")(spark, dir)
    val nd = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(r.count() > 0, "a synthetic corpus with shared vocabulary must induce stopwords")
    assert(r.filter(col("df") * 10 < lit(nd) * 3).isEmpty, "coverage filter must hold")
    assert(r.filter(col("burst_num") * 100 > col("burst_den") * 135).isEmpty,
      "burstiness filter must hold")
    assert(r.filter(col("burst_den") =!= col("total_count") * lit(nd)).isEmpty,
      "burst_den must be N·Σc exactly")
  }
}
