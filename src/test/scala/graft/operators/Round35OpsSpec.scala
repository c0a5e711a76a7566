package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariant laws for the q64/t36/v15 batch: the duplicate-invoice
  * histogram must reproduce from a brute-force pair recount (q64),
  * the confusion matrix must conserve the corpus and its ppm columns
  * must be true marginal ratios (t36), and both distortion columns
  * must equal a driver-side requantization, with 8-bit codes never
  * losing to 1-bit codes (v15). */
class Round35OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("q64: gap histogram reproduces from a brute-force pair recount") {
    val rows = Relational.q64DupInvoices(spark, dir).collect()
    val os = graft.sources.Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"),
        to_date(col("o_orderdate")).cast("string")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2) / 100000,
        java.time.LocalDate.parse(r.getString(3))))
    val pairs = for {
      a <- os; b <- os
      if a._2 == b._2 && a._3 == b._3 && a._1 < b._1
    } yield (a._2, math.abs(java.time.temporal.ChronoUnit.DAYS.between(a._4, b._4)))
    def bucket(g: Long) =
      if (g == 0) "a_same_day" else if (g <= 7) "b_within_week"
      else if (g <= 30) "c_within_month" else if (g <= 90) "d_within_quarter"
      else "e_later"
    val byB = pairs.groupBy(p => bucket(p._2))
    assert(rows.map(_.getAs[String]("gap_bucket")).toSet == byB.keySet)
    assert(pairs.nonEmpty, "the screen must fire at gate scale")
    rows.foreach { r =>
      val ps = byB(r.getAs[String]("gap_bucket"))
      assert(r.getAs[Long]("n_pairs") == ps.length)
      assert(r.getAs[Long]("n_customers") == ps.map(_._1).distinct.length)
      assert(r.getAs[Long]("min_gap") == ps.map(_._2).min)
      assert(r.getAs[Long]("max_gap") == ps.map(_._2).max)
    }
  }

  test("t36: confusion matrix conserves the corpus; ppm are true ratios") {
    val rows = text.TextOps.t36LangConfusion(spark, dir).collect()
    val nDocs = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n")).sum == nDocs,
      "every document lands in exactly one cell")
    val goldTot = rows.groupBy(_.getAs[String]("gold"))
      .map { case (g, rs) => g -> rs.map(_.getAs[Long]("n")).sum }
    val predTot = rows.groupBy(_.getAs[String]("pred"))
      .map { case (p, rs) => p -> rs.map(_.getAs[Long]("n")).sum }
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("recall_ppm") ==
        n * 1000000L / goldTot(r.getAs[String]("gold")))
      assert(r.getAs[Long]("precision_ppm") ==
        n * 1000000L / predTot(r.getAs[String]("pred")))
    }
    // the heuristic must beat chance on its own training signal: the
    // diagonal carries more mass than any single off-diagonal cell
    val diag = rows.filter(r => r.getAs[String]("gold") == r.getAs[String]("pred"))
      .map(_.getAs[Long]("n")).sum
    val offMax = rows.filter(r => r.getAs[String]("gold") != r.getAs[String]("pred"))
      .map(_.getAs[Long]("n")).max
    assert(diag > offMax)
  }

  test("v15: distortion equals a driver requantization; 8-bit beats 1-bit") {
    val rows = vector.VectorOps.v15QuantDistortion(spark, dir).collect()
    val e = graft.sources.Tables.load(spark, dir, "embeddings").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    assert(rows.length == e.size)
    rows.foreach { r =>
      val vd = e(r.getAs[Long]("vec_id"))
      val energy = vd.foldLeft(0.0)((a, x) => a + x * x)
      val s8 = 127.0 / vd.map(math.abs).max
      // Spark/DuckDB round() is half-away-from-zero, NOT math.round's
      // floor(x+0.5) — they differ on negative halves
      def rnd(x: Double) = BigDecimal(x)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble
      val sse8 = vd.foldLeft(0.0)((a, x) =>
        a + (x - rnd(x * s8) / s8) * (x - rnd(x * s8) / s8))
      val sm = vd.foldLeft(0.0)((a, x) => a + math.abs(x)) / 64.0
      val sses = vd.foldLeft(0.0)((a, x) => {
        val xh = if (x > 0) sm else -sm; a + (x - xh) * (x - xh)
      })
      val i8 = r.getAs[Long]("int8_err_ppm")
      val sg = r.getAs[Long]("sign_err_ppm")
      // driver fold order matches the engine fold order, so the floor
      // can differ by at most one ulp-induced unit
      assert(math.abs(i8 - math.floor(sse8 * 1e6 / energy)) <= 1, s"$r")
      assert(math.abs(sg - math.floor(sses * 1e6 / energy)) <= 1, s"$r")
      assert(i8 <= sg, "8 bits/dim cannot distort more than 1 bit/dim")
    }
  }
}
