package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Semantic invariants of the round-18 batch: lag-law growth, mass-
  * conserving reweighting, monotone NN-descent, ternary disjointness. */
class Round18OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("q49: prev_cents is the lag of rev_cents and growth sign matches") {
    val r = graft.SparkEntry.queries("q49_mom_growth")(spark, dir)
      .orderBy(col("month")).collect()
    assert(r.head.isNullAt(r.head.fieldIndex("prev_cents")), "first month has no prior")
    r.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("prev_cents") == a.getAs[Long]("rev_cents"),
        s"lag law broken at ${b.getAs[String]("month")}")
    }
    r.drop(1).foreach { row =>
      val (g, d) = (row.getAs[Long]("growth_ppm"),
        row.getAs[Long]("rev_cents") - row.getAs[Long]("prev_cents"))
      assert(math.signum(g.toDouble) == math.signum(d.toDouble) || d.abs * 1000000 < row.getAs[Long]("prev_cents"),
        s"growth sign mismatch: ppm=$g delta=$d")
    }
  }

  test("d22: reweighting conserves corpus mass exactly") {
    val r = graft.SparkEntry.queries("d22_rep_weights")(spark, dir)
    val total = r.agg(sum(col("weight"))).collect()(0).getLong(0)
    val docs = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(total == docs, s"Σ weight $total != |documents| $docs")
    assert(r.filter(col("weight") < 1L).isEmpty)
    assert(r.filter(col("weight") >= 2L).count() > 0, "dup clusters must surface as weight ≥ 2")
  }

  test("s37: one descent round never worsens any rank's score") {
    val seed = graft.operators.similarity.SimilarityOps
      .lshKnnLists(spark, dir)
      .select(col("query_id"), col("rank"), col("cosine").as("c_seed"))
    val desc = graft.SparkEntry.queries("s37_nn_descent")(spark, dir)
      .select(col("query_id"), col("rank"), col("cosine").as("c_nnd"))
    // seed candidates are a subset of descended candidates, so the
    // k-th best can only rise
    val worse = seed.join(desc, Seq("query_id", "rank"))
      .filter(col("c_nnd") < col("c_seed"))
    assert(worse.isEmpty, "descent must dominate the seed rank-wise")
  }

  test("s38: descent recall dominates seed recall per query") {
    val r = graft.SparkEntry.queries("s38_nnd_recall")(spark, dir)
    assert(r.filter(col("recall_nnd") < col("recall_seed")).isEmpty)
    assert(r.filter(col("recall_nnd") > 1.0).isEmpty)
    assert(r.count() == 10)
  }

  test("v11: ternary codes are a disjoint 3-way split of the 64 dims") {
    val r = graft.SparkEntry.queries("v11_ternary_quantize")(spark, dir)
    assert(r.filter(col("n_pos") + col("n_neg") + col("n_zero") =!= 64L).isEmpty)
    assert(r.filter(
      expr("(pos_lo & neg_lo) != 0 OR (pos_hi & neg_hi) != 0")).isEmpty,
      "a dim cannot be simultaneously positive and negative")
    assert(r.agg(sum(col("n_zero"))).collect()(0).getLong(0) > 0,
      "the zero band must actually fire")
    assert(r.agg(sum(col("n_pos"))).collect()(0).getLong(0) > 0)
    assert(r.agg(sum(col("n_neg"))).collect()(0).getLong(0) > 0)
  }
}
