package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Semantic invariants of the round-20 batch (the SDC trio): table
  * geometry, true-cosine bounds, and a LIVE ADC-vs-SDC comparison. */
class Round20OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("v12: the table is the full i<=j half with nonnegative diagonal") {
    val r = graft.SparkEntry.queries("v12_sdc_tables")(spark, dir)
    assert(r.count() == 8L * 16 * 17 / 2, "8 subspaces × C(16,2)+16 entries")
    assert(r.filter(col("ci") > col("cj")).isEmpty)
    // diagonal entries are subspace self-dots = |c_m|² ≥ 0
    assert(r.filter(col("ci") === col("cj") && col("dot") < 0.0).isEmpty)
  }

  test("s39: SDC scores are true cosines of reconstructions") {
    val r = graft.SparkEntry.queries("s39_sdc_knn")(spark, dir)
    assert(r.count() > 0)
    // cosine of two REAL vectors (the reconstructions) obeys Cauchy–Schwarz
    assert(r.filter(abs(col("cosine")) > 1.0 + 1e-9).isEmpty)
    // probes sit OFF the codebook — on-codebook probes quantize
    // losslessly and degenerate the s40 comparison
    assert(r.filter(col("query_id") < 16L).isEmpty)
  }

  test("s40: the ADC-vs-SDC comparison is live, not degenerate") {
    val r = graft.SparkEntry.queries("s40_sdc_recall")(spark, dir)
    assert(r.count() == 10)
    assert(r.filter(col("recall_adc") > 1.0 || col("recall_sdc") > 1.0).isEmpty)
    // both searches must find SOMETHING or the gauge gauges nothing
    val sums = r.agg(sum(col("hit_adc")).as("a"), sum(col("hit_sdc")).as("s"))
      .collect()(0)
    assert(sums.getAs[Long]("a") > 0 && sums.getAs[Long]("s") > 0)
    // NOTE deliberately NOT asserting adc ≥ sdc per query: measured at
    // sf0.01, two probes score HIGHER under SDC (quantization noise
    // can accidentally help) — the textbook inequality is an
    // expectation over queries, not a per-query law.
  }
}
