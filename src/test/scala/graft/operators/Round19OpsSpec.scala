package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Semantic invariants of the round-19 batch: truss-peel monotonicity,
  * burstiness positivity, gain/clip consistency. */
class Round19OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("g33: the peel trajectory is monotone and starts at the projection") {
    val r = graft.SparkEntry.queries("g33_ktruss")(spark, dir)
      .orderBy(col("round")).collect()
    assert(r.length == 4)
    val counts = r.map(_.getAs[Long]("n_edges"))
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"peeling can only remove edges: ${counts.mkString(",")}")
    val proj = graft.operators.graph.GraphOps.g7Projection(spark, dir).count()
    assert(counts.head == proj, "round 0 must be the raw projection")
    assert(counts.last > 0, "the 4-truss core must be non-empty at this data")
  }

  test("g33: surviving edges all have support >= k-2 (the truss property)") {
    // re-peel by hand and check the invariant the gated trajectory implies
    var edges = graft.operators.graph.GraphOps.g7Projection(spark, dir)
    for (_ <- 1 to 3)
      edges = graft.operators.graph.GraphOps.edgeSupportsOf(edges)
        .filter(col("sup") >= 2).select(col("u"), col("v")).localCheckpoint(true)
    val bad = graft.operators.graph.GraphOps.edgeSupportsOf(edges)
      .filter(col("sup") < 2)
    // after the peel FIXPOINTS, no surviving edge may sit below threshold;
    // if 3 rounds haven't converged this asserts the next peel is small
    val stillOver = bad.count()
    val total = edges.count()
    assert(stillOver <= total / 100,
      s"$stillOver of $total surviving edges below threshold — peel far from fixpoint")
  }

  test("t24: burstiness is nonnegative and exactly num/den") {
    val r = graft.SparkEntry.queries("t24_burstiness")(spark, dir)
    assert(r.count() == 20)
    assert(r.filter(col("burst_num") < 0L).isEmpty, "variance cannot be negative")
    assert(r.filter(col("burst_den") <= 0L).isEmpty)
    assert(r.filter(
      col("burstiness") =!= col("burst_num").cast("double") / col("burst_den").cast("double")).isEmpty)
    // the corpus's top words repeat within docs → super-Poisson dispersion
    assert(r.filter(col("burstiness") > 1.0).count() > 0)
  }

  test("m16: gain and clip census agree cross-multiplied") {
    val r = graft.SparkEntry.queries("m16_gain_normalize")(spark, dir)
    assert(r.filter(col("gain_ppm") <= 0L).isEmpty)
    assert(r.filter(col("n_clipped") > col("n")).isEmpty)
    // attenuation (gain ≤ 1) can never clip 8-bit samples
    assert(r.filter(col("gain_ppm") <= 1000000L && col("n_clipped") > 0L).isEmpty)
    // the hot target must make the clip branch live somewhere
    assert(r.agg(sum(col("n_clipped"))).collect()(0).getLong(0) > 0L)
  }
}
