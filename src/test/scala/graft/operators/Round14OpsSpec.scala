package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Semantic invariants of the round-14 batch: lift symmetry bounds,
  * recall-curve monotone denominators, cluster-size mass conservation,
  * watermark what-if monotonicity, and patch-grid tiling. */
class Round14OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("q45: support bounds — n_both ≤ min(n_a, n_b); lift positive") {
    val r = graft.SparkEntry.queries("q45_basket_lift")(spark, dir)
    assert(r.count() > 0)
    assert(r.filter(col("n_both") > least(col("n_a"), col("n_b"))).isEmpty)
    assert(r.filter(col("lift_ppm") <= 0L).isEmpty)
  }

  test("s34: the curve's denominator grows with k and recall stays a ppm") {
    val r = graft.SparkEntry.queries("s34_recall_curve")(spark, dir)
      .orderBy(col("k")).collect()
    assert(r.length == 5)
    val nEx = r.map(_.getAs[Long]("n_exact"))
    assert(nEx.zip(nEx.tail).forall { case (a, b) => a <= b })
    assert(r.forall(x => x.getAs[Long]("recall_ppm") >= 0
      && x.getAs[Long]("recall_ppm") <= 1000000L))
    assert(r.forall(x => x.getAs[Long]("n_hit") <= x.getAs[Long]("n_exact")))
  }

  test("d20: cluster mass conservation — Σ(sz · n_clusters) = |corpus|") {
    val r = graft.SparkEntry.queries("d20_cluster_sizes")(spark, dir)
    val mass = r.agg(sum(col("n_docs"))).collect()(0).getLong(0)
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(mass == docs, s"histogram mass $mass != corpus $docs")
    assert(r.filter(col("n_removed") =!= (col("sz") - 1) * col("n_clusters")).isEmpty)
  }

  test("e24: a longer watermark never drops more") {
    val r = graft.SparkEntry.queries("e24_watermark_whatif")(spark, dir)
      .orderBy(col("wm_us")).collect()
    val drops = r.map(_.getAs[Long]("n_dropped"))
    assert(drops.zip(drops.tail).forall { case (a, b) => a >= b })
    assert(r.map(_.getAs[Long]("n_events")).distinct.length == 1)
  }

  test("m13: patches tile without overlap and stay in payload bounds") {
    val r = graft.SparkEntry.queries("m13_grid_patches")(spark, dir)
    assert(r.count() > 0)
    // per doc: 4 cols per row-index, offsets distinct, last patch row fits
    val perDoc = r.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n"), countDistinct(col("off")).as("no"),
      max(col("pr")).as("maxpr"), max(col("off")).as("maxoff"))
    assert(perDoc.filter(col("n") =!= col("no")).isEmpty)
    assert(perDoc.filter(col("n") =!= (col("maxpr") + 1) * 4).isEmpty)
    val lens = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
    // last patch's first row (8 bytes from maxoff) must fit in the payload
    assert(perDoc.join(lens, Seq("doc_id"))
      .filter(col("maxoff") + 7 > col("len")).isEmpty)
  }
}
