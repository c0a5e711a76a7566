package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Semantic invariants of the round-16 batch: KMV union dominance and
  * inclusion–exclusion, strength mass conservation, and patch-dup
  * signature bounds. */
class Round16OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("q47: union estimate dominates both sides; intersection is I–E exact") {
    val r = graft.SparkEntry.queries("q47_sketch_algebra")(spark, dir).collect()(0)
    val (a, b, u, i) = (r.getAs[Long]("est_a"), r.getAs[Long]("est_b"),
      r.getAs[Long]("est_union"), r.getAs[Long]("est_intersect"))
    // the union stream's k-th min ≤ each side's k-th min, so the union
    // estimate can never fall below either side's — a sketch-algebra law
    assert(u >= math.max(a, b), s"union $u below max($a, $b)")
    assert(i == a + b - u, "inclusion–exclusion identity must hold exactly")
    assert(a > 0 && b > 0 && u > 0)
  }

  test("g31: strength mass equals the weighted edge total") {
    val r = graft.SparkEntry.queries("g31_strength_distribution")(spark, dir)
    val mass = r.agg(sum(col("strength") * col("n_nodes"))).collect()(0).getLong(0)
    val total = graft.operators.graph.GraphTables.weightedEdges(spark, dir)
      .agg(sum(col("w"))).collect()(0).getLong(0)
    assert(mass == total, s"Σ strength·n_nodes $mass != Σw $total")
  }

  test("m14: every surfaced signature spans ≥2 docs with enough patches") {
    val r = graft.SparkEntry.queries("m14_patch_dup")(spark, dir)
    assert(r.count() > 0)
    assert(r.filter(col("n_docs") < 2L).isEmpty)
    assert(r.filter(col("n_patches") < col("n_docs")).isEmpty)
    val tops = r.select(col("n_patches")).collect().map(_.getLong(0))
    assert(tops.zip(tops.tail).forall { case (x, y) => x >= y }, "top-50 must sort desc")
  }
}
