package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.similarity.SimilarityOps
import graft.operators.vector.VectorExprs

/** Laws for the s49 OPQ batch.
  *
  * The rotation R = (1/8)·H·D must be EXACTLY orthonormal — that is
  * what makes s49's recall comparable to s15's (same exact baseline):
  * R·Rᵀ = I holds in integer arithmetic (Σ_d h(a,d)·h(b,d) = 64·δ_ab,
  * the Hadamard row-orthogonality, unchanged by the ±1 diagonal).
  * Numerically, rotating preserves dots/norms to float rounding, and
  * the exact top-K under rotated vectors equals the unrotated top-K.
  */
class Round40OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  // the rotExpr conventions, re-derived independently (0-indexed h,
  // 1-indexed diagonal hash)
  private def h(a: Int, b: Int): Int =
    1 - 2 * (java.lang.Integer.bitCount(a & b) % 2)
  private def dsign(d: Int): Int =
    1 - 2 * ((d.toLong * 2654435761L % 1000003L) % 2L).toInt

  test("s49: the rotation matrix is exactly orthonormal (integer arithmetic)") {
    for (a <- 0 until 64; b <- 0 until 64) {
      val dot = (0 until 64).map(d => h(a, d) * h(b, d) * dsign(d + 1) * dsign(d + 1)).sum
      assert(dot == (if (a == b) 64 else 0), s"rows $a,$b")
    }
  }

  test("s49: Spark's rotated vectors match the matrix product and preserve geometry") {
    val orig = VectorExprs.embFeatures(spark, dir)
      .filter(col("vec_id") < 20).select(col("vec_id"), col("vd"), col("n2"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Double](1).toArray, r.getDouble(2))).toMap
    val rot = graft.sources.Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") < 20)
      .withColumn("vd", expr(VectorExprs.castDoubleExpr))
      .withColumn("vd", expr(VectorExprs.rotExpr))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Double]]("vd").toArray).toMap
    def rotate(x: Array[Double]): Array[Double] =
      Array.tabulate(64)(j =>
        (0 until 64).map(d => h(j, d) * dsign(d + 1) * x(d)).sum / 8.0)
    rot.foreach { case (id, rv) =>
      val want = rotate(orig(id)._1)
      (0 until 64).foreach(j =>
        assert(math.abs(rv(j) - want(j)) < 1e-9, s"vec $id dim $j"))
      // norm preserved to float rounding
      val rn2 = rv.map(x => x * x).sum
      assert(math.abs(rn2 - orig(id)._2) < 1e-6 * math.max(1.0, orig(id)._2))
    }
    // dot products preserved pairwise
    val ids = rot.keys.toSeq.sorted.take(6)
    for (i <- ids; j <- ids if i < j) {
      val d0 = orig(i)._1.zip(orig(j)._1).map { case (a, b) => a * b }.sum
      val dr = rot(i).zip(rot(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(d0 - dr) < 1e-6 * math.max(1.0, math.abs(d0)), s"dot $i,$j")
    }
  }

  test("v16: norm drift sits at float-rounding scale for every vector") {
    val rows = graft.operators.vector.VectorOps.v16RotationCheck(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n2, drift) = (r.getAs[Double]("n2"), r.getAs[Double]("n2_drift"))
      assert(math.abs(drift) <= 1e-9 * math.max(1.0, n2),
        s"vec ${r.getAs[Long]("vec_id")} drift $drift vs n2 $n2")
    }
  }

  test("s49: exact top-K is rotation-invariant and recall rows are sane") {
    // exact kNN over rotated vectors == the s1 exact baseline (the
    // law that makes s49's recall comparable to s15's)
    val exact = SimilarityOps.s1KnnBrute(spark, dir)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val rows = SimilarityOps.s49OpqRecall(spark, dir).collect()
    assert(rows.length == exact.size)
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_exact") == exact(r.getAs[Long]("query_id")).size.toLong)
    }
  }
}
