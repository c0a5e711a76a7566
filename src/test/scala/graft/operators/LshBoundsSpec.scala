package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession
import graft.operators.vector.VectorExprs

/** Bounds that make the LSH candidate generation scale: every bucket
  * that feeds a pair-enumeration self-join must have ≤ MaxBucket
  * members (worst-case pair volume ≤ MaxBucket²·buckets, linear in
  * corpus size for a growing bucket count — never O(n²)). */
class LshBoundsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("banded vector LSH: capped band buckets are bounded (global and per-label)") {
    val g = VectorExprs.cappedBands(spark, dir)
      .groupBy(col("band"), col("bkey")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    assert(g <= VectorExprs.MaxBucket, s"global band bucket of size $g exceeds cap")
    val l = VectorExprs.cappedBands(spark, dir, perLabel = true)
      .groupBy(col("label"), col("band"), col("bkey")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    assert(l <= VectorExprs.MaxBucket, s"per-label band bucket of size $l exceeds cap")
  }

  test("bands signature: Bands entries, each key within [0, 2^BandBits)") {
    val bad = VectorExprs.embFeatures(spark, dir)
      .filter(size(col("bands")) =!= VectorExprs.Bands ||
        exists(col("bands"), b => b < 0 || b >= (1 << VectorExprs.BandBits)))
      .count()
    assert(bad == 0L)
  }

  test("d3/s3: candidate self-joins are bucket-capped, top-k is an aggregate not a window") {
    val d3 = graft.SparkEntry.queries("d3_simhash")(spark, dir)
    d3.collect()
    val d3Plan = d3.queryExecution.executedPlan.toString
    assert(d3Plan.contains("LeftSemi"), "d3 must cap chunk buckets via semi-join")

    val s3 = graft.SparkEntry.queries("s3_pairwise_topk")(spark, dir)
    s3.collect()
    val s3Plan = s3.queryExecution.executedPlan.toString
    assert(s3Plan.contains("bkey"), "s3 pair join must be LSH-bucketed, not label-wide")
    assert(!s3Plan.contains("Window"), "per-label top-k must be the bounded aggregate")
    assert(s3Plan.contains("ObjectHashAggregate"), "bounded top-k aggregate expected")
  }
}
