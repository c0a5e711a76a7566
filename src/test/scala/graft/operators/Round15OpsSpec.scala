package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Semantic invariants of the round-15 batch: quartile ordering, census
  * completeness against the branch list, sweep monotonicity, and the
  * residual index's recall edge over the global-bounds SQ index. */
class Round15OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("q46: quartiles are ordered and bracketed by the group's min/max") {
    val r = graft.SparkEntry.queries("q46_percentile_cont")(spark, dir)
    assert(r.filter(col("q1") > col("median") || col("median") > col("q3")).isEmpty)
    val mm = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .groupBy(col("o_orderpriority"))
      .agg(min(col("c")).cast("double").as("lo"), max(col("c")).cast("double").as("hi"))
    assert(r.join(mm, Seq("o_orderpriority"))
      .filter(col("q1") < col("lo") || col("q3") > col("hi")).isEmpty)
  }

  test("g30: census covers exactly the six schema branches and sums to |edges|") {
    val r = graft.SparkEntry.queries("g30_metapath_census")(spark, dir).collect()
    // branch list: cust→order, order→part, part→supp, cust→nation,
    // supp→nation, nation→region (tags 0→1, 1→2, 2→3, 0→4, 3→4, 4→5)
    val want = Set((0L, 1L), (1L, 2L), (2L, 3L), (0L, 4L), (3L, 4L), (4L, 5L))
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSet == want)
    val total = r.map(_.getAs[Long]("n_edges")).sum
    val edges = graft.operators.graph.GraphTables.directed(spark, dir).count()
    assert(total == edges)
  }

  test("d21: a higher threshold never keeps more pairs or docs") {
    val r = graft.SparkEntry.queries("d21_threshold_sweep")(spark, dir)
      .orderBy(col("theta_ppm")).collect()
    val pairs = r.map(_.getAs[Long]("n_pairs"))
    val docs = r.map(_.getAs[Long]("n_docs"))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b })
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b })
    assert(r.forall(x => x.getAs[Long]("n_docs") <= 2 * x.getAs[Long]("n_pairs")))
  }

  test("s36: residual (per-cluster bounds) recall ≥ v8's global-bounds recall") {
    val res = graft.SparkEntry.queries("s36_residual_recall")(spark, dir)
      .agg(sum(col("n_hit")).as("h"), sum(col("n_exact")).as("e")).collect()(0)
    val sq = graft.SparkEntry.queries("s32_sq_recall")(spark, dir)
      .agg(sum(col("n_hit")).as("h"), sum(col("n_exact")).as("e")).collect()(0)
    val (rh, re) = (res.getLong(0), res.getLong(1))
    val (sh, se) = (sq.getLong(0), sq.getLong(1))
    assert(re == se, "same exact ground truth")
    // narrower per-cluster bounds should reconstruct at least as well;
    // allow equality (both can saturate at this scale)
    assert(rh >= sh, s"residual recall $rh/$re fell below global-SQ $sh/$se")
  }
}
