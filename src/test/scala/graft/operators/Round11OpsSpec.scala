package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Semantic invariants of the round-11 batch: the skyline two-phase
  * rewrite vs the NOT EXISTS definition, co-purchase support bounds,
  * activity accounting, RLE sanity, and the zero-sum residual law. */
class Round11OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("q42: two-phase skyline ≡ the NOT EXISTS dominance definition") {
    val p = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey").as("k"), col("p_brand").as("brand"),
        (col("p_retailprice").cast("decimal(18,2)") * 100).cast("long").as("cents"),
        col("p_size").cast("long").as("psize"))
    // reference: p survives iff NO q dominates it (q <= on both, < on one)
    val dominated = p.as("x").join(p.as("y"),
        col("y.cents") <= col("x.cents") && col("y.psize") <= col("x.psize")
          && (col("y.cents") < col("x.cents") || col("y.psize") < col("x.psize")),
        "left_semi")
    val want = p.except(dominated).select(col("k"), col("brand"), col("cents"), col("psize"))
    val got = graft.SparkEntry.queries("q42_skyline")(spark, dir)
    assert(got.count() > 0)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("g28: support is bounded by each endpoint's own order count") {
    val got = graft.SparkEntry.queries("g28_copurchase")(spark, dir)
    val perPart = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("po"))
    val v = got
      .join(perPart.select(col("l_partkey").as("part_a"), col("po").as("oa")), Seq("part_a"))
      .join(perPart.select(col("l_partkey").as("part_b"), col("po").as("ob")), Seq("part_b"))
    assert(v.filter(col("n_orders") > least(col("oa"), col("ob"))).isEmpty)
    assert(got.filter(col("part_a") >= col("part_b")).isEmpty)
  }

  test("e21: event accounting and ppm bounds") {
    val r = graft.SparkEntry.queries("e21_activity_profile")(spark, dir)
    val total = r.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == spark.read.parquet(s"$dir/events.parquet").count())
    assert(r.filter(col("peak_ppm") > 1000000L || col("peak_ppm") <= 0L).isEmpty)
    assert(r.filter(col("max_per_hour") > col("n_events")).isEmpty)
    assert(r.filter(col("is_bursty") =!= (col("max_per_hour") >= 3L)).isEmpty)
  }

  test("m12: run accounting — n_runs and max_run bounded by n_chars, hand case exact") {
    val r = graft.SparkEntry.queries("m12_rle_stats")(spark, dir)
    assert(r.filter(col("n_runs") > col("n_chars")).isEmpty)
    assert(r.filter(col("max_run") > col("n_chars")).isEmpty)
    assert(r.filter(col("n_runs") < 1L).isEmpty)
    // hand check one real doc with Scala-side RLE over the same text
    val doc = spark.read.parquet(s"$dir/documents.parquet")
      .orderBy(col("doc_id")).select(col("doc_id"), col("text")).first()
    val runs = doc.getString(1).foldLeft(List.empty[(Char, Int)]) {
      case ((c, n) :: t, ch) if c == ch => (c, n + 1) :: t
      case (acc, ch) => (ch, 1) :: acc
    }
    val row = r.filter(col("doc_id") === doc.getLong(0)).collect()(0)
    assert(row.getAs[Long]("n_runs") == runs.size.toLong)
    assert(row.getAs[Long]("max_run") == runs.map(_._2).max.toLong)
  }

  test("v9: scaled residuals sum to zero per (cluster, dim); codes in [0,255]") {
    val rc = graft.operators.vector.VectorOps.residualCodes(spark, dir)
    val sums = rc.select(col("cluster"), posexplode(col("rvv")).as(Seq("d", "r")))
      .groupBy(col("cluster"), col("d")).agg(sum(col("r")).as("s"))
    assert(sums.filter(col("s") =!= 0L).isEmpty,
      "Σ(n·q − Σq) over a cluster's members must vanish")
    val cr = rc.select(expr("array_min(codes)").as("mn"), expr("array_max(codes)").as("mx"))
    assert(cr.filter(col("mn") < 0 || col("mx") > 255).isEmpty)
  }
}
