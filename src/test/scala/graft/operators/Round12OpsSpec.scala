package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Semantic invariants of the round-12 batch: relative-rank laws,
  * kNN-graph mutuality, lateness accounting, purity consistency with
  * t1's language call, and inclusion–exclusion on the generator audit. */
class Round12OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("q43: percent_rank/cume_dist laws hold per customer") {
    val r = graft.SparkEntry.queries("q43_rank_functions")(spark, dir)
    assert(r.filter(col("prank") < 0.0 || col("prank") > 1.0).isEmpty)
    assert(r.filter(col("cdist") <= 0.0 || col("cdist") > 1.0).isEmpty)
    // every partition tops out at cume_dist 1 and bottoms at prank 0
    val per = r.groupBy(col("o_custkey"))
      .agg(max(col("cdist")).as("mc"), min(col("prank")).as("mp"),
        max(col("drank")).as("md"), count(lit(1)).as("n"))
    assert(per.filter(col("mc") =!= 1.0).isEmpty)
    assert(per.filter(col("mp") =!= 0.0).isEmpty)
    assert(per.filter(col("md") > col("n")).isEmpty)
  }

  test("s33: every edge is mutual within rank K and stored once with a < b") {
    val r = graft.SparkEntry.queries("s33_mutual_knn")(spark, dir)
    assert(r.count() > 0)
    assert(r.filter(col("vec_a") >= col("vec_b")).isEmpty)
    assert(r.filter(col("rank_ab") < 1 || col("rank_ab") > 5
      || col("rank_ba") < 1 || col("rank_ba") > 5).isEmpty)
    assert(r.groupBy(col("vec_a"), col("vec_b")).count()
      .filter(col("count") > 1).isEmpty)
  }

  test("e22: lateness accounting over the whole stream") {
    val r = graft.SparkEntry.queries("e22_lateness_audit")(spark, dir)
    val total = r.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == spark.read.parquet(s"$dir/events.parquet").count())
    assert(r.filter(col("n_late") > col("n_events")).isEmpty)
    assert(r.filter(col("max_late_us") > col("total_late_us")).isEmpty)
    // a type with zero late events must report zero total lateness
    assert(r.filter(col("n_late") === 0L && col("total_late_us") =!= 0L).isEmpty)
  }

  test("t21: purity agrees with t1's language call") {
    val p = graft.SparkEntry.queries("t21_lang_purity")(spark, dir)
    val t1 = graft.SparkEntry.queries("t1_lang_id")(spark, dir)
      .select(col("doc_id"), col("pred_lang"))
    val j = p.join(t1, Seq("doc_id"))
    // a decided language implies evidence; the dominant share is ≥ 1/3
    assert(j.filter(col("pred_lang") =!= "unknown" && col("n_hits") === 0L).isEmpty)
    assert(j.filter(col("n_hits") > 0L && col("purity_ppm") < 333333L).isEmpty)
    // full purity can never be flagged mixed
    assert(p.filter(col("purity_ppm") === 1000000L && col("is_mixed")).isEmpty)
  }

  test("d19: inclusion–exclusion on the candidate sets") {
    val r = graft.SparkEntry.queries("d19_candidate_overlap")(spark, dir).collect()(0)
    val (lsh, win, common, union) = (r.getAs[Long]("n_lsh"),
      r.getAs[Long]("n_winnow"), r.getAs[Long]("n_common"), r.getAs[Long]("n_union"))
    assert(common <= math.min(lsh, win))
    assert(union == lsh + win - common)
    // both generators find something at this scale
    assert(lsh > 0 && win > 0)
  }
}
