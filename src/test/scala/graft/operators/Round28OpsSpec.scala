package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariant laws for the s45/s46/d28/q57 batch: beam-search output
  * shape and rank discipline (s45), gauge consistency between the
  * s46 direct-list column and the independently-gated s38 row (the
  * same quantity must come out of both paths), prefix-group
  * accounting vs a direct recount (d28), and gap-count conservation
  * against the orders table (q57). The driver gate proves
  * value-exactness vs DuckDB; these pin cross-operator consistency.
  */
class Round28OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("s45: beam lists are full-rank, self-free, and score-ordered") {
    val rows = similarity.SimilarityOps.s45GraphKnn(spark, dir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 10, "one beam per probe query")
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5),
        s"query $q beam is not exactly ranks 1..5")
      rs.foreach(r => assert(r.getAs[Long]("neighbor_id") != q))
      val byRank = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a >= b, s"query $q cosine not descending")
        case _           =>
      }
    }
  }

  test("s46: the direct-list column equals s38's independently-built gauge") {
    val s46 = similarity.SimilarityOps.s46GraphRecall(spark, dir).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("hit_list")).toMap
    val s38 = similarity.SimilarityOps.s38NndRecall(spark, dir).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("hit_nnd")).toMap
    assert(s46 == s38,
      "s46.hit_list and s38.hit_nnd are the same quantity via different plans")
    similarity.SimilarityOps.s46GraphRecall(spark, dir).collect().foreach { r =>
      assert(r.getAs[Long]("hit_beam") <= r.getAs[Long]("n_exact"))
      val rb = r.getAs[Double]("recall_beam")
      assert(rb >= 0.0 && rb <= 1.0)
    }
  }

  test("d28: prefix groups match a direct recount of duplicated prefixes") {
    val rows = dedup.DedupOps.d28PrefixDup(spark, dir).collect()
    val direct = graft.sources.Tables.load(spark, dir, "documents")
      .select(substring(col("text"), 1, 48).as("p"), col("doc_id"))
      .groupBy(col("p")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).collect()
    assert(rows.length == direct.length, "one row per duplicated prefix")
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      direct.map(_.getAs[Long]("n")).sum)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 2L)
      assert(r.getAs[Long]("keep_doc") < r.getAs[Long]("max_doc"))
      assert(r.getAs[Long]("n_sources") >= 1L)
      assert(r.getAs[Long]("n_sources") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q57: gap counts conserve orders minus first-orders") {
    val rows = Relational.q57ReorderGaps(spark, dir).collect()
    val orders = graft.sources.Tables.load(spark, dir, "orders")
    val nOrders = orders.count()
    val nBuyers = orders.select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_gaps")).sum == nOrders - nBuyers,
      "every non-first order contributes exactly one gap")
    rows.foreach { r =>
      assert(r.getAs[Long]("p50_days") <= r.getAs[Long]("p90_days"))
      assert(r.getAs[Long]("p50_days") >= 0L)
      assert(r.getAs[Long]("sum_days") >= 0L)
    }
  }
}
