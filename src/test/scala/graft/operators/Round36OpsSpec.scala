package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariant laws for the q65/d31 batch: the catalog-growth curve
  * must reproduce from a first-seen recount and end at the full
  * distinct catalog (q65); the cross-detector agreement must equal a
  * pair-set recount over the two cluster outputs (d31). */
class Round36OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("q65: growth curve reproduces from a first-seen recount") {
    val rows = Relational.q65CatalogGrowth(spark, dir).collect()
    val li = graft.sources.Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"),
        date_format(col("l_shipdate"), "yyyy-MM").as("m")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val firstSeen = li.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).min }
    val months = rows.map(_.getAs[String]("month"))
    assert(months.sorted.sameElements(months), "ordered by month")
    assert(months.toSet == li.map(_._2).toSet, "every active month appears")
    var cum = 0L
    rows.foreach { r =>
      val m = r.getAs[String]("month")
      val nNew = firstSeen.count(_._2 == m).toLong
      assert(r.getAs[Long]("n_new") == nNew, s"$m n_new")
      cum += nNew
      assert(r.getAs[Long]("n_catalog") == cum, s"$m n_catalog")
      assert(r.getAs[Long]("n_active") ==
        li.filter(_._2 == m).map(_._1).distinct.length, s"$m n_active")
      assert(r.getAs[Long]("n_new") <= r.getAs[Long]("n_active"))
    }
    assert(cum == firstSeen.size, "the curve ends at the full catalog")
  }

  test("d31: agreement equals a pair-set recount of both clusterings") {
    val row = dedup.DedupOps.d31ClusterAgreement(spark, dir).collect()(0)
    def pairSet(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long)] =
      rows.groupBy(_.getAs[Long]("cluster_id")).values.flatMap { g =>
        val ids = g.map(_.getAs[Long]("doc_id")).sorted
        for (i <- ids.indices; j <- (i + 1) until ids.length)
          yield (ids(i), ids(j))
      }.toSet
    val pa = pairSet(dedup.DedupOps.d6DupClusters(spark, dir).collect())
    val pb = pairSet(dedup.DedupOps.d16WinnowClusters(spark, dir).collect())
    assert(row.getAs[Long]("n_pairs_jaccard") == pa.size)
    assert(row.getAs[Long]("n_pairs_winnow") == pb.size)
    val common = (pa & pb).size.toLong
    assert(row.getAs[Long]("n_common") == common)
    assert(common <= math.min(pa.size, pb.size))
    val union = math.max(pa.size + pb.size - common, 1L)
    assert(row.getAs[Long]("agreement_ppm") == common * 1000000L / union)
    // both detectors hunt the same planted near-dups: they must agree
    // on SOMETHING at gate scale, else a threshold is broken
    assert(common > 0L)
  }
}
