package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariant laws for the v14/d29/q59 batch: code-histogram mass
  * conservation against the corpus (every vector contributes one
  * code per subspace), duplication-rate accounting against d6's
  * cluster membership, and ledger conservation for the running-
  * balance extremes (trough <= 0 or trough <= final <= peak, final
  * equals the unordered delta sum). */
class Round30OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("v14: each subspace's histogram sums to the corpus size") {
    val rows = vector.VectorOps.v14CodeHistogram(spark, dir).collect()
    val nVecs = vector.VectorOps.v4PqCodes(spark, dir).count()
    rows.groupBy(_.getAs[Long]("m")).foreach { case (m, rs) =>
      assert(rs.map(_.getAs[Long]("n_vecs")).sum == nVecs,
        s"subspace $m histogram must cover every vector exactly once")
      rs.foreach { r =>
        val c = r.getAs[Long]("code")
        assert(c >= 0L && c <= 15L)
        assert(r.getAs[Long]("n_vecs") >= 1L, "zero rows never materialize")
      }
    }
    assert(rows.map(_.getAs[Long]("m")).distinct.sorted.toSeq ==
      (0L until vector.VectorOps.PqM.toLong))
  }

  test("d29: length-binned rates reconcile with d6 membership") {
    val rows = dedup.DedupOps.d29DupRateByLength(spark, dir).collect()
    val cl = dedup.DedupOps.d6DupClusters(spark, dir)
    assert(rows.map(_.getAs[Long]("n_clustered")).sum == cl.count())
    assert(rows.map(_.getAs[Long]("n_dropped")).sum ==
      cl.filter(col("doc_id") =!= col("cluster_id")).count())
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      graft.sources.Tables.load(spark, dir, "documents").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dropped") <= r.getAs[Long]("n_clustered"))
      assert(r.getAs[Long]("n_clustered") <= r.getAs[Long]("n_docs"))
      val ppm = r.getAs[Long]("dup_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
    }
  }

  test("q59: ledger extremes bracket the final position") {
    val rows = Relational.q59PartDrawdown(spark, dir).collect()
    assert(rows.nonEmpty)
    val totalMoves = graft.sources.Tables.load(spark, dir, "lineitem").count()
    assert(rows.map(_.getAs[Long]("n_moves")).sum == totalMoves,
      "every lineitem is exactly one ledger movement")
    rows.foreach { r =>
      val (p, t, f) = (r.getAs[Long]("peak"), r.getAs[Long]("trough"),
        r.getAs[Long]("final_qty"))
      assert(t <= p, s"trough above peak: $r")
      assert(t <= f && f <= p, s"final outside [trough, peak]: $r")
    }
    // the running sum ends at the plain unordered sum — spot-check on
    // the heaviest part
    val top = rows.maxBy(_.getAs[Long]("n_moves"))
    val key = top.getAs[Long]("l_partkey")
    val direct = graft.sources.Tables.load(spark, dir, "lineitem")
      .filter(col("l_partkey") === key)
      .agg(sum(when(col("l_returnflag") === "R",
        -col("l_quantity").cast("long"))
        .otherwise(col("l_quantity").cast("long")))).collect().head.getLong(0)
    assert(top.getAs[Long]("final_qty") == direct)
  }
}
