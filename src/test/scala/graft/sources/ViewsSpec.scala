package graft.sources

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** The pure-SQL entry point: raw + derived tables as temp views, native
  * functions available, served from the same session caches. */
class ViewsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("register exposes raw and derived tables to SQL with native functions") {
    Views.register(spark, dir)
    assert(spark.sql("SELECT count(*) FROM graft_lineitem").collect()(0).getLong(0) > 0)
    // derived edge table: degree query straight from SQL
    val deg = spark.sql(
      """SELECT src, count(*) AS d FROM graft_graph_edges
        |GROUP BY src ORDER BY d DESC LIMIT 1""".stripMargin).collect()
    assert(deg.length == 1 && deg(0).getLong(1) > 0)
    // native expression over a derived view
    val dot = spark.sql(
      """SELECT graft_dot(vd, vd) AS n2 FROM graft_emb_features LIMIT 1""").collect()
    assert(dot(0).getDouble(0) > 0.0)
    // the view reads the SAME cached plan the operator API uses
    val viaApi = graft.operators.graph.GraphTables.sym(spark, dir).count()
    val viaSql = spark.sql("SELECT count(*) FROM graft_graph_edges").collect()(0).getLong(0)
    assert(viaApi == viaSql)
  }
}
