package graft.streaming

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SCD2 interval laws for e37: per user the versions are 1..n, the
  * intervals are strictly ordered, contiguous (each valid_to equals
  * the successor's valid_from) and non-overlapping, and EXACTLY one
  * version is current, closed by the 9999-12-31 sentinel. */
class Scd2Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("intervals are contiguous, versions dense, exactly one current") {
    val rows = EventOps.e37Scd2(spark, dir).collect()
    assert(rows.nonEmpty)
    val sentinel = java.sql.Timestamp.valueOf("9999-12-31 00:00:00")
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val vs = rs.sortBy(_.getAs[Long]("version"))
      assert(vs.map(_.getAs[Long]("version")).sameElements(1L to vs.length),
        s"user $u: dense version sequence")
      vs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("valid_to") ==
            b.getAs[java.sql.Timestamp]("valid_from"),
            s"user $u: contiguous intervals")
        case _ =>
      }
      vs.foreach { r =>
        assert(r.getAs[java.sql.Timestamp]("valid_from")
          .before(r.getAs[java.sql.Timestamp]("valid_to")),
          s"user $u: non-empty interval")
      }
      val current = vs.filter(_.getAs[Boolean]("is_current"))
      assert(current.length == 1, s"user $u: exactly one current version")
      assert(current.head.getAs[java.sql.Timestamp]("valid_to") == sentinel)
      assert(current.head.getAs[Long]("version") == vs.length,
        s"user $u: the current version is the last one")
    }
  }
}
