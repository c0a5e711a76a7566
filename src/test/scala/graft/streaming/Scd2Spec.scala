package graft.streaming

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** SCD2 interval laws for e37: per user the versions are 1..n, the
  * intervals are strictly ordered, contiguous (each valid_to equals
  * the successor's valid_from) and non-overlapping, and EXACTLY one
  * version is current — the open one, encoded as valid_to IS NULL
  * (the hash-stable convention that replaced the round-7 9999-12-31
  * sentinel, which was value-correct but overflowed ns-ranged
  * timestamp consumers). */
class Scd2Spec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("intervals are contiguous, versions dense, exactly one current") {
    val rows = EventOps.e37Scd2(spark, dir).collect()
    assert(rows.nonEmpty)
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
      // every CLOSED interval is non-empty; only the last may be open
      vs.foreach { r =>
        val to = r.getAs[java.sql.Timestamp]("valid_to")
        if (to != null)
          assert(r.getAs[java.sql.Timestamp]("valid_from").before(to),
            s"user $u: non-empty interval")
      }
      val current = vs.filter(_.getAs[Boolean]("is_current"))
      assert(current.length == 1, s"user $u: exactly one current version")
      assert(current.head.getAs[java.sql.Timestamp]("valid_to") == null,
        s"user $u: the current version is the open (NULL valid_to) one")
      assert(current.head.getAs[Long]("version") == vs.length,
        s"user $u: the current version is the last one")
      // is_current is exactly the NULL-valid_to predicate
      vs.foreach { r =>
        assert(r.getAs[Boolean]("is_current") ==
          (r.getAs[java.sql.Timestamp]("valid_to") == null),
          s"user $u: is_current mirrors the open interval")
      }
    }
  }
}
