package graft.util

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

class UtilSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("DfCache: builds once, rebuilds after evict, nested builds allowed") {
    var builds = 0
    def build() = DfCache.cached(spark, "/utilspec", "outer") {
      // nested insert on the same map — the documented reentrancy case
      DfCache.cached(spark, "/utilspec", "inner") { spark.range(3).toDF() }
      builds += 1
      spark.range(5).toDF()
    }
    assert(build().count() == 5 && builds == 1)
    assert(build().count() == 5 && builds == 1, "second call must hit the cache")
    DfCache.evict(spark)
    assert(build().count() == 5 && builds == 2, "evict must force a rebuild")
  }

  test("Buckets.cap: bounded buckets, capped rows are a subset, small buckets intact") {
    // skewed data: key 0 has 500 rows, keys 1..49 have 5 each
    val df = spark.range(500).select(lit(0L).as("k"), col("id").as("v"))
      .union(spark.range(245).select((col("id") % 49 + 1).as("k"), col("id").as("v")))
    val capped = Buckets.cap(df, Seq("k"), max = 100)
    val sizes = capped.groupBy(col("k")).agg(count(lit(1)).as("n"))
    assert(sizes.agg(max(col("n"))).collect()(0).getLong(0) <= 100)
    assert(capped.filter(col("k") === 0).count() == 0, "oversized bucket dropped whole")
    assert(capped.count() == 245, "all small-bucket rows must survive")
    assert(capped.join(df, Seq("k", "v"), "left_anti").count() == 0, "subset of input")
  }
}
