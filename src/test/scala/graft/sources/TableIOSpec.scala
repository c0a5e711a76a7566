package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class TableIOSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-io-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def nation = Tables.load(spark, "/root/testdata/sf0.001", "nation")

  test("csv round-trip preserves rows and schema") {
    val path = tmp("graft_csv")
    val src = nation
    TableIO.writeCsv(src, path)
    val back = TableIO.readCsv(spark, path,
      src.schema.toDDL)
    assert(back.schema.fieldNames.toSeq == src.schema.fieldNames.toSeq)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      src.orderBy("n_nationkey").collect().toSeq)
    assert(back.count() == src.count())
  }

  test("json round-trip preserves values") {
    val path = tmp("graft_json")
    val src = nation.select(col("n_nationkey"), col("n_name"))
    TableIO.writeJson(src, path)
    val back = TableIO.readJson(spark, path, "n_nationkey BIGINT, n_name STRING")
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      src.orderBy("n_nationkey").collect().toSeq)
  }

  test("orc round-trip preserves rows and pushes filters to the scan") {
    val path = tmp("graft_orc")
    val src = nation
    TableIO.writeOrc(src, path)
    val back = TableIO.readOrc(spark, path)
    assert(back.schema.fieldNames.toSeq == src.schema.fieldNames.toSeq)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      src.orderBy("n_nationkey").collect().toSeq)
    val filtered = back.filter(col("n_regionkey") === 1)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_regionkey"))
  }

  test("partitioned parquet write prunes partitions on read") {
    val path = tmp("graft_part")
    TableIO.writePartitionedParquet(nation, path, "n_regionkey")
    // one directory per region key
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("n_regionkey=")).sorted
    assert(dirs.length == 5)
    val pruned = TableIO.readParquet(spark, path).filter(col("n_regionkey") === 2)
    // partition filter must appear as a pushed partition predicate, not a data filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("n_regionkey"))
    assert(pruned.count() == nation.filter(col("n_regionkey") === 2).count())
  }

  test("bucketed write: groupBy and self-join on the bucket column need no exchange") {
    val path = tmp("graft_bucketed")
    val customer = Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    TableIO.writeBucketed(customer, "graft_cust_bucketed", path,
      bucketCol = "c_custkey", buckets = 4)
    val back = TableIO.readTable(spark, "graft_cust_bucketed")
    assert(back.count() == customer.count())

    val agg = back.groupBy(col("c_custkey")).agg(sum(col("c_acctbal")))
    agg.collect()
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange"),
      s"bucketed aggregation must not shuffle:\n$aggPlan")

    // disable auto-broadcast so the planner exercises the bucketed
    // path — at real fact-table scale neither side broadcasts anyway
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = back.as("a").join(back.as("b"), Seq("c_custkey"))
      joined.collect()
      val joinPlan = joined.queryExecution.executedPlan.toString
      assert(joinPlan.contains("SortMergeJoin") && !joinPlan.contains("Exchange"),
        s"bucketed co-located join must not shuffle:\n$joinPlan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("compaction shrinks the file count, preserves values, keeps ranges disjoint") {
    import spark.implicits._
    val path = tmp("compact_me")
    val df = (1 to 10000).map(i => (i.toLong, s"row$i")).toDF("k", "v")
    // simulate a streaming sink's accumulation: 50 tiny files
    df.repartition(50).write.mode("overwrite").parquet(path)
    def files(p: String) = new java.io.File(p).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files(path).length == 50)
    val before = spark.read.parquet(path).collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val n = TableIO.compactParquet(spark, path, "k", targetBytes = 40L * 1024)
    val after = files(path)
    assert(after.length == n && n < 50, s"expected < 50 files, got $n")
    val back = spark.read.parquet(path)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet == before,
      "compaction must preserve every row")
    // range layout: per-file [min, max] of the sort column must not overlap,
    // so footer stats keep predicate skipping selective
    val ranges = after.map { f =>
      val d = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("k")), max(col("k"))).collect()(0)
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2,
        s"file ranges overlap: $hi >= $lo2")
      case _ =>
    }
  }
}
