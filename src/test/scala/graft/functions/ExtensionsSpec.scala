package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The cluster deployment path: a session configured ONLY with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (no direct
  * registerAll call) must expose the native functions to SQL and run
  * the HOF→native rewrite — what a pure-SQL user on a shared cluster
  * gets from spark-defaults.conf alone. */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions injects functions and the rewrite rule") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-spec")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // function resolves with no registerAll call in this session
      val r = spark.sql(
        "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").collect()
      assert(r(0).getDouble(0) == 11.0)
      // the optimizer rule rewrites the interpreted fold to the native
      // expression for SQL users
      val plan = spark.sql(
        """SELECT aggregate(zip_with(a, b, (u, v) -> u*v),
          |  cast(0.0 as double), (acc, x) -> acc + x) AS hof
          |FROM (SELECT transform(sequence(1, 4), d -> cast(id + d as double)) AS a,
          |             transform(sequence(1, 4), d -> cast(id * d as double)) AS b
          |      FROM range(10))""".stripMargin)
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("graft_dot"), s"rewrite rule must fire via extensions:\n$plan")
    } finally spark.stop()
  }
}
