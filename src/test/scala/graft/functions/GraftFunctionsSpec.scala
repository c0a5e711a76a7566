package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Native Catalyst expressions: equivalence with the built-in /
  * higher-order-function formulations they replace, on the SAME
  * engine — bit-exact semantics is what lets callers swap them into
  * oracle-gated plans.
  */
class GraftFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)
  import scala.jdk.CollectionConverters._

  override def afterAll(): Unit = spark.stop()

  private def df(n: Int) = {
    // deterministic pseudo-random doubles via integer hashing
    spark.range(n).selectExpr(
      "transform(sequence(1, 17), d -> cast((id*31 + d)*2654435761 % 1000003 - 500000 as double) / 1000.0) as a",
      "transform(sequence(1, 17), d -> cast((id*37 + d*3)*40503 % 1000003 - 500000 as double) / 1000.0) as b")
  }

  /** Run with the HOF→native rewrite rule removed, so the HOF side
    * really executes as the interpreted fold — with the rule active
    * both columns are graft_dot and the comparison is vacuous. */
  private def withoutRewrite[T](f: => T): T = {
    val saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Seq()
    try f finally spark.experimental.extraOptimizations = saved
  }

  test("graft_dot matches the sequential HOF fold bit-for-bit") {
    withoutRewrite {
      val frame = df(500)
        .selectExpr(
          "graft_dot(a, b) as native",
          "aggregate(zip_with(a, b, (u, v) -> u*v), cast(0.0 as double), (acc, x) -> acc + x) as hof")
      // guard the guard: the HOF side must actually still be the fold
      assert(frame.queryExecution.optimizedPlan.toString.contains("zip_with"),
        "rewrite rule must be disabled for the reference side")
      assert(frame.filter("native != hof").count() == 0)
    }
  }

  test("graft_dot: null input, null element, length mismatch all yield NULL") {
    val out = spark.sql(
      """SELECT graft_dot(cast(null as array<double>), array(1.0d)) AS n,
        |       graft_dot(array(1.0d, 2.0d, 3.0d), array(10.0d, 10.0d)) AS m,
        |       graft_dot(array(1.0d, cast(null as double)), array(1.0d, 2.0d)) AS e,
        |       graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS ok""".stripMargin)
      .collect().head
    assert(out.isNullAt(0))
    assert(out.isNullAt(1), "length mismatch must be NULL, not a truncated product")
    assert(out.isNullAt(2), "null element must be NULL, not zero-filled")
    assert(out.getDouble(3) == 11.0)
  }

  test("graft_sorted_intersect_count matches size(array_intersect) on sorted sets") {
    val rows = spark.range(2000).selectExpr(
        "sort_array(array_distinct(transform(sequence(1, 40), i -> (id*31 + i*i) % 97))) as a",
        "sort_array(array_distinct(transform(sequence(1, 40), i -> (id*17 + i*3) % 97))) as b")
      .selectExpr(
        "graft_sorted_intersect_count(a, b) as native",
        "cast(size(array_intersect(a, b)) as bigint) as builtin")
      .filter("native != builtin")
    assert(rows.count() == 0)
  }

  test("graft_sorted_intersect_count: empty and disjoint inputs") {
    val r = spark.sql(
      """SELECT graft_sorted_intersect_count(array(1L, 2L, 3L), cast(array() as array<bigint>)) AS e,
        |       graft_sorted_intersect_count(array(1L, 3L, 5L), array(2L, 4L, 6L)) AS d,
        |       graft_sorted_intersect_count(array(1L, 2L), array(1L, 2L)) AS f""".stripMargin)
      .collect().head
    assert(r.getLong(0) == 0 && r.getLong(1) == 0 && r.getLong(2) == 2)
  }

  test("optimizer rewrites HOF dot-product patterns to the native expression") {
    val dotDf = df(50).selectExpr(
      "aggregate(zip_with(a, b, (u, v) -> u*v), cast(0.0 as double), (acc, x) -> acc + x) as d")
    val n2Df = df(50).selectExpr(
      "aggregate(a, cast(0.0 as double), (acc, x) -> acc + x*x) as n2")
    def optimized(frame: org.apache.spark.sql.DataFrame) =
      frame.queryExecution.optimizedPlan.toString
    assert(optimized(dotDf).contains("graft_dot"),
      "zip_with+aggregate must rewrite to graft_dot")
    assert(!optimized(dotDf).contains("aggregate("))
    assert(optimized(n2Df).contains("graft_dot"),
      "sum-of-squares aggregate must rewrite to graft_dot(v, v)")
    // results identical to the explicit native call
    val viaRule = dotDf.collect().map(_.getDouble(0)).toSeq
    val direct = df(50).selectExpr("graft_dot(a, b) as d")
      .collect().map(_.getDouble(0)).toSeq
    assert(viaRule == direct)
    // a non-matching fold (different op) is left alone
    val other = df(50).selectExpr(
      "aggregate(a, cast(0.0 as double), (acc, x) -> acc + 2*x) as s")
    assert(!optimized(other).contains("graft_dot"))
  }

  test("type mismatch is rejected at analysis time") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_sorted_intersect_count(array(1.5d), array(1.5d))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<int>")
      || err.getMessage.toLowerCase.contains("datatype_mismatch"))
  }

  test("interpreted eval agrees with codegen output") {
    // interpreted path: call nullSafeEval directly on Catalyst arrays
    import org.apache.spark.sql.catalyst.util.ArrayData
    val a = ArrayData.toArrayData(Array(1L, 5L, 9L, 12L))
    val b = ArrayData.toArrayData(Array(2L, 5L, 9L, 30L))
    val lit = org.apache.spark.sql.catalyst.expressions.Literal
    val e = SortedIntersectCount(
      lit.create(Array(1L, 5L, 9L, 12L)), lit.create(Array(2L, 5L, 9L, 30L)))
    assert(e.nullSafeEval(a, b) == 2L)
    val viaSql = spark.sql(
      "SELECT graft_sorted_intersect_count(array(1L,5L,9L,12L), array(2L,5L,9L,30L)) AS c")
      .collect().head.getLong(0)
    assert(viaSql == 2L)
  }
}
