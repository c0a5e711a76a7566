package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The round-6 s17 lesson, made structural: the driver's typed hash is
  * only proven stable for {integers, double, string, date, timestamp,
  * bool, binary} across the Spark-parquet → pyarrow vs DuckDB-fetch
  * boundary (decimal128 was value-exact but hash-red). Verify now
  * rejects any gated output schema outside that set BEFORE writing, so
  * the failure is a named local error, not a one-row driver mystery.
  */
class GateTypeSpec extends AnyFunSuite {

  test("stable scalar and nested types pass") {
    Verify.assertStableSchema("ok", StructType(Seq(
      StructField("a", LongType), StructField("b", DoubleType),
      StructField("c", StringType), StructField("d", DateType),
      StructField("e", BooleanType), StructField("f", TimestampType),
      StructField("g", ArrayType(LongType)),
      StructField("h", StructType(Seq(StructField("x", DoubleType)))))))
  }

  test("a decimal column is rejected with the offending name in the message") {
    val e = intercept[IllegalArgumentException] {
      Verify.assertStableSchema("bad", StructType(Seq(
        StructField("n", LongType),
        StructField("sse_n", DecimalType(38, 0)))))
    }
    assert(e.getMessage.contains("sse_n") && e.getMessage.contains("bad"))
  }

  test("a decimal buried in an array is rejected too") {
    intercept[IllegalArgumentException] {
      Verify.assertStableSchema("nested", StructType(Seq(
        StructField("xs", ArrayType(DecimalType(18, 2))))))
    }
  }

  test("every gated query's schema is in the proven-stable set") {
    val spark = GraftSession.local(threads = 4, shufflePartitions = 4)
    try {
      val dir = "/root/testdata/sf0.001"
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        Verify.assertStableSchema(name, fn(spark, dir).schema)
      }
    } finally spark.stop()
  }

  // -- the round-7 e37 lesson: TYPES can be stable while VALUES are
  // not — a 9999-12-31 SCD2 sentinel overflows pandas' ns-ranged
  // datetime64 (max 2262-04-11) and the driver's two fetch paths
  // materialize different bit patterns. Verify.assertStableValues is
  // the value-range companion guard.
  test("an out-of-ns-range timestamp value is rejected with the column name") {
    val spark = GraftSession.local(threads = 2, shufflePartitions = 2)
    try {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val bad = Seq(1L, 2L).toDF("id")
        .withColumn("valid_to", when(col("id") === 1L,
          to_timestamp(lit("9999-12-31 00:00:00")))
          .otherwise(to_timestamp(lit("2024-01-01 00:00:00"))))
      val e = intercept[IllegalArgumentException] {
        Verify.assertStableValues("scd2ish", bad)
      }
      assert(e.getMessage.contains("valid_to") &&
        e.getMessage.contains("scd2ish"))
      // in-range timestamps, NULLs, and the DateType edge all pass
      val ok = Seq(1L, 2L).toDF("id")
        .withColumn("t", when(col("id") === 1L,
          to_timestamp(lit("2262-04-10 00:00:00"))))
        .withColumn("d", to_date(lit("2262-04-10")))
      Verify.assertStableValues("ok", ok)
      // an out-of-range DATE is just as unstable as a timestamp
      intercept[IllegalArgumentException] {
        Verify.assertStableValues("baddate",
          Seq(1L).toDF("id").withColumn("d", to_date(lit("9999-12-31"))))
      }
      // BELOW-range sentinels (pre-1677-09-21) overflow datetime64[ns]
      // just like 9999-12-31 does — the floor is guarded too
      val low = intercept[IllegalArgumentException] {
        Verify.assertStableValues("lowts", Seq(1L).toDF("id")
          .withColumn("born", to_timestamp(lit("0001-01-01 00:00:00"))))
      }
      assert(low.getMessage.contains("born"))
      intercept[IllegalArgumentException] {
        Verify.assertStableValues("lowdate",
          Seq(1L).toDF("id").withColumn("d", to_date(lit("0001-01-01"))))
      }
      // no temporal columns → no extra scan, returns silently
      Verify.assertStableValues("none", Seq(1L).toDF("id"))
    } finally spark.stop()
  }
}
