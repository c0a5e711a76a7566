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
}
