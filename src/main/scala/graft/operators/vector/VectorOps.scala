package graft.operators.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding preprocessing operators — the vector-column counterparts
  * of the text-cleaning family: the transforms a training-data
  * pipeline applies to every embedding before storage or serving.
  *
  * Both are one narrow codegen'd scan per vector (HOF compositions,
  * no UDFs, no shuffle at all — embarrassingly parallel at 100 TB),
  * and both are exactly mirrored in DuckDB: normalization divides the
  * same doubles by the same sequential-fold norm, quantization uses
  * round-half-away-from-zero on identical products, so the gate is
  * exact equality like every other entry.
  */
object VectorOps {

  /** One-pass scan with just (vd, n2) — deliberately NOT the cached
    * [[VectorExprs.embFeatures]]: that table also computes the 64
    * hyperplane band signatures (64 dots per row), pure waste for a
    * preprocessing pass. Uncached: each op reads the corpus exactly
    * once, nothing worth keeping. */
  private def embPlain(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    graft.sources.Tables.load(spark, dir, "embeddings")
      .withColumn("vd", expr(VectorExprs.castDoubleExpr))
      .withColumn("n2", expr(VectorExprs.n2Expr))
  }

  /** v1: L2-normalization. Computes the full normalized vector; the
    * gate projects the norm and the first 4 normalized dims (scalar
    * columns compare robustly across engines). */
  def v1L2Normalize(spark: SparkSession, dir: String): DataFrame =
    embPlain(spark, dir)
      .withColumn("norm", sqrt(col("n2")))
      .withColumn("nd", expr("transform(vd, x -> x / norm)"))
      .select(col("vec_id"), col("norm"),
        element_at(col("nd"), 1).as("nd1"), element_at(col("nd"), 2).as("nd2"),
        element_at(col("nd"), 3).as("nd3"), element_at(col("nd"), 4).as("nd4"))
      .orderBy(col("vec_id"))

  val v1Sql: String =
    s"""WITH ${VectorExprs.embCtes}
       |SELECT vec_id, sqrt(n2) AS norm,
       |  vd[1] / sqrt(n2) AS nd1, vd[2] / sqrt(n2) AS nd2,
       |  vd[3] / sqrt(n2) AS nd3, vd[4] / sqrt(n2) AS nd4
       |FROM eb ORDER BY vec_id""".stripMargin

  /** v2: symmetric int8 quantization (scale = 127 / max|x|, round to
    * nearest). The gate checks per-vector scale + integer summary
    * stats of the quantized codes (sum/min/max — order-independent
    * integer arithmetic, exact on both engines). */
  def v2Int8Quantize(spark: SparkSession, dir: String): DataFrame =
    embPlain(spark, dir)
      .withColumn("am", expr("array_max(transform(vd, x -> abs(x)))"))
      .filter(col("am") > 0.0)
      .withColumn("scale", lit(127.0) / col("am"))
      .withColumn("q", expr("transform(vd, x -> cast(round(x * scale) as int))"))
      .select(col("vec_id"), col("scale"),
        expr("aggregate(q, 0, (a, x) -> a + x)").as("q_sum"),
        expr("array_min(q)").as("q_min"),
        expr("array_max(q)").as("q_max"))
      .orderBy(col("vec_id"))

  val v2Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |qd AS (
       |  SELECT vec_id, 127.0 / list_max([abs(x) for x in vd]) AS scale,
       |    [CAST(round(x * (127.0 / list_max([abs(y) for y in vd]))) AS INTEGER)
       |     for x in vd] AS q
       |  FROM eb WHERE list_max([abs(x) for x in vd]) > 0)
       |SELECT vec_id, scale,
       |  CAST(list_sum(q) AS INTEGER) AS q_sum,
       |  list_min(q) AS q_min, list_max(q) AS q_max
       |FROM qd ORDER BY vec_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v1_l2_normalize" -> (v1L2Normalize _),
    "v2_int8_quantize" -> (v2Int8Quantize _))

  val oracles: Map[String, String] = Map(
    "v1_l2_normalize" -> v1Sql,
    "v2_int8_quantize" -> v2Sql)
}
