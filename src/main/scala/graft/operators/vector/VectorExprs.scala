package graft.operators.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Shared vector primitives for similarity / embedding-dedup operators.
  *
  * The dot product and squared norm are *sequential left folds* over the
  * dimension index on BOTH engines (Spark `aggregate`, DuckDB
  * `list_reduce`), so double results are bit-identical and the oracle
  * contract is exact equality — no epsilon comparisons anywhere.
  *
  * The LSH bucket comes from 4 deterministic pseudo-random hyperplanes
  * (integer arithmetic on the dimension index — no stored random state),
  * giving 16 buckets; candidate pairs are generated within buckets only,
  * which is the O(n)/bucket scale path for ANN at 100 TB.
  */
object VectorExprs {

  /** float[] -> double[] (exact widening). */
  val castDoubleExpr = "transform(embedding, x -> cast(x as double))"

  /** Squared L2 norm of `vd` (native codegen'd fold). */
  val n2Expr = "graft_dot(vd, vd)"

  /** 4-hyperplane LSH bucket (0..15) of `vd`. */
  val bucketExpr: String =
    """aggregate(sequence(0, 3), 0,
      |  (acc, p) -> acc + CASE WHEN
      |    aggregate(sequence(1, 64), cast(0.0 as double),
      |      (a, d) -> a + cast((p*131 + d)*2654435761 % 1000003 - 500000 as double)
      |                    * element_at(vd, d)) > 0
      |    THEN shiftleft(1, p) ELSE 0 END)""".stripMargin

  /** Dot product of two qualified double-array columns — the native
    * [[graft.functions.DotProduct]] expression (same sequential fold
    * semantics as the DuckDB oracle, but fully codegen'd). */
  def dotExpr(a: String, b: String): String =
    s"graft_dot($a, $b)"

  /** embeddings + (vd, bucket, n2) feature columns; one codegen'd
    * scan, cached per (session, dir) — reused by both sides of every
    * similarity self-join and by the embedding-dedup operator. */
  def embFeatures(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    graft.util.DfCache.cached(spark, dir, "emb_features") {
      Tables.load(spark, dir, "embeddings")
        .withColumn("vd", expr(castDoubleExpr))
        .withColumn("bucket", expr(bucketExpr))
        .withColumn("n2", expr(n2Expr))
        .select(col("vec_id"), col("label"), col("vd"), col("bucket"), col("n2"))
    }
  }

  /** DuckDB CTEs mirroring [[embFeatures]]: views `ef` (vd) and `eb`
    * (vd, label, bucket, n2). */
  val embCtes: String =
    """ef AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
      |  FROM embeddings),
      |eb AS (
      |  SELECT vec_id, label, vd,
      |    list_reduce(list_prepend(CAST(0 AS INTEGER), [
      |      CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |             [ CAST((p*131 + d)*2654435761 % 1000003 - 500000 AS DOUBLE) * vd[d]
      |               for d in generate_series(1, 64) ]), (a, b) -> a + b) > 0
      |           THEN (1 << p) ELSE 0 END
      |      for p in generate_series(0, 3) ]), (a, b) -> a + b) AS bucket,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), [ x*x for x in vd ]),
      |                (a, b) -> a + b) AS n2
      |  FROM ef)""".stripMargin

  /** DuckDB dot product of two qualified list columns (sequential fold). */
  def duckDot(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    [ $a[d] * $b[d] for d in generate_series(1, 64) ]), (a, b) -> a + b)""".stripMargin
}
