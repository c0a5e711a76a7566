package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degenerate-bucket guard shared by every LSH candidate generator.
  *
  * A bucket with k members yields k² candidate pairs; adversarial or
  * boilerplate-heavy corpora concentrate into few buckets and turn a
  * bucketed join quadratic. Dropping buckets past the cap bounds the
  * worst case (pair volume ≤ cap²·buckets, linear for a bucket count
  * that grows with the corpus) — the same skew-guard pattern as g7's
  * hub-order cap. One implementation so cap semantics (count, ≤, semi
  * join) cannot drift between d2 / d3 / the vector band tables.
  */
object Buckets {

  /** Rows of `df` whose (keys) bucket has ≤ `max` members. */
  def cap(df: DataFrame, keys: Seq[String], max: Int): DataFrame = {
    val ok = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= max)
      .drop("bn")
    df.join(ok, keys, "left_semi")
  }
}
