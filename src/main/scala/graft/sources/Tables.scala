package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the engine's table layout: one parquet per table under a
  * scale-factor directory. Scans stay declarative so Catalyst pushes
  * filters/projections into the parquet reader (verified in
  * `PlanSpec`): at 100 TB the scan is the dominant cost and pruning is
  * the first lever.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view (for the SQL-facing API). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
