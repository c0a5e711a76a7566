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
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects; read the raw int64 nanos and convert (the data
      // carries no sub-microsecond precision, so this is lossless and
      // matches DuckDB's microsecond timestamps exactly).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view (for the SQL-facing API). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
