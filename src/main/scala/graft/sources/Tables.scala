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
      // matches DuckDB's microsecond timestamps exactly). Schema-matched
      // rather than assumed: whether the legacy conf applies at schema
      // inference depends on the launch path (sbt-forked JVMs see int64,
      // a bare `java` launch resolves TIMESTAMP_NTZ), and both convert
      // to the same session-TZ-free microsecond timestamps.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        case _ =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view (for the SQL-facing API). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
