package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source/sink surface beyond plain parquet reads: csv/json
  * round-trips and partitioned parquet writes.
  *
  * Writers stay distributed (no coalesce(1) in the API — callers
  * choose their layout); `partitionedParquet` gives the
  * partition-pruned layout a 100 TB fact table needs (predicate on the
  * partition column prunes directories before any I/O).
  */
object TableIO {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.option("header", "true").schema(schemaDdl).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String, schemaDdl: String): DataFrame =
    spark.read.schema(schemaDdl).json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Partitioned parquet write (directory per distinct value of
    * `partitionCol`), the layout that enables partition pruning. */
  def writePartitionedParquet(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed parquet write (external table at `path`): the persisted
    * pre-shuffled layout for co-located joins/aggregations. A read of
    * the table exposes `HashPartitioning(bucketCol, buckets)`, so every
    * downstream `groupBy(bucketCol)` or equi-join on it runs with NO
    * exchange — this is how the cached-in-session edge/feature layouts
    * (DfCache) persist ACROSS sessions on a cluster: bucket the edge
    * list by `src` once, and every traversal job of every session
    * starts co-located (TableIOSpec proves the exchange-free plan). */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCol: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Append into an existing bucketed table with the SAME bucket
    * spec — new files land in their bucket lanes, so the table keeps
    * its exchange-free read property as it grows. This is the
    * accumulation half of the incremental-dedup index: each arriving
    * shard's band rows join the persisted layout without rewriting
    * it (the streaming analog of AnalysisRound's storeRound,
    * Runner.java:68). */
  def appendBucketed(df: DataFrame, table: String,
      bucketCol: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Append)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
