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

  /** Small-file compaction — the maintenance pass every long-lived
    * parquet dataset needs: streaming sinks and incremental appends
    * (e.g. the per-micro-batch files of `EventStreams`' parquet sink,
    * or many `appendBucketed` shards) accumulate files far below the
    * ideal scan unit, and at 100 TB the file count itself becomes the
    * bottleneck (driver-side listing, one task per tiny file, open/
    * close overhead dominating the scan). Rewrites the dataset into
    * ceil(bytes / targetBytes) files via a REPARTITION BY RANGE on
    * `sortCol` — range partitioning (not hash) so each output file
    * covers a contiguous key range and min/max footer stats stay
    * selective for downstream predicate skipping. Atomic swap via
    * rename (write to `.compact.tmp`, then replace); returns the new
    * file count. Content-preserving by construction (same rows, new
    * layout) — TableIOSpec proves rows AND values survive, file count
    * drops, and the sort column's per-file ranges don't overlap. */
  def compactParquet(spark: SparkSession, path: String,
      sortCol: String, targetBytes: Long = 128L * 1024 * 1024): Long = {
    val dir = new java.io.File(path)
    def parquetBytes(d: java.io.File): Long =
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(_.length()).sum
    val bytes = math.max(1L, parquetBytes(dir))
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = path + ".compact.tmp"
    spark.read.parquet(path)
      .repartitionByRange(nFiles, org.apache.spark.sql.functions.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val old = new java.io.File(path + ".compact.old")
    def delete(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(delete)
      f.delete(); ()
    }
    if (!dir.renameTo(old))
      throw new java.io.IOException(s"compact: cannot move $path aside")
    if (!new java.io.File(tmp).renameTo(dir)) {
      old.renameTo(dir)
      throw new java.io.IOException(s"compact: cannot swap $tmp into $path")
    }
    delete(old)
    nFiles.toLong
  }

  /** Schema-evolution read: a long-lived dataset accumulates files
    * written under DIFFERENT schema versions (columns added over
    * time); a plain parquet read takes the schema of one random
    * footer and silently DROPS the others' columns. mergeSchema
    * unions the footers instead: every column that ever existed
    * appears, files that predate a column read it as NULL — the
    * additive-evolution contract object-store tables live by. At
    * scale: footer merging is a driver-side metadata pass over file
    * footers (not data) and stays linear in file count, which
    * [[compactParquet]] already bounds. Renames/retypes are NOT
    * handled (they never are with footer merging) — that's a rewrite
    * via [[upsertCompact]]. */
  def readEvolved(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Changelog → snapshot upsert-compaction of a parquet table (the
    * e28 latest-state primitive as a SINK operation): fold `updates`
    * into the table at `path`, keeping per `keyCol` only the row with
    * the greatest (`versionCols`…) tuple — lexicographic struct max,
    * one map-side-combined aggregate, no per-key window sort — then
    * atomically swap the snapshot in (compactParquet's
    * move-aside/rename discipline, so a concurrent reader sees either
    * the old or the new snapshot, never a half-write). Passing an
    * empty `updates` re-compacts in place (pure dedup of an
    * append-accumulated log). Returns the snapshot row count. */
  def upsertCompact(spark: SparkSession, path: String, updates: DataFrame,
      keyCol: String, versionCols: Seq[String]): Long = {
    import org.apache.spark.sql.functions._
    val base = spark.read.parquet(path)
    val all = base.unionByName(updates.select(base.columns.map(col): _*))
    val payload = all.columns.filter(_ != keyCol)
    // version columns lead the struct; remaining payload rides along
    val ordered = versionCols ++ payload.filterNot(versionCols.contains)
    val snap = all
      .groupBy(col(keyCol))
      .agg(max(struct(ordered.map(col): _*)).as("s"))
      .select(col(keyCol) +: payload.map(c => col(s"s.$c").as(c)): _*)
    val tmp = path + ".compact.tmp"
    snap.write.mode(SaveMode.Overwrite).parquet(tmp)
    val dir = new java.io.File(path)
    val old = new java.io.File(path + ".compact.old")
    def delete(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(delete)
      f.delete(); ()
    }
    if (!dir.renameTo(old))
      throw new java.io.IOException(s"upsert: cannot move $path aside")
    if (!new java.io.File(tmp).renameTo(dir)) {
      old.renameTo(dir)
      throw new java.io.IOException(s"upsert: cannot swap $tmp into $path")
    }
    delete(old)
    spark.read.parquet(path).count()
  }
}
