package graft.util

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped cache for shared derived tables (edge lists, shingle
  * vectors, vector features).
  *
  * Several operators derive the same intermediate (e.g. the symmetric
  * edge list feeds every graph query; the band table feeds both sides
  * of the LSH self-join). Persisting one copy per (session, dir, name)
  * turns N rebuilds into one build + N cache reads — the Spark analog
  * of the reference's preloaded node/relationship cache
  * (Preloader.java:16 warms the page cache once for all workers).
  * On a cluster this is a MEMORY_AND_DISK-replicated dataset reused
  * across stages instead of recomputed per query.
  */
object DfCache {
  private val cache = new ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def cached(spark: SparkSession, dir: String, name: String)(build: => DataFrame): DataFrame =
    cache.computeIfAbsent((spark, dir, name),
      _ => build.persist(StorageLevel.MEMORY_AND_DISK))
}
