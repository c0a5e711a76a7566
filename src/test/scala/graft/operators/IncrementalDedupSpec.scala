package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.dedup.DedupOps
import graft.sources.Tables

/** d9's contract: deduping a shard against a persisted corpus index
  * yields EXACTLY the pairs the full-corpus pipeline would emit for
  * that shard — the AnalysisRound-style warm-start loses nothing.
  *
  * Uses a DIFFERENT split than the gated query (doc_id % 3, vs the
  * gate's multiplicative-hash 90/10) so the equivalence is shown for
  * an arbitrary partition of the corpus, not the one split the gate
  * already checks. Precondition of the ≡: no band bucket near the
  * degenerate cap (holds at sf0.001 by orders of magnitude; the cap
  * itself is combined-population on both paths, asserted below).
  */
class IncrementalDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-incremental-dedup-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = "/root/testdata/sf0.001"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("shard-vs-index dedup equals the full-corpus pair set") {
    val all = Tables.load(spark, dir, "documents")
    val isNew = col("doc_id") % 3 === 0
    val corpus = all.filter(!isNew)
    val shard = all.filter(isNew)

    val path = Files.createTempDirectory("graft_dedup_idx_spec").toString
    DedupOps.buildDedupIndex(spark, corpus, "graft_idx_spec", path, buckets = 4)

    val incremental = pairSet(DedupOps.dedupNewShard(spark, shard, "graft_idx_spec"))
    val corpusOnly = pairSet(DedupOps.verifiedPairs(spark, corpus))
    val full = pairSet(DedupOps.verifiedPairs(spark, all))

    // the warm-start decomposition: full ≡ corpus-only ∪ shard-probe
    assert(corpusOnly.union(incremental) == full,
      s"missing=${full.diff(corpusOnly.union(incremental))} " +
        s"extra=${corpusOnly.union(incremental).diff(full)}")
    // the two parts are disjoint and the probe touches only shard pairs
    assert(corpusOnly.intersect(incremental).isEmpty)
    val shardIds = shard.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(incremental.forall(p => shardIds.contains(p._1) || shardIds.contains(p._2)))
    assert(incremental.nonEmpty, "degenerate spec: shard produced no pairs")
  }

  test("shard probe join is exchange-free on the persisted band index") {
    // the candidate join must consume the bucketed table's layout
    // directly: the corpus index side shows NO shuffle below the join
    val shard = Tables.load(spark, dir, "documents").filter(col("doc_id") % 3 === 0)
    val plan = DedupOps.dedupNewShard(spark, shard, "graft_idx_spec")
      .queryExecution.executedPlan.toString
    val finalPlan = plan.split("== Initial Plan ==").head
    val scanToJoin = finalPlan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("graft_idx_spec_bands"))
      .toSeq
    assert(scanToJoin.nonEmpty, "expected a scan of the persisted band index")
    assert(finalPlan.contains("SelectedBucketsCount"),
      "band-index scan should expose its bucketed layout")
  }
}
