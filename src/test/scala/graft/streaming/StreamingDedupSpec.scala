package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession
import graft.operators.dedup.DedupOps
import graft.sources.Tables

/** The streaming incremental-dedup contract: after any prefix of
  * micro-batches, the emitted pairs are EXACTLY the full-corpus batch
  * dedup's pairs that involve a streamed doc — batch 2 must also
  * find its pairs against batch 1's docs (the index accumulates), and
  * nothing is emitted twice. This is d9's warm-start equivalence
  * (IncrementalDedupSpec) lifted to the stream.
  */
class StreamingDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)
  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("two streamed batches emit exactly the full dedup's new-doc pairs, accumulating") {
    val sq = spark
    import sq.implicits._
    implicit val ctx = sq.sqlContext
    val all = Tables.load(spark, dir, "documents")
    val corpus = all.filter(col("doc_id") % 3 =!= 0)
    val shard1 = all.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0)
    val shard2 = all.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 =!= 0)

    val path = Files.createTempDirectory("graft_stream_dedup_idx").toString
    DedupOps.buildDedupIndex(spark, corpus, "graft_stream_idx", path, buckets = 4)

    val source = MemoryStream[(Long, String)]
    val docsStream = source.toDF().toDF("doc_id", "text")
    var batches = Vector.empty[Set[(Long, Long)]]
    val q = StreamingDedup.dedupStream(spark, docsStream, "graft_stream_idx") {
        pairs => batches :+= pairSet(pairs)
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_stream_dedup_ckpt").toString)
      .start()
    try {
      def rows(df: DataFrame) = df.select(col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
      source.addData(rows(shard1).toIndexedSeq: _*)
      q.processAllAvailable()
      source.addData(rows(shard2).toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(batches.length == 2, s"expected two micro-batches, saw ${batches.length}")
    val emitted = batches(0).union(batches(1))
    val full = pairSet(DedupOps.verifiedPairs(spark, all))
    val corpusOnly = pairSet(DedupOps.verifiedPairs(spark, corpus))
    assert(emitted == full.diff(corpusOnly),
      s"missing=${full.diff(corpusOnly).diff(emitted)} " +
        s"extra=${emitted.diff(full.diff(corpusOnly))}")
    assert(batches(0).intersect(batches(1)).isEmpty, "no pair emitted twice")
    // the accumulation is load-bearing: batch 2 found pairs against
    // batch 1's docs, which only the appended index rows can supply
    val s1 = shard1.select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = shard2.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batches(1).exists(p =>
        (s1.contains(p._1) && s2.contains(p._2)) ||
        (s2.contains(p._1) && s1.contains(p._2))),
      "expected at least one cross-batch pair (index accumulation)")
    assert(batches(0).nonEmpty && batches(1).nonEmpty)
  }
}
