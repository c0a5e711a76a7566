package graft

import org.apache.spark.sql.functions._

/** d9's 100 TB story, measured (round-7 verdict item 5): build the
  * bucketed dedup index over the 90% corpus ONCE, then probe a ~1%
  * shard against it — versus the full-corpus re-dedup a
  * non-incremental pipeline pays on every arriving shard. Also
  * value-checks the incremental ≡ full law at this scale: the probe's
  * pair set must equal the full run's pairs restricted to
  * shard-involving endpoints (the IncrementalDedupSpec equivalence,
  * re-executed where the DuckDB oracle can't follow).
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.DedupScaleTrail <sfDir>"
  * Prints one JSON line. Run at sf10: probe_sec ≪ rebuild_sec is the
  * exchange-free-probe claim, priced.
  */
object DedupScaleTrail {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, cpus)
    val d = graft.operators.dedup.DedupOps
    val docsAll = graft.sources.Tables.load(spark, dir, "documents")
    // d7/d9's split hash: < 90 = corpus (indexed); buckets 91–92 are
    // the ~2% probe shard (disjoint from the corpus by construction —
    // the hash is coarse at small sf, so a two-bucket band keeps the
    // shard non-empty at every tested scale)
    val h = expr("((doc_id % 2147483647) * 2654435761) % 2147483647 % 100")

    def timed[T](fn: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val v = fn
      (v, (System.nanoTime() - t0) / 1e9)
    }

    val (name, buildSec) = timed {
      val n = d.gatedDedupIndex(spark, dir)
      // force both persisted tables into existence before stopping the clock
      spark.table(s"${n}_bands").count()
      spark.table(s"${n}_shingles").count()
      n
    }
    val shard = docsAll.filter(h === 91 || h === 92)
    val shardN = shard.count()
    val corpusN = docsAll.filter(h < 90).count()

    val (probe, probeSec) = timed {
      d.dedupNewShard(spark, shard, name).localCheckpoint(true)
    }
    val probePairs = probe.count()

    // the non-incremental comparator: full d2+d4 over corpus ∪ shard
    val (full, rebuildSec) = timed {
      d.verifiedPairs(spark, docsAll.filter(h < 90 || h === 91 || h === 92))
        .localCheckpoint(true)
    }
    // incremental ≡ full, restricted to shard-involving pairs
    val shardIds = shard.select(col("doc_id"))
    val fullShardPairs = full
      .join(shardIds.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
      .unionByName(full.join(shardIds.select(col("doc_id").as("doc_b")),
        Seq("doc_b"), "left_semi"))
      .distinct()
    val mism = fullShardPairs.as("f")
      .join(probe.as("p"), Seq("doc_a", "doc_b"), "full_outer")
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("f.jaccard") === col("p.jaccard"), 0L)
          .otherwise(1L)), lit(0L)).as("bad"))
      .collect()(0)

    println(
      s"""{"op":"d9_incremental","sf":"$dir","corpus_docs":$corpusN,""" +
        s""""shard_docs":$shardN,"build_sec":${"%.1f".format(buildSec)},""" +
        s""""probe_sec":${"%.1f".format(probeSec)},""" +
        s""""rebuild_sec":${"%.1f".format(rebuildSec)},""" +
        s""""probe_pairs":$probePairs,"checked_pairs":${mism.getLong(0)},""" +
        s""""mismatches":${mism.getLong(1)}}""")
    spark.stop()
  }
}
