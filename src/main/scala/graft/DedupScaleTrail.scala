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
    // optional probe filter (resume a partial trail): d9 | d30 | d32
    val want: String => Boolean =
      if (args.length > 1) args.drop(1).toSet else (_: String) => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, cpus)
    // host-health stamp per row (r12 verdict #2)
    val hs = new HostStamp(spark)
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

    if (want("d9")) {
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
        s""""mismatches":${mism.getLong(1)}${hs.stamp()}}""")
    }

    // ---- d30 at scale: LSH bucket stats vs an independent recount ----
    // The report the band-tuner trusts must be consistent with the
    // band table and with the ACTUAL capped pair stream: (a) every
    // doc lands in exactly one bucket per band, so each band's n_rows
    // equals the banded corpus row count; (b) Σ pair_volume over
    // bands equals the size of the pre-dedup within-bucket pair
    // enumeration the candidate generator emits (re-executed here
    // through Buckets.cap — a different plan than d30's k·(k−1)/2
    // closed form). Zero mismatches = the observability row is the
    // truth at this scale, not an estimate.
    if (want("d30")) {
      val (stats, d30Sec) = timed { d.d30BucketStats(spark, dir).collect() }
      val bt = d.bandTable(spark, dir)
      val rowsPerBand = bt.groupBy(col("band")).count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      // guarded lookup: a band missing from the recount is a row
      // mismatch in the JSON line, not a NoSuchElementException crash
      val rowBad = stats.count(r =>
        !rowsPerBand.get(r.getAs[Int]("band")).contains(r.getAs[Long]("n_rows")))
      val capped = graft.util.Buckets.cap(bt, Seq("band", "bkey"),
        graft.operators.dedup.DedupOps.MaxBucket)
      val (pairStream, enumSec) = timed {
        capped.as("a").join(capped.as("b"),
            col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
              && col("a.doc_id") < col("b.doc_id"))
          .count()
      }
      val pairVolume = stats.map(_.getAs[Long]("pair_volume")).sum
      println(
        s"""{"op":"d30_bucket_stats","sf":"$dir","bands":${stats.length},""" +
          s""""stats_sec":${"%.1f".format(d30Sec)},""" +
          s""""enum_sec":${"%.1f".format(enumSec)},""" +
          s""""pair_volume":$pairVolume,"enumerated_pairs":$pairStream,""" +
          s""""row_mismatches":$rowBad,""" +
          s""""pair_mismatch":${if (pairStream == pairVolume) 0 else 1}""" +
          s"""${hs.stamp()}}""")
    }

    // ---- d32 at scale: calibration matrix vs a second aggregation ----
    // Conservation (Σ n_pairs = |d13 pair frame|) plus full per-cell
    // value equality against an independently-written aggregation
    // (separate sum/count columns, mean derived on the driver with
    // the same sign·(|Σ|÷n) convention) — the Round38 laws,
    // re-executed at the scale the DuckDB oracle can't reach.
    if (want("d32")) {
      val (cal, d32Sec) = timed { d.d32SimCalibration(spark, dir).collect() }
      val frame = d.d13MinhashEstimate(spark, dir)
        .select(expr("least(15, est_ppm * 16 div 1000000)").as("eb"),
          expr("least(9, exact_ppm * 10 div 1000000)").as("td"),
          col("err_ppm"))
      val recount = frame.groupBy(col("eb"), col("td"))
        .agg(count(lit(1)).as("n"), sum(col("err_ppm")).as("se"))
        .collect()
        .map { r =>
          val (n, se) = (r.getAs[Long]("n"), r.getAs[Long]("se"))
          (r.getAs[Long]("eb"), r.getAs[Long]("td")) ->
            (n, se.sign * (se.abs / n))
        }.toMap
      val total = recount.values.map(_._1).sum
      val gatedTotal = cal.map(_.getAs[Long]("n_pairs")).sum
      val cellBad = cal.count { r =>
        recount.get((r.getAs[Long]("est_bin"), r.getAs[Long]("true_decile")))
          .forall { case (n, me) =>
            n != r.getAs[Long]("n_pairs") || me != r.getAs[Long]("mean_err_ppm") }
      }
      println(
        s"""{"op":"d32_sim_calibration","sf":"$dir","cells":${cal.length},""" +
          s""""cal_sec":${"%.1f".format(d32Sec)},""" +
          s""""n_pairs":$gatedTotal,"recount_pairs":$total,""" +
          s""""cell_mismatches":$cellBad,""" +
          s""""conservation_mismatch":${if (total == gatedTotal) 0 else 1}""" +
          s"""${hs.stamp()}}""")
    }
    spark.stop()
  }
}
