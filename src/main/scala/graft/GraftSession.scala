package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Local testing runs `local[N]`; the same configs are what we'd set on
  * a real cluster (AQE, small-dim broadcast, skew handling). The
  * reference sized its own worker pool by hand
  * (Runner.java:105 `getMaxNumberOfThreads`); on Spark the scheduler
  * owns that, we only shape the shuffle.
  */
object GraftSession {
  def local(threads: Int = 32, shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // Skew-join splitting is pure win; runtime partition coalescing is
      // NOT for this workload: our stages are CPU-heavy over compact
      // shuffles (hash folds, LSH), and coalescing trades parallelism
      // for fewer tasks. On an IO-bound 100 TB scan-heavy job flip it on.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Broad enough for every dim table; fact-side relations stay on
      // shuffle joins (runaway auto-broadcasts of exploded intermediates
      // cost more than the shuffle they save).
      .config("spark.sql.autoBroadcastJoinThreshold", (16L * 1024 * 1024).toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      // Iterative peels (g33) retire an E-row localCheckpoint + its
      // shuffle files every round; those disk blocks are only freed
      // once the ContextCleaner sees the RDD collected. Default
      // periodic GC is 30 min — far longer than a round — so spill
      // accumulated across rounds (measured sf10 scratch overrun).
      // A 30 s cadence bounds on-disk rounds without the former
      // stop-the-world System.gc() per peel round.
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Same effect as spark.sql.extensions=graft.functions.GraftExtensions
    // on a cluster; registered directly so ad-hoc sessions get it too.
    graft.functions.GraftFunctions.registerAll(spark)
    if (!spark.experimental.extraOptimizations.contains(graft.plans.DotProductRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.DotProductRewrite
    }
    spark
  }
}
