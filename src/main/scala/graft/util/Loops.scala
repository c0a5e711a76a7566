package graft.util

import org.apache.spark.sql.SparkSession

/** Driver-loop execution scope for the iterative operators (pagerank /
  * label fixpoints / peels / BFS levels).
  *
  * Inside a convergence loop every round is a tiny, FIXED-shape query:
  * the joins are co-partitioned by construction (cached edge layout ⋈
  * checkpointed V-row vector), partition coalescing is globally off,
  * and the loop re-plans the same shape every round. Under AQE each
  * such round pays per-stage driver re-planning and materializes its
  * stages eagerly at `toRdd` time, which both adds latency and defeats
  * lazy-checkpoint job fusion (the stop-check action can no longer be
  * the single job that materializes the round). Measured on the g12
  * loop at sf0.1 (min of 3 interleaved reps): 8 rounds 6.38 s with AQE
  * vs 4.78 s without, and 3.88 s without AQE plus the fused stop-check
  * (LoopProbe, guide §1). AQE has nothing to offer these rounds: the
  * vector side is below no broadcast threshold only locally, skew-join
  * splitting cannot re-split the cached edge side's fixed partitioning,
  * and coalescing is disabled engine-wide.
  *
  * Everything OUTSIDE loop rounds keeps AQE (skew-join splits on the
  * big self-joins are pure win). `spark.graft.loop.aqe=true` opts a
  * deployment back into adaptive rounds — e.g. if a 100 TB corpus ever
  * wants runtime skew handling inside a round — without a code change.
  */
object Loops {
  def quiet[T](spark: SparkSession)(body: => T): T = {
    if (spark.conf.get("spark.graft.loop.aqe", "false") == "true") body
    else {
      val key = "spark.sql.adaptive.enabled"
      val prev = spark.conf.get(key, "true")
      spark.conf.set(key, "false")
      try body finally spark.conf.set(key, prev)
    }
  }
}
