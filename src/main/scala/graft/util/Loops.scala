package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * (LoopProbe, guide §1).
  *
  * Everything OUTSIDE loop rounds keeps AQE (skew-join splits on the
  * big self-joins are pure win). What a loop ROUND loses without AQE
  * is runtime skew-join splitting — irrelevant at gate scale (the
  * cached edge side's fixed partitioning can't be re-split anyway) but
  * real once the per-round joined side reaches cluster scale. So the
  * policy is decided by DATA, not by a local-mode-leaning default
  * (r13 verdict #9): `spark.graft.loop.aqe` =
  *  - "auto" (default): rounds run AQE-quiet unless the caller-supplied
  *    per-round row estimate (the loop's edge/vector side, memoized
  *    once per cached table) reaches
  *    `spark.graft.loop.aqe.autoRowThreshold` (default 64M rows —
  *    beyond that the round's frontier⋈edges join is big enough that
  *    one runtime skew split pays for every re-planning it costs);
  *  - "true": always adaptive (a 100 TB deployment that wants runtime
  *    skew handling inside every round);
  *  - "false": always quiet (the measured-fastest local regime).
  */
object Loops {
  /** Per-round row count above which "auto" keeps AQE on inside loop
    * rounds. 64M rows ≈ a ≥1 GB per-round join side at two longs per
    * row — the scale where §2.5 skew handling starts mattering more
    * than per-round re-planning latency. */
  val AutoRowThresholdDefault = 64000000L

  // Memoized row counts for loop-scale estimates: the tables passed in
  // are DfCache-persisted (counted once by the bench warm-up anyway),
  // so one count per (session, table) is a cheap cached-scan job and
  // every later loop reads the memo. WeakHashMap: entries die with
  // their DataFrame, so an evicted cache entry cannot pin rows forever.
  private val rowsMemo = new java.util.WeakHashMap[DataFrame, java.lang.Long]()
  def memoRows(df: DataFrame): Long = {
    val hit = synchronized(rowsMemo.get(df))
    if (hit != null) hit.longValue()
    else {
      val n = df.count()
      synchronized(rowsMemo.put(df, n))
      n
    }
  }

  // Reentrancy depth per session (advisor r13): quiet scopes can nest
  // when one operator's loop body invokes another looped operator.
  // Only the OUTERMOST scope snapshots and restores the AQE conf, so
  // a nested scope exiting early can never re-enable AQE mid-loop or
  // leave it off after the outer scope ends. Session conf is
  // process-wide per session, so concurrent loops on DIFFERENT threads
  // of the SAME session would still interleave scopes — the engine
  // runs queries on a session single-threaded (documented assumption;
  // the depth map is synchronized so even a violation cannot corrupt
  // the depth counter itself).
  private val quietDepth = new java.util.HashMap[SparkSession, Integer]()

  /** Run `body` with AQE disabled for the loop's rounds, unless policy
    * (see object doc) says this loop is big enough to keep runtime
    * skew handling. `loopRows` is the caller's per-round row estimate
    * (edge/vector side); negative = unknown, treated as small (the
    * pre-r14 behavior). Lazily evaluated — only consulted in "auto". */
  def quiet[T](spark: SparkSession, loopRows: => Long = -1L)(body: => T): T = {
    val mode = spark.conf.get("spark.graft.loop.aqe", "auto")
    val keepAqe = mode match {
      case "true"  => true
      case "false" => false
      case _ =>
        val threshold = try {
          spark.conf.get("spark.graft.loop.aqe.autoRowThreshold",
            AutoRowThresholdDefault.toString).toLong
        } catch { case _: NumberFormatException => AutoRowThresholdDefault }
        loopRows >= threshold
    }
    if (keepAqe) body
    else {
      val key = "spark.sql.adaptive.enabled"
      val outermost = synchronized {
        val d = quietDepth.getOrDefault(spark, 0)
        quietDepth.put(spark, d + 1)
        d == 0
      }
      val prev = spark.conf.get(key, "true")
      if (outermost) spark.conf.set(key, "false")
      try body finally {
        synchronized {
          val d = quietDepth.getOrDefault(spark, 1) - 1
          if (d <= 0) quietDepth.remove(spark) else quietDepth.put(spark, d)
        }
        if (outermost) spark.conf.set(key, prev)
      }
    }
  }
}
