package graft

import org.apache.spark.sql.functions._

/** Scratch attribution probe for the iterative-loop operators: times
  * each phase of a convergence loop separately (warm cache build, per
  * round step, stop-check aggregate) and prints the physical plan of a
  * single round so the per-round join strategy is inspectable — the
  * bench only sees the loop total. Not part of the driver contract.
  */
object LoopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, cpus)
    import graft.operators.graph.GraphOps

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[loopprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    t("warm edgesWithDeg")(GraphOps.edgesWithDeg(spark, sfDir).count())
    t("warm sym")(graft.operators.graph.GraphTables.sym(spark, sfDir).count())

    // one pagerank round from the uniform vector: capture the plan
    val r0 = t("uniform ranks + ckpt")(
      GraphOps.pagerankFrom(spark, sfDir,
        spark.range(0).selectExpr("id as node_id", "id as rank"), 0)
    )
    val uni = graft.operators.graph.GraphOps
      .pagerankFrom(spark, sfDir,
        GraphOps.edgesWithDeg(spark, sfDir)
          .select(col("src").as("node_id")).distinct()
          .select(col("node_id"), lit(1000000L).as("rank")), 1)
    println("[loopprobe] ===== one pagerank round plan =====")
    println(uni.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode).take(6000))

    // timed: the REAL loop (fused delta like rankLoopUntilStop), run
    // under three conf regimes in one session to A/B the per-round
    // constant: (a) repo default, (b) AQE coalescing on, (c) coalescing
    // + shuffled-hash-join rewrite.
    def loop(tag: String): Unit = {
      var r = t(s"[$tag] start vector ckpt")(
        GraphOps.edgesWithDeg(spark, sfDir)
          .select(col("src").as("node_id")).distinct()
          .select(col("node_id"), lit(1000000L).as("rank")).localCheckpoint(true))
      val total0 = System.nanoTime()
      for (i <- 1 to 8) {
        val stepped = GraphOps.pagerankFrom(spark, sfDir, r, 1)
        val nd = t(s"[$tag] round $i: step+delta+ckpt")(
          stepped.join(r.select(col("node_id"), col("rank").as("prev")), "node_id")
            .select(col("node_id"), col("rank"),
              abs(col("rank") - col("prev")).as("delta")).localCheckpoint(true))
        t(s"[$tag] round $i: stop agg")(
          nd.agg(coalesce(max(col("delta")), lit(0L)),
            coalesce(max(col("rank")), lit(0L))).collect())
        r = nd.select(col("node_id"), col("rank"))
      }
      println(f"[loopprobe] [$tag] 8-round total: ${(System.nanoTime() - total0) / 1e9}%.3f s")
    }
    // fused variant: lazy checkpoint of the NEW vector only (2 cols);
    // the stop-check aggregate joins prev on the fly and its single
    // job both materializes the checkpoint and returns the scalars.
    // minIters rounds run zero jobs of their own (deferred to the
    // first stop-check job).
    def fusedLoop(tag: String, minIters: Int): Unit = {
      var r = t(s"[$tag] start vector ckpt")(
        GraphOps.edgesWithDeg(spark, sfDir)
          .select(col("src").as("node_id")).distinct()
          .select(col("node_id"), lit(1000000L).as("rank")).localCheckpoint(true))
      val total0 = System.nanoTime()
      var lastDelta = -1L
      for (i <- 1 to 8) {
        val next = GraphOps.pagerankFrom(spark, sfDir, r, 1).localCheckpoint(false)
        if (i >= minIters) {
          val row = t(s"[$tag] round $i: fused ckpt+stop agg")(
            next.join(r.select(col("node_id"), col("rank").as("prev")), "node_id")
              .agg(coalesce(max(abs(col("rank") - col("prev"))), lit(0L)),
                coalesce(max(col("rank")), lit(0L))).collect()(0))
          lastDelta = row.getLong(0)
        }
        r = next
      }
      println(f"[loopprobe] [$tag] 8-round total: ${(System.nanoTime() - total0) / 1e9}%.3f s (last delta $lastDelta)")
    }
    def aqe(on: Boolean): Unit =
      spark.conf.set("spark.sql.adaptive.enabled", on.toString)
    for (rep <- 1 to 3) {
      loop(s"default r$rep")
      fusedLoop(s"fused r$rep", 4)
      aqe(false)
      loop(s"noaqe r$rep")
      fusedLoop(s"fused-noaqe r$rep", 4)
      aqe(true)
    }
    spark.stop()
  }
}
