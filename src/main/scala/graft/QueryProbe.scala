package graft

/** Quiet-host attribution probe: runs the named gated queries after
  * the SAME warm-up pass the bench uses, GRAFT_PROBE_REPS times each
  * (default 2), and prints one JSON line of per-rep seconds. The
  * round verdicts repeatedly ask "is this bench movement a plan
  * regression or host load?" — the answer is this tool on a quiet
  * host: identical plans re-measured against warm caches, with the
  * second rep separating JIT/shuffle-file effects from steady state.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.QueryProbe g10_components ..."
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("GRAFT_PROBE_REPS", "2").toInt
    val names = if (args.nonEmpty) args.toSeq else sys.error("pass query names")
    val spark = GraftSession.local(cpus, cpus)
    // host-health stamp (r12 verdict #2): a probe line answering "plan
    // regression or host load?" must carry the host's own diagnosis
    val hs = new HostStamp(spark)
    Bench.warmups.foreach { case (_, fn) => fn(spark, sfDir).count() }
    val results = names.map { n =>
      val fn = SparkEntry.queries.getOrElse(n, sys.error(s"unknown query $n"))
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      n -> secs
    }
    val line = results.map { case (n, ss) =>
      "\"" + n + "\":[" + ss.map(s => "%.2f".formatLocal(java.util.Locale.ROOT, s))
        .mkString(",") + "]"
    }.mkString("{\"probe\":\"quiet_host\",\"sf\":\"" + sfDir + "\",", ",",
      hs.stamp() + "}")
    println(line)
    spark.stop()
  }
}
