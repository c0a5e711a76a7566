package graft

/** Writes `.explain("formatted")` for the named gated queries to
  * plans/<tag>/<name>_<suffix>.txt — the optimization rounds' evidence
  * artifact (the judge reads plan claims against these files). Runs the
  * same warm-up pass as the bench so captured plans are the steady-state
  * shapes the bench times (cache-backed scans, reused exchanges), not
  * cold-build plans.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... GRAFT_PLAN_TAG=r13 GRAFT_PLAN_SUFFIX=before \
  *     sbt "runMain graft.PlanDump g12_pagerank_converged ..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val tag = sys.env.getOrElse("GRAFT_PLAN_TAG", "r13")
    val suffix = sys.env.getOrElse("GRAFT_PLAN_SUFFIX", "before")
    val names = if (args.nonEmpty) args.toSeq else sys.error("pass query names")
    val spark = GraftSession.local(cpus, cpus)
    Bench.warmups.foreach { case (_, fn) => fn(spark, sfDir).count() }
    val outDir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n, sys.error(s"unknown query $n"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] wrote plans/$tag/${n}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
