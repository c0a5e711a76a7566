package graft.operators

// Timing probe, run manually via
// `sbt "Test/runMain graft.operators.G27TimingProbe <sfdir>"`
// — not a test; kept in test scope so it never ships in main.
object G27TimingProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(32, 32)
    graft.operators.graph.GraphTables.sym(spark, dir).count()
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries("g27_reach_profile")(spark, dir).count()
    println(f"[probe] g27 rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
