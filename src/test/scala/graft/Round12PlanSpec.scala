package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 hardening pins, following the Round11PlanSpec convention:
  * every new hybrid path ships with a forced-path gate so the branch
  * that exists only at scale is hash-gated at gate scale too.
  *
  *  - g45's trim gained an adjacency-PROBE path for small waves
  *    (V-row probe + Σ deg(dead) explode instead of 2 E-row scans per
  *    round) with a mega-hub edge-scan fallback. Three routings must
  *    agree: default (probe engages at gate scale), probe disabled
  *    (`trimAdjProbeCap=0` ⇒ the old edge-scan rounds), and hub cap
  *    forced to 1 (`trimHubDegCap=1` ⇒ every node excluded from the
  *    adjacency ⇒ every wave routes through the dead-hub fallback).
  *
  *  - g33's delta rounds gained a `deltaDecBroadcastCap` gate (the
  *    r11 ADVICE hole: `dec` scales with Σ deg(wave endpoints), not
  *    the wave cap, so the unconditional broadcast could blow the
  *    driver at 100 TB). Forcing the cap to 0 routes the decrement
  *    through a shuffle join; the trajectory must be identical.
  */
class Round12PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.01"
  private lazy val spark = GraftSession.local(threads = 8, shufflePartitions = 8)

  override def afterAll(): Unit = spark.stop()

  private def rowsOf(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def withConfs(confs: (String, String)*)(body: => Seq[Seq[Any]]): Seq[Seq[Any]] = {
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally confs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  private def assertSame(tag: String, a: Seq[Seq[Any]], b: Seq[Seq[Any]]): Unit = {
    assert(a.size == b.size, s"$tag: row count diverged ${a.size} vs ${b.size}")
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x == y, s"$tag row $i diverged: $x vs $y")
    }
  }

  test("g45: trim adjacency-probe ≡ edge-scan ≡ all-hub fallback") {
    // trimProbeAfter=0 FORCES the probe to build on the first small
    // wave — the default streak gate (2) means short gate-scale trims
    // never engage it, which would leave the probe branch untested
    val default = rowsOf(SparkEntry.queries("g45_scc")(spark, dir))
    val probed = withConfs("spark.graft.scc.trimProbeAfter" -> "0") {
      rowsOf(SparkEntry.queries("g45_scc")(spark, dir))
    }
    assertSame("g45 edgescan-vs-probe", default, probed)
    val allHub = withConfs("spark.graft.scc.trimProbeAfter" -> "0",
        "spark.graft.scc.trimHubDegCap" -> "1") {
      rowsOf(SparkEntry.queries("g45_scc")(spark, dir))
    }
    assertSame("g45 probe-vs-allhub", default, allHub)
  }

  test("g33: shuffle-joined decrement ≡ broadcast decrement trajectory") {
    val default = rowsOf(SparkEntry.queries("g33_ktruss")(spark, dir))
    val shuffled = withConfs("spark.graft.truss.deltaDecBroadcastCap" -> "0") {
      rowsOf(SparkEntry.queries("g33_ktruss")(spark, dir))
    }
    assertSame("g33 dec-join", default, shuffled)
  }
}
