package graft.operators

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.graph.GraphOps

/** Skew probe for the edge-iterator triangle counter (g7's core): a
  * hub vertex at 2000× the median degree — the worst case the
  * round-3 verdict asked to verify rather than assume.
  *
  * What must hold under skew:
  *  - the count stays exact (the orientation + sorted-intersect
  *    algorithm has no cap or sampling to lose triangles to);
  *  - the degree orientation points every hub edge AT the hub, so the
  *    hub's own out-adjacency is EMPTY and no task ever materializes
  *    a hub-sized neighbor array — max out-degree stays O(sqrt(E))
  *    (here: 2) while the hub's in-degree is 2000.
  * The remaining hub-keyed surface is the ov-side probe join, which
  * AQE's skew-join split re-partitions at runtime
  * (spark.sql.adaptive.skewJoin.enabled, on by default in the
  * session builder). */
class TriangleSkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)
  import spark.implicits._

  override def afterAll(): Unit = spark.stop()

  private val N = 2000L

  /** Star: hub 0 — leaves 1..N; chain: i — i+1. Every (hub, i, i+1)
    * closes a triangle → exactly N-1 triangles, 2N-1 edges. */
  private def hubGraph = {
    val star = spark.range(1, N + 1).select(lit(0L).as("u"), $"id".as("v"))
    val chain = spark.range(1, N).select($"id".as("u"), ($"id" + 1).as("v"))
    star.union(chain)
  }

  test("hub at 2000x median degree: count stays exact") {
    val row = GraphOps.trianglesOf(hubGraph).collect()(0)
    assert(row.getLong(0) == N - 1)
    assert(row.getLong(1) == 2 * N - 1)
  }

  test("orientation keeps every out-adjacency list at O(sqrt(E)) despite the hub") {
    val ord = GraphOps.orientEdgesOf(hubGraph, GraphOps.degreesOf(hubGraph))
    val adj = GraphOps.adjacencyOf(ord)
    val maxOut = adj.agg(max(size($"nbrs"))).collect()(0).getInt(0)
    assert(maxOut <= 2, s"hub leaked into an out-adjacency list: max=$maxOut")
    // and the hub itself has no out-list at all
    assert(adj.filter($"anode" === 0L).count() == 0)
  }

  test("pure star (every edge shares the hub): zero triangles, nothing degenerate") {
    val star = spark.range(1, N + 1).select(lit(0L).as("u"), $"id".as("v"))
    val row = GraphOps.trianglesOf(star).collect()(0)
    assert(row.getLong(0) == 0L)
    assert(row.getLong(1) == N)
  }

  test("skew-join runtime splitting is on in the session the operators run under") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
  }
}
