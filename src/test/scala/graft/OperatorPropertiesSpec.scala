package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.graph.{GraphOps, GraphTables}
import graft.operators.dedup.DedupOps
import graft.operators.text.TextOps

/** Cross-module semantic invariants that the row-hash oracle gate
  * can't express (determinism across runs, structural properties).
  * One shared session keeps the suite fast.
  */
class OperatorPropertiesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("graph: edge list is symmetric and self-loop-free") {
    val sym = GraphTables.sym(spark, dir)
    assert(sym.filter(col("src") === col("dst")).count() == 0)
    val asym = sym.as("a").join(sym.as("b"),
        col("a.src") === col("b.dst") && col("a.dst") === col("b.src"), "left_anti")
    assert(asym.count() == 0, "every edge must exist in both directions")
  }

  test("graph: pseudo-random walks are deterministic across runs") {
    val a = GraphOps.g4WalkVisits(spark, dir).collect().toSeq
    val b = GraphOps.g4WalkVisits(spark, dir).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("graph: checkpoint round-trip preserves the rank vector exactly") {
    val direct = GraphOps.g5Pagerank(spark, dir).collect().toSeq
    val restored = GraphOps.g9CheckpointRoundtrip(spark, dir).collect().toSeq
    assert(restored == direct)
  }

  test("dedup: LSH candidate pairs are ordered and self-free") {
    val pairs = DedupOps.d2MinhashLsh(spark, dir).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("dedup: ngram jaccard lies in (0, 1] and finds the planted dups") {
    val rows = DedupOps.d4NgramJaccard(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val j = r.getDouble(2); j > 0.0 && j <= 1.0
    })
  }

  test("text: fingerprints are stable and within the modulus") {
    val fp1 = TextOps.t4Fingerprint(spark, dir).collect().toSeq
    val fp2 = TextOps.t4Fingerprint(spark, dir).collect().toSeq
    assert(fp1 == fp2)
    assert(fp1.forall { r =>
      val v = r.getLong(1); v >= 0L && v < 2147483647L
    })
  }

  test("entry: flagship query returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("contract: every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // every query is hash-gated: no rows-only entries remain (m2's
    // byte-histogram decode got a per-byte DuckDB oracle in round 2)
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"unexpected rows-only: $rowsOnly")
  }
}
