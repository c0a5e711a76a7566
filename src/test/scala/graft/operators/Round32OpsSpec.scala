package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariant laws for the q61/g43/t34/e34 batch: the grouped OLS
  * slope must match an independent double-precision refit (q61), the
  * component node/edge census must conserve the graph totals and
  * respect the tree floor (g43), every reported collocation lift must
  * reproduce from independently recounted marginals (t34), and the
  * per-day peak concurrency must equal a brute-force minute sweep
  * over the very same session set (e34). */
class Round32OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("q61: integer ppm slope matches a double-precision refit per brand") {
    val rows = Relational.q61Regression(spark, dir).collect()
    assert(rows.nonEmpty)
    val li = graft.sources.Tables.load(spark, dir, "lineitem")
      .join(graft.sources.Tables.load(spark, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_quantity").cast("double"),
        col("l_extendedprice").cast("double"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2) * 100))
      .groupBy(_._1)
    rows.foreach { r =>
      val xs = li(r.getAs[String]("brand"))
      val n = xs.size.toDouble
      val (sx, sy) = (xs.map(_._2).sum, xs.map(_._3).sum)
      val sxy = xs.map(t => t._2 * t._3).sum
      val sxx = xs.map(t => t._2 * t._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val got = r.getAs[Long]("slope_ppm").toDouble / 1e6
      assert(math.abs(got - slope) < 2e-6 + math.abs(slope) * 1e-9,
        s"${r.getAs[String]("brand")}: refit $slope vs shipped $got")
      val s0 = sxy / sxx
      assert(math.abs(r.getAs[Long]("slope0_ppm").toDouble / 1e6 - s0) < 2e-6,
        "through-origin slope refit")
      assert(r.getAs[Long]("n_items") == xs.size)
    }
  }

  test("g43: census conserves graph totals and holds the tree floor") {
    val rows = graph.GraphOps.g43Cyclomatic(spark, dir).collect()
    assert(rows.nonEmpty)
    val sym = graph.GraphTables.sym(spark, dir)
    val nNodes = sym.select(col("src")).union(sym.select(col("dst")))
      .distinct().count()
    val nEdges = sym.filter(col("src") < col("dst")).count()
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == nNodes,
      "every node belongs to exactly one component")
    assert(rows.map(_.getAs[Long]("n_edges")).sum == nEdges,
      "every canonical edge lands in exactly one component")
    rows.foreach { r =>
      assert(r.getAs[Long]("cycle_rank") >= 0L,
        s"connected component has E >= V-1: $r")
      assert(r.getAs[Long]("cycle_rank") ==
        r.getAs[Long]("n_edges") - r.getAs[Long]("n_nodes") + 1)
      // isolated-node components (if any) are trees with 0 edges
      if (r.getAs[Long]("n_nodes") == 1L)
        assert(r.getAs[Long]("n_edges") == 0L)
    }
  }

  test("t34: every reported lift reproduces from recounted marginals") {
    val rows = text.TextOps.t34Collocations(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // independent recount straight off the documents table
    val pairCounts = graft.sources.Tables.load(spark, dir, "documents")
      .select(split(col("text"), " ").as("ws")).collect()
      .iterator.flatMap(_.getSeq[String](0).sliding(2).filter(_.size == 2))
      .map(s => (s(0), s(1))).toSeq
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = pairCounts.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val c2 = pairCounts.groupBy(_._1._2).map { case (k, v) => k -> v.values.sum }
    val total = pairCounts.values.sum
    var prev = Long.MaxValue
    rows.foreach { r =>
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      val np = pairCounts((w1, w2))
      assert(np == r.getAs[Long]("n_pair"), s"recount of ($w1,$w2)")
      assert(np >= 5L, "MinColloc floor")
      val lift = (BigInt(np) * total * 1000000) / (BigInt(c1(w1)) * c2(w2))
      assert(lift == BigInt(r.getAs[Long]("lift_ppm")),
        s"exact integer lift of ($w1,$w2)")
      assert(r.getAs[Long]("lift_ppm") <= prev, "ranked by lift desc")
      prev = r.getAs[Long]("lift_ppm")
    }
  }

  test("e34: per-day peak equals a brute-force endpoint sweep") {
    val got = graft.streaming.EventOps.e34PeakConcurrency(spark, dir).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Long]("peak_concurrent")).toMap
    val sess = graft.streaming.EventStreams.sessions(
      graft.sources.Tables.load(spark, dir, "events"))
      .select(col("session_start"), col("session_end")).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime))
    // exact sweep: sort all endpoints; starts before ends at a tie is
    // WRONG for half-open intervals — an end at t closes before a
    // start at t opens, matching the operator's per-timestamp NET
    val deltas = (sess.map(s => (s._1, 1)) ++ sess.map(s => (s._2, -1)))
      .groupBy(_._1).map { case (t, v) => (t, v.map(_._2).sum) }
      .toArray.sortBy(_._1)
    var open = 0L
    val peaks = scala.collection.mutable.Map.empty[String, Long]
    val dayFmt = new java.text.SimpleDateFormat("yyyy-MM-dd")
    dayFmt.setTimeZone(java.util.TimeZone.getDefault)
    var lastDay: String = null
    deltas.foreach { case (t, d) =>
      val day = dayFmt.format(new java.util.Date(t))
      if (day != lastDay && lastDay != null) {
        // carry-in counts as that day's floor peak
        peaks(day) = math.max(peaks.getOrElse(day, Long.MinValue), open)
      }
      lastDay = day
      open += d
      peaks(day) = math.max(peaks.getOrElse(day, Long.MinValue), open)
    }
    // operator emits one row per day with session activity (deltas)
    got.foreach { case (day, peak) =>
      assert(peaks.contains(day), s"sweep knows day $day")
      assert(peaks(day) == peak, s"$day: sweep ${peaks(day)} vs shipped $peak")
    }
    assert(got.nonEmpty)
  }
}
