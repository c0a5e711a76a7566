package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariant laws for the q62/g44/t35/e35 batch: chi-square cell
  * algebra must conserve marginals and match a double refit (q62),
  * the SSSP vector must be a true Bellman–Ford fixpoint — feasible
  * AND tight on every edge (g44), every overlap row must reproduce
  * from an independent vocabulary recount (t35), and the JSON-field
  * stats must equal a driver-side re-parse (e35). */
class Round33OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("q62: marginals conserve and contributions match a double refit") {
    val rows = Relational.q62Chi2(spark, dir).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("observed")).sum
    // expected counts conserve mass up to one milli-unit of
    // truncation per cell
    val expSum = rows.map(_.getAs[Long]("expected_milli")).sum
    assert(expSum <= 1000L * n && expSum >= 1000L * n - rows.length,
      s"Σ expected = N up to truncation: $expSum vs ${1000L * n}")
    val rowM = rows.groupBy(_.getAs[String]("priority"))
      .map { case (_, rs) => rs.map(_.getAs[Long]("observed")).sum }
    val colM = rows.groupBy(_.getAs[String]("segment"))
      .map { case (_, rs) => rs.map(_.getAs[Long]("observed")).sum }
    assert(rowM.sum == n && colM.sum == n)
    rows.foreach { r =>
      val o = r.getAs[Long]("observed").toDouble
      val rm = rows.filter(_.getAs[String]("priority") == r.getAs[String]("priority"))
        .map(_.getAs[Long]("observed")).sum.toDouble
      val cm = rows.filter(_.getAs[String]("segment") == r.getAs[String]("segment"))
        .map(_.getAs[Long]("observed")).sum.toDouble
      val e = rm * cm / n
      val contrib = (o - e) * (o - e) / e
      val got = r.getAs[Long]("contrib_ppm").toDouble / 1e6
      assert(math.abs(got - contrib) < 2e-6 + contrib * 1e-9,
        s"cell (${r.get(0)},${r.get(1)}): refit $contrib vs shipped $got")
    }
  }

  test("g44: the distance vector is a feasible AND tight BF fixpoint") {
    val d = graph.GraphOps.g44WeightedSssp(spark, dir).collect()
      .map(r => r.getAs[Long]("node_id") -> r.getAs[Long]("dist_micro")).toMap
    val edges = graph.GraphTables.weightedEdges(spark, dir)
      .select(col("src"), col("dst"),
        greatest(lit(1L), expr("CAST(1000000 AS BIGINT) div w")).as("cost"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val seed = edges.map(_._1).min
    assert(d(seed) == 0L, "seed distance is zero")
    // feasibility: no edge can shorten any label
    edges.foreach { case (u, v, c) =>
      if (d.contains(u))
        assert(d.contains(v) && d(v) <= d(u) + c,
          s"edge $u->$v (cost $c) violates d($v)=${d.get(v)} <= ${d(u)} + $c")
    }
    // tightness: every non-seed label is achieved by a witness edge
    val best = edges.filter(e => d.contains(e._1))
      .groupBy(_._2).map { case (v, es) => v -> es.map(e => d(e._1) + e._3).min }
    d.foreach { case (v, dist) =>
      if (v != seed)
        assert(best(v) == dist, s"$v: min in-edge ${best(v)} vs shipped $dist")
    }
    // reach = the seed's connected component (weights never disconnect)
    val comp = graph.GraphOps.g11ComponentsConverged(spark, dir).collect()
    val seedComp = comp.find(_.getAs[Long]("node_id") == seed).get
      .getAs[Long]("component")
    val compSize = comp.count(_.getAs[Long]("component") == seedComp)
    assert(d.size == compSize, s"reached ${d.size} vs component $compSize")
  }

  test("t35: every overlap row reproduces from an independent recount") {
    val rows = text.TextOps.t35SourceOverlap(spark, dir).collect()
    assert(rows.nonEmpty)
    val vocab = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .groupBy(_.getString(0))
      .map { case (s, rs) =>
        s -> rs.flatMap(_.getString(1).split(" ")).toSet }
    // every unordered source pair with a nonzero intersection appears
    val expectPairs = vocab.keys.toSeq.sorted.combinations(2)
      .filter { case Seq(a, b) => (vocab(a) & vocab(b)).nonEmpty }.size
    assert(rows.length == expectPairs)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
      assert(a < b, "canonical pair order")
      val (va, vb) = (vocab(a), vocab(b))
      val shared = (va & vb).size.toLong
      assert(r.getAs[Long]("v_a") == va.size && r.getAs[Long]("v_b") == vb.size)
      assert(r.getAs[Long]("shared") == shared)
      assert(r.getAs[Long]("jaccard_ppm") ==
        shared * 1000000L / (va.size + vb.size - shared))
      assert(r.getAs[Long]("containment_ppm") ==
        shared * 1000000L / math.min(va.size, vb.size))
    }
  }

  test("e35: JSON field stats equal a driver-side re-parse") {
    val rows = graft.streaming.EventOps.e35PropsStats(spark, dir).collect()
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select(col("event_type"), col("user_id"), col("props")).collect()
      .map { r =>
        val m = """"k":\s*(-?\d+)""".r.findFirstMatchIn(r.getString(2))
        (r.getString(0), r.getLong(1), m.map(_.group(1).toLong))
      }.groupBy(_._1)
    assert(rows.map(_.getAs[String]("event_type")).toSet == ev.keySet)
    rows.foreach { r =>
      val es = ev(r.getAs[String]("event_type"))
      val ks = es.flatMap(_._3).sorted
      assert(r.getAs[Long]("n_events") == es.length)
      assert(r.getAs[Long]("n_with_k") == ks.length)
      assert(r.getAs[Long]("k_min") == ks.min)
      assert(r.getAs[Long]("k_max") == ks.max)
      assert(r.getAs[Long]("k_sum") == ks.sum)
      // percentile_disc(0.5): the pinned index = ceil(p*n) convention
      assert(r.getAs[Long]("k_med") == ks((ks.length + 1) / 2 - 1),
        "median is the ceil(p*n)-th order statistic")
      assert(r.getAs[Long]("n_users") == es.map(_._2).distinct.length)
    }
  }
}
