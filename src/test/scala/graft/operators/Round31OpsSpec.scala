package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariant laws for the t33/g42/q60 batch: word-length histogram
  * mass conservation and cumulative-share discipline (t33),
  * conductance bounds and cut symmetry against the LPA labels (g42),
  * and HHI bounds — the index must sit between the perfect-equality
  * floor and the monopoly ceiling, and a one-supplier month must hit
  * the ceiling exactly (q60). */
class Round31OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("t33: histogram mass equals the corpus word count per source") {
    val rows = text.TextOps.t33WordlenHistogram(spark, dir).collect()
    val words = graft.sources.Tables.load(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      assert(rs.map(_.getAs[Long]("n_words")).sum == words(src),
        s"$src: histogram must cover every word once")
      val ordered = rs.sortBy(_.getAs[Long]("wlen"))
      var prev = -1L
      ordered.foreach { r =>
        val c = r.getAs[Long]("cum_ppm")
        assert(c >= prev, s"$src: cumulative share must be monotone")
        prev = c
        assert(r.getAs[Long]("share_ppm") <= c)
      }
      assert(prev >= 999990L && prev <= 1000000L,
        s"$src: cumulative share ends at ~1e6 ppm, got $prev")
    }
  }

  test("g42: conductance is bounded and the cut is internally consistent") {
    val rows = graph.GraphOps.g42Conductance(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cut") <= r.getAs[Long]("vol"),
        "a community cannot cut more than its volume")
      val phi = r.getAs[Long]("conductance_ppm")
      assert(phi >= 0L && phi <= 1000000L)
      assert(r.getAs[Long]("vol") >= 10L, "tail bound holds")
    }
    // total cut volume is symmetric: each cross edge is counted once
    // from each side, so the global cut sum over ALL communities is
    // even. Recompute without the vol floor.
    val sym = graph.GraphTables.sym(spark, dir)
    val lbl = graph.GraphOps.g17LabelPropagation(spark, dir)
    val cross = sym
      .join(lbl.select(col("node_id").as("src"), col("community").as("la")), Seq("src"))
      .join(lbl.select(col("node_id").as("dst"), col("community").as("lb")), Seq("dst"))
      .filter(col("la") =!= col("lb")).count()
    assert(cross % 2 == 0, "directed sym double-counts each cross edge")
  }

  test("m21: freeze transitions agree with the m6 delta census per doc") {
    val freeze = multimodal.MultimodalOps.m21FreezeDetect(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val shots = multimodal.MultimodalOps.m6ShotDetect(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(freeze.keySet == shots.keySet, "same nf >= 2 doc universe as m6")
    freeze.foreach { case (id, r) =>
      val nTrans = r.getAs[Long]("n_frames") - 1
      assert(r.getAs[Long]("n_frozen") <= nTrans)
      assert(r.getAs[Long]("max_freeze") <= r.getAs[Long]("n_frozen"))
      assert((r.getAs[Long]("max_freeze") == 0L) ==
        (r.getAs[Long]("n_frozen") == 0L))
      // a frozen transition has delta 0 < ShotDelta, so a doc whose
      // every transition is a shot boundary cannot have any freeze
      if (shots(id).getAs[Long]("n_shots") - 1 == nTrans)
        assert(r.getAs[Long]("n_frozen") == 0L)
    }
  }

  test("q60: HHI sits between equality floor and monopoly ceiling") {
    val rows = Relational.q60Hhi(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, top, hhi) = (r.getAs[Long]("n_suppliers"),
        r.getAs[Long]("top_share_ppm"), r.getAs[Long]("hhi"))
      assert(hhi <= 1000000L, s"HHI above the monopoly ceiling: $r")
      // floor: n equal shares give n*(1e6/n)^2/1e6 = 1e6/n (integer
      // truncation can only lower each share, so allow slack of n)
      assert(hhi >= 1000000L / n - n, s"HHI below equality floor: $r")
      assert(top * top / 1000000L <= hhi,
        s"top supplier alone must not exceed the index: $r")
      if (n == 1L) assert(hhi == 1000000L, s"monopoly month must hit 1e6: $r")
    }
  }
}
