package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariant laws for the m20/e33/t32/q58 batch: A/V-alignment
  * consistency against the independently-gated m6/m7 parents (the
  * composite must agree with both), Lorenz-curve convexity and mass
  * conservation (e33), dedup token accounting against d6's keep set
  * (t32), and multi-distinct consistency against single-key
  * recounts (q58). */
class Round29OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("m20: composite agrees with the m6 and m7 parents per doc") {
    val sync = multimodal.MultimodalOps.m20AvSync(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val shots = multimodal.MultimodalOps.m6ShotDetect(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shots")).toMap
    assert(sync.keySet == shots.keySet, "same doc universe as m6 (nf >= 2)")
    sync.foreach { case (id, r) =>
      assert(r.getAs[Long]("n_bounds") + 1 == shots(id),
        s"doc $id: boundary count disagrees with the gated m6 row")
      assert(r.getAs[Long]("n_aligned") <= r.getAs[Long]("n_bounds"))
      assert(r.getAs[Long]("n_aligned") <= r.getAs[Long]("n_silent"))
      assert(r.getAs[Long]("n_silent") <= r.getAs[Long]("n_frames"))
    }
    val m7 = multimodal.MultimodalOps.m7SilenceDetect(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_silent")).toMap
    sync.foreach { case (id, r) =>
      assert(r.getAs[Long]("n_silent") == m7(id),
        s"doc $id: silent-frame count disagrees with the gated m7 row")
    }
  }

  test("e33: Lorenz curve is convex, conserving users and events") {
    val rows = graft.streaming.EventOps.e33ActivityLorenz(spark, dir).collect()
      .sortBy(_.getAs[Long]("decile"))
    val ev = graft.sources.Tables.load(spark, dir, "events")
    assert(rows.map(_.getAs[Long]("n_users")).sum ==
      ev.select(col("user_id")).distinct().count())
    assert(rows.map(_.getAs[Long]("n_events")).sum == ev.count())
    // ranked ascending: each decile's PER-USER average rises (decile
    // user counts differ by one when nu % 10 != 0, so compare
    // cross-multiplied — every user in a later decile has a count >=
    // every user in an earlier one)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_events") * b.getAs[Long]("n_users") <=
          b.getAs[Long]("n_events") * a.getAs[Long]("n_users"),
          "per-user mean must rise along the rank")
      case _ =>
    }
    assert(rows.last.getAs[Long]("cum_share_ppm") == 1000000L ||
      rows.last.getAs[Long]("cum_share_ppm") == 999999L,
      "cumulative share ends at ~1 (integer floor)")
    var prev = 0L
    rows.foreach { r =>
      val c = r.getAs[Long]("cum_share_ppm")
      assert(c >= prev, "cumulative share is monotone")
      prev = c
    }
  }

  test("t32: token accounting matches d6's keep set exactly") {
    val rows = text.TextOps.t32DedupImpact(spark, dir).collect()
    val d = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("toks"))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == d.count())
    assert(rows.map(_.getAs[Long]("n_tokens")).sum ==
      d.agg(sum(col("toks"))).collect().head.getLong(0))
    val nDropped = dedup.DedupOps.d6DupClusters(spark, dir)
      .filter(col("doc_id") =!= col("cluster_id")).count()
    assert(rows.map(r => r.getAs[Long]("n_docs") - r.getAs[Long]("kept_docs")).sum
      == nDropped, "dropped docs across sources = d6's non-keeper rows")
    rows.foreach { r =>
      assert(r.getAs[Long]("kept_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("n_tokens"))
      val ppm = r.getAs[Long]("retained_ppm")
      assert(ppm >= 0L && ppm <= 1000000L)
    }
  }

  test("q58: each distinct count matches its single-key recount") {
    val rows = Relational.q58MultiDistinct(spark, dir).collect()
    val base = graft.sources.Tables.load(spark, dir, "lineitem")
      .join(graft.sources.Tables.load(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        col("o_custkey"), col("l_suppkey"))
    val buyers = base.select(col("month"), col("o_custkey")).distinct()
      .groupBy(col("month")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val supps = base.select(col("month"), col("l_suppkey")).distinct()
      .groupBy(col("month")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[String]("month")
      assert(r.getAs[Long]("n_buyers") == buyers(m), s"$m buyers recount")
      assert(r.getAs[Long]("n_suppliers") == supps(m), s"$m suppliers recount")
      assert(r.getAs[Long]("n_orders") >= r.getAs[Long]("n_buyers"),
        s"$m: an order has exactly one buyer")
    }
  }
}
