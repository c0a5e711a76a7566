package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariant laws for the q56/g41/e32/t31 batch: weighted-quantile
  * ordering and mass accounting (q56), DAG-layering partition and
  * tag-chain structure (g41), streak accounting vs the raw user-day
  * set (e32), and vocabulary-growth conservation (t31 — the curve
  * must end at exactly the source's distinct-token count). The driver
  * gate proves value-exactness vs DuckDB; these pin the structural
  * laws a refactor could break while staying oracle-matching.
  */
class Round27OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("q56: weighted quartiles are ordered and carry the full revenue mass") {
    val rows = Relational.q56WeightedMedian(spark, dir).collect()
    assert(rows.nonEmpty)
    val total = graft.sources.Tables.load(spark, dir, "lineitem")
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long")).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("total_cents")).sum == total,
      "per-flag totals must partition the corpus revenue")
    rows.foreach { r =>
      val (a, m, b) = (r.getAs[Long]("wq1_qty"),
        r.getAs[Long]("wmedian_qty"), r.getAs[Long]("wq3_qty"))
      assert(a <= m && m <= b, s"quartiles out of order: $r")
      assert(a >= 1L && b <= 50L, s"quantity outside its domain: $r")
      assert(r.getAs[Long]("n_levels") >= 1L)
    }
  }

  test("g41: layers partition the node set and realize the tag chain") {
    val rows = graph.GraphOps.g41DagLayers(spark, dir).collect()
    val nV = graph.GraphTables.directed(spark, dir)
      .select(col("src").as("n"))
      .union(graph.GraphTables.directed(spark, dir).select(col("dst")))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == nV,
      "every node gets exactly one layer")
    rows.foreach { r =>
      val (layer, tag) = (r.getAs[Long]("layer"), r.getAs[Long]("tag"))
      assert(layer >= 0L && layer <= 5L)
      assert(r.getAs[Long]("min_vid") % 8 == tag)
      assert(r.getAs[Long]("max_vid") % 8 == tag)
      // layer(v) counts edges on a path ending at v, and every edge
      // raises the type tag by at least one — so layer <= tag always
      assert(layer <= tag, s"layer exceeds tag (non-monotone path?): $r")
    }
    // the spine of the derivation chain is always realized:
    // customer(0)->order(1)->part(2)->supplier(3) and nation->region
    val pairs = rows.map(r => (r.getAs[Long]("layer"), r.getAs[Long]("tag"))).toSet
    Seq((0L, 0L), (1L, 1L), (2L, 2L), (3L, 3L), (5L, 5L)).foreach { p =>
      assert(pairs.contains(p), s"missing spine layer $p in $pairs")
    }
    // customers have no in-edges: tag 0 appears ONLY at layer 0
    assert(rows.filter(_.getAs[Long]("tag") == 0L).forall(_.getAs[Long]("layer") == 0L))
  }

  test("e32: streak accounting matches the raw user-day set") {
    val rows = graft.streaming.EventOps.e32Streaks(spark, dir).collect()
    assert(rows.nonEmpty)
    val ud = graft.sources.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
    val nUserDays = ud.count()
    val nUsers = ud.select(col("user_id")).distinct().count()
    assert(rows.length.toLong == nUsers, "one row per active user")
    assert(rows.map(_.getAs[Long]("n_days")).sum == nUserDays,
      "streak lengths must partition the user-day set")
    rows.foreach { r =>
      val (d, s, l) = (r.getAs[Long]("n_days"),
        r.getAs[Long]("n_streaks"), r.getAs[Long]("longest_streak"))
      assert(s >= 1L && l >= 1L && l <= d)
      // n_streaks streaks of length <= longest cover all n_days
      assert(s * l >= d, s"streaks cannot cover the day set: $r")
    }
  }

  test("t31: vocabulary growth is monotone and ends at the exact vocab size") {
    val rows = text.TextOps.t31VocabGrowth(spark, dir).collect()
    assert(rows.nonEmpty)
    val vocab = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"))
      .agg(countDistinct(col("tok")).as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("decile"))
      // cumulative columns are running sums of the per-decile deltas
      var (ct, ctk) = (0L, 0L)
      ordered.foreach { r =>
        ct += r.getAs[Long]("new_types")
        assert(r.getAs[Long]("cum_types") == ct, s"cum_types drift at $r")
        assert(r.getAs[Long]("cum_tokens") > ctk, s"cum_tokens not increasing: $r")
        ctk = r.getAs[Long]("cum_tokens")
      }
      assert(ct == vocab(src),
        s"$src: curve must end at the exact distinct-token count")
    }
  }
}
