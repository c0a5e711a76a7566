package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Invariant laws for the q63/d30/s47/e36 batch: the Benford table
  * must be a probability distribution and shares must conserve (q63),
  * the bucket census must conserve band rows and reproduce by brute
  * force (d30), the MMR selection must equal a driver-side greedy
  * replay over the same pool (s47), and the bot gauges must equal an
  * event-log recount (e36). */
class Round34OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("q63: Benford constants are a distribution; shares conserve") {
    val rows = Relational.q63Benford(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("benford_ppm")).sum == 1000000L,
      "the hardcoded Benford table sums to exactly 1e6 ppm")
    val total = rows.map(_.getAs[Long]("n")).sum
    val shareSum = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shareSum <= 1000000L && shareSum >= 1000000L - rows.length,
      "digit shares conserve up to one-ppm truncation per digit")
    rows.foreach { r =>
      val d = r.getAs[Long]("digit")
      assert(d >= 1L && d <= 9L)
      assert(r.getAs[Long]("share_ppm") == r.getAs[Long]("n") * 1000000L / total)
      assert(r.getAs[Long]("delta_ppm") ==
        r.getAs[Long]("share_ppm") - r.getAs[Long]("benford_ppm"))
    }
  }

  test("d30: bucket census conserves band rows and reproduces by brute force") {
    val rows = dedup.DedupOps.d30BucketStats(spark, dir).collect()
    assert(rows.length == 16, "one row per band")
    val bands = dedup.DedupOps.bandTable(spark, dir).collect()
      .map(r => (r.getAs[Int]("band"), r.getAs[Long]("bkey")))
    val nDocs = bands.length / 16
    rows.foreach { r =>
      val band = r.getAs[Int]("band")
      assert(r.getAs[Long]("n_rows") == nDocs,
        "every doc lands in exactly one bucket per band")
      val ks = bands.filter(_._1 == band).groupBy(_._2).values.map(_.size.toLong)
      assert(r.getAs[Long]("n_buckets") == ks.size)
      assert(r.getAs[Long]("max_bucket") == ks.max)
      assert(r.getAs[Long]("n_dropped") == ks.count(_ > 200L))
      assert(r.getAs[Long]("pair_volume") ==
        ks.filter(_ <= 200L).map(k => k * (k - 1) / 2).sum)
    }
  }

  test("s47: the MMR selection equals a driver-side greedy replay") {
    val got = similarity.SimilarityOps.s47Mmr(spark, dir).collect()
    assert(got.length == 50, "10 queries x 5 ranks")
    // replay: exact cosines in driver doubles over the same vectors
    val e = graft.sources.Tables.load(spark, dir, "embeddings").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]) =
      (0 until 64).foldLeft(0.0)((s, i) => s + a(i) * b(i))
    def cos(a: Long, b: Long) =
      dot(e(a), e(b)) / (math.sqrt(dot(e(a), e(a))) * math.sqrt(dot(e(b), e(b))))
    got.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      // pool: top-25 by (cosine desc, id asc)
      val pool = e.keys.filter(_ != q).toSeq
        .map(c => c -> cos(q, c)).sortBy { case (c, s) => (-s, c) }.take(25)
      var sel = Vector(pool.head)
      for (_ <- 2 to 5) {
        val cand = pool.filterNot(p => sel.exists(_._1 == p._1))
        val pick = cand.map { case (c, rel) =>
          (c, rel, rel - sel.map(s => cos(c, s._1)).max)
        }.sortBy { case (c, _, sc) => (-sc, c) }.head
        sel = sel :+ (pick._1 -> pick._2)
      }
      val gotIds = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("neighbor_id"))
      assert(gotIds.toSeq == sel.map(_._1),
        s"query $q: greedy replay ${sel.map(_._1)} vs shipped ${gotIds.toSeq}")
      // the diversified tail may reorder relevance, but rank 1 is the
      // plain argmax by construction
      assert(gotIds.head == pool.head._1)
    }
  }

  test("m22: shot lengths conserve frames and agree with the m6 census") {
    val rows = multimodal.MultimodalOps.m22SceneLengths(spark, dir).collect()
    assert(rows.nonEmpty)
    val m6 = multimodal.MultimodalOps.m6ShotDetect(spark, dir).collect()
    val frames = m6.map(_.getAs[Long]("n_frames")).sum
    val shots = m6.map(_.getAs[Long]("n_shots")).sum
    assert(rows.map(r => r.getAs[Long]("shot_len") * r.getAs[Long]("n_shots")).sum
      == frames, "every frame belongs to exactly one shot")
    assert(rows.map(_.getAs[Long]("n_shots")).sum == shots,
      "histogram mass equals the m6 per-doc shot total")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_shots"))
      assert(r.getAs[Long]("shot_len") >= 1L)
    }
  }

  test("e36: bot gauges equal an event-log recount") {
    val rows = graft.streaming.EventOps.e36BotScore(spark, dir).collect()
    val ev = graft.sources.Tables.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    assert(rows.map(_.getAs[Long]("user_id")).toSet == ev.keySet)
    rows.foreach { r =>
      val es = ev(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_events") == es.length)
      val mins = es.map(t => t._2 - (t._2 % 60000000L))
      assert(r.getAs[Long]("active_minutes") == mins.distinct.length)
      assert(r.getAs[Long]("max_per_min") ==
        mins.groupBy(identity).values.map(_.size).max)
      val sorted = es.sortBy(t => (t._2, t._4)).map(_._2)
      val gaps = sorted.zip(sorted.tail).map { case (a, b) => b - a }
      assert(r.getAs[Long]("min_gap_us") ==
        (if (gaps.isEmpty) -1L else gaps.min))
      val top = es.groupBy(_._3).values.map(_.size.toLong).max
      assert(r.getAs[Long]("top_type_ppm") == top * 1000000L / es.length)
    }
  }
}
