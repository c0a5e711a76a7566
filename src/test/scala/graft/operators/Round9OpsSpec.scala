package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession
import graft.operators.graph.GraphOps

/** Semantic invariants of the round-9 batch beyond the row-hash gate:
  * rectangle counts on hand graphs, the SQ8 error bound, chunk-manifest
  * coverage, attribution partitioning and lexical-diversity ordering. */
class Round9OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("g26: C4 has one rectangle, K4 has three; c2_sum is even on real data") {
    import spark.implicits._
    // square 1-2-3-4-1: diagonals {1,3} and {2,4} each see cn=2
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val r1 = GraphOps.fourCyclesOf(c4).collect()(0)
    assert(r1.getAs[Long]("c2_sum") == 2L && r1.getAs[Long]("n_four_cycles") == 1L)
    // K4: 6 diagonal pairs, each cn=2 (the other two vertices) → 3 cycles
    val nodes = Seq(1L, 2L, 3L, 4L)
    val k4 = (for (a <- nodes; b <- nodes if a != b) yield (a, b)).toDF("src", "dst")
    val r2 = GraphOps.fourCyclesOf(k4).collect()(0)
    assert(r2.getAs[Long]("n_diagonal_pairs") == 6L)
    assert(r2.getAs[Long]("n_four_cycles") == 3L)
    // the internal witness on real data: every cycle is counted via
    // exactly two diagonals, so the C(2) sum is even
    val real = graft.SparkEntry.queries("g26_four_cycles")(spark, dir).collect()(0)
    assert(real.getAs[Long]("c2_sum") % 2 == 0, "diagonal double-count broke")
  }

  test("v8: codes stay in [0,255] and reconstruction error is within the step bound") {
    val sc = graft.operators.vector.VectorOps.sqCodes(spark, dir)
      .select(col("vec_id"),
        expr("array_min(codes)").as("cmin"), expr("array_max(codes)").as("cmax"),
        // per-vector bound: Σ_d (floor step + 1) — floor-div quantize
        // then floor-div decode can each lose at most one step unit
        expr("""aggregate(sequence(1, 64), cast(0 as bigint), (a, d) ->
          |  a + (element_at(mxv, d) - element_at(mnv, d)) div 255 + 1)""".stripMargin)
          .as("bound"),
        expr(s"""aggregate(sequence(1, 64), cast(0 as bigint), (a, d) ->
          |  a + abs(element_at(qv, d) - element_at(
          |    ${graft.operators.vector.VectorOps.sqReconExpr}, d)))""".stripMargin)
          .as("err"))
      .agg(min(col("cmin")).as("lo"), max(col("cmax")).as("hi"),
        max(col("err") - col("bound")).as("worst_slack"))
      .collect()(0)
    assert(sc.getAs[Int]("lo") >= 0 && sc.getAs[Int]("hi") <= 255)
    assert(sc.getAs[Long]("worst_slack") <= 0L,
      "reconstruction error exceeded the quantization step bound")
  }

  test("m10: chunks tile every payload — start at 1, end at n, no gap beyond the stride") {
    val docs = graft.operators.multimodal.MultimodalOps.withBlob(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
    val cover = graft.SparkEntry.queries("m10_chunk_manifest")(spark, dir)
      .groupBy(col("doc_id"))
      .agg(min(col("off")).as("first_off"), max(col("off") + col("len") - 1).as("last_end"),
        min(col("len")).as("min_len"), count(lit(1)).as("n_chunks"))
      .join(docs, Seq("doc_id"))
    assert(cover.filter(col("first_off") =!= 1L || col("last_end") =!= col("n")
        || col("min_len") < 1L).count() == 0,
      "every payload must be tiled exactly from 1 to n")
  }

  test("e18: channels partition the purchases; direct has no latency") {
    val purchases = graft.sources.Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase").count()
    val rows = graft.SparkEntry.queries("e18_attribution")(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_conversions")).sum == purchases,
      "attribution must partition the purchase set")
    rows.filter(_.getAs[String]("channel") == "direct")
      .foreach(r => assert(r.isNullAt(r.fieldIndex("sum_latency_us")),
        "direct conversions carry no latency"))
  }

  test("q40: cumulative share ends at exactly 1e6 and never decreases") {
    val rows = graft.SparkEntry.queries("q40_pareto")(spark, dir)
      .orderBy(col("cum_ppm")).collect()
    assert(rows.last.getAs[Long]("cum_ppm") == 1000000L,
      "the full prefix must account for all revenue")
    assert(rows.last.getAs[String]("abc_class") == "C")
    val ppms = rows.map(_.getAs[Long]("cum_ppm"))
    assert(ppms.zip(ppms.tail).forall { case (a, b) => a <= b },
      "cumulative share must be monotone")
  }

  test("g27: each seed reaches itself at dist 0; counts stay positive") {
    val rows = graft.SparkEntry.queries("g27_reach_profile")(spark, dir).collect()
    val bySeed = rows.groupBy(_.getAs[Long]("seed"))
    assert(bySeed.size == 4, "four deterministic seeds")
    bySeed.foreach { case (_, rs) =>
      val d0 = rs.filter(_.getAs[Int]("dist") == 0)
      assert(d0.length == 1 && d0.head.getAs[Long]("n_nodes") == 1L,
        "level 0 is the seed itself")
      assert(rs.forall(_.getAs[Long]("n_nodes") > 0L))
    }
  }

  test("d17: a doc verbatim-contained in another scores containment 1e6 on the short side") {
    // containment is computed from the same sorted shingle arrays the
    // d4 verifier uses — check the identity on a quote pair: B = A
    // plus a long suffix → every 3-gram of A appears in B
    import spark.implicits._
    val a = (1 to 20).map(i => s"w$i").mkString(" ")
    val b = a + " " + (100 to 140).map(i => s"w$i").mkString(" ")
    val sh = graft.operators.dedup.DedupOps.shinglesOf(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"))
    graft.functions.GraftFunctions.registerAll(spark)
    val r = sh.as("x").join(sh.as("y"),
        col("x.doc_id") < col("y.doc_id"))
      .select(
        expr("cast(graft_sorted_intersect_count(x.shingles, y.shingles) as bigint)")
          .as("inter"),
        size(col("x.shingles")).cast("long").as("na"))
      .collect()(0)
    assert(r.getAs[Long]("inter") == r.getAs[Long]("na"),
      "every shingle of the quoted doc must appear in the quoting doc")
  }

  test("e19: user buckets partition the user base") {
    val users = graft.sources.Tables.load(spark, dir, "events")
      .select(col("user_id")).distinct().count()
    val rows = graft.SparkEntry.queries("e19_churn")(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users)
  }

  test("t19: hapax <= types <= tokens, and ppm ratios stay in [0, 1e6]") {
    graft.SparkEntry.queries("t19_lexical_diversity")(spark, dir).collect()
      .foreach { r =>
        val (ty, to, ha) = (r.getAs[Long]("n_types"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_hapax"))
        assert(ha <= ty && ty <= to, s"ordering broke: $ha $ty $to")
        assert(r.getAs[Long]("ttr_ppm") <= 1000000L
          && r.getAs[Long]("hapax_ppm") <= 1000000L)
      }
  }
}
