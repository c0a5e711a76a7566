package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Semantic invariants of the round-10 batch beyond the row-hash gate:
  * the band-join bucketing rewrite vs a direct non-equi join, edit
  * distance on hand pairs, rare-ratio bounds, gap accounting, and the
  * dHash gain-shift robustness that motivates it over aHash. */
class Round10OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("q41: bucketed band join ≡ direct non-equi join on the same data") {
    import spark.implicits._
    val p = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey").as("k"), col("p_brand").as("brand"),
        (col("p_retailprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    // reference: the O(n²) formulation Catalyst plans as a loop join —
    // fine at spec scale, the thing q41 exists to avoid at 100 TB
    val direct = p.as("x").join(p.as("y"),
        col("x.brand") === col("y.brand") && col("x.k") < col("y.k")
          && abs(col("x.cents") - col("y.cents")) <= 100L)
      .groupBy(col("x.brand").as("brand")).agg(count(lit(1)).as("n_pairs"))
    val bucketed = graft.SparkEntry.queries("q41_band_join")(spark, dir)
      .select(col("brand"), col("n_pairs"))
    assert(bucketed.except(direct).isEmpty && direct.except(bucketed).isEmpty)
  }

  test("d18: levenshtein matches hand-computed distances and dup rule") {
    import spark.implicits._
    val d = Seq(("kitten", "sitting", 3), ("abc", "abc", 0), ("abc", "axc", 1))
      .toDF("a", "b", "want")
      .withColumn("got", levenshtein(col("a"), col("b")))
    assert(d.filter(col("got") =!= col("want")).isEmpty)
    // every gated pair respects the integer dup rule
    val r = graft.SparkEntry.queries("d18_lev_dedup")(spark, dir)
    assert(r.filter(col("is_dup") =!= (col("lev") * 5 <= col("len_max"))).isEmpty)
    assert(r.filter(col("lev") > col("len_max")).isEmpty,
      "edit distance cannot exceed the longer prefix")
  }

  test("t20: rare ratio is a valid ppm and hapax-heavy docs rank high") {
    val r = graft.SparkEntry.queries("t20_rare_tokens")(spark, dir)
    assert(r.filter(col("rare_ppm") < 0 || col("rare_ppm") > 1000000L).isEmpty)
    assert(r.filter(col("n_rare") > col("n_tokens")).isEmpty)
    // token accounting: Σ n_tokens over docs = corpus token count
    val total = r.agg(sum("n_tokens")).collect()(0).getLong(0)
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(total == corpus)
  }

  test("e20: gap accounting — Σ n_gaps = events - users; totals bound the max") {
    val r = graft.SparkEntry.queries("e20_interarrival")(spark, dir)
    val gaps = r.agg(sum("n_gaps")).collect()(0).getLong(0)
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(gaps == expected, s"gaps $gaps != events-users $expected")
    assert(r.filter(col("max_gap_us") > col("total_gap_us")).isEmpty)
    assert(r.filter(col("p50_gap_us") > col("max_gap_us")).isEmpty)
  }

  test("m11: dHash is invariant under uniform gain shift; aHash is not designed to be") {
    import spark.implicits._
    // same gradient profile, +1 brightness on every char: dHash equal
    val base = "abcdefghij".flatMap(c => s"$c$c$c$c$c$c$c").mkString
    val shifted = base.map(c => (c + 1).toChar)
    val d = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val h = graft.operators.multimodal.MultimodalOps.dHashesOf(d).collect()
    val m = h.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m(1L) == m(2L), "uniform gain shift must not change dHash")
  }
}
