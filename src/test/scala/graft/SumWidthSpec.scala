package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Average, Sum}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The q74 lesson, made structural (r11 verdict item 3): q74's profit
  * sum shipped for 10 rounds with a 100 TB-only silent int64 wrap —
  * Spark's non-ANSI long Sum wraps on overflow while DuckDB promotes
  * BIGINT sums to HUGEINT, so the two engines agree at every tested
  * sf and diverge only at scales nobody gates. The dangerous shape is
  * specifically `sum(<integral expr containing attr×attr>)`: a
  * product of two corpus-magnitude columns can reach ~1e10+ per TERM,
  * so a per-group sum crosses 2^63 at large-but-realistic scale while
  * a plain column sum (terms ≤ ~1e6) needs ~1e13 rows per group to
  * wrap — not reachable in any gated grouping.
  *
  * This spec walks every gated query's ANALYZED plan (subqueries
  * included), collects every Sum AND Average — grouped, and
  * window-framed via alias expansion (r12 verdict item 4: the
  * analyzer hoists non-trivial window-aggregate children into `_w0`
  * pre-projections, so the product is invisible without substituting
  * alias definitions back in) — whose child is integer-typed and
  * whose accumulated magnitude contains an integral attr×attr
  * product, and fails unless the site is in the bounds table below —
  * each entry a per-term magnitude bound argument proving the int64
  * headroom at 100 TB (≳1e13 corpus rows), mirroring q74's fix
  * (accumulate in DECIMAL(38,0), narrow once at the end).
  */
class SumWidthSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(threads = 8, shufflePartitions = 8)
  private val dir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def hasAttr(e: Expression): Boolean =
    e.find(_.isInstanceOf[AttributeReference]).isDefined

  /** A Multiply with live columns on BOTH sides (`attr * lit` scales
    * by a constant, boundable by inspection, and is not flagged) — restricted to products that can
    * actually inflate the ACCUMULATED magnitude:
    *  - boolean subtrees are skipped — a product inside a CASE/IF
    *    predicate or comparison feeds a 0/1 decision, never the summed
    *    value (the m16 precedent, and the m7/m20 shape the expanded
    *    window walk surfaced: `sum(CASE WHEN frame·energy < total
    *    THEN 1 ELSE 0 END)` accumulates flags, not the product);
    *  - only INTEGRAL-typed Multiplys count — a DECIMAL(38) product is
    *    the q74 FIX (it cannot int64-wrap), so flagging it would mark
    *    already-widened sites (s52's r12-widened correlation sums). */
  private def hasMagnitudeProduct(e: Expression): Boolean = {
    // alias expansion can splice in nodes whose dataType is
    // unsupported (WindowSpecDefinition) — treat those as non-boolean
    // and keep walking
    val dt = scala.util.Try(e.dataType).toOption
    e match {
      case _ if dt.contains(BooleanType) => false
      case m: Multiply if isIntegral(m.dataType) && hasAttr(m.left) && hasAttr(m.right) => true
      case _ => e.children.exists(hasMagnitudeProduct)
    }
  }

  /** ExprId → definition for every Alias anywhere in the plan
    * (subqueries included). Window-framed aggregates NEED this:
    * the analyzer's ExtractWindowExpressions hoists any non-trivial
    * aggregate child into a `_w0` pre-projection, so the Sum the walk
    * sees is `sum(_w0)` and the attr×attr product lives one node
    * below — invisible to a child-only inspection (this was exactly
    * the r12 window-audit gap). The same substitution also sees
    * through user-written withColumn staging before an agg. */
  private def aliasDefs(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Map[ExprId, Expression] =
    plan.collectWithSubqueries { case p =>
      p.expressions.flatMap(_.collect { case a: Alias => a.exprId -> a.child })
    }.flatten.toMap

  /** Substitutes attribute references by their alias definitions,
    * transitively, depth-bounded (plans are trees so expansion
    * terminates; the bound is a cheap guard). */
  private def expand(e: Expression, defs: Map[ExprId, Expression], depth: Int = 8): Expression =
    if (depth == 0) e
    else e.transformUp {
      case ar: AttributeReference if defs.contains(ar.exprId) =>
        expand(defs(ar.exprId), defs, depth - 1)
    }

  /** Reviewed sites: (query, child-expression fragment that must
    * appear in the flagged sum, per-term bound argument). A site is
    * allowed ONLY with a written magnitude bound showing the 100 TB
    * per-group sum stays far inside int64. New flagged sites fail the
    * spec until either widened to DECIMAL(38,0) (preferred, the q74
    * fix — applied round 12 to g26/g38/q55/q61/t24/t25/t26 via
    * wordDocStats) or argued into this table.
    *
    * Corpus magnitudes used below: ≤1e12 corpus rows / ≤1e14 total
    * tokens at 100 TB; int64 max ≈ 9.2e18.
    */
  private val boundedSites: Seq[(String, String, String)] = Seq(
    ("d19_candidate_overlap", "coalesce(in_lsh, 0L) * coalesce(in_win, 0L)",
      "both factors are 0/1 membership flags; product ≤ 1, sum ≤ " +
        "candidate pairs ≤ 1e12 — 6 orders inside int64"),
    ("d30_bucket_stats", "(k * (k - CAST(1 AS BIGINT))) div CAST(2 AS BIGINT)",
      "the CASE caps k ≤ 200, so each term ≤ C(200,2) = 19 900; " +
        "sum ≤ 2e4 · 1e12 buckets = 2e16"),
    ("g26_four_cycles", "cn * (cn - CAST(1 AS BIGINT))",
      "WIDENED round 12: decimal(38,0) accumulator — this entry only " +
        "documents the former risk (uncapped cn); the detector no " +
        "longer fires here"),
    ("m5_ahash_dup", "bit * shiftleft(CAST(1 AS BIGINT)",
      "bit ∈ {0,1} and b < 32: the sum reassembles one 32-bit hash " +
        "half per group — ≤ 32 terms, each < 2^31, sum < 2^32"),
    ("m8_ahash_recall", "bit * shiftleft(CAST(1 AS BIGINT)",
      "same bit-pack-per-key shape as m5: sum < 2^32 per group"),
    ("m11_dhash_dup", "bit * shiftleft(CAST(1 AS BIGINT)",
      "same bit-pack-per-key shape as m5: sum < 2^32 per group"),
    ("m16_gain_normalize", "THEN c ELSE 0L END",
      "summed value is c (a run-length count ≤ samples-per-blob); " +
        "per-group sum ≤ blob samples ≤ 1e12; the a·208·n PREDICATE " +
        "product is ≤ 255·208·1e12 ≈ 5e16 — both inside int64"),
    ("m16_gain_normalize", "(a * c)",
      "a ≤ 255 (amplitude byte) × c run count: sum ≤ 255 · blob " +
        "samples ≤ 2.5e14 per group"),
    ("q55_abc_xyz", "(mq * mq)",
      "WIDENED round 12: decimal(38,0) accumulator; entry documents " +
        "the former risk (uncapped per-part-month quantity)"),
    ("q60_hhi", "(share_ppm * share_ppm)",
      "shares per group sum to ≤ 1e6 ppm, so Σ share² ≤ (Σ share)² " +
        "= 1e12 regardless of group size"),
    ("t38_token_entropy", "(length(bin(c)) - 1)",
      "Σ_terms c·⌊log2 c⌋ ≤ N·log2(N) ≤ 1e14 · 47 ≈ 5e15 for any " +
        "frequency split of N ≤ 1e14 total tokens"))

  private def isAllowed(name: String, childSql: String): Boolean =
    boundedSites.exists { case (q, frag, _) =>
      q == name && childSql.contains(frag)
    }

  test("every gated sum over an integral attr×attr product is decimal-accumulated or bounds-reviewed") {
    // r12 verdict item 4: the walk covers ALL positions the wrap shape
    // can hide in — grouped aggregates, window frames (a running
    // sum(attr×attr) over an expanding frame wraps exactly like a
    // group sum; Window's `expressions` exposes windowExpressions, so
    // the blanket Expression.collect reaches inside WindowExpression),
    // and avg(): Average over non-decimal integrals accumulates the
    // sum in DOUBLE (Average.sumDataType, verified against the Spark
    // 4.1.2 jar), which silently loses integer precision past 2^53
    // (~9e15) and diverges from DuckDB's order-dependent double at the
    // same scale the int64 class does — so integral attr×attr avg gets
    // the same widen-or-bound treatment.
    val flagged = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val analyzed = fn(spark, dir).queryExecution.analyzed
      val defs = aliasDefs(analyzed)
      val sums = analyzed.collectWithSubqueries {
        case p => p.expressions.flatMap(_.collect {
          case s: Sum => ("sum", s.child)
          case a: Average => ("avg", a.child)
        })
      }.flatten
      sums.collect {
        case (pos, child)
            if isIntegral(child.dataType) && hasMagnitudeProduct(expand(child, defs)) =>
          (name, child.sql, s"$pos(${expand(child, defs).sql})")
      }
    }.distinct
    // the bounds-table fragment may name either the raw child (agg
    // sites) or the alias-expanded form (window sites, where the raw
    // child is an opaque `_w0`)
    val unreviewed = flagged.filterNot { case (name, raw, expanded) =>
      isAllowed(name, raw) || isAllowed(name, expanded)
    }.map { case (name, _, expanded) => (name, expanded) }
    assert(unreviewed.isEmpty,
      "integral Sum over an attr×attr product — silent int64 wrap at " +
        "100 TB (Spark wraps, DuckDB promotes to HUGEINT; the engines " +
        "only agree at gate scale). Widen to .cast(\"decimal(38,0)\") " +
        "inside the sum and narrow once after (the q74 fix), or add a " +
        "per-term bound argument to boundedSites:\n" +
        unreviewed.map { case (n, e) => s"  $n: $e" }.mkString("\n"))
  }

  test("the detector itself fires on the q74-shaped plan") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
      .agg(sum(col("a") * col("b")))
    val sums = df.queryExecution.analyzed.expressions
      .flatMap(_.collect { case s: Sum => s })
    assert(sums.exists(s => isIntegral(s.child.dataType) && hasMagnitudeProduct(s.child)),
      "detector must flag sum(a*b) over longs")
    // and stays quiet once widened the q74 way
    val wide = Seq((1L, 2L)).toDF("a", "b")
      .agg(sum((col("a") * col("b")).cast("decimal(38,0)")))
    val wideSums = wide.queryExecution.analyzed.expressions
      .flatMap(_.collect { case s: Sum => s })
    assert(!wideSums.exists(s => isIntegral(s.child.dataType)),
      "decimal-accumulated sum must not be integral-typed")
    // and on a constant-scaled column (attr * lit) it correctly
    // does NOT fire — the bound is inspectable
    val scaled = Seq((1L, 2L)).toDF("a", "b").agg(sum(col("a") * lit(100L)))
    val scaledSums = scaled.queryExecution.analyzed.expressions
      .flatMap(_.collect { case s: Sum => s })
    assert(!scaledSums.exists(s => isIntegral(s.child.dataType) && hasMagnitudeProduct(s.child)),
      "attr*literal must not be flagged")
  }

  test("the detector reaches window-framed sums and integral averages") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.{Window => W}
    // running sum(a*b) over an expanding frame — the q44/q59 shape
    val win = Seq((1L, 2L, 1), (3L, 4L, 1)).toDF("a", "b", "g")
      .withColumn("run",
        sum(col("a") * col("b")).over(W.partitionBy("g").orderBy("a")))
    val winAnalyzed = win.queryExecution.analyzed
    val winDefs = aliasDefs(winAnalyzed)
    val winSums = winAnalyzed.collect {
      case p => p.expressions.flatMap(_.collect { case s: Sum => s })
    }.flatten
    // the analyzer hoists the product into a `_w0` projection, so the
    // raw child is a bare attribute — only the alias-expanded view
    // exposes the attr×attr shape (the r12 window-audit gap)
    assert(!winSums.exists(s => hasMagnitudeProduct(s.child)),
      "precondition: the raw window-sum child should be the hoisted _w0 attr")
    assert(winSums.exists(s =>
        isIntegral(s.child.dataType) && hasMagnitudeProduct(expand(s.child, winDefs))),
      "a WindowExpression-framed sum(a*b) over longs must be flagged via alias expansion")
    // avg(a*b) over longs: double accumulator, silent precision loss
    // past 2^53 — same widen-or-bound class
    val av = Seq((1L, 2L)).toDF("a", "b").agg(avg(col("a") * col("b")))
    val avgs = av.queryExecution.analyzed.expressions
      .flatMap(_.collect { case a: Average => a })
    assert(avgs.exists(a => isIntegral(a.child.dataType) && hasMagnitudeProduct(a.child)),
      "avg(a*b) over longs must be flagged")
    // and a decimal-widened avg is quiet
    val avWide = Seq((1L, 2L)).toDF("a", "b")
      .agg(avg((col("a") * col("b")).cast("decimal(38,0)")))
    val wideAvgs = avWide.queryExecution.analyzed.expressions
      .flatMap(_.collect { case a: Average => a })
    assert(!wideAvgs.exists(a => isIntegral(a.child.dataType)),
      "decimal-accumulated avg must not be integral-typed")
  }
}
