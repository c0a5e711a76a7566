package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registry of graft's native Catalyst expressions.
  *
  * Two entry points:
  *  - [[registerAll]] — idempotent per-session registration; operators
  *    call it before using a function in a SQL-string expression.
  *  - [[GraftExtensions]] — `SparkSessionExtensions` injector for
  *    cluster deployment: set
  *    `spark.sql.extensions=graft.functions.GraftExtensions` and every
  *    session (including pure-SQL users) gets the functions.
  */
object GraftFunctions {

  private def binary(name: String, mk: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => mk(a, b)
    case cs => throw new IllegalArgumentException(
      s"$name requires exactly 2 arguments, got ${cs.length}")
  }

  private def unary(name: String, mk: Expression => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a) => mk(a)
    case cs => throw new IllegalArgumentException(
      s"$name requires exactly 1 argument, got ${cs.length}")
  }

  private val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> binary("graft_dot", DotProduct),
    "graft_sorted_intersect_count" ->
      binary("graft_sorted_intersect_count", SortedIntersectCount),
    "graft_pack_deltas" -> unary("graft_pack_deltas", PackDeltas),
    "graft_minhash64" -> unary("graft_minhash64", MinHash64),
    "graft_fwht64" -> unary("graft_fwht64", Fwht64),
    "graft_packed_intersect" ->
      binary("graft_packed_intersect", PackedIntersect))

  def registerAll(spark: SparkSession): Unit = synchronized {
    all.foreach { case (name, builder) =>
      val ident = FunctionIdentifier(name)
      if (!spark.sessionState.functionRegistry.functionExists(ident)) {
        spark.sessionState.functionRegistry.registerFunction(
          ident, new ExpressionInfo(getClass.getName, name), builder)
      }
    }
    // typed mergeable aggregates (partial-agg capable via ScalaAggregator)
    if (!spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier("graft_kmv256"))) {
      spark.udf.register("graft_kmv256",
        org.apache.spark.sql.functions.udaf(new KmvAggregator(256),
          org.apache.spark.sql.Encoders.scalaLong))
    }
    if (!spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier("graft_top_pairs5"))) {
      spark.udf.register("graft_top_pairs5",
        org.apache.spark.sql.functions.udaf(new TopPairsAggregator(5),
          org.apache.spark.sql.Encoders.product[ScoredPair]))
    }
    if (!spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier("graft_top_neighbors5"))) {
      spark.udf.register("graft_top_neighbors5",
        org.apache.spark.sql.functions.udaf(new TopNeighborsAggregator(5),
          org.apache.spark.sql.Encoders.product[ScoredNeighbor]))
    }
    // the two-stage retrieval prefilter width (s23): same bounded
    // mergeable aggregate, k = candidate-list size instead of final K
    if (!spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier("graft_top_neighbors25"))) {
      spark.udf.register("graft_top_neighbors25",
        org.apache.spark.sql.functions.udaf(new TopNeighborsAggregator(25),
          org.apache.spark.sql.Encoders.product[ScoredNeighbor]))
    }
  }

  private[functions] def inject(ext: SparkSessionExtensions): Unit = {
    all.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo(getClass.getName, name), builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
  }
}

/** `spark.sql.extensions` hook: injects all graft functions and the
  * HOF→native rewrite rule. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}
