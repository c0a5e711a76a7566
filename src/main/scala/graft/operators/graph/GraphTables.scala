package graft.operators.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Graph view over the relational star schema.
  *
  * The reference engine (neo-olap) runs directly on a Neo4j
  * node/relationship store (Runner.java:55 resolves NodeManager for
  * node-id ranges). Our Spark-first re-expression derives the graph
  * from the relational tables as two DataFrames: a namespaced vertex
  * id (`key * 8 + typeTag`) and a distinct, symmetrized edge list.
  * Everything downstream (walks, PageRank, BFS) is a declarative plan
  * over these, so edge storage partitions/shuffles like any fact
  * table — at 100 TB the edge list is just another parquet dataset
  * bucketed by `src`.
  *
  * Tags: 0=customer 1=order 2=part 3=supplier 4=nation 5=region.
  */
object GraphTables {

  /** DuckDB CTE text equivalent of [[sym]]; prefix for graph oracles. */
  val symSqlCtes: String =
    """base AS (
      |  SELECT DISTINCT CAST(o_custkey*8+0 AS BIGINT) AS src, CAST(o_orderkey*8+1 AS BIGINT) AS dst FROM orders
      |  UNION ALL SELECT DISTINCT CAST(l_orderkey*8+1 AS BIGINT), CAST(l_partkey*8+2 AS BIGINT) FROM lineitem
      |  UNION ALL SELECT DISTINCT CAST(l_partkey*8+2 AS BIGINT), CAST(l_suppkey*8+3 AS BIGINT) FROM lineitem
      |  UNION ALL SELECT DISTINCT CAST(c_custkey*8+0 AS BIGINT), CAST(c_nationkey*8+4 AS BIGINT) FROM customer
      |  UNION ALL SELECT DISTINCT CAST(s_suppkey*8+3 AS BIGINT), CAST(s_nationkey*8+4 AS BIGINT) FROM supplier
      |  UNION ALL SELECT DISTINCT CAST(n_nationkey*8+4 AS BIGINT), CAST(n_regionkey*8+5 AS BIGINT) FROM nation),
      |edges AS (SELECT DISTINCT src, dst FROM base),
      |sym AS (SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges)""".stripMargin

  private def vid(c: org.apache.spark.sql.Column, tag: Int) =
    c.cast("long") * 8 + tag

  private def flip(df: DataFrame): DataFrame =
    df.select(col("dst").as("src"), col("src").as("dst"))

  /** Symmetrized distinct adjacency (both directions), cached once per
    * (session, dir) — every graph query reuses the same persisted copy.
    *
    * Built with exactly TWO exchanges:
    *  1. the part→supplier branch — the one branch with heavy
    *     duplication at scale (each (part, supplier) pair recurs once
    *     per lineitem, ~|lineitem|/|partsupp| ≈ 7×) — is symmetrized
    *     FIRST and deduped ONCE (map-side combine shrinks the shuffle
    *     to ~distinct volume; deduping per direction would shuffle the
    *     duplicate-heavy stream twice);
    *  2. one layout repartition by `src` over the full union.
    * The final distinct (rare order→part repeats within an order) runs
    * IN PLACE: `HashPartitioning(src)` satisfies the (src, dst)
    * clustering an aggregate needs — equal pairs share a src — so no
    * third exchange appears and the src partitioning is preserved. A
    * last in-partition sort gives the cached layout order.
    *
    * Persisted hash-partitioned AND sorted by `src`: the cached plan's
    * outputPartitioning/outputOrdering survive InMemoryTableScan, so
    * every downstream `groupBy(src)` (degree) and every frontier join
    * on `node = src` (walks, BFS) re-uses this layout with NO exchange
    * and NO re-sort of the edge side — only the small frontier moves.
    * This is the cluster design too: one bucketed edge dataset, all
    * traversal stages co-located on it (the reference's preloaded
    * relationship cache, Preloader.java:16, re-expressed as a stable
    * partitioning). */
  /** DuckDB CTE text equivalent of [[weightedEdges]]. */
  val wedgeSqlCtes: String =
    """wbase AS (
      |  SELECT CAST(o_custkey*8+0 AS BIGINT) AS src, CAST(o_orderkey*8+1 AS BIGINT) AS dst FROM orders
      |  UNION ALL SELECT CAST(l_orderkey*8+1 AS BIGINT), CAST(l_partkey*8+2 AS BIGINT) FROM lineitem
      |  UNION ALL SELECT CAST(l_partkey*8+2 AS BIGINT), CAST(l_suppkey*8+3 AS BIGINT) FROM lineitem
      |  UNION ALL SELECT CAST(c_custkey*8+0 AS BIGINT), CAST(c_nationkey*8+4 AS BIGINT) FROM customer
      |  UNION ALL SELECT CAST(s_suppkey*8+3 AS BIGINT), CAST(s_nationkey*8+4 AS BIGINT) FROM supplier
      |  UNION ALL SELECT CAST(n_nationkey*8+4 AS BIGINT), CAST(n_regionkey*8+5 AS BIGINT) FROM nation),
      |wboth AS (SELECT src, dst FROM wbase UNION ALL SELECT dst, src FROM wbase),
      |wed AS (SELECT src, dst, count(*) AS w FROM wboth GROUP BY src, dst),
      |wdeg AS (SELECT src AS wnode, CAST(sum(w) AS BIGINT) AS wsum FROM wed GROUP BY src)""".stripMargin

  /** Edge MULTIPLICITIES as weights: the duplication [[sym]] dedups
    * away (each (part, supplier) pair recurs once per lineitem, each
    * (order, part) once per line) is a genuine intensity signal — a
    * supplier shipping a part 50× is a 50× stronger tie than a
    * one-off. One groupBy over the raw symmetric union (map-side
    * combine shrinks the duplicate-heavy stream to distinct volume —
    * the same shuffle [[sym]]'s dedup pays), per-src weight totals
    * joined in, laid out src-partitioned+sorted like [[GraphOps
    * .edgesWithDeg]] so weighted rounds shuffle only the rank vector. */
  def weightedEdges(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "graph_wedges") {
      def t(n: String) = Tables.load(spark, dir, n)
      val fwd = Seq(
        t("orders").select(vid(col("o_custkey"), 0).as("src"), vid(col("o_orderkey"), 1).as("dst")),
        t("lineitem").select(vid(col("l_orderkey"), 1).as("src"), vid(col("l_partkey"), 2).as("dst")),
        t("lineitem").select(vid(col("l_partkey"), 2).as("src"), vid(col("l_suppkey"), 3).as("dst")),
        t("customer").select(vid(col("c_custkey"), 0).as("src"), vid(col("c_nationkey"), 4).as("dst")),
        t("supplier").select(vid(col("s_suppkey"), 3).as("src"), vid(col("s_nationkey"), 4).as("dst")),
        t("nation").select(vid(col("n_nationkey"), 4).as("src"), vid(col("n_regionkey"), 5).as("dst")))
        .reduce(_.union(_))
      val wed = fwd.union(flip(fwd))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
      val wdeg = wed.groupBy(col("src").as("wnode")).agg(sum(col("w")).as("wsum"))
      wed.join(wdeg, col("src") === col("wnode"))
        .select(col("src"), col("dst"), col("w"), col("wsum"))
        .repartition(col("src"))
        .sortWithinPartitions(col("src"))
    }

  def sym(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "graph_sym") {
      def t(n: String) = Tables.load(spark, dir, n)
      val fwd = Seq(
        t("orders").select(vid(col("o_custkey"), 0).as("src"), vid(col("o_orderkey"), 1).as("dst")),
        t("lineitem").select(vid(col("l_orderkey"), 1).as("src"), vid(col("l_partkey"), 2).as("dst")),
        t("customer").select(vid(col("c_custkey"), 0).as("src"), vid(col("c_nationkey"), 4).as("dst")),
        t("supplier").select(vid(col("s_suppkey"), 3).as("src"), vid(col("s_nationkey"), 4).as("dst")),
        t("nation").select(vid(col("n_nationkey"), 4).as("src"), vid(col("n_regionkey"), 5).as("dst")))
        .reduce(_.union(_))
      val ps = t("lineitem")
        .select(vid(col("l_partkey"), 2).as("src"), vid(col("l_suppkey"), 3).as("dst"))
      val psBoth = ps.union(flip(ps)).distinct()
      fwd.union(flip(fwd)).union(psBoth)
        .repartition(col("src"))
        .distinct()
        .sortWithinPartitions(col("src"))
    }
}
