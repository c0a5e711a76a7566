package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Relational
import graft.operators.graph.GraphOps
import graft.operators.text.TextOps
import graft.operators.dedup.DedupOps
import graft.operators.similarity.SimilarityOps
import graft.streaming.EventOps
import graft.operators.multimodal.MultimodalOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ GraphOps.queries ++ TextOps.queries ++ DedupOps.queries ++ SimilarityOps.queries ++ graft.operators.vector.VectorOps.queries ++ EventOps.queries ++ MultimodalOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ GraphOps.oracles ++ TextOps.oracles ++ DedupOps.oracles ++ SimilarityOps.oracles ++ graft.operators.vector.VectorOps.oracles ++ EventOps.oracles ++ MultimodalOps.oracles
}
