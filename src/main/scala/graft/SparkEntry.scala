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

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Contract note: most entries return a LAZY plan (nothing executes
    * until the caller acts), but the convergence-loop operators
    * (g10–g12/g14 component/rank loops, g33's peel, d23's shared
    * minhash checkpoint) necessarily run Spark jobs at
    * DataFrame-CONSTRUCTION time — the loop's stop condition is data.
    * Callers doing plan inspection only should prefer the sf0.001
    * directory, and callers re-building the same entry should hold
    * the returned DataFrame rather than calling the builder twice
    * (loop results are localCheckpoints; only shared round-0 inputs
    * are DfCache'd across builders). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ GraphOps.queries ++ TextOps.queries ++ DedupOps.queries ++ SimilarityOps.queries ++ graft.operators.vector.VectorOps.queries ++ EventOps.queries ++ MultimodalOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ GraphOps.oracles ++ TextOps.oracles ++ DedupOps.oracles ++ SimilarityOps.oracles ++ graft.operators.vector.VectorOps.oracles ++ EventOps.oracles ++ MultimodalOps.oracles
}
