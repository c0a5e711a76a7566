package graft.operators.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.vector.VectorExprs

/** Similarity search over the `embeddings` table.
  *
  * - s1: exact brute-force top-k — broadcast the (tiny) query set
  *   against the corpus scan: linear, no shuffle of the corpus, the
  *   baseline any ANN variant is judged against.
  * - s2: hyperplane-LSH bucketed ANN — queries only meet corpus rows
  *   in their bucket (the scale path: bucket count grows with data,
  *   per-bucket work stays bounded).
  * - s3: per-label top-k most-similar pairs — label is the shuffle
  *   key, pair enumeration stays inside label groups.
  *
  * Cosine uses the shared sequential folds from [[VectorExprs]], so
  * results match the DuckDB oracles bit-for-bit.
  */
object SimilarityOps {

  private val K = 5

  private def cosine = col("dot") / (sqrt(col("q.n2")) * sqrt(col("c.n2")))

  private def ranked(pairs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  // ---- s1: exact top-k cosine, broadcast queries x corpus scan ----
  def s1KnnBrute(spark: SparkSession, dir: String): DataFrame = {
    val e = VectorExprs.embFeatures(spark, dir)
    val q = e.filter(col("vec_id") < 10)
    val pairs = broadcast(q.as("q"))
      .join(e.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("dot", expr(VectorExprs.dotExpr("q.vd", "c.vd")))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine.as("cosine"))
    ranked(pairs)
  }

  val s1Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |pairs AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${VectorExprs.duckDot("q.vd", "c.vd")}
       |      / (sqrt(q.n2) * sqrt(c.n2)) AS cosine
       |  FROM eb q, eb c
       |  WHERE q.vec_id < 10 AND q.vec_id != c.vec_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)
       |SELECT query_id, neighbor_id, cosine, rank FROM r
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ---- s2: LSH-bucketed ANN (candidates share the query's bucket) ----
  def s2KnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = VectorExprs.embFeatures(spark, dir)
    val q = e.filter(col("vec_id") < 10)
    val pairs = broadcast(q.as("q"))
      .join(e.as("c"),
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("dot", expr(VectorExprs.dotExpr("q.vd", "c.vd")))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine.as("cosine"))
    ranked(pairs)
  }

  val s2Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |pairs AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${VectorExprs.duckDot("q.vd", "c.vd")}
       |      / (sqrt(q.n2) * sqrt(c.n2)) AS cosine
       |  FROM eb q JOIN eb c
       |    ON q.bucket = c.bucket AND q.vec_id != c.vec_id
       |  WHERE q.vec_id < 10),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)
       |SELECT query_id, neighbor_id, cosine, rank FROM r
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ---- s3: per-label top-k most-similar pairs ----
  def s3PairwiseTopk(spark: SparkSession, dir: String): DataFrame = {
    val e = VectorExprs.embFeatures(spark, dir)
    val w = Window.partitionBy(col("label"))
      .orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))
    e.as("q").join(e.as("c"),
        col("q.label") === col("c.label") && col("q.vec_id") < col("c.vec_id"))
      .withColumn("dot", expr(VectorExprs.dotExpr("q.vd", "c.vd")))
      .select(col("q.label").as("label"), col("q.vec_id").as("vec_a"),
        col("c.vec_id").as("vec_b"), cosine.as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .orderBy(col("label"), col("rank"))
  }

  val s3Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |pairs AS (
       |  SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    ${VectorExprs.duckDot("a.vd", "b.vd")}
       |      / (sqrt(a.n2) * sqrt(b.n2)) AS cosine
       |  FROM eb a JOIN eb b
       |    ON a.label = b.label AND a.vec_id < b.vec_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY label
       |        ORDER BY cosine DESC, vec_a, vec_b) AS rank FROM pairs)
       |SELECT label, vec_a, vec_b, cosine, rank FROM r
       |WHERE rank <= $K ORDER BY label, rank""".stripMargin

  // ---- s4: IVF-bucketed ANN (inverted-file coarse quantizer) ----
  // The second ANN scale path next to LSH (s2): partition the corpus by
  // nearest coarse centroid, probe only the query's nprobe nearest
  // lists. Centroids here are a deterministic stand-in for a trained
  // k-means codebook (the 16 lowest vec_ids) so the oracle is exact;
  // the plan shape is the real one:
  //  - assignment = corpus ⋈ broadcast(centroids), scored map-side,
  //    argmin via a min-over-struct aggregate (map-side combine) — one
  //    shuffle of |corpus| pre-combined rows, no window sort;
  //  - probe = broadcast(query × its 2 nearest lists) against the
  //    assigned corpus: only vectors in probed lists are scored.
  // Inverted lists are disjoint (each vector has ONE cluster), so no
  // candidate dedup is needed.
  private val NPROBE = 2

  def s4IvfKnn(spark: SparkSession, dir: String): DataFrame = {
    val e = VectorExprs.embFeatures(spark, dir)
    val cents = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("mid"), col("vd").as("mvd"), col("n2").as("mn2"))
    def score = col("mdot") / (sqrt(col("n2")) * sqrt(col("mn2")))
    val scored = e.crossJoin(broadcast(cents))
      .withColumn("mdot", expr(VectorExprs.dotExpr("vd", "mvd")))
    val assign = scored
      .groupBy(col("vec_id"))
      .agg(min(struct((-score).as("ns"), col("mid"))).as("pick"))
      .select(col("vec_id").as("cvec"), col("pick.mid").as("cluster"))
    val corpus = e.join(assign, col("vec_id") === col("cvec"))
      .select(col("vec_id"), col("vd"), col("n2"), col("cluster"))
    val qw = Window.partitionBy(col("vec_id")).orderBy(col("ns"), col("mid"))
    val qprobe = scored.filter(col("vec_id") < 10)
      .withColumn("ns", -score)
      .withColumn("prn", row_number().over(qw))
      .filter(col("prn") <= NPROBE)
      .select(col("vec_id").as("qid"), col("vd").as("qvd"),
        col("n2").as("qn2"), col("mid").as("qcluster"))
    val pairs = broadcast(qprobe)
      .join(corpus.as("c"),
        col("qcluster") === col("c.cluster") && col("qid") =!= col("c.vec_id"))
      .withColumn("dot", expr(VectorExprs.dotExpr("qvd", "c.vd")))
      .select(col("qid").as("query_id"), col("c.vec_id").as("neighbor_id"),
        (col("dot") / (sqrt(col("qn2")) * sqrt(col("c.n2")))).as("cosine"))
    ranked(pairs)
  }

  val s4Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |cents AS (SELECT vec_id AS mid, vd AS mvd, n2 AS mn2 FROM eb WHERE vec_id < 16),
       |scored AS (
       |  SELECT e.vec_id, e.vd, e.n2, m.mid,
       |    ${VectorExprs.duckDot("e.vd", "m.mvd")}
       |      / (sqrt(e.n2) * sqrt(m.mn2)) AS score
       |  FROM eb e CROSS JOIN cents m),
       |assign AS (
       |  SELECT vec_id AS cvec, mid AS cluster FROM (
       |    SELECT vec_id, mid, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY score DESC, mid) AS rn FROM scored) x
       |  WHERE rn = 1),
       |qprobe AS (
       |  SELECT vec_id AS qid, vd AS qvd, n2 AS qn2, mid AS qcluster FROM (
       |    SELECT vec_id, vd, n2, mid, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY score DESC, mid) AS rn FROM scored WHERE vec_id < 10) x
       |  WHERE rn <= $NPROBE),
       |pairs AS (
       |  SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
       |    ${VectorExprs.duckDot("q.qvd", "c.vd")}
       |      / (sqrt(q.qn2) * sqrt(c.n2)) AS cosine
       |  FROM qprobe q
       |  JOIN assign a ON a.cluster = q.qcluster
       |  JOIN eb c ON c.vec_id = a.cvec
       |  WHERE c.vec_id != q.qid),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC, neighbor_id) AS rank FROM pairs)
       |SELECT query_id, neighbor_id, cosine, rank FROM r
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_knn_brute" -> (s1KnnBrute _),
    "s2_knn_lsh" -> (s2KnnLsh _),
    "s3_pairwise_topk" -> (s3PairwiseTopk _),
    "s4_ivf_knn" -> (s4IvfKnn _))

  val oracles: Map[String, String] = Map(
    "s1_knn_brute" -> s1Sql,
    "s2_knn_lsh" -> s2Sql,
    "s3_pairwise_topk" -> s3Sql,
    "s4_ivf_knn" -> s4Sql)
}
