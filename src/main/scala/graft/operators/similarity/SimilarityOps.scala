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

  /** Per-query top-K ranking shared by s1/s2/s4: a BOUNDED mergeable
    * aggregate ([[graft.functions.TopNeighborsAggregator]]) — O(K)
    * state per query, map-side combined, shuffles only K·P pre-trimmed
    * rows. The row_number window it replaces funneled every scored
    * (query, candidate) row of a query into ONE task's sort — for s1's
    * brute-force scan that task sorts the whole corpus per query at
    * 100 TB. Rank semantics are identical (cosine DESC, neighbor_id
    * tie-break), so the window-based DuckDB oracles stay exact. */
  private def ranked(pairs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.registerAll(pairs.sparkSession)
    pairs.groupBy(col("query_id"))
      .agg(expr(s"graft_top_neighbors5(cosine, neighbor_id)").as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.neighbor_id").as("neighbor_id"),
        col("p.cosine").as("cosine"), (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  // Shared oracle CTE bodies: s1's exact pair scoring, s2's LSH
  // candidate generation + scoring, and the per-query top-K rank —
  // consumed by s1Sql, s2Sql AND the s8 recall oracle, so a tuning
  // change to either index updates the recall gate in lockstep
  // instead of leaving a stale inlined copy behind.
  private def exactPairsCte(name: String, lo: Long = 0L, hi: Long = 10L): String =
    s"""$name AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${VectorExprs.duckDot("q.vd", "c.vd")}
       |      / (sqrt(q.n2) * sqrt(c.n2)) AS cosine
       |  FROM eb q, eb c
       |  WHERE q.vec_id >= $lo AND q.vec_id < $hi AND q.vec_id != c.vec_id)""".stripMargin

  private def lshPairsCtes(candName: String, pairsName: String): String =
    s"""$candName AS (
       |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
       |  FROM capped q JOIN capped c
       |    ON q.band = c.band AND q.bkey = c.bkey AND q.vec_id != c.vec_id
       |  WHERE q.vec_id < 10),
       |$pairsName AS (
       |  SELECT d.qid AS query_id, d.cid AS neighbor_id,
       |    ${VectorExprs.duckDot("q.vd", "c.vd")}
       |      / (sqrt(q.n2) * sqrt(c.n2)) AS cosine
       |  FROM $candName d JOIN eb q ON d.qid = q.vec_id JOIN eb c ON d.cid = c.vec_id)""".stripMargin

  private def topkCte(name: String, from: String): String =
    s"""$name AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC, neighbor_id) AS rank FROM $from)""".stripMargin

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

  lazy val s1Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |${exactPairsCte("pairs")},
       |${topkCte("r", "pairs")}
       |SELECT query_id, neighbor_id, cosine, rank FROM r
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ---- s16: metadata-filtered exact kNN (filtered vector search) ----
  // Production vector search is rarely unfiltered: "nearest neighbors
  // WHERE <metadata predicate>" (same language, same license, a date
  // range…). The filter belongs IN the candidate join — a post-filter
  // over an unfiltered top-k silently returns < K rows (or the wrong
  // neighbors) whenever the filter removes ranked hits. Here the
  // predicate is the label equi-key of the broadcast join itself:
  // corpus rows hash the tiny query table by label, rows failing the
  // filter drop BEFORE the 64-term dot product, and the corpus never
  // shuffles. [[filteredKnnOf]] is the composable core (any
  // query/corpus frames + any predicate).
  def filteredKnnOf(q: DataFrame, c: DataFrame,
      pred: org.apache.spark.sql.Column): DataFrame = {
    val pairs = broadcast(q.as("q"))
      .join(c.as("c"), col("q.vec_id") =!= col("c.vec_id") && pred)
      .withColumn("dot", expr(VectorExprs.dotExpr("q.vd", "c.vd")))
      .select(col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"), cosine.as("cosine"))
    ranked(pairs)
  }

  def s16FilteredKnn(spark: SparkSession, dir: String): DataFrame = {
    val e = VectorExprs.embFeatures(spark, dir)
    filteredKnnOf(e.filter(col("vec_id") < 10), e,
      col("q.label") === col("c.label"))
  }

  lazy val s16Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |pairs AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${VectorExprs.duckDot("q.vd", "c.vd")}
       |      / (sqrt(q.n2) * sqrt(c.n2)) AS cosine
       |  FROM eb q, eb c
       |  WHERE q.vec_id < 10 AND q.vec_id != c.vec_id AND q.label = c.label),
       |${topkCte("r", "pairs")}
       |SELECT query_id, neighbor_id, cosine, rank FROM r
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ---- s2: LSH-bucketed ANN over banded signatures ----
  // A query probes each of its Bands buckets (multi-probe via
  // OR-amplified bands: recall 1-(1-p^BandBits)^Bands); candidates are
  // deduped before the exact-cosine step, and the query side of the
  // band join is broadcast — the corpus never shuffles.
  def s2KnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val capped = VectorExprs.cappedBands(spark, dir)
    val cand = broadcast(capped.filter(col("vec_id") < 10).as("qb"))
      .join(capped.as("cb"),
        col("qb.band") === col("cb.band") && col("qb.bkey") === col("cb.bkey")
          && col("qb.vec_id") =!= col("cb.vec_id"))
      .select(col("qb.vec_id").as("qid"), col("cb.vec_id").as("cid"))
      .distinct()
    val e = VectorExprs.embFeatures(spark, dir)
    val pairs = cand
      .join(broadcast(e.filter(col("vec_id") < 10).as("q")), col("qid") === col("q.vec_id"))
      .join(e.as("c"), col("cid") === col("c.vec_id"))
      .withColumn("dot", expr(VectorExprs.dotExpr("q.vd", "c.vd")))
      .select(col("qid").as("query_id"), col("cid").as("neighbor_id"),
        cosine.as("cosine"))
    ranked(pairs)
  }

  lazy val s2Sql: String =
    s"""WITH ${VectorExprs.bandCtes},
       |${lshPairsCtes("cand", "pairs")},
       |${topkCte("r", "pairs")}
       |SELECT query_id, neighbor_id, cosine, rank FROM r
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ---- s3: per-label top-k most-similar candidate pairs ----
  // Two scale fixes over the naive per-label all-pairs + window sort:
  //  1. pair enumeration happens inside (label, band, bkey) LSH
  //     buckets (capped), not across whole labels — label cardinality
  //     is ~fixed, so per-label membership grows linearly with the
  //     corpus and all-pairs would be quadratic;
  //  2. the per-label top-k is a BOUNDED mergeable aggregate
  //     ([[graft.functions.TopPairsAggregator]]): O(k) state per
  //     label, map-side combined — not a row_number window that sorts
  //     every candidate of a label in one partition.
  def s3PairwiseTopk(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    val capped = VectorExprs.cappedBands(spark, dir, perLabel = true)
    val cand = capped.as("x").join(capped.as("y"),
        col("x.label") === col("y.label") && col("x.band") === col("y.band")
          && col("x.bkey") === col("y.bkey") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.label").as("label"),
        col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    val e = VectorExprs.embFeatures(spark, dir)
      .select(col("vec_id"), col("vd"), col("n2"))
    cand
      .join(e.as("a"), col("vec_a") === col("a.vec_id"))
      .join(e.as("b"), col("vec_b") === col("b.vec_id"))
      .withColumn("dot", expr(VectorExprs.dotExpr("a.vd", "b.vd")))
      .withColumn("cosine", col("dot") / (sqrt(col("a.n2")) * sqrt(col("b.n2"))))
      .groupBy(col("label"))
      .agg(expr("graft_top_pairs5(cosine, vec_a, vec_b)").as("top"))
      .select(col("label"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("label"), col("p.vec_a").as("vec_a"), col("p.vec_b").as("vec_b"),
        col("p.cosine").as("cosine"), (col("pos") + 1).cast("int").as("rank"))
      .orderBy(col("label"), col("rank"))
  }

  lazy val s3Sql: String =
    s"""WITH ${VectorExprs.bandCtes},
       |okl AS (
       |  SELECT label, band, bkey FROM ebb
       |  GROUP BY label, band, bkey HAVING count(*) <= ${VectorExprs.MaxBucket}),
       |cappedl AS (
       |  SELECT e.vec_id, e.label, e.band, e.bkey
       |  FROM ebb e JOIN okl USING (label, band, bkey)),
       |cand AS (
       |  SELECT DISTINCT x.label, x.vec_id AS vec_a, y.vec_id AS vec_b
       |  FROM cappedl x JOIN cappedl y
       |    ON x.label = y.label AND x.band = y.band AND x.bkey = y.bkey
       |      AND x.vec_id < y.vec_id),
       |pairs AS (
       |  SELECT c.label, c.vec_a, c.vec_b,
       |    ${VectorExprs.duckDot("a.vd", "b.vd")}
       |      / (sqrt(a.n2) * sqrt(b.n2)) AS cosine
       |  FROM cand c JOIN eb a ON c.vec_a = a.vec_id JOIN eb b ON c.vec_b = b.vec_id),
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

  lazy val s4Sql: String =
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

  // ---- s6: exact radius (range) search — all neighbors ≥ θ ----
  // The threshold-dual of s1's top-k: return EVERY corpus vector whose
  // cosine with a query clears θ, not a fixed count. Same broadcast-
  // queries × corpus-scan shape (linear, no corpus shuffle, no top-k
  // state at all — the predicate is evaluated inside the scan's
  // codegen stage and the output is bounded by the threshold). This is
  // the exact baseline; at scale the recall-bounded candidate path is
  // the same LSH machinery s2 uses (probe band buckets, verify with
  // the exact predicate).
  private val RangeTheta = 0.35

  def s6RangeSearch(spark: SparkSession, dir: String): DataFrame = {
    val e = VectorExprs.embFeatures(spark, dir)
    val q = e.filter(col("vec_id") < 10)
    broadcast(q.as("q"))
      .join(e.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("dot", expr(VectorExprs.dotExpr("q.vd", "c.vd")))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine.as("cosine"))
      .filter(col("cosine") >= RangeTheta)
      .orderBy(col("query_id"), col("neighbor_id"))
  }

  lazy val s6Sql: String =
    s"""WITH ${VectorExprs.embCtes}
       |SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |  ${VectorExprs.duckDot("q.vd", "c.vd")}
       |    / (sqrt(q.n2) * sqrt(c.n2)) AS cosine
       |FROM eb q, eb c
       |WHERE q.vec_id < 10 AND q.vec_id != c.vec_id
       |  AND ${VectorExprs.duckDot("q.vd", "c.vd")}
       |    / (sqrt(q.n2) * sqrt(c.n2)) >= $RangeTheta
       |ORDER BY query_id, neighbor_id""".stripMargin

  // ---- s5: distributed k-means codebook training (2 Lloyd rounds) ----
  // The trained-codebook path that feeds an IVF index like s4's:
  //  - assignment = corpus ⋈ broadcast(k centroids), argmax cosine via
  //    the min-over-struct aggregate (map-side combine, no window);
  //  - centroid update = dim-exploded integer sums (V×64 rows, map-side
  //    combined, k×64 groups) then mean per dim — the standard
  //    distributed Lloyd round, shuffling only pre-combined partials.
  // Engine-exact by construction: vectors are quantized to integer
  // micro-units, so centroid SUMS are order-independent exact longs;
  // means divide those longs in double (deterministic — same IEEE ops
  // on both engines), and scores reuse the shared sequential-fold dot.
  /** Quantized corpus features — DfCache'd, not a bare persist: s5
    * reads it 4× (two assignment rounds, centroid update, checksum),
    * Bench warms it, and it's evicted with the session instead of
    * leaking one full-corpus cached copy per call. */
  def embQuantized(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "emb_quantized") {
      VectorExprs.embFeatures(spark, dir)
        .select(col("vec_id"), col("vd"), col("n2"),
          expr("transform(vd, x -> cast(round(x * 1000000) as bigint))").as("qv"))
    }

  /** Nearest-centroid assignment: corpus ⋈ broadcast(centroids),
    * argmax cosine via the min-over-struct aggregate (map-side
    * combine, no window sort) — shared by s5's Lloyd rounds and s7's
    * inverted-list build. `cents` must have (mid, cm: array<double>);
    * `qv` must carry (vec_id, vd, n2). */
  private def assignTo(qv: DataFrame, cents: DataFrame): DataFrame = {
    val score = expr("graft_dot(vd, cm)") /
      (sqrt(col("n2")) * sqrt(expr("graft_dot(cm, cm)")))
    qv.crossJoin(broadcast(cents))
      .withColumn("ns", -score)
      .groupBy(col("vec_id"))
      .agg(min(struct(col("ns"), col("mid"))).as("pick"))
      .select(col("vec_id"), col("pick.mid").as("cluster"))
  }

  /** The TRAINED coarse codebook: one distributed Lloyd update from
    * the deterministic c0 seed (16 lowest vec_ids) — exactly s5's c1
    * round, factored out and DfCache'd so s5 (round-2 assignment) and
    * s7 (IVF probe) train it once per session. Centroid sums are
    * exact integer micro-units, so the codebook is bit-identical on
    * both engines — the oracle chains the same CTEs. */
  /** One distributed Lloyd update: assign `qv` to `cents`, then
    * rebuild each centroid from its members' exact integer micro-unit
    * sums (one explode + two map-side-combined aggregates; the cm
    * cell is ONE IEEE division of exact integers, bit-identical on
    * both engines). Returns the next (mid, cm) codebook. Factored so
    * [[ivfCodebook]] (seed round) and [[kmeansFrom]] (checkpoint
    * resume) run the identical update. */
  def lloydUpdateOf(qv: DataFrame, cents: DataFrame): DataFrame = {
    val a = assignTo(qv, cents)
    qv.join(a, Seq("vec_id"))
      .select(col("cluster"), posexplode(col("qv")).as(Seq("d", "val")))
      .groupBy(col("cluster"), col("d"))
      .agg(sum(col("val")).as("s"), count(lit(1)).as("n"))
      .groupBy(col("cluster"))
      .agg(expr(
        "transform(sort_array(collect_list(struct(d, cast(s as double) / (n * 1000000.0)))), p -> p.col2)")
        .as("cm"))
      .select(col("cluster").as("mid"), col("cm"))
  }

  def ivfCodebook(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "ivf_codebook") {
      val qv = embQuantized(spark, dir)
      val c0 = qv.filter(col("vec_id") < 16)
        .select(col("vec_id").as("mid"),
          expr("transform(qv, x -> cast(x as double) / 1000000.0)").as("cm"))
      lloydUpdateOf(qv, c0)
    }

  /** The trained-codebook corpus assignment (vec_id, cluster),
    * DfCache'd — the inverted-list / cluster membership artifact
    * shared by s5's gate summary, s17's SSE gauge, and d11's
    * semantic dedup (one assignment pass per session, not one per
    * consumer). */
  def trainedAssignment(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "ivf_assign2") {
      assignTo(embQuantized(spark, dir), ivfCodebook(spark, dir))
    }

  /** Oracle CTE chain ending at `a2` (the trained assignment) over
    * `eb`/`qv` — the SQL twin of [[trainedAssignment]], shared with
    * d11's semantic-dedup oracle. */
  val assignCtes: String =
    s"""$codebookCtes,
       |sc2a AS (${duckCent("c1")}),
       |a2 AS MATERIALIZED (SELECT vec_id, mid AS cluster FROM (
       |  SELECT vec_id, mid, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY score DESC, mid) AS rn FROM sc2a) x WHERE rn = 1)""".stripMargin

  def s5Kmeans(spark: SparkSession, dir: String): DataFrame = {
    val qv = embQuantized(spark, dir)
    val a2 = trainedAssignment(spark, dir)
    a2.join(qv, Seq("vec_id"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        sum(expr("aggregate(qv, 0L, (a, x) -> a + x)")).as("q_checksum"))
      .select(col("cluster").as("cluster_id"), col("n_members"), col("q_checksum"))
      .orderBy(col("cluster_id"))
  }

  // ---- s19: document kNN over t14's hashed embeddings ----
  // The bridge query: the s-family's exact top-k machinery pointed at
  // DERIVED vectors (t14's hashing-trick bag-of-words) instead of the
  // shipped embeddings table — documents → vectors → similarity with
  // no external model, the shape a model-free "related documents" /
  // semantic-dedup candidate pass takes. Same plan as s1: broadcast
  // query docs × one corpus scan, graft_dot on the 16-dim vectors
  // (counts cast to double — exact ≤ 2^53, so the dot is an exact
  // integer and any summation order agrees), bounded top-k aggregate.
  /** t14's hashed doc vectors with (vd, n2) — DfCache'd: the plan is
    * a full-corpus tokenize + 16 filtered counts per doc, and s19
    * otherwise re-runs it for BOTH join sides (bench r6: 24.5 s at
    * sf0.1, the #2 query — two uncached corpus tokenizations). One
    * build serves the query side, the corpus side, and reruns. */
  private[graft] def docVecs(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "doc_hash_vecs") {
      graft.operators.text.TextOps
        .hashEmbedOf(graft.sources.Tables.load(spark, dir, "documents"))
        .select(col("doc_id"),
          expr("transform(doc_vec, x -> cast(x as double))").as("vd"))
        .withColumn("n2", expr(VectorExprs.dotExpr("vd", "vd")))
        .filter(col("n2") > 0.0)
    }

  def s19DocKnn(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    val dv = docVecs(spark, dir)
    val q = dv.filter(col("doc_id") < 10)
    val pairs = broadcast(q.as("q"))
      .join(dv.as("c"), col("q.doc_id") =!= col("c.doc_id"))
      .withColumn("dot", expr(VectorExprs.dotExpr("q.vd", "c.vd")))
      .select(col("q.doc_id").as("query_id"), col("c.doc_id").as("neighbor_id"),
        cosine.as("cosine"))
    ranked(pairs)
  }

  lazy val s19Sql: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |dm AS (SELECT doc_id,
       |  list_transform(ws, x ->
       |    ((CAST(length(x) AS BIGINT)*31 + ascii(substr(x,1,1)))*31
       |     + ascii(substr(x,-1,1))) % 16) AS dims FROM w),
       |v AS (SELECT doc_id,
       |  list_transform(generate_series(0, 15),
       |    i -> CAST(len(list_filter(dims, x -> x = i)) AS DOUBLE)) AS vd FROM dm),
       |n AS (SELECT * FROM (
       |  SELECT doc_id, vd,
       |    list_sum([vd[d] * vd[d] for d in generate_series(1, 16)]) AS n2 FROM v)
       |  WHERE n2 > 0),
       |p AS (SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
       |    list_sum([q.vd[d] * c.vd[d] for d in generate_series(1, 16)])
       |      / (sqrt(q.n2) * sqrt(c.n2)) AS cosine
       |  FROM n q, n c WHERE q.doc_id < 10 AND q.doc_id != c.doc_id),
       |${topkCte("r", "p")}
       |SELECT query_id, neighbor_id, cosine, rank FROM r
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ---- s18: kmeans warm start — codebook checkpoint resume ----
  // The AnalysisRound-resume contract (Runner.java:68's restart-from-
  // persisted-state) applied to the clustering family, exactly as
  // pagerankFrom applies it to ranks and d9 to the dedup index: a
  // training run persists its codebook (the deployment artifact),
  // a later run resumes Lloyd from it without re-touching earlier
  // rounds. Because centroid cells are single divisions of exact
  // integer sums, resume(persist(k rounds)) + 1 round ≡ k+1 direct
  // rounds BIT-EXACT (spec-pinned) — the parquet hop loses nothing.
  // Gate = s5's summary one resumed round deeper: persist the trained
  // c1, reload, one more Lloyd update → assign under c2.
  /** Resume Lloyd training from any persisted (mid, cm) codebook. */
  def kmeansFrom(spark: SparkSession, qv: DataFrame, codebookPath: String): DataFrame =
    lloydUpdateOf(qv, spark.read.parquet(codebookPath))

  def s18KmeansWarm(spark: SparkSession, dir: String): DataFrame = {
    val qv = embQuantized(spark, dir)
    val dirKey = dir.replaceAll("[^A-Za-z0-9]", "_")
    val path =
      s"${graft.operators.graph.GraphOps.checkpointRoot(spark)}/graft_ckpt_s18_$dirKey"
    ivfCodebook(spark, dir).write.mode("overwrite").parquet(path)
    val c2 = kmeansFrom(spark, qv, path)
    assignTo(qv, c2).join(qv, Seq("vec_id"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        sum(expr("aggregate(qv, 0L, (a, x) -> a + x)")).as("q_checksum"))
      .select(col("cluster").as("cluster_id"), col("n_members"), col("q_checksum"))
      .orderBy(col("cluster_id"))
  }

  lazy val s18Sql: String =
    s"""WITH $codebookCtes,
       |sc2 AS (${duckCent("c1")}),
       |a2 AS MATERIALIZED (SELECT vec_id, mid AS cluster FROM (
       |  SELECT vec_id, mid, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY score DESC, mid) AS rn FROM sc2) x WHERE rn = 1),
       |e2 AS (SELECT a2.cluster, d, q.qv[d] AS val
       |  FROM qv q JOIN a2 ON q.vec_id = a2.vec_id, generate_series(1, 64) g(d)),
       |s2u AS (SELECT cluster, d, sum(val) AS s, count(*) AS n FROM e2 GROUP BY cluster, d),
       |c2 AS MATERIALIZED (SELECT cluster AS mid,
       |  list(CAST(s AS DOUBLE) / (n * 1000000.0) ORDER BY d) AS cm FROM s2u GROUP BY cluster),
       |sc3 AS (${duckCent("c2")}),
       |a3 AS (SELECT vec_id, mid AS cluster FROM (
       |  SELECT vec_id, mid, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY score DESC, mid) AS rn FROM sc3) x WHERE rn = 1)
       |SELECT a3.cluster AS cluster_id, count(*) AS n_members,
       |  CAST(sum(list_sum(q.qv)) AS BIGINT) AS q_checksum
       |FROM a3 JOIN qv q ON a3.vec_id = q.vec_id
       |GROUP BY a3.cluster ORDER BY cluster_id""".stripMargin

  // ---- s17: cluster-quality gauge (exact within-cluster SSE) ----
  // Inertia-style audit of s5's trained assignment — the clustering
  // row of the quality board (s8/s9/s11/s13/s15 measure ANN recall,
  // d8 dedup recall; this measures codebook fit, the number a k/seed
  // sweep tunes against). Per cluster: Σ squared distance to the
  // cluster MEAN via the power-sum identity n·SSE_d = n·Σx² − (Σx)²
  // per dimension — no centroid join and no double accumulation (a Σ
  // of doubles in shuffle order is IEEE-order-dependent; micro-unit
  // integer sums are exact, and nothing ever divides). One explode to
  // V×64 rows, two map-side-combined aggregates — the Lloyd-update
  // shape. sse_n is n·SSE in micro-units², accumulated as
  // DECIMAL(38,0) exact — but EMITTED as DOUBLE via the q1 convention
  // (Spark BigDecimal.doubleValue; DuckDB VARCHAR-hop — both
  // correctly rounded at any magnitude): a raw decimal128 column was
  // the round-6 board's only typed-hash mismatch (driver-side
  // DuckDB-vs-pyarrow decimal fetch divergence), and DOUBLE is in the
  // proven-stable gate type set. The double is a deterministic
  // function of the exact integer, so cross-engine equality is bit
  // equality, not float-tolerance.
  def s17ClusterQuality(spark: SparkSession, dir: String): DataFrame = {
    val qv = embQuantized(spark, dir)
    val a2 = trainedAssignment(spark, dir)
    a2.join(qv, Seq("vec_id"))
      .select(col("cluster"), posexplode(col("qv")).as(Seq("d", "x")))
      .groupBy(col("cluster"), col("d"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"))
      .groupBy(col("cluster"))
      .agg(max(col("n")).as("n_members"),
        sum(col("n").cast("decimal(38,0)") * col("sxx") - col("sx") * col("sx"))
          .cast("decimal(38,0)").cast("double").as("sse_n"))
      .select(col("cluster").as("cluster_id"), col("n_members"), col("sse_n"))
      .orderBy(col("cluster_id"))
  }

  lazy val s17Sql: String =
    s"""WITH $codebookCtes,
       |sc2 AS (${duckCent("c1")}),
       |a2 AS (SELECT vec_id, mid AS cluster FROM (
       |  SELECT vec_id, mid, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY score DESC, mid) AS rn FROM sc2) x WHERE rn = 1)
       |SELECT cluster AS cluster_id, CAST(max(n) AS BIGINT) AS n_members,
       |  CAST(CAST(CAST(sum(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx) AS DECIMAL(38,0)) AS VARCHAR) AS DOUBLE) AS sse_n
       |FROM (SELECT a2.cluster, g.d, count(*) AS n,
       |    sum(CAST(q.qv[g.d] AS DECIMAL(38,0))) AS sx,
       |    sum(CAST(q.qv[g.d] AS DECIMAL(38,0)) * CAST(q.qv[g.d] AS DECIMAL(38,0))) AS sxx
       |  FROM a2 JOIN qv q ON a2.vec_id = q.vec_id, generate_series(1, 64) g(d)
       |  GROUP BY a2.cluster, g.d)
       |GROUP BY cluster ORDER BY cluster_id""".stripMargin

  private def duckCent(src: String): String =
    s"""SELECT q.vec_id, c.mid,
       |    ${VectorExprs.duckDot("q.vd", "c.cm")}
       |      / (sqrt(q.n2) * sqrt(${VectorExprs.duckDot("c.cm", "c.cm")})) AS score
       |  FROM qv q CROSS JOIN $src c""".stripMargin

  /** s5's CTE chain up through the trained codebook `c1` — mirrors
    * [[ivfCodebook]]; shared by the s5 and s7 oracles. */
  private def codebookCtes: String =
    s"""${VectorExprs.embCtes},
       |qv AS (SELECT vec_id, vd, n2,
       |  [CAST(round(x * 1000000) AS BIGINT) for x in vd] AS qv FROM eb),
       |c0 AS MATERIALIZED (SELECT vec_id AS mid,
       |  [CAST(x AS DOUBLE) / 1000000.0 for x in qv] AS cm FROM qv WHERE vec_id < 16),
       |sc1 AS (${duckCent("c0")}),
       |a1 AS MATERIALIZED (SELECT vec_id, mid AS cluster FROM (
       |  SELECT vec_id, mid, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY score DESC, mid) AS rn FROM sc1) x WHERE rn = 1),
       |e1 AS (SELECT a1.cluster, d, q.qv[d] AS val
       |  FROM qv q JOIN a1 ON q.vec_id = a1.vec_id, generate_series(1, 64) g(d)),
       |s1 AS (SELECT cluster, d, sum(val) AS s, count(*) AS n FROM e1 GROUP BY cluster, d),
       |c1 AS MATERIALIZED (SELECT cluster AS mid,
       |  list(CAST(s AS DOUBLE) / (n * 1000000.0) ORDER BY d) AS cm FROM s1 GROUP BY cluster)""".stripMargin

  lazy val s5Sql: String =
    s"""WITH $codebookCtes,
       |sc2 AS (${duckCent("c1")}),
       |a2 AS (SELECT vec_id, mid AS cluster FROM (
       |  SELECT vec_id, mid, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY score DESC, mid) AS rn FROM sc2) x WHERE rn = 1)
       |SELECT a2.cluster AS cluster_id, count(*) AS n_members,
       |  CAST(sum(list_sum(q.qv)) AS BIGINT) AS q_checksum
       |FROM a2 JOIN qv q ON a2.vec_id = q.vec_id
       |GROUP BY a2.cluster ORDER BY cluster_id""".stripMargin

  // ---- s7: IVF over the TRAINED codebook — s5 composed into s4 ----
  // The end-to-end operator the stand-in s4 only sketched: train the
  // coarse quantizer (s5's Lloyd round, [[ivfCodebook]]), build the
  // inverted lists by assigning the corpus to trained centroids, probe
  // the query's NPROBE nearest lists. Same plan skeleton as s4 —
  // assignment is one shuffle of pre-combined argmin rows, probe is a
  // broadcast of (query × probed lists) against the assigned corpus —
  // but the centroids are the learned ones, so this is the real
  // trained-IVF index, not a plan-shape demonstration. Oracle = s5's
  // codebook CTEs chained into s4's probe SQL.
  /** The query side of a trained-IVF probe: each query's NPROBE
    * nearest trained centroids, as (qid, qvd, qn2, qcluster). The
    * window ranks only the 16 centroid scores of each of the 10 query
    * vectors — bounded by k·|queries|, never corpus-sized. Shared by
    * s7 (raw-vector rescoring) and s12 (ADC rescoring). */
  private def ivfQueryProbes(spark: SparkSession, dir: String,
      nprobe: Int = NPROBE): DataFrame = {
    val e = embQuantized(spark, dir)
    val cents = ivfCodebook(spark, dir)
    val score = expr("graft_dot(vd, cm)") /
      (sqrt(col("n2")) * sqrt(expr("graft_dot(cm, cm)")))
    val qw = Window.partitionBy(col("vec_id")).orderBy(col("ns"), col("mid"))
    e.filter(col("vec_id") < 10).crossJoin(broadcast(cents))
      .withColumn("ns", -score)
      .withColumn("prn", row_number().over(qw))
      .filter(col("prn") <= nprobe)
      .select(col("vec_id").as("qid"), col("vd").as("qvd"),
        col("n2").as("qn2"), col("mid").as("qcluster"))
  }

  /** nprobe-parameterized s7 body — the assigned corpus is DfCache'd
    * (one assignment pass serves every nprobe setting, s44's sweep
    * included; the index build is the expensive half of trained IVF). */
  def s7TrainedWith(spark: SparkSession, dir: String, nprobe: Int): DataFrame = {
    val corpus = graft.util.DfCache.cached(spark, dir, "ivf_assigned_corpus") {
      val e = embQuantized(spark, dir)
      val cents = ivfCodebook(spark, dir)
      e.join(assignTo(e, cents), Seq("vec_id"))
        .select(col("vec_id"), col("vd"), col("n2"), col("cluster"))
    }
    val qprobe = ivfQueryProbes(spark, dir, nprobe)
    val pairs = broadcast(qprobe)
      .join(corpus.as("c"),
        col("qcluster") === col("c.cluster") && col("qid") =!= col("c.vec_id"))
      .withColumn("dot", expr(VectorExprs.dotExpr("qvd", "c.vd")))
      .select(col("qid").as("query_id"), col("c.vec_id").as("neighbor_id"),
        (col("dot") / (sqrt(col("qn2")) * sqrt(col("c.n2")))).as("cosine"))
    ranked(pairs)
  }

  def s7IvfTrained(spark: SparkSession, dir: String): DataFrame =
    s7TrainedWith(spark, dir, NPROBE)

  /** s7's trained-IVF probe CTEs (assignment + nprobe + scored
    * pairs) over the codebook CTEs — shared by s7Sql and the s9
    * recall oracle, so index tuning updates both in lockstep. */
  private def ivfProbePairsCtes(pairsName: String, nprobe: Int = NPROBE): String =
    s"""psc AS (${duckCent("c1")}),
       |passign AS (SELECT vec_id AS cvec, mid AS cluster FROM (
       |  SELECT vec_id, mid, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY score DESC, mid) AS rn FROM psc) x WHERE rn = 1),
       |qprobe AS (
       |  SELECT p.vec_id AS qid, e.vd AS qvd, e.n2 AS qn2, p.mid AS qcluster FROM (
       |    SELECT vec_id, mid, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY score DESC, mid) AS rn FROM psc WHERE vec_id < 10) p
       |  JOIN eb e ON p.vec_id = e.vec_id WHERE p.rn <= $nprobe),
       |$pairsName AS (
       |  SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
       |    ${VectorExprs.duckDot("q.qvd", "c.vd")}
       |      / (sqrt(q.qn2) * sqrt(c.n2)) AS cosine
       |  FROM qprobe q
       |  JOIN passign a ON a.cluster = q.qcluster
       |  JOIN eb c ON c.vec_id = a.cvec
       |  WHERE c.vec_id != q.qid)""".stripMargin

  lazy val s7Sql: String =
    s"""WITH $codebookCtes,
       |${ivfProbePairsCtes("pairs")},
       |${topkCte("r", "pairs")}
       |SELECT query_id, neighbor_id, cosine, rank FROM r
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ---- s9: recall of the TRAINED IVF index vs the exact baseline ----
  // s8's evaluator pointed at the real index: how much recall does
  // nprobe=2 over the trained codebook give up? Same bounded
  // K·|queries| join; together with s8 this is the quality side of
  // the ANN tuning loop (nprobe/k for IVF, BandBits/Bands for LSH).
  def s9IvfRecall(spark: SparkSession, dir: String): DataFrame =
    recallOf(s1KnnBrute(spark, dir), s7IvfTrained(spark, dir))

  lazy val s9Sql: String =
    s"""WITH $codebookCtes,
       |${exactPairsCte("xpairs")},
       |${topkCte("xr", "xpairs")},
       |exact AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= $K),
       |${ivfProbePairsCtes("apairs")},
       |${topkCte("ar", "apairs")},
       |approx AS (SELECT query_id, neighbor_id FROM ar WHERE rank <= $K)
       |$recallTailSql""".stripMargin

  // ---- s44: recall vs nprobe — the IVF tuning curve as a query ----
  // s9 prices the default nprobe; tuning reads the whole CURVE:
  // aggregate recall@K of the trained IVF at nprobe ∈ {1,2,4,8}.
  // Where the curve plateaus is the cheapest setting that loses
  // nothing — the standard IVF tuning readout (query cost is linear
  // in nprobe, so the plateau point IS the speed/recall frontier).
  // The expensive half (corpus assignment to trained centroids) is
  // DfCache'd and paid ONCE across all four settings — each curve
  // point adds only its (10-query × probed lists) broadcast join;
  // the per-point recall is the K·|queries|-bounded s8/s9 join.
  def s44NprobeCurve(spark: SparkSession, dir: String): DataFrame = {
    val exact = s1KnnBrute(spark, dir)
    Seq(1, 2, 4, 8).map { np =>
      recallOf(exact, s7TrainedWith(spark, dir, np))
        .agg(count(lit(1)).as("n_queries"),
          sum(col("n_exact")).as("n_exact"), sum(col("n_hit")).as("n_hit"))
        .select(lit(np.toLong).as("nprobe"), col("n_queries"),
          col("n_exact"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_exact")).as("recall"))
    }.reduce(_.unionByName(_)).orderBy(col("nprobe"))
  }

  lazy val s44Sql: String = {
    def block(np: Int) =
      s"""SELECT * FROM (
         |WITH $codebookCtes,
         |${exactPairsCte("xpairs")},
         |${topkCte("xr", "xpairs")},
         |exactk AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= $K),
         |${ivfProbePairsCtes("apairs", np)},
         |${topkCte("ar", "apairs")},
         |approxk AS (SELECT DISTINCT query_id, neighbor_id FROM ar
         |            WHERE rank <= $K),
         |j AS (SELECT e.query_id,
         |        CASE WHEN a.query_id IS NULL THEN 0 ELSE 1 END AS hit
         |      FROM exactk e LEFT JOIN approxk a
         |        ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id)
         |SELECT CAST($np AS BIGINT) AS nprobe,
         |  count(DISTINCT query_id) AS n_queries,
         |  count(*) AS n_exact, CAST(sum(hit) AS BIGINT) AS n_hit,
         |  CAST(sum(hit) AS DOUBLE) / count(*) AS recall
         |FROM j)""".stripMargin
    Seq(1, 2, 4, 8).map(block).mkString("", "\nUNION ALL\n", "\nORDER BY nprobe")
  }

  // ---- s8: ANN recall evaluation — s2's LSH vs s1's exact top-k ----
  // The quality gauge every approximate index needs next to its speed
  // number: per query, how many of the exact top-K did the LSH probe
  // recover? Composes the two gated operators as-is — the exact side
  // is the (tiny) per-query top-K, so the join is K·|queries| rows on
  // both sides regardless of corpus size; recall divides two small
  // exact counts in one IEEE op. This is how the BandBits/Bands knobs
  // get tuned at scale: recall from s8, cost from the bench.
  /** Per-query recall of `approx` against `exact` (both (query_id,
    * neighbor_id, …) top-K results) — shared by s8 (LSH), s9
    * (trained IVF) and s11 (PQ/ADC). The approx side is `.distinct()`
    * defensively (r5 advice): today's indexes emit unique pairs, but a
    * future multi-probe variant emitting duplicates would inflate both
    * join multiplicity and n_hit, letting recall silently exceed 1.0 —
    * the dedup costs K·|queries| rows and makes that impossible. */
  def recallOf(exact: DataFrame, approx: DataFrame): DataFrame =
    exact.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
          .distinct(),
        Seq("query_id", "neighbor_id"), "left_outer")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(col("hit")), lit(0L)).as("n_hit"))
      .withColumn("recall", col("n_hit").cast("double") / col("n_exact"))
      .orderBy(col("query_id"))

  def s8RecallEval(spark: SparkSession, dir: String): DataFrame =
    recallOf(s1KnnBrute(spark, dir), s2KnnLsh(spark, dir))

  /** The recall join+aggregate over CTEs named `exact`/`approx` —
    * the shared oracle tail of s8/s9/s11, mirroring [[recallOf]]
    * (including its defensive DISTINCT on the approx side). */
  def recallTailSql: String =
    """SELECT e.query_id, count(*) AS n_exact,
      |  CAST(coalesce(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_hit,
      |  CAST(coalesce(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 END), 0) AS DOUBLE)
      |    / count(*) AS recall
      |FROM exact e LEFT JOIN (SELECT DISTINCT query_id, neighbor_id FROM approx) a
      |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
      |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin

  // Oracle: s1's pair CTE and s2's candidate/pair CTEs — the SAME
  // shared bodies s1Sql/s2Sql are built from — chained off the band
  // CTEs and joined exactly like the Spark plan.
  lazy val s8Sql: String =
    s"""WITH ${VectorExprs.bandCtes},
       |${exactPairsCte("xpairs")},
       |${topkCte("xr", "xpairs")},
       |exact AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= $K),
       |${lshPairsCtes("cand", "apairs")},
       |${topkCte("ar", "apairs")},
       |approx AS (SELECT query_id, neighbor_id FROM ar WHERE rank <= $K)
       |$recallTailSql""".stripMargin

  // ---- s10: PQ asymmetric-distance (ADC) search over v4's codes ----
  // The search half of the product-quantization index: the corpus side
  // is ONLY [[VectorOps.pqAssigned]]'s packed codes (12 bytes/vector —
  // at 1B vectors a 12 GB scan instead of 256 GB of raw float32; that
  // is the reason PQ exists), the query side is a broadcast per-query
  // lookup table. Per (query, centroid, subspace) we precompute
  //   dot(q_m, c_m)  and  |c_m|²   (16×8 entries per query, ~2 KB)
  // and the ADC score of a packed code is 8 nibble-indexed table
  // lookups summed in subspace order:
  //   approx_cos = Σ_m LUT[m][code_m].dot
  //              / (|q| · sqrt(Σ_m LUT[m][code_m].cn2)),
  // i.e. cosine against the RECONSTRUCTED vector without ever touching
  // it — the |recon|² term is itself code-only lookups. Everything is
  // one codegen'd stage over the codes scan (no join on the corpus
  // side beyond the broadcast), then the bounded top-k aggregate; at
  // 100 TB the plan is scan-codes → map → map-side-combined top-k, no
  // shuffle of anything corpus-sized. Folds are sequential on both
  // engines, so the gate stays exact equality.
  /** The per-query ADC lookup table (qid, qn2, lut): for each
    * (subspace m, codebook row mid), dot(q_m, c_m) and |c_m|² —
    * 16×8 entries (~2 KB) per query, broadcast to wherever packed
    * codes are scored. Shared by s10 (full-corpus ADC) and s12
    * (IVF-restricted ADC). */
  private def pqQueryLut(spark: SparkSession, dir: String,
      lo: Long = 0L, hi: Long = 10L): DataFrame = {
    import graft.operators.vector.VectorOps.{PqM, PqD, PqK, pqCents}
    val q = VectorExprs.embFeatures(spark, dir)
      .filter(col("vec_id") >= lo && col("vec_id") < hi)
      .select(col("vec_id"), col("vd"), col("n2"))
    def subFold(a: String, b: String) =
      s"""transform(sequence(0, ${PqM - 1}), m ->
         |  aggregate(sequence(1, $PqD), cast(0.0 as double),
         |    (a, d) -> a + element_at($a, m*$PqD + d) * element_at($b, m*$PqD + d)))""".stripMargin
    q.crossJoin(broadcast(pqCents(spark, dir)))
      .withColumn("subdot", expr(subFold("vd", "cvd")))
      .withColumn("subn2", expr(subFold("cvd", "cvd")))
      .select(col("vec_id"), col("n2"), col("mid"),
        posexplode(arrays_zip(col("subdot"), col("subn2"))).as(Seq("m", "s")))
      .select(col("vec_id"), col("n2"),
        (col("m") * PqK + col("mid")).as("idx"),
        col("s.subdot").as("dot"), col("s.subn2").as("cn2"))
      .groupBy(col("vec_id"), col("n2"))
      // a MAP keyed by m·PqK+mid, not a dense array: a degenerate
      // corpus with fewer than PqK vectors has a sparse codebook, and
      // positional indexing would read past the array's end — codes
      // only ever reference existing mids, so map lookups always hit
      .agg(expr(
        "map_from_entries(collect_list(struct(idx, named_struct('dot', dot, 'cn2', cn2))))")
        .as("lut"))
      .select(col("vec_id").as("qid"), col("n2").as("qn2"), col("lut"))
  }

  /** ADC-score and rank rows carrying (qid, qn2, lut, vec_id,
    * pq_code): the cosine against the RECONSTRUCTED corpus vector is
    * 2×8 nibble-indexed lookups summed in subspace order — one
    * codegen'd projection, then the bounded top-K aggregate. */
  private def adcRanked(joined: DataFrame): DataFrame = {
    import graft.operators.vector.VectorOps.{PqM, PqK}
    // nibble m of the packed code word keys subspace m's LUT rows
    def lutAt(field: String) =
      s"element_at(lut, cast(m*$PqK + shiftright(pq_code, 4*m) % $PqK as int)).$field"
    def adcFold(field: String) =
      s"""aggregate(sequence(0, ${PqM - 1}), cast(0.0 as double),
         |  (a, m) -> a + ${lutAt(field)})""".stripMargin
    val pairs = joined
      .withColumn("adot", expr(adcFold("dot")))
      .withColumn("an2", expr(adcFold("cn2")))
      .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
        (col("adot") / (sqrt(col("qn2")) * sqrt(col("an2")))).as("cosine"))
    ranked(pairs)
  }

  def s10PqKnn(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.vector.VectorOps.pqAssigned
    graft.functions.GraftFunctions.registerAll(spark)
    val codes = pqAssigned(spark, dir).select(col("vec_id"), col("pq_code"))
    adcRanked(codes.crossJoin(broadcast(pqQueryLut(spark, dir)))
      .filter(col("qid") =!= col("vec_id")))
  }

  /** s10's ADC CTEs (query LUT rows + scored pairs) over
    * [[graft.operators.vector.VectorOps.pqPickCtes]] — shared by
    * s10Sql and the s11 recall oracle. The oracle scores via the
    * pick table's per-subspace codes (provably the nibbles of
    * pq_code), with both folds in subspace order like the Spark
    * side's `aggregate` over m. */
  private def pqAdcPairsCtes(pairsName: String, probed: Boolean = false,
      lo: Long = 0L, hi: Long = 10L): String = {
    import graft.operators.vector.VectorOps.{PqM, PqD}
    def subFold(a: String, b: String) =
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |  [ $a[g.m*$PqD + d] * $b[g.m*$PqD + d] for d in generate_series(1, $PqD) ]),
         |  (a, x) -> a + x)""".stripMargin
    def mFold(v: String) =
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list($v ORDER BY p.m)),
         |    (a, x) -> a + x)""".stripMargin
    // probed = s12's IVF restriction: the corpus vector's coarse
    // cluster (passign) must be one the query probed (qpr) — at most
    // one matching qpr row per (query, vector), so no multiplicity
    val probeJoin = if (probed)
      s"""
         |  JOIN passign pa ON pa.cvec = p.vec_id
         |  JOIN qpr ON qpr.qcluster = pa.cluster AND qpr.qid = l.qid""".stripMargin
    else ""
    s"""qlut AS (
       |  SELECT q.vec_id AS qid, q.n2 AS qn2, c.mid, g.m,
       |    ${subFold("q.vd", "c.cvd")} AS subdot,
       |    ${subFold("c.cvd", "c.cvd")} AS subn2
       |  FROM eb q CROSS JOIN pqcents c, generate_series(0, ${PqM - 1}) g(m)
       |  WHERE q.vec_id >= $lo AND q.vec_id < $hi),
       |$pairsName AS (
       |  SELECT l.qid AS query_id, p.vec_id AS neighbor_id,
       |    ${mFold("l.subdot")}
       |      / (sqrt(l.qn2) * sqrt(${mFold("l.subn2")})) AS cosine
       |  FROM pick p JOIN qlut l ON l.m = p.m AND l.mid = p.code$probeJoin
       |  WHERE l.qid != p.vec_id
       |  GROUP BY l.qid, p.vec_id, l.qn2)""".stripMargin
  }

  lazy val s10Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |${graft.operators.vector.VectorOps.pqPickCtes},
       |${pqAdcPairsCtes("pairs")},
       |${topkCte("r", "pairs")}
       |SELECT query_id, neighbor_id, cosine, rank FROM r
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ---- s11: recall of the PQ/ADC index vs the exact baseline ----
  // The third row of the ANN quality board (s8 LSH, s9 trained IVF,
  // s11 PQ): how much of the exact cosine top-K survives 64×
  // compression? This is the number that prices v4's 4-byte codes —
  // compression ratio from v4, recall from here, cost from bench.
  def s11PqRecall(spark: SparkSession, dir: String): DataFrame =
    recallOf(s1KnnBrute(spark, dir), s10PqKnn(spark, dir))

  lazy val s11Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |${exactPairsCte("xpairs")},
       |${topkCte("xr", "xpairs")},
       |exact AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= $K),
       |${graft.operators.vector.VectorOps.pqPickCtes},
       |${pqAdcPairsCtes("apairs")},
       |${topkCte("ar", "apairs")},
       |approx AS (SELECT query_id, neighbor_id FROM ar WHERE rank <= $K)
       |$recallTailSql""".stripMargin

  // ---- s12: IVF-PQ — the composed billion-vector index ----
  // The two halves finally composed the way a production ANN system
  // ships them (FAISS's IVFPQ): the trained coarse quantizer
  // ([[ivfCodebook]]) partitions the corpus into inverted lists, and
  // within the probed lists candidates are scored by ADC over v4's
  // packed codes — never touching a raw corpus vector. The index row
  // is (vec_id, cluster, pq_code): ~16 bytes/vector. At 1B vectors
  // that's a 16 GB index; a query reads only the NPROBE/16 of it in
  // its probed lists and the scoring scan is the same codegen'd
  // lookup-table fold as s10 — IVF bounds the candidates, PQ bounds
  // the bytes. Plan: broadcast(probes ⋈ LUTs — tiny) against the
  // cached index scan, filter on cluster match, ADC fold, bounded
  // top-k; no corpus-sized shuffle anywhere. Recall is priced by s13
  // exactly like s9 priced the raw-vector IVF.
  /** The IVF-PQ index: coarse cluster + packed PQ code per corpus
    * vector — DfCache'd (built once per session, probed by s12/s13;
    * at scale this is the persisted artifact, cf. d9's band index). */
  def ivfPqIndex(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "ivfpq_index") {
      import graft.operators.vector.VectorOps.pqAssigned
      val e = embQuantized(spark, dir)
      assignTo(e, ivfCodebook(spark, dir))
        .join(pqAssigned(spark, dir), Seq("vec_id"))
        .select(col("vec_id"), col("cluster"), col("pq_code"))
    }

  /** nprobe-parameterized body of s12 — `nprobe = #clusters` probes
    * everything, collapsing IVF-PQ to s10's full ADC scan (the
    * composition law the spec pins). */
  def s12IvfPqWith(spark: SparkSession, dir: String, nprobe: Int): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    val qp = ivfQueryProbes(spark, dir, nprobe).select(col("qid"), col("qcluster"))
      .join(pqQueryLut(spark, dir), Seq("qid"))
    adcRanked(ivfPqIndex(spark, dir).join(broadcast(qp),
      col("qcluster") === col("cluster") && col("qid") =!= col("vec_id")))
  }

  def s12IvfPq(spark: SparkSession, dir: String): DataFrame =
    s12IvfPqWith(spark, dir, NPROBE)

  /** s12's coarse-quantizer CTEs: corpus assignment to the trained
    * codebook and the query's NPROBE probed clusters — the same
    * psc/row_number shapes as [[ivfProbePairsCtes]], exposing
    * (cvec, cluster) and (qid, qcluster) for the ADC pair join. */
  private def ivfCoarseCtes: String =
    s"""psc AS (${duckCent("c1")}),
       |passign AS (SELECT vec_id AS cvec, mid AS cluster FROM (
       |  SELECT vec_id, mid, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY score DESC, mid) AS rn FROM psc) x WHERE rn = 1),
       |qpr AS (SELECT vec_id AS qid, mid AS qcluster FROM (
       |  SELECT vec_id, mid, row_number() OVER (PARTITION BY vec_id
       |    ORDER BY score DESC, mid) AS rn FROM psc WHERE vec_id < 10) p
       |  WHERE rn <= $NPROBE)""".stripMargin

  lazy val s12Sql: String =
    s"""WITH $codebookCtes,
       |${graft.operators.vector.VectorOps.pqPickCtes},
       |$ivfCoarseCtes,
       |${pqAdcPairsCtes("pairs", probed = true)},
       |${topkCte("r", "pairs")}
       |SELECT query_id, neighbor_id, cosine, rank FROM r
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ---- s13: recall of the IVF-PQ index vs the exact baseline ----
  // The fourth row of the ANN quality board (s8 LSH, s9 IVF, s11 PQ,
  // s13 IVF-PQ): the composed index loses recall BOTH ways — probes
  // miss lists (s9's loss) and ADC mis-ranks within lists (s11's
  // loss) — so this is the number that tunes NPROBE against the
  // compression, and the one a production deployment watches.
  def s13IvfPqRecall(spark: SparkSession, dir: String): DataFrame =
    recallOf(s1KnnBrute(spark, dir), s12IvfPq(spark, dir))

  lazy val s13Sql: String =
    s"""WITH $codebookCtes,
       |${exactPairsCte("xpairs")},
       |${topkCte("xr", "xpairs")},
       |exact AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= $K),
       |${graft.operators.vector.VectorOps.pqPickCtes},
       |$ivfCoarseCtes,
       |${pqAdcPairsCtes("apairs", probed = true)},
       |${topkCte("ar", "apairs")},
       |approx AS (SELECT query_id, neighbor_id FROM ar WHERE rank <= $K)
       |$recallTailSql""".stripMargin

  // ---- s14/s15: Lloyd-TRAINED product quantization ----
  // s11 prices v4's SEEDED codebooks (16 arbitrary corpus rows per
  // subspace) at ~0.2 recall — the cost of an untrained quantizer.
  // This is the fix: one distributed Lloyd update per subspace —
  // exactly [[ivfCodebook]]'s trained-coarse-quantizer move applied to
  // all 8 PQ subspaces in ONE plan — then re-encode and re-gauge. The
  // update runs on integer micro-units ([[embQuantized]]) so centroid
  // sums are order-independent exact longs and the codebook is
  // bit-identical on both engines; cells are means over v4's seed
  // ASSIGNMENT ([[graft.operators.vector.VectorOps.pqAssigned]]'s
  // nibbles), so (m, code) cells nobody picked simply don't exist —
  // identically on both engines.
  //
  // Scale shape: the training pass is explode(M·D rows per vector) →
  // ONE map-side-combined (m, code, d) sum — 1024 cells total, never
  // a shuffle of vectors; re-encoding is v4's broadcast-argmin shape
  // against 128 trained cells. At 100 TB this is one extra corpus
  // scan over the build path and zero change to the search path.
  /** The trained per-subspace codebook: (m, code, sub[PqD]) —
    * DfCache'd: built once, consumed by the re-encoder and the s15
    * query LUTs (and it is what you'd persist next to d9's band
    * index as the deployment artifact). */
  /** One distributed Lloyd mean-update: per-subspace codebook means
    * over `codes` (vec_id, pq_code) and `qv` (vec_id, qv micro-units)
    * → (m, code, sub[PqD]) — [[pqTrainedCents]]'s body parameterized
    * so the OPQ path (s49) trains on rotated vectors through the
    * identical plan. */
  private def trainedCentsOf(codes: DataFrame, qv: DataFrame): DataFrame = {
    import graft.operators.vector.VectorOps.{PqM, PqD, PqK}
    codes.select(col("vec_id"), col("pq_code"))
      .withColumn("m", explode(expr(s"sequence(0, ${PqM - 1})")))
      .withColumn("code", expr(s"cast(shiftright(pq_code, 4 * m) % $PqK as int)"))
      .join(qv, Seq("vec_id"))
      .withColumn("d", explode(expr(s"sequence(1, $PqD)")))
      .select(col("m"), col("code"), col("d"),
        expr(s"element_at(qv, m * $PqD + d)").as("val"))
      .groupBy(col("m"), col("code"), col("d"))
      .agg(sum(col("val")).as("s"), count(lit(1)).as("n"))
      .groupBy(col("m"), col("code"))
      .agg(expr(
        "transform(sort_array(collect_list(struct(d, cast(s as double) / (n * 1000000.0)))), p -> p.col2)")
        .as("sub"))
  }

  def pqTrainedCents(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "pq_trained_cents") {
      import graft.operators.vector.VectorOps.pqAssigned
      trainedCentsOf(pqAssigned(spark, dir),
        embQuantized(spark, dir).select(col("vec_id"), col("qv")))
    }

  /** The re-encoded corpus under the trained codebook: (vec_id,
    * pq_code, recon_err) — v4's broadcast-argmin shape, DfCache'd as
    * the corpus side of s15's ADC search. */
  /** Re-encode `e` (vec_id, vd) under a trained codebook (m, code,
    * sub) — [[pqTrainedAssigned]]'s broadcast-argmin body,
    * parameterized for the s49 rotated path. */
  private def trainedCodesOf(e: DataFrame, tcents: DataFrame): DataFrame = {
    import graft.operators.vector.VectorOps.{PqM, PqD}
    val distExpr =
      s"""aggregate(sequence(1, $PqD), cast(0.0 as double),
         |  (a, d) -> a + (element_at(vd, m * $PqD + d) - element_at(sub, d))
         |              * (element_at(vd, m * $PqD + d) - element_at(sub, d)))""".stripMargin
    val scored = e.crossJoin(broadcast(tcents))
      .withColumn("dist", expr(distExpr))
    val picks = (0 until PqM).map(m =>
      min(when(col("m") === m, struct(col("dist").as("d"), col("code").as("c"))))
        .as(s"p$m"))
    val g = scored.groupBy(col("vec_id")).agg(picks.head, picks.tail: _*)
    val code = (0 until PqM).map(m => col(s"p$m.c") * (1L << (4 * m)))
      .reduce(_ + _)
    val err = (0 until PqM).map(m => col(s"p$m.d")).reduce(_ + _)
    g.select(col("vec_id"), code.cast("long").as("pq_code"),
      err.as("recon_err"))
  }

  def pqTrainedAssigned(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "pq_trained_codes") {
      trainedCodesOf(embQuantized(spark, dir).select(col("vec_id"), col("vd")),
        pqTrainedCents(spark, dir))
    }

  def s14PqTrained(spark: SparkSession, dir: String): DataFrame =
    pqTrainedAssigned(spark, dir).orderBy(col("vec_id"))

  /** s15's query LUTs against the TRAINED cells — [[pqQueryLut]]'s
    * map shape (keyed m·PqK+code), so [[adcRanked]] scores trained
    * codes unchanged. */
  /** Query LUT rows (qid, qn2, lut keyed m·PqK+code) of `q` (vec_id,
    * vd, n2) against a trained codebook — [[pqTrainedQueryLut]]'s
    * body, parameterized for the s49 rotated path. */
  private def trainedLutOf(q: DataFrame, tcents: DataFrame): DataFrame = {
    import graft.operators.vector.VectorOps.{PqM, PqD, PqK}
    val dotExpr =
      s"""aggregate(sequence(1, $PqD), cast(0.0 as double),
         |  (a, d) -> a + element_at(vd, m * $PqD + d) * element_at(sub, d))""".stripMargin
    val cn2Expr =
      s"""aggregate(sequence(1, $PqD), cast(0.0 as double),
         |  (a, d) -> a + element_at(sub, d) * element_at(sub, d))""".stripMargin
    q.crossJoin(broadcast(tcents))
      .withColumn("dot", expr(dotExpr))
      .withColumn("cn2", expr(cn2Expr))
      .select(col("vec_id"), col("n2"),
        (col("m") * PqK + col("code")).as("idx"), col("dot"), col("cn2"))
      .groupBy(col("vec_id"), col("n2"))
      .agg(expr(
        "map_from_entries(collect_list(struct(idx, named_struct('dot', dot, 'cn2', cn2))))")
        .as("lut"))
      .select(col("vec_id").as("qid"), col("n2").as("qn2"), col("lut"))
  }

  private def pqTrainedQueryLut(spark: SparkSession, dir: String): DataFrame =
    trainedLutOf(
      VectorExprs.embFeatures(spark, dir).filter(col("vec_id") < 10)
        .select(col("vec_id"), col("vd"), col("n2")),
      pqTrainedCents(spark, dir))

  /** The trained-ADC search itself — s10's plan over s14's codes. */
  def pqTrainedKnn(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    val codes = pqTrainedAssigned(spark, dir).select(col("vec_id"), col("pq_code"))
    adcRanked(codes.crossJoin(broadcast(pqTrainedQueryLut(spark, dir)))
      .filter(col("qid") =!= col("vec_id")))
  }

  def s15PqTrainedRecall(spark: SparkSession, dir: String): DataFrame =
    recallOf(s1KnnBrute(spark, dir), pqTrainedKnn(spark, dir))

  // ---- s49: OPQ-style rotated PQ — the next measured-recall rung ----
  // s15 prices the trained-but-axis-aligned codebook. OPQ's insight
  // (Ge et al. 2013): PQ quantizes each 8-dim SLICE independently, so
  // recall depends on how the rotation of the input spreads variance
  // across slices — train (or fix) an orthonormal R, encode R·x, and
  // the ADC search is unchanged because dots and norms are invariant.
  // We use the deterministic structured rotation (Walsh–Hadamard ×
  // ±1 diagonal, [[VectorExprs.rotExpr]]) — the fast-JL fixed
  // rotation OPQ implementations start from — so the gate stays
  // engine-exact. The ENTIRE trained-PQ pipeline (seed codes → Lloyd
  // mean update → re-encode → LUT → ADC) is the s14/s15 plan applied
  // to rotated vectors through the parameterized helpers above; the
  // exact baseline is UNROTATED (rotation invariance is the spec'd
  // law), so s49's recall is directly comparable to s15's row.
  /** Rotated corpus features (vec_id, vd = R·x, n2, qv) — DfCache'd:
    * training reads it twice, re-encoding and the LUT once each. */
  private[graft] def embRotated(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "emb_rotated") {
      graft.functions.GraftFunctions.registerAll(spark)
      graft.sources.Tables.load(spark, dir, "embeddings")
        .withColumn("vd", expr(VectorExprs.castDoubleExpr))
        .withColumn("vd", expr(VectorExprs.rotExpr))
        .withColumn("n2", expr(VectorExprs.n2Expr))
        .withColumn("qv",
          expr("transform(vd, x -> cast(round(x * 1000000) as bigint))"))
        .select(col("vec_id"), col("vd"), col("n2"), col("qv"))
    }

  /** Seed per-subspace codes of `e` (vec_id, vd) against a 64-dim
    * seed codebook (mid, cvd) — VectorOps.pqAssigned's argmin body
    * parameterized for the rotated seed. */
  private def seedCodesOf(e: DataFrame, cents: DataFrame): DataFrame = {
    import graft.operators.vector.VectorOps.{PqM, PqD}
    val distsExpr =
      s"""transform(sequence(0, ${PqM - 1}), m ->
         |  aggregate(sequence(1, $PqD), cast(0.0 as double),
         |    (a, d) -> a + (element_at(vd, m*$PqD + d) - element_at(cvd, m*$PqD + d))
         |                * (element_at(vd, m*$PqD + d) - element_at(cvd, m*$PqD + d))))""".stripMargin
    val scored = e.crossJoin(broadcast(cents))
      .withColumn("dists", expr(distsExpr))
    val picks = (0 until PqM).map(m =>
      min(struct(element_at(col("dists"), m + 1).as("d"), col("mid").as("c")))
        .as(s"p$m"))
    val g = scored.groupBy(col("vec_id")).agg(picks.head, picks.tail: _*)
    val code = (0 until PqM).map(m => col(s"p$m.c") * (1L << (4 * m)))
      .reduce(_ + _)
    g.select(col("vec_id"), code.cast("long").as("pq_code"))
  }

  /** The rotated trained codebook — the deployment artifact next to
    * s14's (a consumer persists BOTH the rotation parameters, here
    * none since R is structural, and these cells). */
  private def opqTrainedCents(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "opq_trained_cents") {
      import graft.operators.vector.VectorOps.PqK
      val r = embRotated(spark, dir)
      val seed = r.filter(col("vec_id") < PqK)
        .select(col("vec_id").as("mid"), col("vd").as("cvd"))
      trainedCentsOf(seedCodesOf(r.select(col("vec_id"), col("vd")), seed),
        r.select(col("vec_id"), col("qv")))
    }

  private[graft] def opqAssigned(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "opq_codes") {
      trainedCodesOf(embRotated(spark, dir).select(col("vec_id"), col("vd")),
        opqTrainedCents(spark, dir))
    }

  /** The rotated-ADC search — s10's plan over rotated codes (search
    * path still scans codes only; the rotation is an encode-time
    * cost, amortized like the codebook training). */
  def opqKnn(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    val lut = trainedLutOf(
      embRotated(spark, dir).filter(col("vec_id") < 10)
        .select(col("vec_id"), col("vd"), col("n2")),
      opqTrainedCents(spark, dir))
    adcRanked(opqAssigned(spark, dir).select(col("vec_id"), col("pq_code"))
      .crossJoin(broadcast(lut))
      .filter(col("qid") =!= col("vec_id")))
  }

  def s49OpqRecall(spark: SparkSession, dir: String): DataFrame =
    recallOf(s1KnnBrute(spark, dir), opqKnn(spark, dir))

  /** Rotated-path oracle CTEs, code half: seed pick → trained cells
    * → re-encode, all over `ebr` ([[VectorExprs.ebrCtes]]) with
    * r-prefixed names so they compose with the unrotated CTEs in one
    * WITH. Mirrors pqPickCtes + pqTrainedCtes; s50 gates `rrpick`
    * directly and [[opqCtes]] chains the ADC half for s49. */
  private def opqCodeCtes: String = opqCodeCtesFrom("ebr")

  /** The same rotated-path code CTEs over any source CTE carrying
    * (vec_id, vd, qv) — "ebr" for s49/s50, "eba" for the s51
    * allocation rung. */
  private def opqCodeCtesFrom(src: String): String = {
    import graft.operators.vector.VectorOps.{PqM, PqD, PqK}
    val dist = (m: String) =>
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |  [ (e.vd[$m*$PqD + d] - c.cvd[$m*$PqD + d]) * (e.vd[$m*$PqD + d] - c.cvd[$m*$PqD + d])
         |    for d in generate_series(1, $PqD) ]), (a, x) -> a + x)""".stripMargin
    s"""rcents AS (SELECT vec_id AS mid, vd AS cvd FROM $src WHERE vec_id < $PqK),
       |rsc0 AS (
       |  SELECT e.vec_id, c.mid,
       |    [ ${dist("(m - 1)")} for m in generate_series(1, $PqM) ] AS dists
       |  FROM $src e CROSS JOIN rcents c),
       |rpick0 AS MATERIALIZED (
       |  SELECT vec_id, m, mid AS code, dist FROM (
       |    SELECT vec_id, mid, m - 1 AS m, dists[m] AS dist,
       |      row_number() OVER (PARTITION BY vec_id, m ORDER BY dists[m], mid) AS rn
       |    FROM rsc0, generate_series(1, $PqM) g(m)) x WHERE rn = 1),
       |rtmem AS (
       |  SELECT p.m, p.code, g.d, q.qv[p.m * $PqD + g.d] AS val
       |  FROM rpick0 p JOIN $src q ON q.vec_id = p.vec_id,
       |       generate_series(1, $PqD) g(d)),
       |rtsum AS (SELECT m, code, d, sum(val) AS s, count(*) AS n
       |  FROM rtmem GROUP BY m, code, d),
       |rtcent AS MATERIALIZED (SELECT m, code,
       |  list(CAST(s AS DOUBLE) / (n * 1000000.0) ORDER BY d) AS sub
       |  FROM rtsum GROUP BY m, code),
       |rrsc AS (
       |  SELECT e.vec_id, t.m, t.code,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      [ (e.vd[t.m * $PqD + d] - t.sub[d]) * (e.vd[t.m * $PqD + d] - t.sub[d])
       |        for d in generate_series(1, $PqD) ]), (a, x) -> a + x) AS dist
       |  FROM $src e CROSS JOIN rtcent t),
       |rrpick AS MATERIALIZED (
       |  SELECT vec_id, m, code, dist FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
       |      ORDER BY dist, code) AS rn FROM rrsc) x WHERE rn = 1)""".stripMargin
  }

  /** Rotated-path oracle CTEs, ADC half — chains after
    * [[opqCodeCtes]]. */
  private def opqCtes(pairsName: String): String = opqCtesFrom(pairsName, "ebr")

  private def opqCtesFrom(pairsName: String, src: String): String = {
    import graft.operators.vector.VectorOps.PqD
    def mFold(v: String) =
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list($v ORDER BY p.m)),
         |    (a, x) -> a + x)""".stripMargin
    s"""${opqCodeCtesFrom(src)},
       |rtqlut AS (
       |  SELECT q.vec_id AS qid, q.n2 AS qn2, t.m, t.code,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      [ q.vd[t.m * $PqD + d] * t.sub[d] for d in generate_series(1, $PqD) ]),
       |      (a, x) -> a + x) AS subdot,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      [ t.sub[d] * t.sub[d] for d in generate_series(1, $PqD) ]),
       |      (a, x) -> a + x) AS subn2
       |  FROM $src q CROSS JOIN rtcent t WHERE q.vec_id < 10),
       |$pairsName AS (
       |  SELECT l.qid AS query_id, p.vec_id AS neighbor_id,
       |    ${mFold("l.subdot")}
       |      / (sqrt(l.qn2) * sqrt(${mFold("l.subn2")})) AS cosine
       |  FROM rrpick p JOIN rtqlut l ON l.m = p.m AND l.code = p.code
       |  WHERE l.qid != p.vec_id
       |  GROUP BY l.qid, p.vec_id, l.qn2)""".stripMargin
  }

  lazy val s49Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |${exactPairsCte("xpairs")},
       |${topkCte("xr", "xpairs")},
       |exact AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= $K),
       |${VectorExprs.ebrCtes},
       |${opqCtes("rapairs")},
       |${topkCte("ar", "rapairs")},
       |approx AS (SELECT query_id, neighbor_id FROM ar WHERE rank <= $K)
       |$recallTailSql""".stripMargin

  // ---- s50: the rotated codes artifact itself ----
  // s14's pairing applied to s49: the (vec_id, pq_code, recon_err)
  // table a deployment persists next to the rotated codebook — gated
  // so the 4-byte-code artifact, not just its recall, is engine-
  // exact. recon_err here measures quantization distortion in the
  // ROTATED geometry (= original distortion, rotation is isometric).
  def s50OpqCodes(spark: SparkSession, dir: String): DataFrame =
    opqAssigned(spark, dir).orderBy(col("vec_id"))

  lazy val s50Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |${VectorExprs.ebrCtes},
       |$opqCodeCtes
       |SELECT vec_id,
       |  CAST(sum(code * (1 << (4 * CAST(m AS INTEGER)))) AS BIGINT) AS pq_code,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(dist ORDER BY m)),
       |              (a, x) -> a + x) AS recon_err
       |FROM rrpick GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // ---- s51: DATA-trained rotation — the variance-balancing
  // dimension allocation ----
  // s49 measured the FIXED Hadamard rotation buying nothing (0.26 vs
  // s15's trained-but-unrotated 0.28), so this rung trains the
  // rotation ON THE DATA, in the one family both engines can replay
  // bit-exactly: a dimension-ALLOCATION permutation — OPQ's
  // dimension-assignment degree of freedom (the non-parametric half
  // of Ge et al. 2013's alternating solver; FAISS ships the same
  // move as OPQ's pre-permutation). Dims are ranked by EXACT integer
  // centered variance n·Σq² − (Σq)² over micro-unit coordinates
  // (DECIMAL(38)/HUGEINT, the e29 promotion — ranks engine-exact by
  // construction, no float eigen-solver to mirror), then snake-dealt
  // into the PqM subspaces so per-subspace variance sums balance
  // (v17 gauges the before/after shares). A permutation matrix is
  // exactly orthonormal — dots and norms invariant (v16's law) —
  // and the trained artifact is a 64-row table. The PQ chain over
  // the permuted corpus is the identical parameterized s14/s15
  // plan, so the recall row is directly comparable to s15's 0.28
  // and s49's 0.26 rungs.
  /** Per-dim exact centered variance proxy (d, ss = n·Σq² − (Σq)²,
    * micro²·n units, DECIMAL(38)). */
  private[graft] def dimVariance(spark: SparkSession, dir: String): DataFrame =
    embQuantized(spark, dir)
      .select(explode(expr(
        "transform(sequence(1, 64), d -> struct(d AS d, element_at(qv, d) AS q))"))
        .as("x"))
      .select(col("x.d").as("d"), col("x.q").as("q"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s1"),
        sum(col("q").cast("decimal(38,0)") * col("q")).as("s2"))
      .select(col("d"),
        (col("n").cast("decimal(38,0)") * col("s2")
          - col("s1").cast("decimal(38,0)") * col("s1")).as("ss"))

  /** The trained permutation (old_d → new_d): snake deal of the
    * variance-ranked dims into PqM subspaces. 64 bounded rows. */
  private[graft] def allocPerm(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "alloc_perm") {
      import org.apache.spark.sql.expressions.Window
      dimVariance(spark, dir)
        .withColumn("rn",
          (row_number().over(Window.orderBy(col("ss").desc, col("d")))
            .cast("long") - 1).as("rn"))
        .select(col("d").as("old_d"),
          expr("""CAST(CASE WHEN (rn div 8) % 2 = 0
                 |     THEN (rn % 8) * 8 + rn div 8 + 1
                 |     ELSE (7 - rn % 8) * 8 + rn div 8 + 1 END AS INT)"""
            .stripMargin).as("new_d"))
    }

  /** Allocation-rotated corpus (vec_id, vd, n2, qv) — embRotated's
    * shape with the trained permutation applied (the 64-row artifact
    * collects driver-side, the codebook-literal class). */
  private[graft] def embAllocated(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "emb_alloc") {
      graft.functions.GraftFunctions.registerAll(spark)
      // identity fallback keeps the degenerate-input contract: an
      // empty corpus has no variance table, and rotating zero rows
      // by the identity is the only deterministic answer
      val inv = Array.tabulate(65)(identity)
      val permRows = allocPerm(spark, dir).collect()
      if (permRows.nonEmpty) {
        permRows.foreach { r =>
          inv(r.getAs[Int]("new_d")) = r.getAs[Int]("old_d")
        }
        require(inv.drop(1).toSet == (1 to 64).toSet,
          "allocation permutation must be a bijection on 1..64")
      }
      val invLit = (1 to 64).map(inv).mkString(",")
      graft.sources.Tables.load(spark, dir, "embeddings")
        .withColumn("vd", expr(VectorExprs.castDoubleExpr))
        .withColumn("vd", expr(s"transform(array($invLit), i -> element_at(vd, i))"))
        .withColumn("n2", expr(VectorExprs.n2Expr))
        .withColumn("qv",
          expr("transform(vd, x -> cast(round(x * 1000000) as bigint))"))
        .select(col("vec_id"), col("vd"), col("n2"), col("qv"))
    }

  private def allocTrainedCents(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "alloc_trained_cents") {
      import graft.operators.vector.VectorOps.PqK
      val r = embAllocated(spark, dir)
      val seed = r.filter(col("vec_id") < PqK)
        .select(col("vec_id").as("mid"), col("vd").as("cvd"))
      trainedCentsOf(seedCodesOf(r.select(col("vec_id"), col("vd")), seed),
        r.select(col("vec_id"), col("qv")))
    }

  private[graft] def allocAssigned(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "alloc_codes") {
      trainedCodesOf(embAllocated(spark, dir).select(col("vec_id"), col("vd")),
        allocTrainedCents(spark, dir))
    }

  def allocKnn(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    val lut = trainedLutOf(
      embAllocated(spark, dir).filter(col("vec_id") < 10)
        .select(col("vec_id"), col("vd"), col("n2")),
      allocTrainedCents(spark, dir))
    adcRanked(allocAssigned(spark, dir).select(col("vec_id"), col("pq_code"))
      .crossJoin(broadcast(lut))
      .filter(col("qid") =!= col("vec_id")))
  }

  def s51AllocRecall(spark: SparkSession, dir: String): DataFrame =
    recallOf(s1KnnBrute(spark, dir), allocKnn(spark, dir))

  lazy val s51Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |${exactPairsCte("xpairs")},
       |${topkCte("xr", "xpairs")},
       |exact AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= $K),
       |${VectorExprs.ebaCtes},
       |${opqCtesFrom("rapairs", "eba")},
       |${topkCte("ar", "rapairs")},
       |approx AS (SELECT query_id, neighbor_id FROM ar WHERE rank <= $K)
       |$recallTailSql""".stripMargin

  // ---- s52: + one trained Givens decorrelation layer ----
  // The alternating-solver step s51 left on the table: OPQ's
  // parametric rotation, restricted to the one family both engines
  // replay bit-exactly — 32 DISJOINT 2×2 Jacobi rotations, pair
  // (2k−1, 2k) inside each allocated subspace, angles TRAINED on the
  // allocated corpus's integer covariance. No transcendentals: the
  // classic rational Jacobi formulas need only +,−,×,÷,sqrt
  //   τ = (C_jj − C_ii) / (2·C_ij),
  //   t = sign(τ)/(|τ| + √(1+τ²)),  c = 1/√(1+t²),  s = t·c
  // and IEEE requires ÷ and √ correctly rounded, so identical
  // integer covariance sums (n·Σqq − Σq·Σq, DECIMAL(38)/HUGEINT)
  // give identical doubles on both engines — the same reasoning
  // that makes the allocation ranks exact, extended to a DENSE
  // (block-diagonal) trained R. Each 2×2 block is orthonormal by
  // construction (c² + s² = 1 up to float rounding — the v16-style
  // law), and the rotation ZEROES each trained pair's covariance,
  // the quantization-loss term PQ pays for within-slice correlation.
  // The (k, c, s) table stays IN-PLAN on the Spark side (aggregated
  // to broadcast arrays, never collected through a string literal),
  // so the doubles are the engine's own all the way through.
  /** Per-pair trained (k, c, s), k = 1..32 over the ALLOCATED corpus. */
  private def givensCs(spark: SparkSession, dir: String): DataFrame = {
    val pairStats = embAllocated(spark, dir)
      .select(explode(expr(
        """transform(sequence(1, 32), k -> struct(k AS k,
          |  element_at(qv, 2*k - 1) AS qi, element_at(qv, 2*k) AS qj))"""
          .stripMargin)).as("x"))
      .select(col("x.k").as("k"), col("x.qi").as("qi"), col("x.qj").as("qj"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("qi")).as("si"), sum(col("qj")).as("sj"),
        sum(col("qi").cast("decimal(38,0)") * col("qj")).as("sij"),
        sum(col("qi").cast("decimal(38,0)") * col("qi")).as("sii"),
        sum(col("qj").cast("decimal(38,0)") * col("qj")).as("sjj"))
      .select(col("k"),
        (col("n").cast("decimal(38,0)") * col("sij")
          - col("si").cast("decimal(38,0)") * col("sj")).as("cij"),
        (col("n").cast("decimal(38,0)") * col("sii")
          - col("si").cast("decimal(38,0)") * col("si")).as("cii"),
        (col("n").cast("decimal(38,0)") * col("sjj")
          - col("sj").cast("decimal(38,0)") * col("sj")).as("cjj"))
    // stepwise so each arithmetic step is ONE short expression the
    // oracle mirrors verbatim (tau -> t -> c -> s); float contract:
    // only /, *, +, - and sqrt, all IEEE-correctly-rounded
    pairStats
      .withColumn("tau",
        expr("(CAST(cjj AS DOUBLE) - CAST(cii AS DOUBLE)) / (2.0D * CAST(cij AS DOUBLE))"))
      .withColumn("t", expr(
        """CASE WHEN CAST(cij AS DOUBLE) = 0.0D THEN 0.0D
          |     WHEN tau >= 0.0D THEN 1.0D / (tau + sqrt(1.0D + tau * tau))
          |     ELSE -1.0D / (-tau + sqrt(1.0D + tau * tau)) END""".stripMargin))
      .withColumn("c", expr("1.0D / sqrt(1.0D + t * t)"))
      .withColumn("s", expr("t * c"))
      .select(col("k"), col("c"), col("s"))
  }

  /** Givens-rotated corpus (vec_id, vd, n2, qv): the allocated
    * vectors through the 32 trained 2×2 blocks. The (c, s) table
    * rides IN-PLAN as two broadcast 32-arrays — no driver literal
    * round-trip, the doubles are the engine's own end to end. */
  private[graft] def embGivens(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "emb_givens") {
      graft.functions.GraftFunctions.registerAll(spark)
      val cs = givensCs(spark, dir).groupBy()
        .agg(expr("transform(sort_array(collect_list(struct(k, c))), p -> p.c)")
            .as("carr"),
          expr("transform(sort_array(collect_list(struct(k, s))), p -> p.s)")
            .as("sarr"))
      embAllocated(spark, dir).select(col("vec_id"), col("vd"))
        .crossJoin(broadcast(cs))
        .withColumn("vd", expr(
          """transform(sequence(1, 64), i -> CASE
            | WHEN i % 2 = 1 THEN
            |   element_at(carr, CAST((i + 1) DIV 2 AS INT)) * element_at(vd, i)
            |   - element_at(sarr, CAST((i + 1) DIV 2 AS INT)) * element_at(vd, i + 1)
            | ELSE
            |   element_at(carr, CAST(i DIV 2 AS INT)) * element_at(vd, i)
            |   + element_at(sarr, CAST(i DIV 2 AS INT)) * element_at(vd, i - 1)
            | END)""".stripMargin))
        .withColumn("n2", expr(VectorExprs.n2Expr))
        .withColumn("qv",
          expr("transform(vd, x -> cast(round(x * 1000000) as bigint))"))
        .select(col("vec_id"), col("vd"), col("n2"), col("qv"))
    }

  private def givensTrainedCents(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "givens_trained_cents") {
      import graft.operators.vector.VectorOps.PqK
      val r = embGivens(spark, dir)
      val seed = r.filter(col("vec_id") < PqK)
        .select(col("vec_id").as("mid"), col("vd").as("cvd"))
      trainedCentsOf(seedCodesOf(r.select(col("vec_id"), col("vd")), seed),
        r.select(col("vec_id"), col("qv")))
    }

  private[graft] def givensAssigned(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "givens_codes") {
      trainedCodesOf(embGivens(spark, dir).select(col("vec_id"), col("vd")),
        givensTrainedCents(spark, dir))
    }

  def givensKnn(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    val lut = trainedLutOf(
      embGivens(spark, dir).filter(col("vec_id") < 10)
        .select(col("vec_id"), col("vd"), col("n2")),
      givensTrainedCents(spark, dir))
    adcRanked(givensAssigned(spark, dir).select(col("vec_id"), col("pq_code"))
      .crossJoin(broadcast(lut))
      .filter(col("qid") =!= col("vec_id")))
  }

  def s52GivensRecall(spark: SparkSession, dir: String): DataFrame =
    recallOf(s1KnnBrute(spark, dir), givensKnn(spark, dir))

  /** DuckDB CTEs for the Givens layer over `eba` — defines `gcs`
    * (k, c, s) and the rotated corpus `ebg`. */
  private def ebgCtes: String =
    """gps AS (
      |  SELECT k,
      |    CAST(count(*) AS HUGEINT) * sum(CAST(qi AS HUGEINT) * qj)
      |      - sum(CAST(qi AS HUGEINT)) * sum(CAST(qj AS HUGEINT)) AS cij,
      |    CAST(count(*) AS HUGEINT) * sum(CAST(qi AS HUGEINT) * qi)
      |      - sum(CAST(qi AS HUGEINT)) * sum(CAST(qi AS HUGEINT)) AS cii,
      |    CAST(count(*) AS HUGEINT) * sum(CAST(qj AS HUGEINT) * qj)
      |      - sum(CAST(qj AS HUGEINT)) * sum(CAST(qj AS HUGEINT)) AS cjj
      |  FROM (SELECT g.k AS k, e.qv[2*g.k - 1] AS qi, e.qv[2*g.k] AS qj
      |        FROM eba e, generate_series(1, 32) g(k))
      |  GROUP BY k),
      |gtau AS (SELECT k, CAST(cij AS DOUBLE) AS dij,
      |    (CAST(cjj AS DOUBLE) - CAST(cii AS DOUBLE))
      |      / (2.0 * CAST(cij AS DOUBLE)) AS tau
      |  FROM gps),
      |gt AS (SELECT k,
      |    CASE WHEN dij = 0.0 THEN 0.0
      |         WHEN tau >= 0.0 THEN 1.0 / (tau + sqrt(1.0 + tau * tau))
      |         ELSE -1.0 / (-tau + sqrt(1.0 + tau * tau)) END AS t
      |  FROM gtau),
      |gcs AS (SELECT k, c, t * c AS s
      |  FROM (SELECT k, t, 1.0 / sqrt(1.0 + t * t) AS c FROM gt)),
      |gcarr AS (SELECT list(c ORDER BY k) AS carr, list(s ORDER BY k) AS sarr
      |  FROM gcs),
      |ebg AS MATERIALIZED (
      |  SELECT vec_id, vd,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), [ x*x for x in vd ]),
      |                (a, b) -> a + b) AS n2,
      |    [CAST(round(x * 1000000) AS BIGINT) for x in vd] AS qv
      |  FROM (SELECT e.vec_id,
      |      [ CASE WHEN i % 2 = 1 THEN
      |            a.carr[(i + 1) // 2] * e.vd[i] - a.sarr[(i + 1) // 2] * e.vd[i + 1]
      |          ELSE
      |            a.carr[i // 2] * e.vd[i] + a.sarr[i // 2] * e.vd[i - 1]
      |        END for i in generate_series(1, 64) ] AS vd
      |    FROM eba e CROSS JOIN gcarr a))""".stripMargin

  lazy val s52Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |${exactPairsCte("xpairs")},
       |${topkCte("xr", "xpairs")},
       |exact AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= $K),
       |${VectorExprs.ebaCtes},
       |$ebgCtes,
       |${opqCtesFrom("rgpairs", "ebg")},
       |${topkCte("gr", "rgpairs")},
       |approx AS (SELECT query_id, neighbor_id FROM gr WHERE rank <= $K)
       |$recallTailSql""".stripMargin

  /** Trained-codebook CTEs (qv micro-units → seed-assignment means →
    * re-encode) chained after embCtes + pqPickCtes — shared by s14Sql
    * and s15Sql. `tcent`/`rpick` MATERIALIZED: both are joined per
    * query downstream. */
  private def pqTrainedCtes: String = pqTrainedCtesFrom(withQv = true)

  /** `withQv = false` when composed after [[codebookCtes]], which
    * already defines the identical `qv` micro-unit CTE (DuckDB
    * rejects duplicate CTE names). */
  private def pqTrainedCtesFrom(withQv: Boolean): String = {
    import graft.operators.vector.VectorOps.PqD
    val qvCte = if (withQv)
      s"""qv AS (SELECT vec_id, vd, n2,
         |  [CAST(round(x * 1000000) AS BIGINT) for x in vd] AS qv FROM eb),
         |""".stripMargin
    else ""
    s"""${qvCte}tmem AS (
       |  SELECT p.m, p.code, g.d, q.qv[p.m * $PqD + g.d] AS val
       |  FROM pick p JOIN qv q ON q.vec_id = p.vec_id,
       |       generate_series(1, $PqD) g(d)),
       |tsum AS (SELECT m, code, d, sum(val) AS s, count(*) AS n
       |  FROM tmem GROUP BY m, code, d),
       |tcent AS MATERIALIZED (SELECT m, code,
       |  list(CAST(s AS DOUBLE) / (n * 1000000.0) ORDER BY d) AS sub
       |  FROM tsum GROUP BY m, code),
       |rsc AS (
       |  SELECT e.vec_id, t.m, t.code,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      [ (e.vd[t.m * $PqD + d] - t.sub[d]) * (e.vd[t.m * $PqD + d] - t.sub[d])
       |        for d in generate_series(1, $PqD) ]), (a, x) -> a + x) AS dist
       |  FROM eb e CROSS JOIN tcent t),
       |rpick AS MATERIALIZED (
       |  SELECT vec_id, m, code, dist FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
       |      ORDER BY dist, code) AS rn FROM rsc) x WHERE rn = 1)""".stripMargin
  }

  lazy val s14Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |${graft.operators.vector.VectorOps.pqPickCtes},
       |$pqTrainedCtes
       |SELECT vec_id,
       |  CAST(sum(code * (1 << (4 * CAST(m AS INTEGER)))) AS BIGINT) AS pq_code,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(dist ORDER BY m)),
       |              (a, x) -> a + x) AS recon_err
       |FROM rpick GROUP BY vec_id ORDER BY vec_id""".stripMargin

  /** Trained-ADC pair CTEs (tqlut over tcent + scored pairs from
    * rpick) — shared by s15Sql, s25Sql and s26Sql. `probed = true`
    * adds s12's IVF restriction (the corpus vector's coarse cluster
    * must be one the query probed). */
  private def pqTrainedAdcCtes(pairsName: String,
      probed: Boolean = false): String = {
    import graft.operators.vector.VectorOps.PqD
    def mFold(v: String) =
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list($v ORDER BY p.m)),
         |    (a, x) -> a + x)""".stripMargin
    val probeJoin = if (probed)
      s"""
         |  JOIN passign pa ON pa.cvec = p.vec_id
         |  JOIN qpr ON qpr.qcluster = pa.cluster AND qpr.qid = l.qid""".stripMargin
    else ""
    s"""tqlut AS (
       |  SELECT q.vec_id AS qid, q.n2 AS qn2, t.m, t.code,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      [ q.vd[t.m * $PqD + d] * t.sub[d] for d in generate_series(1, $PqD) ]),
       |      (a, x) -> a + x) AS subdot,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      [ t.sub[d] * t.sub[d] for d in generate_series(1, $PqD) ]),
       |      (a, x) -> a + x) AS subn2
       |  FROM eb q CROSS JOIN tcent t WHERE q.vec_id < 10),
       |$pairsName AS (
       |  SELECT l.qid AS query_id, p.vec_id AS neighbor_id,
       |    ${mFold("l.subdot")}
       |      / (sqrt(l.qn2) * sqrt(${mFold("l.subn2")})) AS cosine
       |  FROM rpick p JOIN tqlut l ON l.m = p.m AND l.code = p.code$probeJoin
       |  WHERE l.qid != p.vec_id
       |  GROUP BY l.qid, p.vec_id, l.qn2)""".stripMargin
  }

  lazy val s15Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |${exactPairsCte("xpairs")},
       |${topkCte("xr", "xpairs")},
       |exact AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= $K),
       |${graft.operators.vector.VectorOps.pqPickCtes},
       |$pqTrainedCtes,
       |${pqTrainedAdcCtes("apairs")},
       |${topkCte("ar", "apairs")},
       |approx AS (SELECT query_id, neighbor_id FROM ar WHERE rank <= $K)
       |$recallTailSql""".stripMargin

  // ---- s25: trained IVF-PQ — both quantizers trained, composed ----
  // The full production index (FAISS IVFPQ after training): s12
  // composed the trained COARSE quantizer with v4's seeded PQ cells;
  // this replaces the fine half with s14's Lloyd-trained codebooks —
  // the index a deployment actually ships (both artifacts persisted,
  // cf. d9's band index / s18's codebook). Index row = (vec_id,
  // cluster, trained pq_code), same ~16 B/vector; plan identical to
  // s12 (broadcast probes ⋈ trained LUTs against the cached index
  // scan, codegen'd lookup fold, bounded top-k) — training changes
  // the cells, never the plan. s26 prices the composition.
  /** The trained-both-ways index: coarse cluster + trained PQ code —
    * DfCache'd like [[ivfPqIndex]]. */
  def trainedIvfPqIndex(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "ivfpq_trained_index") {
      assignTo(embQuantized(spark, dir), ivfCodebook(spark, dir))
        .join(pqTrainedAssigned(spark, dir), Seq("vec_id"))
        .select(col("vec_id"), col("cluster"), col("pq_code"))
    }

  /** nprobe-parameterized body — probing every cluster collapses the
    * coarse restriction, leaving exactly the trained full-corpus ADC
    * scan ([[pqTrainedKnn]]); the spec pins that law like s12's. */
  def s25TrainedIvfPqWith(spark: SparkSession, dir: String,
      nprobe: Int): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    val qp = ivfQueryProbes(spark, dir, nprobe).select(col("qid"), col("qcluster"))
      .join(pqTrainedQueryLut(spark, dir), Seq("qid"))
    adcRanked(trainedIvfPqIndex(spark, dir).join(broadcast(qp),
      col("qcluster") === col("cluster") && col("qid") =!= col("vec_id")))
  }

  def s25TrainedIvfPq(spark: SparkSession, dir: String): DataFrame =
    s25TrainedIvfPqWith(spark, dir, NPROBE)

  lazy val s25Sql: String =
    s"""WITH $codebookCtes,
       |${graft.operators.vector.VectorOps.pqPickCtes},
       |${pqTrainedCtesFrom(withQv = false)},
       |$ivfCoarseCtes,
       |${pqTrainedAdcCtes("pairs", probed = true)},
       |${topkCte("r", "pairs")}
       |SELECT query_id, neighbor_id, cosine, rank FROM r
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ---- s26: recall of the fully-trained composed index ----
  // Eighth row of the ANN quality board: what the deployment-shape
  // index (trained coarse + trained fine) recovers of the exact
  // top-K — read next to s13 (seeded-PQ IVF-PQ) for what fine-half
  // training buys INSIDE the composition, and next to s15 for what
  // the coarse restriction costs/saves around the trained ADC.
  def s26TrainedIvfPqRecall(spark: SparkSession, dir: String): DataFrame =
    recallOf(s1KnnBrute(spark, dir), s25TrainedIvfPq(spark, dir))

  lazy val s26Sql: String =
    s"""WITH $codebookCtes,
       |${exactPairsCte("xpairs")},
       |${topkCte("xr", "xpairs")},
       |exact AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= $K),
       |${graft.operators.vector.VectorOps.pqPickCtes},
       |${pqTrainedCtesFrom(withQv = false)},
       |$ivfCoarseCtes,
       |${pqTrainedAdcCtes("apairs", probed = true)},
       |${topkCte("ar", "apairs")},
       |approx AS (SELECT query_id, neighbor_id FROM ar WHERE rank <= $K)
       |$recallTailSql""".stripMargin

  // ---- s20: compressed-domain brute-force kNN over sign codes ----
  // The search half of v5's 1-bit quantization, and the binary-code
  // counterpart of s10's ADC: the corpus side is ONLY the 8-byte
  // packed sign codes (at 1B vectors an 8 GB scan instead of 256 GB
  // of float32 — binary codes exist precisely so brute force stays
  // affordable), scored by two codegen'd bit_count(xor) ops per
  // candidate. Similarity = (64 - 2·hamming)/64, the sign-LSH cosine
  // proxy — a dyadic rational, so the double compares exactly on both
  // engines. Broadcast query codes × linear code scan → the bounded
  // top-k aggregate: no corpus shuffle, no window, s1's plan shape at
  // 1/32 the bytes. Ties (65 distinct sim values) break on
  // neighbor_id in both the aggregate and the oracle's row_number.
  def s20HammingKnn(spark: SparkSession, dir: String): DataFrame =
    hammingKnnOf(graft.operators.vector.VectorOps.signCodes(spark, dir))

  /** The hamming brute-force scan over any (vec_id, sign_lo, sign_hi)
    * code table — shared by s20 (v5's zero-threshold codes) and s29
    * (v6's median-trained codes): the code family changes, the plan
    * doesn't. */
  def hammingKnnOf(codes: DataFrame): DataFrame = {
    val pairs = broadcast(codes.filter(col("vec_id") < 10).as("q"))
      .join(codes.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("hamming", expr("bit_count(q.sign_lo ^ c.sign_lo)" +
        " + bit_count(q.sign_hi ^ c.sign_hi)"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        ((lit(64) - lit(2) * col("hamming")).cast("double") / lit(64.0))
          .as("cosine"))
    ranked(pairs).withColumnRenamed("cosine", "sim")
  }

  private def hammingPairsCtes(pairsName: String): String =
    s"""$pairsName AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    CAST(64 - 2*(bit_count(xor(q.sign_lo, c.sign_lo))
       |               + bit_count(xor(q.sign_hi, c.sign_hi))) AS DOUBLE)
       |      / 64 AS cosine
       |  FROM sc q, sc c WHERE q.vec_id < 10 AND q.vec_id != c.vec_id)"""
      .stripMargin

  lazy val s20Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |${graft.operators.vector.VectorOps.signCte},
       |${hammingPairsCtes("hp")},
       |${topkCte("r", "hp")}
       |SELECT query_id, neighbor_id, cosine AS sim, rank FROM r
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ---- s21: recall of the hamming scan vs exact cosine ----
  // Sixth row of the ANN quality board (s8 LSH, s9 IVF, s11 PQ, s13
  // IVF-PQ, s15 trained-PQ, s21 binary): prices v5's 32× compression
  // in recall against s1's exact top-K, same K·|queries|-bounded
  // recallOf join as every other row.
  def s21HammingRecall(spark: SparkSession, dir: String): DataFrame =
    recallOf(s1KnnBrute(spark, dir), s20HammingKnn(spark, dir))

  lazy val s21Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |${exactPairsCte("xpairs")},
       |${topkCte("xr", "xpairs")},
       |exact AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= $K),
       |${graft.operators.vector.VectorOps.signCte},
       |${hammingPairsCtes("hp")},
       |${topkCte("ar", "hp")},
       |approx AS (SELECT query_id, neighbor_id FROM ar WHERE rank <= $K)
       |$recallTailSql""".stripMargin

  // ---- s29: recall of the TRAINED binary codes ----
  // Ninth row of the ANN quality board: v6's median-balanced bits vs
  // s1's exact top-K, next to s21 (v5's zero-threshold bits) — the
  // pair reads as "what does threshold training buy at the same 32×
  // compression", exactly as s15-vs-s11 reads for PQ. Same plan as
  // s21 to the node (hammingKnnOf is shared); only the code CTE
  // differs in the oracle.
  def s29TrainedSignRecall(spark: SparkSession, dir: String): DataFrame =
    recallOf(s1KnnBrute(spark, dir),
      hammingKnnOf(graft.operators.vector.VectorOps.trainedSignCodes(spark, dir)))

  lazy val s29Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |${exactPairsCte("xpairs")},
       |${topkCte("xr", "xpairs")},
       |exact AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= $K),
       |${graft.operators.vector.VectorOps.trainedSignCte},
       |${hammingPairsCtes("hp")},
       |${topkCte("ar", "hp")},
       |approx AS (SELECT query_id, neighbor_id FROM ar WHERE rank <= $K)
       |$recallTailSql""".stripMargin

  // ---- s22: truncated-dimension exact kNN (Matryoshka prefilter) ----
  // Dimension truncation is the THIRD compression axis next to PQ
  // (s10) and binary codes (s20): score by only the first `TruncDims`
  // of 64 dimensions — a 4× cheaper scan reading a 4× narrower column
  // (with MRL-trained embeddings the prefix is trained to carry the
  // signal; here it prices what an untrained prefix gives up). Same
  // plan as s1: broadcast queries × corpus scan, the 16-term fold in
  // the scan's codegen stage, bounded top-k — no corpus shuffle.
  // Truncated norms are per-row expressions (no stored nt column), so
  // the operator works on any vector table as-is.
  private val TruncDims = 16

  /** (vec_id, label, vt, nt): the truncated view of [[VectorExprs
    * .embFeatures]] — prefix slice + its squared norm, one codegen'd
    * projection over the cached features. */
  private def truncFeatures(spark: SparkSession, dir: String): DataFrame =
    VectorExprs.embFeatures(spark, dir)
      .withColumn("vt", expr(s"slice(vd, 1, $TruncDims)"))
      .withColumn("nt", expr("graft_dot(vt, vt)"))
      .select(col("vec_id"), col("label"), col("vt"), col("nt"))

  /** Truncated-cosine scored pairs for queries vec_id < 10 —
    * stage 1 of s23 and the whole of s22. */
  private def truncPairs(spark: SparkSession, dir: String): DataFrame = {
    val t = truncFeatures(spark, dir)
    broadcast(t.filter(col("vec_id") < 10).as("q"))
      .join(t.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("dot", expr(VectorExprs.dotExpr("q.vt", "c.vt")))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        (col("dot") / (sqrt(col("q.nt")) * sqrt(col("c.nt")))).as("cosine"))
  }

  def s22TruncatedKnn(spark: SparkSession, dir: String): DataFrame =
    ranked(truncPairs(spark, dir))

  /** DuckDB truncated-dot fold (sequential over the first
    * [[TruncDims]] dims — same order as graft_dot over the slice). */
  private def duckDotTrunc(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    [ $a[d] * $b[d] for d in generate_series(1, $TruncDims) ]), (a, b) -> a + b)""".stripMargin

  private def truncPairsCte(name: String): String =
    s"""$name AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${duckDotTrunc("q.vd", "c.vd")}
       |      / (sqrt(${duckDotTrunc("q.vd", "q.vd")})
       |         * sqrt(${duckDotTrunc("c.vd", "c.vd")})) AS cosine
       |  FROM ef q, ef c
       |  WHERE q.vec_id < 10 AND q.vec_id != c.vec_id)""".stripMargin

  lazy val s22Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |${truncPairsCte("tpairs")},
       |${topkCte("r", "tpairs")}
       |SELECT query_id, neighbor_id, cosine, rank FROM r
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ---- s23: two-stage retrieval — truncated prefilter + exact rerank ----
  // THE production retrieval shape (every deployed ANN system is
  // candidates-then-rerank): stage 1 scores the corpus by the cheap
  // truncated cosine and keeps `RerankC` candidates per query through
  // the bounded mergeable top-25 aggregate (O(C) state, map-side
  // combined — never a corpus-sized window sort); stage 2 touches full
  // 64-dim vectors ONLY for the ≤ C·|queries| survivors (a broadcast
  // candidate list joined into the corpus scan — the corpus never
  // shuffles) and reranks by exact cosine. At 1B vectors stage 1 reads
  // the 4× narrower prefix, stage 2 reads ~250 full vectors. The
  // collapse law (candidates = all pairs ⇒ ≡ s1 bit-exact) is
  // spec-pinned via [[rerankOf]]; s24 measures what the prefilter
  // loses end-to-end.
  private val RerankC = 25

  /** Stage 2: exact-cosine rerank of a (query_id, neighbor_id)
    * candidate list — broadcast candidates into the corpus scan,
    * then the bounded top-K aggregate. */
  def rerankOf(spark: SparkSession, dir: String, cand: DataFrame): DataFrame = {
    val e = VectorExprs.embFeatures(spark, dir)
      .select(col("vec_id"), col("vd"), col("n2"))
    val pairs = e.as("c")
      .join(broadcast(cand.select(col("query_id"), col("neighbor_id"))),
        col("c.vec_id") === col("neighbor_id"))
      .join(broadcast(e.filter(col("vec_id") < 10).as("q")),
        col("query_id") === col("q.vec_id"))
      .withColumn("dot", expr(VectorExprs.dotExpr("q.vd", "c.vd")))
      .select(col("query_id"), col("neighbor_id"),
        (col("dot") / (sqrt(col("q.n2")) * sqrt(col("c.n2")))).as("cosine"))
    ranked(pairs)
  }

  def s23Rerank(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    val cand = truncPairs(spark, dir)
      .groupBy(col("query_id"))
      .agg(expr("graft_top_neighbors25(cosine, neighbor_id)").as("top"))
      .select(col("query_id"), explode(col("top")).as("p"))
      .select(col("query_id"), col("p.neighbor_id").as("neighbor_id"))
    rerankOf(spark, dir, cand)
  }

  private def rerankCtes(approxTopk: String): String =
    s"""${truncPairsCte("tpairs")},
       |${topkCte("tr", "tpairs")},
       |cand AS (SELECT query_id, neighbor_id FROM tr WHERE rank <= $RerankC),
       |rpairs AS (
       |  SELECT d.query_id, d.neighbor_id,
       |    ${VectorExprs.duckDot("q.vd", "c.vd")}
       |      / (sqrt(q.n2) * sqrt(c.n2)) AS cosine
       |  FROM cand d JOIN eb q ON d.query_id = q.vec_id
       |              JOIN eb c ON d.neighbor_id = c.vec_id),
       |${topkCte(approxTopk, "rpairs")}""".stripMargin

  lazy val s23Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |${rerankCtes("r")}
       |SELECT query_id, neighbor_id, cosine, rank FROM r
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ---- s48: diversity cost of MMR vs plain top-k ----
  // Every index family on the board pairs with its quality gauge
  // (s2→s8, s10→s11, …); s47's is the DIVERSITY COST: per query, how
  // many of the plain exact top-K survive MMR's reranking. Low
  // overlap = the neighborhood was redundant and MMR traded relevance
  // for coverage; overlap = K means the top-K was already diverse and
  // MMR was a no-op. Both sides are K-row-per-query frames (the s47
  // pool machinery and the s1 exact top-K), so this is a broadcast-
  // sized join — the gauge costs nothing beyond what s47/s1 already
  // built (shared DfCache stages).
  def s48MmrOverlap(spark: SparkSession, dir: String): DataFrame = {
    val mmr = s47Mmr(spark, dir).select(col("query_id"), col("neighbor_id"))
    val exact = s1KnnBrute(spark, dir).select(col("query_id"), col("neighbor_id"))
    val kept = mmr.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_kept"))
    mmr.groupBy(col("query_id")).agg(count(lit(1)).as("k"))
      .join(kept, Seq("query_id"), "left_outer")
      .na.fill(0L, Seq("n_kept"))
      .select(col("query_id"), col("n_kept"),
        expr("n_kept * 1000000 div k").as("overlap_ppm"))
      .orderBy(col("query_id"))
  }

  lazy val s48Sql: String =
    s"""WITH m AS ($s47Sql),
       |e AS ($s1Sql),
       |kept AS (
       |  SELECT m.query_id, count(*) AS n_kept
       |  FROM m JOIN e ON m.query_id = e.query_id
       |    AND m.neighbor_id = e.neighbor_id
       |  GROUP BY 1),
       |kk AS (SELECT query_id, count(*) AS k FROM m GROUP BY 1)
       |SELECT kk.query_id, COALESCE(kept.n_kept, 0) AS n_kept,
       |  COALESCE(kept.n_kept, 0) * 1000000 // kk.k AS overlap_ppm
       |FROM kk LEFT JOIN kept ON kk.query_id = kept.query_id
       |ORDER BY kk.query_id""".stripMargin

  // ---- s47: MMR diversified top-k (maximal marginal relevance) ----
  // Carbonell & Goldstein 1998: greedily pick the candidate
  // maximizing relevance(q,c) − max over already-selected s of
  // sim(c,s) (λ = 1/2, the subtraction form) — the retrieval
  // operator that stops a result page from being five near-copies
  // of one document, and the selection step of every dedup-aware
  // RAG pipeline. Two-phase scale shape (the s23 posture): the
  // corpus-sized work is ONE exact-cosine pass kept to a top-
  // `MmrPool` pool per query by the bounded mergeable aggregate
  // (never a corpus window sort); the greedy runs K Spark rounds
  // over the ≤ pool·|queries| survivors — pool vectors and the
  // pool×pool sim table localCheckpoint once, each round is a
  // broadcast-sized anti-join + argmax window over ≤ pool rows per
  // query. Greedy is inherently sequential in K; K is small by
  // definition of the operator. Ties break (score DESC, cid ASC) on
  // both engines; the scores subtract IDENTICAL doubles (shared
  // fold order), so the argmax — and the gate — is exact.
  private val MmrPool = 25

  def s47Mmr(spark: SparkSession, dir: String): DataFrame = graft.util.Loops.quiet(spark) {
    // AQE-quiet scope (optimization r14): the greedy runs K
    // checkpoint-materialized rounds over ≤ MmrPool·|queries| rows —
    // fixed tiny shapes whose per-round AQE re-planning is pure
    // driver latency; every join side here is bounded by construction
    // at any corpus scale, so no round ever needs a runtime skew
    // split. The checkpoint jobs run inside this scope (the one-job
    // rounds the r13 loop work established).
    graft.functions.GraftFunctions.registerAll(spark)
    val e = VectorExprs.embFeatures(spark, dir)
      .select(col("vec_id"), col("vd"), col("n2"))
    val pairs = broadcast(e.filter(col("vec_id") < 10).as("q"))
      .join(e.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("dot", expr(VectorExprs.dotExpr("q.vd", "c.vd")))
      .select(col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"), cosine.as("cosine"))
    val pool = pairs.groupBy(col("query_id"))
      .agg(expr(s"graft_top_neighbors$MmrPool(cosine, neighbor_id)").as("top"))
      .select(col("query_id"), explode(col("top")).as("p"))
      .select(col("query_id"), col("p.neighbor_id").as("cid"),
        col("p.cosine").as("rel"))
      .localCheckpoint(true)
    val pv = pool.join(e.select(col("vec_id").as("cid"),
      col("vd").as("cvd"), col("n2").as("cn2")), Seq("cid"))
    val sims = pv.as("a").join(pv.as("b"),
        col("a.query_id") === col("b.query_id") && col("a.cid") =!= col("b.cid"))
      .select(col("a.query_id").as("query_id"), col("a.cid").as("cid"),
        col("b.cid").as("other"),
        (expr(VectorExprs.dotExpr("a.cvd", "b.cvd"))
          / (sqrt(col("a.cn2")) * sqrt(col("b.cn2")))).as("sim"))
      .localCheckpoint(true)
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("cid"))
    var sel = pool.withColumn("rn", row_number().over(w1))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("cid"), col("rel"), lit(1).as("rank"))
      .localCheckpoint(true)
    for (r <- 2 to K) {
      val ms = sims.join(sel.select(col("query_id"), col("cid").as("other")),
          Seq("query_id", "other"))
        .groupBy(col("query_id"), col("cid")).agg(max(col("sim")).as("ms"))
      val wr = Window.partitionBy(col("query_id"))
        .orderBy((col("rel") - col("ms")).desc, col("cid"))
      val pick = pool.join(sel.select(col("query_id"), col("cid")),
          Seq("query_id", "cid"), "left_anti")
        .join(ms, Seq("query_id", "cid"))
        .withColumn("rn", row_number().over(wr))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("cid"), col("rel"), lit(r).as("rank"))
      sel = sel.unionByName(pick).localCheckpoint(true)
    }
    sel.select(col("query_id"), col("rank"),
        col("cid").as("neighbor_id"), col("rel").as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }   // Loops.quiet

  lazy val s47Sql: String = {
    def round(r: Int): String =
      s"""pick$r AS (
         |  SELECT query_id, cid, rel, $r AS rank FROM (
         |    SELECT c.query_id, c.cid, c.rel,
         |      row_number() OVER (PARTITION BY c.query_id
         |        ORDER BY c.rel - m.ms DESC, c.cid) AS rn
         |    FROM pool c
         |    LEFT JOIN sel${r - 1} s ON c.query_id = s.query_id AND c.cid = s.cid
         |    JOIN (SELECT si.query_id, si.cid, max(si.sim) AS ms
         |          FROM sims si JOIN sel${r - 1} s2
         |            ON si.query_id = s2.query_id AND si.other = s2.cid
         |          GROUP BY 1, 2) m
         |      ON c.query_id = m.query_id AND c.cid = m.cid
         |    WHERE s.cid IS NULL) x WHERE rn = 1),
         |sel$r AS (SELECT * FROM sel${r - 1} UNION ALL SELECT * FROM pick$r)""".stripMargin
    s"""WITH ${VectorExprs.embCtes},
       |${exactPairsCte("pairs")},
       |${topkCte("pr", "pairs")},
       |pool AS MATERIALIZED (SELECT query_id, neighbor_id AS cid, cosine AS rel
       |  FROM pr WHERE rank <= $MmrPool),
       |sims AS MATERIALIZED (
       |  SELECT a.query_id, a.cid, b.cid AS other,
       |    ${VectorExprs.duckDot("ea.vd", "eb2.vd")}
       |      / (sqrt(ea.n2) * sqrt(eb2.n2)) AS sim
       |  FROM pool a JOIN pool b
       |    ON a.query_id = b.query_id AND a.cid != b.cid
       |  JOIN eb ea ON a.cid = ea.vec_id
       |  JOIN eb eb2 ON b.cid = eb2.vec_id),
       |sel1 AS (SELECT query_id, cid, rel, 1 AS rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY rel DESC, cid) AS rn FROM pool) z WHERE rn = 1),
       |${(2 to K).map(round).mkString(",\n")}
       |SELECT query_id, rank, cid AS neighbor_id, rel AS cosine
       |FROM sel$K ORDER BY query_id, rank""".stripMargin
  }

  // ---- s24: recall of the two-stage pipeline vs exact ----
  // Seventh row of the ANN quality board: what the 16-dim prefilter
  // loses END-TO-END (rerank can only surface what stage 1 kept, so
  // this is exactly the prefilter's top-C recall of the exact top-K).
  // The C knob trades stage-2 reads for recall — priced here, costed
  // in the bench.
  def s24RerankRecall(spark: SparkSession, dir: String): DataFrame =
    recallOf(s1KnnBrute(spark, dir), s23Rerank(spark, dir))

  lazy val s24Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |${exactPairsCte("xpairs")},
       |${topkCte("xr", "xpairs")},
       |exact AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= $K),
       |${rerankCtes("ar")},
       |approx AS (SELECT query_id, neighbor_id FROM ar WHERE rank <= $K)
       |$recallTailSql""".stripMargin

  // ---- s27: kNN classification (majority vote over exact neighbors) ----
  // The evaluation loop every embedding pipeline runs on its vectors:
  // predict each query's label by the majority label of its K exact
  // nearest neighbors and compare to the query's own label — the kNN
  // classifier / label-noise audit (a label whose own neighborhood
  // outvotes it is a candidate mislabel). Rides s1's exact machinery
  // (broadcast queries × corpus scan, bounded top-K aggregate), then
  // two bounded steps over the K·|queries| neighbor rows: one count
  // per (query, label) and one min-struct argmax — majority with ties
  // to the SMALLER label (g17's deterministic-LPA convention), so the
  // vote is engine-exact with no arbitrary tie. Nothing beyond the
  // K·|queries| rows ever shuffles; the verdict is one broadcast join
  // back to the query labels.
  def s27KnnClassify(spark: SparkSession, dir: String): DataFrame = {
    val e = VectorExprs.embFeatures(spark, dir)
    knnClassifyOf(s1KnnBrute(spark, dir), e.select(col("vec_id"), col("label")))
  }

  /** The vote + verdict over any (query_id, neighbor_id) neighbor
    * table and (vec_id, label) label table — factored so the spec can
    * pin the majority rule and the ties-to-smaller-label convention on
    * hand-built neighborhoods. */
  def knnClassifyOf(neighbors: DataFrame, labels: DataFrame): DataFrame = {
    val votes = neighbors
      .join(labels.withColumnRenamed("vec_id", "neighbor_id"), Seq("neighbor_id"))
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
    val pred = votes.groupBy(col("query_id"))
      .agg(min(struct((-col("n_votes")).as("neg"), col("label")))
        .as("best"))
      .select(col("query_id"), col("best.label").as("pred_label"),
        (-col("best.neg")).as("n_votes"))
    pred.join(labels.withColumnRenamed("vec_id", "query_id"), Seq("query_id"))
      .select(col("query_id"), col("label").as("true_label"),
        col("pred_label"), col("n_votes"),
        (col("pred_label") === col("label")).as("correct"))
      .orderBy(col("query_id"))
  }

  lazy val s27Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |${exactPairsCte("pairs")},
       |${topkCte("r", "pairs")},
       |votes AS (
       |  SELECT r.query_id, c.label, count(*) AS n_votes
       |  FROM r JOIN eb c ON r.neighbor_id = c.vec_id
       |  WHERE r.rank <= $K GROUP BY 1, 2),
       |pred AS (
       |  SELECT query_id, label AS pred_label, n_votes,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY n_votes DESC, label) AS vr
       |  FROM votes)
       |SELECT p.query_id, q.label AS true_label, p.pred_label,
       |  p.n_votes, p.pred_label = q.label AS correct
       |FROM pred p JOIN eb q ON p.query_id = q.vec_id
       |WHERE p.vr = 1 ORDER BY p.query_id""".stripMargin

  // ---- s28: nearest-centroid classification (Rocchio) ----
  // The classifier that pairs with s27's kNN vote: predict each
  // query's label by the most-similar LABEL CENTROID — one prototype
  // per class, the shape that serves classification at 100 TB because
  // inference touches |labels| prototypes instead of K neighbors from
  // a corpus scan. Key identity: cosine to the MEAN equals cosine to
  // the SUM (the 1/n scaling cancels in the angle), so no centroid
  // division ever happens — the per-label dim sums from ONE
  // map-side-combined aggregate over the exploded micro-unit vectors
  // (s5's Lloyd-update relational shape, |labels|·64 cells) ARE the
  // prototypes. Every dot/norm accumulates in DECIMAL(38,0) (qd·s
  // reaches ~1e21 at billion-row labels — past BIGINT, inside 38
  // digits; DuckDB runs HUGEINT), and the cosine is ONE fixed-shape
  // double expression over exact integers — bit-identical on both
  // engines (oracle casts via the VARCHAR hop, the round-5 lesson).
  // Train/query split: corpus vec_id ≥ 10 trains, s1's 10 query
  // vectors classify; ties to the smaller label like s27.
  def s28CentroidClassify(spark: SparkSession, dir: String): DataFrame = {
    val e = VectorExprs.embFeatures(spark, dir)
      .select(col("vec_id"), col("label"),
        expr("transform(vd, x -> cast(round(x * 1000000) as bigint))").as("qv"))
    centroidClassifyOf(e.filter(col("vec_id") < 10), e.filter(col("vec_id") >= 10))
  }

  /** The Rocchio verdict over any (vec_id, label, qv: array<bigint>)
    * query/train frames — factored so the spec can pin the
    * cosine-to-sum ≡ cosine-to-mean identity and the tie rule on hand
    * prototypes. */
  def centroidClassifyOf(queries: DataFrame, train: DataFrame): DataFrame = {
    val dims = train
      .select(col("label"), posexplode(col("qv")).as(Seq("d", "v")))
    val sums = dims.groupBy(col("label"), col("d"))
      .agg(sum(expr("cast(v as decimal(38,0))")).as("s"))
    val norms = sums.groupBy(col("label"))
      .agg(sum(col("s") * col("s")).as("ss2"))
    val qdims = queries
      .select(col("vec_id").as("query_id"), col("label").as("true_label"),
        posexplode(col("qv")).as(Seq("d", "qd")))
    val qnorm = qdims.groupBy(col("query_id"))
      .agg(sum(expr("cast(qd as decimal(38,0)) * cast(qd as decimal(38,0))"))
        .as("qs2"))
    val dots = qdims
      .join(broadcast(sums.withColumnRenamed("label", "clabel")), Seq("d"))
      .groupBy(col("query_id"), col("true_label"), col("clabel"))
      .agg(sum(expr("cast(qd as decimal(38,0)) * s")).as("dot"))
    dots.join(qnorm, Seq("query_id"))
      .join(broadcast(norms.withColumnRenamed("label", "clabel")), Seq("clabel"))
      .withColumn("cos", col("dot").cast("double") /
        (sqrt(col("qs2").cast("double")) * sqrt(col("ss2").cast("double"))))
      .groupBy(col("query_id"), col("true_label"))
      .agg(min(struct((-col("cos")).as("ns"), col("clabel").as("lbl"))).as("pick"))
      .select(col("query_id"), col("true_label"),
        col("pick.lbl").as("pred_label"),
        (col("pick.lbl") === col("true_label")).as("correct"))
      .orderBy(col("query_id"))
  }

  lazy val s28Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |qvv AS (SELECT vec_id, label,
       |  [CAST(round(x * 1000000) AS BIGINT) for x in vd] AS qv FROM eb),
       |dims AS (
       |  SELECT label, d, CAST(qv[d] AS HUGEINT) AS v
       |  FROM qvv, generate_series(1, 64) g(d) WHERE vec_id >= 10),
       |sums AS (SELECT label, d, sum(v) AS s FROM dims GROUP BY 1, 2),
       |norms AS (SELECT label, sum(s * s) AS ss2 FROM sums GROUP BY 1),
       |qd AS (
       |  SELECT vec_id AS query_id, label AS true_label, d,
       |    CAST(qv[d] AS HUGEINT) AS q
       |  FROM qvv, generate_series(1, 64) g(d) WHERE vec_id < 10),
       |qn AS (SELECT query_id, sum(q * q) AS qs2 FROM qd GROUP BY 1),
       |dots AS (
       |  SELECT qd.query_id, qd.true_label, s.label AS clabel,
       |    sum(q * s.s) AS dot
       |  FROM qd JOIN sums s ON qd.d = s.d GROUP BY 1, 2, 3),
       |sc AS (
       |  SELECT d.query_id, d.true_label, d.clabel,
       |    CAST(CAST(d.dot AS VARCHAR) AS DOUBLE)
       |      / (sqrt(CAST(CAST(qn.qs2 AS VARCHAR) AS DOUBLE))
       |         * sqrt(CAST(CAST(n.ss2 AS VARCHAR) AS DOUBLE))) AS cos
       |  FROM dots d JOIN qn USING (query_id)
       |  JOIN norms n ON n.label = d.clabel),
       |p AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |  ORDER BY cos DESC, clabel) AS rn FROM sc)
       |SELECT query_id, true_label, clabel AS pred_label,
       |  clabel = true_label AS correct
       |FROM p WHERE rn = 1 ORDER BY query_id""".stripMargin

  // ---- s30: IVF inverted-list balance (index health gauge) ----
  // The operational gauge next to the recall board: an IVF index's
  // query cost is nprobe × (probed list sizes), so a SKEWED codebook
  // — one giant list, many empty ones — silently turns "probe 2 of
  // 16" into "scan half the corpus". The balance report reads the
  // DfCache'd trained assignment (shared with s5/s17/d11 — no new
  // assignment pass), one map-side-combined count per cluster, one
  // 16-row summary: min/p50/max list size and max-vs-ideal imbalance
  // in integer centi-units (100·max·k div N — >100 means skew). The
  // k/seed sweep tunes against THIS number and s9's recall together.
  def s30IvfBalance(spark: SparkSession, dir: String): DataFrame = {
    val sizes = trainedAssignment(spark, dir)
      .groupBy(col("cluster")).agg(count(lit(1)).as("sz"))
    sizes.agg(count(lit(1)).as("n_clusters"),
        sum(col("sz")).as("n_vectors"),
        min(col("sz")).cast("long").as("min_size"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY sz)")
          .cast("long").as("p50_size"),
        max(col("sz")).cast("long").as("max_size"))
      .select(col("n_clusters"), col("n_vectors"), col("min_size"),
        col("p50_size"), col("max_size"),
        expr("100 * max_size * n_clusters div n_vectors")
          .as("imbalance_x100"))
  }

  lazy val s30Sql: String =
    s"""WITH $assignCtes,
       |sz AS (SELECT cluster, count(*) AS sz FROM a2 GROUP BY 1),
       |s AS (
       |  SELECT count(*) AS n_clusters, CAST(sum(sz) AS BIGINT) AS n_vectors,
       |    CAST(min(sz) AS BIGINT) AS min_size,
       |    CAST(quantile_disc(sz, 0.5) AS BIGINT) AS p50_size,
       |    CAST(max(sz) AS BIGINT) AS max_size
       |  FROM sz)
       |SELECT n_clusters, n_vectors, min_size, p50_size, max_size,
       |  100 * max_size * n_clusters // n_vectors AS imbalance_x100
       |FROM s""".stripMargin

  // ---- s31: asymmetric kNN over v8's scalar-quantized codes ----
  // The search half of the SQ8 index (the v4→s10 lesson applied to
  // v8): the corpus side is ONLY the 64-byte code rows — queries keep
  // their exact micro-unit vectors, candidates are reconstructed from
  // codes in-row (the asymmetric-distance trick: quantization error
  // hits one side, not both). Every sum is integer (dots ≤ ~1e15,
  // inside BIGINT), the final cosine is one division of exactly-agreed
  // integers, so the gate is exact like s1. Plan shape is s1's:
  // broadcast query codes × one corpus scan, bounded top-k aggregate,
  // nothing shuffles but K·P pre-trimmed rows.
  def s31SqKnn(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.vector.VectorOps
    val recon = VectorOps.sqCodes(spark, dir)
      .withColumn("rv", expr(VectorOps.sqReconExpr))
      .withColumn("rn2",
        expr("aggregate(rv, cast(0 as bigint), (a, x) -> a + x * x)"))
      .select(col("vec_id"), col("rv"), col("rn2"))
    val q = VectorOps.sqCodes(spark, dir)
      .filter(col("vec_id") < 10)
      .withColumn("qn2",
        expr("aggregate(qv, cast(0 as bigint), (a, x) -> a + x * x)"))
      .select(col("vec_id"), col("qv"), col("qn2"))
    val pairs = broadcast(q.as("q"))
      .join(recon.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("dot", expr(
        """aggregate(sequence(1, 64), cast(0 as bigint),
          |  (a, d) -> a + element_at(q.qv, d) * element_at(c.rv, d))"""
          .stripMargin))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        (col("dot").cast("double")
          / (sqrt(col("q.qn2").cast("double")) * sqrt(col("c.rn2").cast("double"))))
          .as("cosine"))
    ranked(pairs)
  }

  // Oracle: v8's shared sq CTEs + the reconstruction + the same
  // integer dot, chained into the standard top-K rank.
  private val sqPairsCtes: String =
    s"""${graft.operators.vector.VectorOps.sqCtes},
       |rc AS (
       |  SELECT vec_id,
       |    [mnv[d] + (CAST(codes[d] AS BIGINT) * (mxv[d] - mnv[d])) // 255
       |     for d in generate_series(1, 64)] AS rv
       |  FROM sq),
       |rn AS (SELECT vec_id, rv,
       |         CAST(list_sum([x * x for x in rv]) AS BIGINT) AS rn2 FROM rc),
       |qn AS (SELECT vec_id, qv,
       |         CAST(list_sum([x * x for x in qv]) AS BIGINT) AS qn2
       |       FROM qm WHERE vec_id < 10),
       |apairs AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    CAST(CAST(list_sum([q.qv[d] * c.rv[d]
       |        for d in generate_series(1, 64)]) AS BIGINT) AS DOUBLE)
       |      / (sqrt(CAST(q.qn2 AS DOUBLE)) * sqrt(CAST(c.rn2 AS DOUBLE)))
       |      AS cosine
       |  FROM qn q, rn c WHERE q.vec_id != c.vec_id)""".stripMargin

  lazy val s31Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |$sqPairsCtes,
       |${topkCte("r", "apairs")}
       |SELECT query_id, neighbor_id, cosine, rank FROM r
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ---- s32: SQ8 recall row (tenth line of the ANN quality board) ----
  // How much neighbor fidelity does 4x compression cost? Near-1.0
  // expected (SQ8 is the gentlest quantizer on the board — 255 levels
  // per dim vs v5/v6's 1 bit), which is exactly what makes it the
  // default storage format worth measuring against.
  def s32SqRecall(spark: SparkSession, dir: String): DataFrame =
    recallOf(s1KnnBrute(spark, dir), s31SqKnn(spark, dir))

  lazy val s32Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |${exactPairsCte("xpairs")},
       |${topkCte("xr", "xpairs")},
       |exact AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= $K),
       |$sqPairsCtes,
       |${topkCte("ar", "apairs")},
       |approx AS (SELECT query_id, neighbor_id FROM ar WHERE rank <= $K)
       |$recallTailSql""".stripMargin

  // ---- s33: mutual-kNN graph over the LSH index ----
  // The symmetric kNN graph a semantic-dedup / clustering stage
  // consumes: an edge (a, b) exists iff b is in a's top-K AND a is in
  // b's top-K — mutuality prunes hub vectors that appear in everyone's
  // list without reciprocating (the classic kNN-graph noise). Full
  // corpus, not a fixed query set: candidates come from the capped
  // band self-join (the d2 shape — pair volume bounded by
  // cap²·buckets), per-vector lists from the bounded mergeable top-K
  // aggregate (O(K) state, map-side combined, no window sort), and
  // the mutuality check is a self-join of the K·N list table on the
  // reversed pair key — co-partitioned, linear in list size.
  /** Rescore a (qid, cid) candidate set against the corpus features
    * and keep each query's bounded top-K — the tail every kNN-graph
    * builder shares (s33's band candidates, s37's expanded ones). */
  private def rescoreTopK(spark: SparkSession, dir: String,
      cand: DataFrame, broadcastCand: Boolean = false): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    val e = VectorExprs.embFeatures(spark, dir)
      .select(col("vec_id"), col("vd"), col("n2"))
    // `broadcastCand` (optimization r14, guide §3.1): callers whose
    // candidate set is BOUNDED BY CONSTRUCTION (s45's beam — ≤
    // |queries|·(K+K²) rows at any corpus scale) broadcast it, and the
    // query-features intermediate after it, into the two corpus
    // joins — the corpus is scanned, never shuffled, and the static
    // planner needs no AQE round to see it. Corpus-sized callers
    // (lshKnnLists, nnDescentRound) keep the shuffle joins.
    def bc(df: DataFrame): DataFrame = if (broadcastCand) broadcast(df) else df
    val pairs = bc(bc(cand)
      .join(e.as("q"), col("qid") === col("q.vec_id")))
      .join(e.as("c"), col("cid") === col("c.vec_id"))
      .withColumn("dot", expr(VectorExprs.dotExpr("q.vd", "c.vd")))
      .select(col("qid").as("query_id"), col("cid").as("neighbor_id"),
        cosine.as("cosine"))
    pairs.groupBy(col("query_id"))
      .agg(expr("graft_top_neighbors5(cosine, neighbor_id)").as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("query_id"), col("p.neighbor_id").as("neighbor_id"),
        col("p.cosine").as("cosine"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** The whole-corpus per-vector top-K lists from the capped LSH
    * bands — DfCache'd: s33 consumes them for mutuality, s37 as the
    * NN-descent seed, s38 as the recall baseline. */
  private[operators] def lshKnnLists(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "lsh_knn_lists") {
      val capped = VectorExprs.cappedBands(spark, dir)
      val cand = capped.as("x").join(capped.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
            && col("x.vec_id") =!= col("y.vec_id"))
        .select(col("x.vec_id").as("qid"), col("y.vec_id").as("cid"))
        .distinct()
      rescoreTopK(spark, dir, cand)
    }

  def s33MutualKnn(spark: SparkSession, dir: String): DataFrame = {
    val lists = lshKnnLists(spark, dir)
    lists.as("f").join(lists.as("g"),
        col("f.query_id") === col("g.neighbor_id")
          && col("f.neighbor_id") === col("g.query_id")
          && col("f.query_id") < col("f.neighbor_id"))
      .select(col("f.query_id").as("vec_a"), col("f.neighbor_id").as("vec_b"),
        col("f.cosine").as("cosine"),
        col("f.rank").as("rank_ab"), col("g.rank").as("rank_ba"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** CTE chain ending at `mk` — the whole-corpus LSH top-K lists,
    * the SQL twin of [[lshKnnLists]]. Shared by s33/s37/s38. */
  private def knnListsCtes: String =
    s"""${VectorExprs.bandCtes},
       |mc AS (
       |  SELECT DISTINCT x.vec_id AS qid, y.vec_id AS cid
       |  FROM capped x JOIN capped y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.vec_id != y.vec_id),
       |mp AS (
       |  SELECT d.qid AS query_id, d.cid AS neighbor_id,
       |    ${VectorExprs.duckDot("q.vd", "c.vd")}
       |      / (sqrt(q.n2) * sqrt(c.n2)) AS cosine
       |  FROM mc d JOIN eb q ON d.qid = q.vec_id JOIN eb c ON d.cid = c.vec_id),
       |${topkCte("mr", "mp")},
       |mk AS MATERIALIZED (SELECT * FROM mr WHERE rank <= $K)""".stripMargin

  lazy val s33Sql: String =
    s"""WITH $knnListsCtes
       |SELECT f.query_id AS vec_a, f.neighbor_id AS vec_b,
       |  f.cosine AS cosine, f.rank AS rank_ab, g.rank AS rank_ba
       |FROM mk f JOIN mk g
       |  ON f.query_id = g.neighbor_id AND f.neighbor_id = g.query_id
       |  AND f.query_id < f.neighbor_id
       |ORDER BY vec_a, vec_b""".stripMargin

  // ---- s37: one NN-descent round over the LSH kNN lists ----
  // Dong et al. 2011's observation, as a relational pass: a neighbor
  // of my neighbor is probably my neighbor. The LSH lists (s33's
  // seed) miss true neighbors that share no band; ONE descent round
  // expands each vector's candidates to its neighbors' neighbors and
  // its REVERSE neighbors, rescores exactly, and re-trims to top-K —
  // strictly-no-worse lists (the seed candidates are retained) for
  // K²·N extra candidate rows, all equi-joins on vec ids, no new
  // index. This is how production kNN graphs converge (a few rounds
  // from any cheap seed); the round is idempotent machinery — chain
  // it for round 2+. s38 measures what the round actually bought.
  /** One NN-descent round: expand `lists` (query_id, neighbor_id
    * top-K rows) to forward ∪ reverse ∪ forward∘forward candidates,
    * rescore exactly, re-trim to top-K. The idempotent machinery —
    * s37 gates one round, s42 chains it to the measured plateau. */
  private def nnDescentRound(spark: SparkSession, dir: String,
      lists0: DataFrame): DataFrame = {
    val lists = lists0.select(col("query_id"), col("neighbor_id"))
    val fwd = lists.select(col("query_id").as("qid"), col("neighbor_id").as("cid"))
    val rev = lists.select(col("neighbor_id").as("qid"), col("query_id").as("cid"))
    val non = lists.as("f").join(lists.as("g"),
        col("f.neighbor_id") === col("g.query_id"))
      .select(col("f.query_id").as("qid"), col("g.neighbor_id").as("cid"))
    val cand = fwd.union(rev).union(non)
      .filter(col("qid") =!= col("cid")).distinct()
    rescoreTopK(spark, dir, cand)
  }

  /** Round-1 descended lists, DfCache'd — s37 gates them and s42's
    * chain starts from them (one K²·N expansion serves both). */
  private def nndRound1(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "nnd_round1") {
      nnDescentRound(spark, dir, lshKnnLists(spark, dir))
    }

  def s37NnDescent(spark: SparkSession, dir: String): DataFrame =
    nndRound1(spark, dir).orderBy(col("query_id"), col("rank"))

  lazy val s37Sql: String =
    s"""WITH $knnListsCtes,
       |nc AS (
       |  SELECT DISTINCT qid, cid FROM (
       |    SELECT query_id AS qid, neighbor_id AS cid FROM mk
       |    UNION ALL SELECT neighbor_id, query_id FROM mk
       |    UNION ALL SELECT f.query_id, g.neighbor_id
       |    FROM mk f JOIN mk g ON f.neighbor_id = g.query_id)
       |  WHERE qid != cid),
       |np AS (
       |  SELECT d.qid AS query_id, d.cid AS neighbor_id,
       |    ${VectorExprs.duckDot("q.vd", "c.vd")}
       |      / (sqrt(q.n2) * sqrt(c.n2)) AS cosine
       |  FROM nc d JOIN eb q ON d.qid = q.vec_id JOIN eb c ON d.cid = c.vec_id),
       |${topkCte("nr", "np")}
       |SELECT query_id, neighbor_id, cosine, rank FROM nr
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ---- s38: what the descent round bought (recall, side by side) ----
  // The s8 evaluator pointed at the kNN-GRAPH build: per probe query,
  // recall of the seed LSH lists and of the descended lists against
  // the exact top-K — the measured justification for spending the
  // K²·N expansion (and the convergence signal that says when to stop
  // chaining rounds). Exact side is s1's probe set; both approx sides
  // are K·|queries| rows filtered from already-built lists.
  def s38NndRecall(spark: SparkSession, dir: String): DataFrame = {
    val ex = s1KnnBrute(spark, dir)
    val seed = recallOf(ex, lshKnnLists(spark, dir).filter(col("query_id") < 10))
      .select(col("query_id"), col("n_exact"),
        col("n_hit").as("hit_seed"), col("recall").as("recall_seed"))
    val desc = recallOf(ex, s37NnDescent(spark, dir).filter(col("query_id") < 10))
      .select(col("query_id"), col("n_hit").as("hit_nnd"),
        col("recall").as("recall_nnd"))
    seed.join(desc, Seq("query_id")).orderBy(col("query_id"))
  }

  lazy val s38Sql: String =
    s"""WITH $knnListsCtes,
       |nc AS (
       |  SELECT DISTINCT qid, cid FROM (
       |    SELECT query_id AS qid, neighbor_id AS cid FROM mk
       |    UNION ALL SELECT neighbor_id, query_id FROM mk
       |    UNION ALL SELECT f.query_id, g.neighbor_id
       |    FROM mk f JOIN mk g ON f.neighbor_id = g.query_id)
       |  WHERE qid != cid),
       |np AS (
       |  SELECT d.qid AS query_id, d.cid AS neighbor_id,
       |    ${VectorExprs.duckDot("q.vd", "c.vd")}
       |      / (sqrt(q.n2) * sqrt(c.n2)) AS cosine
       |  FROM nc d JOIN eb q ON d.qid = q.vec_id JOIN eb c ON d.cid = c.vec_id),
       |${topkCte("nr", "np")},
       |${exactPairsCte("xp")},
       |${topkCte("xr", "xp")},
       |exact AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= $K),
       |sd AS (SELECT DISTINCT query_id, neighbor_id FROM mk WHERE query_id < 10),
       |nd AS (SELECT DISTINCT query_id, neighbor_id FROM nr
       |       WHERE rank <= $K AND query_id < 10)
       |SELECT e.query_id, count(*) AS n_exact,
       |  CAST(coalesce(sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 END), 0)
       |    AS BIGINT) AS hit_seed,
       |  CAST(coalesce(sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 END), 0)
       |    AS DOUBLE) / count(*) AS recall_seed,
       |  CAST(coalesce(sum(CASE WHEN n.neighbor_id IS NOT NULL THEN 1 END), 0)
       |    AS BIGINT) AS hit_nnd,
       |  CAST(coalesce(sum(CASE WHEN n.neighbor_id IS NOT NULL THEN 1 END), 0)
       |    AS DOUBLE) / count(*) AS recall_nnd
       |FROM exact e
       |LEFT JOIN sd s ON e.query_id = s.query_id AND e.neighbor_id = s.neighbor_id
       |LEFT JOIN nd n ON e.query_id = n.query_id AND e.neighbor_id = n.neighbor_id
       |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin

  // ---- s43: centroid shift of the Lloyd round (convergence gauge) ----
  // s5/s18 run Lloyd updates, s17 scores the FIT (SSE) — this is the
  // MOVEMENT gauge a k-means loop actually stops on: per cluster,
  // how far did the centroid travel in the round (Lloyd's Δcentroid,
  // the classic ‖c1−c0‖ < ε criterion). Exact form: with c0 in micro
  // units and c1 = s/n implicitly, n²·10¹²·‖c1−c0‖² =
  // Σ_d (s_d − n·c0_d)² — every term an integer, accumulated
  // DECIMAL(38,0), emitted DOUBLE via the q1 convention (the s17
  // lesson: never gate a raw decimal128). Plan: one assignment pass
  // (broadcast 16 centroids), one (cluster, d) power-sum aggregate —
  // the Lloyd-update shape itself, nothing extra shuffles. A shift
  // table that has stopped moving (all ~0 rows) IS the converged
  // codebook certificate s18's warm-start assumes.
  def s43CentroidShift(spark: SparkSession, dir: String): DataFrame = {
    val qv = embQuantized(spark, dir)
    val c0 = qv.filter(col("vec_id") < 16)
      .select(col("vec_id").as("mid"),
        expr("transform(qv, x -> cast(x as double) / 1000000.0)").as("cm"))
    val s1 = qv.join(assignTo(qv, c0), Seq("vec_id"))
      .select(col("cluster"), posexplode(col("qv")).as(Seq("d", "val")))
      .groupBy(col("cluster"), col("d"))
      .agg(sum(col("val")).as("s"), count(lit(1)).as("n"))
    val seeds = qv.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cluster"), col("qv").as("q0"))
    s1.join(seeds, Seq("cluster"))
      .withColumn("diff",
        (col("s") - col("n") * expr("element_at(q0, cast(d + 1 as int))"))
          .cast("decimal(38,0)"))
      .groupBy(col("cluster"))
      .agg(max(col("n")).as("n_members"),
        sum(col("diff") * col("diff")).cast("decimal(38,0)")
          .cast("double").as("shift_scaled"))
      .select(col("cluster").as("cluster_id"), col("n_members"),
        col("shift_scaled"))
      .orderBy(col("cluster_id"))
  }

  lazy val s43Sql: String =
    s"""WITH $codebookCtes,
       |shift AS (
       |  SELECT s1.cluster,
       |    max(s1.n) AS n_members,
       |    sum(CAST(s1.s - s1.n * q.qv[s1.d] AS HUGEINT)
       |        * CAST(s1.s - s1.n * q.qv[s1.d] AS HUGEINT)) AS sh
       |  FROM s1 JOIN qv q ON q.vec_id = s1.cluster
       |  GROUP BY s1.cluster)
       |SELECT cluster AS cluster_id, CAST(n_members AS BIGINT) AS n_members,
       |  CAST(CAST(sh AS VARCHAR) AS DOUBLE) AS shift_scaled
       |FROM shift ORDER BY cluster_id""".stripMargin

  // ---- s42: NN-descent chained to convergence (the recall curve) ----
  // Dong et al. 2011 run descent rounds until Δrecall < ε; s37 gates
  // one round of that machinery, this gates the CHAIN with its
  // convergence readout: per round r (0 = the LSH seed lists), the
  // probe set's total recall against the exact top-K. The curve IS
  // the stop rule — rounds are strictly-no-worse (each round retains
  // its seed candidates), and the round where the row stops moving is
  // where further K²·N expansions buy nothing. Each round's lists are
  // localCheckpointed (the g33 eager-loop convention, documented on
  // the queries map) so round r+1 and recall row r read a
  // materialized table instead of re-running the whole chain — plan
  // growth is linear in rounds, never exponential. At 100 TB the
  // chain keeps s37's posture per round: equi-joins on vec ids only,
  // candidates bounded by K²·N, exact rescoring against the
  // once-cached feature table. Measured at sf0.01: probe recall
  // 0.32 (seed) → 0.40 → 0.46, then FLAT for rounds 3–4 — the
  // descent's local optimum (probes whose true neighbors share no
  // graph path with the seed lists stay unreachable; Dong et al.'s
  // documented limitation, priced here instead of hidden).
  private[operators] val NndRounds = 4

  def s42NndCurve(spark: SparkSession, dir: String): DataFrame = {
    val ex = s1KnnBrute(spark, dir)
    def row(r: Int, lists: DataFrame): DataFrame =
      recallOf(ex, lists.filter(col("query_id") < 10))
        .agg(sum(col("n_exact")).as("n_exact"), sum(col("n_hit")).as("n_hit"))
        .select(lit(r).cast("int").as("round"), col("n_exact"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_exact")).as("recall"))
    var lists = lshKnnLists(spark, dir)
    var out = row(0, lists)
    for (r <- 1 to NndRounds) {
      lists =
        if (r == 1) nndRound1(spark, dir) // shared with s37's gate
        else nnDescentRound(spark, dir, lists).localCheckpoint(true)
      out = out.unionAll(row(r, lists))
    }
    out.orderBy(col("round"))
  }

  lazy val s42Sql: String = {
    def expand(src: String, nc: String, np: String, nr: String, mk: String) =
      s"""$nc AS (
         |  SELECT DISTINCT qid, cid FROM (
         |    SELECT query_id AS qid, neighbor_id AS cid FROM $src
         |    UNION ALL SELECT neighbor_id, query_id FROM $src
         |    UNION ALL SELECT f.query_id, g.neighbor_id
         |    FROM $src f JOIN $src g ON f.neighbor_id = g.query_id)
         |  WHERE qid != cid),
         |$np AS (
         |  SELECT d.qid AS query_id, d.cid AS neighbor_id,
         |    ${VectorExprs.duckDot("q.vd", "c.vd")}
         |      / (sqrt(q.n2) * sqrt(c.n2)) AS cosine
         |  FROM $nc d JOIN eb q ON d.qid = q.vec_id JOIN eb c ON d.cid = c.vec_id),
         |${topkCte(nr, np)},
         |$mk AS MATERIALIZED (SELECT * FROM $nr WHERE rank <= $K)"""
        .stripMargin
    val rounds = (1 to NndRounds).map(r =>
      expand(if (r == 1) "mk" else s"mk${r - 1}", s"nc$r", s"np$r", s"nr$r", s"mk$r"))
      .mkString(",\n")
    def recallRow(r: Int, src: String) =
      s"""SELECT CAST($r AS INTEGER) AS round, count(*) AS n_exact,
         |  CAST(coalesce(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_hit,
         |  CAST(coalesce(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 END), 0) AS DOUBLE)
         |    / count(*) AS recall
         |FROM exact e LEFT JOIN
         |  (SELECT DISTINCT query_id, neighbor_id FROM $src WHERE query_id < 10) a
         |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id"""
        .stripMargin
    val rows = (recallRow(0, "mk") +: (1 to NndRounds).map(r => recallRow(r, s"mk$r")))
      .mkString("\nUNION ALL ")
    s"""WITH $knnListsCtes,
       |$rounds,
       |${exactPairsCte("xp")},
       |${topkCte("xr", "xp")},
       |exact AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= $K)
       |$rows
       |ORDER BY round""".stripMargin
  }

  // ---- s45: graph-navigating ANN search (beam over the kNN graph) ----
  // The serving mode the kNN graph (s37/s42) exists for — HNSW/
  // NSG-style layer-0 navigation as bounded relational rounds: start
  // every query at a fixed deterministic entry set (the K smallest
  // corpus ids), then for three rounds expand the beam along the
  // DESCENDED graph's out-edges, rescore exactly, and re-trim to the
  // top-K beam (same bounded mergeable top-k aggregate — no window
  // sort). Per round per query the candidate set is ≤ K + K² rows, so
  // the search side stays broadcast-sized at ANY corpus scale; the
  // corpus is touched only by vec_id-keyed joins into the cached
  // feature layout — the whole point of graph ANN: query cost scales
  // with beam × degree × rounds, not with N. True beam search is
  // sequential per query; the batch form advances ALL queries one
  // round per Spark stage (rounds = synchronized hops), which is the
  // standard distributed-serving compromise. s46 prices the result
  // against the exact top-K and the graph's own direct lists.
  private val BeamRounds = 3

  def s45GraphKnn(spark: SparkSession, dir: String): DataFrame = {
    val ids = VectorExprs.embFeatures(spark, dir).select(col("vec_id"))
    val entries = ids.filter(col("vec_id") >= 10)
      .orderBy(col("vec_id")).limit(K)
    val qs = ids.filter(col("vec_id") < 10).select(col("vec_id").as("qid"))
    val g = nndRound1(spark, dir)
      .select(col("query_id").as("gq"), col("neighbor_id").as("gn"))
    // Optimization r14 (guide §3.3/§1.2): the beam is ≤ |queries|·K
    // rows per round — broadcast-sized by construction at ANY corpus
    // scale — but as one lazily nested plan the 4 rescore rounds
    // compounded into a deep tree the driver re-planned per AQE stage
    // (the board's most SERIAL slot: 8-core ran it 2.6× faster than
    // 32-core in r13). Each round now materializes its ≤K·|queries|
    // rows via an eager localCheckpoint inside an AQE-quiet scope,
    // with the candidate side explicitly broadcast into the corpus
    // joins (rescoreTopK broadcastCand) — per round: two cached-corpus
    // scans, zero corpus exchanges, one bounded-aggregate exchange,
    // and a constant-depth plan for the next round. Values identical:
    // checkpointing and broadcast hints change where rows live, not
    // what they are (oracle re-gated).
    graft.util.Loops.quiet(spark) {
      var beam = rescoreTopK(spark, dir,
        qs.crossJoin(broadcast(entries.select(col("vec_id").as("cid")))),
        broadcastCand = true).localCheckpoint(true)
      for (_ <- 1 to BeamRounds) {
        val fwd = beam.select(col("query_id").as("qid"), col("neighbor_id").as("cid"))
        // the beam side of the expansion join is the broadcast (≤
        // K·|queries| rows); the K·N-row graph lists are scanned from
        // cache, never shuffled — at any corpus scale
        val cand = fwd.union(
            broadcast(fwd).join(g, col("cid") === col("gq"))
              .select(col("qid"), col("gn").as("cid")))
          .filter(col("qid") =!= col("cid")).distinct()
        beam = rescoreTopK(spark, dir, cand, broadcastCand = true)
          .localCheckpoint(true)
      }
      beam.orderBy(col("query_id"), col("rank"))
    }
  }

  /** The descended-graph + unrolled-beam-round CTE chain shared by
    * s45Sql and the s46 recall oracle. Ends at `bm$BeamRounds`. */
  private def beamCtes: String = {
    def score(cand: String, out: String) =
      s"""$out AS (
         |  SELECT d.qid AS query_id, d.cid AS neighbor_id,
         |    ${VectorExprs.duckDot("q.vd", "c.vd")}
         |      / (sqrt(q.n2) * sqrt(c.n2)) AS cosine
         |  FROM $cand d JOIN eb q ON d.qid = q.vec_id
         |  JOIN eb c ON d.cid = c.vec_id)""".stripMargin
    val rounds = (1 to BeamRounds).map { r =>
      s"""cr$r AS (
         |  SELECT DISTINCT qid, cid FROM (
         |    SELECT query_id AS qid, neighbor_id AS cid FROM bm${r - 1}
         |    UNION ALL
         |    SELECT b.query_id, g.gn FROM bm${r - 1} b
         |    JOIN gg g ON b.neighbor_id = g.gq)
         |  WHERE qid != cid),
         |${score(s"cr$r", s"sc$r")},
         |${topkCte(s"tr$r", s"sc$r")},
         |bm$r AS MATERIALIZED (SELECT * FROM tr$r WHERE rank <= $K)"""
        .stripMargin
    }.mkString(",\n")
    s"""nc AS (
       |  SELECT DISTINCT qid, cid FROM (
       |    SELECT query_id AS qid, neighbor_id AS cid FROM mk
       |    UNION ALL SELECT neighbor_id, query_id FROM mk
       |    UNION ALL SELECT f.query_id, g.neighbor_id
       |    FROM mk f JOIN mk g ON f.neighbor_id = g.query_id)
       |  WHERE qid != cid),
       |${score("nc", "np")},
       |${topkCte("nr", "np")},
       |gg AS MATERIALIZED (SELECT query_id AS gq, neighbor_id AS gn
       |                    FROM nr WHERE rank <= $K),
       |ent AS (SELECT vec_id AS cid FROM eb WHERE vec_id >= 10
       |        ORDER BY vec_id LIMIT $K),
       |c0 AS (SELECT q.vec_id AS qid, e.cid FROM eb q, ent e
       |       WHERE q.vec_id < 10),
       |${score("c0", "sc0")},
       |${topkCte("tr0", "sc0")},
       |bm0 AS MATERIALIZED (SELECT * FROM tr0 WHERE rank <= $K),
       |$rounds""".stripMargin
  }

  lazy val s45Sql: String =
    s"""WITH $knnListsCtes,
       |$beamCtes
       |SELECT query_id, neighbor_id, cosine, rank FROM bm$BeamRounds
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ---- s46: what graph navigation kept (recall, side by side) ----
  // The honest gauge for s45: per probe query, beam-search recall vs
  // the exact top-K, NEXT TO the recall of the graph's own direct
  // lists for that query (the ceiling a 3-round navigation from a
  // cold entry point is trying to reach). Both approx sides are
  // K·|queries| rows filtered from already-built lists — the gauge
  // costs nothing beyond the s1 probe it shares with every other
  // recall row.
  def s46GraphRecall(spark: SparkSession, dir: String): DataFrame = {
    val ex = s1KnnBrute(spark, dir)
    val beam = recallOf(ex, s45GraphKnn(spark, dir))
      .select(col("query_id"), col("n_exact"),
        col("n_hit").as("hit_beam"), col("recall").as("recall_beam"))
    val direct = recallOf(ex, nndRound1(spark, dir).filter(col("query_id") < 10))
      .select(col("query_id"), col("n_hit").as("hit_list"),
        col("recall").as("recall_list"))
    beam.join(direct, Seq("query_id")).orderBy(col("query_id"))
  }

  lazy val s46Sql: String =
    s"""WITH $knnListsCtes,
       |$beamCtes,
       |${exactPairsCte("xp")},
       |${topkCte("xr", "xp")},
       |exact AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= $K),
       |bd AS (SELECT DISTINCT query_id, neighbor_id FROM bm$BeamRounds
       |       WHERE rank <= $K),
       |dl AS (SELECT DISTINCT gq AS query_id, gn AS neighbor_id FROM gg
       |       WHERE gq < 10)
       |SELECT e.query_id, count(*) AS n_exact,
       |  CAST(coalesce(sum(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 END), 0)
       |    AS BIGINT) AS hit_beam,
       |  CAST(coalesce(sum(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 END), 0)
       |    AS DOUBLE) / count(*) AS recall_beam,
       |  CAST(coalesce(sum(CASE WHEN d.neighbor_id IS NOT NULL THEN 1 END), 0)
       |    AS BIGINT) AS hit_list,
       |  CAST(coalesce(sum(CASE WHEN d.neighbor_id IS NOT NULL THEN 1 END), 0)
       |    AS DOUBLE) / count(*) AS recall_list
       |FROM exact e
       |LEFT JOIN bd b ON e.query_id = b.query_id AND e.neighbor_id = b.neighbor_id
       |LEFT JOIN dl d ON e.query_id = d.query_id AND e.neighbor_id = d.neighbor_id
       |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin

  // ---- s39: PQ symmetric-distance (SDC) search — codes vs codes ----
  // The search mode v12's table exists for: BOTH sides quantized, the
  // score assembled from 8 nibble-indexed lookups into the broadcast
  // inter-centroid table — approx_cos(q, c) =
  //   Σ_m T[m][q_m][c_m] / (sqrt(Σ_m T[m][q_m][q_m]) · sqrt(Σ_m T[m][c_m][c_m]))
  // — cosine of reconstruction against reconstruction. vs ADC (s10):
  // no per-query LUT build and no raw query vector needed (the shape
  // of code-only dedup sweeps and index-side kNN-graph builds), for
  // strictly more quantization noise — s40 prices that trade. Plan:
  // codes-only scan × broadcast (10 query codes + the ~16 KB map),
  // reconstructed norms precomputed per SIDE (not per pair), one
  // codegen'd fold per pair, bounded top-k. Nothing corpus-sized
  // shuffles; the corpus never re-reads raw vectors.
  private def sdcFold(a: String, b: String): String =
    s"""aggregate(sequence(0, ${graft.operators.vector.VectorOps.PqM - 1}),
       |  cast(0.0 as double), (acc, m) -> acc + element_at(sdc,
       |    cast(m*256 + (shiftright($a, cast(4*m as int)) & 15)*16
       |         + (shiftright($b, cast(4*m as int)) & 15) as int)))""".stripMargin

  /** One-row broadcast frame holding the FULL sdc lookup map keyed by
    * m·256 + ci·16 + cj. */
  private def sdcMap(spark: SparkSession, dir: String): DataFrame =
    graft.operators.vector.VectorOps.sdcEntries(spark, dir)
      .select(((col("m") * 256) + (col("ci") * 16) + col("cj")).cast("int").as("k"),
        col("dot"))
      .agg(expr("map_from_entries(collect_list(struct(k, dot)))").as("sdc"))

  // Probe set [SdcProbeLo, SdcProbeHi) sits OFF the codebook on
  // purpose: vec_ids < PqK ARE the centroids, quantize losslessly,
  // and make ADC ≡ SDC by construction — a degenerate comparison
  // (measured: identical hit sets when probing < 10). Non-codebook
  // probes carry real quantization error on the query side, which is
  // exactly the ADC-vs-SDC difference s40 exists to price.
  private[operators] val SdcProbeLo = 100L
  private[operators] val SdcProbeHi = 110L

  def s39SdcKnn(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    val codes = graft.operators.vector.VectorOps.pqAssigned(spark, dir)
      .select(col("vec_id"), col("pq_code"))
    val withN2 = codes.crossJoin(broadcast(sdcMap(spark, dir)))
      .withColumn("cn2r", expr(sdcFold("pq_code", "pq_code")))
    val q = withN2.filter(col("vec_id") >= SdcProbeLo && col("vec_id") < SdcProbeHi)
      .select(col("vec_id").as("qid"), col("pq_code").as("q_code"),
        col("cn2r").as("qn2r"))
    val pairs = withN2.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("sdot", expr(sdcFold("q_code", "pq_code")))
      .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
        (col("sdot") / (sqrt(col("qn2r")) * sqrt(col("cn2r")))).as("cosine"))
    ranked(pairs)
  }

  /** CTE chain: full sdc table `sdf`, per-vector reconstructed norms
    * `rn2`, SDC-scored pairs `$pairsName` — chains off embCtes +
    * pqPickCtes. Shared by s39Sql and s40Sql. */
  private def sdcPairsCtes(pairsName: String): String = {
    import graft.operators.vector.VectorOps.{PqM, PqD, PqK}
    def mFold(v: String, ord: String) =
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list($v ORDER BY $ord)),
         |    (a, x) -> a + x)""".stripMargin
    // `pqcents` comes from pqPickCtes, which every consumer chains first
    s"""sdf AS (
       |  SELECT g.m, a.mid AS ci, b.mid AS cj,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      [ a.cvd[g.m*$PqD + d] * b.cvd[g.m*$PqD + d]
       |        for d in generate_series(1, $PqD) ]), (x, y) -> x + y) AS dot
       |  FROM pqcents a CROSS JOIN pqcents b, generate_series(0, ${PqM - 1}) g(m)),
       |rn2 AS MATERIALIZED (
       |  SELECT p.vec_id, ${mFold("t.dot", "p.m")} AS n2r
       |  FROM pick p JOIN sdf t ON t.m = p.m AND t.ci = p.code AND t.cj = p.code
       |  GROUP BY p.vec_id),
       |$pairsName AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    ${mFold("t.dot", "a.m")} / (sqrt(qa.n2r) * sqrt(qb.n2r)) AS cosine
       |  FROM pick a JOIN pick b ON a.m = b.m AND a.vec_id != b.vec_id
       |  JOIN sdf t ON t.m = a.m AND t.ci = a.code AND t.cj = b.code
       |  JOIN rn2 qa ON qa.vec_id = a.vec_id
       |  JOIN rn2 qb ON qb.vec_id = b.vec_id
       |  WHERE a.vec_id >= $SdcProbeLo AND a.vec_id < $SdcProbeHi
       |  GROUP BY a.vec_id, b.vec_id, qa.n2r, qb.n2r)""".stripMargin
  }

  lazy val s39Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |${graft.operators.vector.VectorOps.pqPickCtes},
       |${sdcPairsCtes("spairs")},
       |${topkCte("sr", "spairs")}
       |SELECT query_id, neighbor_id, cosine, rank FROM sr
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ---- s40: ADC vs SDC, priced side by side ----
  // The Jégou trade as one gated row set: recall of the asymmetric
  // (raw query, s10) and symmetric (quantized query, s39) searches
  // against the exact top-K, per probe query. ADC ≥ SDC is the
  // textbook expectation (one side unquantized = strictly less
  // noise); this measures by how much, per query — what an index
  // designer reads before choosing code-only scoring.
  def s40SdcRecall(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.vector.VectorOps.pqAssigned
    graft.functions.GraftFunctions.registerAll(spark)
    // exact baseline over the SAME off-codebook probe set
    val e = VectorExprs.embFeatures(spark, dir)
      .select(col("vec_id"), col("vd"), col("n2"))
    val qe = e.filter(col("vec_id") >= SdcProbeLo && col("vec_id") < SdcProbeHi)
    val ex = ranked(broadcast(qe.as("q"))
      .join(e.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("dot", expr(VectorExprs.dotExpr("q.vd", "c.vd")))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        cosine.as("cosine")))
    val codes = pqAssigned(spark, dir).select(col("vec_id"), col("pq_code"))
    val adcLists = adcRanked(codes
      .crossJoin(broadcast(pqQueryLut(spark, dir, SdcProbeLo, SdcProbeHi)))
      .filter(col("qid") =!= col("vec_id")))
    val adc = recallOf(ex, adcLists)
      .select(col("query_id"), col("n_exact"),
        col("n_hit").as("hit_adc"), col("recall").as("recall_adc"))
    val sdc = recallOf(ex, s39SdcKnn(spark, dir))
      .select(col("query_id"), col("n_hit").as("hit_sdc"),
        col("recall").as("recall_sdc"))
    adc.join(sdc, Seq("query_id")).orderBy(col("query_id"))
  }

  lazy val s40Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |${exactPairsCte("xp", SdcProbeLo, SdcProbeHi)},
       |${topkCte("xr", "xp")},
       |exact AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= $K),
       |${graft.operators.vector.VectorOps.pqPickCtes},
       |${pqAdcPairsCtes("apairs", lo = SdcProbeLo, hi = SdcProbeHi)},
       |${topkCte("ar", "apairs")},
       |ad AS (SELECT DISTINCT query_id, neighbor_id FROM ar WHERE rank <= $K),
       |${sdcPairsCtes("spairs")},
       |${topkCte("sr", "spairs")},
       |sd AS (SELECT DISTINCT query_id, neighbor_id FROM sr WHERE rank <= $K)
       |SELECT e.query_id, count(*) AS n_exact,
       |  CAST(coalesce(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 END), 0)
       |    AS BIGINT) AS hit_adc,
       |  CAST(coalesce(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 END), 0)
       |    AS DOUBLE) / count(*) AS recall_adc,
       |  CAST(coalesce(sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 END), 0)
       |    AS BIGINT) AS hit_sdc,
       |  CAST(coalesce(sum(CASE WHEN s.neighbor_id IS NOT NULL THEN 1 END), 0)
       |    AS DOUBLE) / count(*) AS recall_sdc
       |FROM exact e
       |LEFT JOIN ad a ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
       |LEFT JOIN sd s ON e.query_id = s.query_id AND e.neighbor_id = s.neighbor_id
       |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin

  // ---- s41: ε-graph density sweep (choosing the radius) ----
  // d21 swept Jaccard thresholds for the dedup family; this is the
  // vector sibling: for a sweep of cosine radii τ, how many candidate
  // pairs and distinct vectors an ε-graph at that radius would
  // contain — the curve read before fixing d5/d11's τ or a range-
  // search radius (too low: one giant component; too high: isolated
  // points). Candidates come from the capped band self-join (scored
  // ONCE — the 6-row threshold frame cross-joins the scored pairs,
  // never rescoring), so the sweep costs one LSH pass + 6·|pairs|
  // filter work; |thresholds| rows out. The cosine·1e6 ≥ τ test
  // compares identical doubles on both engines.
  // Grid matched to the MEASURED candidate-cosine distribution at the
  // gate (median 0.035, p90 0.19, p99 0.32, max 0.51 — near-orthogonal
  // synthetic embeddings): a 0.5–0.95 grid would be 5/6 empty rows.
  // Zero-hit thresholds still emit (left join from the grid).
  private val CosSweepPpm = Seq(100000L, 150000L, 200000L, 250000L,
    300000L, 400000L)

  def s41DensitySweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val capped = VectorExprs.cappedBands(spark, dir)
    val cand = capped.as("x").join(capped.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
          && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("va"), col("y.vec_id").as("vb"))
      .distinct()
    val e = VectorExprs.embFeatures(spark, dir)
      .select(col("vec_id"), col("vd"), col("n2"))
    val scored = cand
      .join(e.as("q"), col("va") === col("q.vec_id"))
      .join(e.as("c"), col("vb") === col("c.vec_id"))
      .withColumn("dot", expr(VectorExprs.dotExpr("q.vd", "c.vd")))
      .select(col("va"), col("vb"), cosine.as("cosine"))
    val th = CosSweepPpm.toDF("theta_ppm")
    val hits = scored.crossJoin(broadcast(th))
      .filter(col("cosine") * 1000000.0 >= col("theta_ppm"))
    val np = hits.groupBy(col("theta_ppm")).agg(count(lit(1)).as("n_pairs"))
    val nv = hits.select(col("theta_ppm"), explode(array(col("va"), col("vb"))).as("v"))
      .distinct()
      .groupBy(col("theta_ppm")).agg(count(lit(1)).as("n_vecs"))
    th.join(np, Seq("theta_ppm"), "left_outer")
      .join(nv, Seq("theta_ppm"), "left_outer")
      .select(col("theta_ppm"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_vecs"), lit(0L)).as("n_vecs"))
      .orderBy(col("theta_ppm"))
  }

  lazy val s41Sql: String = {
    val vals = CosSweepPpm.mkString("(", "), (", ")")
    s"""WITH ${VectorExprs.bandCtes},
       |cd AS (
       |  SELECT DISTINCT x.vec_id AS va, y.vec_id AS vb
       |  FROM capped x JOIN capped y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.vec_id < y.vec_id),
       |sc AS (
       |  SELECT d.va, d.vb,
       |    ${VectorExprs.duckDot("q.vd", "c.vd")}
       |      / (sqrt(q.n2) * sqrt(c.n2)) AS cosine
       |  FROM cd d JOIN eb q ON d.va = q.vec_id JOIN eb c ON d.vb = c.vec_id),
       |th(theta_ppm) AS (VALUES $vals),
       |ht AS (SELECT th.theta_ppm, sc.va, sc.vb FROM sc CROSS JOIN th
       |       WHERE sc.cosine * 1000000 >= th.theta_ppm),
       |np AS (SELECT theta_ppm, count(*) AS n_pairs FROM ht GROUP BY 1),
       |nv AS (SELECT theta_ppm, count(*) AS n_vecs FROM (
       |  SELECT DISTINCT theta_ppm, v FROM (
       |    SELECT theta_ppm, unnest([va, vb]) AS v FROM ht)) GROUP BY 1)
       |SELECT CAST(th.theta_ppm AS BIGINT) AS theta_ppm,
       |  CAST(coalesce(np.n_pairs, 0) AS BIGINT) AS n_pairs,
       |  CAST(coalesce(nv.n_vecs, 0) AS BIGINT) AS n_vecs
       |FROM th LEFT JOIN np USING (theta_ppm) LEFT JOIN nv USING (theta_ppm)
       |ORDER BY theta_ppm""".stripMargin
  }

  // ---- s34: recall@k curve (the index tuning plot as a query) ----
  // s8 reports recall at one k; tuning reads the CURVE — recall@1..K
  // of the LSH index against exact top-K, aggregated across queries.
  // A flat curve says candidates are good but ranking is tight; a
  // rising one says the index misses true top-1s (raise bands /
  // nprobe). Both ranked lists are the K·|queries|-bounded outputs s1
  // and s2 already produce; the curve is a broadcast cross join with
  // the 5-row k table + two vocabulary-bounded rollups — cost is the
  // two indexes, the curve itself is free.
  def s34RecallCurve(spark: SparkSession, dir: String): DataFrame = {
    val er = s1KnnBrute(spark, dir)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("rank_e"))
    val ar = s2KnnLsh(spark, dir)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("rank_a"))
    val ks = spark.range(1, K + 1).select(col("id").as("k"))
    val nEx = er.crossJoin(broadcast(ks)).filter(col("rank_e") <= col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_exact"))
    val nHit = er.join(ar, Seq("query_id", "neighbor_id"))
      .crossJoin(broadcast(ks))
      .filter(col("rank_e") <= col("k") && col("rank_a") <= col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_hit"))
    nEx.join(nHit, Seq("k"), "left_outer")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("recall_ppm", expr("n_hit * 1000000 div n_exact"))
      .orderBy(col("k"))
  }

  lazy val s34Sql: String =
    s"""WITH ${VectorExprs.bandCtes},
       |${exactPairsCte("xpairs")},
       |${topkCte("xr", "xpairs")},
       |${lshPairsCtes("cand", "apairs")},
       |${topkCte("ar", "apairs")},
       |ks AS (SELECT CAST(unnest(generate_series(1, $K)) AS BIGINT) AS k),
       |ex AS (SELECT query_id, neighbor_id, rank FROM xr WHERE rank <= $K),
       |ap AS (SELECT query_id, neighbor_id, rank FROM ar WHERE rank <= $K),
       |ne AS (SELECT k, count(*) AS n_exact FROM ex, ks
       |       WHERE ex.rank <= k GROUP BY k),
       |nh AS (SELECT k, count(*) AS n_hit
       |       FROM ex JOIN ap USING (query_id, neighbor_id), ks
       |       WHERE ex.rank <= k AND ap.rank <= k GROUP BY k)
       |SELECT ne.k, ne.n_exact,
       |  CAST(coalesce(nh.n_hit, 0) AS BIGINT) AS n_hit,
       |  CAST(coalesce(nh.n_hit, 0) AS BIGINT) * 1000000 // ne.n_exact
       |    AS recall_ppm
       |FROM ne LEFT JOIN nh ON ne.k = nh.k ORDER BY ne.k""".stripMargin

  // ---- s35: asymmetric kNN over v9's residual codes (IVF+SQ decode) ----
  // The search half of the residual index, closing v9 the way s31
  // closed v8 and s10 closed v4: the corpus side is the code rows;
  // candidates decode IN-ROW to micro-units via q̂ = (sv + r̂) div n —
  // the cluster sum plus the dequantized scaled residual, floored
  // back to the query's unit system, so dots stay ≤ ~1e15 in BIGINT
  // at ANY cluster size (the n-scaled dot would overflow at sf10).
  // Truncate-toward-zero division agrees between engines on negative
  // coordinates (checked: Spark `div` ≡ DuckDB `//`). Plan is s1's:
  // broadcast exact-query vectors × one code scan, bounded top-k.
  private val residReconExpr: String =
    """transform(sequence(1, 64), d ->
      |  (element_at(sv, d) + element_at(rmnv, d)
      |   + (cast(element_at(codes, d) as bigint)
      |      * (element_at(rmxv, d) - element_at(rmnv, d))) div 255) div n)"""
      .stripMargin

  def s35ResidualKnn(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.vector.VectorOps
    val recon = VectorOps.residualCodes(spark, dir)
      .withColumn("rv", expr(residReconExpr))
      .withColumn("rn2",
        expr("aggregate(rv, cast(0 as bigint), (a, x) -> a + x * x)"))
      .select(col("vec_id"), col("rv"), col("rn2"))
    val q = embQuantized(spark, dir)
      .filter(col("vec_id") < 10)
      .withColumn("qn2",
        expr("aggregate(qv, cast(0 as bigint), (a, x) -> a + x * x)"))
      .select(col("vec_id"), col("qv"), col("qn2"))
    val pairs = broadcast(q.as("q"))
      .join(recon.as("c"), col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("dot", expr(
        """aggregate(sequence(1, 64), cast(0 as bigint),
          |  (a, d) -> a + element_at(q.qv, d) * element_at(c.rv, d))"""
          .stripMargin))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        (col("dot").cast("double")
          / (sqrt(col("q.qn2").cast("double")) * sqrt(col("c.rn2").cast("double"))))
          .as("cosine"))
    ranked(pairs)
  }

  private val residualPairsCtes: String =
    s"""${graft.operators.vector.VectorOps.residualCtes},
       |rdec AS (
       |  SELECT rc.vec_id,
       |    [ (sva.sv[d] + rc.rmnv[d]
       |       + (CAST(rc.codes[d] AS BIGINT) * (rc.rmxv[d] - rc.rmnv[d])) // 255)
       |      // nc.n
       |      for d in generate_series(1, 64)] AS rv
       |  FROM rc JOIN sva ON rc.cluster = sva.cluster
       |  JOIN nc ON rc.cluster = nc.cluster),
       |rrn AS (SELECT vec_id, rv,
       |          CAST(list_sum([x * x for x in rv]) AS BIGINT) AS rn2 FROM rdec),
       |rqn AS (SELECT vec_id, qv,
       |          CAST(list_sum([x * x for x in qv]) AS BIGINT) AS qn2
       |        FROM qv WHERE vec_id < 10),
       |apairs AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    CAST(CAST(list_sum([q.qv[d] * c.rv[d]
       |        for d in generate_series(1, 64)]) AS BIGINT) AS DOUBLE)
       |      / (sqrt(CAST(q.qn2 AS DOUBLE)) * sqrt(CAST(c.rn2 AS DOUBLE)))
       |      AS cosine
       |  FROM rqn q JOIN rrn c ON q.vec_id != c.vec_id)""".stripMargin

  lazy val s35Sql: String =
    s"""WITH $residualPairsCtes,
       |${topkCte("ar", "apairs")}
       |SELECT query_id, neighbor_id, cosine, rank FROM ar
       |WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ---- s36: recall of the residual index vs exact top-K ----
  def s36ResidualRecall(spark: SparkSession, dir: String): DataFrame =
    recallOf(s1KnnBrute(spark, dir), s35ResidualKnn(spark, dir))

  lazy val s36Sql: String =
    s"""WITH $residualPairsCtes,
       |${exactPairsCte("xpairs")},
       |${topkCte("xr", "xpairs")},
       |exact AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= $K),
       |${topkCte("ar", "apairs")},
       |approx AS (SELECT query_id, neighbor_id FROM ar WHERE rank <= $K)
       |$recallTailSql""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s41_density_sweep" -> (s41DensitySweep _),
    "s39_sdc_knn" -> (s39SdcKnn _),
    "s40_sdc_recall" -> (s40SdcRecall _),
    "s37_nn_descent" -> (s37NnDescent _),
    "s38_nnd_recall" -> (s38NndRecall _),
    "s42_nnd_curve" -> (s42NndCurve _),
    "s43_centroid_shift" -> (s43CentroidShift _),
    "s44_nprobe_curve" -> (s44NprobeCurve _),
    "s45_graph_knn" -> (s45GraphKnn _),
    "s46_graph_recall" -> (s46GraphRecall _),
    "s47_mmr" -> (s47Mmr _),
    "s48_mmr_overlap" -> (s48MmrOverlap _),
    "s49_opq_recall" -> (s49OpqRecall _),
    "s50_opq_codes" -> (s50OpqCodes _),
    "s51_alloc_recall" -> (s51AllocRecall _),
    "s52_givens_recall" -> (s52GivensRecall _),
    "s36_residual_recall" -> (s36ResidualRecall _),
    "s35_residual_knn" -> (s35ResidualKnn _),
    "s34_recall_curve" -> (s34RecallCurve _),
    "s33_mutual_knn" -> (s33MutualKnn _),
    "s32_sq_recall" -> (s32SqRecall _),
    "s31_sq_knn" -> (s31SqKnn _),
    "s30_ivf_balance" -> (s30IvfBalance _),
    "s29_trained_sign_recall" -> (s29TrainedSignRecall _),
    "s28_centroid_classify" -> (s28CentroidClassify _),
    "s27_knn_classify" -> (s27KnnClassify _),
    "s25_trained_ivfpq" -> (s25TrainedIvfPq _),
    "s26_trained_ivfpq_recall" -> (s26TrainedIvfPqRecall _),
    "s22_truncated_knn" -> (s22TruncatedKnn _),
    "s23_rerank" -> (s23Rerank _),
    "s24_rerank_recall" -> (s24RerankRecall _),
    "s20_hamming_knn" -> (s20HammingKnn _),
    "s21_hamming_recall" -> (s21HammingRecall _),
    "s14_pq_trained" -> (s14PqTrained _),
    "s15_pq_trained_recall" -> (s15PqTrainedRecall _),
    "s10_pq_knn" -> (s10PqKnn _),
    "s11_pq_recall" -> (s11PqRecall _),
    "s12_ivfpq" -> (s12IvfPq _),
    "s13_ivfpq_recall" -> (s13IvfPqRecall _),
    "s8_recall_eval" -> (s8RecallEval _),
    "s9_ivf_recall" -> (s9IvfRecall _),
    "s16_filtered_knn" -> (s16FilteredKnn _),
    "s17_cluster_quality" -> (s17ClusterQuality _),
    "s18_kmeans_warm" -> (s18KmeansWarm _),
    "s19_doc_knn" -> (s19DocKnn _),
    "s1_knn_brute" -> (s1KnnBrute _),
    "s2_knn_lsh" -> (s2KnnLsh _),
    "s3_pairwise_topk" -> (s3PairwiseTopk _),
    "s4_ivf_knn" -> (s4IvfKnn _),
    "s5_kmeans" -> (s5Kmeans _),
    "s6_range_search" -> (s6RangeSearch _),
    "s7_ivf_trained" -> (s7IvfTrained _))

  val oracles: Map[String, String] = Map(
    "s41_density_sweep" -> s41Sql,
    "s39_sdc_knn" -> s39Sql,
    "s40_sdc_recall" -> s40Sql,
    "s37_nn_descent" -> s37Sql,
    "s38_nnd_recall" -> s38Sql,
    "s42_nnd_curve" -> s42Sql,
    "s43_centroid_shift" -> s43Sql,
    "s44_nprobe_curve" -> s44Sql,
    "s45_graph_knn" -> s45Sql,
    "s46_graph_recall" -> s46Sql,
    "s47_mmr" -> s47Sql,
    "s48_mmr_overlap" -> s48Sql,
    "s49_opq_recall" -> s49Sql,
    "s50_opq_codes" -> s50Sql,
    "s51_alloc_recall" -> s51Sql,
    "s52_givens_recall" -> s52Sql,
    "s36_residual_recall" -> s36Sql,
    "s35_residual_knn" -> s35Sql,
    "s34_recall_curve" -> s34Sql,
    "s33_mutual_knn" -> s33Sql,
    "s32_sq_recall" -> s32Sql,
    "s31_sq_knn" -> s31Sql,
    "s30_ivf_balance" -> s30Sql,
    "s29_trained_sign_recall" -> s29Sql,
    "s28_centroid_classify" -> s28Sql,
    "s27_knn_classify" -> s27Sql,
    "s25_trained_ivfpq" -> s25Sql,
    "s26_trained_ivfpq_recall" -> s26Sql,
    "s22_truncated_knn" -> s22Sql,
    "s23_rerank" -> s23Sql,
    "s24_rerank_recall" -> s24Sql,
    "s20_hamming_knn" -> s20Sql,
    "s21_hamming_recall" -> s21Sql,
    "s14_pq_trained" -> s14Sql,
    "s15_pq_trained_recall" -> s15Sql,
    "s10_pq_knn" -> s10Sql,
    "s11_pq_recall" -> s11Sql,
    "s12_ivfpq" -> s12Sql,
    "s13_ivfpq_recall" -> s13Sql,
    "s8_recall_eval" -> s8Sql,
    "s9_ivf_recall" -> s9Sql,
    "s16_filtered_knn" -> s16Sql,
    "s17_cluster_quality" -> s17Sql,
    "s18_kmeans_warm" -> s18Sql,
    "s19_doc_knn" -> s19Sql,
    "s1_knn_brute" -> s1Sql,
    "s2_knn_lsh" -> s2Sql,
    "s3_pairwise_topk" -> s3Sql,
    "s4_ivf_knn" -> s4Sql,
    "s5_kmeans" -> s5Sql,
    "s6_range_search" -> s6Sql,
    "s7_ivf_trained" -> s7Sql)
}
