package graft.operators.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Shared vector primitives for similarity / embedding-dedup operators.
  *
  * The dot product and squared norm are *sequential left folds* over the
  * dimension index on BOTH engines (Spark `aggregate`, DuckDB
  * `list_reduce`), so double results are bit-identical and the oracle
  * contract is exact equality — no epsilon comparisons anywhere.
  *
  * LSH is BANDED hyperplane signatures (the OR-amplification scheme):
  * `Bands` independent bands of `BandBits` deterministic pseudo-random
  * hyperplanes each (integer arithmetic on (plane, dimension) — no
  * stored random state). A vector lands in one `BandBits`-bit bucket
  * PER BAND; candidate pairs are pairs sharing any band bucket. Two
  * scale knobs, both parameters here rather than hard-coded shapes:
  *  - `BandBits` sets bucket count per band (2^bits): raise it with
  *    corpus size (16+ bits → 65k+ buckets at 100 TB) so per-bucket
  *    population — and the within-bucket pair join — stays bounded;
  *  - `Bands` sets recall (a true near-dup pair collides in ≥1 of the
  *    independent bands with prob 1-(1-p^bits)^bands).
  * On top of both, consumers cap degenerate buckets at [[MaxBucket]]
  * (the d2/g7 skew-guard pattern), so worst-case pair volume is
  * bounded even for adversarial corpora.
  */
object VectorExprs {

  /** Bands (recall knob) × bits per band (bucket-count knob). 8×8 =
    * 64 hyperplanes, 256 buckets/band at test scale; at 100 TB raise
    * BandBits so bucket count grows with the corpus. */
  val Bands = 8
  val BandBits = 8

  /** Degenerate-bucket cap for pair enumeration (see DedupOps d2). */
  val MaxBucket = 200

  /** float[] -> double[] (exact widening). */
  val castDoubleExpr = "transform(embedding, x -> cast(x as double))"

  /** Squared L2 norm of `vd` (native codegen'd fold). */
  val n2Expr = "graft_dot(vd, vd)"

  /** Per-band bucket keys of `vd`: int array of length [[Bands]],
    * bands[b] = Σ_j sign(h_{b·BandBits+j} · vd) << j. */
  val bandsExpr: String =
    s"""transform(sequence(0, ${Bands - 1}), b ->
       |  aggregate(sequence(0, ${BandBits - 1}), 0, (acc, j) -> acc + CASE WHEN
       |    aggregate(sequence(1, 64), cast(0.0 as double),
       |      (a, d) -> a + cast(((b*$BandBits + j)*131 + d)*2654435761 % 1000003 - 500000 as double)
       |                    * element_at(vd, d)) > 0
       |    THEN shiftleft(1, j) ELSE 0 END))""".stripMargin

  /** Dot product of two qualified double-array columns — the native
    * [[graft.functions.DotProduct]] expression (same sequential fold
    * semantics as the DuckDB oracle, but fully codegen'd). */
  def dotExpr(a: String, b: String): String =
    s"graft_dot($a, $b)"

  /** Deterministic orthonormal rotation R = (1/8)·H·D over `vd`: H is
    * the 64×64 Walsh–Hadamard matrix (h(a,b) = (−1)^popcount(a AND b),
    * 0-indexed), D a ±1 diagonal from the shared integer hash — the
    * structured fast-JL rotation that OPQ-style quantization applies
    * before PQ. Exactly orthonormal (H·Hᵀ = 64·I, D² = I): dot
    * products and norms are preserved, so the exact-kNN baseline is
    * unchanged — what changes is how variance spreads across the PQ
    * subspaces (s49 measures the recall this buys). No trained matrix
    * is stored: h and the diagonal are pure integer functions of the
    * indices, reproducible on any engine. Sequential fold per output
    * dim — bit-identical doubles vs the oracle. */
  val rotExpr: String = "graft_fwht64(vd)"

  /** The naive O(64²) product form of the same rotation — kept for
    * the spec that pins butterfly ≡ matrix product (they differ only
    * by float rounding; the GATE runs the butterfly on both engines,
    * see [[graft.functions.Fwht64]]). */
  val rotNaiveExpr: String =
    s"""transform(sequence(1, 64), j ->
       |  aggregate(sequence(1, 64), cast(0.0 as double),
       |    (a, d) -> a + cast(1 - 2 * (bit_count((j-1) & (d-1)) % 2) as double)
       |                * cast(1 - 2 * ((d * 2654435761 % 1000003) % 2) as double)
       |                * element_at(vd, d)) / cast(8.0 as double))""".stripMargin

  /** DuckDB CTEs mirroring [[rotExpr]] (the [[graft.functions.Fwht64]]
    * butterfly, stage-for-stage — the float-order contract) applied to
    * `eb`: `ebr` (vec_id, vd = R·x, n2, qv in integer micro-units) —
    * chain after [[embCtes]]. */
  val ebrCtes: String = {
    val stages = Seq(1, 2, 4, 8, 16, 32).zipWithIndex.map { case (h, s) =>
      s"""rw${s + 1} AS (
         |  SELECT vec_id,
         |    [ CASE WHEN ((j - 1) & $h) = 0 THEN y[j] + y[j + $h]
         |           ELSE y[j - $h] - y[j] END
         |      for j in generate_series(1, 64) ] AS y
         |  FROM rw$s)""".stripMargin
    }.mkString(",\n")
    s"""rw0 AS (
       |  SELECT vec_id,
       |    [ CAST(1 - 2 * ((d * 2654435761 % 1000003) % 2) AS DOUBLE) * vd[d]
       |      for d in generate_series(1, 64) ] AS y
       |  FROM eb),
       |$stages,
       |ebr AS MATERIALIZED (
       |  SELECT vec_id, vd,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), [ x*x for x in vd ]),
       |                (a, b) -> a + b) AS n2,
       |    [CAST(round(x * 1000000) AS BIGINT) for x in vd] AS qv
       |  FROM (SELECT vec_id, [ y[j] / 8.0 for j in generate_series(1, 64) ] AS vd
       |        FROM rw6))""".stripMargin
  }

  /** DuckDB CTEs for the DATA-trained allocation rotation (s51/v17):
    * per-dim exact integer centered variance n·Σq² − (Σq)² over the
    * micro-unit quantized coordinates (HUGEINT — the e29 promotion,
    * so the rank order is engine-exact), then the snake-deal
    * permutation balancing per-subspace variance: rank rn (0-based,
    * variance desc, dim asc), round r = rn div 8, position p = rn
    * mod 8, subspace s = p on even rounds and 7−p on odd rounds,
    * new 1-based index = s·8 + r + 1. Chain after [[embCtes]];
    * defines `dvar` (d, ss) and `perm` (old_d, new_d). */
  val allocPermCtes: String =
    """aqv AS (
      |  SELECT vec_id, [CAST(round(x * 1000000) AS BIGINT) for x in vd] AS q
      |  FROM eb),
      |dvar AS (
      |  SELECT d,
      |    CAST(count(*) AS HUGEINT) * sum(CAST(q[d] AS HUGEINT) * q[d])
      |      - sum(CAST(q[d] AS HUGEINT)) * sum(CAST(q[d] AS HUGEINT)) AS ss
      |  FROM aqv, generate_series(1, 64) g(d) GROUP BY d),
      |perm AS (
      |  SELECT d AS old_d,
      |    CASE WHEN (rn // 8) % 2 = 0 THEN (rn % 8) * 8 + rn // 8 + 1
      |         ELSE (7 - rn % 8) * 8 + rn // 8 + 1 END AS new_d
      |  FROM (SELECT d, row_number() OVER (ORDER BY ss DESC, d) - 1 AS rn
      |        FROM dvar) x)""".stripMargin

  /** The allocation-rotated corpus `eba` (vec_id, vd, n2, qv) —
    * [[ebrCtes]]' shape with the trained permutation in place of the
    * Hadamard butterfly. Chain after [[embCtes]]. */
  val ebaCtes: String =
    s"""$allocPermCtes,
       |pinv AS (SELECT list(old_d ORDER BY new_d) AS inv FROM perm),
       |eba AS MATERIALIZED (
       |  SELECT vec_id, vd,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), [ x*x for x in vd ]),
       |                (a, b) -> a + b) AS n2,
       |    [CAST(round(x * 1000000) AS BIGINT) for x in vd] AS qv
       |  FROM (SELECT e.vec_id,
       |          [ e.vd[p.inv[i]] for i in generate_series(1, 64) ] AS vd
       |        FROM eb e CROSS JOIN pinv p))""".stripMargin

  /** embeddings + (vd, bands, n2) feature columns; one codegen'd
    * scan, cached per (session, dir) — reused by both sides of every
    * similarity self-join and by the embedding-dedup operator. */
  def embFeatures(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    graft.util.DfCache.cached(spark, dir, "emb_features") {
      Tables.load(spark, dir, "embeddings")
        .withColumn("vd", expr(castDoubleExpr))
        .withColumn("bands", expr(bandsExpr))
        .withColumn("n2", expr(n2Expr))
        .select(col("vec_id"), col("label"), col("vd"), col("bands"), col("n2"))
    }
  }

  /** (vec_id, label, band, bkey): [[Bands]] rows per vector — the LSH
    * shuffle key table, cached (d5, s2 and s3 all read it). */
  def embBands(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "emb_bands") {
      embFeatures(spark, dir)
        .select(col("vec_id"), col("label"),
          posexplode(col("bands")).as(Seq("band", "bkey")))
    }

  /** Band rows with degenerate buckets (> [[MaxBucket]] members over
    * the whole corpus) removed — the candidate-generation input for
    * d5/s2. `perLabel = true` caps per (label, band, bkey) instead
    * (s3's within-label pairing). */
  def cappedBands(spark: SparkSession, dir: String, perLabel: Boolean = false): DataFrame = {
    val keys = if (perLabel) Seq("label", "band", "bkey") else Seq("band", "bkey")
    graft.util.Buckets.cap(embBands(spark, dir), keys, MaxBucket)
  }

  /** DuckDB CTEs mirroring [[embFeatures]]: views `ef` (vd) and `eb`
    * (vd, label, bands, n2). */
  val embCtes: String =
    s"""ef AS (
       |  SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
       |  FROM embeddings),
       |eb AS (
       |  SELECT vec_id, label, vd,
       |    [ list_reduce(list_prepend(CAST(0 AS INTEGER), [
       |        CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |               [ CAST(((b*$BandBits + j)*131 + d)*2654435761 % 1000003 - 500000 AS DOUBLE) * vd[d]
       |                 for d in generate_series(1, 64) ]), (a, x) -> a + x) > 0
       |             THEN (1 << j) ELSE 0 END
       |        for j in generate_series(0, ${BandBits - 1}) ]), (a, x) -> a + x)
       |      for b in generate_series(0, ${Bands - 1}) ] AS bands,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), [ x*x for x in vd ]),
       |                (a, b) -> a + b) AS n2
       |  FROM ef)""".stripMargin

  /** DuckDB CTEs mirroring [[embBands]] + the global [[cappedBands]]:
    * `ebb` (band rows) and `capped` (degenerate buckets removed). */
  val bandCtes: String =
    s"""$embCtes,
       |ebb AS (SELECT vec_id, label, b - 1 AS band, bands[b] AS bkey
       |        FROM eb, generate_series(1, $Bands) g(b)),
       |ok_buckets AS (
       |  SELECT band, bkey FROM ebb GROUP BY band, bkey HAVING count(*) <= $MaxBucket),
       |capped AS (SELECT e.vec_id, e.label, e.band, e.bkey
       |           FROM ebb e JOIN ok_buckets USING (band, bkey))""".stripMargin

  /** DuckDB dot product of two qualified list columns (sequential fold). */
  def duckDot(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    [ $a[d] * $b[d] for d in generate_series(1, 64) ]), (a, b) -> a + b)""".stripMargin
}
