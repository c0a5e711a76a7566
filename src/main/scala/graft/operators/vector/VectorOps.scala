package graft.operators.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding preprocessing operators — the vector-column counterparts
  * of the text-cleaning family: the transforms a training-data
  * pipeline applies to every embedding before storage or serving.
  *
  * Both are one narrow codegen'd scan per vector (HOF compositions,
  * no UDFs, no shuffle at all — embarrassingly parallel at 100 TB),
  * and both are exactly mirrored in DuckDB: normalization divides the
  * same doubles by the same sequential-fold norm, quantization uses
  * round-half-away-from-zero on identical products, so the gate is
  * exact equality like every other entry.
  */
object VectorOps {

  /** One-pass scan with just (vd, n2) — deliberately NOT the cached
    * [[VectorExprs.embFeatures]]: that table also computes the 64
    * hyperplane band signatures (64 dots per row), pure waste for a
    * preprocessing pass. Uncached: each op reads the corpus exactly
    * once, nothing worth keeping. */
  private def embPlain(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.registerAll(spark)
    graft.sources.Tables.load(spark, dir, "embeddings")
      .withColumn("vd", expr(VectorExprs.castDoubleExpr))
      .withColumn("n2", expr(VectorExprs.n2Expr))
  }

  /** v1: L2-normalization. Computes the full normalized vector; the
    * gate projects the norm and the first 4 normalized dims (scalar
    * columns compare robustly across engines). */
  def v1L2Normalize(spark: SparkSession, dir: String): DataFrame =
    embPlain(spark, dir)
      .withColumn("norm", sqrt(col("n2")))
      .withColumn("nd", expr("transform(vd, x -> x / norm)"))
      .select(col("vec_id"), col("norm"),
        element_at(col("nd"), 1).as("nd1"), element_at(col("nd"), 2).as("nd2"),
        element_at(col("nd"), 3).as("nd3"), element_at(col("nd"), 4).as("nd4"))
      .orderBy(col("vec_id"))

  lazy val v1Sql: String =
    s"""WITH ${VectorExprs.embCtes}
       |SELECT vec_id, sqrt(n2) AS norm,
       |  vd[1] / sqrt(n2) AS nd1, vd[2] / sqrt(n2) AS nd2,
       |  vd[3] / sqrt(n2) AS nd3, vd[4] / sqrt(n2) AS nd4
       |FROM eb ORDER BY vec_id""".stripMargin

  /** v2: symmetric int8 quantization (scale = 127 / max|x|, round to
    * nearest). The gate checks per-vector scale + integer summary
    * stats of the quantized codes (sum/min/max — order-independent
    * integer arithmetic, exact on both engines). */
  def v2Int8Quantize(spark: SparkSession, dir: String): DataFrame =
    embPlain(spark, dir)
      .withColumn("am", expr("array_max(transform(vd, x -> abs(x)))"))
      .filter(col("am") > 0.0)
      .withColumn("scale", lit(127.0) / col("am"))
      .withColumn("q", expr("transform(vd, x -> cast(round(x * scale) as int))"))
      .select(col("vec_id"), col("scale"),
        expr("aggregate(q, 0, (a, x) -> a + x)").as("q_sum"),
        expr("array_min(q)").as("q_min"),
        expr("array_max(q)").as("q_max"))
      .orderBy(col("vec_id"))

  lazy val v2Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |qd AS (
       |  SELECT vec_id, 127.0 / list_max([abs(x) for x in vd]) AS scale,
       |    [CAST(round(x * (127.0 / list_max([abs(y) for y in vd]))) AS INTEGER)
       |     for x in vd] AS q
       |  FROM eb WHERE list_max([abs(x) for x in vd]) > 0)
       |SELECT vec_id, scale,
       |  CAST(list_sum(q) AS INTEGER) AS q_sum,
       |  list_min(q) AS q_min, list_max(q) AS q_max
       |FROM qd ORDER BY vec_id""".stripMargin

  /** v3: deterministic random projection 64 → 8 dims (the
    * Johnson-Lindenstrauss dimensionality-reduction step before
    * storage/indexing). The projection matrix is the same stateless
    * integer-hash construction as the LSH hyperplanes
    * ([[VectorExprs.bandsExpr]]) — w(j,d) is a pure function of
    * (plane, dimension), so no trained matrix is stored and any
    * engine reproduces it exactly. One narrow codegen'd scan, zero
    * shuffle; sequential folds keep doubles bit-identical to the
    * oracle. The gate projects the first 4 output dims. */
  private val ProjDims = 8

  def v3RandomProjection(spark: SparkSession, dir: String): DataFrame = {
    val projExpr =
      s"""transform(sequence(0, ${ProjDims - 1}), j ->
         |  aggregate(sequence(1, 64), cast(0.0 as double),
         |    (a, d) -> a + cast((j*131 + d)*2654435761 % 1000003 - 500000 as double)
         |                  * element_at(vd, d)))""".stripMargin
    embPlain(spark, dir)
      .withColumn("proj", expr(projExpr))
      .select(col("vec_id"),
        element_at(col("proj"), 1).as("p1"), element_at(col("proj"), 2).as("p2"),
        element_at(col("proj"), 3).as("p3"), element_at(col("proj"), 4).as("p4"))
      .orderBy(col("vec_id"))
  }

  lazy val v3Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |pr AS (
       |  SELECT vec_id,
       |    [ list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |        [ CAST((j*131 + d)*2654435761 % 1000003 - 500000 AS DOUBLE) * vd[d]
       |          for d in generate_series(1, 64) ]), (a, x) -> a + x)
       |      for j in generate_series(0, ${ProjDims - 1}) ] AS proj
       |  FROM eb)
       |SELECT vec_id, proj[1] AS p1, proj[2] AS p2, proj[3] AS p3, proj[4] AS p4
       |FROM pr ORDER BY vec_id""".stripMargin

  /** v4: product quantization — the vector-COMPRESSION index step
    * (after v3's dimensionality reduction, the other axis): split the
    * 64-dim vector into M=8 subvectors of 8 dims; quantize each
    * against a 16-entry per-subspace codebook (deterministically
    * seeded from the 16 lowest vec_ids, the s4/s5 seed pattern);
    * emit the packed 32-bit code word (8 × 4-bit codes) and the
    * reconstruction error. Compresses 256 bytes of float32 to 4
    * bytes/vector — the memory math that makes billion-vector ANN
    * fit RAM.
    *
    * Plan: corpus ⋈ broadcast(16 codebook rows) scored map-side (8
    * subspace L2 distances per pair via one fold expression), then
    * ONE map-side-combined aggregate takes the per-subspace argmin
    * (8 min-over-struct columns) — shuffling |corpus| pre-combined
    * rows, no window. Distances are sequential folds, the error sum
    * is a fixed-order + chain, tie on equal distance → lowest code:
    * everything bit-identical to the oracle. */
  val PqM = 8        // subspaces
  val PqD = 8        // dims per subspace
  val PqK = 16       // codebook entries per subspace (4 bits)

  /** The PQ codebook: PqK deterministic rows (the s4/s5 seed pattern)
    * as (mid, cvd). Broadcast-sized by construction. */
  def pqCents(spark: SparkSession, dir: String): DataFrame =
    embPlain(spark, dir).filter(col("vec_id") < PqK)
      .select(col("vec_id").as("mid"), col("vd").as("cvd"))

  /** The built PQ index: (vec_id, pq_code, recon_err) — DfCache'd
    * because it is both v4's gated output AND the corpus side of
    * s10's ADC search (the whole point of PQ: the search path scans
    * 12 bytes/vector, never the raw embeddings). */
  def pqAssigned(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "pq_codes") {
      val e = embPlain(spark, dir).select(col("vec_id"), col("vd"))
      // per (vector, codebook row): the M per-subspace squared-L2
      // distances, each an ordered fold over its 8 dims
      val distsExpr =
        s"""transform(sequence(0, ${PqM - 1}), m ->
           |  aggregate(sequence(1, $PqD), cast(0.0 as double),
           |    (a, d) -> a + (element_at(vd, m*$PqD + d) - element_at(cvd, m*$PqD + d))
           |                * (element_at(vd, m*$PqD + d) - element_at(cvd, m*$PqD + d))))""".stripMargin
      val scored = e.crossJoin(broadcast(pqCents(spark, dir)))
        .withColumn("dists", expr(distsExpr))
      val picks = (0 until PqM).map(m =>
        min(struct(element_at(col("dists"), m + 1).as("d"), col("mid").as("c")))
          .as(s"p$m"))
      val g = scored.groupBy(col("vec_id")).agg(picks.head, picks.tail: _*)
      val code = (0 until PqM).map(m => col(s"p$m.c") * (1L << (4 * m)))
        .reduce(_ + _)
      val err = (0 until PqM).map(m => col(s"p$m.d")).reduce(_ + _)
      g.select(col("vec_id"), code.cast("long").as("pq_code"),
        err.as("recon_err"))
    }

  def v4PqCodes(spark: SparkSession, dir: String): DataFrame =
    pqAssigned(spark, dir).orderBy(col("vec_id"))

  /** Oracle CTEs mirroring [[pqAssigned]] up through the per-subspace
    * argmin `pick` (vec_id, m, code, dist) — chained after
    * [[VectorExprs.embCtes]]; shared by v4Sql and the s10/s11 ADC
    * oracles so a codebook change updates the search gate in
    * lockstep. `pick` is MATERIALIZED: s10/s11 join it per query and
    * DuckDB would otherwise re-derive the full cross-join per use. */
  val pqPickCtes: String = {
    val dist = (m: String) =>
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |  [ (e.vd[$m*$PqD + d] - c.cvd[$m*$PqD + d]) * (e.vd[$m*$PqD + d] - c.cvd[$m*$PqD + d])
         |    for d in generate_series(1, $PqD) ]), (a, x) -> a + x)""".stripMargin
    s"""pqcents AS (SELECT vec_id AS mid, vd AS cvd FROM eb WHERE vec_id < $PqK),
       |pqsc AS (
       |  SELECT e.vec_id, c.mid,
       |    [ ${dist("(m - 1)")} for m in generate_series(1, $PqM) ] AS dists
       |  FROM eb e CROSS JOIN pqcents c),
       |pqsu AS (
       |  SELECT vec_id, mid, m - 1 AS m, dists[m] AS dist
       |  FROM pqsc, generate_series(1, $PqM) g(m)),
       |pick AS MATERIALIZED (
       |  SELECT vec_id, m, mid AS code, dist FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
       |      ORDER BY dist, mid) AS rn FROM pqsu) x WHERE rn = 1)""".stripMargin
  }

  lazy val v4Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |$pqPickCtes
       |SELECT vec_id,
       |  CAST(sum(code * (1 << (4 * CAST(m AS INTEGER)))) AS BIGINT) AS pq_code,
       |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(dist ORDER BY m)),
       |              (a, x) -> a + x) AS recon_err
       |FROM pick GROUP BY vec_id ORDER BY vec_id""".stripMargin

  // ---- v12: PQ symmetric-distance (SDC) tables ----
  // The OTHER half of Jégou et al.'s PQ search story: ADC (s10) keeps
  // the query raw and pays a per-query lookup-table build; SDC
  // quantizes the query too and scores CODE AGAINST CODE through this
  // precomputed inter-centroid table — nothing per-query beyond a
  // nibble unpack, which is what a code-to-code dedup sweep or an
  // index-side kNN-graph build wants (no raw vector ever read). The
  // table is tiny and STATIC: per subspace m, dot(c_i^m, c_j^m) for
  // all centroid pairs — 8×16×16 entries, ~16 KB broadcast, built
  // once from the same pqcents the codes were assigned against.
  // Gated as the i ≤ j half (the symmetric closure is derived); the
  // diagonal rows double as the reconstructed-norm terms SDC cosine
  // needs. Folds are sequential per subspace — bit-identical doubles.
  /** Full (both orders) inter-centroid subspace dot table —
    * (m, ci, cj, dot); v12 gates the i ≤ j half, s39 broadcasts the
    * whole thing as a lookup map. */
  private[operators] def sdcEntries(spark: SparkSession, dir: String): DataFrame = {
    val a = pqCents(spark, dir).select(col("mid").as("ci"), col("cvd").as("cva"))
    val b = pqCents(spark, dir).select(col("mid").as("cj"), col("cvd").as("cvb"))
    val subFold =
      s"""transform(sequence(0, ${PqM - 1}), m ->
         |  aggregate(sequence(1, $PqD), cast(0.0 as double),
         |    (a, d) -> a + element_at(cva, m*$PqD + d) * element_at(cvb, m*$PqD + d)))"""
        .stripMargin
    a.crossJoin(b)
      .select(col("ci"), col("cj"), posexplode(expr(subFold)).as(Seq("m", "dot")))
      .select(col("m").cast("int").as("m"), col("ci"), col("cj"), col("dot"))
  }

  def v12SdcTables(spark: SparkSession, dir: String): DataFrame =
    sdcEntries(spark, dir)
      .filter(col("ci") <= col("cj"))
      .orderBy(col("m"), col("ci"), col("cj"))

  lazy val v12Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |pqcents AS (SELECT vec_id AS mid, vd AS cvd FROM eb WHERE vec_id < $PqK),
       |sd AS (
       |  SELECT g.m, a.mid AS ci, b.mid AS cj,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      [ a.cvd[g.m*$PqD + d] * b.cvd[g.m*$PqD + d]
       |        for d in generate_series(1, $PqD) ]), (x, y) -> x + y) AS dot
       |  FROM pqcents a CROSS JOIN pqcents b, generate_series(0, ${PqM - 1}) g(m))
       |SELECT CAST(m AS INTEGER) AS m, ci, cj, dot FROM sd
       |WHERE ci <= cj ORDER BY m, ci, cj""".stripMargin

  // ---- v5: 1-bit sign quantization (binary codes) ----
  // The most aggressive compression row of the family: one sign bit
  // per dim (Charikar 2002's hyperplane-LSH degenerate case where the
  // hyperplanes are the coordinate axes). 64 dims pack into two
  // 32-bit halves summed as exact powers of two — all-integer on both
  // engines, no float in the gate beyond the strict vd[i] > 0 test on
  // identical doubles. 8 bytes/vector vs 256 of raw float32 (32×):
  // at 1B vectors the whole corpus is an 8 GB scan, which is why the
  // compressed-domain brute force (s20) exists. One narrow codegen'd
  // scan, zero shuffle — embarrassingly parallel at 100 TB.
  private def signFold(lo: Int, hi: Int): String =
    s"""aggregate(sequence($lo, $hi), cast(0 as bigint),
       |  (acc, i) -> acc + IF(element_at(vd, i) > 0D,
       |    shiftleft(cast(1 as bigint), i - $lo), cast(0 as bigint)))"""
      .stripMargin

  /** (vec_id, sign_lo, sign_hi) binary-code table — the corpus side
    * of s20's hamming scan; computed fresh (one cheap scan, nothing
    * worth caching). */
  def signCodes(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.load(spark, dir, "embeddings")
      .withColumn("vd", expr(VectorExprs.castDoubleExpr))
      .select(col("vec_id"),
        expr(signFold(1, 32)).as("sign_lo"),
        expr(signFold(33, 64)).as("sign_hi"))

  def v5SignQuantize(spark: SparkSession, dir: String): DataFrame =
    signCodes(spark, dir)
      .withColumn("n_pos",
        expr("bit_count(sign_lo) + bit_count(sign_hi)").cast("long"))
      .orderBy(col("vec_id"))

  /** DuckDB CTE `sc` mirroring [[signCodes]]; chains off `ef` from
    * [[VectorExprs.embCtes]] (the band columns of `eb` go unused and
    * unreferenced CTE work is pruned). Shared with s20/s21's oracles. */
  val signCte: String = {
    def half(lo: Int) =
      s"""CAST(list_sum(list_transform(generate_series($lo, ${lo + 31}),
         |  i -> CASE WHEN vd[i] > 0 THEN (CAST(1 AS BIGINT) << (i - $lo))
         |            ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"""
        .stripMargin
    s"""sc AS (
       |  SELECT vec_id, ${half(1)} AS sign_lo, ${half(33)} AS sign_hi
       |  FROM ef)""".stripMargin
  }

  lazy val v5Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |$signCte
       |SELECT vec_id, sign_lo, sign_hi,
       |  CAST(bit_count(sign_lo) + bit_count(sign_hi) AS BIGINT) AS n_pos
       |FROM sc ORDER BY vec_id""".stripMargin

  // ---- v13: per-bit balance of the sign codes (code quality gauge) ----
  // Hamming-space resolution lives or dies on bit balance: a bit set
  // in ~50% of codes contributes a full bit of discrimination, a
  // near-constant bit contributes none (the "dead dimension" that
  // makes s20's distances collapse). v13 reports, per bit position,
  // the exact ppm share of vectors with the bit set and the skew
  // |2·ones − n| — the gauge read before trusting v5/s20/s29, and the
  // diagnosis when s21's recall is poor (dims with one-sided signs).
  // Plan: one sign-code scan, a 64-way in-row explode, one
  // map-side-combined count — 64 rows out, zero joins; the corpus
  // never shuffles (the groupBy key is the 64-value bit index).
  // ---- v14: PQ code-usage histogram (codebook balance) ----
  // The codebook-health gauge PQ tuning reads next to the recall
  // rows: per subspace m, how many vectors landed on each of the 16
  // codes. A dead code is a wasted address (the subquantizer spends
  // a bit pattern nothing uses); a dominant code means the subspace
  // carries almost no information and its bits are better given to
  // another — the classic motivation for re-training or OPQ-style
  // rotation. Pure unpack of the cached packed codes (4-bit shifts
  // in-row, no re-scoring) + one map-side-combined aggregate to the
  // bounded M×16 grid. Oracle reads the same histogram off the
  // shared `pick` CTE, so a codebook change moves both in lockstep.
  def v14CodeHistogram(spark: SparkSession, dir: String): DataFrame =
    pqAssigned(spark, dir)
      .select(posexplode(expr(
        s"""transform(sequence(0, ${PqM - 1}),
           |  m -> cast(shiftright(pq_code, 4 * m) & 15 as bigint))"""
          .stripMargin)).as(Seq("m", "code")))
      .groupBy(col("m").cast("long").as("m"), col("code"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy(col("m"), col("code"))

  lazy val v14Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |$pqPickCtes
       |SELECT m, code, count(*) AS n_vecs FROM pick
       |GROUP BY 1, 2 ORDER BY m, code""".stripMargin

  // ---- v15: quantizer rate–distortion gauge (per-vector SSE ppm) ----
  // The distortion column the recall gauges (s21/s32) imply but never
  // state: per vector, the reconstruction error of the int8 quantizer
  // (v2's round(x·127/max|x|)/scale convention) and of the 1-bit sign
  // quantizer (x̂ = ±mean|x|, the SSE-minimizing symmetric level for a
  // fixed sign pattern), each as ⌊SSE·10⁶/‖x‖²⌋ — an INTEGER ratio of
  // two identically-folded doubles, so the gate stays exact without
  // banning float arithmetic. Reading v15 next to v8/v31's recall
  // rows gives the rate–distortion curve: 8 bits/dim ≈ 10–30 ppm,
  // 1 bit/dim ≈ hundreds of thousands — the storage-vs-fidelity
  // tradeoff a 100 TB embedding store prices before choosing codes.
  // One codegen'd scan, zero shuffle, V rows.
  // ---- v16: rotation isometry check (the OPQ preprocessing gate) ----
  // The per-vector report a pipeline runs after rotating embeddings
  // (s49/s50's encode-time step): original vs rotated squared norm
  // and their drift — |n2_rot − n2| must sit at float-rounding scale
  // because R is exactly orthonormal, and a drift spike flags a
  // corrupted rotation long before recall quietly degrades. Also
  // gates the first two rotated coordinates, pinning the rotation's
  // SIGN/INDEX conventions cross-engine (a transposed or re-signed R
  // is still orthonormal — the norm check alone would pass it). One
  // narrow codegen'd... interpreted-HOF scan (the O(64²) fold, see
  // §6), zero shuffle, embarrassingly parallel.
  def v16RotationCheck(spark: SparkSession, dir: String): DataFrame =
    embPlain(spark, dir)
      .withColumn("vr", expr(VectorExprs.rotExpr))
      .withColumn("n2r",
        expr("aggregate(vr, cast(0.0 as double), (a, x) -> a + x * x)"))
      .select(col("vec_id"), col("n2"), col("n2r"),
        (col("n2r") - col("n2")).as("n2_drift"),
        element_at(col("vr"), 1).as("r1"),
        element_at(col("vr"), 2).as("r2"))
      .orderBy(col("vec_id"))

  lazy val v16Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |${VectorExprs.ebrCtes}
       |SELECT e.vec_id, e.n2, r.n2 AS n2r, r.n2 - e.n2 AS n2_drift,
       |  r.vd[1] AS r1, r.vd[2] AS r2
       |FROM eb e JOIN ebr r ON e.vec_id = r.vec_id
       |ORDER BY e.vec_id""".stripMargin

  // ---- v17: allocation balance gauge (the s51 isotropy report) ----
  // The variance-ratio gauge the s51 rung is judged against: exact
  // per-subspace variance SHARES (integer ppm of total) before and
  // after the trained dimension allocation. On an anisotropic corpus
  // the before-shares are skewed and the after-shares flatten (that
  // flattening is where the recall comes from); near-uniform
  // before-shares certify isotropy — the honest "no rotation can
  // help" verdict with a number attached. All arithmetic is the
  // exact integer ss = n·Σq² − (Σq)² (DECIMAL(38)/HUGEINT) and ppm
  // integer division — engine-exact by construction.
  def v17AllocBalance(spark: SparkSession, dir: String): DataFrame = {
    val sims = graft.operators.similarity.SimilarityOps
    val dss = sims.dimVariance(spark, dir)
    val perm = sims.allocPerm(spark, dir)
    val tot = dss.agg(sum(col("ss")).as("t"))
    val before = dss.select(expr("(d - 1) div 8").as("subspace"), col("ss"))
      .groupBy(col("subspace")).agg(sum(col("ss")).as("ssb"))
    val after = perm.join(dss, col("old_d") === col("d"))
      .select(expr("(new_d - 1) div 8").as("subspace"), col("ss"))
      .groupBy(col("subspace")).agg(sum(col("ss")).as("ssa"))
    before.join(after, Seq("subspace")).crossJoin(broadcast(tot))
      .select(col("subspace").cast("long").as("subspace"),
        expr("CAST((ssb * 1000000) div t AS BIGINT)").as("share_before_ppm"),
        expr("CAST((ssa * 1000000) div t AS BIGINT)").as("share_after_ppm"))
      .orderBy(col("subspace"))
  }

  lazy val v17Sql: String =
    s"""WITH ${graft.operators.vector.VectorExprs.embCtes},
       |${graft.operators.vector.VectorExprs.allocPermCtes},
       |tot AS (SELECT sum(ss) AS t FROM dvar),
       |sb AS (SELECT (d - 1) // 8 AS s, sum(ss) AS ssb FROM dvar GROUP BY 1),
       |sa AS (SELECT (p.new_d - 1) // 8 AS s, sum(v.ss) AS ssa
       |       FROM perm p JOIN dvar v ON v.d = p.old_d GROUP BY 1)
       |SELECT CAST(sb.s AS BIGINT) AS subspace,
       |  CAST((sb.ssb * 1000000) // t.t AS BIGINT) AS share_before_ppm,
       |  CAST((sa.ssa * 1000000) // t.t AS BIGINT) AS share_after_ppm
       |FROM sb JOIN sa ON sb.s = sa.s CROSS JOIN tot t
       |ORDER BY subspace""".stripMargin

  def v15QuantDistortion(spark: SparkSession, dir: String): DataFrame =
    embPlain(spark, dir)
      .withColumn("am", expr("array_max(transform(vd, x -> abs(x)))"))
      .filter(col("am") > 0.0 && col("n2") > 0.0)
      .withColumn("s8", lit(127.0) / col("am"))
      .withColumn("sse8", expr(
        """aggregate(vd, cast(0.0 as double), (a, x) ->
          |  a + (x - round(x * s8) / s8) * (x - round(x * s8) / s8))"""
          .stripMargin))
      .withColumn("sm", expr(
        "aggregate(vd, cast(0.0 as double), (a, x) -> a + abs(x)) / 64.0"))
      .withColumn("sses", expr(
        """aggregate(vd, cast(0.0 as double), (a, x) ->
          |  a + (x - CASE WHEN x > 0 THEN sm ELSE -sm END)
          |    * (x - CASE WHEN x > 0 THEN sm ELSE -sm END))""".stripMargin))
      .select(col("vec_id"),
        expr("floor(sse8 * 1000000 / n2)").as("int8_err_ppm"),
        expr("floor(sses * 1000000 / n2)").as("sign_err_ppm"))
      .orderBy(col("vec_id"))

  lazy val v15Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |q AS (
       |  SELECT vec_id, n2,
       |    127.0 / list_max([abs(x) for x in vd]) AS s8,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), [ abs(x) for x in vd ]),
       |      (a, b) -> a + b) / 64.0 AS sm,
       |    vd
       |  FROM eb WHERE list_max([abs(x) for x in vd]) > 0 AND n2 > 0),
       |e AS (
       |  SELECT vec_id, n2,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      [ (x - round(x * s8) / s8) * (x - round(x * s8) / s8)
       |        for x in vd ]), (a, b) -> a + b) AS sse8,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      [ (x - CASE WHEN x > 0 THEN sm ELSE -sm END)
       |        * (x - CASE WHEN x > 0 THEN sm ELSE -sm END)
       |        for x in vd ]), (a, b) -> a + b) AS sses
       |  FROM q)
       |SELECT vec_id,
       |  CAST(floor(sse8 * 1000000 / n2) AS BIGINT) AS int8_err_ppm,
       |  CAST(floor(sses * 1000000 / n2) AS BIGINT) AS sign_err_ppm
       |FROM e ORDER BY vec_id""".stripMargin

  def v13BitBalance(spark: SparkSession, dir: String): DataFrame = {
    val sc = signCodes(spark, dir)
      .select(col("vec_id"), col("sign_lo"), col("sign_hi"),
        explode(expr("sequence(0, 63)")).as("bit"))
      .select(col("bit"),
        expr("""CASE WHEN bit < 32 THEN shiftright(sign_lo, bit) & 1
               |     ELSE shiftright(sign_hi, bit - 32) & 1 END""".stripMargin)
          .as("b"))
    sc.groupBy(col("bit"))
      .agg(count(lit(1)).as("n"), sum(col("b")).as("ones"))
      .withColumn("ones_ppm", expr("ones * 1000000 div n"))
      .withColumn("skew", expr("abs(2 * ones - n)"))
      .select(col("bit"), col("n"), col("ones"), col("ones_ppm"), col("skew"))
      .orderBy(col("bit"))
  }

  lazy val v13Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |$signCte,
       |bits AS (
       |  SELECT b AS bit,
       |    CASE WHEN b < 32 THEN (sign_lo >> b) & 1
       |         ELSE (sign_hi >> (b - 32)) & 1 END AS v
       |  FROM sc, generate_series(0, 63) g(b))
       |SELECT bit, count(*) AS n, CAST(sum(v) AS BIGINT) AS ones,
       |  CAST(sum(v) * 1000000 // count(*) AS BIGINT) AS ones_ppm,
       |  CAST(abs(2 * sum(v) - count(*)) AS BIGINT) AS skew
       |FROM bits GROUP BY bit ORDER BY bit""".stripMargin

  // ---- v6: TRAINED sign quantization (median thresholds) ----
  // v5's sign bits threshold at 0 — wherever a dimension's
  // distribution is off-center its bit is imbalanced and carries
  // < 1 bit of information (the ITQ/median-binarization observation:
  // balanced bits maximize code entropy). v6 trains the threshold:
  // per-dim CORPUS MEDIAN via q24's percentile_disc (an actual data
  // value — bit-exact on both engines), so every bit splits the
  // corpus 50/50 by construction. Training = one 64·N explode into a
  // 64-cell sort-aggregate (the s5/s14 trained-artifact class — the
  // median vector is the deployment artifact you'd persist); encoding
  // = the median array broadcast as ONE row cross-joined into the
  // scan, bits from an O(64) in-row fold over two bounded arrays
  // (array indexing, NOT the t17 inlining trap — both operands are
  // real columns). s29 prices what balanced bits buy in recall.
  private def trainedSignFold(lo: Int, hi: Int): String =
    s"""aggregate(sequence($lo, $hi), cast(0 as bigint),
       |  (acc, i) -> acc + IF(element_at(vd, i) > element_at(medv, i),
       |    shiftleft(cast(1 as bigint), i - $lo), cast(0 as bigint)))"""
      .stripMargin

  /** (vec_id, sign_lo, sign_hi) median-thresholded codes — same
    * column names as [[signCodes]] so s20's hamming machinery applies
    * unchanged. */
  def trainedSignCodes(spark: SparkSession, dir: String): DataFrame = {
    val medv = graft.sources.Tables.load(spark, dir, "embeddings")
      .withColumn("vd", expr(VectorExprs.castDoubleExpr))
      .select(posexplode(col("vd")).as(Seq("d0", "x")))
      .groupBy((col("d0") + 1).as("d"))
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY x)").as("med"))
      .groupBy()
      .agg(expr("transform(sort_array(collect_list(struct(d, med))), p -> p.med)")
        .as("medv"))
    graft.sources.Tables.load(spark, dir, "embeddings")
      .withColumn("vd", expr(VectorExprs.castDoubleExpr))
      .crossJoin(broadcast(medv))
      .select(col("vec_id"),
        expr(trainedSignFold(1, 32)).as("sign_lo"),
        expr(trainedSignFold(33, 64)).as("sign_hi"))
  }

  def v6MedianSign(spark: SparkSession, dir: String): DataFrame =
    trainedSignCodes(spark, dir)
      .withColumn("n_pos",
        expr("bit_count(sign_lo) + bit_count(sign_hi)").cast("long"))
      .orderBy(col("vec_id"))

  /** DuckDB CTE `sc` mirroring [[trainedSignCodes]] (same terminal
    * name as [[signCte]], so the hamming oracle bodies chain onto
    * either code family unchanged). */
  val trainedSignCte: String = {
    def half(lo: Int) =
      s"""CAST(list_sum(list_transform(generate_series($lo, ${lo + 31}),
         |  i -> CASE WHEN vd[i] > medv[i] THEN (CAST(1 AS BIGINT) << (i - $lo))
         |            ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"""
        .stripMargin
    s"""dm AS (
       |  SELECT d, quantile_disc(x, 0.5) AS med FROM (
       |    SELECT d, vd[d] AS x FROM ef, generate_series(1, 64) g(d))
       |  GROUP BY d),
       |mv AS (SELECT list(med ORDER BY d) AS medv FROM dm),
       |sc AS (
       |  SELECT vec_id, ${half(1)} AS sign_lo, ${half(33)} AS sign_hi
       |  FROM ef, mv)""".stripMargin
  }

  lazy val v6Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |$trainedSignCte
       |SELECT vec_id, sign_lo, sign_hi,
       |  CAST(bit_count(sign_lo) + bit_count(sign_hi) AS BIGINT) AS n_pos
       |FROM sc ORDER BY vec_id""".stripMargin

  // ---- v7: per-dimension corpus statistics (the training diagnostic) ----
  // The profile read before choosing any vector transform: which
  // dims carry variance (JL/truncation keep-lists, s22's prefix
  // assumption), which are off-center (v6's median thresholds exist
  // because of these), which are dead. Exact integer power sums over
  // the micro-unit vectors (one 64·N explode, ONE map-side-combined
  // aggregate into 64 cells — the s5/s14/s28 relational shape), mean
  // and variance emitted as exact integer micro-units via q32's
  // fixed-shape arithmetic on DECIMAL(38,0)/HUGEINT — Σq² reaches
  // ~1e12·N, far past BIGINT at corpus scale.
  def v7DimStats(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.load(spark, dir, "embeddings")
      .withColumn("vd", expr(VectorExprs.castDoubleExpr))
      .select(posexplode(
        expr("transform(vd, x -> cast(round(x * 1000000) as bigint))"))
        .as(Seq("d0", "q")))
      .groupBy((col("d0") + 1).as("d"))
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(q as decimal(38,0))")).as("sx"),
        sum(expr("cast(q as decimal(38,0)) * cast(q as decimal(38,0))"))
          .as("sxx"))
      .select(col("d"), col("n"),
        expr("cast(sx div n as bigint)").as("mean_micro"),
        expr("cast((n * sxx - sx * sx) div (cast(n as decimal(38,0)) * n) as bigint)")
          .as("var_micro2"))
      .orderBy(col("d"))

  lazy val v7Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |q AS (
       |  SELECT d, CAST(round(vd[d] * 1000000) AS HUGEINT) AS q
       |  FROM ef, generate_series(1, 64) g(d)),
       |s AS (
       |  SELECT d, count(*) AS n, sum(q) AS sx, sum(q * q) AS sxx
       |  FROM q GROUP BY d)
       |SELECT CAST(d AS BIGINT) AS d, n,
       |  CAST(sx // n AS BIGINT) AS mean_micro,
       |  CAST((n * sxx - sx * sx) // (CAST(n AS HUGEINT) * n) AS BIGINT)
       |    AS var_micro2
       |FROM s ORDER BY d""".stripMargin

  // ---- v8: trained per-dimension min-max scalar quantization (SQ8) ----
  // The FAISS-SQ8 storage format: v7 profiled the per-dimension
  // distributions; v8 consumes that profile's (min, max) bounds as a
  // TRAINED artifact and stores each dimension in one byte —
  // code_d = floor((q_d - mn_d)·255 / (mx_d - mn_d)) over the exact
  // micro-unit integers, so codes, reconstruction and the error gauge
  // are all integer arithmetic (no float rounding to disagree on).
  // Train is one 64·N explode into 64 min/max cells (v7's map-side-
  // combined shape); encode is a broadcast of the 64-entry bounds +
  // one narrow in-row pass — the corpus never shuffles, 64 B/vector
  // (4x vs float32) at any scale. Dead dims (mx == mn) encode as 0.
  /** embeddings + (qv micro-units, broadcast mnv/mxv bounds, codes)
    * — cached: v8 gates it, s31 reconstructs from it. */
  def sqCodes(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "sq_codes") {
      val qm = graft.sources.Tables.load(spark, dir, "embeddings")
        .withColumn("vd", expr(VectorExprs.castDoubleExpr))
        .withColumn("qv",
          expr("transform(vd, x -> cast(round(x * 1000000) as bigint))"))
      val mm = qm
        .select(posexplode(col("qv")).as(Seq("d0", "q")))
        .groupBy((col("d0") + 1).as("d"))
        .agg(min(col("q")).as("mn"), max(col("q")).as("mx"))
        .groupBy()
        .agg(
          expr("transform(sort_array(collect_list(struct(d, mn))), p -> p.mn)")
            .as("mnv"),
          expr("transform(sort_array(collect_list(struct(d, mx))), p -> p.mx)")
            .as("mxv"))
      qm.crossJoin(broadcast(mm))
        .withColumn("codes", expr(
          """transform(sequence(1, 64), d -> CASE
            |  WHEN element_at(mxv, d) > element_at(mnv, d)
            |  THEN cast(((element_at(qv, d) - element_at(mnv, d)) * 255)
            |            div (element_at(mxv, d) - element_at(mnv, d)) as int)
            |  ELSE 0 END)""".stripMargin))
        .select(col("vec_id"), col("qv"), col("mnv"), col("mxv"), col("codes"))
    }

  /** Per-dimension reconstruction q̂_d = mn_d + code_d·(mx_d-mn_d)//255
    * (the decoder side of the same integer contract). */
  val sqReconExpr: String =
    """transform(sequence(1, 64), d ->
      |  element_at(mnv, d) + (cast(element_at(codes, d) as bigint)
      |    * (element_at(mxv, d) - element_at(mnv, d))) div 255)""".stripMargin

  def v8SqCodes(spark: SparkSession, dir: String): DataFrame =
    sqCodes(spark, dir)
      .select(col("vec_id"),
        element_at(col("codes"), 1).as("c1"), element_at(col("codes"), 2).as("c2"),
        element_at(col("codes"), 3).as("c3"), element_at(col("codes"), 4).as("c4"),
        expr("aggregate(codes, cast(0 as bigint), (a, x) -> a + x)")
          .as("code_sum"),
        expr(s"""aggregate(sequence(1, 64), cast(0 as bigint), (a, d) ->
          |  a + abs(element_at(qv, d) - element_at($sqReconExpr, d)))""".stripMargin)
          .as("err_micro"))
      .orderBy(col("vec_id"))

  /** DuckDB CTEs mirroring [[sqCodes]]: `qm` (micro-units), `mm`
    * (trained bounds), `sq` (codes + carried qv/mnv/mxv). */
  val sqCtes: String =
    """qm AS (
      |  SELECT vec_id, [CAST(round(x * 1000000) AS BIGINT) for x in vd] AS qv
      |  FROM ef),
      |ds AS (
      |  SELECT d, min(qv[d]) AS mn, max(qv[d]) AS mx
      |  FROM qm, generate_series(1, 64) g(d) GROUP BY d),
      |mm AS (SELECT list(mn ORDER BY d) AS mnv, list(mx ORDER BY d) AS mxv
      |       FROM ds),
      |sq AS (
      |  SELECT vec_id, qv, mnv, mxv,
      |    [CASE WHEN mxv[d] > mnv[d]
      |          THEN CAST(((qv[d] - mnv[d]) * 255) // (mxv[d] - mnv[d]) AS INTEGER)
      |          ELSE 0 END
      |     for d in generate_series(1, 64)] AS codes
      |  FROM qm, mm)""".stripMargin

  lazy val v8Sql: String =
    s"""WITH ${VectorExprs.embCtes},
       |$sqCtes
       |SELECT vec_id, codes[1] AS c1, codes[2] AS c2, codes[3] AS c3,
       |  codes[4] AS c4,
       |  CAST(list_sum(codes) AS BIGINT) AS code_sum,
       |  CAST(list_sum([abs(qv[d] - (mnv[d]
       |      + (CAST(codes[d] AS BIGINT) * (mxv[d] - mnv[d])) // 255))
       |    for d in generate_series(1, 64)]) AS BIGINT) AS err_micro
       |FROM sq ORDER BY vec_id""".stripMargin

  // ---- v9: residual scalar quantization (the IVF+SQ fine stage) ----
  // What a FAISS "IVF,SQ8" index actually stores: not the vector but
  // its RESIDUAL from the assigned coarse centroid, quantized — the
  // residual range per cluster is far narrower than the corpus range,
  // so the same 8 bits buy more precision than v8's global bounds.
  // Exactness trick: the true residual q − s/n is fractional, so we
  // quantize the n-SCALED residual r_d = n·q_d − Σq_d instead — pure
  // BIGINT arithmetic end to end (assignment reuses s5's trained
  // codebook; bounds are per-(cluster, dim) min/max of r). Train is
  // two map-side-combined explodes; encode is corpus ⋈ broadcast
  // (16-row) cluster stats — the corpus never shuffles beyond the
  // one assignment it already shares with s5/s17/d11 via DfCache.
  /** Per-vector scaled residuals + per-cluster trained bounds + codes
    * — cached; v9 gates it and a residual ADC path can consume it. */
  def residualCodes(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "residual_sq") {
      val sim = graft.operators.similarity.SimilarityOps
      val m = sim.embQuantized(spark, dir).select(col("vec_id"), col("qv"))
        .join(sim.trainedAssignment(spark, dir), Seq("vec_id"))
      val cells = m
        .select(col("cluster"), posexplode(col("qv")).as(Seq("d0", "q")))
        .groupBy(col("cluster"), col("d0"))
        .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
      val cstats = cells.groupBy(col("cluster"))
        .agg(expr("transform(sort_array(collect_list(struct(d0, s))), p -> p.s)")
          .as("sv"), max(col("n")).as("n"))
      val withR = m.join(broadcast(cstats), Seq("cluster"))
        .withColumn("rvv", expr(
          "transform(sequence(1, 64), d -> n * element_at(qv, d) - element_at(sv, d))"))
      val bounds = withR
        .select(col("cluster"), posexplode(col("rvv")).as(Seq("d0", "r")))
        .groupBy(col("cluster"), col("d0"))
        .agg(min(col("r")).as("mn"), max(col("r")).as("mx"))
        .groupBy(col("cluster"))
        .agg(expr("transform(sort_array(collect_list(struct(d0, mn))), p -> p.mn)")
          .as("rmnv"),
          expr("transform(sort_array(collect_list(struct(d0, mx))), p -> p.mx)")
            .as("rmxv"))
      withR.join(broadcast(bounds), Seq("cluster"))
        .withColumn("codes", expr(
          """transform(sequence(1, 64), d -> CASE
            |  WHEN element_at(rmxv, d) > element_at(rmnv, d)
            |  THEN cast(((element_at(rvv, d) - element_at(rmnv, d)) * 255)
            |            div (element_at(rmxv, d) - element_at(rmnv, d)) as int)
            |  ELSE 0 END)""".stripMargin))
        // sv/n ride along so the decode side (s35's asymmetric search)
        // can reconstruct micro-unit vectors: q̂ = (sv + r̂) div n
        .select(col("vec_id"), col("cluster"), col("rvv"),
          col("rmnv"), col("rmxv"), col("codes"), col("sv"), col("n"))
    }

  def v9ResidualCodes(spark: SparkSession, dir: String): DataFrame =
    residualCodes(spark, dir)
      .select(col("vec_id"), col("cluster"),
        element_at(col("codes"), 1).as("c1"), element_at(col("codes"), 2).as("c2"),
        element_at(col("codes"), 3).as("c3"), element_at(col("codes"), 4).as("c4"),
        expr("aggregate(codes, cast(0 as bigint), (a, x) -> a + x)")
          .as("code_sum"),
        expr("""aggregate(sequence(1, 64), cast(0 as bigint), (a, d) ->
          |  a + abs(element_at(rvv, d) - (element_at(rmnv, d)
          |    + (cast(element_at(codes, d) as bigint)
          |       * (element_at(rmxv, d) - element_at(rmnv, d))) div 255)))""".stripMargin)
          .as("err_scaled"))
      .orderBy(col("vec_id"))

  /** v9's oracle CTE chain through `rc` (vec_id, cluster, rvv, rmnv,
    * rmxv, codes) plus `nc` (cluster, n) and `sva` (cluster, sv) —
    * shared by v9Sql and s35's residual-ADC search oracle. */
  val residualCtes: String =
    s"""${graft.operators.similarity.SimilarityOps.assignCtes},
       |nc AS (SELECT cluster, count(*) AS n FROM a2 GROUP BY cluster),
       |svx AS (
       |  SELECT a2.cluster, g.d, CAST(sum(q.qv[g.d]) AS BIGINT) AS s
       |  FROM qv q JOIN a2 ON q.vec_id = a2.vec_id, generate_series(1, 64) g(d)
       |  GROUP BY 1, 2),
       |sva AS (SELECT cluster, list(s ORDER BY d) AS sv FROM svx GROUP BY cluster),
       |rx AS (
       |  SELECT q.vec_id, a2.cluster,
       |    [CAST(nc.n AS BIGINT) * q.qv[d] - sva.sv[d]
       |     for d in generate_series(1, 64)] AS rvv
       |  FROM qv q JOIN a2 ON q.vec_id = a2.vec_id
       |  JOIN nc ON a2.cluster = nc.cluster
       |  JOIN sva ON a2.cluster = sva.cluster),
       |bd AS (
       |  SELECT cluster, g.d, min(rvv[g.d]) AS mn, max(rvv[g.d]) AS mx
       |  FROM rx, generate_series(1, 64) g(d) GROUP BY 1, 2),
       |bda AS (SELECT cluster, list(mn ORDER BY d) AS rmnv,
       |               list(mx ORDER BY d) AS rmxv FROM bd GROUP BY cluster),
       |rc AS (
       |  SELECT rx.vec_id, rx.cluster, rx.rvv, bda.rmnv, bda.rmxv,
       |    [CASE WHEN bda.rmxv[d] > bda.rmnv[d]
       |          THEN CAST(((rx.rvv[d] - bda.rmnv[d]) * 255)
       |                    // (bda.rmxv[d] - bda.rmnv[d]) AS INTEGER)
       |          ELSE 0 END
       |     for d in generate_series(1, 64)] AS codes
       |  FROM rx JOIN bda USING (cluster))""".stripMargin

  lazy val v9Sql: String =
    s"""WITH $residualCtes
       |SELECT vec_id, cluster, codes[1] AS c1, codes[2] AS c2,
       |  codes[3] AS c3, codes[4] AS c4,
       |  CAST(list_sum(codes) AS BIGINT) AS code_sum,
       |  CAST(list_sum([abs(rvv[d] - (rmnv[d]
       |      + (CAST(codes[d] AS BIGINT) * (rmxv[d] - rmnv[d])) // 255))
       |    for d in generate_series(1, 64)]) AS BIGINT) AS err_scaled
       |FROM rc ORDER BY vec_id""".stripMargin

  // ---- v10: Matryoshka truncation profile (prefix-norm shares) ----
  // How much of each embedding's energy the first 16/32/48 dimensions
  // carry, in exact ppm — the measurement behind choosing a truncation
  // dim for Matryoshka-style retrieval (serve 16-d candidates, rerank
  // at 64-d: s22/s23's trade made quantitative per vector). Prefix
  // sums of squared micro-unit integers; the ppm ratio multiplies in
  // DECIMAL(38,0)/HUGEINT because 1e6·Σq² tops BIGINT (the q40
  // wide-integer posture). One narrow in-row pass, zero shuffle
  // before the output sort.
  private def prefixShare(k: Int): org.apache.spark.sql.Column =
    expr(s"""cast(1000000 * cast(aggregate(sequence(1, $k), cast(0 as bigint),
            |  (a, d) -> a + element_at(qv, d) * element_at(qv, d)) as decimal(38,0))
            |  div aggregate(sequence(1, 64), cast(0 as bigint),
            |  (a, d) -> a + element_at(qv, d) * element_at(qv, d)) as bigint)""".stripMargin)

  def v10Matryoshka(spark: SparkSession, dir: String): DataFrame =
    graft.operators.similarity.SimilarityOps.embQuantized(spark, dir)
      .select(col("vec_id"),
        prefixShare(16).as("share16_ppm"),
        prefixShare(32).as("share32_ppm"),
        prefixShare(48).as("share48_ppm"))
      .orderBy(col("vec_id"))

  lazy val v10Sql: String = {
    def duckShare(k: Int): String =
      s"""CAST(1000000 * CAST(list_sum([qv[d] * qv[d]
         |    for d in generate_series(1, $k)]) AS HUGEINT)
         |  // list_sum([qv[d] * qv[d] for d in generate_series(1, 64)])
         |  AS BIGINT)""".stripMargin
    s"""WITH ${VectorExprs.embCtes},
       |qm AS (
       |  SELECT vec_id, [CAST(round(x * 1000000) AS BIGINT) for x in vd] AS qv
       |  FROM ef)
       |SELECT vec_id,
       |  ${duckShare(16)} AS share16_ppm,
       |  ${duckShare(32)} AS share32_ppm,
       |  ${duckShare(48)} AS share48_ppm
       |FROM qm ORDER BY vec_id""".stripMargin
  }

  // ---- v11: ternary quantization ({−1, 0, +1} codes) ----
  // The sparsity point between v5's 1-bit signs (everything fires)
  // and v2's int8: dims with |x| below a per-dim threshold SNAP TO
  // ZERO — 1.58-bit codes whose dot products skip dead dims (the
  // BitNet-style trick, applied to embeddings). Threshold τ_d = half
  // the corpus mean |x_d|, tested entirely in integers over the
  // shared micro-unit features: 2N·q_d > Σ|q_d| (both sides exact
  // BIGINTs — no rational τ is ever materialized; at 1e9 vectors ×
  // 1e6 micro-units the products sit at ~1e15, well under 2^63).
  // One corpus pass builds the 64-cell threshold frame (map-side
  // combined, broadcast back), one narrow scan packs pos/neg masks —
  // the v5 two-halves convention — plus the n_zero sparsity gauge.
  private def ternMask(lo: Int, neg: Boolean): String = {
    val q = if (neg) "-element_at(qv, i)" else "element_at(qv, i)"
    s"""aggregate(sequence($lo, ${lo + 31}), cast(0 as bigint),
       |  (acc, i) -> acc + IF(2 * nv * $q > element_at(sarr, i),
       |    shiftleft(cast(1 as bigint), i - $lo), cast(0 as bigint)))"""
      .stripMargin
  }

  def v11TernaryQuantize(spark: SparkSession, dir: String): DataFrame = {
    val qv = graft.operators.similarity.SimilarityOps.embQuantized(spark, dir)
      .select(col("vec_id"), col("qv"))
    val thr = qv.select(posexplode(col("qv")).as(Seq("d0", "x")))
      .groupBy(col("d0")).agg(sum(abs(col("x"))).as("s"), count(lit(1)).as("n"))
      .groupBy()
      .agg(expr("transform(sort_array(collect_list(struct(d0, s))), p -> p.s)")
        .as("sarr"), max(col("n")).as("nv"))
    qv.crossJoin(broadcast(thr))
      .select(col("vec_id"),
        expr(ternMask(1, neg = false)).as("pos_lo"),
        expr(ternMask(33, neg = false)).as("pos_hi"),
        expr(ternMask(1, neg = true)).as("neg_lo"),
        expr(ternMask(33, neg = true)).as("neg_hi"))
      .withColumn("n_pos",
        expr("bit_count(pos_lo) + bit_count(pos_hi)").cast("long"))
      .withColumn("n_neg",
        expr("bit_count(neg_lo) + bit_count(neg_hi)").cast("long"))
      .withColumn("n_zero", lit(64L) - col("n_pos") - col("n_neg"))
      .orderBy(col("vec_id"))
  }

  lazy val v11Sql: String = {
    def mask(lo: Int, neg: Boolean) = {
      val q = if (neg) "-qm.qv[i]" else "qm.qv[i]"
      s"""CAST(list_sum(list_transform(generate_series($lo, ${lo + 31}),
         |  i -> CASE WHEN 2 * t.nv * $q > t.sarr[i]
         |       THEN (CAST(1 AS BIGINT) << (i - $lo)) ELSE CAST(0 AS BIGINT)
         |       END)) AS BIGINT)""".stripMargin
    }
    s"""WITH ${VectorExprs.embCtes},
       |qm AS (
       |  SELECT vec_id, [CAST(round(x * 1000000) AS BIGINT) for x in vd] AS qv
       |  FROM ef),
       |th AS (
       |  SELECT d, sum(abs(qv[d])) AS s, count(*) AS n
       |  FROM qm, generate_series(1, 64) g(d) GROUP BY d),
       |t AS (SELECT list(s ORDER BY d) AS sarr, max(n) AS nv FROM th)
       |SELECT qm.vec_id,
       |  ${mask(1, neg = false)} AS pos_lo,
       |  ${mask(33, neg = false)} AS pos_hi,
       |  ${mask(1, neg = true)} AS neg_lo,
       |  ${mask(33, neg = true)} AS neg_hi,
       |  CAST(bit_count(${mask(1, neg = false)})
       |     + bit_count(${mask(33, neg = false)}) AS BIGINT) AS n_pos,
       |  CAST(bit_count(${mask(1, neg = true)})
       |     + bit_count(${mask(33, neg = true)}) AS BIGINT) AS n_neg,
       |  64 - CAST(bit_count(${mask(1, neg = false)})
       |          + bit_count(${mask(33, neg = false)}) AS BIGINT)
       |     - CAST(bit_count(${mask(1, neg = true)})
       |          + bit_count(${mask(33, neg = true)}) AS BIGINT) AS n_zero
       |FROM qm CROSS JOIN t ORDER BY vec_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v12_sdc_tables" -> (v12SdcTables _),
    "v13_bit_balance" -> (v13BitBalance _),
    "v14_code_histogram" -> (v14CodeHistogram _),
    "v15_quant_distortion" -> (v15QuantDistortion _),
    "v16_rotation_check" -> (v16RotationCheck _),
    "v17_alloc_balance" -> (v17AllocBalance _),
    "v11_ternary_quantize" -> (v11TernaryQuantize _),
    "v10_matryoshka" -> (v10Matryoshka _),
    "v9_residual_codes" -> (v9ResidualCodes _),
    "v8_sq_codes" -> (v8SqCodes _),
    "v7_dim_stats" -> (v7DimStats _),
    "v6_median_sign" -> (v6MedianSign _),
    "v5_sign_quantize" -> (v5SignQuantize _),
    "v4_pq_codes" -> (v4PqCodes _),
    "v1_l2_normalize" -> (v1L2Normalize _),
    "v2_int8_quantize" -> (v2Int8Quantize _),
    "v3_random_projection" -> (v3RandomProjection _))

  val oracles: Map[String, String] = Map(
    "v12_sdc_tables" -> v12Sql,
    "v13_bit_balance" -> v13Sql,
    "v14_code_histogram" -> v14Sql,
    "v15_quant_distortion" -> v15Sql,
    "v16_rotation_check" -> v16Sql,
    "v17_alloc_balance" -> v17Sql,
    "v11_ternary_quantize" -> v11Sql,
    "v10_matryoshka" -> v10Sql,
    "v9_residual_codes" -> v9Sql,
    "v8_sq_codes" -> v8Sql,
    "v7_dim_stats" -> v7Sql,
    "v6_median_sign" -> v6Sql,
    "v5_sign_quantize" -> v5Sql,
    "v4_pq_codes" -> v4Sql,
    "v1_l2_normalize" -> v1Sql,
    "v2_int8_quantize" -> v2Sql,
    "v3_random_projection" -> v3Sql)
}
