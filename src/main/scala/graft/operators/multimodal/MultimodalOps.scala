package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal plumbing: opaque `binary` payload columns with typed
  * metadata, processed without ever collecting to the driver.
  *
  * The GATED entries decode with a clearly-marked deterministic fake
  * ([[FakeDecoder]]) so every result stays DuckDB-oracle-checkable;
  * a REAL image codec ([[ImageIoDecoder]], pure-JRE javax.imageio)
  * sits behind the same seam and is spec-proven on actual PNG bytes.
  * Audio/video stay stubbed (no native codecs in the container).
  * Everything around the seam — schema, per-partition batching,
  * feature-vector shape, partition-preserving execution — is the real
  * plumbing a decode UDF runs in at 100 TB (swap the decoder and
  * nothing else changes).
  */
object MultimodalOps {

  /** The decoder SEAM: a real codec (JNI wrapper, ffmpeg binding,
    * image library) implements this one trait and drops into the same
    * `mapPartitions` batch shape — m2..m23 never name a concrete
    * decoder, so swapping implementations touches zero operator code.
    * Must be Serializable: instances ship to executors inside the
    * mapPartitions closure. */
  trait MediaDecoder extends Serializable {
    /** Fixed output width — the schema contract of the feature column. */
    def featureDim: Int
    /** Decode one payload into a `featureDim`-length feature vector.
      * Called once per record inside a per-partition iterator, so an
      * implementation may hold per-partition native state via lazy
      * fields (initialized once per executor-task). */
    def decode(payload: Array[Byte]): Array[Float]
  }

  /** Stand-in for a real media decoder (STUB: the real system would
    * decode image/audio bytes; this produces a deterministic
    * byte-histogram "feature" so results are oracle-checkable). */
  object FakeDecoder extends MediaDecoder {
    val FeatureDim = 8
    def featureDim: Int = FeatureDim
    def decode(payload: Array[Byte]): Array[Float] = {
      val hist = new Array[Int](FeatureDim)
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xff) % FeatureDim) += 1
        i += 1
      }
      val n = math.max(payload.length, 1).toFloat
      hist.map(_ / n)
    }
  }

  /** A REAL codec behind the seam (r12 verdict #7): `javax.imageio`
    * ships with the JRE (PNG/JPEG/GIF/BMP readers), so the
    * container's no-native-codec constraint does not block IMAGE
    * decode — only audio/video stay stubbed. Features are
    * deterministic scalar image statistics in [0,1]:
    * f0–f2 mean R/G/B, f3 mean luma (BT.601), f4 luma stddev,
    * f5 aspect w/(w+h), f6 log2-scaled pixel count, f7 fraction of
    * pixels at/above mid luma. An undecodable payload (not an image,
    * truncated, unsupported container) returns the all −1 sentinel —
    * real features always lie in [0,1], so a downstream media gate
    * filters on `f0 < 0` without a side channel. One pass over
    * pixels, nothing stored, safe for arbitrarily large frames inside
    * the per-partition iterator. */
  object ImageIoDecoder extends MediaDecoder {
    val FeatureDim = 8
    def featureDim: Int = FeatureDim
    def decode(payload: Array[Byte]): Array[Float] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: Exception => null }
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0)
        Array.fill(FeatureDim)(-1.0f)
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sr = 0.0; var sg = 0.0; var sb = 0.0; var sy = 0.0; var syy = 0.0
        var bright = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            val lum = 0.299 * r + 0.587 * g + 0.114 * b
            sr += r; sg += g; sb += b; sy += lum; syy += lum * lum
            if (lum >= 128.0) bright += 1
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val my = sy / n
        val vy = math.max(0.0, syy / n - my * my)
        Array((sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat,
          (sb / n / 255.0).toFloat, (my / 255.0).toFloat,
          (math.sqrt(vy) / 255.0).toFloat,
          (w.toDouble / (w + h)).toFloat,
          (math.min(32.0, math.log(1.0 + n.toDouble) / math.log(2.0)) / 32.0).toFloat,
          (bright.toDouble / n).toFloat)
      }
    }
  }

  /** documents + synthesized binary payload (utf-8 bytes of `text`) —
    * the shape a real corpus with media columns would have. */
  def withBlob(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("payload", col("text").cast("binary"))

  // ---- m1: per-source byte stats over the binary column ----
  def m1BlobStats(spark: SparkSession, dir: String): DataFrame =
    withBlob(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_blobs"),
        sum(octet_length(col("payload"))).as("total_bytes"),
        min(octet_length(col("payload"))).as("min_bytes"),
        max(octet_length(col("payload"))).as("max_bytes"))
      .orderBy(col("source"))

  lazy val m1Sql: String =
    """SELECT source, count(*) AS n_blobs,
      |  CAST(sum(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
      |  min(octet_length(CAST(text AS BLOB))) AS min_bytes,
      |  max(octet_length(CAST(text AS BLOB))) AS max_bytes
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** One decoded record: doc + fixed-size feature vector. */
  case class DecodedFeatures(doc_id: Long, n_bytes: Int, features: Array[Float])

  // ---- m2: decode -> feature-extract via typed mapPartitions ----
  // The decode loop runs once per partition over an iterator (the
  // batch shape a vectorized decoder needs); no shuffle is introduced
  // and the scan only reads (doc_id, text). The byte-histogram fake
  // decode IS SQL-expressible (per-byte unnest in the oracle), so m2
  // is fully hash-gated like every other entry.
  def m2FeatureExtract(spark: SparkSession, dir: String): DataFrame =
    m2FeatureExtract(spark, dir, FakeDecoder)

  /** Decoder-parametric form: the gated entry binds [[FakeDecoder]];
    * a deployment with real codecs passes its own [[MediaDecoder]]
    * and the plan/schema/batch shape are identical. */
  /** The decode stage itself, decoder-parametric over ANY payload
    * set — m2 binds the documents blob; a media corpus (or a spec
    * feeding real PNG bytes) binds its own. Partition-preserving,
    * no shuffle. */
  def decodeFeatures(src: Dataset[(Long, Array[Byte])],
      decoder: MediaDecoder): Dataset[DecodedFeatures] = {
    import src.sparkSession.implicits._
    src.mapPartitions { it =>
      it.map { case (id, payload) =>
        DecodedFeatures(id, payload.length, decoder.decode(payload))
      }
    }
  }

  def m2FeatureExtract(spark: SparkSession, dir: String,
      decoder: MediaDecoder): DataFrame = {
    import spark.implicits._
    val src: Dataset[(Long, Array[Byte])] = withBlob(spark, dir)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
    decodeFeatures(src, decoder).toDF()
      .select(col("doc_id"), col("n_bytes"),
        round(element_at(col("features"), 1).cast("double"), 6).as("f0"),
        round(element_at(col("features"), 2).cast("double"), 6).as("f1"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for m2: recompute the byte-histogram decode per
    * byte (documents text is ASCII, so `ascii(substring(...))` == the
    * payload byte), divide in FLOAT to mirror the decoder's float32
    * arithmetic (IEEE-identical on both engines), then round the
    * widened double exactly like the Spark side. */
  lazy val m2Sql: String =
    """WITH h AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN ascii(substring(text, i, 1)) % 8 = 0 THEN 1 ELSE 0 END) AS INTEGER) AS h0,
      |    CAST(sum(CASE WHEN ascii(substring(text, i, 1)) % 8 = 1 THEN 1 ELSE 0 END) AS INTEGER) AS h1
      |  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i FROM documents) b
      |  GROUP BY doc_id)
      |SELECT d.doc_id,
      |  CAST(octet_length(CAST(d.text AS BLOB)) AS INTEGER) AS n_bytes,
      |  round(CAST(CAST(COALESCE(h.h0, 0) AS FLOAT) / CAST(greatest(length(d.text), 1) AS FLOAT) AS DOUBLE), 6) AS f0,
      |  round(CAST(CAST(COALESCE(h.h1, 0) AS FLOAT) / CAST(greatest(length(d.text), 1) AS FLOAT) AS DOUBLE), 6) AS f1
      |FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // ---- m3: frame sampling over a "video" payload ----
  // Treat the payload as fixed-size frames (32 units) and sample every
  // 4th frame: offsets computed columnar (sequence + explode — one
  // narrow codegen'd stage, frames per row bounded by payload size),
  // slice + fingerprint per sampled frame. This is the frame-sample
  // plumbing of a video pipeline: swap the substring+md5 for a
  // keyframe decode over byte ranges and the plan is unchanged. Text
  // payloads are ASCII here, so character offsets = byte offsets and
  // the md5-of-utf8 fingerprint is engine-independent.
  private val FrameLen = 32
  private val FrameStride = 4

  def m3FrameSample(spark: SparkSession, dir: String): DataFrame =
    withBlob(spark, dir)
      .withColumn("n_frames", floor(length(col("text")) / FrameLen))
      .filter(col("n_frames") >= 1)
      .select(col("doc_id"), col("text"),
        explode(expr(s"sequence(0, n_frames - 1, $FrameStride)")).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * FrameLen).as("frame_off"),
        expr(s"md5(substring(text, cast(frame_idx * $FrameLen + 1 as int), $FrameLen))")
          .as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))

  lazy val m3Sql: String =
    s"""WITH f AS (
       |  SELECT doc_id, text, CAST(floor(length(text) / $FrameLen) AS BIGINT) AS n_frames
       |  FROM documents WHERE length(text) >= $FrameLen),
       |frames AS (
       |  SELECT doc_id, text,
       |    unnest(range(0, n_frames, $FrameStride)) AS frame_idx
       |  FROM f)
       |SELECT doc_id, frame_idx, frame_idx * $FrameLen AS frame_off,
       |  md5(substring(text, CAST(frame_idx * $FrameLen + 1 AS INTEGER), $FrameLen)) AS frame_md5
       |FROM frames ORDER BY doc_id, frame_idx""".stripMargin

  // ---- m4: resize (block-average downsample) over the payload ----
  // The resize step of an image pipeline, on the 1-D byte payload: a
  // 4:1 block-average (each output unit = integer mean of 4 input
  // bytes — the box filter a real resize kernel generalizes), then a
  // polynomial fingerprint of the resized signal. Fully columnar —
  // one narrow codegen'd scan, sequence/transform/aggregate over byte
  // offsets, zero shuffle; swap the ascii-block mean for a pixel-block
  // kernel over decoded rows and the plan is unchanged. All indexing
  // AND sizing is in CHARACTER units (`length(text)`, substring
  // offsets) — r5 advice: the earlier octet_length-based n_out mixed
  // byte sizing with character indexing, which two engines would
  // miscount identically on non-ASCII text and the gate could never
  // catch; one unit end-to-end removes the ASCII assumption from the
  // arithmetic entirely. All arithmetic is integer → bit-exact.
  private val ResizeFactor = 4

  def m4Resize(spark: SparkSession, dir: String): DataFrame = {
    val f = ResizeFactor
    val blockMean = (0 until f)
      .map(o => s"ascii(substring(text, cast(b * $f + $o + 1 as int), 1))")
      .mkString("(", " + ", s") DIV $f")
    withBlob(spark, dir)
      .withColumn("n_out", floor(length(col("text")) / f).cast("long"))
      .filter(col("n_out") >= 1)
      .select(col("doc_id"), col("n_out"),
        expr(s"""aggregate(
                |  transform(sequence(0, cast(n_out - 1 as int)), b -> $blockMean),
                |  cast(0 as bigint),
                |  (acc, x) -> (acc*1000003 + x) % 2147483647)""".stripMargin)
          .as("resized_fp"))
      .orderBy(col("doc_id"))
  }

  lazy val m4Sql: String = {
    val f = ResizeFactor
    val blockMean = (0 until f)
      .map(o => s"ascii(substr(text, b * $f + $o + 1, 1))")
      .mkString("(", " + ", s") // $f")
    s"""WITH sized AS (
       |  SELECT doc_id, text,
       |    CAST(floor(length(text) / $f) AS BIGINT) AS n_out
       |  FROM documents
       |  WHERE length(text) >= $f)
       |SELECT doc_id, n_out,
       |  list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(generate_series(0, CAST(n_out - 1 AS INTEGER)),
       |                     b -> CAST($blockMean AS BIGINT))),
       |    (acc, x) -> (acc*1000003 + x) % 2147483647) AS resized_fp
       |FROM sized ORDER BY doc_id""".stripMargin
  }

  // ---- m5: perceptual hash (aHash) + hamming near-dup pairs ----
  // The image-dedup step of a multimodal pipeline: a 64-bit
  // average-hash over the payload — split the signal into 64 blocks,
  // bit b = 1 iff block b's mean exceeds the global mean — then
  // near-dup pairs by hamming distance. A real pipeline runs this
  // over decoded 8×8 luma grids; here the blocks are character runs
  // of the payload (the m4 convention: character units end-to-end),
  // and swapping in a pixel decode changes only the block expression.
  // The mean comparison is cross-multiplied (block_sum·n >
  // total·block_len) so everything stays integer-exact, and the hash
  // is stored as two 32-bit halves (the d3 convention — no sign-bit
  // games at bit 63 on either engine).
  //
  // Pair generation is the d3 machinery verbatim: 4 × 16-bit chunk
  // buckets ([[graft.util.Buckets.cap]] bounds degenerate buckets),
  // then two codegen'd bit_count(xor) verify each candidate — never
  // an all-pairs join. Pigeonhole over 4 chunks GUARANTEES recall
  // only for hamming ≤ 3; at HamMax 16 the chunk buckets are an
  // honest partial-recall candidate generator (d5's banded-LSH
  // class — and like d5, d8's gauge pattern is how you'd measure the
  // miss rate). HamMax is set from the measured pair-distance
  // distribution of the corpus (nearest non-identical aHash pair sits
  // at hamming 9 at gate scale — global char statistics separate even
  // near-dup texts); real 8×8 luma aHash pairs cluster much tighter,
  // so a pixel pipeline would run HamMax ~5 with the same plan.
  // Everything after the one O(payload) hash scan is bounded by
  // bucket population. 100 TB-safe by the same argument as d3.
  private val AHashBlocks = 64
  private val AHashHamMax = 16
  private val AHashMaxBucket = 200

  /** (doc_id, ah_lo, ah_hi): the 64-bit average-hash as two 32-bit
    * halves.
    *
    * Built RELATIONALLY — explode to one row per character, then two
    * map-side-combined aggregates — NOT as one nested fold expression
    * per doc: a single expression computing all 64 block means forces
    * Catalyst's CollapseProject to inline the per-block fold into
    * every downstream bit lookup (64 bits × 64 blocks × O(n) chars =
    * an interpreted 10^8-op row — measured wedged at sf0.001). The
    * exploded form keeps every step inside whole-stage codegen, the
    * combiners collapse each doc's chars before any exchange, and the
    * per-doc window below ranks exactly 64 block rows — bounded by
    * AHashBlocks, never by payload size.
    *
    * Block b covers chars (b·n) DIV nb + 1 .. ((b+1)·n) DIV nb; the
    * per-char inverse is b = (j·nb − 1) DIV n (same boundaries —
    * j ≤ (b+1)·n DIV nb ⟺ ⌈j·nb/n⌉ ≤ b+1). The payload is split to a
    * char array ONCE (O(n)) and posexploded — per-position
    * `substring(text, j, 1)` would re-scan UTF8 bytes to position j,
    * an O(n²/doc) hash build (measured ~25s at sf0.1 vs ~4s for the
    * split form). */
  def aHashes(spark: SparkSession, dir: String): DataFrame =
    aHashesOf(withBlob(spark, dir))

  /** The hash build over any (doc_id, text) frame — factored for
    * specs with known-identical payloads. */
  def aHashesOf(d: DataFrame): DataFrame = {
    val nb = AHashBlocks
    val perChar = d
      .withColumn("n", length(col("text")).cast("long"))
      .filter(col("n") >= nb)
      .select(col("doc_id"), col("n"),
        posexplode(split(col("text"), "")).as(Seq("p", "ch")))
      .select(col("doc_id"), col("n"),
        expr(s"((p + 1) * $nb - 1) div n").as("b"),
        expr("cast(ascii(ch) as bigint)").as("code"))
    val g = perChar.groupBy(col("doc_id"), col("n"), col("b"))
      .agg(sum(col("code")).as("bsum"), count(lit(1)).as("blen"))
    val dw = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    g.withColumn("total", sum(col("bsum")).over(dw))
      .withColumn("bit",
        (col("bsum") * col("n") > col("total") * col("blen")).cast("long"))
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("b") < 32,
          col("bit") * expr("shiftleft(cast(1 as bigint), cast(b as int))"))
          .otherwise(lit(0L))).as("ah_lo"),
        sum(when(col("b") >= 32,
          col("bit") * expr("shiftleft(cast(1 as bigint), cast(b as int) - 32)"))
          .otherwise(lit(0L))).as("ah_hi"))
  }

  def m5AHashDup(spark: SparkSession, dir: String): DataFrame = {
    val chunks = aHashes(spark, dir)
      .withColumn("chunks", expr(
        """array(ah_lo % 65536, ah_lo div 65536,
          |      ah_hi % 65536, ah_hi div 65536)""".stripMargin))
      .select(col("doc_id"), col("ah_lo"), col("ah_hi"),
        posexplode(col("chunks")).as(Seq("cpos", "cval")))
    val s = graft.util.Buckets.cap(chunks, Seq("cpos", "cval"), AHashMaxBucket)
    s.as("x").join(s.as("y"),
        col("x.cpos") === col("y.cpos") && col("x.cval") === col("y.cval")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        (expr("bit_count(x.ah_lo ^ y.ah_lo)")
          + expr("bit_count(x.ah_hi ^ y.ah_hi)")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= AHashHamMax)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** DuckDB CTEs mirroring [[aHashes]] (view `ah`: doc_id, ah_lo,
    * ah_hi) — shared by m5's pair oracle and m8's recall gauge. */
  private lazy val aHashSqlCtes: String = {
    val nb = AHashBlocks
    s"""sized AS (
       |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
       |  FROM documents WHERE length(text) >= $nb),
       |jx AS (
       |  SELECT doc_id, n, text, unnest(generate_series(1, n)) AS j
       |  FROM sized),
       |chars AS (
       |  SELECT doc_id, n, (j * $nb - 1) // n AS b,
       |    CAST(ascii(substr(text, CAST(j AS INTEGER), 1)) AS BIGINT) AS code
       |  FROM jx),
       |blk AS (
       |  SELECT doc_id, n, b, CAST(sum(code) AS BIGINT) AS bsum,
       |    count(*) AS blen
       |  FROM chars GROUP BY doc_id, n, b),
       |tot AS (
       |  SELECT doc_id, n, b, bsum, blen,
       |    CAST(sum(bsum) OVER (PARTITION BY doc_id) AS BIGINT) AS total
       |  FROM blk),
       |ah AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN b < 32 AND bsum * n > total * blen
       |                  THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER)
       |                  ELSE 0 END) AS BIGINT) AS ah_lo,
       |    CAST(sum(CASE WHEN b >= 32 AND bsum * n > total * blen
       |                  THEN CAST(1 AS BIGINT) << (CAST(b AS INTEGER) - 32)
       |                  ELSE 0 END) AS BIGINT) AS ah_hi
       |  FROM tot GROUP BY doc_id)""".stripMargin
  }

  /** DuckDB CTEs for m5's capped chunk-bucket candidate pass over
    * `ah` (view `m5pairs`: the verified hamming-≤-max pair set). */
  private lazy val aHashPairSqlCtes: String =
    s"""chunks0 AS (
       |  SELECT doc_id, ah_lo, ah_hi, c AS cpos,
       |    CASE c WHEN 0 THEN ah_lo % 65536 WHEN 1 THEN ah_lo // 65536
       |           WHEN 2 THEN ah_hi % 65536 ELSE ah_hi // 65536 END AS cval
       |  FROM ah, generate_series(0, 3) g(c)),
       |ok_chunks AS (
       |  SELECT cpos, cval FROM chunks0 GROUP BY cpos, cval
       |  HAVING count(*) <= $AHashMaxBucket),
       |chunks AS (SELECT c.* FROM chunks0 c JOIN ok_chunks USING (cpos, cval)),
       |m5pairs AS (
       |  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |    bit_count(xor(x.ah_lo, y.ah_lo)) + bit_count(xor(x.ah_hi, y.ah_hi)) AS hamming
       |  FROM chunks x JOIN chunks y
       |    ON x.cpos = y.cpos AND x.cval = y.cval AND x.doc_id < y.doc_id
       |  WHERE bit_count(xor(x.ah_lo, y.ah_lo)) + bit_count(xor(x.ah_hi, y.ah_hi))
       |        <= $AHashHamMax)""".stripMargin

  lazy val m5Sql: String =
    s"""WITH $aHashSqlCtes,
       |$aHashPairSqlCtes
       |SELECT doc_a, doc_b, hamming FROM m5pairs
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---- m6: shot-boundary detection over the "video" payload ----
  // The temporal-segmentation step of a video pipeline: per
  // consecutive frame pair, an intensity delta; a boundary wherever
  // the delta jumps. Real pipelines diff decoded luma histograms —
  // here the frame signal is the integer char-code sum over the m3
  // frame convention (32-unit frames, complete frames only), so the
  // whole gate is integer-exact and swapping in a decoded histogram
  // changes only the per-frame signal expression. Build: ONE char
  // split + posexplode (the m5 lesson — never per-position
  // substring), map-side-combined per-frame sums, then a per-doc
  // window whose partition is bounded by payload/32 rows (the m3/m5
  // bounded-window class, grows with the doc, not the corpus).
  // Boundary rule |Δ| > ShotDelta is absolute-integer; n_shots =
  // 1 + boundaries.
  private val ShotFrameLen = 32
  private val ShotDelta = 160  // mean char delta > 5 over a 32-frame

  /** Per-(doc, frame) integer intensity sums over the m3/m6 32-unit
    * frame convention — the shared signal table of the temporal
    * operators (m6 shot detection diffs it, m7 silence detection
    * thresholds it). One char split + posexplode (the m5 lesson),
    * one map-side-combined aggregate. */
  private def frameSums(spark: SparkSession, dir: String,
      minFrames: Int): DataFrame = {
    val fl = ShotFrameLen
    withBlob(spark, dir)
      .withColumn("nf", (length(col("text")) / fl).cast("long"))
      .filter(col("nf") >= minFrames)
      .select(col("doc_id"), col("nf"),
        posexplode(split(col("text"), "")).as(Seq("p", "ch")))
      .filter(col("p") < col("nf") * fl)
      .select(col("doc_id"), col("nf"),
        expr(s"p div $fl").as("frame"),
        expr("cast(ascii(ch) as bigint)").as("code"))
      .groupBy(col("doc_id"), col("nf"), col("frame"))
      .agg(sum(col("code")).as("fsum"))
  }

  // ---- m22: shot-length census (cut cadence over the corpus) ----
  // The distribution m6's per-doc boundary count can't show: HOW LONG
  // shots run between cuts, corpus-wide — the number that sets chunk
  // granularity for clip extraction (a corpus of 3-frame shots needs
  // different chunking than one of 300-frame takes) and flags
  // strobe-cut content (mass at length 1). Shots form by the m6 rule
  // (first frame opens a shot; |Δ| > ShotDelta opens another), shot
  // ids by running sum inside the same doc-bounded window m6 already
  // pays, lengths by one re-aggregation, and the histogram is a
  // bounded-domain rollup. Output |distinct lengths| rows.
  def m22SceneLengths(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame"))
    frameSums(spark, dir, minFrames = 2)
      .withColumn("delta", abs(col("fsum") - lag(col("fsum"), 1).over(w)))
      .withColumn("nb",
        when(col("delta").isNull || col("delta") > ShotDelta, 1L).otherwise(0L))
      .withColumn("shot", sum(col("nb")).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("shot")).agg(count(lit(1)).as("len"))
      .groupBy(col("len").as("shot_len"))
      .agg(count(lit(1)).as("n_shots"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("shot_len"))
  }

  lazy val m22Sql: String =
    s"""WITH f AS (
       |  SELECT doc_id, CAST(length(text) // $ShotFrameLen AS BIGINT) AS nf, text
       |  FROM documents WHERE length(text) >= ${2 * ShotFrameLen}),
       |pc AS (
       |  SELECT doc_id, nf, (i - 1) // $ShotFrameLen AS frame,
       |    CAST(ascii(substring(text, i, 1)) AS BIGINT) AS code
       |  FROM (SELECT doc_id, nf, text, unnest(range(1, CAST(nf * $ShotFrameLen AS INTEGER) + 1)) AS i
       |        FROM f) b),
       |fs AS (SELECT doc_id, nf, frame, sum(code) AS fsum
       |       FROM pc GROUP BY 1, 2, 3),
       |d AS (SELECT doc_id, frame,
       |        CASE WHEN lag(fsum) OVER (PARTITION BY doc_id ORDER BY frame)
       |               IS NULL
       |             OR abs(fsum - lag(fsum) OVER (PARTITION BY doc_id
       |               ORDER BY frame)) > $ShotDelta
       |        THEN 1 ELSE 0 END AS nb
       |      FROM fs),
       |sid AS (SELECT doc_id, sum(nb) OVER (PARTITION BY doc_id
       |          ORDER BY frame ROWS UNBOUNDED PRECEDING) AS shot
       |        FROM d),
       |sl AS (SELECT doc_id, shot, count(*) AS len FROM sid GROUP BY 1, 2)
       |SELECT len AS shot_len, count(*) AS n_shots,
       |  count(DISTINCT doc_id) AS n_docs
       |FROM sl GROUP BY len ORDER BY shot_len""".stripMargin

  def m6ShotDetect(spark: SparkSession, dir: String): DataFrame = {
    val fsums = frameSums(spark, dir, minFrames = 2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame"))
    fsums
      .withColumn("delta", abs(col("fsum") - lag(col("fsum"), 1).over(w)))
      .groupBy(col("doc_id"), col("nf"))
      .agg(sum(when(col("delta") > ShotDelta, 1L).otherwise(0L)).as("n_bounds"),
        max(col("delta")).as("max_delta"))
      .select(col("doc_id"), col("nf").as("n_frames"),
        (col("n_bounds") + 1).as("n_shots"), col("max_delta"))
      .orderBy(col("doc_id"))
  }

  lazy val m6Sql: String =
    s"""WITH f AS (
       |  SELECT doc_id, CAST(length(text) // $ShotFrameLen AS BIGINT) AS nf, text
       |  FROM documents WHERE length(text) >= ${2 * ShotFrameLen}),
       |pc AS (
       |  SELECT doc_id, nf, (i - 1) // $ShotFrameLen AS frame,
       |    CAST(ascii(substring(text, i, 1)) AS BIGINT) AS code
       |  FROM (SELECT doc_id, nf, text, unnest(range(1, CAST(nf * $ShotFrameLen AS INTEGER) + 1)) AS i
       |        FROM f) b),
       |fs AS (SELECT doc_id, nf, frame, sum(code) AS fsum
       |       FROM pc GROUP BY 1, 2, 3),
       |d AS (SELECT doc_id, nf,
       |        abs(fsum - lag(fsum) OVER (PARTITION BY doc_id ORDER BY frame)) AS delta
       |      FROM fs)
       |SELECT doc_id, nf AS n_frames,
       |  CAST(sum(CASE WHEN delta > $ShotDelta THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_shots,
       |  CAST(max(delta) AS BIGINT) AS max_delta
       |FROM d GROUP BY doc_id, nf ORDER BY doc_id""".stripMargin

  // ---- m20: A/V alignment — cuts landing on silence ----
  // The chaptering heuristic video pipelines run after m6+m7: a shot
  // boundary that coincides with a low-energy frame is a NATURAL
  // break (scene change over silence — safe to cut, splice, or
  // chapter there); a boundary inside loud audio is mid-action. Per
  // doc: boundary count (m6's |Δ| rule), silent-frame count (m7's
  // cross-multiplied below-mean rule) and how many boundaries land
  // ON silent frames — both signals read off ONE shared frameSums
  // pass and two windows in the same bounded per-doc partition
  // (payload/32 rows — the m3/m5/m6 class, grows with the doc, not
  // the corpus), so the composite costs no more than either parent.
  // All-integer gate; swap in decoded luma/RMS and only the signal
  // expression changes.
  def m20AvSync(spark: SparkSession, dir: String): DataFrame = {
    val fsums = frameSums(spark, dir, minFrames = 2)
    val wd = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val wo = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame"))
    fsums
      .withColumn("total", sum(col("fsum")).over(wd))
      .withColumn("delta", abs(col("fsum") - lag(col("fsum"), 1).over(wo)))
      .withColumn("silent", col("fsum") * col("nf") < col("total"))
      .withColumn("bound", col("delta") > ShotDelta)
      .groupBy(col("doc_id"), col("nf"))
      .agg(sum(when(col("bound"), 1L).otherwise(0L)).as("n_bounds"),
        sum(when(col("silent"), 1L).otherwise(0L)).as("n_silent"),
        sum(when(col("bound") && col("silent"), 1L).otherwise(0L))
          .as("n_aligned"))
      .select(col("doc_id"), col("nf").as("n_frames"),
        col("n_bounds"), col("n_silent"), col("n_aligned"))
      .orderBy(col("doc_id"))
  }

  lazy val m20Sql: String =
    s"""WITH f AS (
       |  SELECT doc_id, CAST(length(text) // $ShotFrameLen AS BIGINT) AS nf, text
       |  FROM documents WHERE length(text) >= ${2 * ShotFrameLen}),
       |pc AS (
       |  SELECT doc_id, nf, (i - 1) // $ShotFrameLen AS frame,
       |    CAST(ascii(substring(text, i, 1)) AS BIGINT) AS code
       |  FROM (SELECT doc_id, nf, text, unnest(range(1, CAST(nf * $ShotFrameLen AS INTEGER) + 1)) AS i
       |        FROM f) b),
       |fs AS (SELECT doc_id, nf, frame, sum(code) AS fsum
       |       FROM pc GROUP BY 1, 2, 3),
       |x AS (SELECT doc_id, nf, fsum,
       |        sum(fsum) OVER (PARTITION BY doc_id) AS total,
       |        abs(fsum - lag(fsum) OVER (PARTITION BY doc_id ORDER BY frame)) AS delta
       |      FROM fs)
       |SELECT doc_id, nf AS n_frames,
       |  CAST(sum(CASE WHEN delta > $ShotDelta THEN 1 ELSE 0 END) AS BIGINT) AS n_bounds,
       |  CAST(sum(CASE WHEN fsum * nf < total THEN 1 ELSE 0 END) AS BIGINT) AS n_silent,
       |  CAST(sum(CASE WHEN delta > $ShotDelta AND fsum * nf < total
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_aligned
       |FROM x GROUP BY doc_id, nf ORDER BY doc_id""".stripMargin

  // ---- m21: freeze-frame detection (stuck-encoder QA) ----
  // The video-QA counterpart of m7's dead-air check: consecutive
  // frames with IDENTICAL signal (Δ = 0) indicate a frozen feed, a
  // stuck encoder, or padding — per doc, how many frame transitions
  // freeze and the longest freeze run (gaps-and-islands over the
  // zero-delta transitions, m7's run machinery pointed at equality
  // instead of energy). Same ONE frameSums pass and bounded per-doc
  // windows as m6/m7/m20 — the fourth consumer of the shared signal
  // table costs one more window over payload/32 rows. All-integer.
  def m21FreezeDetect(spark: SparkSession, dir: String): DataFrame = {
    val fsums = frameSums(spark, dir, minFrames = 2)
    val wo = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame"))
    val flagged = fsums
      .withColumn("frozen",
        col("fsum") === lag(col("fsum"), 1).over(wo))
      .filter(col("frozen").isNotNull)
    val counts = flagged.groupBy(col("doc_id"), col("nf"))
      .agg(sum(when(col("frozen"), 1L).otherwise(0L)).as("n_frozen"))
    val runs = flagged.filter(col("frozen"))
      .withColumn("grp", col("frame") - row_number().over(wo))
      .groupBy(col("doc_id"), col("grp")).agg(count(lit(1)).as("runlen"))
      .groupBy(col("doc_id")).agg(max(col("runlen")).as("max_freeze"))
    counts.join(runs, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("nf").as("n_frames"), col("n_frozen"),
        coalesce(col("max_freeze"), lit(0L)).as("max_freeze"))
      .orderBy(col("doc_id"))
  }

  lazy val m21Sql: String =
    s"""WITH f AS (
       |  SELECT doc_id, CAST(length(text) // $ShotFrameLen AS BIGINT) AS nf, text
       |  FROM documents WHERE length(text) >= ${2 * ShotFrameLen}),
       |pc AS (
       |  SELECT doc_id, nf, (i - 1) // $ShotFrameLen AS frame,
       |    CAST(ascii(substring(text, i, 1)) AS BIGINT) AS code
       |  FROM (SELECT doc_id, nf, text, unnest(range(1, CAST(nf * $ShotFrameLen AS INTEGER) + 1)) AS i
       |        FROM f) b),
       |fs AS (SELECT doc_id, nf, frame, sum(code) AS fsum
       |       FROM pc GROUP BY 1, 2, 3),
       |d AS (SELECT doc_id, nf, frame,
       |        fsum = lag(fsum) OVER (PARTITION BY doc_id ORDER BY frame)
       |          AS frozen
       |      FROM fs),
       |dd AS (SELECT * FROM d WHERE frozen IS NOT NULL),
       |c AS (SELECT doc_id, nf,
       |        CAST(sum(CASE WHEN frozen THEN 1 ELSE 0 END) AS BIGINT)
       |          AS n_frozen
       |      FROM dd GROUP BY 1, 2),
       |runs AS (SELECT doc_id,
       |           frame - row_number() OVER (PARTITION BY doc_id ORDER BY frame)
       |             AS grp
       |         FROM dd WHERE frozen),
       |rl AS (SELECT doc_id, count(*) AS runlen FROM runs GROUP BY doc_id, grp),
       |mr AS (SELECT doc_id, CAST(max(runlen) AS BIGINT) AS max_freeze
       |       FROM rl GROUP BY doc_id)
       |SELECT c.doc_id, c.nf AS n_frames, c.n_frozen,
       |  COALESCE(mr.max_freeze, 0) AS max_freeze
       |FROM c LEFT JOIN mr ON c.doc_id = mr.doc_id
       |ORDER BY c.doc_id""".stripMargin

  // ---- m7: silence / low-energy segment detection (the VAD shape) ----
  // The audio-pipeline counterpart of m6: instead of diffing adjacent
  // frames, threshold each frame against the DOC's own mean energy —
  // voice-activity detection, silence trimming, dead-air QA all run
  // this rule over decoded RMS energy; here the frame signal is the
  // same integer char-sum as m6 (swap in decoded samples and only the
  // signal expression changes). "Below the doc mean" is evaluated
  // CROSS-MULTIPLIED (fsum·nf < total) so the rule is integer-exact —
  // a mean-as-double would drift between engines. Silent-run lengths
  // come from the gaps-and-islands trick (frame − row_number over
  // silent frames); every window partitions by doc_id with rows
  // bounded by payload/32 (the m3/m5/m6 bounded-window class — grows
  // with the doc, never the corpus). Output: frames, silent count,
  // longest silent run (0 when none).
  def m7SilenceDetect(spark: SparkSession, dir: String): DataFrame = {
    val fsums = frameSums(spark, dir, minFrames = 1)
    val wd = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val flagged = fsums
      .withColumn("total", sum(col("fsum")).over(wd))
      .withColumn("silent", col("fsum") * col("nf") < col("total"))
    val counts = flagged.groupBy(col("doc_id"), col("nf"))
      .agg(sum(when(col("silent"), 1L).otherwise(0L)).as("n_silent"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame"))
    val runs = flagged.filter(col("silent"))
      .withColumn("grp", col("frame") - row_number().over(wr))
      .groupBy(col("doc_id"), col("grp")).agg(count(lit(1)).as("runlen"))
      .groupBy(col("doc_id")).agg(max(col("runlen")).as("max_run"))
    counts.join(runs, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("nf").as("n_frames"), col("n_silent"),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
      .orderBy(col("doc_id"))
  }

  lazy val m7Sql: String =
    s"""WITH f AS (
       |  SELECT doc_id, CAST(length(text) // $ShotFrameLen AS BIGINT) AS nf, text
       |  FROM documents WHERE length(text) >= $ShotFrameLen),
       |pc AS (
       |  SELECT doc_id, nf, (i - 1) // $ShotFrameLen AS frame,
       |    CAST(ascii(substring(text, i, 1)) AS BIGINT) AS code
       |  FROM (SELECT doc_id, nf, text, unnest(range(1, CAST(nf * $ShotFrameLen AS INTEGER) + 1)) AS i
       |        FROM f) b),
       |fs AS (SELECT doc_id, nf, frame, sum(code) AS fsum
       |       FROM pc GROUP BY 1, 2, 3),
       |t AS (SELECT doc_id, nf, frame, fsum,
       |        CAST(sum(fsum) OVER (PARTITION BY doc_id) AS BIGINT) AS total
       |      FROM fs),
       |sil AS (SELECT doc_id, nf, frame,
       |          CAST(fsum AS BIGINT) * nf < total AS silent FROM t),
       |cnt AS (SELECT doc_id, nf,
       |          CAST(sum(CASE WHEN silent THEN 1 ELSE 0 END) AS BIGINT) AS n_silent
       |        FROM sil GROUP BY 1, 2),
       |runs AS (SELECT doc_id,
       |           frame - row_number() OVER (PARTITION BY doc_id ORDER BY frame) AS grp
       |         FROM sil WHERE silent),
       |rl AS (SELECT doc_id, count(*) AS runlen FROM runs GROUP BY doc_id, grp),
       |mr AS (SELECT doc_id, CAST(max(runlen) AS BIGINT) AS max_run FROM rl GROUP BY doc_id)
       |SELECT c.doc_id, c.nf AS n_frames, c.n_silent,
       |  COALESCE(mr.max_run, 0) AS max_run
       |FROM cnt c LEFT JOIN mr ON c.doc_id = mr.doc_id
       |ORDER BY c.doc_id""".stripMargin

  // ---- m8: recall gauge of m5's chunk-bucket candidate pass ----
  // The m5 Scaladoc promises exactly this: beyond the pigeonhole
  // hamming-≤-3 guarantee, HamMax-16 chunk buckets are an honest
  // PARTIAL-recall candidate generator — so measure the miss rate the
  // way d8 does for d5's bands. Ground truth: for a deterministic
  // probe sample (doc_id % 20 = 0 — 25 probes at gate scale), ALL
  // true hamming-≤-HamMax neighbors via a broadcast probe × linear
  // aHash scan (two codegen'd bit_counts per candidate, |probes|·N
  // rows — the evaluator itself holds at 100 TB, never all-pairs).
  // Approx side: m5's verified pair set oriented probe-outward.
  // Shares [[SimilarityOps.recallOf]] (K·|probes|-bounded join +
  // per-probe aggregate) with d8/s8/s9 — one evaluator machinery for
  // every candidate-generation family. The recall number is what the
  // 4×16-bit chunking and AHashMaxBucket now price against; a pixel
  // pipeline re-tunes HamMax with the same gauge.
  def m8AhashRecall(spark: SparkSession, dir: String): DataFrame = {
    val ah = aHashes(spark, dir)
    val probes = ah.filter(col("doc_id") % 20 === 0)
    val ham = expr("bit_count(p.ah_lo ^ c.ah_lo)") +
      expr("bit_count(p.ah_hi ^ c.ah_hi)")
    val exact = broadcast(probes.as("p"))
      .join(ah.as("c"), col("p.doc_id") =!= col("c.doc_id"))
      .filter(ham <= AHashHamMax)
      .select(col("p.doc_id").as("query_id"), col("c.doc_id").as("neighbor_id"))
    val found = m5AHashDup(spark, dir)
    val approx = found.filter(col("doc_a") % 20 === 0)
      .select(col("doc_a").as("query_id"), col("doc_b").as("neighbor_id"))
      .union(found.filter(col("doc_b") % 20 === 0)
        .select(col("doc_b").as("query_id"), col("doc_a").as("neighbor_id")))
    graft.operators.similarity.SimilarityOps.recallOf(exact, approx)
  }

  lazy val m8Sql: String =
    s"""WITH $aHashSqlCtes,
       |$aHashPairSqlCtes,
       |exact AS (
       |  SELECT p.doc_id AS query_id, c.doc_id AS neighbor_id
       |  FROM ah p JOIN ah c ON p.doc_id % 20 = 0 AND p.doc_id != c.doc_id
       |  WHERE bit_count(xor(p.ah_lo, c.ah_lo)) + bit_count(xor(p.ah_hi, c.ah_hi))
       |        <= $AHashHamMax),
       |approx AS (
       |  SELECT doc_a AS query_id, doc_b AS neighbor_id FROM m5pairs
       |  WHERE doc_a % 20 = 0
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM m5pairs WHERE doc_b % 20 = 0)
       |${graft.operators.similarity.SimilarityOps.recallTailSql}""".stripMargin

  // ---- m9: byte-distribution concentration (Simpson index) ----
  // The payload-triage signal a multimodal ingest runs FIRST: is this
  // blob text-like (concentrated byte distribution), compressed /
  // encrypted (near-uniform), or degenerate padding (single-symbol)?
  // Shannon entropy is the textbook gauge but log2 is a libm call
  // whose last bits differ across engines — the Simpson concentration
  // index Σ(cnt/n)² carries the same signal (1/diversity; uniform →
  // 1/|alphabet|, single-symbol → 1) in EXACT integer ppm:
  // 1e6·Σcnt² div n², products in DECIMAL(38,0) because 1e6·n²
  // passes BIGINT at ~3M-char payloads. Relational build (the m5
  // explode + two map-side-combined aggregates), plus the distinct
  // symbol count alongside. Swap the char explode for a byte decode
  // and nothing else changes.
  def m9SimpsonConcentration(spark: SparkSession, dir: String): DataFrame =
    withBlob(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n"),
        explode(split(col("text"), "")).as("ch"))
      .groupBy(col("doc_id"), col("n"), col("ch"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("n"))
      .agg(count(lit(1)).as("n_symbols"),
        sum(expr("cast(c as decimal(38,0)) * cast(c as decimal(38,0))"))
          .as("sumc2"))
      .select(col("doc_id"), col("n"), col("n_symbols"),
        expr("cast((1000000 * sumc2) div (cast(n as decimal(38,0)) * n) as bigint)")
          .as("simpson_ppm"))
      .orderBy(col("doc_id"))

  lazy val m9Sql: String =
    """WITH ch AS (
      |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
      |    unnest(string_split_regex(text, '')) AS ch
      |  FROM documents),
      |cnt AS (
      |  SELECT doc_id, n, ch, count(*) AS c FROM ch
      |  WHERE ch != '' GROUP BY 1, 2, 3),
      |agg AS (
      |  SELECT doc_id, n, count(*) AS n_symbols,
      |    sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS sumc2
      |  FROM cnt GROUP BY 1, 2)
      |SELECT doc_id, n, n_symbols,
      |  CAST((1000000 * sumc2) // (CAST(n AS HUGEINT) * n) AS BIGINT)
      |    AS simpson_ppm
      |FROM agg ORDER BY doc_id""".stripMargin

  // ---- m10: overlapped chunk manifest (the ASR/patch batching shape) ----
  // A media pipeline never feeds whole payloads to a model — it
  // chunks them (audio → 30s windows with overlap, images → patches)
  // and ships a MANIFEST so downstream stages can address chunks
  // without re-slicing bytes. Chunk size 256 with stride 224 (32
  // overlap, the boundary-context rule); last chunk starts at the
  // final stride before the payload end so no trailing sliver
  // shorter than the overlap is emitted. The chunk index list is
  // generated IN-ROW (sequence + explode — zero shuffle, manifest
  // rows ≈ payload_bytes/stride), offsets/lengths are pure integer
  // arithmetic, and the per-chunk first/last character codes give
  // each manifest row a content witness without moving the payload.
  // Character domain throughout (the m4 ASCII contract: these
  // payloads are 1 byte/char; a multibyte corpus would chunk on
  // bytes instead).
  private val ChunkLen = 256
  private val ChunkStride = 224

  def m10ChunkManifest(spark: SparkSession, dir: String): DataFrame =
    withBlob(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n"),
        col("text"))
      .withColumn("last_i", expr(
        s"CASE WHEN n <= $ChunkLen THEN 0 " +
          s"ELSE (n - $ChunkLen + ${ChunkStride - 1}) div $ChunkStride END"))
      .select(col("doc_id"), col("n"), col("text"),
        explode(expr("sequence(0, last_i)")).as("chunk_idx"))
      .withColumn("off", col("chunk_idx") * ChunkStride + 1)
      .withColumn("len", least(lit(ChunkLen.toLong), col("n") - col("off") + 1))
      .select(col("doc_id"), col("chunk_idx"), col("off"), col("len"),
        ascii(expr("substring(text, cast(off as int), 1)")).cast("int").as("first_c"),
        ascii(expr("substring(text, cast(off + len - 1 as int), 1)")).cast("int").as("last_c"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  lazy val m10Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n, text,
       |    CASE WHEN length(text) <= $ChunkLen THEN 0
       |         ELSE (CAST(length(text) AS BIGINT) - $ChunkLen
       |               + ${ChunkStride - 1}) // $ChunkStride END AS last_i
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n, text,
       |    unnest(generate_series(0, last_i)) AS chunk_idx,
       |    unnest(generate_series(0, last_i)) * $ChunkStride + 1 AS off
       |  FROM d),
       |m AS (
       |  SELECT doc_id, chunk_idx, off,
       |    least(CAST($ChunkLen AS BIGINT), n - off + 1) AS len, text
       |  FROM c)
       |SELECT doc_id, chunk_idx, off, len,
       |  ascii(substring(text, CAST(off AS INTEGER), 1)) AS first_c,
       |  ascii(substring(text, CAST(off + len - 1 AS INTEGER), 1)) AS last_c
       |FROM m ORDER BY doc_id, chunk_idx""".stripMargin

  // ---- m11: dHash (gradient hash) near-dup pairs ----
  // The perceptual-hash sibling of m5: where aHash compares each block
  // mean to the GLOBAL mean (brightness profile), dHash sets bit i
  // when block i's mean exceeds block i+1's (the local gradient) — the
  // variant that is robust to uniform brightness/gain shifts, which
  // flip many aHash bits at once but leave adjacent-block ordering
  // intact. 65 blocks give 64 gradient bits; the comparison is exact
  // cross-multiplication (bsum_i·blen_{i+1} > bsum_{i+1}·blen_i), so
  // no float means. The candidate pass reuses m5's capped 16-bit-chunk
  // buckets — pair volume stays bounded by cap²·buckets at any scale.
  private val DHashBlocks = 65

  def dHashesOf(d: DataFrame): DataFrame = {
    val nb = DHashBlocks
    val perChar = d
      .withColumn("n", length(col("text")).cast("long"))
      .filter(col("n") >= nb)
      .select(col("doc_id"), col("n"),
        posexplode(split(col("text"), "")).as(Seq("p", "ch")))
      .select(col("doc_id"), col("n"),
        expr(s"((p + 1) * $nb - 1) div n").as("b"),
        expr("cast(ascii(ch) as bigint)").as("code"))
    val g = perChar.groupBy(col("doc_id"), col("b"))
      .agg(sum(col("code")).as("bsum"), count(lit(1)).as("blen"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("b"))
    g.withColumn("nsum", lead(col("bsum"), 1).over(w))
      .withColumn("nlen", lead(col("blen"), 1).over(w))
      .filter(col("nsum").isNotNull)
      .withColumn("bit",
        (col("bsum") * col("nlen") > col("nsum") * col("blen")).cast("long"))
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("b") < 32,
          col("bit") * expr("shiftleft(cast(1 as bigint), cast(b as int))"))
          .otherwise(lit(0L))).as("dh_lo"),
        sum(when(col("b") >= 32,
          col("bit") * expr("shiftleft(cast(1 as bigint), cast(b as int) - 32)"))
          .otherwise(lit(0L))).as("dh_hi"))
  }

  def m11DhashDup(spark: SparkSession, dir: String): DataFrame = {
    val chunks = dHashesOf(withBlob(spark, dir))
      .withColumn("chunks", expr(
        """array(dh_lo % 65536, dh_lo div 65536,
          |      dh_hi % 65536, dh_hi div 65536)""".stripMargin))
      .select(col("doc_id"), col("dh_lo"), col("dh_hi"),
        posexplode(col("chunks")).as(Seq("cpos", "cval")))
    val s = graft.util.Buckets.cap(chunks, Seq("cpos", "cval"), AHashMaxBucket)
    s.as("x").join(s.as("y"),
        col("x.cpos") === col("y.cpos") && col("x.cval") === col("y.cval")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        (expr("bit_count(x.dh_lo ^ y.dh_lo)")
          + expr("bit_count(x.dh_hi ^ y.dh_hi)")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= AHashHamMax)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private lazy val dHashSqlCtes: String = {
    val nb = DHashBlocks
    s"""dsized AS (
       |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
       |  FROM documents WHERE length(text) >= $nb),
       |djx AS (
       |  SELECT doc_id, n, text, unnest(generate_series(1, n)) AS j
       |  FROM dsized),
       |dchars AS (
       |  SELECT doc_id, n, (j * $nb - 1) // n AS b,
       |    CAST(ascii(substr(text, CAST(j AS INTEGER), 1)) AS BIGINT) AS code
       |  FROM djx),
       |dblk AS (
       |  SELECT doc_id, b, CAST(sum(code) AS BIGINT) AS bsum,
       |    count(*) AS blen
       |  FROM dchars GROUP BY doc_id, b),
       |dnb AS (
       |  SELECT doc_id, b, bsum, blen,
       |    lead(bsum) OVER (PARTITION BY doc_id ORDER BY b) AS nsum,
       |    lead(blen) OVER (PARTITION BY doc_id ORDER BY b) AS nlen
       |  FROM dblk),
       |dh AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN b < 32 AND bsum * nlen > nsum * blen
       |                  THEN CAST(1 AS BIGINT) << CAST(b AS INTEGER)
       |                  ELSE 0 END) AS BIGINT) AS dh_lo,
       |    CAST(sum(CASE WHEN b >= 32 AND bsum * nlen > nsum * blen
       |                  THEN CAST(1 AS BIGINT) << (CAST(b AS INTEGER) - 32)
       |                  ELSE 0 END) AS BIGINT) AS dh_hi
       |  FROM dnb WHERE nsum IS NOT NULL GROUP BY doc_id)""".stripMargin
  }

  lazy val m11Sql: String =
    s"""WITH $dHashSqlCtes,
       |dchunks0 AS (
       |  SELECT doc_id, dh_lo, dh_hi, c AS cpos,
       |    CASE c WHEN 0 THEN dh_lo % 65536 WHEN 1 THEN dh_lo // 65536
       |           WHEN 2 THEN dh_hi % 65536 ELSE dh_hi // 65536 END AS cval
       |  FROM dh, generate_series(0, 3) g(c)),
       |dok AS (
       |  SELECT cpos, cval FROM dchunks0 GROUP BY cpos, cval
       |  HAVING count(*) <= $AHashMaxBucket),
       |dchunks AS (SELECT c.* FROM dchunks0 c JOIN dok USING (cpos, cval))
       |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |  bit_count(xor(x.dh_lo, y.dh_lo)) + bit_count(xor(x.dh_hi, y.dh_hi))
       |    AS hamming
       |FROM dchunks x JOIN dchunks y
       |  ON x.cpos = y.cpos AND x.cval = y.cval AND x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.dh_lo, y.dh_lo)) + bit_count(xor(x.dh_hi, y.dh_hi))
       |      <= $AHashHamMax
       |ORDER BY doc_a, doc_b""".stripMargin

  // ---- m12: run-length compressibility gauge ----
  // RLE statistics over the payload: run count, longest run, and
  // runs-per-char in exact ppm. A payload whose runs_ppm is tiny is
  // mostly repeated bytes — padding, silence, solid-color regions —
  // the cheap compressibility proxy curation uses to down-weight
  // low-information blobs before any codec runs. Change flags come
  // from one per-doc lag window (per-doc bounded, the m6 shape), run
  // ids from the running sum of flags, and the rollups are map-side
  // combined. No cross-doc shuffle anywhere: everything partitions by
  // doc_id, a key that grows with the corpus.
  def m12RleStats(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("p"))
    val prev = lag(col("ch"), 1).over(w)
    val pc = withBlob(spark, dir)
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"), posexplode(split(col("text"), "")).as(Seq("p", "ch")))
      .withColumn("chg",
        when(prev.isNull || prev =!= col("ch"), 1L).otherwise(0L))
      .withColumn("rid", sum(col("chg")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    pc.groupBy(col("doc_id"), col("rid")).agg(count(lit(1)).as("rlen"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_runs"), max(col("rlen")).as("max_run"),
        sum(col("rlen")).as("n_chars"))
      .withColumn("runs_ppm", expr("n_runs * 1000000 div n_chars"))
      .orderBy(col("doc_id"))
  }

  lazy val m12Sql: String =
    """WITH jx AS (
      |  SELECT doc_id, text, unnest(generate_series(1, length(text))) AS p
      |  FROM documents WHERE length(text) >= 1),
      |ch AS (SELECT doc_id, p, substr(text, CAST(p AS INTEGER), 1) AS ch
      |       FROM jx),
      |cg AS (SELECT doc_id, p, ch,
      |    CASE WHEN lag(ch) OVER (PARTITION BY doc_id ORDER BY p)
      |              IS DISTINCT FROM ch THEN 1 ELSE 0 END AS chg
      |  FROM ch),
      |rr AS (SELECT doc_id,
      |    sum(chg) OVER (PARTITION BY doc_id ORDER BY p) AS rid
      |  FROM cg),
      |runs AS (SELECT doc_id, rid, count(*) AS rlen FROM rr GROUP BY 1, 2)
      |SELECT doc_id, count(*) AS n_runs,
      |  CAST(max(rlen) AS BIGINT) AS max_run,
      |  CAST(sum(rlen) AS BIGINT) AS n_chars,
      |  count(*) * 1000000 // CAST(sum(rlen) AS BIGINT) AS runs_ppm
      |FROM runs GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- m13: 2-D patch-grid manifest (ViT patching shape) ----
  // m10 chunks 1-D (ASR); vision models patch 2-D: treat the payload
  // as an image of GridW-byte rows and emit the 8×8 patch grid —
  // (row, col, offset) plus per-patch probe stats (corner byte, first
  // patch-row checksum) — WITHOUT moving payload bytes. The byte
  // codes come from ONE split-to-chars pass per doc (the m5 lesson:
  // per-position substring re-scans UTF8 and goes quadratic), then
  // every patch indexes the array O(1). Pure in-row generate, zero
  // shuffle before the output sort; manifest rows ≈ bytes/64.
  private val GridW = 32
  private val PatchP = 8

  def m13GridPatches(spark: SparkSession, dir: String): DataFrame =
    gridPatchesOf(spark, dir).orderBy(col("doc_id"), col("pr"), col("pc"))

  /** The unordered patch manifest — shared by m13's gated dump and
    * m14's patch-level dedup. */
  def gridPatchesOf(spark: SparkSession, dir: String): DataFrame = {
    val rowBytes = GridW * PatchP // bytes per patch ROW of the grid
    val pcMax = GridW / PatchP - 1
    withBlob(spark, dir)
      .withColumn("n", length(col("text")).cast("long"))
      .filter(col("n") >= rowBytes)
      .withColumn("cs", expr("transform(split(text, ''), c -> cast(ascii(c) as bigint))"))
      .withColumn("prn", expr(s"(n div $GridW) div $PatchP"))
      .select(col("doc_id"), col("cs"),
        posexplode(expr(
          s"""flatten(transform(sequence(0, cast(prn - 1 as int)), pr ->
             |  transform(sequence(0, $pcMax), pc -> struct(
             |    cast(pr as bigint) as pr, cast(pc as bigint) as pc,
             |    cast(pr * $rowBytes + pc * $PatchP + 1 as bigint) as off))))""".stripMargin))
          .as(Seq("i", "p")))
      .select(col("doc_id"), col("p.pr").as("pr"), col("p.pc").as("pc"),
        col("p.off").as("off"),
        expr("element_at(cs, cast(p.off as int))").as("first_code"),
        expr(s"""aggregate(sequence(0, ${PatchP - 1}), cast(0 as bigint),
                |  (a, j) -> a + element_at(cs, cast(p.off + j as int)))""".stripMargin)
          .as("row_sum"))
  }

  // ---- m14: cross-document patch dedup (watermark / sprite finder) ----
  // The patch-level analog of m5/m11's whole-payload hashing: group
  // m13's manifest by the (first_code, row_sum) patch signature and
  // surface signatures recurring across ≥2 DISTINCT documents — the
  // repeated logo/watermark/boilerplate tile a vision pipeline wants
  // to mask before training. One map-side-combined groupBy over the
  // in-row manifest + a deterministic top-50; the signature is weak
  // by design (8-byte probe row), exactly like a real first-pass
  // banding step — candidates, not verdicts.
  def m14PatchDup(spark: SparkSession, dir: String): DataFrame =
    gridPatchesOf(spark, dir)
      .groupBy(col("first_code"), col("row_sum"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_patches"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_patches").desc, col("first_code"), col("row_sum"))
      .limit(50)

  lazy val m14Sql: String = {
    val rowBytes = GridW * PatchP
    val pcMax = GridW / PatchP - 1
    s"""WITH gsized AS (
       |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
       |  FROM documents WHERE length(text) >= $rowBytes),
       |gr AS (
       |  SELECT doc_id, text,
       |    unnest(generate_series(0, (n // $GridW) // $PatchP - 1)) AS pr
       |  FROM gsized),
       |px AS (
       |  SELECT doc_id, pr * $rowBytes + pc * $PatchP + 1 AS off, text
       |  FROM gr, generate_series(0, $pcMax) g(pc)),
       |sig AS (
       |  SELECT doc_id,
       |    CAST(ascii(substr(text, CAST(off AS INTEGER), 1)) AS BIGINT)
       |      AS first_code,
       |    CAST(list_sum([ascii(substr(text, CAST(off + j AS INTEGER), 1))
       |      for j in generate_series(0, ${PatchP - 1})]) AS BIGINT) AS row_sum
       |  FROM px)
       |SELECT first_code, row_sum,
       |  count(DISTINCT doc_id) AS n_docs, count(*) AS n_patches
       |FROM sig GROUP BY 1, 2 HAVING count(DISTINCT doc_id) >= 2
       |ORDER BY n_patches DESC, first_code, row_sum LIMIT 50""".stripMargin
  }

  lazy val m13Sql: String = {
    val rowBytes = GridW * PatchP
    val pcMax = GridW / PatchP - 1
    s"""WITH gsized AS (
       |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
       |  FROM documents WHERE length(text) >= $rowBytes),
       |gr AS (
       |  SELECT doc_id, text,
       |    unnest(generate_series(0, (n // $GridW) // $PatchP - 1)) AS pr
       |  FROM gsized),
       |px AS (
       |  SELECT doc_id, text, pr, pc,
       |    pr * $rowBytes + pc * $PatchP + 1 AS off
       |  FROM gr, generate_series(0, $pcMax) g(pc))
       |SELECT doc_id, CAST(pr AS BIGINT) AS pr, CAST(pc AS BIGINT) AS pc,
       |  CAST(off AS BIGINT) AS off,
       |  CAST(ascii(substr(text, CAST(off AS INTEGER), 1)) AS BIGINT)
       |    AS first_code,
       |  CAST(list_sum([ascii(substr(text, CAST(off + j AS INTEGER), 1))
       |    for j in generate_series(0, ${PatchP - 1})]) AS BIGINT) AS row_sum
       |FROM px ORDER BY doc_id, pr, pc""".stripMargin
  }

  // ---- m15: magic-byte format sniff (ingest dispatch table) ----
  // The FIRST stage of any multimodal ingest: look at the leading
  // bytes, route the blob to a decoder. Real pipelines switch on
  // magic numbers (\x89PNG, RIFF, \xFF\xD8); these synthetic payloads
  // are ASCII, so the dispatch classes are lead-byte ranges — the
  // switch itself (class expression + a distinct-prefix census +
  // byte accounting per route) is the real plumbing, computed in one
  // narrow codegen'd scan + one map-side-combined aggregate, payload
  // never shuffled. `n_ascii_clean` carries the octet==char probe (a
  // multibyte blob would fail it — the m4 unit-mixing guard made a
  // gauge); the magic64 census counts distinct 8-char openings per
  // route (how many real decoders the route would fan into).
  def m15MagicSniff(spark: SparkSession, dir: String): DataFrame = {
    val first = ascii(substring(col("text"), 1, 1))
    val cls = when(first >= 65 && first <= 90, "upper")
      .when(first >= 97 && first <= 122, "lower")
      .when(first >= 48 && first <= 57, "digit")
      .when(first === 32 || first === 9 || first === 10, "space")
      .otherwise("other")
    withBlob(spark, dir)
      .select(col("source"), col("payload"), col("text"))
      .withColumn("fmt", cls)
      .groupBy(col("source"), col("fmt"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(substring(col("text"), 1, 8)).as("n_magics"),
        sum(octet_length(col("payload"))).as("total_bytes"),
        sum((octet_length(col("payload")) === length(col("text")))
          .cast("long")).as("n_ascii_clean"))
      .orderBy(col("source"), col("fmt"))
  }

  lazy val m15Sql: String =
    """WITH b AS (
      |  SELECT source, text, ascii(substr(text, 1, 1)) AS fc,
      |    octet_length(CAST(text AS BLOB)) AS nbytes
      |  FROM documents),
      |c AS (
      |  SELECT source, text, nbytes,
      |    CASE WHEN fc BETWEEN 65 AND 90 THEN 'upper'
      |         WHEN fc BETWEEN 97 AND 122 THEN 'lower'
      |         WHEN fc BETWEEN 48 AND 57 THEN 'digit'
      |         WHEN fc IN (32, 9, 10) THEN 'space'
      |         ELSE 'other' END AS fmt
      |  FROM b)
      |SELECT source, fmt, count(*) AS n_docs,
      |  CAST(count(DISTINCT substr(text, 1, 8)) AS BIGINT) AS n_magics,
      |  CAST(sum(nbytes) AS BIGINT) AS total_bytes,
      |  CAST(sum(CASE WHEN nbytes = length(text) THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_ascii_clean
      |FROM c GROUP BY 1, 2 ORDER BY source, fmt""".stripMargin

  // ---- m16: loudness-normalization gain (audio mastering shape) ----
  // The normalize step of an audio pipeline on the 1-D payload: treat
  // byte codes as amplitude samples, compute the per-doc gain that
  // brings MEAN amplitude to the target, and count the samples that
  // gain would CLIP past full scale — the number a mastering pass
  // reads before deciding gain vs compression. All integer: gain_ppm
  // = T·1e6·n div Σa, and the clip test cross-multiplies
  // (a·T·n > 255·Σa) instead of applying the gain — no division, no
  // rounding choice to disagree on. Plan is m9's two-level shape:
  // per-(doc, byte-value) counts first (≤ alphabet rows per doc — the
  // explode collapses immediately), sums + clip census off the counts.
  // Target chosen HOT on purpose: 208 sits above the corpus mean
  // (~94) by ~2.2×, so the clip census actually fires on the loudest
  // samples (codes ≥ ~116) — at a soft target the n_clipped branch
  // would be structurally dead on ASCII payloads and the gate would
  // prove nothing about it (the q37 both-branches-live rule).
  private val TargetAmp = 208L

  def m16GainNormalize(spark: SparkSession, dir: String): DataFrame = {
    val cnt = withBlob(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n"),
        explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .select(col("doc_id"), col("n"), ascii(col("ch")).cast("long").as("a"))
      .groupBy(col("doc_id"), col("n"), col("a"))
      .agg(count(lit(1)).as("c"))
    val sums = cnt.groupBy(col("doc_id"), col("n"))
      .agg(sum(col("a") * col("c")).as("sum_amp"))
    cnt.join(sums, Seq("doc_id", "n"))
      .groupBy(col("doc_id"), col("n"), col("sum_amp"))
      .agg(sum(when(col("a") * TargetAmp * col("n") > lit(255L) * col("sum_amp"),
        col("c")).otherwise(0L)).as("n_clipped"))
      .select(col("doc_id"), col("n"), col("sum_amp"),
        expr(s"$TargetAmp * 1000000 * n div sum_amp").as("gain_ppm"),
        col("n_clipped"))
      .orderBy(col("doc_id"))
  }

  lazy val m16Sql: String =
    s"""WITH ch AS (
       |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
       |    unnest(string_split_regex(text, '')) AS ch
       |  FROM documents),
       |cnt AS (
       |  SELECT doc_id, n, ascii(ch) AS a, count(*) AS c FROM ch
       |  WHERE ch != '' GROUP BY 1, 2, 3),
       |sm AS (SELECT doc_id, n, CAST(sum(a * c) AS BIGINT) AS sum_amp
       |       FROM cnt GROUP BY 1, 2)
       |SELECT c.doc_id, c.n, s.sum_amp,
       |  $TargetAmp * 1000000 * c.n // s.sum_amp AS gain_ppm,
       |  CAST(sum(CASE WHEN c.a * $TargetAmp * c.n > 255 * s.sum_amp
       |    THEN c.c ELSE 0 END) AS BIGINT) AS n_clipped
       |FROM cnt c JOIN sm s ON c.doc_id = s.doc_id AND c.n = s.n
       |GROUP BY 1, 2, 3, 4 ORDER BY c.doc_id""".stripMargin

  // ---- m17: exact blob dedup + per-source storage-reclaim report ----
  // The FIRST pass any multimodal corpus runs (before m5/m11's
  // perceptual hashing): byte-identical payload dedup, rolled up as
  // the storage bill — per source: blob count, exact duplicates
  // (keeper = min doc_id GLOBALLY, so cross-source copies dedupe
  // once), total vs reclaimable bytes. The d1 exact-dedup law applied
  // to binary, with the report a capacity planner reads. Plan: one
  // digest+length scan, a |distinct blob|-row keeper aggregate, one
  // hash join back, per-source rollup — all linear, payload bytes
  // never shuffle (only the 16-byte digest does).
  def m17DedupReclaim(spark: SparkSession, dir: String): DataFrame = {
    val b = withBlob(spark, dir)
      .select(col("doc_id"), col("source"), md5(col("payload")).as("h"),
        octet_length(col("payload")).cast("long").as("nb"))
    val keep = b.groupBy(col("h")).agg(min(col("doc_id")).as("keep_id"))
    b.join(keep, Seq("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_blobs"),
        sum(when(col("doc_id") === col("keep_id"), 0L).otherwise(1L))
          .as("dup_blobs"),
        sum(col("nb")).as("total_bytes"),
        sum(when(col("doc_id") === col("keep_id"), 0L).otherwise(col("nb")))
          .as("reclaimable_bytes"))
      .orderBy(col("source"))
  }

  // md5 over the utf-8 payload == DuckDB's md5 over the VARCHAR's
  // bytes — the same digest both sides (m1's CAST(text AS BLOB)
  // length identity, applied to content).
  lazy val m17Sql: String =
    """WITH b AS (
      |  SELECT doc_id, source, md5(text) AS h,
      |    CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS nb
      |  FROM documents),
      |keep AS (SELECT h, min(doc_id) AS keep_id FROM b GROUP BY h)
      |SELECT b.source, count(*) AS n_blobs,
      |  CAST(sum(CASE WHEN b.doc_id = k.keep_id THEN 0 ELSE 1 END) AS BIGINT)
      |    AS dup_blobs,
      |  CAST(sum(b.nb) AS BIGINT) AS total_bytes,
      |  CAST(sum(CASE WHEN b.doc_id = k.keep_id THEN 0 ELSE b.nb END) AS BIGINT)
      |    AS reclaimable_bytes
      |FROM b JOIN keep k ON b.h = k.h
      |GROUP BY b.source ORDER BY b.source""".stripMargin

  // ---- m18: chunk-level CAS dedup (sub-blob storage reclaim) ----
  // m17 reclaims only byte-identical WHOLE blobs; content-addressable
  // storage dedups at chunk granularity — two videos sharing an intro
  // share those chunks. Fixed 256-unit chunks (non-overlapping — the
  // reclaim accounting is only meaningful when chunks tile the
  // payload; m10/m13's overlapping grids are feature extractors, not
  // storage units), each chunk addressed by its md5; keeper = the
  // globally smallest (doc_id, chunk_idx), packed as doc_id·2^20 +
  // idx so min() needs no struct ordering (payloads < 2^20 chunks ≈
  // 256 MB — asserted by the explode bound). Only 16-byte digests
  // shuffle — payload chunks stay in their scan partitions; the
  // digest groupBy and the join back are both digest-keyed — the
  // classic CAS index shape at any scale. Offsets are CHARACTER
  // offsets on both engines (Spark substring and DuckDB substring
  // are both char-indexed), so the digests agree on non-ASCII too.
  private val CasChunk = 256L

  def m18ChunkDedup(spark: SparkSession, dir: String): DataFrame = {
    val c = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"),
        length(col("text")).cast("long").as("n"))
      .filter(col("n") > 0)
      .withColumn("chunk_idx", explode(expr(s"sequence(0, (n - 1) div $CasChunk)")))
      .withColumn("off", col("chunk_idx") * CasChunk + 1)
      .withColumn("len", least(lit(CasChunk), col("n") - col("off") + 1))
      .select(col("source"),
        expr("doc_id * 1048576 + chunk_idx").as("ck"),
        md5(expr("cast(substring(text, cast(off as int), cast(len as int)) as binary)"))
          .as("h"),
        col("len"))
    val keep = c.groupBy(col("h")).agg(min(col("ck")).as("keep_ck"))
    c.join(keep, Seq("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("ck") === col("keep_ck"), 0L).otherwise(1L))
          .as("dup_chunks"),
        sum(col("len")).as("total_units"),
        sum(when(col("ck") === col("keep_ck"), 0L).otherwise(col("len")))
          .as("reclaimable_units"))
      .orderBy(col("source"))
  }

  lazy val m18Sql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source, text, CAST(length(text) AS BIGINT) AS n
       |  FROM documents WHERE length(text) > 0),
       |di AS (
       |  SELECT doc_id, source, text, n,
       |    unnest(generate_series(0, (n - 1) // $CasChunk)) AS i
       |  FROM d),
       |c AS (
       |  SELECT source, doc_id * 1048576 + i AS ck,
       |    md5(substring(text, CAST(i * $CasChunk + 1 AS INTEGER),
       |      CAST(least($CasChunk, n - (i * $CasChunk + 1) + 1) AS INTEGER)))
       |      AS h,
       |    least($CasChunk, n - (i * $CasChunk + 1) + 1) AS len
       |  FROM di),
       |keep AS (SELECT h, min(ck) AS keep_ck FROM c GROUP BY h)
       |SELECT c.source, count(*) AS n_chunks,
       |  CAST(sum(CASE WHEN c.ck = k.keep_ck THEN 0 ELSE 1 END) AS BIGINT)
       |    AS dup_chunks,
       |  CAST(sum(c.len) AS BIGINT) AS total_units,
       |  CAST(sum(CASE WHEN c.ck = k.keep_ck THEN 0 ELSE c.len END) AS BIGINT)
       |    AS reclaimable_units
       |FROM c JOIN keep k ON c.h = k.h
       |GROUP BY c.source ORDER BY c.source""".stripMargin

  // ---- m19: compressibility proxy (dictionary-richness triage) ----
  // Storage tiering wants to know WHICH blobs are worth compressing
  // before spending codec CPU on a 100 TB corpus. The classic cheap
  // proxy: distinct-unigram and distinct-bigram counts vs length — a
  // blob whose bigram dictionary is tiny relative to its length is
  // highly compressible (LZ-family codecs exploit exactly that
  // repetition), one that saturates the dictionary is near-random.
  // bigram_ratio_ppm = distinct bigrams · 10^6 DIV (n−1) is the
  // triage score. Plan: everything is IN-ROW (transform over
  // sequence(1, n−1) + array_distinct — no explode, no shuffle, one
  // narrow scan); rows where n < 2 are excluded on both engines.
  def m19Compressibility(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("n"))
      .filter(col("n") >= 2)
      .select(col("doc_id"), col("n"),
        expr("""size(array_distinct(transform(
               |  sequence(1, cast(n as int)),
               |  i -> substring(text, i, 1))))""".stripMargin)
          .cast("long").as("uniq1"),
        expr("""size(array_distinct(transform(
               |  sequence(1, cast(n as int) - 1),
               |  i -> substring(text, i, 2))))""".stripMargin)
          .cast("long").as("uniq2"))
      .withColumn("bigram_ratio_ppm", expr("uniq2 * 1000000 div (n - 1)"))
      .orderBy(col("doc_id"))

  lazy val m19Sql: String =
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
      |  CAST(len(list_distinct(list_transform(
      |    generate_series(1, CAST(length(text) AS INTEGER)),
      |    i -> substring(text, i, 1)))) AS BIGINT) AS uniq1,
      |  CAST(len(list_distinct(list_transform(
      |    generate_series(1, CAST(length(text) AS INTEGER) - 1),
      |    i -> substring(text, i, 2)))) AS BIGINT) AS uniq2,
      |  CAST(len(list_distinct(list_transform(
      |    generate_series(1, CAST(length(text) AS INTEGER) - 1),
      |    i -> substring(text, i, 2)))) AS BIGINT) * 1000000
      |    // (CAST(length(text) AS BIGINT) - 1) AS bigram_ratio_ppm
      |FROM documents WHERE length(text) >= 2
      |ORDER BY doc_id""".stripMargin

  // ---- m23: media ingest quality gate (triage composition) ----
  // The keep/drop decision a media pipeline runs before paying for
  // decode: compose the cheap byte-level signals — m19's bigram
  // diversity (a near-constant payload is a stuck encoder or filler)
  // and the size band (truncated uploads below, unsplit containers
  // above) — into per-doc flags + one keep bit, WITH the reasons
  // kept as columns (a gate that only says "dropped" is
  // undebuggable; t9's lesson applied to media). One doc-keyed join
  // of two narrow per-doc frames; thresholds are fixed constants so
  // the gate is reproducible across engines and runs.
  private val GateMinBigramPpm = 220000L
  private val GateMinBytes = 64L
  private val GateMaxBytes = 512L

  def m23MediaGate(spark: SparkSession, dir: String): DataFrame =
    m19Compressibility(spark, dir)
      .select(col("doc_id"), col("n"), col("uniq1"), col("bigram_ratio_ppm"))
      .withColumn("flag_low_entropy",
        col("bigram_ratio_ppm") < GateMinBigramPpm)
      .withColumn("flag_size",
        col("n") < GateMinBytes || col("n") > GateMaxBytes)
      .withColumn("keep", !col("flag_low_entropy") && !col("flag_size"))
      .orderBy(col("doc_id"))

  lazy val m23Sql: String =
    s"""WITH r19 AS ($m19Sql)
       |SELECT doc_id, n, uniq1, bigram_ratio_ppm,
       |  bigram_ratio_ppm < $GateMinBigramPpm AS flag_low_entropy,
       |  (n < $GateMinBytes OR n > $GateMaxBytes) AS flag_size,
       |  NOT (bigram_ratio_ppm < $GateMinBigramPpm)
       |    AND NOT (n < $GateMinBytes OR n > $GateMaxBytes) AS keep
       |FROM r19 ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m23_media_gate" -> (m23MediaGate _),
    "m17_dedup_reclaim" -> (m17DedupReclaim _),
    "m18_chunk_dedup" -> (m18ChunkDedup _),
    "m19_compressibility" -> (m19Compressibility _),
    "m20_av_sync" -> (m20AvSync _),
    "m21_freeze_detect" -> (m21FreezeDetect _),
    "m22_scene_lengths" -> (m22SceneLengths _),
    "m16_gain_normalize" -> (m16GainNormalize _),
    "m15_magic_sniff" -> (m15MagicSniff _),
    "m14_patch_dup" -> (m14PatchDup _),
    "m13_grid_patches" -> (m13GridPatches _),
    "m12_rle_stats" -> (m12RleStats _),
    "m11_dhash_dup" -> (m11DhashDup _),
    "m10_chunk_manifest" -> (m10ChunkManifest _),
    "m9_simpson_concentration" -> (m9SimpsonConcentration _),
    "m8_ahash_recall" -> (m8AhashRecall _),
    "m7_silence_detect" -> (m7SilenceDetect _),
    "m6_shot_detect" -> (m6ShotDetect _),
    "m5_ahash_dup" -> (m5AHashDup _),
    "m4_resize" -> (m4Resize _),
    "m1_blob_stats" -> (m1BlobStats _),
    "m2_feature_extract" -> (m2FeatureExtract _),
    "m3_frame_sample" -> (m3FrameSample _))

  val oracles: Map[String, String] = Map(
    "m23_media_gate" -> m23Sql,
    "m17_dedup_reclaim" -> m17Sql,
    "m18_chunk_dedup" -> m18Sql,
    "m19_compressibility" -> m19Sql,
    "m20_av_sync" -> m20Sql,
    "m21_freeze_detect" -> m21Sql,
    "m22_scene_lengths" -> m22Sql,
    "m16_gain_normalize" -> m16Sql,
    "m15_magic_sniff" -> m15Sql,
    "m14_patch_dup" -> m14Sql,
    "m13_grid_patches" -> m13Sql,
    "m12_rle_stats" -> m12Sql,
    "m11_dhash_dup" -> m11Sql,
    "m10_chunk_manifest" -> m10Sql,
    "m9_simpson_concentration" -> m9Sql,
    "m8_ahash_recall" -> m8Sql,
    "m7_silence_detect" -> m7Sql,
    "m6_shot_detect" -> m6Sql,
    "m5_ahash_dup" -> m5Sql,
    "m4_resize" -> m4Sql,
    "m1_blob_stats" -> m1Sql,
    "m2_feature_extract" -> m2Sql,
    "m3_frame_sample" -> m3Sql)
}
