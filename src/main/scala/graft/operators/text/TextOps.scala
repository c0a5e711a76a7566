package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text analysis over the `documents` table — the training-data-pipeline
  * surface (language ID, quality scoring, token counting, fingerprints,
  * n-gram stats).
  *
  * Everything is a codegen-friendly composition of built-in higher-order
  * functions (`filter`/`transform`/`aggregate` over `split`) — no Scala
  * UDFs, so the per-row work stays inside whole-stage codegen and the
  * scan only reads the `text` (+key) columns. At 100 TB the documents
  * table is the big one; each of these is a single narrow scan with at
  * most one shuffle (the corpus-level n-gram agg).
  */
object TextOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")

  // pseudo-stopword sets (deterministic heuristic; shared with oracles)
  private val EN = Seq("the", "a", "of", "in")
  private val DE = Seq("der", "die", "das", "und")
  private val FR = Seq("le", "la", "les", "et")
  private def sqlSet(ws: Seq[String]) = ws.map("'" + _ + "'").mkString("(", ",", ")")

  private def hits(ws: Seq[String]): Column =
    size(filter(split(col("text"), " "), w => w.isInCollection(ws)))

  // ---- t1: stopword-hit language ID ----
  def t1LangId(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        hits(EN).as("en_hits"), hits(DE).as("de_hits"), hits(FR).as("fr_hits"))
      .withColumn("pred_lang",
        when(col("en_hits") + col("de_hits") + col("fr_hits") === 0, lit("unknown"))
          .when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits"), lit("en"))
          .when(col("de_hits") >= col("fr_hits"), lit("de"))
          .otherwise(lit("fr")))
      .orderBy(col("doc_id"))

  lazy val t1Sql: String =
    s"""SELECT doc_id,
       |  len(list_filter(string_split(text,' '), w -> w IN ${sqlSet(EN)})) AS en_hits,
       |  len(list_filter(string_split(text,' '), w -> w IN ${sqlSet(DE)})) AS de_hits,
       |  len(list_filter(string_split(text,' '), w -> w IN ${sqlSet(FR)})) AS fr_hits,
       |  CASE WHEN en_hits + de_hits + fr_hits = 0 THEN 'unknown'
       |       WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
       |       WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END AS pred_lang
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---- t36: language-ID confusion matrix (classifier eval) ----
  // The documents table carries a GOLD `lang` label; t1 predicts one.
  // This is the evaluation operator every heuristic classifier needs
  // before it gates a corpus: the gold × predicted confusion matrix
  // with per-cell recall (share of the gold class) and precision
  // (share of the predicted class) in exact ppm. Reads t1's per-doc
  // output (same plan — one corpus scan), collapses to the bounded
  // |langs|² cell domain map-side, marginals re-aggregate the cell
  // table. The matrix diagonal IS the classifier's per-class quality;
  // off-diagonal mass says which stopword sets collide.
  def t36LangConfusion(spark: SparkSession, dir: String): DataFrame = {
    val pred = t1LangId(spark, dir).select(col("doc_id"), col("pred_lang"))
    val cells = docs(spark, dir).select(col("doc_id"), col("lang"))
      .join(pred, Seq("doc_id"))
      .groupBy(col("lang").as("gold"), col("pred_lang").as("pred"))
      .agg(count(lit(1)).as("n"))
    val gm = cells.groupBy(col("gold")).agg(sum(col("n")).as("gn"))
    val pm = cells.groupBy(col("pred")).agg(sum(col("n")).as("pn"))
    cells.join(gm, Seq("gold")).join(pm, Seq("pred"))
      .select(col("gold"), col("pred"), col("n"),
        expr("n * 1000000 div gn").as("recall_ppm"),
        expr("n * 1000000 div pn").as("precision_ppm"))
      .orderBy(col("gold"), col("pred"))
  }

  lazy val t36Sql: String =
    s"""WITH t1 AS (
       |  SELECT doc_id,
       |    len(list_filter(string_split(text,' '), w -> w IN ${sqlSet(EN)})) AS eh,
       |    len(list_filter(string_split(text,' '), w -> w IN ${sqlSet(DE)})) AS dh,
       |    len(list_filter(string_split(text,' '), w -> w IN ${sqlSet(FR)})) AS fh,
       |    lang
       |  FROM documents),
       |p AS (
       |  SELECT lang AS gold,
       |    CASE WHEN eh + dh + fh = 0 THEN 'unknown'
       |         WHEN eh >= dh AND eh >= fh THEN 'en'
       |         WHEN dh >= fh THEN 'de' ELSE 'fr' END AS pred
       |  FROM t1),
       |cells AS (SELECT gold, pred, count(*) AS n FROM p GROUP BY 1, 2),
       |gm AS (SELECT gold, CAST(sum(n) AS BIGINT) AS gn FROM cells GROUP BY 1),
       |pm AS (SELECT pred, CAST(sum(n) AS BIGINT) AS pn FROM cells GROUP BY 1)
       |SELECT cells.gold, cells.pred, cells.n,
       |  cells.n * 1000000 // gm.gn AS recall_ppm,
       |  cells.n * 1000000 // pm.pn AS precision_ppm
       |FROM cells JOIN gm USING (gold) JOIN pm USING (pred)
       |ORDER BY gold, pred""".stripMargin

  // ---- t2: quality scoring ----
  // Single-division doubles only: both engines do the same IEEE ops in
  // the same order, so the exact-equality oracle contract holds.
  def t2Quality(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).as("n_tokens"),
        hits(EN).as("stop_hits"))
      .withColumn("mean_word_len",
        (col("n_chars") - col("n_tokens") + 1).cast("double") / col("n_tokens"))
      .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tokens"))
      .withColumn("quality_score",
        when(col("n_chars").between(100, 2000), lit(0.5)).otherwise(lit(0.0))
          + lit(0.5) * col("stop_ratio"))
      .orderBy(col("doc_id"))

  lazy val t2Sql: String =
    s"""SELECT doc_id, n_chars,
       |  len(string_split(text,' ')) AS n_tokens,
       |  len(list_filter(string_split(text,' '), w -> w IN ${sqlSet(EN)})) AS stop_hits,
       |  CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens AS mean_word_len,
       |  CAST(stop_hits AS DOUBLE) / n_tokens AS stop_ratio,
       |  (CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 0.5 ELSE 0.0 END)
       |    + 0.5 * (CAST(stop_hits AS DOUBLE) / n_tokens) AS quality_score
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---- t3: token counting (whitespace + wordpiece-ish regex) ----
  def t3Tokens(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).as("re_tokens"),
        size(array_distinct(split(col("text"), " "))).as("distinct_tokens"))
      .orderBy(col("doc_id"))

  lazy val t3Sql: String =
    """SELECT doc_id,
      |  len(string_split(text,' ')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS re_tokens,
      |  len(list_distinct(string_split(text,' '))) AS distinct_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- t4: polynomial rolling-hash fingerprint ----
  // fold over per-word values (len*31 + first-char code), mod 2^31-1;
  // pure integer arithmetic → bit-identical across engines and scales.
  def t4Fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        expr("""aggregate(
                |  transform(split(text, ' '), w -> length(w)*31 + ascii(substring(w,1,1))),
                |  cast(0 as bigint),
                |  (acc, x) -> (acc*1000003 + x) % 2147483647)""".stripMargin)
          .as("fingerprint"))
      .orderBy(col("doc_id"))

  lazy val t4Sql: String =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(text,' '),
      |                     w -> CAST(length(w)*31 + ascii(substr(w,1,1)) AS BIGINT))),
      |    (acc, x) -> (acc*1000003 + x) % 2147483647) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- t5: corpus-level word-3-gram frequency (explode + agg) ----
  // `ws` is materialized as a column BEFORE the transform lambda:
  // referencing split(text) inside the lambda would re-split the text
  // on every element access (O(words²) per doc).
  def t5NgramFreq(spark: SparkSession, dir: String): DataFrame = {
    val ws = col("ws")
    val grams = when(size(ws) >= 3,
        transform(sequence(lit(1), size(ws) - 2),
          i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))))
      .otherwise(array())
    docs(spark, dir)
      .select(split(col("text"), " ").as("ws"))
      .select(explode(grams).as("ngram"))
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("ngram"))
      .limit(100)
  }

  lazy val t5Sql: String =
    """WITH w AS (SELECT string_split(text,' ') AS ws FROM documents),
      |g AS (SELECT unnest(list_transform(generate_series(1, len(ws)-2),
      |                                   i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS ngram
      |      FROM w WHERE len(ws) >= 3)
      |SELECT ngram, count(*) AS freq FROM g
      |GROUP BY ngram ORDER BY freq DESC, ngram LIMIT 100""".stripMargin

  // ---- t6: sequence packing (token-budget bins per source shard) ----
  // The training-data step that turns documents into fixed-budget
  // context windows: running token total per source ordered by doc_id,
  // bin = exclusive-prefix DIV budget. Output is per-bin occupancy,
  // the packing manifest a loader consumes.
  //
  // The prefix sum is TWO-PHASE so it parallelizes WITHIN a source
  // (source cardinality is ~fixed, so a window partitioned by source
  // alone would be one task scanning n/|sources| rows at 100 TB):
  //   1. shard = doc_id DIV span — contiguous doc_id ranges, so shard
  //      order ≡ doc_id order within a source; the heavy window
  //      partitions by (source, shard) and shard COUNT grows with the
  //      data, so parallelism does too;
  //   2. per-(source, shard) token totals (one row per shard — the
  //      only window over `source` alone runs on THIS tiny table) give
  //      exclusive running offsets, broadcast-joined back.
  // cum = local_cum + offset is bit-identical to the single-window
  // formulation for ANY span, so `span` is a pure scale knob: offsets
  // rows = n_docs/span; size it so that stays broadcastable
  // (span ≈ n_docs / (100 × shuffle partitions) in production).
  private val PackBudget = 4096
  private[text] val ShardSpan: Int =
    sys.env.get("SPARK_GRAFT_PACK_SHARD_SPAN").map(_.toInt).getOrElse(128)

  /** The two-phase packing manifest over any (doc_id, source, toks)
    * table — t6's core, factored so the composed curation pipeline
    * (t9) can pack its curated subset. Sparse doc_ids (post-filter,
    * post-dedup) are fine: shard order ≡ doc_id order within a source
    * regardless of gaps, so the two-phase sum stays bit-identical to
    * the single-window formulation. */
  private[text] def packManifest(tk0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = tk0.withColumn("shard", expr(s"doc_id DIV $ShardSpan"))
    // phase 1: intra-shard running totals (scales with shard count)
    val wShard = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = tk.withColumn("local_cum", sum(col("toks")).over(wShard))
    // phase 2: exclusive per-shard offsets over the tiny totals table
    val wOff = Window.partitionBy(col("source")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = tk.groupBy(col("source"), col("shard"))
      .agg(sum(col("toks")).as("shard_toks"))
      .withColumn("offset", coalesce(sum(col("shard_toks")).over(wOff), lit(0L)))
      .select(col("source"), col("shard"), col("offset"))
    local.join(broadcast(offsets), Seq("source", "shard"))
      .withColumn("cum", col("local_cum") + col("offset"))
      .withColumn("bin", expr(s"(cum - toks) DIV $PackBudget"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("bin_tokens"))
      .orderBy(col("source"), col("bin"))
  }

  def t6PackSequences(spark: SparkSession, dir: String): DataFrame =
    packManifest(docs(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).as("toks")))

  lazy val t6Sql: String =
    s"""WITH tk AS (
       |  SELECT doc_id, source, len(string_split(text,' ')) AS toks FROM documents),
       |c AS (
       |  SELECT *, sum(toks) OVER (PARTITION BY source ORDER BY doc_id
       |                            ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM tk)
       |SELECT source, CAST((cum - toks) // $PackBudget AS BIGINT) AS bin,
       |  count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS bin_tokens
       |FROM c GROUP BY source, bin ORDER BY source, bin""".stripMargin

  // ---- t7: deterministic train/validation split ----
  // Hash-based splitting (no stored random state, reproducible on any
  // engine/cluster): 90/100 hash buckets → train. Pure map + aggregate
  // — embarrassingly parallel; the key is mod-reduced before the
  // multiply, so the arithmetic is overflow-safe at any id scale.
  def t7SampleSplit(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("h", expr("((doc_id % 2147483647) * 2654435761) % 2147483647"))
      .withColumn("split", when(col("h") % 100 < 90, lit("train")).otherwise(lit("val")))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).as("n_tokens"))
      .orderBy(col("source"), col("split"))

  lazy val t7Sql: String =
    """WITH h AS (
      |  SELECT source, text,
      |    CASE WHEN ((doc_id % 2147483647) * 2654435761) % 2147483647 % 100 < 90
      |         THEN 'train' ELSE 'val' END AS split
      |  FROM documents)
      |SELECT source, split, count(*) AS n_docs,
      |  CAST(sum(len(string_split(text,' '))) AS BIGINT) AS n_tokens
      |FROM h GROUP BY source, split ORDER BY source, split""".stripMargin

  // ---- t8: end-to-end quality filter (the curation pipeline step) ----
  // Composes t1's language ID and t2's quality score in ONE scan —
  // predicates and per-row features all evaluate inside the same
  // codegen stage, then a single (source, lang) aggregate reports what
  // survives. This is the shape of a real corpus-curation pass: at
  // 100 TB the filter runs as a narrow map over the documents scan and
  // only retained-row STATISTICS shuffle, never the text itself.
  private val QualityFloor = 0.25

  def t8QualityFilter(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        size(split(col("text"), " ")).as("n_tokens"),
        hits(EN).as("en_hits"), hits(DE).as("de_hits"), hits(FR).as("fr_hits"))
      .withColumn("pred_lang",
        when(col("en_hits") + col("de_hits") + col("fr_hits") === 0, lit("unknown"))
          .when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits"), lit("en"))
          .when(col("de_hits") >= col("fr_hits"), lit("de"))
          .otherwise(lit("fr")))
      .withColumn("quality_score",
        when(col("n_chars").between(100, 2000), lit(0.5)).otherwise(lit(0.0))
          + lit(0.5) * (col("en_hits").cast("double") / col("n_tokens")))
      .filter(col("pred_lang") =!= "unknown" && col("quality_score") >= QualityFloor)
      .groupBy(col("source"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy(col("source"), col("pred_lang"))

  lazy val t8Sql: String =
    s"""WITH f AS (
       |  SELECT doc_id, source, n_chars,
       |    len(string_split(text,' ')) AS n_tokens,
       |    len(list_filter(string_split(text,' '), w -> w IN ${sqlSet(EN)})) AS en_hits,
       |    len(list_filter(string_split(text,' '), w -> w IN ${sqlSet(DE)})) AS de_hits,
       |    len(list_filter(string_split(text,' '), w -> w IN ${sqlSet(FR)})) AS fr_hits
       |  FROM documents),
       |scored AS (
       |  SELECT source, n_tokens,
       |    CASE WHEN en_hits + de_hits + fr_hits = 0 THEN 'unknown'
       |         WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
       |         WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END AS pred_lang,
       |    (CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 0.5 ELSE 0.0 END)
       |      + 0.5 * (CAST(en_hits AS DOUBLE) / n_tokens) AS quality_score
       |  FROM f)
       |SELECT source, pred_lang, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       |FROM scored
       |WHERE pred_lang != 'unknown' AND quality_score >= $QualityFloor
       |GROUP BY source, pred_lang ORDER BY source, pred_lang""".stripMargin

  // ---- t9: the END-TO-END curation pipeline, one gated query ----
  // The full pass a training-data build runs, composed from the gated
  // pieces: t8's language/quality filter → d1's exact dedup (keep the
  // min doc_id per md5 group, over the SURVIVORS) → t7's deterministic
  // hash split (train side) → t6's two-phase packing manifest. At
  // 100 TB this is one narrow scan computing all per-doc features in
  // codegen, then exactly three bounded shuffles: the md5-group dedup
  // (combine shrinks to distinct volume), the (source, shard) packing
  // window, and the final (source, bin) aggregate — the split is a
  // map-side predicate and the shard offsets broadcast.
  def t9CurationPipeline(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val feat = docs(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"), col("text"),
        size(split(col("text"), " ")).as("toks"),
        hits(EN).as("en_hits"), hits(DE).as("de_hits"), hits(FR).as("fr_hits"))
      .withColumn("pred_lang",
        when(col("en_hits") + col("de_hits") + col("fr_hits") === 0, lit("unknown"))
          .when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits"), lit("en"))
          .when(col("de_hits") >= col("fr_hits"), lit("de"))
          .otherwise(lit("fr")))
      .withColumn("quality_score",
        when(col("n_chars").between(100, 2000), lit(0.5)).otherwise(lit(0.0))
          + lit(0.5) * (col("en_hits").cast("double") / col("toks")))
      .filter(col("pred_lang") =!= "unknown" && col("quality_score") >= QualityFloor)
    val kept = feat
      .withColumn("keep_id", min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("keep_id"))
    val train = kept
      .withColumn("h", expr("((doc_id % 2147483647) * 2654435761) % 2147483647"))
      .filter(col("h") % 100 < 90)
    packManifest(train.select(col("doc_id"), col("source"), col("toks")))
  }

  lazy val t9Sql: String =
    s"""WITH f AS (
       |  SELECT doc_id, source, n_chars, text,
       |    len(string_split(text,' ')) AS toks,
       |    len(list_filter(string_split(text,' '), w -> w IN ${sqlSet(EN)})) AS en_hits,
       |    len(list_filter(string_split(text,' '), w -> w IN ${sqlSet(DE)})) AS de_hits,
       |    len(list_filter(string_split(text,' '), w -> w IN ${sqlSet(FR)})) AS fr_hits
       |  FROM documents),
       |scored AS (
       |  SELECT doc_id, source, text, toks,
       |    CASE WHEN en_hits + de_hits + fr_hits = 0 THEN 'unknown'
       |         WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
       |         WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END AS pred_lang,
       |    (CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 0.5 ELSE 0.0 END)
       |      + 0.5 * (CAST(en_hits AS DOUBLE) / toks) AS quality_score
       |  FROM f),
       |kept AS (
       |  SELECT doc_id, source, toks FROM scored
       |  WHERE pred_lang != 'unknown' AND quality_score >= $QualityFloor
       |  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY md5(text))),
       |train AS (
       |  SELECT * FROM kept
       |  WHERE ((doc_id % 2147483647) * 2654435761) % 2147483647 % 100 < 90),
       |c AS (
       |  SELECT *, sum(toks) OVER (PARTITION BY source ORDER BY doc_id
       |                            ROWS UNBOUNDED PRECEDING) AS cum
       |  FROM train)
       |SELECT source, CAST((cum - toks) // $PackBudget AS BIGINT) AS bin,
       |  count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS bin_tokens
       |FROM c GROUP BY source, bin ORDER BY source, bin""".stripMargin

  // ---- t10: per-document top-k TF-IDF terms ----
  // The keyword-extraction pass of a corpus pipeline: term frequency
  // per (doc, word), document frequency per word, score = tf·N/df.
  // The idf factor is the exact rational N/df folded into ONE double
  // division (CAST(tf·N AS DOUBLE)/df — a single correctly-rounded
  // IEEE op on both engines) instead of log(N/df): same ranking
  // (log is monotone), none of libm's cross-engine drift.
  // Plan at scale: explode → (doc_id, word) counts (map-side
  // combined), df = one more aggregate over the distinct pairs, join
  // back on word (vocabulary-keyed — Zipf-bounded, far below corpus
  // row count), then the top-k window partitioned by doc_id — a
  // grow-with-data key with per-doc row count bounded by doc length.
  private val TfIdfK = 3

  def t10Tfidf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    val tf = words.groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = docs(spark, dir).agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word"))
    tf.join(df, Seq("word"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf") * col("n_docs")).cast("double") / col("df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TfIdfK)
      .select(col("doc_id"), col("word"), col("tf"), col("df"),
        col("score"), col("rank"))
      .orderBy(col("doc_id"), col("rank"))
  }

  lazy val t10Sql: String =
    s"""WITH words AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
       |tf AS (SELECT doc_id, word, count(*) AS tf FROM words GROUP BY doc_id, word),
       |df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.word, tf.tf, df.df,
       |    CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
       |  FROM tf JOIN df USING (word) CROSS JOIN n),
       |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
       |        ORDER BY score DESC, word) AS rank FROM scored)
       |SELECT doc_id, word, tf, df, score, CAST(rank AS INTEGER) AS rank
       |FROM r WHERE rank <= $TfIdfK ORDER BY doc_id, rank""".stripMargin

  // ---- t11: stratified mixture sampling (corpus re-balancing) ----
  // The mixture-construction step after curation: a raw crawl is
  // wildly imbalanced across (source, language) strata, and training
  // recipes re-balance it (cap the dominant strata / temperature-
  // sample the tail — the multilingual sampling trick). Two passes,
  // exactly like a production mixture builder:
  //   1. count each (source, pred_lang) stratum — a tiny aggregate
  //      (stratum cardinality, not corpus-sized);
  //   2. re-scan with the per-stratum keep-rate BROADCAST back and
  //      keep doc iff hash(doc_id) mod 1e6 < rate_ppm — the same
  //      deterministic splitter hash as t7, so the sample is
  //      reproducible run-to-run and engine-to-engine.
  // rate_ppm = min(1e6, cap·1e6 div n_stratum) in pure integer
  // arithmetic (no float rounding to disagree on). At 100 TB pass 1
  // is a map-side-combined agg shuffling |strata| rows and pass 2 is
  // a narrow codegen'd scan against a broadcast map — nothing
  // corpus-sized ever shuffles, and the expected output per stratum
  // is ≤ StratumCap docs, which is the point of the operator.
  // 15 bites at every scale ≥ sf0.01 (dominant strata hold ~25 docs
  // at the gate scale and grow from there) while sf0.001's ~3-doc
  // strata stay uncapped — both branches of the rate are gated
  private val StratumCap = 15L

  def t11MixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val f = docs(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).as("n_tokens"),
        hits(EN).as("en_hits"), hits(DE).as("de_hits"), hits(FR).as("fr_hits"))
      .withColumn("pred_lang",
        when(col("en_hits") + col("de_hits") + col("fr_hits") === 0, lit("unknown"))
          .when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits"), lit("en"))
          .when(col("de_hits") >= col("fr_hits"), lit("de"))
          .otherwise(lit("fr")))
      .select(col("doc_id"), col("source"), col("pred_lang"), col("n_tokens"))
    val rates = f.groupBy(col("source"), col("pred_lang"))
      .agg(count(lit(1)).as("n_stratum"))
      .withColumn("rate_ppm",
        expr(s"least(1000000L, ${StratumCap}000000L div n_stratum)"))
    f.join(broadcast(rates), Seq("source", "pred_lang"))
      .withColumn("h", expr("((doc_id % 2147483647) * 2654435761) % 2147483647"))
      .withColumn("keep", col("h") % 1000000 < col("rate_ppm"))
      .groupBy(col("source"), col("pred_lang"))
      .agg(min(col("n_stratum")).as("n_stratum"),
        min(col("rate_ppm")).as("rate_ppm"),
        coalesce(sum(when(col("keep"), 1L)), lit(0L)).as("n_sampled"),
        coalesce(sum(when(col("keep"), col("n_tokens"))), lit(0L)).as("tok_sampled"))
      .orderBy(col("source"), col("pred_lang"))
  }

  lazy val t11Sql: String =
    s"""WITH f AS (
       |  SELECT doc_id, source,
       |    len(string_split(text,' ')) AS n_tokens,
       |    len(list_filter(string_split(text,' '), w -> w IN ${sqlSet(EN)})) AS en_hits,
       |    len(list_filter(string_split(text,' '), w -> w IN ${sqlSet(DE)})) AS de_hits,
       |    len(list_filter(string_split(text,' '), w -> w IN ${sqlSet(FR)})) AS fr_hits
       |  FROM documents),
       |lf AS (
       |  SELECT doc_id, source, n_tokens,
       |    CASE WHEN en_hits + de_hits + fr_hits = 0 THEN 'unknown'
       |         WHEN en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
       |         WHEN de_hits >= fr_hits THEN 'de' ELSE 'fr' END AS pred_lang
       |  FROM f),
       |rates AS (
       |  SELECT source, pred_lang, count(*) AS n_stratum,
       |    least(1000000, ${StratumCap}000000 // count(*)) AS rate_ppm
       |  FROM lf GROUP BY source, pred_lang)
       |SELECT lf.source, lf.pred_lang,
       |  CAST(min(r.n_stratum) AS BIGINT) AS n_stratum,
       |  CAST(min(r.rate_ppm) AS BIGINT) AS rate_ppm,
       |  CAST(coalesce(sum(CASE WHEN
       |    ((lf.doc_id % 2147483647) * 2654435761) % 2147483647 % 1000000
       |      < r.rate_ppm THEN 1 END), 0) AS BIGINT) AS n_sampled,
       |  CAST(coalesce(sum(CASE WHEN
       |    ((lf.doc_id % 2147483647) * 2654435761) % 2147483647 % 1000000
       |      < r.rate_ppm THEN lf.n_tokens END), 0) AS BIGINT) AS tok_sampled
       |FROM lf JOIN rates r ON lf.source = r.source AND lf.pred_lang = r.pred_lang
       |GROUP BY lf.source, lf.pred_lang
       |ORDER BY lf.source, lf.pred_lang""".stripMargin

  // ---- t12: repetition metrics — the Gopher/MassiveText filter class ----
  // The quality signals t2's surface ratios can't see: INTERNAL
  // repetition. Per doc, (a) the most-frequent-word fraction and (b)
  // the duplicate-2-gram fraction — boilerplate, keyword stuffing and
  // degenerate generations score high on both, and production corpus
  // curation (Gopher's repetition rules) drops on thresholds exactly
  // like `keep` here. Both are exact integer ratios (one IEEE division
  // each at the end), so the gate is exact.
  //
  // Scale shape: the top-word count goes through explode + TWO
  // map-side-combined aggregates keyed by doc_id — never an in-row
  // O(words·distinct) fold, and never a corpus-wide vocabulary
  // shuffle (the key is (doc_id, word): cardinality ≤ total tokens,
  // combiners collapse within-doc repeats before the exchange). The
  // 2-gram dedup stays IN-ROW (size − size∘array_distinct — Spark's
  // array_distinct is a linear hash-set pass), so the join back is
  // doc_id ⋈ doc_id, co-partitioned with the aggregate's own output.
  private val TopWordMax = 0.2
  private val Dup2gramMax = 0.2

  def t12Repetition(spark: SparkSession, dir: String): DataFrame =
    repetitionOf(docs(spark, dir))

  /** The repetition metrics over any (doc_id, text) frame — factored
    * so specs can feed synthetic corpora with known repetition. */
  def repetitionOf(d: DataFrame): DataFrame = {
    val base = d
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val top = base.select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top_word_cnt"))
    val g2 = when(size(col("ws")) >= 2,
        transform(sequence(lit(1), size(col("ws")) - 1),
          i => concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1))))
      .otherwise(array().cast("array<string>"))
    base
      .withColumn("g2", g2)
      .select(col("doc_id"), size(col("ws")).as("n_words"),
        size(col("g2")).as("n_2grams"),
        (size(col("g2")) - size(array_distinct(col("g2")))).as("dup_2gram"))
      .join(top, Seq("doc_id"))
      .withColumn("top_frac",
        col("top_word_cnt").cast("double") / col("n_words"))
      .withColumn("dup2_frac",
        when(col("n_2grams") > 0,
          col("dup_2gram").cast("double") / col("n_2grams")).otherwise(lit(0.0)))
      .withColumn("keep",
        col("top_frac") <= TopWordMax && col("dup2_frac") <= Dup2gramMax)
      .select(col("doc_id"), col("n_words"), col("top_word_cnt"), col("top_frac"),
        col("dup_2gram"), col("dup2_frac"), col("keep"))
      .orderBy(col("doc_id"))
  }

  lazy val t12Sql: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |top AS (
       |  SELECT doc_id, max(c) AS top_word_cnt FROM (
       |    SELECT doc_id, wrd, count(*) AS c FROM (
       |      SELECT doc_id, unnest(ws) AS wrd FROM w) u
       |    GROUP BY doc_id, wrd) x
       |  GROUP BY doc_id),
       |g AS (
       |  SELECT doc_id, len(ws) AS n_words,
       |    CASE WHEN len(ws) >= 2
       |         THEN list_transform(generate_series(1, len(ws) - 1),
       |                             i -> ws[i] || ' ' || ws[i + 1])
       |         ELSE [] END AS g2
       |  FROM w),
       |d AS (
       |  SELECT doc_id, n_words, len(g2) AS n_2grams,
       |    len(g2) - len(list_distinct(g2)) AS dup_2gram
       |  FROM g)
       |SELECT d.doc_id, d.n_words, t.top_word_cnt,
       |  CAST(t.top_word_cnt AS DOUBLE) / d.n_words AS top_frac,
       |  d.dup_2gram,
       |  CASE WHEN d.n_2grams > 0
       |       THEN CAST(d.dup_2gram AS DOUBLE) / d.n_2grams ELSE 0.0 END AS dup2_frac,
       |  (CAST(t.top_word_cnt AS DOUBLE) / d.n_words <= $TopWordMax
       |   AND (CASE WHEN d.n_2grams > 0
       |             THEN CAST(d.dup_2gram AS DOUBLE) / d.n_2grams
       |             ELSE 0.0 END) <= $Dup2gramMax) AS keep
       |FROM d JOIN top t USING (doc_id) ORDER BY d.doc_id""".stripMargin

  // ---- t13: sensitive-term redaction (the PII-scrub shape) ----
  // Production curation scrubs emails/phones/SSNs with a bank of
  // regexes; the machinery is identical for any term source, so the
  // synthetic corpus exercises it with a dictionary that actually
  // hits. The scrub operates on the SPLIT WORD ARRAY, not a regex
  // over the raw string: a CASE inside `transform` is engine-portable
  // to the bit (Java regex vs RE2 word-boundary semantics diverge),
  // stays in whole-stage codegen, and the redaction count is a
  // `filter` over the same array — one narrow scan, zero shuffle,
  // nothing corpus-sized moves at any scale. `redacted_fp` is t4's
  // rolling-hash fingerprint over the SCRUBBED stream, the artifact a
  // downstream dedup would key on (redaction must not split exact-dup
  // groups whose only difference was the scrubbed spans).
  private val Sensitive = Seq("customer", "key", "value")
  private val Placeholder = "[X]"

  def t13Redact(spark: SparkSession, dir: String): DataFrame =
    redactOf(docs(spark, dir))

  /** Redaction over any (doc_id, text) frame — factored so specs can
    * feed corpora with known sensitive-term placement. */
  def redactOf(d: DataFrame): DataFrame =
    d.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"),
        size(col("ws")).as("n_words"),
        size(filter(col("ws"), w => w.isInCollection(Sensitive))).as("n_redacted"),
        expr(s"""aggregate(
                |  transform(
                |    transform(ws, w -> CASE WHEN w IN ${sqlSet(Sensitive)}
                |                            THEN '$Placeholder' ELSE w END),
                |    w -> length(w)*31 + ascii(substring(w,1,1))),
                |  cast(0 as bigint),
                |  (acc, x) -> (acc*1000003 + x) % 2147483647)""".stripMargin)
          .as("redacted_fp"))
      .orderBy(col("doc_id"))

  lazy val t13Sql: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
       |SELECT doc_id,
       |  len(ws) AS n_words,
       |  len(list_filter(ws, x -> x IN ${sqlSet(Sensitive)})) AS n_redacted,
       |  list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(
       |        list_transform(ws, x -> CASE WHEN x IN ${sqlSet(Sensitive)}
       |                                     THEN '$Placeholder' ELSE x END),
       |        x -> CAST(length(x)*31 + ascii(substr(x,1,1)) AS BIGINT))),
       |    (acc, x) -> (acc*1000003 + x) % 2147483647) AS redacted_fp
       |FROM w ORDER BY doc_id""".stripMargin

  // ---- t14: feature-hashed document embeddings ----
  // The hashing-trick bag-of-words embedder (Weinberger et al. 2009):
  // dim = word-hash mod D, value = occurrence count — the cheap
  // trainable-model-free embedding that bridges `documents` into the
  // s-family's vector surface (kNN/dedup/clustering over docs without
  // an external model). Built ENTIRELY in-row: the per-word dims are
  // one transform, and the D-dim count vector is a fixed
  // sequence(0,D-1) scan over them — no explode, no shuffle, one
  // codegen'd pass whatever the corpus size. Counts are exact
  // integers, so the gate is bit-exact; consumers normalize (v1's
  // job) if they need cosine geometry.
  private val EmbedDims = 16

  /** Gate view: the 16 exact-integer dims as scalar columns (array
    * columns don't hash in the driver compare; the v1 convention —
    * except integer counts let us gate EVERY dim, not a prefix). */
  def t14HashEmbed(spark: SparkSession, dir: String): DataFrame =
    hashEmbedOf(docs(spark, dir))
      .select(col("doc_id") +:
        (0 until EmbedDims).map(i =>
          element_at(col("doc_vec"), i + 1).as(f"v$i%02d")): _*)
      .orderBy(col("doc_id"))

  /** The hashed embedding of any (doc_id, text) frame; word hash =
    * the d2 family's portable (length, first, last) integer hash, so
    * both engines bucket identically. */
  def hashEmbedOf(d: DataFrame): DataFrame =
    d.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("dims",
        expr(s"""transform(ws, w ->
                |  ((cast(length(w) as bigint)*31 + ascii(substring(w,1,1)))*31
                |   + ascii(substring(w,-1,1))) % $EmbedDims)""".stripMargin))
      .select(col("doc_id"),
        expr(s"""transform(sequence(0, ${EmbedDims - 1}),
                |  i -> cast(size(filter(dims, d -> d = i)) as bigint))""".stripMargin)
          .as("doc_vec"))
      .orderBy(col("doc_id"))

  lazy val t14Sql: String = {
    val dimCols = (0 until EmbedDims)
      .map(i => f"  CAST(len(list_filter(dims, x -> x = $i)) AS BIGINT) AS v$i%02d")
      .mkString(",\n")
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |d AS (SELECT doc_id,
       |  list_transform(ws, x ->
       |    ((CAST(length(x) AS BIGINT)*31 + ascii(substr(x,1,1)))*31
       |     + ascii(substr(x,-1,1))) % $EmbedDims) AS dims
       |  FROM w)
       |SELECT doc_id,
       |$dimCols
       |FROM d ORDER BY doc_id""".stripMargin
  }

  // ---- t15: common-bigram coverage (n-gram LM quality proxy) ----
  // The CCNet/KenLM quality-filter shape without the float LM: score
  // each document by how much of it is made of CORPUS-COMMON bigrams
  // (freq >= CommonMin across the corpus). Fluent/boilerplate text
  // scores high, noise and mangled extractions score low — the same
  // signal an n-gram LM perplexity gives, but as exact integer ppm
  // (counts and one integer division; no log-prob floats, so the
  // oracle contract stays exact equality). Plan: one linear bigram
  // explode feeds BOTH consumers (corpus counts and the per-doc
  // verdict); the common set joins back on the bigram key — a
  // co-partitioned equi-join that AQE skew-splits on hot boilerplate
  // bigrams, never a broadcast of an unbounded vocabulary.
  private val CommonMin = 3

  /** One (doc_id, bigram) row per positional bigram — the shared
    * explode behind t15's coverage and t28's LM score (one corpus
    * pass serves both; DfCache key "doc_bigrams"). */
  private[graft] def docBigrams(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "doc_bigrams") {
      val ws = col("ws")
      val grams = when(size(ws) >= 2,
          transform(sequence(lit(1), size(ws) - 1),
            i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
        .otherwise(array().cast("array<string>"))
      docs(spark, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), explode(grams).as("bg"))
    }

  def t15BigramCoverage(spark: SparkSession, dir: String): DataFrame = {
    val dg = docBigrams(spark, dir)
    val common = dg.groupBy(col("bg")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= CommonMin)
      .select(col("bg"), lit(1).as("hit"))
    dg.join(common, Seq("bg"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), count(col("hit")).as("n_common"))
      .withColumn("coverage_ppm", expr("n_common * 1000000 DIV n_bigrams"))
      .orderBy(col("doc_id"))
  }

  lazy val t15Sql: String =
    s"""WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
       |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws)-1),
       |                                           i -> ws[i]||' '||ws[i+1])) AS bg
       |      FROM w WHERE len(ws) >= 2),
       |c AS (SELECT bg FROM g GROUP BY bg HAVING count(*) >= $CommonMin)
       |SELECT g.doc_id, count(*) AS n_bigrams, count(c.bg) AS n_common,
       |  count(c.bg) * 1000000 // count(*) AS coverage_ppm
       |FROM g LEFT JOIN c ON g.bg = c.bg
       |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin

  // ---- t34: collocation mining (PMI lift over adjacent pairs) ----
  // The classic collocation extractor (Church & Hanks 1990): for each
  // adjacent token pair, how much MORE often does it occur than the
  // independence model predicts — lift = p(ab)/(p(a)·p(b)), which is
  // exp(PMI), shipped as exact-integer ppm so the ranking gates
  // without float logs. Marginals, total and pair counts all derive
  // from ONE grouped re-aggregation of the shared docBigrams explode
  // (the same cached pass t15/t28 read): pair table is vocab²-bounded
  // after the count-≥-MinColloc floor, the two marginal joins are
  // vocabulary-keyed hash joins, the one-row total broadcasts, and
  // the final top-100 is a TakeOrdered — no corpus-row re-shuffle
  // anywhere. The ppm arithmetic promotes to DECIMAL(38,0)/HUGEINT
  // because n_pair·N_total·1e6 genuinely exceeds BIGINT once the
  // corpus passes ~1e12 bigrams. (w1,w2) is unique per row, so the
  // DESC-lift + lexicographic tiebreak makes the limit deterministic.
  private val MinColloc = 5
  def t34Collocations(spark: SparkSession, dir: String): DataFrame = {
    val pairs = docBigrams(spark, dir)
      .select(split(col("bg"), " ").as("ws"))
      .select(col("ws").getItem(0).as("w1"), col("ws").getItem(1).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
    val left = pairs.groupBy(col("w1")).agg(sum(col("n_pair")).as("c1"))
    val right = pairs.groupBy(col("w2")).agg(sum(col("n_pair")).as("c2"))
    val total = pairs.agg(sum(col("n_pair")).as("n_total"))
    pairs.filter(col("n_pair") >= MinColloc)
      .join(left, Seq("w1")).join(right, Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("n_pair"),
        expr("""CAST(CAST(n_pair AS DECIMAL(38,0)) * n_total * 1000000
               |  div (CAST(c1 AS DECIMAL(38,0)) * c2) AS BIGINT)""".stripMargin)
          .as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .limit(100)
  }

  lazy val t34Sql: String =
    s"""WITH w AS (SELECT string_split(text,' ') AS ws FROM documents),
       |g AS (SELECT ws[i] AS w1, ws[i + 1] AS w2
       |      FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
       |            FROM w WHERE len(ws) >= 2) b),
       |p AS (SELECT w1, w2, count(*) AS n_pair FROM g GROUP BY 1, 2),
       |l AS (SELECT w1, CAST(sum(n_pair) AS HUGEINT) AS c1 FROM p GROUP BY 1),
       |r AS (SELECT w2, CAST(sum(n_pair) AS HUGEINT) AS c2 FROM p GROUP BY 1),
       |n AS (SELECT CAST(sum(n_pair) AS HUGEINT) AS n_total FROM p)
       |SELECT p.w1, p.w2, CAST(p.n_pair AS BIGINT) AS n_pair,
       |  CAST(CAST(p.n_pair AS HUGEINT) * n.n_total * 1000000
       |    // (l.c1 * r.c2) AS BIGINT) AS lift_ppm
       |FROM p JOIN l ON p.w1 = l.w1 JOIN r ON p.w2 = r.w2 CROSS JOIN n
       |WHERE p.n_pair >= $MinColloc
       |ORDER BY lift_ppm DESC, p.w1, p.w2 LIMIT 100""".stripMargin

  // ---- t35: cross-source vocabulary overlap (domain-shift gauge) ----
  // For every pair of sources: vocabulary sizes, shared-type count,
  // Jaccard |A∩B|/|A∪B| and the SMALLER side's containment
  // |A∩B|/min(|A|,|B|) — both exact ppm. The corpus-comparison
  // operator a mixture designer reads before weighting sources
  // (t11): near-disjoint vocabularies mean the mixture adds breadth,
  // near-identical ones mean it only adds mass. Scale shape: the
  // corpus-sized token explode collapses to the distinct
  // (source, word) TYPE table first (vocab-sized, ~√corpus by
  // Heaps), the pair intersection is a word-keyed co-partitioned
  // self-join on that small table, marginals re-aggregate it, and
  // the output is |sources|² rows. No corpus-row self-join anywhere.
  def t35SourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val sv = docs(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .distinct()
    val vocab = sv.groupBy(col("source")).agg(count(lit(1)).as("v"))
    val shared = sv.as("a").join(sv.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(vocab.select(col("source").as("source_a"), col("v").as("v_a")),
        Seq("source_a"))
      .join(vocab.select(col("source").as("source_b"), col("v").as("v_b")),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("v_a"), col("v_b"),
        col("shared"),
        expr("shared * 1000000 div (v_a + v_b - shared)").as("jaccard_ppm"),
        expr("shared * 1000000 div least(v_a, v_b)").as("containment_ppm"))
      .orderBy(col("source_a"), col("source_b"))
  }

  lazy val t35Sql: String =
    """WITH sv AS (
      |  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS w
      |  FROM documents),
      |vocab AS (SELECT source, count(*) AS v FROM sv GROUP BY 1),
      |sh AS (SELECT a.source AS source_a, b.source AS source_b,
      |    count(*) AS shared
      |  FROM sv a JOIN sv b ON a.w = b.w AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT sh.source_a, sh.source_b,
      |  va.v AS v_a, vb.v AS v_b, sh.shared,
      |  sh.shared * 1000000 // (va.v + vb.v - sh.shared) AS jaccard_ppm,
      |  sh.shared * 1000000 // least(va.v, vb.v) AS containment_ppm
      |FROM sh JOIN vocab va ON sh.source_a = va.source
      |JOIN vocab vb ON sh.source_b = vb.source
      |ORDER BY source_a, source_b""".stripMargin

  // ---- t28: train-split bigram LM score (held-out fluency gauge) ----
  // t15 scores documents against the WHOLE corpus — fine for triage,
  // but a quality model must be fit on train and evaluated on held-out
  // text or it grades its own memory. t28 is that honest version: the
  // t27 90/10 hash split fits a bigram frequency table on train only,
  // and each VAL document is scored by the mean log2-bucketed train
  // frequency of its bigrams — an integer-exact perplexity proxy
  // (floor(log2(cnt+1)) via binary-string length, bit-identical on
  // both engines; no float logs) plus the OOV count a filter
  // thresholds directly. Plan: the shared doc_bigrams explode splits
  // on the hash; train reduces to a (bg, cnt) table and val hash-joins
  // it on the bigram key — co-partitioned, AQE-skew-split on hot
  // boilerplate bigrams, vocabulary never broadcast.
  def t28LmScore(spark: SparkSession, dir: String): DataFrame = {
    val dg = docBigrams(spark, dir)
    val isVal =
      expr("((doc_id % 2147483647) * 2654435761) % 2147483647 % 100 >= 90")
    val train = dg.filter(!isVal)
      .groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
    dg.filter(isVal).join(train, Seq("bg"), "left_outer")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("lg", (length(bin(col("cnt") + 1)) - 1).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("cnt") === 0L, 1L).otherwise(0L)).as("n_oov"),
        sum(col("lg")).as("sum_lg"))
      .withColumn("lm_score_milli", expr("sum_lg * 1000 div n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"), col("n_oov"),
        col("lm_score_milli"))
      .orderBy(col("doc_id"))
  }

  lazy val t28Sql: String =
    """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws)-1),
      |                                           i -> ws[i]||' '||ws[i+1])) AS bg
      |      FROM w WHERE len(ws) >= 2),
      |tr AS (SELECT bg, count(*) AS cnt FROM g
      |       WHERE ((doc_id % 2147483647) * 2654435761) % 2147483647 % 100 < 90
      |       GROUP BY bg),
      |vl AS (SELECT g.doc_id, coalesce(tr.cnt, 0) AS cnt
      |       FROM g LEFT JOIN tr USING (bg)
      |       WHERE ((g.doc_id % 2147483647) * 2654435761) % 2147483647 % 100 >= 90)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(sum(CASE WHEN cnt = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |  CAST(sum(length(bin(cnt + 1)) - 1) AS BIGINT) * 1000 // count(*)
      |    AS lm_score_milli
      |FROM vl GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- t29: pairwise source divergence (mixture drift gauge) ----
  // The domain-mixture health check a curation run reads before
  // re-weighting (t11): total-variation distance between each pair of
  // sources' unigram distributions, in exact ppm. TV needs the UNION
  // vocabulary — a token present in a but not b contributes its full
  // share — so the shared-token join alone undercounts. The exact
  // integer identity used here: TV = (Σ_shared |pa−pb| + (Σpa −
  // Σ_shared pa) + (Σpb − Σ_shared pb)) / 2, where Σpa is the
  // source's total integer-ppm mass (NOT assumed to be 10^6 — integer
  // shares under-sum, and both engines compute the same truncated
  // shares). Plan: one (source, token) count, per-source totals
  // broadcast (|sources| rows), the token-keyed self-join
  // hash-partitions on tok — the vocabulary is never broadcast and
  // join fan-out per token is |sources|² — and the pair frame comes
  // from a broadcast cross of the tiny per-source summary so
  // zero-overlap pairs still emit a row.
  /** (source, tok, cnt) term frequencies — one corpus tokenize pass
    * shared by t29's divergence and t30's distinctive terms
    * (DfCache key "source_tok_counts"). */
  private def sourceTokCounts(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "source_tok_counts") {
      docs(spark, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt"))
    }

  def t29SourceDivergence(spark: SparkSession, dir: String): DataFrame = {
    val tok = sourceTokCounts(spark, dir)
    val totals = tok.groupBy(col("source")).agg(sum(col("cnt")).as("total"))
    val share = tok.join(broadcast(totals), Seq("source"))
      .select(col("source"), col("tok"), expr("cnt * 1000000 div total").as("ppm"))
    val sums = share.groupBy(col("source")).agg(sum(col("ppm")).as("ppm_sum"))
    val both = share.as("a").join(share.as("b"),
        col("a.tok") === col("b.tok") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared_vocab"),
        sum(abs(col("a.ppm") - col("b.ppm"))).as("both_diff"),
        sum(col("a.ppm")).as("both_a"), sum(col("b.ppm")).as("both_b"))
    val pairs = sums.as("sa").crossJoin(broadcast(sums.as("sb")))
      .filter(col("sa.source") < col("sb.source"))
      .select(col("sa.source").as("source_a"), col("sb.source").as("source_b"),
        col("sa.ppm_sum").as("sum_a"), col("sb.ppm_sum").as("sum_b"))
    pairs.join(both, Seq("source_a", "source_b"), "left_outer")
      .select(col("source_a"), col("source_b"),
        coalesce(col("shared_vocab"), lit(0L)).as("shared_vocab"),
        expr("""(coalesce(both_diff, 0L)
                 + (sum_a - coalesce(both_a, 0L))
                 + (sum_b - coalesce(both_b, 0L))) div 2""").as("tv_ppm"))
      .orderBy(col("source_a"), col("source_b"))
  }

  lazy val t29Sql: String =
    """WITH tk AS (SELECT source, unnest(string_split(text, ' ')) AS tok
      |            FROM documents),
      |c AS (SELECT source, tok, count(*) AS cnt FROM tk GROUP BY 1, 2),
      |tt AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS total FROM c GROUP BY 1),
      |sh AS (SELECT c.source, c.tok, c.cnt * 1000000 // tt.total AS ppm
      |       FROM c JOIN tt USING (source)),
      |sm AS (SELECT source, CAST(sum(ppm) AS BIGINT) AS ppm_sum FROM sh GROUP BY 1),
      |bo AS (SELECT a.source AS source_a, b.source AS source_b,
      |         count(*) AS shared_vocab,
      |         CAST(sum(abs(a.ppm - b.ppm)) AS BIGINT) AS both_diff,
      |         CAST(sum(a.ppm) AS BIGINT) AS both_a,
      |         CAST(sum(b.ppm) AS BIGINT) AS both_b
      |       FROM sh a JOIN sh b ON a.tok = b.tok AND a.source < b.source
      |       GROUP BY 1, 2),
      |pr AS (SELECT sa.source AS source_a, sb.source AS source_b,
      |         sa.ppm_sum AS sum_a, sb.ppm_sum AS sum_b
      |       FROM sm sa JOIN sm sb ON sa.source < sb.source)
      |SELECT pr.source_a, pr.source_b,
      |  CAST(coalesce(bo.shared_vocab, 0) AS BIGINT) AS shared_vocab,
      |  CAST((coalesce(bo.both_diff, 0)
      |        + (pr.sum_a - coalesce(bo.both_a, 0))
      |        + (pr.sum_b - coalesce(bo.both_b, 0))) // 2 AS BIGINT) AS tv_ppm
      |FROM pr LEFT JOIN bo USING (source_a, source_b)
      |ORDER BY source_a, source_b""".stripMargin

  // ---- t30: distinctive terms per source (concentration keywords) ----
  // The qualitative companion to t29's scalar: WHICH terms make each
  // source different — per source, the top 5 terms by concentration
  // (share of the term's global occurrences that land in this source,
  // exact ppm), among terms seen ≥ 5 times globally (hapax noise
  // gate). The report a curation run prints when t29 flags drift.
  // Deterministic rank: concentration DESC, local count DESC, term
  // ASC, pinned on both engines. Plan: rides t29's cached
  // (source, tok, cnt) pass; the global-count attach is a token-keyed
  // co-partitioned join; the rank window partitions by source over
  // vocabulary-bounded rows (the t25/t26 posture — vocab-bounded,
  // never corpus-bounded).
  def t30DistinctiveTerms(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = sourceTokCounts(spark, dir)
    val tot = tok.groupBy(col("tok")).agg(sum(col("cnt")).as("total"))
      .filter(col("total") >= 5L)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("conc_ppm").desc, col("cnt").desc, col("tok"))
    tok.join(tot, Seq("tok"))
      .withColumn("conc_ppm", expr("cnt * 1000000 div total"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("source"), col("rank").cast("long").as("rank"),
        col("tok"), col("cnt"), col("total"), col("conc_ppm"))
      .orderBy(col("source"), col("rank"))
  }

  lazy val t30Sql: String =
    """WITH tk AS (SELECT source, unnest(string_split(text, ' ')) AS tok
      |            FROM documents),
      |c AS (SELECT source, tok, count(*) AS cnt FROM tk GROUP BY 1, 2),
      |tt AS (SELECT tok, CAST(sum(cnt) AS BIGINT) AS total
      |       FROM c GROUP BY 1 HAVING sum(cnt) >= 5),
      |s AS (
      |  SELECT c.source, c.tok, c.cnt, tt.total,
      |    c.cnt * 1000000 // tt.total AS conc_ppm
      |  FROM c JOIN tt USING (tok)),
      |r AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY source ORDER BY conc_ppm DESC, cnt DESC, tok) AS rank
      |  FROM s)
      |SELECT source, CAST(rank AS BIGINT) AS rank, tok, cnt, total, conc_ppm
      |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin

  // ---- t31: vocabulary growth (Heaps-law readout per source) ----
  // How fast does a source keep yielding NEW vocabulary as you read
  // more of it? The Heaps-law curve (types vs tokens) is the classic
  // corpus-health gauge: a template farm plateaus after a few docs, a
  // diverse source keeps climbing — and the curve's knee tells a
  // curation run when additional docs stop paying for themselves.
  // Computed exactly: each token's FIRST document per source (one
  // token-keyed min aggregate — vocabulary-sized, Zipf-bounded, never
  // corpus-row shuffled), docs bucketed into reading-order deciles by
  // row_number within source, then new-type counts accumulated over
  // the BOUNDED (source × 10) grid. The doc-rank window partitions by
  // source over doc METADATA only (two longs/row — the text column
  // never enters the window); at extreme doc counts per source the
  // q29/q38 binned-rank machinery replaces it (the documented
  // high-cardinality posture, same as e26).
  def t31VocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(spark, dir)
    val byId = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val whole = Window.partitionBy(col("source"))
    val ranked = d.select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .withColumn("rn", row_number().over(byId))
      .withColumn("nd", count(lit(1)).over(whole))
      .withColumn("decile", expr("cast((rn - 1) * 10 div nd as bigint)"))
    val newTypes = d.select(col("source"), col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(min(col("doc_id")).as("doc_id"))
      .join(ranked.select(col("source"), col("doc_id"), col("decile")),
        Seq("source", "doc_id"))
      .groupBy(col("source"), col("decile"))
      .agg(count(lit(1)).as("new_types"))
    val cum = Window.partitionBy(col("source")).orderBy(col("decile"))
    ranked.groupBy(col("source"), col("decile"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("dec_tokens"))
      .join(newTypes, Seq("source", "decile"), "left")
      .na.fill(0L, Seq("new_types"))
      .withColumn("cum_types", sum(col("new_types")).over(cum))
      .withColumn("cum_tokens", sum(col("dec_tokens")).over(cum))
      .select(col("source"), col("decile"), col("n_docs"),
        col("new_types"), col("cum_types"), col("cum_tokens"))
      .orderBy(col("source"), col("decile"))
  }

  lazy val t31Sql: String =
    """WITH dm AS (
      |  SELECT source, doc_id, len(string_split(text, ' ')) AS n_toks,
      |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
      |    count(*) OVER (PARTITION BY source) AS nd
      |  FROM documents),
      |dd AS (SELECT source, doc_id, CAST(n_toks AS BIGINT) AS n_toks,
      |       CAST((rn - 1) * 10 // nd AS BIGINT) AS decile FROM dm),
      |fst AS (
      |  SELECT source, tok, min(doc_id) AS doc_id FROM (
      |    SELECT source, doc_id, unnest(string_split(text, ' ')) AS tok
      |    FROM documents) GROUP BY 1, 2),
      |nt AS (SELECT d.source, d.decile, count(*) AS new_types
      |       FROM fst f JOIN dd d ON f.source = d.source AND f.doc_id = d.doc_id
      |       GROUP BY 1, 2),
      |tk AS (SELECT source, decile, count(*) AS n_docs,
      |         CAST(sum(n_toks) AS BIGINT) AS dec_tokens
      |       FROM dd GROUP BY 1, 2)
      |SELECT t.source, t.decile, t.n_docs,
      |  CAST(coalesce(n.new_types, 0) AS BIGINT) AS new_types,
      |  CAST(sum(coalesce(n.new_types, 0)) OVER (
      |    PARTITION BY t.source ORDER BY t.decile) AS BIGINT) AS cum_types,
      |  CAST(sum(t.dec_tokens) OVER (
      |    PARTITION BY t.source ORDER BY t.decile) AS BIGINT) AS cum_tokens
      |FROM tk t LEFT JOIN nt n ON t.source = n.source AND t.decile = n.decile
      |ORDER BY t.source, t.decile""".stripMargin

  // ---- t32: what dedup costs the corpus (token accounting) ----
  // The report read right after a dedup pass ships: per source, how
  // many documents and how many TOKENS survive the d6 keep/drop
  // decision (keeper = cluster min, everything else drops), with the
  // retained fraction in exact ppm. A source whose token mass
  // collapses under dedup was mostly templates; one that barely
  // shrinks is genuinely diverse — this is the t31 diversity signal
  // cross-checked against the dedup family's actual decisions, and
  // the number a data-mixture re-weighting (t11) must be corrected
  // by. Plan: the drop set is d6's fixpoint labels (doc_id ≠
  // cluster_id — rides the cached d4 verified pairs), left-joined
  // into doc metadata on doc_id (co-partitioned key join, the text
  // column contributes one split-count and never shuffles), then one
  // map-side-combined per-source aggregate.
  def t32DedupImpact(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("toks"))
    val dropped = graft.operators.dedup.DedupOps.d6DupClusters(spark, dir)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"), lit(true).as("dropped"))
    d.join(dropped, Seq("doc_id"), "left_outer")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("dropped").isNull, 1L).otherwise(0L)).as("kept_docs"),
        sum(col("toks")).as("n_tokens"),
        sum(when(col("dropped").isNull, col("toks")).otherwise(0L))
          .as("kept_tokens"))
      .withColumn("retained_ppm", expr("kept_tokens * 1000000 div n_tokens"))
      .orderBy(col("source"))
  }

  lazy val t32Sql: String =
    s"""WITH cl AS (${graft.operators.dedup.DedupOps.d6Sql}),
       |dr AS (SELECT doc_id FROM cl WHERE doc_id <> cluster_id),
       |d AS (SELECT doc_id, source,
       |        CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
       |      FROM documents)
       |SELECT d.source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN dr.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS kept_docs,
       |  CAST(sum(d.toks) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN dr.doc_id IS NULL THEN d.toks ELSE 0 END)
       |    AS BIGINT) AS kept_tokens,
       |  CAST(sum(CASE WHEN dr.doc_id IS NULL THEN d.toks ELSE 0 END)
       |    AS BIGINT) * 1000000 // CAST(sum(d.toks) AS BIGINT)
       |    AS retained_ppm
       |FROM d LEFT JOIN dr ON d.doc_id = dr.doc_id
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  // ---- t33: word-length histogram (subword-budget gauge) ----
  // The lexical profile a tokenizer budget is planned from: per
  // source, the distribution of word LENGTHS (how much of the corpus
  // is short function words vs long content words decides subword
  // vocabulary size and expected tokens-per-word fan-out). Exact
  // ppm shares + cumulative shares over the bounded (source ×
  // length) grid. Plan: lengths are computed IN-ROW (one transform
  // over the split), so what explodes is an integer per word — the
  // word STRINGS never leave the scan; the map-side combine then
  // collapses to the bounded grid before any shuffle, and the
  // cumulative window sees ≤ max-word-len rows per source.
  def t33WordlenHistogram(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perDoc = docs(spark, dir)
      .select(col("source"),
        explode(expr(
          """transform(split(text, ' '), w -> length(w))""")).as("wlen"))
      .groupBy(col("source"), col("wlen").cast("long").as("wlen"))
      .agg(count(lit(1)).as("n_words"))
    val tot = Window.partitionBy(col("source"))
    val cum = Window.partitionBy(col("source")).orderBy(col("wlen"))
    perDoc
      .withColumn("total", sum(col("n_words")).over(tot))
      .withColumn("share_ppm", expr("n_words * 1000000 div total"))
      .withColumn("cum_words", sum(col("n_words")).over(cum))
      .withColumn("cum_ppm", expr("cum_words * 1000000 div total"))
      .select(col("source"), col("wlen"), col("n_words"),
        col("share_ppm"), col("cum_ppm"))
      .orderBy(col("source"), col("wlen"))
  }

  lazy val t33Sql: String =
    """WITH w AS (
      |  SELECT source, CAST(len(tok) AS BIGINT) AS wlen
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
      |        FROM documents)),
      |g AS (SELECT source, wlen, count(*) AS n_words FROM w GROUP BY 1, 2),
      |x AS (SELECT source, wlen, n_words,
      |        CAST(sum(n_words) OVER (PARTITION BY source) AS BIGINT) AS total,
      |        CAST(sum(n_words) OVER (PARTITION BY source ORDER BY wlen)
      |          AS BIGINT) AS cum_words
      |      FROM g)
      |SELECT source, wlen, n_words,
      |  n_words * 1000000 // total AS share_ppm,
      |  cum_words * 1000000 // total AS cum_ppm
      |FROM x ORDER BY source, wlen""".stripMargin

  // ---- t16: per-source length distribution (curation dashboard) ----
  // The first report a curation run prints: how long are the docs of
  // each source, as exact discrete percentiles (q24's machinery over
  // the documents table — percentile_disc picks an actual data value,
  // so the gate stays bit-exact, no interpolation). One sort-based
  // aggregate per (small) source group: only (source, n_chars) pairs
  // shuffle, the text column never leaves the scan. Truncation/pad
  // budgets (t6's bins) and per-source caps (t11's strata) are set
  // FROM these numbers — this is the gauge those knobs read.
  def t16LengthPercentiles(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(col("source"))
      .agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)")
          .cast("long").as("p50"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY n_chars)")
          .cast("long").as("p90"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY n_chars)")
          .cast("long").as("p99"),
        count(lit(1)).as("cnt"),
        sum(col("n_chars")).cast("long").as("total_chars"))
      .orderBy(col("source"))

  lazy val t16Sql: String =
    """SELECT source,
      |  CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50,
      |  CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90,
      |  CAST(quantile_disc(n_chars, 0.99) AS BIGINT) AS p99,
      |  count(*) AS cnt,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ---- t17: winnowing fingerprint selection (Schleimer et al. 2003) ----
  // The MOSS algorithm: from d10's positional span hashes, keep per
  // sliding window of WinW consecutive spans the MINIMUM hash
  // (rightmost on ties) — a deterministic O(n/WinW) fingerprint subset
  // with the guarantee that any shared run of ≥ SpanN+WinW-1 words
  // contributes at least one COMMON selected fingerprint. This is how
  // substring-level dedup ships when the full span table (d10) is too
  // big to join at corpus scale: store only the winnowed set.
  //
  // The window min is computed over key = h·2^22 + (2^22−1−pos):
  // lexicographic (h asc, pos desc) in ONE integer — min picks the
  // smallest hash, rightmost position on ties, identically on both
  // engines (h < 2^31 ⇒ key < 2^53; pos < 2^22 bounds docs at 4M
  // words — far above any real document). One linear span explode
  // (like d10), one per-doc bounded window (rows = spans per doc, the
  // m3/m5/m6 class — grows with the doc, never the corpus), one
  // distinct + rollup. Checksum folds mod 2^31−1 BEFORE summing so
  // the sum stays < 2^51 at any doc length.
  private val WinW = 4
  def t17Winnowing(spark: SparkSession, dir: String): DataFrame =
    winnowingOf(docs(spark, dir))

  /** The selected fingerprint set (doc_id, m, sel) of any (doc_id,
    * text) frame — sel encodes (h, pos) as h·2^22 + (2^22−1−pos).
    * Exposed so the spec can pin the winnowing guarantee (overlapping
    * docs share a fingerprint; every window is covered).
    *
    * Built RELATIONALLY (the m5/m6 lesson, re-learned here the hard
    * way): the array form — posexplode over a `transform(sequence(…),
    * i -> aggregate(…element_at(wvs, j)…))` span-hash column — left
    * `wvs` referenced only once, so CollapseProject inlined the whole
    * per-word transform into the fold's element lookups and every
    * span re-evaluated the doc's word-value array: O(words²)/doc,
    * measured 49 s for 236k spans at sf0.1 where this form takes
    * ~2 s. Here each token is ONE row (wv computed once), the 8-token
    * span array is a `collect_list` over a ROWS frame, and the hash
    * folds 8 elements per row. Both windows (span build, winnow min)
    * share one (doc_id, pos) partitioning+sort — one exchange total;
    * partitions are per-doc (the m3/m5/m6 bounded class). */
  def winnowedOf(d: DataFrame): DataFrame = {
    import graft.operators.dedup.DedupOps
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(0, DedupOps.SpanN - 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos")).rowsBetween(0, WinW - 1)
    d.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= DedupOps.SpanN)
      .select(col("doc_id"), size(col("ws")).cast("long").as("nw"),
        posexplode(col("ws")).as(Seq("j0", "w")))
      .select(col("doc_id"), col("nw"), (col("j0") + 1).cast("long").as("pos"),
        expr(DedupOps.wordValExpr).as("wv"))
      .withColumn("arr", collect_list(col("wv")).over(wf))
      .filter(col("pos") <= col("nw") - (DedupOps.SpanN - 1))
      .withColumn("h", expr(
        "aggregate(arr, cast(0 as bigint), (a, x) -> (a*131 + x) % 2147483647)"))
      .withColumn("m", col("nw") - (DedupOps.SpanN - 1))
      .withColumn("key",
        col("h") * lit(4194304L) + (lit(4194303L) - col("pos")))
      .withColumn("sel", min(col("key")).over(w))
      .filter(col("pos") <= greatest(col("m") - (WinW - 1), lit(1L)))
      .select(col("doc_id"), col("m"), col("sel")).distinct()
  }

  /** The winnowing rollup over any (doc_id, text) frame. */
  def winnowingOf(d: DataFrame): DataFrame =
    winnowedOf(d).groupBy(col("doc_id"), col("m"))
      .agg(count(lit(1)).as("n_fp"),
        (sum(col("sel") % 2147483647L) % 2147483647L).cast("long")
          .as("fp_checksum"))
      .select(col("doc_id"), col("m").as("n_spans"), col("n_fp"),
        expr("1000000 * n_fp div n_spans").as("density_ppm"),
        col("fp_checksum"))
      .orderBy(col("doc_id"))

  /** DuckDB CTE chain ending at `fp` (doc_id, m, sel — the selected
    * winnowing fingerprints) — shared by t17's rollup oracle and
    * d15's fingerprint-pair oracle, so a change to the span hash or
    * the window rule updates both gates in lockstep. */
  // a def, not a val: DedupOps.d15Sql reads this during ITS object
  // init, which can begin while TextOps is still initializing (the
  // two objects reference each other) — a val here would interpolate
  // as null into d15's oracle
  def winnowFpCtes: String = {
    val sn = graft.operators.dedup.DedupOps.SpanN
    s"""wv AS (
       |  SELECT doc_id,
       |    list_transform(string_split(text,' '),
       |      w -> (CAST(length(w) AS BIGINT)*31 + ascii(substr(w,1,1)))*31
       |           + ascii(substr(w,-1,1))) AS wvs
       |  FROM documents WHERE len(string_split(text,' ')) >= $sn),
       |sp0 AS (
       |  SELECT doc_id, CAST(len(wvs) - ${sn - 1} AS BIGINT) AS m,
       |    unnest([ {'pos': CAST(i AS BIGINT),
       |              'h': list_reduce(list_prepend(CAST(0 AS BIGINT),
       |                [ wvs[j] for j in generate_series(i, i + ${sn - 1}) ]),
       |                (a, x) -> (a*131 + x) % 2147483647) }
       |      for i in generate_series(1, len(wvs) - ${sn - 1}) ]) AS s
       |  FROM wv),
       |sp AS (
       |  SELECT doc_id, m, s.pos AS pos,
       |    s.h * 4194304 + (4194303 - s.pos) AS key
       |  FROM sp0),
       |wmin AS (
       |  SELECT doc_id, m, pos,
       |    min(key) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN CURRENT ROW AND ${WinW - 1} FOLLOWING) AS sel
       |  FROM sp),
       |fp AS (
       |  SELECT DISTINCT doc_id, m, sel FROM wmin
       |  WHERE pos <= greatest(m - ${WinW - 1}, 1))""".stripMargin
  }

  lazy val t17Sql: String =
    s"""WITH $winnowFpCtes
       |SELECT doc_id, m AS n_spans, count(*) AS n_fp,
       |  1000000 * count(*) // m AS density_ppm,
       |  CAST(sum(sel % 2147483647) % 2147483647 AS BIGINT) AS fp_checksum
       |FROM fp GROUP BY doc_id, m ORDER BY doc_id""".stripMargin

  // ---- t18: readability scoring (Flesch reading ease, integer core) ----
  // The curation signal t2's surface ratios and t15's LM proxy both
  // miss: structural reading difficulty. Flesch = 206.835 −
  // 1.015·(words/sentences) − 84.6·(syllables/words), with the
  // classic vowel-group syllable proxy (one regexp_extract_all over
  // lowercased text — '[aeiou]+' is simple enough that Java and RE2
  // regex agree character-for-character). All three INPUTS are gated
  // exact integers; the score itself is ONE fixed-shape double
  // expression of them (the t10 pattern — identical tree on both
  // engines ⇒ bit-exact). One narrow codegen'd scan, zero shuffle;
  // production thresholds on the score exactly like t8 does on
  // quality.
  def t18Readability(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        greatest(size(expr("regexp_extract_all(text, '[.!?]+', 0)")), lit(1))
          .cast("long").as("n_sentences"),
        greatest(size(expr("regexp_extract_all(lower(text), '[aeiou]+', 0)")),
          lit(1)).cast("long").as("n_syllables"))
      .withColumn("flesch",
        lit(206.835)
          - lit(1.015) * (col("n_words").cast("double")
            / col("n_sentences").cast("double"))
          - lit(84.6) * (col("n_syllables").cast("double")
            / col("n_words").cast("double")))
      .orderBy(col("doc_id"))

  lazy val t18Sql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |  CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
      |    AS n_sentences,
      |  CAST(greatest(len(regexp_extract_all(lower(text), '[aeiou]+')), 1)
      |    AS BIGINT) AS n_syllables,
      |  206.835
      |    - 1.015 * (CAST(len(string_split(text, ' ')) AS DOUBLE)
      |        / CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE))
      |    - 84.6 * (CAST(greatest(len(regexp_extract_all(lower(text), '[aeiou]+')), 1) AS DOUBLE)
      |        / CAST(len(string_split(text, ' ')) AS DOUBLE)) AS flesch
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---- t19: lexical diversity per source (TTR + hapax ratio) ----
  // The Gopher "fraction of unique words" rule as a per-source corpus
  // gauge: type-token ratio and hapax-legomenon share in exact
  // integer ppm. Machine-generated or template text scores LOW on
  // both (few types, few one-off words) — the curation dashboard row
  // that flags a source worth deduplicating harder. One token explode
  // into a (source, token) count (map-side combined — shuffles at
  // most |sources|·|vocab| cells, never the token stream), then one
  // |sources|-row rollup; integer division truncates identically on
  // both engines.
  def t19LexicalDiversity(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("cnt")).as("n_tokens"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_types"), col("n_tokens"), col("n_hapax"),
        expr("n_types * 1000000 div n_tokens").as("ttr_ppm"),
        expr("n_hapax * 1000000 div n_types").as("hapax_ppm"))
      .orderBy(col("source"))

  lazy val t19Sql: String =
    """WITH tc AS (
      |  SELECT source, token, count(*) AS cnt
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token
      |        FROM documents)
      |  GROUP BY 1, 2)
      |SELECT source, count(*) AS n_types,
      |  CAST(sum(cnt) AS BIGINT) AS n_tokens,
      |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |  count(*) * 1000000 // CAST(sum(cnt) AS BIGINT) AS ttr_ppm,
      |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000
      |    // count(*) AS hapax_ppm
      |FROM tc GROUP BY source ORDER BY source""".stripMargin

  // ---- t20: rare-token ratio (corpus-frequency quality signal) ----
  // The per-document face of t19's corpus-level diversity: join each
  // document's tokens against the corpus token-frequency table and
  // report what fraction are rare (corpus count <= RareFreqMax). High
  // rare ratios flag OCR noise, codes/hashes, and junk pages — the
  // unigram stand-in for LM-perplexity filtering a real curation
  // pipeline runs. Plan shape at 100 TB: tokens explode once, the
  // frequency table is a map-side-combined aggregate of that same
  // explode, and the join back is token-keyed — both sides hash on
  // `w`, so the join reuses one co-partitioned exchange; nothing is
  // broadcast (the vocabulary grows with the corpus) and nothing is
  // quadratic. Ratio in exact integer ppm.
  private val RareFreqMax = 2L

  def t20RareTokens(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val freq = toks.groupBy(col("w")).agg(count(lit(1)).as("cf"))
    toks.join(freq, Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("cf") <= RareFreqMax, 1L).otherwise(0L)).as("n_rare"))
      .withColumn("rare_ppm", expr("n_rare * 1000000 div n_tokens"))
      .orderBy(col("doc_id"))
  }

  lazy val t20Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |freq AS (SELECT w, count(*) AS cf FROM toks GROUP BY w)
       |SELECT t.doc_id, count(*) AS n_tokens,
       |  CAST(sum(CASE WHEN f.cf <= $RareFreqMax THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_rare,
       |  CAST(sum(CASE WHEN f.cf <= $RareFreqMax THEN 1 ELSE 0 END) AS BIGINT)
       |    * 1000000 // count(*) AS rare_ppm
       |FROM toks t JOIN freq f ON t.w = f.w
       |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin

  // ---- t21: language purity / code-switching gauge ----
  // t1 answers "which language"; t21 answers "how MUCH of one
  // language": the share of marker hits the dominant language owns,
  // in exact ppm. Mixed-language documents (purity below the
  // two-thirds mark with enough evidence) are the rows a monolingual
  // training mix must drop or split — t1 alone silently files them
  // under their plurality language. Same single fused scan as t1
  // (three in-row filtered-split counts, no shuffle before the
  // output sort); integer arithmetic end to end.
  private val PurityPpmMin = 666667L
  private val PurityEvidenceMin = 3L

  def t21LangPurity(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"),
        hits(EN).cast("long").as("en_hits"), hits(DE).cast("long").as("de_hits"),
        hits(FR).cast("long").as("fr_hits"))
      .withColumn("n_hits", col("en_hits") + col("de_hits") + col("fr_hits"))
      .withColumn("top_hits",
        greatest(col("en_hits"), col("de_hits"), col("fr_hits")))
      .withColumn("purity_ppm",
        when(col("n_hits") === 0L, 0L)
          .otherwise(expr("top_hits * 1000000 div n_hits")))
      .withColumn("is_mixed",
        col("n_hits") >= PurityEvidenceMin && col("purity_ppm") < PurityPpmMin)
      .orderBy(col("doc_id"))

  lazy val t21Sql: String =
    s"""WITH h AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split(text,' '), w -> w IN ${sqlSet(EN)})) AS BIGINT) AS en_hits,
       |    CAST(len(list_filter(string_split(text,' '), w -> w IN ${sqlSet(DE)})) AS BIGINT) AS de_hits,
       |    CAST(len(list_filter(string_split(text,' '), w -> w IN ${sqlSet(FR)})) AS BIGINT) AS fr_hits
       |  FROM documents)
       |SELECT doc_id, en_hits, de_hits, fr_hits,
       |  en_hits + de_hits + fr_hits AS n_hits,
       |  greatest(en_hits, de_hits, fr_hits) AS top_hits,
       |  CASE WHEN en_hits + de_hits + fr_hits = 0 THEN 0
       |       ELSE greatest(en_hits, de_hits, fr_hits) * 1000000
       |            // (en_hits + de_hits + fr_hits) END AS purity_ppm,
       |  en_hits + de_hits + fr_hits >= $PurityEvidenceMin
       |    AND (CASE WHEN en_hits + de_hits + fr_hits = 0 THEN 0
       |              ELSE greatest(en_hits, de_hits, fr_hits) * 1000000
       |                   // (en_hits + de_hits + fr_hits) END) < $PurityPpmMin
       |    AS is_mixed
       |FROM h ORDER BY doc_id""".stripMargin

  // ---- t22: n-gram novelty (memorization / duplication risk) ----
  // Per document: the share of its DISTINCT word-3-grams that occur
  // in no other document. Low novelty = boilerplate assembled from
  // corpus-common phrasing; high novelty = genuinely new text (or
  // noise — read with t2/t20). The doc-frequency table aggregates the
  // same distinct-gram explode the per-doc side uses, and the join
  // back is gram-keyed — co-partitioned, vocabulary never broadcast,
  // the t20 posture one level up from tokens. Exact integer ppm;
  // docs under 3 words carry no grams and drop on both engines.
  def t22NgramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val ws = col("ws")
    val grams = when(size(ws) >= 3,
        transform(sequence(lit(1), size(ws) - 2),
          i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1),
            element_at(ws, i + 2))))
      .otherwise(array())
    val dg = docs(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), explode(array_distinct(grams)).as("g"))
    val dfreq = dg.groupBy(col("g")).agg(count(lit(1)).as("df"))
    dg.join(dfreq, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty_ppm", expr("n_unique * 1000000 div n_grams"))
      .orderBy(col("doc_id"))
  }

  lazy val t22Sql: String =
    """WITH w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      |dg AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_transform(generate_series(1, len(ws)-2),
      |                          i -> ws[i]||' '||ws[i+1]||' '||ws[i+2])) AS g
      |  FROM w WHERE len(ws) >= 3),
      |df AS (SELECT g, count(*) AS df FROM dg GROUP BY g)
      |SELECT d.doc_id, count(*) AS n_grams,
      |  CAST(sum(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
      |  CAST(sum(CASE WHEN f.df = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000
      |    // count(*) AS novelty_ppm
      |FROM dg d JOIN df f USING (g)
      |GROUP BY d.doc_id ORDER BY doc_id""".stripMargin

  // ---- t23: boilerplate detection by shared literal prefix ----
  // Per source, how much of the corpus opens with text some OTHER doc
  // also opens with — template headers, scraped navigation chrome,
  // license preambles: the boilerplate a curation pass strips before
  // dedup sees it (exact dup groups are a subset of shared-prefix
  // groups, so this reads as an upper bound on d1's catch). Two
  // map-side-combined aggregates — (source, 32-char prefix) counts,
  // then the per-source rollup — nothing wider than the prefix ever
  // shuffles; |sources| rows out. Exact integer ppm.
  private val BoilerPrefixChars = 32

  def t23Boilerplate(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("source"),
        substring(col("text"), 1, BoilerPrefixChars).as("pfx"))
      .groupBy(col("source"), col("pfx"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_prefixes"),
        sum(col("n")).as("n_docs"),
        sum(when(col("n") >= 2, col("n")).otherwise(0L)).as("n_boiler_docs"),
        max(col("n")).as("max_group"))
      .withColumn("boiler_ppm", expr("n_boiler_docs * 1000000 div n_docs"))
      .orderBy(col("source"))

  lazy val t23Sql: String =
    s"""WITH p AS (
       |  SELECT source, substr(text, 1, $BoilerPrefixChars) AS pfx,
       |    count(*) AS n
       |  FROM documents GROUP BY 1, 2)
       |SELECT source, count(*) AS n_prefixes,
       |  CAST(sum(n) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT)
       |    AS n_boiler_docs,
       |  CAST(max(n) AS BIGINT) AS max_group,
       |  CAST(sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT) * 1000000
       |    // CAST(sum(n) AS BIGINT) AS boiler_ppm
       |FROM p GROUP BY source ORDER BY source""".stripMargin

  // ---- t24: word burstiness (Church & Gale's Var/Mean gauge) ----
  // For the top-TopBursty words by document frequency: the
  // variance-to-mean ratio of per-document counts, zeros included —
  // the statistic that separates TOPICAL words (bursty: absent from
  // most docs, concentrated where they appear; Var/Mean ≫ 1) from
  // FUNCTION words (Poisson-like, ≈ 1 + mean-shift). The
  // language-modeling literature's standard content-word detector,
  // and the feature behind stopword-list induction and topic-shift
  // segmentation. Exact like q32: zeros contribute nothing to Σc/Σc²,
  // so two map-side-combined aggregates over present (doc, word)
  // pairs plus the corpus N give burst_num = N·Σc² − (Σc)² and
  // burst_den = N·Σc as exact BIGINTs (|docs|·counts² stays far under
  // 2^63 at any plausible vocabulary concentration; DECIMAL(38)
  // is the documented widening if a word dominates a 1e12-token
  // corpus); the double is one IEEE division.
  private val TopBursty = 20

  /** Corpus word statistics (w, df, sc = Σcount, sc2 = Σcount²) —
    * DfCache'd: one tokenize pass serves t24's burstiness row and
    * t25's stopword induction. */
  private def wordDocStats(spark: SparkSession, dir: String): DataFrame =
    graft.util.DfCache.cached(spark, dir, "word_doc_stats") {
      docs(spark, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w"), col("doc_id")).agg(count(lit(1)).as("c"))
        .groupBy(col("w"))
        // sc2 accumulates DECIMAL(38,0) (SumWidthSpec / q74
        // convention): c is an uncapped per-(word,doc) count — book-
        // length documents at 100 TB push c² past int64 per TERM for
        // stopwords while DuckDB promotes to HUGEINT; consumers (t24/
        // t25) keep the dispersion algebra wide and narrow once at
        // their output boundary
        .agg(count(lit(1)).as("df"), sum(col("c")).as("sc"),
          sum((col("c").cast("decimal(38,0)") * col("c"))).as("sc2"))
    }

  def t24Burstiness(spark: SparkSession, dir: String): DataFrame = {
    val n = docs(spark, dir).agg(count(lit(1)).as("nd"))
    wordDocStats(spark, dir)
      .orderBy(col("df").desc, col("w")).limit(TopBursty)
      .crossJoin(broadcast(n))
      // dispersion algebra in DECIMAL(38,0) (nd·sc2 and sc² pass
      // int64 long before the sums do), narrowed once to the BIGINT
      // the oracle also casts to — burstiness doubles the NARROWED
      // values on both engines, so the float sees identical bits
      .select(col("w").as("word"), col("df"), col("sc").as("total_count"),
        (col("nd").cast("decimal(38,0)") * col("sc2") -
          col("sc").cast("decimal(38,0)") * col("sc")).cast("long")
          .as("burst_num"),
        (col("nd").cast("decimal(38,0)") * col("sc")).cast("long")
          .as("burst_den"))
      .withColumn("burstiness",
        col("burst_num").cast("double") / col("burst_den").cast("double"))
      .orderBy(col("word"))
  }

  lazy val t24Sql: String =
    s"""WITH dc AS (
       |  SELECT w, doc_id, count(*) AS c FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY 1, 2),
       |st AS (SELECT w, count(*) AS df, sum(c) AS sc, sum(c * c) AS sc2
       |       FROM dc GROUP BY w),
       |top AS (SELECT * FROM st ORDER BY df DESC, w LIMIT $TopBursty),
       |n AS (SELECT count(*) AS nd FROM documents)
       |SELECT w AS word, CAST(df AS BIGINT) AS df,
       |  CAST(sc AS BIGINT) AS total_count,
       |  CAST(n.nd * sc2 - sc * sc AS BIGINT) AS burst_num,
       |  CAST(n.nd * sc AS BIGINT) AS burst_den,
       |  CAST(CAST(n.nd * sc2 - sc * sc AS BIGINT) AS DOUBLE)
       |    / CAST(CAST(n.nd * sc AS BIGINT) AS DOUBLE) AS burstiness
       |FROM top CROSS JOIN n ORDER BY word""".stripMargin

  // ---- t25: stopword-list induction (t24 made actionable) ----
  // The decision list t24's statistic exists for: words that are both
  // CORPUS-WIDE (df ≥ 30% of docs) and NON-BURSTY (Var/Mean ≤ 1.35 —
  // near-Poisson, i.e. function-word dispersion) are stopword
  // candidates; what d22 is to d6, this is to t24 — the measurement
  // turned into the artifact a pipeline consumes (t2's stopword
  // ratio, retrieval pruning). Both tests are integer cross-products
  // (10·df ≥ 3·N; 100·num ≤ 135·den) — no rational thresholds
  // materialized, bit-exact on both engines. One shared DfCache'd
  // stats pass (t24's), a broadcast one-row N frame, top-50 fully
  // tie-broken.
  private val StopDfPct = 30L       // df ≥ 30% of docs
  private val StopBurstPct = 135L   // Var/Mean ≤ 1.35

  def t25StopwordInduction(spark: SparkSession, dir: String): DataFrame = {
    val n = docs(spark, dir).agg(count(lit(1)).as("nd"))
    wordDocStats(spark, dir)
      .crossJoin(broadcast(n))
      // both tests run WIDE (sc2 is decimal from the shared stats;
      // nd·sc2, sc², and the ×100/×135 cross-products all pass int64
      // before the narrowing), then the output columns take the same
      // single BIGINT narrowing the oracle's CASTs apply
      .withColumn("burst_num",
        col("nd").cast("decimal(38,0)") * col("sc2") -
          col("sc").cast("decimal(38,0)") * col("sc"))
      .withColumn("burst_den", col("nd").cast("decimal(38,0)") * col("sc"))
      .filter(col("df") * 10 >= col("nd") * (StopDfPct / 10L) &&
        col("burst_num") * 100 <= col("burst_den") * StopBurstPct)
      .select(col("w").as("word"), col("df"), col("sc").as("total_count"),
        col("burst_num").cast("long").as("burst_num"),
        col("burst_den").cast("long").as("burst_den"))
      .orderBy(col("df").desc, col("word"))
      .limit(50)
  }

  lazy val t25Sql: String =
    s"""WITH dc AS (
       |  SELECT w, doc_id, count(*) AS c FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY 1, 2),
       |st AS (SELECT w, count(*) AS df, sum(c) AS sc, sum(c * c) AS sc2
       |       FROM dc GROUP BY w),
       |n AS (SELECT count(*) AS nd FROM documents)
       |SELECT w AS word, CAST(df AS BIGINT) AS df,
       |  CAST(sc AS BIGINT) AS total_count,
       |  CAST(n.nd * sc2 - sc * sc AS BIGINT) AS burst_num,
       |  CAST(n.nd * sc AS BIGINT) AS burst_den
       |FROM st CROSS JOIN n
       |WHERE df * 10 >= n.nd * ${StopDfPct / 10L}
       |  AND (n.nd * sc2 - sc * sc) * 100 <= (n.nd * sc) * $StopBurstPct
       |ORDER BY df DESC, word LIMIT 50""".stripMargin

  // ---- t26: Zipf rank-frequency profile (log2-binned, exact) ----
  // The corpus-health fingerprint every tokenizer/pretraining audit
  // plots: word frequency against frequency RANK, log-log. Zipf's law
  // predicts slope −1, i.e. average frequency HALVING per doubling
  // rank bucket — a corpus that deviates hard (machine-generated
  // text, template floods) shows up as a bent profile, and t12/t23
  // then localize the cause. Output: one row per log2 rank bucket
  // b = ⌊log2 rank⌋ (ranks [2^b, 2^(b+1))): word count, exact total/
  // max/min frequency, average in ppm.
  //
  // Scale shape — NO per-word rank window (vocabulary grows with the
  // corpus; a global row_number over it is the q29 anti-pattern).
  // Ranks only enter through the FREQUENCY HISTOGRAM: groupBy(sc)
  // gives each frequency class its size, one window over that
  // bounded summary assigns each class its [rank_start, rank_end]
  // span, and each class's contribution to each bucket is pure
  // interval-overlap arithmetic (classes explode into the ≤ log2 V
  // buckets they straddle — the giant sc=1 tie class never needs
  // intra-class order because buckets only need COUNTS). Exact
  // integers end to end; ⌊log2 x⌋ = length(bin(x)) − 1 on both
  // engines (string length of the binary rep — no float log).
  def t26ZipfProfile(spark: SparkSession, dir: String): DataFrame = {
    val hist = wordDocStats(spark, dir)
      .groupBy(col("sc")).agg(count(lit(1)).as("nw"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("sc").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    hist
      .withColumn("rank_end", sum(col("nw")).over(w))
      .withColumn("rank_start", col("rank_end") - col("nw") + 1)
      .select(col("sc"), col("rank_start"), col("rank_end"),
        explode(expr(
          "sequence(length(bin(rank_start)) - 1, length(bin(rank_end)) - 1)"))
          .as("b"))
      .withColumn("lo", greatest(col("rank_start"), expr("shiftleft(1L, b)")))
      .withColumn("hi", least(col("rank_end"), expr("shiftleft(1L, b + 1) - 1")))
      .withColumn("n_in", col("hi") - col("lo") + 1)
      .groupBy(col("b"))
      // n_in·sc passes int64 per TERM at corpus scale (class size ×
      // stopword frequency) — accumulate DECIMAL(38,0), derive the
      // ppm from the wide value, and narrow total_count once
      // (SumWidthSpec / q74 convention)
      .agg(sum(col("n_in")).as("n_words"),
        sum((col("n_in").cast("decimal(38,0)") * col("sc"))).as("tc"),
        max(col("sc")).as("max_count"),
        min(col("sc")).as("min_count"))
      .withColumn("avg_count_ppm",
        expr("tc * 1000000 div n_words"))
      .select(col("b").cast("long").as("rank_bucket"), col("n_words"),
        col("tc").cast("long").as("total_count"), col("max_count"),
        col("min_count"), col("avg_count_ppm"))
      .orderBy(col("rank_bucket"))
  }

  lazy val t26Sql: String =
    """WITH st AS (
      |  SELECT w, sum(c) AS sc FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS w, 1 AS c
      |    FROM documents)
      |  GROUP BY w),
      |hist AS (SELECT sc, count(*) AS nw FROM st GROUP BY sc),
      |spans AS (
      |  SELECT sc, nw,
      |    sum(nw) OVER (ORDER BY sc DESC ROWS UNBOUNDED PRECEDING) AS rank_end,
      |    sum(nw) OVER (ORDER BY sc DESC ROWS UNBOUNDED PRECEDING) - nw + 1
      |      AS rank_start
      |  FROM hist),
      |bs AS (
      |  SELECT sc, rank_start, rank_end,
      |    unnest(generate_series(length(bin(rank_start)) - 1,
      |                           length(bin(rank_end)) - 1)) AS b
      |  FROM spans),
      |cells AS (
      |  SELECT sc, b,
      |    least(rank_end, (CAST(1 AS BIGINT) << (b + 1)) - 1)
      |      - greatest(rank_start, CAST(1 AS BIGINT) << b) + 1 AS n_in
      |  FROM bs)
      |SELECT CAST(b AS BIGINT) AS rank_bucket,
      |  CAST(sum(n_in) AS BIGINT) AS n_words,
      |  CAST(sum(n_in * sc) AS BIGINT) AS total_count,
      |  CAST(max(sc) AS BIGINT) AS max_count,
      |  CAST(min(sc) AS BIGINT) AS min_count,
      |  CAST(sum(n_in * sc) AS BIGINT) * 1000000 // CAST(sum(n_in) AS BIGINT)
      |    AS avg_count_ppm
      |FROM cells GROUP BY b ORDER BY rank_bucket""".stripMargin

  // ---- t27: span-level train/val contamination (decontamination) ----
  // d7 flags WHOLE-document near-dups crossing the split; the leak a
  // benchmark audit actually hunts is finer — val documents whose
  // 8-word SPANS appear verbatim in train (quoted passages, shared
  // boilerplate, copied answers: the Lee et al. substring-leak
  // class). Per val doc: positional span count, spans present
  // anywhere in train, contamination in exact ppm — the table a
  // decontamination pass thresholds before releasing an eval set.
  // Plan: d10's span-group table (DfCache-SHARED with d10 — one
  // explode serves both) splits on the d7/d9 hash; the train side
  // reduces to a distinct span-hash set and the val side hash-joins
  // it (a hot boilerplate span is a skewed JOIN key AQE splits, the
  // d10 posture). Output is |val docs| rows; everything integer.
  def t27SpanContamination(spark: SparkSession, dir: String): DataFrame = {
    val g = graft.util.DfCache.cached(spark, dir, "span_groups") {
      graft.operators.dedup.DedupOps.spanGroupsOf(docs(spark, dir))
    }
    val isVal =
      expr("((doc_id % 2147483647) * 2654435761) % 2147483647 % 100 >= 90")
    val train = g.filter(!isVal).select(col("h")).distinct()
      .withColumn("in_train", lit(true))
    g.filter(isVal).join(train, Seq("h"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(sum(col("n_pos")).as("n_spans"),
        coalesce(sum(when(col("in_train"), col("n_pos"))), lit(0L))
          .as("n_contaminated"))
      .withColumn("contam_ppm",
        expr("n_contaminated * 1000000 div n_spans"))
      .orderBy(col("doc_id"))
  }

  lazy val t27Sql: String = {
    val spanN = graft.operators.dedup.DedupOps.SpanN
    s"""WITH wv AS (
       |  SELECT doc_id,
       |    list_transform(string_split(text,' '),
       |      w -> (CAST(length(w) AS BIGINT)*31 + ascii(substr(w,1,1)))*31
       |           + ascii(substr(w,-1,1))) AS wvs
       |  FROM documents WHERE len(string_split(text,' ')) >= $spanN),
       |sp AS (
       |  SELECT doc_id,
       |    unnest([ list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      [ wvs[j] for j in generate_series(i, i + ${spanN - 1}) ]),
       |      (a, x) -> (a*131 + x) % 2147483647)
       |      for i in generate_series(1, len(wvs) - ${spanN - 1}) ]) AS h
       |  FROM wv),
       |gp AS (SELECT h, doc_id, count(*) AS n_pos FROM sp GROUP BY h, doc_id),
       |vl AS (SELECT * FROM gp
       |  WHERE ((doc_id % 2147483647) * 2654435761) % 2147483647 % 100 >= 90),
       |tr AS (SELECT DISTINCT h FROM gp
       |  WHERE ((doc_id % 2147483647) * 2654435761) % 2147483647 % 100 < 90)
       |SELECT vl.doc_id, CAST(sum(vl.n_pos) AS BIGINT) AS n_spans,
       |  CAST(coalesce(sum(CASE WHEN tr.h IS NOT NULL THEN vl.n_pos END), 0)
       |    AS BIGINT) AS n_contaminated,
       |  CAST(coalesce(sum(CASE WHEN tr.h IS NOT NULL THEN vl.n_pos END), 0)
       |    AS BIGINT) * 1000000 // CAST(sum(vl.n_pos) AS BIGINT) AS contam_ppm
       |FROM vl LEFT JOIN tr ON vl.h = tr.h
       |GROUP BY vl.doc_id ORDER BY vl.doc_id""".stripMargin
  }

  // ---- t37: cross-language vocabulary overlap (Jaccard matrix) ----
  // How much vocabulary two language slices share — the corpus-mix
  // gauge read before training a multilingual tokenizer (high overlap
  // between language pairs means shared subwords pay; a near-zero
  // row means that language needs its own vocabulary budget). Exact
  // Jaccard over DISTINCT (lang, token) vocabularies: the explode is
  // map-side-combined to distinct vocab rows (vocab ≪ token stream),
  // the intersection is ONE token-keyed co-partitioned self-join
  // (never broadcast — vocabulary grows with the corpus), and union
  // sizes come from the |langs|-row size table cross-joined as the
  // pair DOMAIN (so disjoint pairs emit a 0 row instead of
  // vanishing — every cell of the matrix is a statement). Output is
  // |langs|²/2 rows.
  def t37LangVocabJaccard(spark: SparkSession, dir: String): DataFrame = {
    val lt = docs(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .distinct()
    val sizes = lt.groupBy(col("lang")).agg(count(lit(1)).as("v"))
    val inter = lt.as("a").join(lt.as("b"),
        col("a.tok") === col("b.tok") && col("a.lang") < col("b.lang"))
      .groupBy(col("a.lang").as("lang_a"), col("b.lang").as("lang_b"))
      .agg(count(lit(1)).as("n_inter"))
    val dom = broadcast(sizes).as("x")
      .crossJoin(broadcast(sizes).as("y"))
      .filter(col("x.lang") < col("y.lang"))
      .select(col("x.lang").as("lang_a"), col("y.lang").as("lang_b"),
        col("x.v").as("va"), col("y.v").as("vb"))
    dom.join(inter, Seq("lang_a", "lang_b"), "left_outer")
      .na.fill(0L, Seq("n_inter"))
      .withColumn("n_union", col("va") + col("vb") - col("n_inter"))
      .withColumn("jaccard_ppm", expr("n_inter * 1000000 div n_union"))
      .select(col("lang_a"), col("lang_b"), col("va"), col("vb"),
        col("n_inter"), col("n_union"), col("jaccard_ppm"))
      .orderBy(col("lang_a"), col("lang_b"))
  }

  lazy val t37Sql: String =
    """WITH lt AS (
      |  SELECT DISTINCT lang, tok FROM (
      |    SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  WHERE len(tok) > 0),
      |sz AS (SELECT lang, count(*) AS v FROM lt GROUP BY lang),
      |i AS (SELECT a.lang AS lang_a, b.lang AS lang_b, count(*) AS n_inter
      |      FROM lt a JOIN lt b ON a.tok = b.tok AND a.lang < b.lang
      |      GROUP BY 1, 2),
      |dom AS (SELECT x.lang AS lang_a, y.lang AS lang_b, x.v AS va, y.v AS vb
      |        FROM sz x JOIN sz y ON x.lang < y.lang)
      |SELECT d.lang_a, d.lang_b,
      |  CAST(d.va AS BIGINT) AS va, CAST(d.vb AS BIGINT) AS vb,
      |  CAST(COALESCE(i.n_inter, 0) AS BIGINT) AS n_inter,
      |  CAST(d.va + d.vb - COALESCE(i.n_inter, 0) AS BIGINT) AS n_union,
      |  CAST(COALESCE(i.n_inter, 0) * 1000000
      |    // (d.va + d.vb - COALESCE(i.n_inter, 0)) AS BIGINT) AS jaccard_ppm
      |FROM dom d LEFT JOIN i ON d.lang_a = i.lang_a AND d.lang_b = i.lang_b
      |ORDER BY d.lang_a, d.lang_b""".stripMargin

  // ---- t38: token entropy, the log2-binned exact form ----
  // The one common text statistic the board still lacked. The honest
  // design verdict (SURVEY §5): TRUE Shannon entropy needs log(), and
  // libm log/log2 are NOT correctly-rounded — Java and DuckDB may
  // differ in the last ulp, so a float entropy can never be a hash
  // gate. The gated form replaces log2 with its integer floor,
  // flog2(x) = length(bin(x)) − 1 — pure string/bit ops, identical on
  // both engines — giving the exact-integer binned entropy numerator
  //   nh_floorbits = n·flog2(n) − Σ_tok c·flog2(c)
  // (units: token·bits). Since log2 x − 1 < flog2(x) ≤ log2 x per
  // term, the true n·H(tokens) lies within ±n of it — the pinned
  // error bound Round43OpsSpec asserts against a driver-side double
  // recompute. h_millibits = the per-token normalization in exact
  // integer milli-bits (floor div). Per-lang rows: one corpus-wide
  // token count (map-side combined) + a vocabulary-sized aggregate —
  // the t5 shape, nothing corpus-sized shuffles twice.
  def t38TokenEntropy(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("lang"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(expr("c * (length(bin(c)) - 1)")).as("sum_clog"))
      .select(col("lang"), col("n_tokens"), col("n_distinct"),
        expr("n_tokens * (length(bin(n_tokens)) - 1) - sum_clog")
          .as("nh_floorbits"),
        expr("(n_tokens * (length(bin(n_tokens)) - 1) - sum_clog) * 1000 div n_tokens")
          .as("h_millibits"))
      .orderBy(col("lang"))

  lazy val t38Sql: String =
    """WITH tc AS (
      |  SELECT lang, tok, count(*) AS c FROM (
      |    SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  WHERE len(tok) > 0 GROUP BY lang, tok),
      |agg AS (
      |  SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
      |    count(*) AS n_distinct,
      |    CAST(sum(c * (length(bin(c)) - 1)) AS BIGINT) AS sum_clog
      |  FROM tc GROUP BY lang)
      |SELECT lang, n_tokens, CAST(n_distinct AS BIGINT) AS n_distinct,
      |  CAST(n_tokens * (length(bin(n_tokens)) - 1) - sum_clog AS BIGINT)
      |    AS nh_floorbits,
      |  CAST((n_tokens * (length(bin(n_tokens)) - 1) - sum_clog) * 1000
      |    // n_tokens AS BIGINT) AS h_millibits
      |FROM agg ORDER BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t38_token_entropy" -> (t38TokenEntropy _),
    "t37_lang_vocab_jaccard" -> (t37LangVocabJaccard _),
    "t27_span_contamination" -> (t27SpanContamination _),
    "t28_lm_score" -> (t28LmScore _),
    "t29_source_divergence" -> (t29SourceDivergence _),
    "t30_distinctive_terms" -> (t30DistinctiveTerms _),
    "t31_vocab_growth" -> (t31VocabGrowth _),
    "t32_dedup_impact" -> (t32DedupImpact _),
    "t33_wordlen_histogram" -> (t33WordlenHistogram _),
    "t34_collocations" -> (t34Collocations _),
    "t35_source_overlap" -> (t35SourceOverlap _),
    "t36_lang_confusion" -> (t36LangConfusion _),
    "t26_zipf_profile" -> (t26ZipfProfile _),
    "t25_stopword_induction" -> (t25StopwordInduction _),
    "t24_burstiness" -> (t24Burstiness _),
    "t23_boilerplate" -> (t23Boilerplate _),
    "t22_ngram_novelty" -> (t22NgramNovelty _),
    "t21_lang_purity" -> (t21LangPurity _),
    "t20_rare_tokens" -> (t20RareTokens _),
    "t19_lexical_diversity" -> (t19LexicalDiversity _),
    "t18_readability" -> (t18Readability _),
    "t17_winnowing" -> (t17Winnowing _),
    "t16_length_percentiles" -> (t16LengthPercentiles _),
    "t15_bigram_coverage" -> (t15BigramCoverage _),
    "t13_redact" -> (t13Redact _),
    "t14_hash_embed" -> (t14HashEmbed _),
    "t12_repetition" -> (t12Repetition _),
    "t11_mixture_sample" -> (t11MixtureSample _),
    "t10_tfidf" -> (t10Tfidf _),
    "t1_lang_id" -> (t1LangId _),
    "t2_quality" -> (t2Quality _),
    "t3_tokens" -> (t3Tokens _),
    "t4_fingerprint" -> (t4Fingerprint _),
    "t5_ngram_freq" -> (t5NgramFreq _),
    "t6_pack_sequences" -> (t6PackSequences _),
    "t7_sample_split" -> (t7SampleSplit _),
    "t8_quality_filter" -> (t8QualityFilter _),
    "t9_curation_pipeline" -> (t9CurationPipeline _))

  val oracles: Map[String, String] = Map(
    "t38_token_entropy" -> t38Sql,
    "t37_lang_vocab_jaccard" -> t37Sql,
    "t27_span_contamination" -> t27Sql,
    "t28_lm_score" -> t28Sql,
    "t29_source_divergence" -> t29Sql,
    "t30_distinctive_terms" -> t30Sql,
    "t31_vocab_growth" -> t31Sql,
    "t32_dedup_impact" -> t32Sql,
    "t33_wordlen_histogram" -> t33Sql,
    "t34_collocations" -> t34Sql,
    "t35_source_overlap" -> t35Sql,
    "t36_lang_confusion" -> t36Sql,
    "t26_zipf_profile" -> t26Sql,
    "t25_stopword_induction" -> t25Sql,
    "t24_burstiness" -> t24Sql,
    "t23_boilerplate" -> t23Sql,
    "t22_ngram_novelty" -> t22Sql,
    "t21_lang_purity" -> t21Sql,
    "t20_rare_tokens" -> t20Sql,
    "t19_lexical_diversity" -> t19Sql,
    "t18_readability" -> t18Sql,
    "t17_winnowing" -> t17Sql,
    "t16_length_percentiles" -> t16Sql,
    "t15_bigram_coverage" -> t15Sql,
    "t13_redact" -> t13Sql,
    "t14_hash_embed" -> t14Sql,
    "t12_repetition" -> t12Sql,
    "t11_mixture_sample" -> t11Sql,
    "t10_tfidf" -> t10Sql,
    "t1_lang_id" -> t1Sql,
    "t2_quality" -> t2Sql,
    "t3_tokens" -> t3Sql,
    "t4_fingerprint" -> t4Sql,
    "t5_ngram_freq" -> t5Sql,
    "t6_pack_sequences" -> t6Sql,
    "t7_sample_split" -> t7Sql,
    "t8_quality_filter" -> t8Sql,
    "t9_curation_pipeline" -> t9Sql)
}
