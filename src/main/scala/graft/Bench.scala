package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-round benchmark. Shared derived tables (edge list, walk vector,
  * shingles, band tables, embedding features) are built FIRST as
  * explicit, individually-timed warm-up entries, so the per-query
  * numbers are steady-state plans over warm caches — cache-build cost
  * is attributed, not smeared over whichever query runs first.
  *
  * Output: ONE JSON line. `value` = warm-up + query wall-clock (total
  * work); `warmup`/`queries` attribute it; `failed` lists queries that
  * threw (a failed query's time-to-failure would otherwise be
  * indistinguishable from a healthy run). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt, cpus.toInt)

    val warmups: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      // first Spark job of the session: absorbs JVM/parquet/codegen
      // init so the cache-build entries below measure their own work
      "io_init" -> ((s, d) => graft.sources.Tables.load(s, d, "nation")),
      "graph_sym" -> ((s, d) => graft.operators.graph.GraphTables.sym(s, d)),
      "graph_edges_deg" -> ((s, d) => graft.operators.graph.GraphOps.edgesWithDeg(s, d)),
      "graph_walk_visits" -> ((s, d) => graft.operators.graph.GraphOps.walkVisitCounts(s, d)),
      "dedup_shingles" -> ((s, d) => graft.operators.dedup.DedupOps.shingleFeatures(s, d)),
      "dedup_bands" -> ((s, d) => graft.operators.dedup.DedupOps.bandTable(s, d)),
      "dedup_simhash" -> ((s, d) => graft.operators.dedup.DedupOps.simhashTable(s, d)),
      "dedup_jaccard" -> ((s, d) => graft.operators.dedup.DedupOps.d4NgramJaccard(s, d)),
      "dedup_index" -> ((s, d) =>
        s.table(graft.operators.dedup.DedupOps.gatedDedupIndex(s, d) + "_bands")),
      "emb_features" -> ((s, d) => graft.operators.vector.VectorExprs.embFeatures(s, d)),
      "emb_bands" -> ((s, d) => graft.operators.vector.VectorExprs.embBands(s, d)),
      "emb_quantized" -> ((s, d) => graft.operators.similarity.SimilarityOps.embQuantized(s, d)),
      "pq_codes" -> ((s, d) => graft.operators.vector.VectorOps.pqAssigned(s, d)),
      "ivf_codebook" -> ((s, d) => graft.operators.similarity.SimilarityOps.ivfCodebook(s, d)),
      "graph_ppr_tag5" -> ((s, d) => graft.operators.graph.GraphOps.g13PersonalizedPagerank(s, d)),
      "graph_wedges" -> ((s, d) => graft.operators.graph.GraphTables.weightedEdges(s, d)),
      "graph_dir" -> ((s, d) => graft.operators.graph.GraphTables.directed(s, d)),
      "graph_dir_dst" -> ((s, d) => graft.operators.graph.GraphTables.directedByDst(s, d)),
      "graph_wpr" -> ((s, d) => graft.operators.graph.GraphOps.g15WeightedPagerank(s, d)),
      "graph_wppr" -> ((s, d) => graft.operators.graph.GraphOps.g16WeightedPersonalized(s, d)),
      "winnow_fp" -> ((s, d) => graft.operators.dedup.DedupOps.winnowFingerprints(s, d)))

    def timed(fn: => Long): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try { fn; true } catch { case _: Throwable => false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }

    val warm = warmups.map { case (name, fn) =>
      val (sec, ok) = timed(fn(spark, sfDir).count())
      (name, sec, ok)
    }
    // sorted order: deterministic run-to-run attribution
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (sec, ok) = timed(fn(spark, sfDir).count())
      (name, sec, ok)
    }

    // The driver captures only the LAST 2000 chars of output and greps
    // the {"metric"...} line out of that tail; sbt appends a ~75-char
    // [success] line after us. A 74-query map at full double precision
    // is ~2400 chars, so the line's head gets truncated and the round's
    // bench silently records parsed:null (happened rounds 3 AND 4).
    // Fix: the PRINTED line carries 2-decimal times (10 ms resolution —
    // sf0.1 queries are 0.1-11 s) and totals only for warm-ups; the
    // full-precision per-entry detail goes to bench_detail.json.
    // The printed line also shortens query keys to their unique prefix
    // ("q27_lead_lag" → "q27" — every operator id is unique before the
    // first underscore): at 84 queries the full-name map alone is
    // ~2000 chars, so names live in bench_detail.json and the wire
    // line stays a fraction of the tail budget.
    def r2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def short(k: String): String = k.takeWhile(_ != '_')
    def obj(entries: Seq[(String, Double, Boolean)], f: Double => String,
        key: String => String = identity): String =
      entries.map { case (k, v, _) => "\"" + key(k) + "\":" + f(v) }.mkString("{", ",", "}")
    require(results.map(p => short(p._1)).distinct.size == results.size,
      "query-id prefixes must stay unique — a colliding name would merge two bench entries")
    val warmTotal = warm.map(_._2).sum
    val queryTotal = results.map(_._2).sum
    val failed = (warm ++ results).collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val detail = s"""{"metric":"total","value":${warmTotal + queryTotal},"unit":"sec",""" +
      s""""warmup_total":$warmTotal,"query_total":$queryTotal,""" +
      s""""warmup":${obj(warm, _.toString)},"queries":${obj(results, _.toString)},""" +
      s""""failed":$failed,"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_detail.json"),
      detail.getBytes("UTF-8"))
    val line = s"""{"metric":"total","value":${r2(warmTotal + queryTotal)},"unit":"sec",""" +
      s""""warmup_total":${r2(warmTotal)},"query_total":${r2(queryTotal)},""" +
      s""""queries":${obj(results, r2, short)},"failed":$failed,"sf":"$sfDir"}"""
    require(line.length <= 1900,
      s"bench line ${line.length} chars — exceeds the driver's tail-capture budget")
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_wire.json"),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
    // r5 postmortem: the line survived the driver's 2000-char tail
    // intact but STILL recorded parsed:null — the suspect is sbt's
    // logger wrapping unforked-run stdout as "[info] {...}", which a
    // per-line json.loads rejects. Writing straight to file descriptor
    // 1 bypasses any in-JVM System.out/Console.out redirection, so the
    // emitted line is bare bytes no logger can prefix; it is printed
    // ONCE (a println copy would double ~1200 chars and overflow the
    // tail) and LAST (after spark.stop(), so no shutdown chatter can
    // interleave). bench_wire.json holds the same line as a file
    // artifact either way.
    val fd1 = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true, "UTF-8")
    fd1.println(line)
    fd1.flush()
  }
}
