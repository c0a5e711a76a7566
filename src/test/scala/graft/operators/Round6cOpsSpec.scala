package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession
import graft.operators.dedup.DedupOps
import graft.operators.similarity.SimilarityOps
import graft.operators.text.TextOps

/** Semantic invariants of the third round-6 operator batch beyond the
  * row-hash gate: redaction's dedup-preservation law (docs differing
  * only in sensitive terms scrub to the same fingerprint), and the
  * hashing-trick embedder's mass-conservation + determinism contract. */
class Round6cOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("t13: counts hit the dictionary exactly; scrubbing collapses sensitive-only diffs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the customer sent a key and a value today"),
      (2L, "the value sent a customer and a key today"), // sensitive terms permuted
      (3L, "the key sent a key and a key today"),        // doc 1 with every sensitive term -> key
      (4L, "no sensitive words here at all")).toDF("doc_id", "text")
    val out = TextOps.redactOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getLong(3))).toMap
    assert(out(1L)._2 == 3 && out(3L)._2 == 3 && out(4L)._2 == 0)
    // docs 1 and 3 differ ONLY at sensitive positions -> identical
    // scrubbed stream -> identical fingerprint (the law that keeps
    // redaction from splitting exact-dup groups)
    assert(out(1L)._3 == out(3L)._3, "redacted fingerprints must collapse")
    assert(out(1L)._3 == out(2L)._3, "permuting sensitive terms collapses too")
    assert(out(1L)._3 != out(4L)._3, "different scrubbed text, different fp")
  }

  test("d11: every cluster keeps its min-id representative; drops are real but bounded") {
    val out = DedupOps.d11SemDedup(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (c, vs) =>
      val minVec = vs.map(_._1).min
      assert(vs.find(_._1 == minVec).get._3,
        s"cluster $c must keep its smallest vec_id (nothing dominates it)")
    }
    val dropped = out.count(!_._3)
    assert(dropped > 0, "threshold must be live at gate scale")
    assert(dropped < out.length / 2, "semantic dedup should not halve the corpus")
  }

  test("s18: Lloyd resume through a parquet checkpoint is bit-identical to the direct round") {
    val dir = "/root/testdata/sf0.001"
    val qv = SimilarityOps.embQuantized(spark, dir)
    val c1 = SimilarityOps.ivfCodebook(spark, dir)
    val direct = SimilarityOps.lloydUpdateOf(qv, c1)
    val path = java.nio.file.Files.createTempDirectory("s18spec").toString + "/cb"
    c1.write.mode("overwrite").parquet(path)
    val resumed = SimilarityOps.kmeansFrom(spark, qv, path)
    def cents(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toVector).toMap
    val dm = cents(direct); val rm = cents(resumed)
    assert(dm.nonEmpty && dm == rm,
      "resume(persist(c1)) must reproduce lloyd(c1) to the bit")
  }

  test("q33: HLL registers merge by cell-wise max and the estimate lands in the error band") {
    import spark.implicits._
    val keys = (1L to 10000L)
    val whole = keys.map(k => ("g", k)).toDF("grp", "k")
    val left = keys.filter(_ % 3 != 0).map(k => ("g", k)).toDF("grp", "k")
    val right = keys.filter(_ % 3 == 0).map(k => ("g", k)).toDF("grp", "k")
    def regMap(d: org.apache.spark.sql.DataFrame) =
      Relational.hllRegistersOf(d).collect()
        .map(r => (r.getLong(1), r.getInt(2))).toMap
    val w = regMap(whole)
    val l = regMap(left); val rr = regMap(right)
    val merged = (l.keySet ++ rr.keySet).map { b =>
      b -> math.max(l.getOrElse(b, 0), rr.getOrElse(b, 0))
    }.toMap
    assert(merged == w, "registers(A ∪ B) ≡ cellwise-max(registers(A), registers(B))")
    // accuracy: m=64 gives 1.04/sqrt(64) ~ 13% std error; 3 sigma bound
    val est = Relational.hllEstimateOf(Relational.hllRegistersOf(whole))
      .collect().head.getAs[Double]("hll_raw")
    assert(math.abs(est / 10000.0 - 1.0) < 0.4,
      s"estimate $est out of band for 10000 distinct keys")
    // duplicates must not move the sketch: registers are set-state
    val dup = whole.union(whole).union(whole)
    assert(regMap(dup) == w, "triplicated stream, identical registers")
  }

  test("t14: dim counts conserve word mass and are deterministic run-to-run") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark scan merge join filter"),
      (2L, "spark spark spark"),
      (3L, "a")).toDF("doc_id", "text")
    val vecs = TextOps.hashEmbedOf(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(vecs.values.forall(_.length == 16))
    assert(vecs(1L).sum == 5L, "5 words -> total count 5")
    assert(vecs(2L).sum == 3L && vecs(2L).max == 3L,
      "repeated word lands in one dim")
    assert(vecs(3L).sum == 1L)
    val again = TextOps.hashEmbedOf(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(again == vecs, "stateless hash -> bit-identical re-run")
  }
}
