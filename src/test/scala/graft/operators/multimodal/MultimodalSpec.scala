package graft.operators.multimodal

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-multimodal-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("fake decoder is deterministic, normalized, fixed-dim") {
    val bytes = "hello graft".getBytes("UTF-8")
    val f1 = MultimodalOps.FakeDecoder.decode(bytes)
    val f2 = MultimodalOps.FakeDecoder.decode(bytes)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == MultimodalOps.FakeDecoder.FeatureDim)
    assert(math.abs(f1.sum - 1.0f) < 1e-5)
  }

  test("m2 emits one feature row per document with byte counts") {
    val dir = "/root/testdata/sf0.001"
    val out = MultimodalOps.m2FeatureExtract(spark, dir).collect()
    val nDocs = graft.sources.Tables.load(spark, dir, "documents").count()
    assert(out.length == nDocs)
    // n_bytes equals utf-8 length of text; features bounded [0,1]
    assert(out.forall(r => r.getInt(1) > 0))
    assert(out.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  /** The decoder seam: a SECOND decoder drops into the same m2
    * plumbing with zero operator changes — proving a real codec
    * (JNI/ffmpeg behind the same trait) would too. */
  object ToyPrefixDecoder extends MultimodalOps.MediaDecoder {
    def featureDim: Int = 4
    // "decode" = first-4-bytes, scaled — shape-compatible, value-distinct
    def decode(payload: Array[Byte]): Array[Float] =
      Array.tabulate(4)(i =>
        if (i < payload.length) (payload(i) & 0xff) / 255.0f else 0.0f)
  }

  test("decoder seam: stub and a second toy decoder both run m2 plumbing") {
    val dir = "/root/testdata/sf0.001"
    val stub = MultimodalOps.m2FeatureExtract(spark, dir).collect()
    val toy = MultimodalOps.m2FeatureExtract(spark, dir, ToyPrefixDecoder).collect()
    // same rows/schema (the operator contract), different values
    // (the decoder actually ran)
    assert(stub.length == toy.length)
    assert(stub.head.schema == toy.head.schema)
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // toy decoder's f0 = first byte / 255 — verify against the raw text
    toy.take(50).foreach { r =>
      val expected = (docs(r.getLong(0)).getBytes("UTF-8")(0) & 0xff) / 255.0f
      assert(math.abs(r.getDouble(2) - math.round(expected * 1e6) / 1e6) < 1e-9,
        s"doc ${r.getLong(0)}: toy f0 ${r.getDouble(2)} != $expected")
    }
  }
}
