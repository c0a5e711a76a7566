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
}
