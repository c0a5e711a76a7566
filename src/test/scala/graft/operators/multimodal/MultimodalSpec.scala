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

  /** In-memory PNG of a solid color — real codec bytes, no files. */
  private def solidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIoDecoder: real PNG bytes decode to exact channel statistics") {
    // solid red 10x20: mean R=1, G=B=0, luma = .299, stddev 0,
    // aspect = 10/30, zero pixels at/above mid luma
    val f = MultimodalOps.ImageIoDecoder.decode(solidPng(10, 20, 0xff0000))
    assert(f.length == MultimodalOps.ImageIoDecoder.FeatureDim)
    assert(math.abs(f(0) - 1.0f) < 1e-6, s"mean R ${f(0)}")
    assert(f(1) == 0.0f && f(2) == 0.0f)
    assert(math.abs(f(3) - 0.299f) < 1e-3, s"luma ${f(3)}")
    assert(f(4) == 0.0f, s"solid color has zero luma stddev, got ${f(4)}")
    assert(math.abs(f(5) - 10.0f / 30.0f) < 1e-6, s"aspect ${f(5)}")
    assert(f(7) == 0.0f, s"red luma 76 < 128, got bright frac ${f(7)}")
    // solid white: every pixel at/above mid luma, luma 1.0
    val white = MultimodalOps.ImageIoDecoder.decode(solidPng(4, 4, 0xffffff))
    assert(math.abs(white(3) - 1.0f) < 1e-3 && white(7) == 1.0f)
    // determinism
    val again = MultimodalOps.ImageIoDecoder.decode(solidPng(10, 20, 0xff0000))
    assert(f.toSeq == again.toSeq)
  }

  test("ImageIoDecoder: undecodable payloads return the -1 sentinel") {
    val junk = MultimodalOps.ImageIoDecoder.decode("not an image".getBytes("UTF-8"))
    assert(junk.toSeq == Seq.fill(8)(-1.0f))
    val empty = MultimodalOps.ImageIoDecoder.decode(Array.empty[Byte])
    assert(empty.toSeq == Seq.fill(8)(-1.0f))
    // truncated PNG header (magic bytes but no image data)
    val truncated = MultimodalOps.ImageIoDecoder.decode(
      solidPng(4, 4, 0x123456).take(20))
    assert(truncated.toSeq == Seq.fill(8)(-1.0f))
  }

  test("real codec through the distributed decode stage (the 100TB path)") {
    val sq = spark
    import sq.implicits._
    // a mixed corpus: two real PNGs + one junk payload, 2 partitions —
    // the exact mapPartitions shape the gated m2 runs, with the REAL
    // codec bound at the seam
    val payloads = Seq(
      (1L, solidPng(10, 20, 0xff0000)),
      (2L, solidPng(4, 4, 0xffffff)),
      (3L, "definitely not a png".getBytes("UTF-8")))
    val src = sq.createDataset(payloads).repartition(2)
    val out = MultimodalOps.decodeFeatures(src, MultimodalOps.ImageIoDecoder)
      .collect().map(d => d.doc_id -> d).toMap
    assert(out.size == 3)
    assert(math.abs(out(1L).features(0) - 1.0f) < 1e-6)   // red channel
    assert(out(2L).features(7) == 1.0f)                    // all-bright white
    assert(out(3L).features.toSeq == Seq.fill(8)(-1.0f))   // junk -> sentinel
    assert(out(1L).n_bytes == payloads.head._2.length)
  }
}
