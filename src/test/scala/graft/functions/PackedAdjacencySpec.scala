package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** graft_pack_deltas / graft_packed_intersect: the packed forms must
  * be a pure representation change — intersect(pack(a), pack(b)) ≡
  * sorted array_intersect(a, b) on every sorted-distinct input,
  * including the varint boundary values (gaps crossing 127/16383 and
  * first elements near 2^31/2^62) the g33 tile-shifted id space
  * actually produces.
  */
class PackedAdjacencySpec extends AnyFunSuite {

  private def roundtrip(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    val pa = PackedOps.pack(new GenericArrayData(a.toArray))
    val pb = PackedOps.pack(new GenericArrayData(b.toArray))
    PackedOps.intersect(pa, pb).toLongArray().toSeq
  }

  test("packed intersect equals reference intersect on crafted inputs") {
    assert(roundtrip(Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)) == Seq(2L, 3L))
    assert(roundtrip(Seq.empty, Seq(1L, 5L)) == Seq.empty)
    assert(roundtrip(Seq(7L), Seq(7L)) == Seq(7L))
    assert(roundtrip(Seq(0L, 127L, 128L, 16383L, 16384L),
      Seq(0L, 128L, 16384L)) == Seq(0L, 128L, 16384L))
    // tile-shifted ids: large first value, mixed gap widths
    val base = 199L * 2000000L
    val a = Seq(base + 1, base + 2, base + 300, base + 40000, base + 1999999)
    val b = Seq(base + 2, base + 299, base + 300, base + 1999999)
    assert(roundtrip(a, b) == Seq(base + 2, base + 300, base + 1999999))
    // values near 2^62
    val big = (1L << 62) - 3
    assert(roundtrip(Seq(big, big + 2), Seq(big + 1, big + 2)) == Seq(big + 2))
  }

  test("randomized: packed intersect ≡ sorted-set intersect") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextLong(1L << 40).abs)
        .distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextLong(1L << 40).abs)
        .distinct.sorted
      val want = a.toSet.intersect(b.toSet).toSeq.sorted
      assert(roundtrip(a, b) == want, s"a=$a b=$b")
    }
  }

  test("the SQL expressions codegen end-to-end and match array_intersect") {
    val spark = SparkSession.builder().master("local[2]")
      .appName("graft-packed-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      GraftFunctions.registerAll(spark)
      import spark.implicits._
      val df = Seq(
        (Seq(1L, 5L, 9L, 1000L), Seq(5L, 9L, 11L)),
        (Seq(2L, 4L), Seq(1L, 3L)),
        (Seq.empty[Long], Seq(1L, 2L))).toDF("a", "b")
      val got = df.selectExpr(
        "graft_packed_intersect(graft_pack_deltas(a), graft_pack_deltas(b)) AS w",
        "array_intersect(a, b) AS ref").collect()
      got.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      }
    } finally spark.stop()
  }
}
