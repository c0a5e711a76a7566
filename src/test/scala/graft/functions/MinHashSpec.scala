package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** graft_minhash64 must be value-identical, element-wise, to the HOF
  * formula it replaces — the definitional equivalence every d-family
  * oracle relies on (their SQL still spells the arithmetic out). */
class MinHashSpec extends AnyFunSuite {

  test("native minhash64 == the HOF fold, element-wise, on varied inputs") {
    val spark = SparkSession.builder().master("local[2]")
      .appName("graft-minhash-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      GraftFunctions.registerAll(spark)
      import spark.implicits._
      val rnd = new scala.util.Random(7)
      val rows = Seq(
        Seq(0L), Seq(2147483646L), Seq(1L, 2L, 3L),
        Seq.fill(200)(rnd.nextLong(2147483647L))) ++
        (1 to 20).map(_ => Seq.fill(1 + rnd.nextInt(50))(
          rnd.nextLong(2147483647L)))
      val df = rows.toDF("shingles")
      val out = df.selectExpr(
        "graft_minhash64(shingles) AS fast",
        """transform(sequence(0, 63), p -> array_min(transform(shingles,
          |  s -> ((2*cast(p as bigint)+1)*s + p*p+1) % 2147483647))) AS ref"""
          .stripMargin).collect()
      out.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      }
    } finally spark.stop()
  }
}
