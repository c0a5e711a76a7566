package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 hygiene batch: exercises the minLabelFixpoint stride
  * parameter (advisor note — the composed-step convergence path
  * shipped without a consumer) and the Fwht64 length contract. */
class Round43OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("minLabelFixpoint: stride=3 converges to the same labels as stride=1") {
    val sym = graft.operators.graph.GraphTables.sym(spark, dir)
    val start = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    def labels(stride: Int): Map[Long, Long] =
      graft.operators.graph.GraphOps
        .minLabelFixpoint(sym, start, maxIters = 64,
          untilConverged = true, stride = stride)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s1 = labels(1)
    val s3 = labels(3)
    assert(s1.nonEmpty)
    assert(s3 == s1)
  }

  test("minLabelFixpoint: stride=3 on a 7-node path graph (chain needs composed hops)") {
    // path 0-1-2-...-6: min label 0 must walk 6 hops; with stride=3
    // that is 2 materializations + 1 certifying round
    import spark.implicits._
    val edges = (0L until 6L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
      .toDF("src", "dst")
    val start = (0L to 6L).map(n => (n, n)).toDF("node", "lbl")
    val out = graft.operators.graph.GraphOps
      .minLabelFixpoint(edges, start, maxIters = 10,
        untilConverged = true, stride = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == (0L to 6L).map(n => n -> 0L).toMap)
  }

  test("e40: no fact row ever sees future dimension state (leakage-free)") {
    val out = graft.streaming.EventOps.e40Scd2Lookup(spark, dir).collect()
    assert(out.nonEmpty)
    // replay: per user, the sorted purchase changelog IS the dimension
    val purchases = graft.sources.Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").cast("decimal(18,2)").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2), r.getDouble(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(p => (p._2, p._3)).zipWithIndex
        .map { case ((_, us, _, v), i) => (us, i + 1L, v) }.toSeq).toMap
    var known = 0
    out.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val ts = r.getAs[java.sql.Timestamp]("ts")
      val us = ts.getTime * 1000 + ts.getNanos / 1000 % 1000
      val versions = purchases.getOrElse(u, Seq.empty[(Long, Long, Double)])
      val inEffect = versions.filter(_._1 <= us)  // NEVER future state
      if (r.getAs[Boolean]("is_known")) {
        known += 1
        val (vfUs, ver, value) = inEffect.last
        assert(r.getAs[Long]("state_version") == ver, s"user $u at $us")
        assert(r.getAs[Double]("state_value") == value, s"user $u at $us")
        assert(r.getAs[Long]("state_age_us") == us - vfUs, s"user $u at $us")
        assert(r.getAs[Long]("state_age_us") >= 0L, "as-of never looks forward")
      } else {
        assert(inEffect.isEmpty, s"user $u at $us should have known state")
        assert(r.isNullAt(r.fieldIndex("state_version")))
      }
    }
    assert(known > 0, "some facts carry state")
  }

  test("graft_fwht64 rejects arrays that are not exactly 64 elements") {
    import spark.implicits._
    val bad = Seq(Array.fill(63)(1.0)).toDF("v")
      .select(expr("graft_fwht64(v)"))
    val e = intercept[Exception] { bad.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("64 elements")))
  }
}
