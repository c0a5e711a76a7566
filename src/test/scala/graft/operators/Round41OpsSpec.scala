package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Conservation laws for the q69–q72 batch (the four classic TPC-H
  * shapes Q13/Q11/Q21/Q22 adapted to this schema). */
class Round41OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)
  private def t(n: String) = graft.sources.Tables.load(spark, dir, n)

  override def afterAll(): Unit = spark.stop()

  test("q69: the histogram conserves customers AND filtered orders") {
    val rows = Relational.q69CountDistribution(spark, dir).collect()
    val nCust = t("customer").count()
    val nOrd = t("orders").filter(col("o_orderpriority") =!= "1-URGENT").count()
    assert(rows.map(_.getAs[Long]("custdist")).sum == nCust)
    assert(rows.map(r => r.getAs[Long]("c_count") * r.getAs[Long]("custdist")).sum == nOrd)
    // the k = 0 row is the one an inner join would drop — it must be
    // representable (present or provably absent)
    val zero = rows.find(_.getAs[Long]("c_count") == 0L)
    val custWithNone = nCust - t("orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey")).distinct().count()
    assert(zero.map(_.getAs[Long]("custdist")).getOrElse(0L) == custWithNone)
  }

  test("q70: returned parts are exactly the above-threshold set") {
    val got = Relational.q70GlobalShareFilter(spark, dir).collect()
      .map(r => r.getAs[Long]("l_partkey") -> r.getAs[Double]("value")).toMap
    val pv = t("lineitem")
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")
        * (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .as("v"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val total = pv.values.map(BigDecimal(_)).sum
    val want = pv.filter { case (_, v) => BigDecimal(v) * 10000 > total }
    assert(got.keySet == want.keySet)
    want.foreach { case (k, v) => assert(got(k) == v.doubleValue) }
  }

  test("q71: numwait conserves qualifying orders; blame is the sole returner") {
    val rows = Relational.q71SoleBlame(spark, dir).collect()
    val li = t("lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val per = li.groupBy(_._1).view.mapValues { ls =>
      val supp = ls.map(_._2).toSet
      val ret = ls.filter(_._3 == "R").map(_._2).toSet
      (supp.size, ret)
    }.toMap
    val qualifying = per.filter { case (_, (ns, ret)) => ns >= 2 && ret.size == 1 }
    assert(rows.map(_.getAs[Long]("numwait")).sum == qualifying.size.toLong)
    val blameCount = qualifying.values.groupBy(_._2.head)
      .view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      assert(blameCount(r.getAs[Long]("s_suppkey")) == r.getAs[Long]("numwait"))
    }
  }

  test("q72: members are above-average and urgent-order-free") {
    val rows = Relational.q72Prospects(spark, dir).collect()
    assert(rows.nonEmpty && rows.map(_.getAs[Long]("numcust")).sum > 0)
    val c = t("customer").select(col("c_custkey"), col("c_mktsegment"),
        col("c_acctbal").cast("decimal(18,2)").as("bal"))
      .collect().map(r => (r.getLong(0), r.getString(1), BigDecimal(r.getDecimal(2))))
    val pos = c.map(_._3).filter(_ > 0)
    val (tot, n) = (pos.sum, pos.size)
    val urgent = t("orders").filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).collect().map(_.getLong(0)).toSet
    val want = c.filter { case (k, _, b) => b * n > tot && !urgent(k) }
      .groupBy(_._2).view.mapValues(xs => (xs.size.toLong, xs.map(_._3).sum)).toMap
    assert(rows.length == want.size)
    rows.foreach { r =>
      val (nc, tb) = want(r.getAs[String]("c_mktsegment"))
      assert(r.getAs[Long]("numcust") == nc)
      assert(r.getAs[Double]("totacctbal") == tb.doubleValue)
    }
  }
}
