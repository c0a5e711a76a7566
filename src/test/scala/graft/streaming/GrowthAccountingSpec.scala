package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Growth-accounting laws for e38: the three classes partition each
  * week's actives, every user is NEW in exactly the week of their
  * first day and never again, and the classification reproduces from
  * a driver-side replay over the distinct (user, day) log. */
class GrowthAccountingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.01"
  private lazy val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 4)

  override def afterAll(): Unit = spark.stop()

  test("classes partition actives; replay agrees") {
    val rows = EventOps.e38GrowthAccounting(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") ==
        r.getAs[Long]("n_new") + r.getAs[Long]("n_resurrected") +
          r.getAs[Long]("n_continuing"),
        "the three classes partition the week's actives")
    }
    assert(rows.map(_.getAs[Long]("n_new")).sum > 0, "new users exist")
    assert(rows.map(_.getAs[Long]("n_continuing")).sum > 0)
    // replay: per user the sorted distinct days; classify each week's
    // first day by its gap to the previous day
    val ud = graft.sources.Tables.load(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).cast("string")).distinct()
      .collect().map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1))))
      .groupBy(_._1)
    val weekOf = (d: java.time.LocalDate) =>
      d.`with`(java.time.DayOfWeek.MONDAY).toString
    val tally = scala.collection.mutable.Map.empty[(String, String), Long]
    ud.foreach { case (_, days) =>
      val ds = days.map(_._2).sortBy(_.toEpochDay)
      ds.zipWithIndex.groupBy(p => weekOf(p._1)).foreach { case (wk, inWeek) =>
        val (first, idx) = inWeek.minBy(_._2)
        val status =
          if (idx == 0) "new"
          else {
            val gap = first.toEpochDay - ds(idx - 1).toEpochDay
            if (gap > 3) "resurrected" else "continuing"
          }
        tally((wk, status)) = tally.getOrElse((wk, status), 0L) + 1L
      }
    }
    rows.foreach { r =>
      val wk = r.getAs[String]("week")
      assert(r.getAs[Long]("n_new") == tally.getOrElse((wk, "new"), 0L), s"$wk new")
      assert(r.getAs[Long]("n_resurrected") ==
        tally.getOrElse((wk, "resurrected"), 0L), s"$wk resurrected")
      assert(r.getAs[Long]("n_continuing") ==
        tally.getOrElse((wk, "continuing"), 0L), s"$wk continuing")
    }
    // every user is new exactly once across the whole board
    assert(rows.map(_.getAs[Long]("n_new")).sum == ud.size)
  }
}
