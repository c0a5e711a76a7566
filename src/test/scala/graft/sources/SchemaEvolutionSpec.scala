package graft.sources

import org.apache.spark.sql.SaveMode
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The additive schema-evolution contract of [[TableIO.readEvolved]]:
  * a dataset whose files were written under progressively wider
  * schemas reads back with the UNION of all columns, early files
  * backfilling NULL — and a plain read really does exhibit the
  * footer-lottery hazard the helper exists to avoid (it may drop the
  * late column entirely, depending on which footer wins). */
class SchemaEvolutionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = graft.GraftSession.local(threads = 2, shufflePartitions = 2)

  override def afterAll(): Unit = spark.stop()

  test("readEvolved unions footers; early files backfill NULL") {
    val sq = spark
    import sq.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    // v1 writer: (id, a)
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .repartition(1).write.mode(SaveMode.Overwrite).parquet(dir)
    // v2 writer appends with an extra column (id, a, b)
    Seq((3L, "z", 30L)).toDF("id", "a", "b")
      .repartition(1).write.mode(SaveMode.Append).parquet(dir)

    val df = TableIO.readEvolved(spark, dir)
    assert(df.columns.sorted.sameElements(Array("a", "b", "id")),
      "every column that ever existed appears")
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).isNullAt(rows(0).fieldIndex("b")) &&
      rows(1).isNullAt(rows(1).fieldIndex("b")),
      "files written before the column read it as NULL")
    assert(rows(2).getAs[Long]("b") == 30L)
    // and values from the v1 files are intact
    assert(rows(0).getAs[String]("a") == "x")

    // the hazard is real: a plain read yields SOME footer's schema —
    // never more columns than the merged read, sometimes fewer
    val plain = spark.read.parquet(dir)
    assert(plain.columns.length <= df.columns.length)
  }
}
