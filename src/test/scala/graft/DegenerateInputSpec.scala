package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Every query must run (not necessarily return rows) on degenerate
  * inputs: an EMPTY dataset and a TINY (≤3 rows/table) dataset. This
  * catches the empty-aggregate/NULL class of bugs (e.g. a sum that
  * returns NULL where the oracle counts 0) and off-by-one windows that
  * only show on short inputs — cases the sf≥0.001 oracle gate never
  * exercises.
  */
class DegenerateInputSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = GraftSession.local(threads = 4, shufflePartitions = 4)
  private val srcDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  /** Copy the first `n` rows of every table (0 = empty), preserving the
    * on-disk layout contract (events.ts stays raw int64 nanos). */
  private def materialize(n: Int): String = {
    val dir = Files.createTempDirectory(s"graft_degenerate_$n").toString
    graft.sources.Tables.all.foreach { t =>
      // nanosAsLong lets the raw events TIMESTAMP(NANOS) read as int64
      // (same flag Tables.load sets; session-scoped and idempotent)
      if (t == "events") spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$srcDir/$t.parquet")
        .limit(n).coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def runAll(dir: String): Unit =
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      withClue(s"query $name on $dir: ") {
        val out = fn(spark, dir)
        out.collect() // must not throw
        assert(out.schema.nonEmpty)
      }
    }

  test("every query runs on an empty dataset") {
    runAll(materialize(0))
  }

  test("every query runs on a 3-row dataset") {
    runAll(materialize(3))
  }
}
