package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** TableIO.upsertCompact — the e28 latest-state primitive as an
  * atomic parquet sink: fold updates, keep the max-version row per
  * key, swap atomically. Laws: snapshot == batch max-struct over
  * base ∪ updates; replaying the same updates is a no-op; an empty
  * update set is a pure re-compaction. */
class UpsertCompactSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("graft-upsert-compact-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("upsert folds the changelog to max-version rows, idempotently") {
    val sq = spark
    import sq.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val path = s"$dir/t"
    Seq((1L, 10L, 1L, "v1"), (2L, 10L, 2L, "a"), (1L, 20L, 3L, "v2"))
      .toDF("k", "ver", "rid", "payload")
      .write.parquet(path)

    // update: newer version for key 1, a LATE row for key 2 (older
    // than nothing — key 2 keeps its only row), a brand-new key 3
    val updates = Seq((1L, 30L, 4L, "v3"), (2L, 5L, 5L, "stale"),
      (3L, 1L, 6L, "new")).toDF("k", "ver", "rid", "payload")
    val n = TableIO.upsertCompact(spark, path, updates, "k", Seq("ver", "rid"))
    assert(n == 3L)
    def snap() = spark.read.parquet(path)
      .collect().map(r => (r.getAs[Long]("k"),
        (r.getAs[Long]("ver"), r.getAs[String]("payload")))).toMap
    val s1 = snap()
    assert(s1 == Map(1L -> ((30L, "v3")), 2L -> ((10L, "a")),
      3L -> ((1L, "new"))))

    // replay: same updates again — nothing may change
    TableIO.upsertCompact(spark, path, updates, "k", Seq("ver", "rid"))
    assert(snap() == s1, "replay must be a no-op")

    // empty updates: pure re-compaction
    TableIO.upsertCompact(spark, path,
      updates.limit(0), "k", Seq("ver", "rid"))
    assert(snap() == s1)
  }
}
