package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the discrete-quantile index convention e26's RFM cut points
  * depend on (advisor round-6 note): Spark's `percentile_disc(p)` must
  * return the element at 1-based index ceil(p·n) — the SQL-standard
  * "smallest value with cum. dist ≥ p". A lower-index convention
  * (floor(p·n)+1 variants, nearest-rank-round) differs exactly when
  * frac(p·n) > 0 falls below p — e.g. p=0.4 over n=8 (p·n=3.2:
  * standard picks the 4th value, lower variants the 3rd). If a Spark
  * or DuckDB upgrade ever flips either side, this spec (or the e26
  * gate) goes red loudly instead of silently recoding segments.
  */
class QuantileConventionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("graft-quantile-convention-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def disc(n: Int, p: Double): Long = {
    val sq = spark
    import sq.implicits._
    (1 to n).map(_.toLong).toDF("v")
      .agg(expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY v)").cast("long"))
      .collect()(0).getLong(0)
  }

  test("percentile_disc picks index ceil(p*n) on crafted boundary sizes") {
    // (n, p, ceil(p*n)) — every case has frac(p*n) > 0, where the
    // standard and lower-index conventions actually disagree
    val cases = Seq(
      (8, 0.2, 2L), (8, 0.4, 4L), (8, 0.6, 5L), (8, 0.8, 7L),
      (13, 0.4, 6L),  // n ≡ 3 (mod 5): p·n = 5.2 — the advisor's case
      (7, 0.5, 4L),   // e20's median pin
      (9, 0.2, 2L), (11, 0.8, 9L))
    cases.foreach { case (n, p, want) =>
      assert(disc(n, p) == want, s"percentile_disc($p) over 1..$n")
    }
  }

  test("exact multiples stay on the boundary value (no off-by-one)") {
    // frac(p*n) == 0: both conventions agree — pin it anyway so a
    // future nearest-rank rounding change can't sneak past
    assert(disc(10, 0.4) == 4L)
    assert(disc(5, 0.2) == 1L)
  }
}
