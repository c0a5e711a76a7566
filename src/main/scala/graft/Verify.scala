package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Gate output types proven hash-stable across the Spark-parquet →
    * pyarrow vs DuckDB-fetch boundary. Anything else (notably
    * decimal128 — round 6's s17 was value-exact but hash-red because
    * DuckDB and pyarrow surface DECIMAL(38,0) differently) must be
    * cast at the query boundary (BIGINT, DOUBLE, or the q1
    * VARCHAR-hop). Checked BEFORE execution so a new query with an
    * unstable type fails loudly at build time, not as a one-row
    * mystery in the driver's CORRECTNESS json. */
  private val stableTypes: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
      StringType, DateType, TimestampType, BooleanType, BinaryType)

  def assertStableSchema(name: String, schema: StructType): Unit = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(e, _)     => ok(e)
      case MapType(k, v, _)    => ok(k) && ok(v)
      case StructType(fs)      => fs.forall(f => ok(f.dataType))
      case t                   => stableTypes(t)
    }
    val bad = schema.fields.filterNot(f => ok(f.dataType))
    require(bad.isEmpty,
      s"[verify] $name emits non-hash-stable column type(s): " +
        bad.map(f => s"${f.name}: ${f.dataType.sql}").mkString(", ") +
        " — cast to BIGINT/DOUBLE/STRING at the query boundary " +
        "(see the q1 decimal convention)")
  }

  /** Value-range companion to the type guard above: a TimestampType
    * column is hash-stable only while its VALUES fit pandas/pyarrow's
    * ns-ranged datetime64 (max 2262-04-11T23:47); round 7's e37 was
    * value-exact but hash-red because a 9999-12-31 SCD2 sentinel
    * overflowed it, and the two driver fetch paths materialized
    * different bit patterns. Checked on the gated OUTPUT (small,
    * already coalesced) so a future sentinel-style timestamp/date is
    * a named local failure, like the type guard made s17's decimal.
    * Returns silently when no temporal columns exist (no extra scan). */
  private val NsMaxMicros = 9223372036854775L   // (2^63-1) ns in µs = 2262-04-11
  private val NsMinMicros = -9223372036854775L  // -(2^63-1) ns in µs = 1677-09-21
  private val NsMaxDays   = 106751              // floor(ns-max / 86400 s)
  private val NsMinDays   = -106751             // below-range floor (pre-1677-09-21)
  def assertStableValues(name: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.functions.{col, max, min, unix_micros, datediff, lit, to_date}
    val tsCols  = df.schema.fields.collect { case f if f.dataType == TimestampType => f.name }
    val dtCols  = df.schema.fields.collect { case f if f.dataType == DateType => f.name }
    if (tsCols.nonEmpty || dtCols.nonEmpty) {
      // Both ends: a below-range sentinel (e.g. 0001-01-01) overflows
      // pandas' datetime64[ns] exactly like 9999-12-31 does.
      val aggs = tsCols.flatMap(c => Seq(
          max(unix_micros(col(c))).as(s"tsmax_$c"),
          min(unix_micros(col(c))).as(s"tsmin_$c"))) ++
        dtCols.flatMap(c => Seq(
          max(datediff(col(c), to_date(lit("1970-01-01")))).as(s"dtmax_$c"),
          min(datediff(col(c), to_date(lit("1970-01-01")))).as(s"dtmin_$c")))
      val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
      val over = tsCols.zipWithIndex.collect {
        case (c, i) if (!row.isNullAt(2 * i) && row.getLong(2 * i) > NsMaxMicros) ||
          (!row.isNullAt(2 * i + 1) && row.getLong(2 * i + 1) < NsMinMicros) => c
      } ++ dtCols.zipWithIndex.collect {
        case (c, i) if {
          val base = 2 * tsCols.length + 2 * i
          (!row.isNullAt(base) && row.getInt(base) > NsMaxDays) ||
            (!row.isNullAt(base + 1) && row.getInt(base + 1) < NsMinDays)
        } => c
      }
      require(over.isEmpty,
        s"[verify] $name emits temporal value(s) outside pandas' ns range " +
          s"(1677-09-21 … 2262-04-11) in column(s): ${over.mkString(", ")} — " +
          "sentinel dates are banned from gated outputs; use NULL + a flag " +
          "(the e37 convention) or epoch-µs BIGINT")
    }
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional trailing args: run only these queries (iteration aid —
    // the driver always runs the full set)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus.toInt, cpus.toInt)
    new java.io.File(outDir).mkdirs()
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only(n) }
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        assertStableSchema(name, df.schema)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        try assertStableValues(name, spark.read.parquet(s"$outDir/$name"))
        catch { case e: Throwable =>
          // a failed value guard must not leave output behind — the
          // driver would hash-compare the bad parquet instead of
          // recording a loud missing-query failure
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
          }
          rm(new java.io.File(s"$outDir/$name"))
          throw e
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
