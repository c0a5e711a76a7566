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
