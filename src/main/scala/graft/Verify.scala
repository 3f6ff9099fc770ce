package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType, TimestampNTZType, TimestampType}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional 3rd arg: comma-separated query names (local dev only; the
    // driver always runs the full map).
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Micros parquet output: Spark's default ns writer silently wraps
      // int64 for timestamps ≥ 2262-04-11 (far-future SCD-2 markers).
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    LogTuning.quietBenignWindowWarning()
    new java.io.File(outDir).mkdirs()
    // Session TZ is UTC, so TIMESTAMP → TIMESTAMP_NTZ preserves the wall
    // clock; combined with the micros pin above, parquet gets naive
    // timestamp[us] — exactly what DuckDB produces for the oracle SQL.
    // (Spark's tz-aware type writes isAdjustedToUTC=true, which the
    // driver's hasher sees as tz-aware and mismatches DuckDB's naive.)
    // Rewrites TimestampType anywhere in the type tree (incl. nested in
    // struct/array/map — a cast recurses); column names are backtick-quoted
    // so dots aren't parsed as struct access.
    def dropTz(dt: DataType): DataType = dt match {
      case TimestampType => TimestampNTZType
      case s: StructType =>
        StructType(s.fields.map(f => f.copy(dataType = dropTz(f.dataType))))
      case a: ArrayType  => a.copy(elementType = dropTz(a.elementType))
      case m: MapType    => m.copy(keyType = dropTz(m.keyType),
        valueType = dropTz(m.valueType))
      case other => other
    }
    def naiveTs(df: DataFrame): DataFrame =
      df.schema.fields.foldLeft(df) { (d, f) =>
        val target = dropTz(f.dataType)
        if (target == f.dataType) d
        else d.withColumn(f.name, d.col(s"`${f.name}`").cast(target))
      }
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try naiveTs(fn(spark, sfDir)).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
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
