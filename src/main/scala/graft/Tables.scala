package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (/root/repo/TESTDATA.md).
  *
  * All engine code reads sources through here so that the scan always goes
  * through the DataSource V2 parquet reader (column pruning + predicate
  * pushdown land in the scan; verify with `.explain("formatted")`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts has shipped as parquet TIMESTAMP(NANOS) (rejected by the
    // vectorized reader — read as raw nanos long and truncate to micros,
    // same as DuckDB's nanos→micros coercion) and as TIMESTAMP(MICROS)
    // without timezone (read as NTZ — cast to the session type; session TZ
    // is UTC everywhere so the wall clock is preserved). Branch on what the
    // file actually contains so both generations load identically.
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", org.apache.spark.sql.functions.expr(
            "timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampType => df
        case _ => // TIMESTAMP_NTZ
          df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every test table as a temp view (idempotent). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
