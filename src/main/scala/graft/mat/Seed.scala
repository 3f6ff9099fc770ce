package graft.mat

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Seed materialization: CSV file → typed table (reference:
  * MA/materializations/seeds/seed.sql:1-60 + helpers.sql:2-134; Spark
  * override MS/materializations/seed.sql:15 spark__load_csv_rows).
  *
  * The reference renders batched INSERT statements through agate-typed
  * values; on Spark the natural path is the CSV DataSource with schema
  * inference, then explicit casts from the YAML `column_types` overrides
  * (seed config: crates/dbt-schemas/src/schemas/project/configs/
  * seed_config.rs). Header normalization: unless `quote_columns` is set,
  * headers are lower-cased and de-spaced, mirroring quote_seed_column
  * (funcs.rs:254).
  */
object SeedMat extends Materialization {
  val name = "seed"

  def run(ctx: MatContext): MatResult = {
    val df = load(ctx.spark, ctx.node.path, ctx.config)
    ctx.adapter.writeTableAtomic(df, ctx.target, ctx.config.partitionBy,
      ctx.config.sortBy)
    MatResult(ctx.target, "success", s"seed loaded from ${ctx.node.path}")
  }

  def load(spark: SparkSession, csvPath: String, cfg: NodeConfig): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("delimiter", cfg.delimiter.getOrElse(","))
      .option("inferSchema", "true")
      .option("nullValue", "")
      .option("emptyValue", "")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(csvPath)
    val renamed =
      if (cfg.quoteColumns) raw
      else raw.columns.foldLeft(raw) { (df, c) =>
        df.withColumnRenamed(c, normalize(c))
      }
    // column_types overrides win over inference.
    cfg.columnTypes.foldLeft(renamed) { case (df, (name, tpe)) =>
      val key = if (cfg.quoteColumns) name else normalize(name)
      if (df.columns.contains(key)) df.withColumn(key, col(key).cast(tpe)) else df
    }
  }

  private def normalize(name: String): String =
    name.trim.toLowerCase.replaceAll("[^a-z0-9_]", "_")
}
