package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** External-location source format resolution: a `sources:` entry whose
  * `external.location` points at lake files reads them directly, and
  * the FORMAT follows the file extension — `.json`/`.jsonl` → the json
  * datasource (schema inferred), `.csv` → the csv datasource (raw,
  * headerless — Spark's `csv.` table form), anything else → parquet
  * (the default lake format). Both the SQL table form used in compiled
  * model text (`json.`/`csv.`/`parquet.` backtick paths — Spark's
  * direct-file query syntax) and the DataFrame read used by freshness /
  * sampling / unit-test paths resolve through here, so every consumer
  * agrees on the format. */
object ExternalSource {

  def formatOf(path: String): String = {
    val p = path.toLowerCase
    if (p.endsWith(".json") || p.endsWith(".jsonl")) "json"
    else if (p.endsWith(".csv")) "csv"
    else "parquet"
  }

  /** The direct-file SQL table form (`SELECT ... FROM json.`/path/``). */
  def sqlFor(path: String): String = s"${formatOf(path)}.`$path`"

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format(formatOf(path)).load(path)
}
