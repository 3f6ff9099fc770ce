package graft

import graft.packs._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 is surfaced here as a named query
  * over the driver's test tables plus an equivalent DuckDB oracle SQL; the
  * driver hash-compares the two at sf0.01 (BASELINE.md t2).
  */
object SparkEntry {
  /** Registered query packs; each contributes queries + oracle SQL. */
  private val packs: Seq[QueryPack] = Seq(
    RelationalPack,
    MaterializationPack,
    IncrementalPack,
    FuncsPack,
    EnginePack,
    PipelinePack,
    StreamingPack
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
