package graft.packs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** A bundle of named queries plus their DuckDB oracle SQL.
  *
  * Conventions that make the driver's hash-compare deterministic:
  *   - Money/measure aggregates are computed in DECIMAL (exact, order-
  *     independent) and cast to DOUBLE at the end, so Spark and DuckDB
  *     produce bit-identical doubles regardless of aggregation order.
  *   - Every query is deterministically ordered (full-column sort) and the
  *     oracle carries the same ORDER BY.
  *   - Column names are aliased identically on both sides.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]

  /** Exact decimal view of a double measure column; scale 4 keeps the
    * scale-2-ish synthetic money columns away from rounding ties. */
  protected def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Final projection for a decimal aggregate: round to scale 4, then emit
    * DOUBLE. The driver's hash-compare mismatches on ANY decimal output
    * column (r1: every decimal-emitting query hash-failed, including ones
    * type-identical to the oracle at DECIMAL(38,8)), so final outputs must
    * be double. The (38,4) hop keeps the unscaled value < 2^53 (money data
    * has ≤2 fractional digits; sums ≤ ~4e10 at sf0.1), making the
    * decimal→double conversion exactly rounded and identical in Spark and
    * DuckDB. Oracles mirror it: CAST(CAST(agg AS DECIMAL(38,4)) AS DOUBLE). */
  protected def moneyOut(c: Column): Column =
    c.cast(DecimalType(38, 4)).cast("double")
}
