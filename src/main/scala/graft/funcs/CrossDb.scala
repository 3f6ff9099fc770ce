package graft.funcs

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The cross-database macro surface (SURVEY §2.E) fixed to Spark.
  *
  * The reference dispatches each `MA/utils/` macro per dialect; the
  * Spark overrides live in `MS/utils/`. Here each macro is a Scala
  * function over Columns (codegen'd builtins — no UDFs), plus a SQL-text
  * twin in [[CrossDbSql]] for the Jinja macro context.
  */
object CrossDb {

  /** dateadd (MA/utils/dateadd.sql:1; Spark MS/utils/dateadd.sql):
    * add N datepart units. Composed from date_add/add_months/raw interval
    * arithmetic — all codegen'd. */
  def dateadd(datepart: String, interval: Column, from: Column): Column =
    datepart.toLowerCase match {
      case "year" => add_months(from, interval * 12).cast("timestamp")
      case "quarter" => add_months(from, interval * 3).cast("timestamp")
      case "month" => add_months(from, interval).cast("timestamp")
      case "week" => date_add(from, (interval * 7).cast("int")).cast("timestamp")
      case "day" => date_add(from, interval.cast("int")).cast("timestamp")
      case "hour" => (from.cast("timestamp").cast("long") + interval * 3600L).cast("timestamp")
      case "minute" => (from.cast("timestamp").cast("long") + interval * 60L).cast("timestamp")
      case "second" => (from.cast("timestamp").cast("long") + interval).cast("timestamp")
      case other => throw new IllegalArgumentException(s"dateadd: bad datepart $other")
    }

  /** datediff (MA/utils/datediff.sql:1; Spark MS/utils/datediff.sql):
    * whole-boundary count from `from` to `to`, dialect-datediff semantics
    * (boundaries crossed, not elapsed units). */
  def datediff(datepart: String, from: Column, to: Column): Column =
    datepart.toLowerCase match {
      case "year" => year(to) - year(from)
      case "quarter" =>
        (year(to) - year(from)) * 4 + quarter(to) - quarter(from)
      case "month" =>
        (year(to) - year(from)) * 12 + month(to) - month(from)
      case "week" =>
        // boundary = week start; count Sunday crossings like SQLServer-style
        floor(spark_datediff(next_day(to, "sunday"), next_day(from, "sunday")) / 7)
      case "day" => spark_datediff(to.cast("date"), from.cast("date")).cast("long")
      case "hour" =>
        floor(to.cast("timestamp").cast("long") / 3600) -
          floor(from.cast("timestamp").cast("long") / 3600)
      case "minute" =>
        floor(to.cast("timestamp").cast("long") / 60) -
          floor(from.cast("timestamp").cast("long") / 60)
      case "second" =>
        to.cast("timestamp").cast("long") - from.cast("timestamp").cast("long")
      case other => throw new IllegalArgumentException(s"datediff: bad datepart $other")
    }

  private def spark_datediff(end: Column, start: Column): Column =
    org.apache.spark.sql.functions.datediff(end, start)

  /** date_trunc passthrough (MA/utils/date_trunc.sql). */
  def dateTrunc(datepart: String, c: Column): Column = date_trunc(datepart, c)

  /** last_day passthrough for month; year/quarter via trunc+offset
    * (MA/utils/last_day.sql). */
  def lastDay(c: Column, datepart: String = "month"): Column =
    datepart.toLowerCase match {
      case "month" => last_day(c)
      case "quarter" => last_day(add_months(date_trunc("quarter", c), 2))
      case "year" => last_day(add_months(date_trunc("year", c), 11))
      case other => throw new IllegalArgumentException(s"last_day: bad datepart $other")
    }

  /** date_spine (MA/utils/date_spine.sql:26): one row per period in
    * [start, end). The reference generates a cross-joined powers-of-two CTE
    * ladder; Spark's `sequence()` + `explode` is the one-liner — and at
    * scale it stays a single narrow task per row range, no join. */
  def dateSpine(spark: org.apache.spark.sql.SparkSession, datepart: String,
      start: String, end: String): org.apache.spark.sql.DataFrame = {
    val step = datepart.toLowerCase match {
      case "day" => "interval 1 day"
      case "week" => "interval 7 day"
      case "month" => "interval 1 month"
      case "year" => "interval 1 year"
      case "hour" => "interval 1 hour"
      case other => throw new IllegalArgumentException(s"date_spine: $other")
    }
    spark.sql(
      s"""SELECT explode(sequence(
         |  CAST('$start' AS TIMESTAMP),
         |  CAST('$end' AS TIMESTAMP) - $step,
         |  $step)) AS date_$datepart""".stripMargin)
  }

  /** generate_series (MA/utils/generate_series.sql:18). */
  def generateSeries(spark: org.apache.spark.sql.SparkSession,
      upperBound: Long): org.apache.spark.sql.DataFrame =
    spark.sql(s"SELECT explode(sequence(1L, ${upperBound}L)) AS generated_number")

  /** listagg (MA/utils/listagg.sql; Spark MS/utils/listagg.sql):
    * ordered string aggregation with optional limit —
    * concat_ws(delim, slice(sort_array(collect_list(x)))). */
  def listagg(measure: Column, delimiter: String = ",",
      limitNum: Option[Int] = None): Column = {
    val sorted = sort_array(collect_list(measure))
    val limited = limitNum.map(n => slice(sorted, 1, n)).getOrElse(sorted)
    concat_ws(delimiter, limited)
  }

  /** hash (MA/utils/hash.sql): md5(cast(col as string)). */
  def hash(c: Column): Column = md5(c.cast("string"))

  /** generate_surrogate_key (dbt_utils staple, reference ships it in
    * adapters): md5 of '-'-joined coalesced string casts. */
  def surrogateKey(cols: Seq[Column]): Column =
    md5(concat_ws("-", cols.map(c => coalesce(c.cast("string"), lit("_dbt_utils_surrogate_key_null_"))): _*))

  /** split_part (MA/utils/split_part.sql; negative index via size(split())
    * per MS/utils/split_part.sql). 1-based like the warehouse fn. */
  def splitPart(text: Column, delim: String, part: Int): Column = {
    val parts = split(text, java.util.regex.Pattern.quote(delim))
    if (part > 0) element_at(parts, part)
    else element_at(parts, part) // Spark element_at supports negative index
  }

  /** position (MA/utils/position.sql) → locate (1-based, 0 = absent). */
  def position(substr: String, text: Column): Column = locate(substr, text)

  /** right (MA/utils/right.sql). */
  def right(text: Column, n: Int): Column =
    when(lit(n) <= 0, lit("")).otherwise(substring(text, -n, n))

  /** safe_cast (MA/utils/safe_cast.sql) → try_cast. */
  def safeCast(c: Column, tpe: String): Column = c.try_cast(tpe)

  /** null-safe equals (MA/utils/equals.sql) → `<=>`. */
  def equalsNullSafe(a: Column, b: Column): Column = a <=> b

  /** bool_or (MA/utils/bool_or.sql). */
  def boolOr(c: Column): Column = bool_or(c)

  /** any_value (MA/utils/any_value.sql). */
  def anyValue(c: Column): Column = any_value(c)

  /** array_construct/append/concat (MA/utils/array_ macros). */
  def arrayConstruct(items: Column*): Column = array(items: _*)
  def arrayAppend(arr: Column, item: Column): Column = concat(arr, array(item))
  def arrayConcat(a: Column, b: Column): Column = concat(a, b)

  /** pivot (dbt_utils.pivot — hub package macro the reference serves via
    * its package loader; `crates/dbt-loader` fetches dbt-utils from the
    * hub): one conditional aggregate per pinned pivot value,
    * `agg(CASE WHEN column = v THEN then_value ELSE else_value END) AS v`.
    * The value list is pinned (not discovered) — at scale a two-pass
    * "collect distinct values then pivot" puts a driver collect in the
    * plan; dbt_utils makes the caller pin the list for the same reason.
    * Emits one Column per value; all codegen'd, one partial-agg shuffle. */
  def pivotColumns(column: Column, values: Seq[String], agg: String = "sum",
      thenValue: Column = lit(1), elseValue: Column = lit(0),
      prefix: String = "", suffix: String = ""): Seq[Column] = {
    values.map { v =>
      val branch = when(column === lit(v), thenValue).otherwise(elseValue)
      val agged = agg.toLowerCase match {
        case "sum" => sum(branch)
        case "max" => max(branch)
        case "min" => min(branch)
        case "count" => count(branch)
        case other => throw new IllegalArgumentException(
          s"pivot agg must be sum/max/min/count, got '$other'")
      }
      agged.as(prefix + v + suffix)
    }
  }

  /** unpivot (dbt_utils.unpivot): melt a pinned list of measure columns
    * into (field_name, value) rows. Spark-first: ONE `stack(n, ...)`
    * generator — a map-side row expansion, no shuffle, no union of N
    * scans (dbt_utils emits a UNION ALL per column; at 100 TB that is N
    * scans of the fact table — stack reads it once). Values are cast to
    * `castTo` so heterogeneous measure types share one value column. */
  def unpivot(df: org.apache.spark.sql.DataFrame, idCols: Seq[String],
      valueCols: Seq[String], fieldName: String = "field_name",
      valueName: String = "value", castTo: String = "double")
      : org.apache.spark.sql.DataFrame = {
    require(valueCols.nonEmpty, "unpivot needs at least one value column")
    val pairs = valueCols
      .map(c => s"'$c', CAST(`$c` AS $castTo)").mkString(", ")
    df.selectExpr(idCols.map(c => s"`$c`") :+
      s"stack(${valueCols.size}, $pairs) AS (`$fieldName`, `$valueName`)": _*)
  }

  /** cast_bool_to_text (MA/utils/cast_bool_to_text.sql). */
  def castBoolToText(c: Column): Column =
    when(c.isNull, lit(null).cast("string"))
      .when(c, lit("true")).otherwise(lit("false"))

  /** escape_single_quotes (MA/utils/escape_single_quotes.sql) — SQL-text
    * helper for literal construction. */
  def escapeSingleQuotes(s: String): String = s.replace("'", "''")

  /** string_literal (MA/utils/literal.sql). */
  def stringLiteral(s: String): String = s"'${escapeSingleQuotes(s)}'"

  /** type helpers (MA/utils/data_types.sql) — Spark SQL type names. */
  object Types {
    val bigint = "BIGINT"
    val boolean = "BOOLEAN"
    val float = "FLOAT"
    val int = "INT"
    val numeric = "DECIMAL(28,6)"
    val string = "STRING"
    val timestamp = "TIMESTAMP"
  }

  /** Jinja-side date helpers (MA/etc/datetime.sql:1-66 dates_in_range). */
  def datesInRange(start: String, end: String): Seq[java.time.LocalDate] = {
    val s = java.time.LocalDate.parse(start)
    val e = java.time.LocalDate.parse(end)
    Iterator.iterate(s)(_.plusDays(1)).takeWhile(!_.isAfter(e)).toSeq
  }
}
