package graft.mat

import graft.adapter.SparkAdapter
import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generic data tests (reference: MA/generic_test_sql/{unique,not_null,
  * accepted_values,relationships}.sql) as DataFrame builders — each returns
  * the FAILING rows, exactly like the reference's test SQL. */
object GenericTests {

  /** GROUP BY key HAVING count(*) > 1 (unique.sql). */
  def unique(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNotNull)
      .groupBy(col(column))
      .agg(count(lit(1)).as("n_records"))
      .filter(col("n_records") > 1)

  /** WHERE col IS NULL (not_null.sql). */
  def notNull(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNull)

  /** Values outside the accepted list (accepted_values.sql). */
  def acceptedValues(df: DataFrame, column: String, values: Seq[Any]): DataFrame =
    df.groupBy(col(column).as("value_field"))
      .agg(count(lit(1)).as("n_records"))
      .filter(!col("value_field").isin(values: _*))

  /** Child keys with no parent (relationships.sql): child LEFT JOIN parent
    * WHERE parent IS NULL. */
  def relationships(child: DataFrame, childCol: String,
      parent: DataFrame, parentCol: String): DataFrame = {
    val p = parent.select(col(parentCol).as("__parent_key")).distinct()
    child.filter(col(childCol).isNotNull)
      .join(p, col(childCol) === col("__parent_key"), "left_anti")
      .select(col(childCol).as("from_field"))
  }
}

/** Test execution: wrap the failing-rows query in fail_calc / limit, then
  * evaluate severity thresholds (reference: MA/materializations/tests/
  * test.sql:1-66 + helpers.sql:2-16 get_test_sql; Severity common.rs:1016;
  * warn_if/error_if are SQL comparison snippets like "!= 0" / ">10"). */
object TestMat {
  final case class TestResult(
      status: String, // pass | warn | fail | error
      failures: Long,
      shouldWarn: Boolean,
      shouldError: Boolean,
      failuresRelation: Option[Relation] = None)

  /** `select {fail_calc} from (main_sql) dbt_internal_test {limit}` —
    * evaluated as one Spark job. `where` config pre-filters the subject
    * (where_subquery.sql:1-16) — applied by the caller when building
    * `failingRows`. */
  def run(spark: SparkSession, failingRows: DataFrame, cfg: NodeConfig,
      adapter: Option[SparkAdapter] = None,
      storeAs: Option[Relation] = None,
      /** The test's SQL form, for store_failures_as: view — the view's
        * body IS the failing-rows query, so it re-evaluates live like
        * dbt's (builtin generic tests get a SQL twin from the Runner). */
      storeSql: Option[String] = None): TestResult = {
    val limited = cfg.limit.map(failingRows.limit).getOrElse(failingRows)
    // store_failures / store_failures_as persist the failing rows
    // (StoreFailuresAs common.rs:1007-1012; ephemeral wins over
    // store_failures: true, table/view win over its absence).
    (adapter, storeAs, cfg.effectiveStoreFailures) match {
      case (Some(a), Some(rel), Some("table")) =>
        a.createSchema(rel.schema)
        a.writeTableAtomic(limited, rel)
      case (Some(a), Some(rel), Some("view")) =>
        val sql = storeSql.getOrElse(throw new IllegalArgumentException(
          "store_failures_as: view needs the test's SQL form"))
        val body = cfg.limit
          .map(n => s"SELECT * FROM ($sql) __dbt_sf LIMIT $n").getOrElse(sql)
        a.createSchema(rel.schema)
        a.execute(s"CREATE OR REPLACE VIEW ${rel.fqn} AS $body")
      case _ =>
    }
    val failCalcDf = limited.agg(expr(cfg.failCalc).as("failures"))
    val row = failCalcDf.collect()(0)
    val failures = Option(row.get(0)).map {
      case l: Long => l
      case i: Int => i.toLong
      case d: Double => d.toLong
      case other => other.toString.toDouble.toLong
    }.getOrElse(0L)

    val shouldWarn = evalThreshold(failures, cfg.warnIf)
    val shouldError = evalThreshold(failures, cfg.errorIf)
    val status =
      if (cfg.severity == Severity.Error && shouldError) "fail"
      else if (shouldWarn || shouldError) "warn"
      else "pass"
    TestResult(status, failures, shouldWarn, shouldError,
      storeAs.filter(_ => cfg.effectiveStoreFailures.isDefined))
  }

  /** Evaluate "!= 0", "> 10", ">= 5" style threshold snippets against the
    * fail_calc result (helpers.sql:7-16). */
  private[graft] def evalThreshold(value: Long, snippet: String): Boolean = {
    val m = raw"\s*(!=|>=|<=|=|>|<)\s*(-?\d+)\s*".r
    snippet match {
      case m(op, n) =>
        val t = n.toLong
        op match {
          case "!=" => value != t
          case "=" => value == t
          case ">" => value > t
          case ">=" => value >= t
          case "<" => value < t
          case "<=" => value <= t
        }
      case other =>
        throw new IllegalArgumentException(s"bad threshold expression: $other")
    }
  }
}

/** Unit tests: run the model with its refs replaced by fixture rows, then
  * diff actual vs expected (reference: MA/materializations/tests/unit.sql:
  * 1-33 + helpers.sql:19-45 get_unit_test_sql, fixtures
  * MA/unit_test_sql/get_fixture_sql.sql:2-108, Formats common.rs:759-765).
  *
  * Fixtures become `SELECT ... FROM VALUES` temp views substituted for the
  * refs; the diff is exceptAll both ways (reference emits
  * actual-UNION-ALL-expected with dbt_internal_unit_test_* markers — we
  * return the same shape so a failing diff is inspectable).
  */
object UnitTestMat {
  final case class UnitResult(status: String, diff: DataFrame)

  /** Build a typed single-use DataFrame from fixture rows. Missing keys →
    * null (get_fixture_sql pads absent columns). */
  def fixtureDf(spark: SparkSession, rows: Seq[Map[String, Any]],
      template: Option[DataFrame]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // fixtures pad absent columns with null, so the template's nullability
    // must not be trusted (a toDF-on-primitives template is non-nullable)
    val schema: StructType = template
      .map(t => StructType(t.schema.fields.map(_.copy(nullable = true))))
      .getOrElse {
        val names = rows.flatMap(_.keys).distinct
        StructType(names.map(n => StructField(n, StringType)))
      }
    val data = rows.map { m =>
      Row.fromSeq(schema.fields.map { f =>
        m.get(f.name).map(coerce(_, f.dataType)).orNull
      }.toSeq)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toIndexedSeq, 1), schema)
  }

  /** Fixture in `format: csv` — inline csv text with a header row
    * (reference: Formats common.rs:759-765; csv parsing in
    * MA/unit_test_sql/get_fixture_sql.sql:62-90). Empty cells → null;
    * values are coerced to the template's column types like dict rows. */
  def fixtureDfCsv(spark: SparkSession, csvText: String,
      template: Option[DataFrame]): DataFrame = {
    val lines = csvText.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
    require(lines.nonEmpty, "csv fixture needs a header row")
    val header = splitCsvLine(lines.head)
    val rows = lines.tail.map { line =>
      header.zip(splitCsvLine(line))
        .collect { case (k, v) if v.nonEmpty => k -> (v: Any) }.toMap
    }
    fixtureDf(spark, rows, template)
  }

  /** One csv line → fields; double quotes guard embedded commas, doubled
    * quotes escape a literal quote. */
  private[graft] def splitCsvLine(line: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuote) {
        if (c == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') {
          sb += '"'; i += 1
        } else if (c == '"') inQuote = false
        else sb += c
      } else c match {
        case '"' => inQuote = true
        case ',' => out += sb.toString.trim; sb.clear()
        case other => sb += other
      }
      i += 1
    }
    out += sb.toString.trim
    out.result()
  }

  /** Fixture in `format: sql` — an arbitrary query supplies the rows
    * (get_fixture_sql.sql:92-108). */
  def fixtureDfSql(spark: SparkSession, sql: String): DataFrame =
    spark.sql(sql)

  private def coerce(v: Any, dt: org.apache.spark.sql.types.DataType): Any = {
    import org.apache.spark.sql.types._
    if (v == null) null
    else dt match {
      case LongType => v.toString.toLong
      case IntegerType => v.toString.toInt
      case DoubleType => v.toString.toDouble
      case BooleanType => v.toString.toBoolean
      case TimestampType => java.sql.Timestamp.valueOf(v.toString)
      case DateType => java.sql.Date.valueOf(v.toString)
      case _: DecimalType => new java.math.BigDecimal(v.toString)
      case StringType => v.toString
      case _ => v
    }
  }

  /** actual vs expected rows, marked like dbt_internal_unit_test_actual /
    * _expected (helpers.sql:24-45). Empty diff ⇒ pass. */
  def run(actual: DataFrame, expected: DataFrame): UnitResult = {
    val cols = actual.columns.toIndexedSeq
    val exp = expected.select(cols.map(col): _*)
    val missing = exp.exceptAll(actual)
      .withColumn("dbt_unit_test_side", lit("expected"))
    val extra = actual.exceptAll(exp)
      .withColumn("dbt_unit_test_side", lit("actual"))
    val diff = missing.unionByName(extra)
    val status = if (diff.isEmpty) "pass" else "fail"
    UnitResult(status, diff)
  }
}

/** Source freshness: `SELECT max(loaded_at_field) FROM source [WHERE ...]`
  * compared to now against warn/error windows (reference:
  * MA/adapters/freshness.sql:2-36; FreshnessRules common.rs:26-180). */
object Freshness {
  final case class FreshnessResult(maxLoadedAt: Option[java.sql.Timestamp],
      ageSeconds: Double, status: String)

  def periodSeconds(period: String): Long = period match {
    case "minute" => 60L
    case "hour" => 3600L
    case "day" => 86400L
    case other => throw new IllegalArgumentException(s"unknown period: $other")
  }

  def check(df: DataFrame, loadedAtField: String,
      now: java.sql.Timestamp,
      warnAfter: Option[(Long, String)],
      errorAfter: Option[(Long, String)],
      filter: Option[String] = None): FreshnessResult = {
    val base = filter.map(df.filter).getOrElse(df)
    val row = base.agg(max(col(loadedAtField).cast("timestamp"))).collect()(0)
    val maxTs = Option(row.getTimestamp(0))
    val age = maxTs.map(t => (now.getTime - t.getTime) / 1000.0).getOrElse(Double.MaxValue)
    def breached(rule: Option[(Long, String)]): Boolean = rule.exists {
      case (count, period) => age > count * periodSeconds(period)
    }
    val status =
      if (breached(errorAfter)) "error"
      else if (breached(warnAfter)) "warn"
      else "pass"
    FreshnessResult(maxTs, age, status)
  }

  /** Custom-SQL freshness (reference: loaded_at_query in nodes.rs /
    * manifest_nodes.rs): run a user query returning ONE timestamp cell
    * and evaluate the same warn/error windows. `{{ this }}` in the query
    * is substituted with the source's scan SQL before execution. */
  def checkQuery(spark: org.apache.spark.sql.SparkSession, query: String,
      thisSql: String, now: java.sql.Timestamp,
      warnAfter: Option[(Long, String)],
      errorAfter: Option[(Long, String)]): FreshnessResult = {
    val sql = query.replace("{{ this }}", thisSql).replace("{{this}}", thisSql)
    val row = spark.sql(sql).collect().headOption
    val maxTs = row.flatMap(r =>
      if (r.isNullAt(0)) None
      else Some(r.get(0) match {
        case t: java.sql.Timestamp => t
        case d: java.sql.Date => new java.sql.Timestamp(d.getTime)
        case other => java.sql.Timestamp.valueOf(other.toString)
      }))
    val age = maxTs.map(t => (now.getTime - t.getTime) / 1000.0)
      .getOrElse(Double.MaxValue)
    def breached(rule: Option[(Long, String)]): Boolean = rule.exists {
      case (count, period) => age > count * periodSeconds(period)
    }
    val status =
      if (breached(errorAfter)) "error"
      else if (breached(warnAfter)) "warn"
      else "pass"
    FreshnessResult(maxTs, age, status)
  }

  /** Metadata-based freshness for sources WITHOUT a `loaded_at_field`
    * (reference: crates/dbt-adapter/src/metadata/mod.rs:96
    * MetadataFreshness.last_altered; dbt's "calculate freshness from
    * warehouse metadata" path). On file-backed sources the warehouse
    * last-altered timestamp is the storage layer's: the max mtime of the
    * data files under the source location. Directory listing happens on
    * the driver — it's one metadata walk, not a data scan, which is the
    * entire point of the metadata path at 100 TB: freshness without
    * reading a single row. */
  def checkMetadata(location: String, now: java.sql.Timestamp,
      warnAfter: Option[(Long, String)],
      errorAfter: Option[(Long, String)]): FreshnessResult = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get(location)
    if (!Files.exists(root))
      throw new IllegalArgumentException(s"freshness source not found: $location")
    val files =
      if (Files.isRegularFile(root)) Seq(root)
      else {
        val stream = Files.walk(root)
        try stream.iterator().asScala
          .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("_"))
          .toSeq
        finally stream.close()
      }
    val maxMtime = files.map(Files.getLastModifiedTime(_).toMillis) match {
      case Nil => None
      case ms => Some(new java.sql.Timestamp(ms.max))
    }
    val age = maxMtime.map(t => (now.getTime - t.getTime) / 1000.0)
      .getOrElse(Double.MaxValue)
    def breached(rule: Option[(Long, String)]): Boolean = rule.exists {
      case (count, period) => age > count * periodSeconds(period)
    }
    val status =
      if (breached(errorAfter)) "error"
      else if (breached(warnAfter)) "warn"
      else "pass"
    FreshnessResult(maxMtime, age, status)
  }
}

/** SQL-bodied scalar function (reference: MA/materializations/functions/
  * function.sql:1-16 + scalar.sql:1-38 → CREATE OR REPLACE FUNCTION). Spark
  * SQL UDFs (`CREATE FUNCTION ... RETURNS t RETURN body`) are codegen-
  * friendly: the body inlines into the calling plan, unlike Scala UDFs. */
object FunctionMat {
  def create(spark: SparkSession, name: String,
      args: Seq[(String, String)], returns: String, body: String): Unit = {
    val argsDdl = args.map { case (n, t) => s"$n $t" }.mkString(", ")
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY FUNCTION $name($argsDdl) RETURNS $returns RETURN $body")
  }

  /** Catalog-persistent form for function NODES (reference
    * MA/materializations/functions/function.sql → CREATE OR REPLACE
    * FUNCTION): survives the session, shows in SHOW USER FUNCTIONS,
    * and models invoke it by its qualified name. */
  def createPersistent(spark: SparkSession, rel: graft.core.Relation,
      args: Seq[(String, String)], returns: String, body: String): Unit = {
    val argsDdl = args.map { case (n, t) => s"`$n` $t" }.mkString(", ")
    spark.sql(
      s"CREATE OR REPLACE FUNCTION ${rel.fqn}($argsDdl) " +
        s"RETURNS $returns RETURN $body")
  }
}
