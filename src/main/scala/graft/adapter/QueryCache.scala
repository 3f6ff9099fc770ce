package graft.adapter

import graft.jinja.Json
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Path, Paths}

/** Query-result cache with record / replay modes (reference:
  * crates/dbt-adapter/src/query_cache.rs:310-384 QueryCacheImpl +
  * record_and_replay.rs). Purpose-built for test infra: `record` runs a
  * build normally while persisting every read-query result; `replay`
  * serves those results without touching the warehouse, so a run can be
  * re-executed deterministically (and fast) with no live Spark tables.
  *
  * Spark-native framing: enabled per session via
  *   spark.graft.queryCache.mode = off | record | replay
  *   spark.graft.queryCache.path = <directory>
  * Only READ statements (select/with/show/describe/values) are cached —
  * DDL/DML always executes live, because replaying a CTAS's empty result
  * would silently skip its side effect. Keys are a sha-256 of the
  * normalized SQL: comments stripped, whitespace collapsed, and the two
  * volatile name classes the reference also normalizes
  * (query_cache.rs:380-397) — `__dbt_tmp`-style uuid suffixes and
  * `___<epoch>___` schema stamps — removed, so logically identical
  * statements from different runs hit the same entry. */
object QueryCache {

  final val ModeKey = "spark.graft.queryCache.mode"
  final val PathKey = "spark.graft.queryCache.path"

  private def conf(spark: SparkSession, key: String, dflt: String): String =
    spark.conf.getOption(key).getOrElse(dflt)

  def mode(spark: SparkSession): String = conf(spark, ModeKey, "off")

  private def rootDir(spark: SparkSession): Path = {
    val p = conf(spark, PathKey, "")
    require(p.nonEmpty, s"$PathKey must be set when $ModeKey != off")
    val dir = Paths.get(p)
    Files.createDirectories(dir)
    dir
  }

  /** Readable statements only — replaying DDL/DML would skip side effects.
    * Judged on the normalized text so a leading comment (query comments!)
    * doesn't hide the statement kind. */
  private[graft] def cacheable(stmt: String): Boolean = {
    val head = normalize(stmt).takeWhile(!_.isWhitespace)
    Set("select", "with", "show", "describe", "desc", "values")(head)
  }

  /** Literal-aware normalization: string literals are lifted out before
    * comment-stripping / volatile-name removal / lowercasing and restored
    * verbatim afterwards — `'a--x'` and `'a--y'` must NOT collide onto
    * one key, and literal content is part of the query's identity. */
  private[graft] def normalize(sql: String): String = {
    val literals = scala.collection.mutable.ArrayBuffer.empty[String]
    val skeleton = new StringBuilder
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"') {
        val q = c
        val lit = new StringBuilder
        lit += q; i += 1
        while (i < n && sql.charAt(i) != q) { lit += sql.charAt(i); i += 1 }
        if (i < n) { lit += q; i += 1 }
        skeleton ++= s" \u0001${literals.length}\u0001 "
        literals += lit.toString
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') i += 1
        skeleton += ' '
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < n && !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
        i = math.min(i + 2, n)
        skeleton += ' '
      } else { skeleton += c; i += 1 }
    }
    val cleaned = skeleton.toString
      .replaceAll("(?i)dbt_tmp_[0-9a-f]{8}_[0-9a-f]{4}_[0-9a-f]{4}_[0-9a-f]{4}_[0-9a-f]{12}", "dbt_tmp_")
      .replaceAll("__dbt_tmp[0-9a-f_]*", "__dbt_tmp")
      .replaceAll("___\\d+___", "")
      .replaceAll("\\s+", " ")
      // regex trim, NOT String.trim: trim would strip a trailing \u0001
      // placeholder sentinel (≤ 0x20) and orphan a query-final literal
      .replaceAll("^ | $", "")
      .toLowerCase
    literals.zipWithIndex.foldLeft(cleaned) { case (s, (l, idx)) =>
      s.replace(s"\u0001$idx\u0001", l)
    }
  }

  private[graft] def key(sql: String): String = Json.md5(normalize(sql))

  private def entryFile(spark: SparkSession, sql: String): Path =
    rootDir(spark).resolve(key(sql) + ".json")

  /** Record an executed read-query result. */
  def record(spark: SparkSession, sql: String, t: AgateTable): Unit =
    if (cacheable(sql)) Files.writeString(entryFile(spark, sql), Json.write(Map(
      "sql" -> sql,
      "columns" -> t.columnNames,
      "types" -> t.columnTypes,
      "rows" -> t.rows.map(_.map(cellOut)))))

  /** Replay-mode lookup; None on miss (caller executes live and warns). */
  def lookup(spark: SparkSession, sql: String): Option[AgateTable] = {
    if (!cacheable(sql)) return None
    val f = entryFile(spark, sql)
    if (!Files.exists(f)) return None
    val m = Json.parse(Files.readString(f)).asInstanceOf[Map[String, Any]]
    val types = m("types").asInstanceOf[Seq[Any]].map(_.toString).toVector
    Some(AgateTable(
      m("columns").asInstanceOf[Seq[Any]].map(_.toString).toVector,
      types,
      m("rows").asInstanceOf[Seq[Any]].map(r =>
        r.asInstanceOf[Seq[Any]].zip(types).map { case (v, t) =>
          cellIn(v, t) }.toVector).toVector))
  }

  /** JSON-safe cell encoding: non-JSON-native JVM types become tagged
    * strings so the round trip restores the exact type AgateTable carried;
    * real strings that happen to start with a tag are escaped. */
  private def cellOut(v: Any): Any = v match {
    case t: java.sql.Timestamp => s"__ts__$t"
    case d: java.sql.Date => s"__date__$d"
    case b: Array[Byte] => s"__hex__${b.map("%02x".format(_)).mkString}"
    case d: java.math.BigDecimal => s"__dec__${d.toPlainString}"
    case d: BigDecimal => s"__dec__${d.bigDecimal.toPlainString}"
    case f: Float => s"__flt__$f"
    case d: Double if d.isNaN || d.isInfinite => s"__dbl__$d"
    case s: String if s.startsWith("__") => s"__str__$s"
    case other => other
  }

  private def cellIn(v: Any, sqlType: String): Any = v match {
    case null => null
    case s: String if s.startsWith("__str__") => s.stripPrefix("__str__")
    case s: String if s.startsWith("__ts__") =>
      java.sql.Timestamp.valueOf(s.stripPrefix("__ts__"))
    case s: String if s.startsWith("__date__") =>
      java.sql.Date.valueOf(s.stripPrefix("__date__"))
    case s: String if s.startsWith("__hex__") =>
      s.stripPrefix("__hex__").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    case s: String if s.startsWith("__dec__") =>
      new java.math.BigDecimal(s.stripPrefix("__dec__"))
    case s: String if s.startsWith("__flt__") => s.stripPrefix("__flt__").toFloat
    case s: String if s.startsWith("__dbl__") => s.stripPrefix("__dbl__").toDouble
    case d: Double if sqlType.toLowerCase.matches("bigint|int|smallint|tinyint") =>
      d.toLong // JSON numbers parse as Double; restore integral types
    case l: Long if sqlType.toLowerCase == "double" => l.toDouble
    case other => other
  }
}
