package graft.funcs

import graft.ops.TextAnalysis

/** Engine-shipped macro assets — the reference ships its built-in macro
  * library the same way (`crates/dbt-loader/src/dbt_macro_assets/`,
  * loaded before any project macro): model SQL can call these without
  * the project defining anything, and a Root/Imported macro of the same
  * name overrides them (Core has lowest locality precedence).
  *
  * Each macro expands to pure Spark SQL TEXT over the argument
  * expression — no UDFs, fully codegen'd — giving model authors the
  * text-op surface (token counting, PII masking, language ID) inside
  * plain `SELECT` statements, the SQL-first twin of the `pipeline`
  * materialization's step configs. The SQL mirrors the semantics the
  * operator oracles already pin (TextAnalysis.tokenCount / maskPii /
  * languageId).
  */
object BuiltinMacros {

  /** Escape a regex for embedding in a Spark SQL string literal (the
    * default parser processes backslash escapes inside '…'). */
  private def sqlQuote(s: String): String =
    s.replace("\\", "\\\\").replace("'", "''")

  /** The languageId argmax as one SQL expression: marker-hit counts per
    * language, greatest() max, first language (code order) at the max;
    * zero hits → 'und' — the exact q_text_langid oracle semantics. */
  private val langCase: String = {
    val langs = TextAnalysis.markers.toSeq.sortBy(_._1)
    val hs = langs.map { case (l, ws) =>
      val set = ws.map(w => s"'$w'").mkString(", ")
      l -> s"size(filter(split(lower({{ col }}), ' '), __t -> __t IN ($set)))"
    }
    val maxE = hs.map(_._2).mkString("greatest(", ", ", ")")
    val whens = hs.map { case (l, h) => s"WHEN $h = $maxE THEN '$l'" }
      .mkString(" ")
    s"(CASE WHEN $maxE = 0 THEN 'und' $whens END)"
  }

  /** stopword share of whitespace tokens (English stoplist — the
    * quality-feature convention): 0 for empty text. */
  private val stopRatio: String = {
    val set = TextAnalysis.markers("en").map(w => s"'$w'").mkString(", ")
    val toks = "(CASE WHEN length(trim({{ col }})) = 0 THEN 0 ELSE " +
      "size(split(trim({{ col }}), ' +')) END)"
    s"(CASE WHEN $toks = 0 THEN 0.0 ELSE " +
      s"size(filter(split(lower({{ col }}), ' '), __t -> __t IN ($set)))" +
      s" / CAST($toks AS DOUBLE) END)"
  }

  /** Builtin generic data tests (schema.yml `tests:` entries, no
    * project macro needed — the audit-op math as failing-rows
    * queries). A project may override by defining the same
    * `test_<name>` macro. */
  val testNames: Seq[String] = Seq("benford_plausible", "k_anonymous")

  private val testMacros: Seq[(String, String)] = Seq(
    // digits whose observed share deviates from Benford's
    // log10(1+1/d) by more than `tolerance` — integer-cents leading
    // digit, the Audit.benford contract as a failing-rows query
    "(relation, string, optional[float]) -> relation" ->
    """{% macro test_benford_plausible(model, column_name, tolerance=0.05) %}
      |WITH cents AS (
      |  SELECT CAST(round(CAST({{ column_name }} AS DOUBLE) * 100)
      |    AS BIGINT) AS c
      |  FROM {{ model }} WHERE {{ column_name }} IS NOT NULL),
      |d AS (
      |  SELECT CAST(substring(CAST(c AS STRING), 1, 1) AS INT) AS digit
      |  FROM cents WHERE c > 0),
      |cnt AS (SELECT digit, count(*) AS n FROM d GROUP BY digit)
      |SELECT digit, n FROM (
      |  SELECT digit, n,
      |    n / CAST(sum(n) OVER () AS DOUBLE) AS share,
      |    log10(1.0 + 1.0 / digit) AS expected
      |  FROM cnt) t
      |WHERE abs(share - expected) > {{ tolerance }}
      |{% endmacro %}""".stripMargin,
    // quasi-identifier values shared by fewer than k rows — the
    // Audit.kAnonymity violation set as a failing-rows query
    "(relation, string, optional[int]) -> relation" ->
    """{% macro test_k_anonymous(model, column_name, k=5) %}
      |SELECT {{ column_name }} AS value, count(*) AS n
      |FROM {{ model }}
      |GROUP BY {{ column_name }}
      |HAVING count(*) < {{ k }}
      |{% endmacro %}""".stripMargin)

  /** (funcsign signature, macro source) pairs — the signature rides
    * next to its macro so the analyzer surface cannot drift from the
    * shipped text. Args take SQL text (column expressions) as strings. */
  private val entries: Seq[(String, String)] = Seq(
    "(string) -> int" ->
      ("{% macro graft_token_count(col) %}(CASE WHEN length(trim({{ col }}))" +
        " = 0 THEN 0 ELSE size(split(trim({{ col }}), ' +')) END)" +
        "{% endmacro %}"),
    "(string) -> string" ->
      (s"{% macro graft_mask_pii(col) %}regexp_replace(regexp_replace(" +
        s"{{ col }}, '${sqlQuote(TextAnalysis.EmailPattern)}', '<EMAIL>')," +
        s" '${sqlQuote(TextAnalysis.PhonePattern)}', '<PHONE>')" +
        "{% endmacro %}"),
    "(string) -> string" ->
      s"{% macro graft_lang_id(col) %}$langCase{% endmacro %}",
    "(string) -> float" ->
      s"{% macro graft_stopword_ratio(col) %}$stopRatio{% endmacro %}"
  ) ++ testMacros

  /** Rendered FIRST in the macro prelude so any project/package macro of
    * the same name wins (Root > Imported > Core). */
  val prelude: String = entries.map(_._2).mkString("\n")

  /** The same macros WITH their `-- funcsign:` annotations, fed ONLY to
    * the static type-checker (ProjectLoader) — user projects get
    * call-site diagnostics on the builtin surface for free, while the
    * RENDERED prelude stays annotation-free (comment lines there would
    * land as text in every compiled statement). */
  val funcsignSource: String = entries
    .map { case (sig, src) => s"-- funcsign: $sig\n$src" }.mkString("\n")
}
