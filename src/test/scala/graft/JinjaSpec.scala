package graft

import graft.jinja.{DbtContext, Jinja}
import org.scalatest.funsuite.AnyFunSuite

class JinjaSpec extends AnyFunSuite {

  private def r(tpl: String, vars: Map[String, Any] = Map.empty): String =
    Jinja.render(tpl, vars)

  test("literal text passes through") {
    assert(r("select 1") == "select 1")
  }

  test("expression interpolation and arithmetic") {
    assert(r("{{ 1 + 2 * 3 }}") == "7")
    assert(r("{{ (1 + 2) * 3 }}") == "9")
    assert(r("{{ 7 // 2 }}") == "3")
    assert(r("{{ 'a' ~ 'b' ~ 1 }}") == "ab1")
    assert(r("{{ x }}", Map("x" -> "hi")) == "hi")
  }

  test("if/elif/else with comparisons and logic") {
    val t = "{% if n > 10 %}big{% elif n > 5 %}mid{% else %}small{% endif %}"
    assert(r(t, Map("n" -> 20L)) == "big")
    assert(r(t, Map("n" -> 7L)) == "mid")
    assert(r(t, Map("n" -> 1L)) == "small")
    assert(r("{% if a and not b %}y{% endif %}", Map("a" -> true, "b" -> false)) == "y")
  }

  test("for with loop variables and else") {
    assert(r("{% for x in xs %}{{ loop.index }}:{{ x }}{% if not loop.last %},{% endif %}{% endfor %}",
      Map("xs" -> Vector("a", "b", "c"))) == "1:a,2:b,3:c")
    assert(r("{% for x in xs %}{{ x }}{% else %}none{% endfor %}",
      Map("xs" -> Vector())) == "none")
  }

  test("set mutates enclosing scope") {
    assert(r("{% set x = 1 %}{% if true %}{% set x = 2 %}{% endif %}{{ x }}") == "2")
    assert(r("{% set parts %}a-b{% endset %}{{ parts }}") == "a-b")
  }

  test("macro definition and call with defaults and kwargs") {
    val t = "{% macro greet(name, punct='!') %}hi {{ name }}{{ punct }}{% endmacro %}" +
      "{{ greet('bob') }} {{ greet('eve', punct='?') }}"
    assert(r(t) == "hi bob! hi eve?")
  }

  test("filters") {
    assert(r("{{ 'AbC' | lower }}") == "abc")
    assert(r("{{ xs | join(', ') }}", Map("xs" -> Vector("a", "b"))) == "a, b")
    assert(r("{{ missing | default('dflt') }}") == "dflt")
    assert(r("{{ xs | length }}", Map("xs" -> Vector(1L, 2L, 3L))) == "3")
    assert(r("{{ xs | sort | first }}", Map("xs" -> Vector("b", "a"))) == "a")
    assert(r("{{ m | tojson }}", Map("m" -> Map("k" -> 1L))) == "{\"k\": 1}")
    assert(r("{{ xs | map(attribute='n') | join(',') }}",
      Map("xs" -> Vector(Map("n" -> "x"), Map("n" -> "y")))) == "x,y")
    assert(r("{{ xs | selectattr('ok', 'true') | length }}",
      Map("xs" -> Vector(Map("ok" -> true), Map("ok" -> false)))) == "1")
  }

  test("minijinja filter tail matches reference semantics") {
    // batch: fill_with pads only the last group (filters.rs:1126)
    assert(r("{{ xs | batch(3) | tojson }}", Map("xs" -> Vector(1L, 2L, 3L, 4L)))
      == "[[1, 2, 3], [4]]")
    assert(r("{{ xs | batch(3, 0) | tojson }}", Map("xs" -> Vector(1L, 2L, 3L, 4L)))
      == "[[1, 2, 3], [4, 0, 0]]")
    // slice: n columns, fill_with pads the short ones (filters.rs:1069)
    assert(r("{{ xs | slice(3, 0) | tojson }}", Map("xs" -> Vector(1L, 2L, 3L, 4L, 5L)))
      == "[[1, 2], [3, 4], [5, 0]]")
    // groupby sorts groups by key
    assert(r("{% for g in xs | groupby('k') %}{{ g[0] }}={{ g[1] | length }};{% endfor %}",
      Map("xs" -> Vector(Map("k" -> "b"), Map("k" -> "a"), Map("k" -> "b"))))
      == "a=1;b=2;")
    // format is printf-style
    assert(r("{{ 'Hello %s #%d' | format('World', 42) }}") == "Hello World #42")
    // urlencode: %20 for space (never +), / . - _ unescaped; maps → query
    assert(r("{{ 'a b/c.d-e_f&g' | urlencode }}") == "a%20b/c.d-e_f%26g")
    assert(r("{{ m | urlencode }}", Map("m" -> Map("k 1" -> "v&2", "skip" -> null)))
      == "k%201=v%262")
    // dictsort: case-insensitive by key; by='value'; reverse
    assert(r("{{ m | dictsort | tojson }}", Map("m" -> Map("b" -> 2L, "A" -> 1L)))
      == "[[\"A\", 1], [\"b\", 2]]")
    assert(r("{{ m | dictsort(by='value', reverse=true) | tojson }}",
      Map("m" -> Map("a" -> "x", "b" -> "w"))) == "[[\"a\", \"x\"], [\"b\", \"w\"]]")
    // numeric values sort numerically (10 after 2, not lexically before)
    assert(r("{{ m | dictsort(by='value') | tojson }}",
      Map("m" -> Map("a" -> 10L, "b" -> 2L)))
      == "[[\"b\", 2], [\"a\", 10]]")
    // Jinja signature dictsort(case_sensitive, by): positional 0 is
    // case_sensitive — uppercase sorts before lowercase when true
    assert(r("{{ m | dictsort(true) | tojson }}",
      Map("m" -> Map("b" -> 1L, "A" -> 2L, "a" -> 3L)))
      == "[[\"A\", 2], [\"a\", 3], [\"b\", 1]]")
    assert(r("{{ m | dictsort(false, 'value') | tojson }}",
      Map("m" -> Map("a" -> "B", "b" -> "a"))) == "[[\"b\", \"a\"], [\"a\", \"B\"]]")
    // mixed value types: numbers rank before strings (type-first ordering
    // keeps the comparator transitive — 2 < 10 < "10")
    assert(r("{{ m | dictsort(by='value') | tojson }}",
      Map("m" -> Map("a" -> 2L, "b" -> 10L, "c" -> "10")))
      == "[[\"a\", 2], [\"b\", 10], [\"c\", \"10\"]]")
    // lines / attr / bool / is_list / d alias / safe passthrough
    assert(r("{{ s | lines | length }}", Map("s" -> "a\nb\nc")) == "3")
    assert(r("{{ m | attr('x') }}", Map("m" -> Map("x" -> "ok"))) == "ok")
    assert(r("{{ 0 | bool }}|{{ 'x' | bool }}") == "False|True")
    assert(r("{{ xs | is_list }}|{{ 's' | is_list }}", Map("xs" -> Vector(1L))) == "True|False")
    assert(r("{{ missing | d('dflt') }}") == "dflt")
    assert(r("{{ '<b>' | safe }}") == "<b>")
  }

  test("minijinja test tail matches reference semantics") {
    assert(r("{% if 3 is integer %}i{% endif %}{% if 3.5 is float %}f{% endif %}") == "if")
    assert(r("{% if 'abc' is startingwith('ab') %}s{% endif %}" +
      "{% if 'abc' is endingwith('bc') %}e{% endif %}") == "se")
    assert(r("{% if 'abc' is lower %}l{% endif %}{% if 'ABC' is upper %}u{% endif %}") == "lu")
    assert(r("{% if 2 is le(3) %}le{% endif %}{% if 3 is ge(3) %}ge{% endif %}") == "lege")
    assert(r("{% if x is sameas(true) %}y{% endif %}", Map("x" -> true)) == "y")
    assert(r("{% if 'a' in 'cat' %}instr{% endif %}{% if 'k' in m %}inmap{% endif %}",
      Map("m" -> Map("k" -> 1L))) == "instrinmap")
  }

  test("break and continue loop controls") {
    assert(r("{% for x in xs %}{% if x == 3 %}{% break %}{% endif %}{{ x }}{% endfor %}",
      Map("xs" -> Vector(1L, 2L, 3L, 4L))) == "12")
    assert(r("{% for x in xs %}{% if x % 2 == 0 %}{% continue %}{% endif %}{{ x }}{% endfor %}",
      Map("xs" -> Vector(1L, 2L, 3L, 4L, 5L))) == "135")
    // break only exits the INNER loop
    assert(r("{% for i in ab %}{% for j in ab %}{% break %}x{% endfor %}{{ i }}{% endfor %}",
      Map("ab" -> Vector("a", "b"))) == "ab")
    // outside a loop it is an error, not a silent no-op
    assertThrows[Jinja.JinjaError](r("{% break %}"))
    // loop controls are bounded at the macro boundary: a {% break %} in a
    // macro body must error, not silently break the CALLER's for loop
    assertThrows[Jinja.JinjaError](r(
      "{% macro m() %}{% break %}{% endmacro %}" +
        "{% for i in ab %}{{ m() }}{{ i }}{% endfor %}",
      Map("ab" -> Vector("a", "b"))))
    // but a loop INSIDE the macro still handles its own controls
    assert(r("{% macro m() %}{% for j in ab %}{% break %}x{% endfor %}ok{% endmacro %}" +
      "{{ m() }}", Map("ab" -> Vector("a", "b"))) == "ok")
  }

  test("with and filter blocks") {
    // with: scoped bindings that don't leak
    assert(r("{% with a = 1, b = a + 1 %}{{ a }}-{{ b }}{% endwith %}") == "1-2")
    assert(r("{% set a = 9 %}{% with a = 1 %}{{ a }}{% endwith %}{{ a }}") == "19")
    assert(r("{% with x = 'q' %}{% endwith %}{% if x is undefined %}gone{% endif %}")
      == "gone")
    // filter block: body piped through the written chain
    assert(r("{% filter upper %}hello {{ w }}{% endfilter %}",
      Map("w" -> "world")) == "HELLO WORLD")
    assert(r("{% filter trim | replace('l', 'L') %}  hello  {% endfilter %}")
      == "heLLo")
    assert(r("{% filter indent(2) %}a\nb{% endfilter %}") == "a\n  b")
  }

  test("namespace() attribute writes survive loop and if scopes") {
    assert(r("{% set ns = namespace(total=0) %}{% for x in xs %}" +
      "{% set ns.total = ns.total + x %}{% endfor %}{{ ns.total }}",
      Map("xs" -> Vector(1L, 2L, 3L))) == "6")
    assert(r("{% set ns = namespace(found=false) %}{% for x in xs %}" +
      "{% if x == 2 %}{% set ns.found = true %}{% endif %}{% endfor %}{{ ns.found }}",
      Map("xs" -> Vector(1L, 2L, 3L))) == "True")
    // dict-argument + kwargs merge, and reading an unset attr is undefined
    assert(r("{% set ns = namespace({'a': 1}, b=2) %}{{ ns.a }}{{ ns.b }}") == "12")
    assert(r("{% set ns = namespace() %}{% if ns.x is undefined %}u{% endif %}") == "u")
  }

  test("tests and membership") {
    assert(r("{% if x is defined %}y{% else %}n{% endif %}", Map("x" -> 1L)) == "y")
    assert(r("{% if y is defined %}y{% else %}n{% endif %}") == "n")
    assert(r("{% if v is none %}null{% endif %}", Map("v" -> null)) == "null")
    assert(r("{% if 'a' in xs %}has{% endif %}", Map("xs" -> Vector("a"))) == "has")
    assert(r("{% if 3 not in xs %}no{% endif %}", Map("xs" -> Vector(1L))) == "no")
  }

  test("dict and list literals, indexing, inline if") {
    assert(r("{{ {'a': 1}['a'] }}") == "1")
    assert(r("{{ [10, 20][1] }}") == "20")
    assert(r("{{ [10, 20][-1] }}") == "20")
    assert(r("{{ 'yes' if 2 > 1 else 'no' }}") == "yes")
  }

  test("comments and whitespace control") {
    assert(r("a{# hidden #}b") == "ab")
    assert(r("a  {{- 'x' -}}  b") == "axb")
    assert(r("{% raw %}{{ not_evaluated }}{% endraw %}") == "{{ not_evaluated }}")
  }

  test("dbt parse context harvests refs, sources, configs") {
    val (bindings, harvest) = DbtContext.parseContext(Map("v1" -> 42L))
    val out = Jinja.render(
      "{{ config(materialized='incremental', unique_key='id') }}" +
        "select * from {{ ref('stg_orders') }} " +
        "join {{ source('tpch', 'nation') }} where x = {{ var('v1') }}",
      bindings)
    val h = harvest()
    assert(h.refs == Seq((None, "stg_orders", None)))
    assert(h.sources == Seq(("tpch", "nation")))
    assert(h.configs == Map("materialized" -> "incremental", "unique_key" -> "id"))
    assert(out.contains("__ref__stg_orders__"))
    assert(out.contains("where x = 42"))
  }

  test("is_incremental guard renders both branches correctly") {
    val t = "select * from t{% if is_incremental() %} where ts > (select max(ts) from {{ this }}){% endif %}"
    val (parseB, _) = DbtContext.parseContext()
    assert(Jinja.render(t, parseB) == "select * from t")
  }

  test("string methods") {
    assert(r("{{ 'a b'.replace(' ', '_') }}") == "a_b")
    assert(r("{{ s.upper() }}", Map("s" -> "x")) == "X")
    assert(r("{{ ', '.join(xs) }}", Map("xs" -> Vector("a", "b"))) == "a, b")
  }

  test("call blocks pass caller() into the callee") {
    // callee reads the rendered block body through caller()
    val capture = Jinja.JFunc { (a, kw) =>
      val body = kw("caller").asInstanceOf[Jinja.JFunc](Nil, Map.empty)
      s"<${a.head}:${body.toString.trim}>"
    }
    val out = r("{% call wrap('x') %} body {{ 1 + 1 }} {% endcall %}",
      Map("wrap" -> capture))
    assert(out == "<x:body 2>")
    // a macro invoked via {% call %} can itself invoke caller()
    val out2 = r(
      "{% macro box(tag) %}[{{ tag }}|{{ caller() }}]{% endmacro %}" +
        "{% call box('b') %}inner{% endcall %}")
    assert(out2 == "[b|inner]")
  }

  test("return() short-circuits a macro with a non-string value") {
    val ret = Jinja.JFunc((a, _) => throw Jinja.ReturnValue(a.headOption.orNull))
    val out = r(
      "{% macro pick() %}{{ return([1, 2]) }}ignored{% endmacro %}" +
        "{{ pick()[1] }}", Map("return" -> ret))
    assert(out == "2")
  }

  test("adapter.dispatch resolves spark__ before default__ at call time") {
    val (bindings, _) = DbtContext.parseContext()
    val src =
      "{% macro default__greet(n) %}default-{{ n }}{% endmacro %}" +
        "{% macro spark__greet(n) %}spark-{{ n }}{% endmacro %}" +
        "{{ adapter.dispatch('greet')('x') }}"
    assert(Jinja.render(src, bindings) == "spark-x")
    // default__ only → falls through the chain
    val src2 = "{% macro default__bye(n) %}bye-{{ n }}{% endmacro %}" +
      "{{ adapter.dispatch('bye')('y') }}"
    assert(Jinja.render(src2, bindings) == "bye-y")
  }

  test("list literals are reference-mutable (python semantics)") {
    // the canonical dbt accumulator: set [] + do append inside a loop
    assert(r("{% set xs = [] %}{% for i in [1, 2, 3] %}" +
      "{% do xs.append(i * 10) %}{% endfor %}{{ xs | join(',') }}")
      == "10,20,30")
    // mutation crosses scope boundaries like a python reference would
    assert(r("{% set xs = ['a'] %}{% if true %}{% do xs.extend(['b', 'c']) %}" +
      "{% endif %}{{ xs | join('') }}") == "abc")
    assert(r("{% set xs = [1, 2, 3] %}{{ xs.pop() }}{{ xs | join(',') }}")
      == "31,2")
    assert(r("{% set xs = [1, 2] %}{% do xs.insert(0, 9) %}{{ xs | join(',') }}")
      == "9,1,2")
    assert(r("{% set xs = [1, 2, 1] %}{% do xs.remove(1) %}{{ xs | join(',') }}")
      == "2,1")
  }

  test("dict literals are reference-mutable; macros bind varargs/kwargs") {
    assert(r("{% set d = {'a': 1} %}{% do d.update({'b': 2}) %}" +
      "{{ d.keys() | join('') }}{{ d['b'] }}") == "ab2")
    assert(r("{% set d = {'a': 1, 'b': 2} %}{{ d.pop('a') }}" +
      "{{ d.keys() | join('') }}{{ d.pop('zz', 7) }}") == "1b7")
    assert(r("{% set d = {} %}{% do d.setdefault('k', 5) %}" +
      "{% do d.setdefault('k', 9) %}{{ d['k'] }}") == "5")
    // jinja2 macro specials: extra positionals → varargs, undeclared
    // keywords → kwargs
    assert(r("{% macro m(a) %}{{ a }}|{{ varargs | join(',') }}|" +
      "{% for k, v in kwargs.items() %}{{ k }}={{ v }} {% endfor %}" +
      "{% endmacro %}{{ m(1, 2, 3, x=4, y=5) }}").trim
      == "1|2,3|x=4 y=5")
  }

  test("modules.datetime: strptime/strftime, fields, timedelta arithmetic") {
    val (b, _) = DbtContext.parseContext()
    def m(tpl: String): String = Jinja.render(tpl, b)
    assert(m("{{ modules.datetime.datetime.strptime('2026-08-15', '%Y-%m-%d')" +
      ".strftime('%j') }}") == "227")
    assert(m("{{ modules.datetime.datetime(2026, 8, 15, 13, 5).isoformat() }}")
      == "2026-08-15T13:05:00")
    assert(m("{{ modules.datetime.date(2026, 2, 28) }}") == "2026-02-28")
    val d = "{% set d = modules.datetime.datetime.strptime(" +
      "'2026-08-15 13:45:09', '%Y-%m-%d %H:%M:%S') %}"
    assert(m(s"$d{{ d.year }}-{{ d.month }}-{{ d.day }} {{ d.hour }}:{{ d.minute }}")
      == "2026-8-15 13:45")
    assert(m(s"$d{{ d.weekday() }}") == "5") // 2026-08-15 is a Saturday
    // timedelta arithmetic crosses the month boundary like python's
    assert(m(s"$d{{ (d - modules.datetime.timedelta(days=20)).strftime('%Y-%m-%d') }}")
      == "2026-07-26")
    assert(m(s"$d{{ (d + modules.datetime.timedelta(hours=11)).strftime('%d %H') }}")
      == "16 00")
    // datetime - datetime = timedelta with python field semantics
    assert(m("{% set a = modules.datetime.datetime(2026, 1, 3) %}" +
      "{% set b = modules.datetime.datetime(2026, 1, 1, 12) %}" +
      "{{ (a - b).days }},{{ (a - b).seconds }},{{ (a - b).total_seconds() }}")
      == "1,43200,129600.0")
    // str() shapes match python
    assert(m("{{ modules.datetime.timedelta(days=3) }}") == "3 days, 0:00:00")
    assert(m("{{ modules.datetime.timedelta(hours=1, minutes=2, seconds=3) }}")
      == "1:02:03")
    // comparisons work through the interpreter
    assert(m("{% if modules.datetime.date(2026, 1, 2) > " +
      "modules.datetime.date(2026, 1, 1) %}later{% endif %}") == "later")
    // replace + pytz tag accepted on a naive engine
    assert(m("{{ modules.datetime.datetime(2026, 3, 1).replace(year=2020)" +
      ".strftime('%Y-%m') }}") == "2020-03")
    assert(m("{{ modules.pytz.timezone('UTC').zone }}") == "UTC")
    // run_started_at is a real datetime value (load/init.rs:37-51)
    val (pinned, _) = DbtContext.parseContext(
      flags = Map("run_started_at_ms" -> 1747230123000L)) // 2025-05-14 UTC
    assert(Jinja.render("{{ run_started_at.strftime('%Y-%m-%d') }}", pinned)
      == "2025-05-14")
    // %V/%u/%G are ISO fields, not US-locale week fields — python
    // oracle: 2027-01-01 (Friday) is ISO week 53 of week-based-year
    // 2026; a 'YYYY-ww-e' Locale.US pattern would render 2027-W01-6
    assert(m("{{ modules.datetime.datetime(2027, 1, 1).strftime('%G-W%V-%u') }}")
      == "2026-W53-5")
    assert(m("{{ modules.datetime.datetime(2024, 12, 30).strftime('%G-W%V-%u') }}")
      == "2025-W01-1")
    assert(m("{{ modules.datetime.datetime(2026, 1, 1).strftime('%G-W%V-%u') }}")
      == "2026-W01-4")
  }

  test("modules.re: match/search/sub/findall/split/escape/compile") {
    val (b, _) = DbtContext.parseContext()
    def m(tpl: String): String = Jinja.render(tpl, b)
    assert(m("{% if modules.re.match('stg_', 'stg_orders') %}y{% endif %}") == "y")
    assert(m("{% if modules.re.match('stg_', 'fct_orders') %}y{% else %}n{% endif %}")
      == "n")
    // match anchors at the start; search scans
    assert(m("{% if modules.re.search('_v(\\d+)$', 'orders_v2') %}y{% endif %}")
      == "y")
    assert(m("{{ modules.re.search('_v(\\d+)$', 'orders_v2').group(1) }}") == "2")
    assert(m("{{ modules.re.sub('[^a-z0-9_]+', '_', 'My Model (v2)') }}")
      == "_y_odel_v2_")
    assert(m("{{ modules.re.findall('\\d+', 'a1b22c333') | join(',') }}")
      == "1,22,333")
    assert(m("{{ modules.re.split(',\\s*', 'a, b,c') | join('|') }}") == "a|b|c")
    assert(m("{{ modules.re.escape('a.b*c') }}") == "a\\.b\\*c")
    // named groups translate from python (?P<x>) syntax
    assert(m("{{ modules.re.match('(?P<kind>[a-z]+)_(?P<rest>.*)', 'stg_orders')" +
      ".group('kind') }}") == "stg")
    // compiled patterns carry the same methods; flags respected
    assert(m("{% set p = modules.re.compile('^ab', modules.re.I) %}" +
      "{% if p.match('ABc') %}y{% endif %}") == "y")
    // python arg positions: sub's 4th arg is COUNT, split's 3rd MAXSPLIT
    assert(m("{{ modules.re.sub('a', 'X', 'aaaa', 2) }}") == "XXaa")
    assert(m("{{ modules.re.split(',', 'a,b,c,d', 2) | join('|') }}")
      == "a|b|c,d")
    // %z renders empty on naive datetimes (python semantics); strptime
    // without a year defaults to 1900
    assert(m("{{ modules.datetime.datetime(2026, 1, 2).strftime('%Y%z') }}")
      == "2026")
    assert(m("{{ modules.datetime.datetime.strptime('03-14', '%m-%d')" +
      ".strftime('%Y-%m-%d') }}") == "1900-03-14")
  }
}
