package graft.jinja

import scala.util.Try

/** `-- funcsign:` static macro type-checking (reference:
  * dbt-parser/src/utils.rs:501-516 extracts the comment preceding each
  * `{% macro %}` block; dbt-jinja/minijinja/src/types/funcsign_parser.rs
  * parses the signature grammar; the type system then diagnoses calls).
  *
  * A macro file may annotate a macro with a signature comment on the
  * line(s) before its declaration:
  *
  * {{{
  * -- funcsign: (string, optional[list[string]]) -> string
  * {% macro my_macro(field, tags=none) %}...{% endmacro %}
  * }}}
  *
  * Grammar (the reference's vocabulary): primitives `string`,
  * `int`/`integer`, `float`, `bool`, `none`, `any`/`ANY`; opaque named
  * types (`relation`, `model`, `config`, `agate_table`, `api.column`,
  * ...); generics `list[T]`, `dict[K, V]`, `optional[T]`,
  * `tuple[T, ...]`; `struct{name: T, ...}`; unions `T | U`.
  *
  * The checker is deliberately STATIC-LITERAL scoped — the subset that
  * needs no inference engine and still catches the real editing
  * mistakes:
  *   - a signature that does not parse;
  *   - signature arity ≠ the macro's declared parameter count;
  *   - call sites (in macros, models, snapshots, tests): too many
  *     positional args, unknown keyword args, a parameter bound twice,
  *     a required parameter never bound, and literal arguments whose
  *     type contradicts the declared one (`my_macro(42)` against
  *     `(string) -> string`).
  * Non-literal arguments type as `any` and pass — exactly the boundary
  * where the reference hands over to its inference engine. */
object FuncSign {

  sealed trait T
  case object TAny extends T
  case object TStr extends T
  case object TInt extends T
  case object TFloat extends T
  case object TBool extends T
  case object TNone extends T
  final case class TNamed(name: String) extends T
  final case class TList(elem: T) extends T
  final case class TDict(k: T, v: T) extends T
  final case class TOptional(t: T) extends T
  final case class TUnion(ts: Seq[T]) extends T
  final case class TTuple(ts: Seq[T]) extends T
  final case class TStruct(fields: Seq[(String, T)]) extends T

  final case class Sig(args: Seq[T], ret: T)

  /** One macro's static surface: its signature and declared params
    * (name, hasDefault) in order. */
  final case class MacroSig(name: String, sig: Sig,
      params: Seq[(String, Boolean)])

  // ---- signature parser -------------------------------------------------

  private final class P(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def eof: Boolean = { ws(); i >= s.length }
    def peek: Char = { ws(); if (i < s.length) s(i) else '\u0000' }
    def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s(i) != c)
        fail(s"expected '$c'" +
          (if (i < s.length) s", got '${s(i)}'" else " at end of input"))
      i += 1
    }
    def tryConsume(c: Char): Boolean = {
      ws(); if (i < s.length && s(i) == c) { i += 1; true } else false }
    def tryConsumeArrow(): Boolean = {
      ws()
      if (i + 1 < s.length && s(i) == '-' && s(i + 1) == '>') {
        i += 2; true
      } else false
    }
    def ident(): String = {
      ws()
      val start = i
      while (i < s.length &&
        (s(i).isLetterOrDigit || s(i) == '_' || s(i) == '.')) i += 1
      if (i == start) fail("expected a type name")
      s.substring(start, i)
    }
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"$msg at offset $i in signature `$s`")
  }

  /** Parse `(T, ...) -> T`. Left is the error message. */
  def parseSig(text: String): Either[String, Sig] = Try {
    val p = new P(text)
    p.expect('(')
    val args = scala.collection.mutable.ArrayBuffer.empty[T]
    if (!p.tryConsume(')')) {
      args += parseType(p)
      while (p.tryConsume(',')) args += parseType(p)
      p.expect(')')
    }
    if (!p.tryConsumeArrow()) p.fail("expected '->'")
    val ret = parseType(p)
    if (!p.eof) p.fail("trailing input")
    Sig(args.toSeq, ret)
  }.toEither.left.map(_.getMessage)

  private def parseType(p: P): T = {
    val first = parseNonUnion(p)
    if (p.peek != '|') first
    else {
      val ts = scala.collection.mutable.ArrayBuffer[T](first)
      while (p.tryConsume('|')) ts += parseNonUnion(p)
      TUnion(ts.toSeq)
    }
  }

  private def parseNonUnion(p: P): T = {
    val name = p.ident()
    name.toLowerCase match {
      case "list" =>
        if (p.tryConsume('[')) {
          val e = parseType(p); p.expect(']'); TList(e)
        } else TList(TAny)
      case "dict" =>
        if (p.tryConsume('[')) {
          val k = parseType(p); p.expect(','); val v = parseType(p)
          p.expect(']'); TDict(k, v)
        } else TDict(TAny, TAny)
      case "optional" =>
        p.expect('['); val e = parseType(p); p.expect(']'); TOptional(e)
      case "tuple" =>
        if (p.tryConsume('[')) {
          val ts = scala.collection.mutable.ArrayBuffer[T](parseType(p))
          while (p.tryConsume(',')) ts += parseType(p)
          p.expect(']'); TTuple(ts.toSeq)
        } else TTuple(Seq(TAny))
      case "struct" =>
        p.expect('{')
        val fields =
          scala.collection.mutable.ArrayBuffer.empty[(String, T)]
        if (!p.tryConsume('}')) {
          def field(): Unit = {
            val n = p.ident(); p.expect(':'); fields += (n -> parseType(p))
          }
          field()
          while (p.tryConsume(',')) field()
          p.expect('}')
        }
        TStruct(fields.toSeq)
      case "string" | "str" => TStr
      case "int" | "integer" => TInt
      case "float" | "number" => TFloat
      case "bool" | "boolean" => TBool
      case "none" | "null" => TNone
      case "any" => TAny
      case _ => TNamed(name)
    }
  }

  // ---- extraction -------------------------------------------------------

  private val signRe =
    raw"(?m)^[ \t]*--[ \t]*funcsign:[ \t]*(.+?)[ \t]*$$".r
  private val macroRe =
    raw"\{%-?\s*macro\s+([A-Za-z_][A-Za-z0-9_]*)\s*\(".r

  /** Only whitespace, `--` comment lines, and `{# #}` comments may sit
    * between an annotation and the macro it binds to — a stray
    * annotation (its macro deleted or commented out) must NOT attach to
    * some unrelated later declaration and fail ITS arity check. Another
    * `-- funcsign:` line is NOT a permissible gap: of two stacked
    * annotations only the nearest binds, and the earlier one is
    * diagnosed as an orphan instead of being arity-checked against a
    * macro it does not describe. */
  private val gapRe =
    raw"(?s)(\s|--(?![ \t]*funcsign:)[^\n]*(\n|$$)|\{#.*?#\})*".r

  /** Extract (macro name → signature) pairs plus diagnostics from one
    * macro source. A funcsign comment binds to the IMMEDIATELY
    * following `{% macro %}` header (only whitespace/comments between);
    * a comment with no adjacent macro, or an unparsable signature, is a
    * diagnostic. Params come from the parsed template's TMacroDef nodes
    * (same parse the runtime uses). */
  def extract(src: String, where: String)
      : (Seq[MacroSig], Seq[String]) = {
    val diags = scala.collection.mutable.ArrayBuffer.empty[String]
    val signs = signRe.findAllMatchIn(src).map(m => (m.end, m.group(1)))
      .toSeq
    if (signs.isEmpty) return (Nil, Nil)
    val macros = macroRe.findAllMatchIn(src).map(m => (m.start, m.group(1)))
      .toSeq
    val params: Map[String, Seq[(String, Boolean)]] =
      Try(Jinja.parse(src)).toOption.toSeq
        .flatMap(collectMacroDefs)
        .map(d => d.name -> d.params.map { case (n, dflt) =>
          (n, dflt.isDefined) })
        .toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[MacroSig]
    signs.foreach { case (pos, text) =>
      macros.find { case (mpos, _) =>
        mpos >= pos && gapRe.pattern.matcher(src.substring(pos, mpos))
          .matches()
      } match {
        case None =>
          diags += s"$where: `-- funcsign:` comment with no " +
            s"immediately-following {% macro %} declaration"
        case Some((_, name)) => parseSig(text) match {
          case Left(err) => diags += s"$where: macro `$name`: $err"
          case Right(sig) =>
            val ps = params.getOrElse(name, Nil)
            if (params.contains(name) && sig.args.length != ps.length)
              diags += s"$where: macro `$name` declares ${ps.length} " +
                s"parameter(s) but its funcsign has ${sig.args.length} " +
                s"argument type(s)"
            else out += MacroSig(name, sig, ps)
        }
      }
    }
    (out.toSeq, diags.toSeq)
  }

  private def collectMacroDefs(tpls: Seq[Jinja.Tpl]): Seq[Jinja.TMacroDef] =
    tpls.flatMap {
      case d: Jinja.TMacroDef => d +: collectMacroDefs(d.body)
      case t => childTpls(t).flatMap(ts => collectMacroDefs(ts))
    }

  private def childTpls(t: Jinja.Tpl): Seq[Seq[Jinja.Tpl]] = t match {
    case Jinja.TIf(branches, els) => branches.map(_._2) :+ els
    case Jinja.TFor(_, _, body, els) => Seq(body, els)
    case Jinja.TSetBlock(_, body) => Seq(body)
    case Jinja.TMacroDef(_, _, body) => Seq(body)
    case Jinja.TCallBlock(_, body) => Seq(body)
    case Jinja.TWith(_, body) => Seq(body)
    case Jinja.TFilterBlock(_, body) => Seq(body)
    case _ => Nil
  }

  // ---- call-site checking ----------------------------------------------

  /** Check every call site in `src` against the known signatures.
    * Sources that do not parse are skipped (they fail loudly
    * elsewhere). */
  def checkCalls(src: String, where: String,
      sigs: Map[String, MacroSig]): Seq[String] =
    Try(Jinja.parse(src)).toOption.toSeq.flatMap(tpls =>
      tpls.flatMap(allExprs).flatMap(checkExpr(_, where, sigs)))

  private def allExprs(t: Jinja.Tpl): Seq[Jinja.Expr] = {
    val own: Seq[Jinja.Expr] = t match {
      case Jinja.TExpr(e) => Seq(e)
      case Jinja.TIf(branches, _) => branches.map(_._1)
      case Jinja.TFor(_, iter, _, _) => Seq(iter)
      case Jinja.TSet(_, v) => Seq(v)
      case Jinja.TDo(e) => Seq(e)
      case Jinja.TCallBlock(call, _) => Seq(call)
      case Jinja.TWith(assigns, _) => assigns.map(_._2)
      case Jinja.TFilterBlock(chain, _) => Seq(chain)
      case Jinja.TMacroDef(_, params, _) => params.flatMap(_._2)
      case _ => Nil
    }
    own ++ childTpls(t).flatten.flatMap(allExprs)
  }

  private def subExprs(e: Jinja.Expr): Seq[Jinja.Expr] = e match {
    case Jinja.EAttr(o, _) => Seq(o)
    case Jinja.EIndex(o, idx) => Seq(o, idx)
    case Jinja.ECall(fn, args, kwargs) => fn +: (args ++ kwargs.map(_._2))
    case Jinja.EFilter(x, _, args, kwargs) =>
      x +: (args ++ kwargs.map(_._2))
    case Jinja.ETest(x, _, args, _) => x +: args
    case Jinja.EBin(_, l, r) => Seq(l, r)
    case Jinja.EUnary(_, x) => Seq(x)
    case Jinja.ECond(c, tb, fb) => Seq(c, tb, fb)
    case Jinja.EList(items) => items
    case Jinja.EDict(pairs) => pairs.flatMap(p => Seq(p._1, p._2))
    case _ => Nil
  }

  private def checkExpr(e: Jinja.Expr, where: String,
      sigs: Map[String, MacroSig]): Seq[String] = {
    val here = e match {
      case Jinja.ECall(Jinja.EVar(name), args, kwargs)
          if sigs.contains(name) =>
        checkCall(sigs(name), args, kwargs, where, sigs)
      case Jinja.ECall(fn @ Jinja.EAttr(recv, attr), args, kwargs) =>
        val table = dotted(fn).flatMap(knownObjects.get) match {
          case Some(m) => checkCall(m, args, kwargs, where, sigs) ++
            (if (m.name.endsWith(".strptime")) strptimeChecks(args, where)
             else Nil)
          case None => Nil
        }
        // strftime is a METHOD on datetime values (run_started_at,
        // modules.datetime results) — but only fire when the RECEIVER
        // is statically traceable to a datetime producer: a user macro
        // object exposing its own differently-shaped `strftime` must
        // not hard-fail under funcsign-severity: error / --warn-error
        // on a diagnostic about a method it doesn't have
        val fmt =
          if (attr == "strftime" && !isDatetimeRecv(recv)) Nil
          else if (attr == "strftime" && args.length == 1)
            args.headOption.flatMap(litStr)
              .flatMap(f => directiveDiag(f, where, "strftime")).toSeq
          else if (attr == "strftime" && kwargs.isEmpty)
            Seq(s"$where: `strftime` takes exactly 1 argument " +
              s"(the format string), got ${args.length}")
          else Nil
        table ++ fmt
      case _ => Nil
    }
    here ++ subExprs(e).flatMap(checkExpr(_, where, sigs))
  }

  /** Is this expression statically traceable to a datetime value?
    * Producers: `run_started_at` (the context's PyDateTime), any
    * `modules.datetime.*` call whose known signature returns
    * datetime/date (incl. `.strptime`, `.now()`, `.fromtimestamp()`),
    * `modules.datetime.datetime.min/max`, and datetime ± timedelta
    * arithmetic over those. Anything else — a user macro object with
    * its own `strftime`, a loop variable — is NOT diagnosed. */
  private def isDatetimeRecv(e: Jinja.Expr): Boolean = e match {
    case Jinja.EVar("run_started_at") => true
    case Jinja.ECall(fn, _, _) =>
      dotted(fn).exists(n => n.startsWith("modules.datetime.") &&
        knownObjects.get(n).exists(m => m.sig.ret match {
          case TNamed("datetime") | TNamed("date") => true
          case _ => false
        }))
    case Jinja.EAttr(_, "min" | "max") =>
      dotted(e).exists(_.startsWith("modules.datetime."))
    case Jinja.EBin("+" | "-", l, r) =>
      isDatetimeRecv(l) || isDatetimeRecv(r)
    case _ => false
  }

  /** Dotted name of an attribute chain rooted at a plain variable. */
  private def dotted(e: Jinja.Expr): Option[String] = e match {
    case Jinja.EVar(n) => Some(n)
    case Jinja.EAttr(o, a) => dotted(o).map(_ + "." + a)
    case _ => None
  }

  private def litStr(e: Jinja.Expr): Option[String] = e match {
    case Jinja.ELit(s: String) => Some(s)
    case _ => None
  }

  /** A literal strftime/strptime format must translate: an unsupported
    * %-directive silently produces a JinjaError at RENDER time deep in
    * some hook; surface it statically instead. */
  private def directiveDiag(fmt: String, where: String,
      what: String): Option[String] =
    Try(PyModules.buildFormatter(fmt)).failed.toOption.collect {
      case Jinja.JinjaError(msg) => s"$where: $what format '$fmt': $msg"
    }

  /** strptime(date_string, format) — the format is the SECOND argument
    * (python's classmethod order). A %-bearing first literal next to a
    * %-free second literal is the classic swapped-argument typo; a
    * literal format also gets its directives validated. */
  private def strptimeChecks(args: Seq[Jinja.Expr],
      where: String): Seq[String] = {
    val s0 = args.lift(0).flatMap(litStr)
    val s1 = args.lift(1).flatMap(litStr)
    val swapped = (s0, s1) match {
      case (Some(a), Some(b)) if a.contains('%') && !b.contains('%') =>
        Seq(s"$where: `strptime` arguments look swapped — the format " +
          "string (with % directives) is the SECOND argument: " +
          "strptime(date_string, format)")
      case _ => Nil
    }
    swapped ++ s1.flatMap(directiveDiag(_, where, "strptime")).toSeq
  }

  /** Known-object signatures for the python-stdlib-shaped `modules.*`
    * surface ([[PyModules]]) — exactly where template typos silently
    * produce wrong strings, so call sites get the same arity/keyword/
    * literal-type diagnostics as annotated macros. Names mirror the
    * python call shapes dbt macros actually write. */
  private val knownObjects: Map[String, MacroSig] = {
    def m(name: String, params: Seq[(String, Boolean)], args: Seq[T],
        ret: T): (String, MacroSig) =
      name -> MacroSig(name, Sig(args, ret), params)
    val intish = TUnion(Seq(TInt, TFloat))
    Map(
      m("modules.datetime.datetime",
        Seq("year" -> false, "month" -> false, "day" -> false,
          "hour" -> true, "minute" -> true, "second" -> true,
          "microsecond" -> true),
        Seq(TInt, TInt, TInt, TInt, TInt, TInt, TInt), TNamed("datetime")),
      m("modules.datetime.date",
        Seq("year" -> false, "month" -> false, "day" -> false),
        Seq(TInt, TInt, TInt), TNamed("date")),
      m("modules.datetime.timedelta",
        Seq("days" -> true, "seconds" -> true, "microseconds" -> true,
          "milliseconds" -> true, "minutes" -> true, "hours" -> true,
          "weeks" -> true),
        Seq.fill(7)(intish), TNamed("timedelta")),
      m("modules.datetime.datetime.strptime",
        Seq("date_string" -> false, "format" -> false),
        Seq(TStr, TStr), TNamed("datetime")),
      m("modules.datetime.datetime.now", Seq("tz" -> true), Seq(TAny),
        TNamed("datetime")),
      m("modules.datetime.datetime.fromtimestamp",
        Seq("timestamp" -> false), Seq(intish), TNamed("datetime")),
      m("modules.datetime.datetime.fromisoformat",
        Seq("date_string" -> false), Seq(TStr), TNamed("datetime")),
      m("modules.datetime.date.fromisoformat",
        Seq("date_string" -> false), Seq(TStr), TNamed("date")),
      m("modules.re.match",
        Seq("pattern" -> false, "string" -> false, "flags" -> true),
        Seq(TStr, TStr, TInt), TNamed("match")),
      m("modules.re.fullmatch",
        Seq("pattern" -> false, "string" -> false, "flags" -> true),
        Seq(TStr, TStr, TInt), TNamed("match")),
      m("modules.re.search",
        Seq("pattern" -> false, "string" -> false, "flags" -> true),
        Seq(TStr, TStr, TInt), TNamed("match")),
      m("modules.re.sub",
        Seq("pattern" -> false, "repl" -> false, "string" -> false,
          "count" -> true, "flags" -> true),
        Seq(TStr, TStr, TStr, TInt, TInt), TStr),
      m("modules.re.findall",
        Seq("pattern" -> false, "string" -> false, "flags" -> true),
        Seq(TStr, TStr, TInt), TList(TStr)),
      m("modules.re.split",
        Seq("pattern" -> false, "string" -> false, "maxsplit" -> true,
          "flags" -> true),
        Seq(TStr, TStr, TInt, TInt), TList(TStr)),
      m("modules.re.escape", Seq("string" -> false), Seq(TStr), TStr),
      m("modules.re.compile", Seq("pattern" -> false, "flags" -> true),
        Seq(TStr, TInt), TNamed("pattern")),
      m("modules.pytz.timezone", Seq("zone" -> false), Seq(TStr),
        TNamed("tzinfo")))
  }

  private def checkCall(m: MacroSig, args: Seq[Jinja.Expr],
      kwargs: Seq[(String, Jinja.Expr)], where: String,
      sigs: Map[String, MacroSig]): Seq[String] = {
    val diags = scala.collection.mutable.ArrayBuffer.empty[String]
    val nParams =
      if (m.params.nonEmpty) m.params.length else m.sig.args.length
    val paramNames = m.params.map(_._1)
    if (args.length > nParams)
      diags += s"$where: `${m.name}` takes $nParams argument(s) but " +
        s"${args.length} positional were passed"
    // name resolution for kwargs (only when params are known)
    val bound = scala.collection.mutable.Set.empty[Int]
    args.indices.filter(_ < nParams).foreach(bound += _)
    if (m.params.nonEmpty) kwargs.foreach { case (kw, _) =>
      paramNames.indexOf(kw) match {
        case -1 =>
          diags += s"$where: `${m.name}` has no parameter `$kw` " +
            s"(parameters: ${paramNames.mkString(", ")})"
        case idx if bound(idx) =>
          diags += s"$where: `${m.name}` parameter `$kw` bound twice " +
            "(positionally and by keyword)"
        case idx => bound += idx
      }
    }
    if (m.params.nonEmpty) m.params.zipWithIndex.foreach {
      case ((pname, hasDefault), idx) =>
        if (!hasDefault && !bound(idx))
          diags += s"$where: `${m.name}` missing required argument " +
            s"`$pname`"
    }
    // literal type checks, positional + keyword
    def checkLit(idx: Int, arg: Jinja.Expr): Unit =
      if (idx < m.sig.args.length) litType(arg, sigs).foreach { lt =>
        if (!compatible(lt, m.sig.args(idx)))
          diags += s"$where: `${m.name}` argument ${idx + 1} is " +
            s"${show(lt)} but the funcsign declares " +
            s"${show(m.sig.args(idx))}"
      }
    args.zipWithIndex.foreach { case (a, i) => checkLit(i, a) }
    if (m.params.nonEmpty) kwargs.foreach { case (kw, v) =>
      val idx = paramNames.indexOf(kw)
      if (idx >= 0) checkLit(idx, v)
    }
    diags.toSeq
  }

  /** The static type of an argument expression, if decidable without an
    * inference engine: literals, plus calls to OTHER annotated macros
    * whose funcsign declares a concrete return type — `outer(inner())`
    * checks when `inner`'s return is a primitive or a concrete
    * list/dict. Anything else (variables, attribute chains, opaque or
    * union returns) stays `any`. */
  private def litType(e: Jinja.Expr,
      sigs: Map[String, MacroSig]): Option[T] = e match {
    case Jinja.ELit(null) => Some(TNone)
    case Jinja.ELit(_: String) => Some(TStr)
    case Jinja.ELit(_: Boolean) => Some(TBool)
    case Jinja.ELit(_: Int) | Jinja.ELit(_: Long) => Some(TInt)
    case Jinja.ELit(_: Double) | Jinja.ELit(_: Float) => Some(TFloat)
    case Jinja.EList(items) =>
      val elems = items.flatMap(litType(_, sigs)).distinct
      Some(TList(elems match {
        case Seq(one) => one
        case _ => TAny
      }))
    case Jinja.EDict(_) => Some(TDict(TAny, TAny))
    case Jinja.ECall(Jinja.EVar(name), _, _) if sigs.contains(name) =>
      concreteRet(sigs(name).sig.ret)
    case _ => None
  }

  /** A declared return type usable as a static argument type: concrete
    * primitives and concretely-parameterized containers only — opaque
    * named types, any, optional, and unions propagate nothing (they are
    * the inference boundary, same as a non-literal argument). */
  private def concreteRet(t: T): Option[T] = t match {
    case TStr | TInt | TFloat | TBool | TNone => Some(t)
    case TList(e) => concreteRet(e).map(TList)
    case TDict(k, v) =>
      for (ck <- concreteRet(k); cv <- concreteRet(v)) yield TDict(ck, cv)
    case _ => None
  }

  /** Is a literal of type `lt` acceptable where the signature declares
    * `declared`? Opaque named types and ANY accept everything literal
    * (the inference boundary). */
  private def compatible(lt: T, declared: T): Boolean = declared match {
    case TAny | TNamed(_) | TStruct(_) | TTuple(_) => true
    case TOptional(u) => lt == TNone || compatible(lt, u)
    case TUnion(ts) => ts.exists(compatible(lt, _))
    case TStr => lt == TStr
    case TBool => lt == TBool
    case TInt => lt == TInt
    case TFloat => lt == TFloat || lt == TInt
    case TNone => lt == TNone
    case TList(de) => lt match {
      case TList(le) => le == TAny || de == TAny || compatible(le, de)
      case _ => false
    }
    case TDict(_, _) => lt match {
      case TDict(_, _) => true
      case _ => false
    }
  }

  private def show(t: T): String = t match {
    case TAny => "any"
    case TStr => "string"
    case TInt => "integer"
    case TFloat => "float"
    case TBool => "bool"
    case TNone => "none"
    case TNamed(n) => n
    case TList(e) => s"list[${show(e)}]"
    case TDict(k, v) => s"dict[${show(k)}, ${show(v)}]"
    case TOptional(e) => s"optional[${show(e)}]"
    case TUnion(ts) => ts.map(show).mkString(" | ")
    case TTuple(ts) => s"tuple[${ts.map(show).mkString(", ")}]"
    case TStruct(fs) =>
      s"struct{${fs.map(f => s"${f._1}: ${show(f._2)}").mkString(", ")}}"
  }

  /** Full-project analysis: extract every annotated macro from
    * `macroSources`, then check call sites across all sources.
    * Returns the diagnostics (empty = clean). */
  def analyze(macroSources: Seq[(String, String)],
      otherSources: Seq[(String, String)]): Seq[String] = {
    val extracted = macroSources.map { case (where, src) =>
      extract(src, where) }
    // Later sources win (Root > Imported > Core, the caller's order) —
    // and a later UNANNOTATED declaration of a name must CLEAR an
    // earlier signature, not leave it checking the new macro's call
    // sites: a project override of a builtin (changed arity/defaults,
    // a pattern dbt supports) would otherwise produce false-positive
    // diagnostics that turn into hard failures under
    // funcsign-severity: error / --warn-error.
    val sigs = scala.collection.mutable.Map.empty[String, MacroSig]
    macroSources.zip(extracted).foreach { case ((_, src), (ms, _)) =>
      macroRe.findAllMatchIn(src).foreach(m => sigs.remove(m.group(1)))
      ms.foreach(s => sigs.update(s.name, s))
    }
    val extractDiags = extracted.flatMap(_._2)
    val sigMap = sigs.toMap
    // call-site checks run even with ZERO annotated macros — the
    // knownObjects table (modules.*) is signature-independent — but a
    // source with neither annotated-macro calls possible nor any
    // checkable surface must not pay a second full Jinja parse: gate
    // on a cheap substring probe before re-parsing
    def checkable(src: String): Boolean =
      sigMap.nonEmpty || src.contains("modules") ||
        src.contains("strftime") || src.contains("strptime")
    val callDiags =
      (macroSources ++ otherSources).flatMap { case (where, src) =>
        if (checkable(src)) checkCalls(src, where, sigMap) else Nil }
    extractDiags ++ callDiags
  }
}
