package graft.jinja

import scala.collection.mutable

/** dbt-flavored Jinja subset, implemented as a small AST interpreter.
  *
  * The reference embeds a full bytecode-compiled Jinja VM (fork of
  * minijinja: crates/dbt-jinja/minijinja/src/compiler/{lexer,parser,ast,
  * codegen}.rs + vm/mod.rs). We deliberately interpret instead of compile —
  * template rendering is driver-side orchestration work, microseconds per
  * model, never on the Spark hot path.
  *
  * Supported surface (what dbt models/macros actually use):
  *   {{ expr }}, {% if/elif/else %}, {% for x[, y] in xs %} (+ loop.*),
  *   {% set x = e %}, {% set x %}…{% endset %}, {% macro f(a, b=1) %},
  *   {% raw %}, {# comment #}, whitespace control ({%- -%}),
  *   literals/lists/dicts, attr/index access, calls with kwargs,
  *   and/or/not/in/comparisons/arithmetic/~, `x if c else y`,
  *   filters (|lower|join(',')…, defaults.rs:56-113 subset),
  *   tests (is defined / none / …, defaults.rs:122-178 subset).
  */
object Jinja {

  // ----- AST -------------------------------------------------------------

  sealed trait Tpl
  final case class TText(s: String) extends Tpl
  final case class TExpr(e: Expr) extends Tpl
  final case class TIf(branches: Seq[(Expr, Seq[Tpl])], elseBody: Seq[Tpl]) extends Tpl
  final case class TFor(names: Seq[String], iter: Expr, body: Seq[Tpl],
      elseBody: Seq[Tpl]) extends Tpl
  final case class TSet(name: String, value: Expr) extends Tpl
  final case class TSetBlock(name: String, body: Seq[Tpl]) extends Tpl
  final case class TMacroDef(name: String, params: Seq[(String, Option[Expr])],
      body: Seq[Tpl]) extends Tpl
  final case class TDo(e: Expr) extends Tpl
  /** `{% call fn(args) %}body{% endcall %}` — invokes fn with a `caller`
    * kwarg that renders the body (Jinja call blocks; dbt's
    * `{% call statement('main') %}` uses caller() for the SQL text). */
  final case class TCallBlock(call: Expr, body: Seq[Tpl]) extends Tpl
  /** `{% with a = 1, b = 2 %}…{% endwith %}` — scoped bindings that do
    * NOT leak (minijinja parser.rs:890 WithBlock). */
  final case class TWith(assigns: Seq[(String, Expr)], body: Seq[Tpl]) extends Tpl
  /** `{% filter upper|trim %}…{% endfilter %}` — render the body, pipe it
    * through the filter chain (minijinja parser.rs:896 FilterBlock). */
  final case class TFilterBlock(chain: Expr, body: Seq[Tpl]) extends Tpl
  /** `{% break %}` / `{% continue %}` (minijinja loop_controls,
    * parser.rs:942-953) — thrown as stackless control signals the
    * enclosing for-loop catches. */
  case object TBreak extends Tpl
  case object TContinue extends Tpl
  private object BreakSignal
    extends RuntimeException(null, null, false, false)
  private object ContinueSignal
    extends RuntimeException(null, null, false, false)

  sealed trait Expr
  final case class ELit(v: Any) extends Expr
  final case class EVar(name: String) extends Expr
  final case class EAttr(obj: Expr, name: String) extends Expr
  final case class EIndex(obj: Expr, idx: Expr) extends Expr
  final case class ECall(fn: Expr, args: Seq[Expr], kwargs: Seq[(String, Expr)]) extends Expr
  final case class EFilter(e: Expr, name: String, args: Seq[Expr],
      kwargs: Seq[(String, Expr)]) extends Expr
  final case class ETest(e: Expr, name: String, args: Seq[Expr], negate: Boolean) extends Expr
  final case class EBin(op: String, l: Expr, r: Expr) extends Expr
  final case class EUnary(op: String, e: Expr) extends Expr
  final case class ECond(c: Expr, t: Expr, f: Expr) extends Expr
  final case class EList(items: Seq[Expr]) extends Expr
  final case class EDict(pairs: Seq[(Expr, Expr)]) extends Expr

  /** A callable exposed to templates. kwargs arrive by name. */
  final case class JFunc(f: (Seq[Any], Map[String, Any]) => Any) {
    def apply(args: Seq[Any], kwargs: Map[String, Any]): Any = f(args, kwargs)
  }
  /** A callable that also sees the render context at the call site —
    * `adapter.dispatch(...)` returns one so macro resolution happens
    * against the macros registered in the calling template. */
  final case class JCtxFunc(f: (Ctx, Seq[Any], Map[String, Any]) => Any) {
    def apply(ctx: Ctx, args: Seq[Any], kwargs: Map[String, Any]): Any =
      f(ctx, args, kwargs)
  }
  /** Control flow for dbt's `{{ return(v) }}` inside macros /
    * materialization programs — unwound at the nearest macro boundary so
    * the macro yields `value` instead of its rendered text. */
  final case class ReturnValue(value: Any) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  /** Objects exposing attributes/methods to templates (adapter, config…). */
  trait JObject { def attr(name: String): Option[Any] }

  /** Mutable attribute bag created by `namespace()` — the one Jinja value
    * whose attribute writes survive loop/if scopes (minijinja
    * functions.rs:442-455; `{% set ns.x = ... %}` rebinds the attribute
    * on the shared object instead of shadowing a scope variable). */
  final class Namespace(init: Map[String, Any]) extends JObject {
    private val fields = mutable.LinkedHashMap.empty[String, Any]
    init.foreach { case (k, v) => fields(k) = v }
    def attr(name: String): Option[Any] = fields.get(name)
    def put(name: String, v: Any): Unit = fields(name) = v
    override def toString: String = fields.map { case (k, v) => s"$k: $v" }
      .mkString("namespace(", ", ", ")")
  }
  /** Objects that are ALSO directly callable, like dbt's `config(...)`. */
  trait JCallable { def invoke(args: Seq[Any], kwargs: Map[String, Any]): Any }

  /** A python list: reference-mutable (`{% do xs.append(v) %}`) but typed
    * as an immutable Seq so every existing filter/join/index/for site
    * sees an ordinary sequence. `[]` literals evaluate to one. */
  final class JList(val buf: mutable.ArrayBuffer[Any])
      extends scala.collection.immutable.Seq[Any] {
    def apply(i: Int): Any = buf(i)
    def length: Int = buf.length
    def iterator: Iterator[Any] = buf.iterator
  }

  /** A python dict: reference-mutable (`{% do d.update(...) %}`) but typed
    * as an immutable Map so every existing site sees an ordinary mapping.
    * `{}` literals evaluate to one; insertion order preserved. */
  final class JDict(val m: mutable.LinkedHashMap[String, Any])
      extends scala.collection.immutable.Map[String, Any] {
    def get(key: String): Option[Any] = m.get(key)
    def iterator: Iterator[(String, Any)] = m.iterator
    def removed(key: String): scala.collection.immutable.Map[String, Any] =
      scala.collection.immutable.VectorMap.from(m).removed(key)
    def updated[V1 >: Any](key: String, value: V1)
        : scala.collection.immutable.Map[String, V1] =
      scala.collection.immutable.VectorMap.from(m).updated(key, value)
  }

  final case class JinjaError(msg: String) extends RuntimeException(msg)

  // ----- rendering context ----------------------------------------------

  final class Ctx(parent: Option[Ctx] = None) {
    private val vars = mutable.LinkedHashMap.empty[String, Any]
    def get(name: String): Option[Any] =
      vars.get(name).orElse(parent.flatMap(_.get(name)))
    def set(name: String, v: Any): Unit = vars(name) = v
    /** Assign into the scope where `name` already exists (so `{% set %}`
      * inside if/for mutates the outer variable, like Jinja). */
    def assign(name: String, v: Any): Unit =
      if (vars.contains(name) || parent.isEmpty || parent.flatMap(_.get(name)).isEmpty)
        vars(name) = v
      else parent.get.assign(name, v)
    def child: Ctx = new Ctx(Some(this))
  }

  def newContext(bindings: Map[String, Any]): Ctx = {
    val c = new Ctx(None)
    bindings.foreach { case (k, v) => c.set(k, v) }
    c.set("true", true); c.set("false", false); c.set("none", null)
    c.set("True", true); c.set("False", false); c.set("None", null)
    c.set("range", JFunc((a, _) => a match {
      case Seq(n: Long) => (0L until n).toVector
      case Seq(s: Long, e: Long) => (s until e).toVector
      case _ => throw JinjaError("range(n) or range(s,e)")
    }))
    c.set("namespace", JFunc((a, kw) => {
      val base = a.headOption.map {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case other => throw JinjaError(s"namespace() takes a mapping, got $other")
      }.getOrElse(Map.empty[String, Any])
      new Namespace(base ++ kw)
    }))
    c
  }

  // ----- public API ------------------------------------------------------

  def render(template: String, bindings: Map[String, Any]): String =
    renderAst(parse(template), newContext(bindings))

  def renderAst(nodes: Seq[Tpl], ctx: Ctx): String = {
    val sb = new StringBuilder
    try exec(nodes, ctx, sb)
    catch {
      case BreakSignal | ContinueSignal =>
        throw JinjaError("break/continue outside of a for loop")
    }
    sb.toString
  }

  // ----- lexer/parser ----------------------------------------------------

  private sealed trait Chunk
  private final case class CText(s: String) extends Chunk
  private final case class CExpr(s: String) extends Chunk
  private final case class CStmt(s: String) extends Chunk

  private def chunks(src: String): Vector[Chunk] = {
    val out = Vector.newBuilder[Chunk]
    var i = 0
    val n = src.length
    val text = new StringBuilder
    var trimNext = false
    def flushText(trimEnd: Boolean): Unit = {
      var s = text.toString
      if (trimNext) s = s.replaceFirst("^\\s+", "")
      if (trimEnd) s = s.replaceFirst("\\s+$", "")
      if (s.nonEmpty) out += CText(s)
      text.clear()
      trimNext = false
    }
    while (i < n) {
      if (i + 1 < n && src.charAt(i) == '{' &&
          (src.charAt(i + 1) == '{' || src.charAt(i + 1) == '%' || src.charAt(i + 1) == '#')) {
        val kind = src.charAt(i + 1)
        val closer = kind match { case '{' => "}}"; case '%' => "%}"; case _ => "#}" }
        // find closing marker, respecting quotes inside
        var j = i + 2
        var inq: Char = 0
        var end = -1
        while (j < n && end < 0) {
          val c = src.charAt(j)
          if (inq != 0) { if (c == inq) inq = 0 }
          else if (c == '\'' || c == '"') inq = c
          else if (c == closer.charAt(0) && j + 1 < n && src.charAt(j + 1) == closer.charAt(1)) end = j
          j += 1
        }
        if (end < 0) throw JinjaError(s"unclosed tag at offset $i")
        var inner = src.substring(i + 2, end)
        val trimBefore = inner.startsWith("-")
        val trimAfter = inner.endsWith("-")
        if (trimBefore) inner = inner.substring(1)
        if (trimAfter) inner = inner.substring(0, inner.length - 1)
        inner = inner.trim
        flushText(trimBefore)
        kind match {
          case '{' => out += CExpr(inner)
          case '%' => out += CStmt(inner)
          case _ => // comment dropped
        }
        trimNext = trimAfter
        i = end + 2
      } else { text += src.charAt(i); i += 1 }
    }
    flushText(trimEnd = false)
    out.result()
  }

  def parse(src: String): Seq[Tpl] = {
    val cs = chunks(src)
    val (nodes, rest) = parseBlock(cs, 0, Set.empty)
    if (rest != cs.length) throw JinjaError("unexpected end tag")
    nodes
  }

  /** Parse until one of `stop` statement keywords; returns (nodes, index of
    * the stopping chunk). */
  private def parseBlock(cs: Vector[Chunk], start: Int,
      stop: Set[String]): (Seq[Tpl], Int) = {
    val out = Seq.newBuilder[Tpl]
    var i = start
    while (i < cs.length) {
      cs(i) match {
        case CText(s) => out += TText(s); i += 1
        case CExpr(s) => out += TExpr(ExprParser.parse(s)); i += 1
        case CStmt(s) =>
          val kw = s.split("\\s+", 2)(0)
          if (stop.contains(kw)) return (out.result(), i)
          kw match {
            case "raw" =>
              // capture verbatim until endraw
              var j = i + 1
              val sb = new StringBuilder
              var done = false
              while (j < cs.length && !done) {
                cs(j) match {
                  case CStmt(t) if t.trim == "endraw" => done = true
                  case CText(t) => sb ++= t
                  case CExpr(t) => sb ++= s"{{ $t }}"
                  case CStmt(t) => sb ++= s"{% $t %}"
                }
                j += 1
              }
              out += TText(sb.toString); i = j
            case "if" =>
              val cond = ExprParser.parse(s.stripPrefix("if").trim)
              var branches = Vector(cond -> Seq.empty[Tpl])
              var elseBody: Seq[Tpl] = Nil
              var j = i + 1
              var open = true
              var curCond = cond
              while (open) {
                val (body, k) = parseBlock(cs, j, Set("elif", "else", "endif"))
                cs(k) match {
                  case CStmt(t) if t.startsWith("elif") =>
                    branches = branches.init :+ (curCond -> body)
                    curCond = ExprParser.parse(t.stripPrefix("elif").trim)
                    branches = branches :+ (curCond -> Seq.empty)
                    j = k + 1
                  case CStmt(t) if t.trim == "else" =>
                    branches = branches.init :+ (curCond -> body)
                    val (eb, k2) = parseBlock(cs, k + 1, Set("endif"))
                    elseBody = eb
                    j = k2 + 1
                    open = false
                  case CStmt(t) if t.trim == "endif" =>
                    branches = branches.init :+ (curCond -> body)
                    j = k + 1
                    open = false
                  case other => throw JinjaError(s"bad if structure: $other")
                }
              }
              out += TIf(branches, elseBody); i = j
            case "for" =>
              val m = raw"for\s+(.+?)\s+in\s+(.+)".r
              s match {
                case m(vars, iterSrc) =>
                  val names = vars.split(",").map(_.trim).toSeq
                  val (body, k) = parseBlock(cs, i + 1, Set("else", "endfor"))
                  cs(k) match {
                    case CStmt(t) if t.trim == "else" =>
                      val (eb, k2) = parseBlock(cs, k + 1, Set("endfor"))
                      out += TFor(names, ExprParser.parse(iterSrc), body, eb)
                      i = k2 + 1
                    case _ =>
                      out += TFor(names, ExprParser.parse(iterSrc), body, Nil)
                      i = k + 1
                  }
                case _ => throw JinjaError(s"bad for: $s")
              }
            case "set" =>
              val rest = s.stripPrefix("set").trim
              val eq = topLevelEq(rest)
              if (eq >= 0) {
                out += TSet(rest.substring(0, eq).trim, ExprParser.parse(rest.substring(eq + 1).trim))
                i += 1
              } else {
                val (body, k) = parseBlock(cs, i + 1, Set("endset"))
                out += TSetBlock(rest, body)
                i = k + 1
              }
            case "macro" =>
              val mm = raw"macro\s+([A-Za-z_][A-Za-z0-9_]*)\s*\((.*)\)\s*".r
              s match {
                case mm(name, params) =>
                  val ps = splitTop(params).filter(_.nonEmpty).map { p =>
                    val e = topLevelEq(p)
                    if (e >= 0) (p.substring(0, e).trim, Some(ExprParser.parse(p.substring(e + 1))))
                    else (p.trim, None)
                  }
                  val (body, k) = parseBlock(cs, i + 1, Set("endmacro"))
                  out += TMacroDef(name, ps, body)
                  i = k + 1
                case _ => throw JinjaError(s"bad macro: $s")
              }
            case "call" =>
              val (body, k) = parseBlock(cs, i + 1, Set("endcall"))
              out += TCallBlock(ExprParser.parse(s.stripPrefix("call").trim), body)
              i = k + 1
            case "do" =>
              out += TDo(ExprParser.parse(s.stripPrefix("do").trim)); i += 1
            case "break" => out += TBreak; i += 1
            case "continue" => out += TContinue; i += 1
            case "with" =>
              val assigns = splitTop(s.stripPrefix("with").trim)
                .filter(_.nonEmpty).map { a =>
                  val e = topLevelEq(a)
                  if (e < 0) throw JinjaError(s"bad with binding: $a")
                  (a.substring(0, e).trim, ExprParser.parse(a.substring(e + 1).trim))
                }
              val (body, k) = parseBlock(cs, i + 1, Set("endwith"))
              out += TWith(assigns, body)
              i = k + 1
            case "filter" =>
              // reuse the expression parser by piping a placeholder
              // variable through the written chain
              val chain = ExprParser.parse(
                s"__filter_body__ | ${s.stripPrefix("filter").trim}")
              val (body, k) = parseBlock(cs, i + 1, Set("endfilter"))
              out += TFilterBlock(chain, body)
              i = k + 1
            case other => throw JinjaError(s"unsupported statement: $other")
          }
      }
    }
    (out.result(), cs.length)
  }

  /** Position of the first '=' not inside quotes/parens and not part of
    * ==, !=, <=, >=. */
  private def topLevelEq(s: String): Int = {
    var depth = 0; var inq: Char = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inq != 0) { if (c == inq) inq = 0 }
      else c match {
        case '\'' | '"' => inq = c
        case '(' | '[' | '{' => depth += 1
        case ')' | ']' | '}' => depth -= 1
        case '=' if depth == 0 =>
          val prev = if (i > 0) s.charAt(i - 1) else ' '
          val next = if (i + 1 < s.length) s.charAt(i + 1) else ' '
          if (prev != '=' && prev != '!' && prev != '<' && prev != '>' && next != '=')
            return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Split on top-level commas. */
  private[jinja] def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inq: Char = 0
    val cur = new StringBuilder
    s.foreach { c =>
      if (inq != 0) { cur += c; if (c == inq) inq = 0 }
      else c match {
        case '\'' | '"' => inq = c; cur += c
        case '(' | '[' | '{' => depth += 1; cur += c
        case ')' | ']' | '}' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
        case _ => cur += c
      }
    }
    val last = cur.toString.trim
    if (last.nonEmpty) out += last
    out.result()
  }

  // ----- execution -------------------------------------------------------

  private def exec(nodes: Seq[Tpl], ctx: Ctx, sb: StringBuilder): Unit =
    nodes.foreach {
      case TText(s) => sb ++= s
      case TExpr(e) => sb ++= stringify(eval(e, ctx))
      case TDo(e) => eval(e, ctx)
      case TWith(assigns, body) =>
        val child = ctx.child
        assigns.foreach { case (n, e) => child.set(n, eval(e, child)) }
        exec(body, child, sb)
      case TFilterBlock(chain, body) =>
        val inner = new StringBuilder
        exec(body, ctx.child, inner)
        val child = ctx.child
        child.set("__filter_body__", inner.toString)
        sb ++= stringify(eval(chain, child))
      case TSet(name, v) => assignTarget(ctx, name, eval(v, ctx))
      case TSetBlock(name, body) =>
        val inner = new StringBuilder
        exec(body, ctx, inner)
        assignTarget(ctx, name, inner.toString)
      case TIf(branches, elseBody) =>
        branches.find { case (c, _) => truthy(eval(c, ctx)) } match {
          case Some((_, body)) => exec(body, ctx.child, sb)
          case None => exec(elseBody, ctx.child, sb)
        }
      case TBreak => throw BreakSignal
      case TContinue => throw ContinueSignal
      case TFor(names, iterE, body, elseBody) =>
        val it = toIterable(eval(iterE, ctx))
        if (it.isEmpty) exec(elseBody, ctx.child, sb)
        else {
          val size = it.size
          val iter = it.zipWithIndex.iterator
          var broke = false
          while (!broke && iter.hasNext) {
            val (item, idx) = iter.next()
            val c = ctx.child
            if (names.length == 1) c.set(names.head, item)
            else item match {
              case s: Seq[_] => names.zip(s).foreach { case (n, v) => c.set(n, v) }
              case (a, b) if names.length == 2 =>
                c.set(names(0), a); c.set(names(1), b)
              case other => throw JinjaError(s"cannot unpack $other into $names")
            }
            c.set("loop", Map(
              "index" -> (idx + 1L), "index0" -> idx.toLong,
              "first" -> (idx == 0), "last" -> (idx == size - 1),
              "length" -> size.toLong))
            try exec(body, c, sb)
            catch {
              case ContinueSignal => // next iteration
              case BreakSignal => broke = true
            }
          }
        }
      case TCallBlock(call, body) =>
        // the caller() closure renders the block body at invocation time
        val caller = JFunc { (_, _) =>
          val inner = new StringBuilder
          exec(body, ctx.child, inner)
          inner.toString
        }
        val r = call match {
          case ECall(fnE, args, kwargs) =>
            val a = args.map(eval(_, ctx))
            val kw = kwargs.map { case (k, v) => k -> eval(v, ctx) }.toMap +
              ("caller" -> caller)
            eval(fnE, ctx) match {
              case jf: JFunc => jf(a, kw)
              case jc: JCallable => jc.invoke(a, kw)
              case cf: JCtxFunc => cf(ctx, a, kw)
              case other => throw JinjaError(s"not callable in call block: $other")
            }
          case other => throw JinjaError(s"call block needs a call: $other")
        }
        sb ++= stringify(r)
      case TMacroDef(name, params, body) =>
        ctx.set(name, JFunc { (args, kwargs) =>
          val c = ctx.child
          params.zipWithIndex.foreach { case ((pname, default), i) =>
            val v =
              if (i < args.length) args(i)
              else kwargs.getOrElse(pname,
                default.map(d => eval(d, ctx)).getOrElse(
                  throw JinjaError(s"macro $name missing argument $pname")))
            c.set(pname, v)
          }
          // call-block invocations pass caller() implicitly (Jinja2 {% call %})
          kwargs.get("caller").foreach(c.set("caller", _))
          // jinja2 macro specials: extra positionals land in varargs,
          // undeclared keywords in kwargs (dbt dispatch shims read these)
          c.set("varargs", args.drop(params.length).toVector)
          c.set("kwargs", kwargs -- params.map(_._1) - "caller")
          val inner = new StringBuilder
          try { exec(body, c, inner); inner.toString }
          catch {
            case ReturnValue(v) => v // {{ return(v) }} short-circuit
            // loop controls are bounded by the macro: a {% break %} in a
            // macro body must not escape into a CALLER's for loop
            case BreakSignal | ContinueSignal =>
              throw JinjaError("break/continue outside of a for loop")
          }
        })
    }

  def eval(e: Expr, ctx: Ctx): Any = e match {
    case ELit(v) => v
    case EVar(n) => ctx.get(n).getOrElse(Undefined(n))
    case EAttr(o, n) => attr(eval(o, ctx), n)
    case EIndex(o, i) => index(eval(o, ctx), eval(i, ctx))
    // python lists are reference-mutable — `{% set xs = [] %}` then
    // `{% do xs.append(v) %}` inside a loop is the canonical dbt
    // accumulator; JList is an immutable-Seq view over mutable state so
    // filters/joins/for see an ordinary sequence
    case EList(items) =>
      new JList(items.map(eval(_, ctx)).to(mutable.ArrayBuffer))
    case EDict(pairs) =>
      // python dicts are reference-mutable, like [] literals above
      new JDict(mutable.LinkedHashMap.from(
        pairs.map { case (k, v) => stringify(eval(k, ctx)) -> eval(v, ctx) }))
    case ECond(c, t, f) => if (truthy(eval(c, ctx))) eval(t, ctx) else eval(f, ctx)
    case EUnary("not", x) => !truthy(eval(x, ctx))
    case EUnary("-", x) => eval(x, ctx) match {
      case l: Long => -l
      case d: Double => -d
      case other => throw JinjaError(s"cannot negate $other")
    }
    case EUnary(op, _) => throw JinjaError(s"unknown unary $op")
    case EBin("and", l, r) =>
      val lv = eval(l, ctx); if (!truthy(lv)) lv else eval(r, ctx)
    case EBin("or", l, r) =>
      val lv = eval(l, ctx); if (truthy(lv)) lv else eval(r, ctx)
    case EBin(op, l, r) => binop(op, eval(l, ctx), eval(r, ctx))
    case ETest(x, name, args, negate) =>
      val r = Tests.apply(name, eval(x, ctx), args.map(eval(_, ctx)))
      if (negate) !r else r
    case EFilter(x, name, args, kwargs) =>
      Filters.apply(name, eval(x, ctx), args.map(eval(_, ctx)),
        kwargs.map { case (k, v) => k -> eval(v, ctx) }.toMap)
    case ECall(fn, args, kwargs) =>
      val f = eval(fn, ctx)
      val a = args.map(eval(_, ctx))
      val kw = kwargs.map { case (k, v) => k -> eval(v, ctx) }.toMap
      f match {
        case jf: JFunc => jf(a, kw)
        case jc: JCallable => jc.invoke(a, kw)
        case cf: JCtxFunc => cf(ctx, a, kw)
        case u: Undefined => throw JinjaError(s"'${u.name}' is undefined (not callable)")
        case other => throw JinjaError(s"not callable: $other")
      }
  }

  final case class Undefined(name: String) {
    override def toString: String = ""
  }

  def truthy(v: Any): Boolean = v match {
    case null | None => false
    case _: Undefined => false
    case b: Boolean => b
    case s: String => s.nonEmpty
    case l: Long => l != 0L
    case i: Int => i != 0
    case d: Double => d != 0.0
    case s: Seq[_] => s.nonEmpty
    case m: Map[_, _] => m.nonEmpty
    case _ => true
  }

  def stringify(v: Any): String = v match {
    case null | None => ""
    case _: Undefined => ""
    case b: Boolean => if (b) "True" else "False"
    case d: Double => if (d == d.floor && !d.isInfinite) {
      val l = d.toLong; if (l.toDouble == d) s"$l.0" else d.toString
    } else d.toString
    case s: Seq[_] => s.map(repr).mkString("[", ", ", "]")
    case m: Map[_, _] =>
      m.map { case (k, x) => s"${repr(k)}: ${repr(x)}" }.mkString("{", ", ", "}")
    case other => other.toString
  }

  private def repr(v: Any): String = v match {
    case s: String => "'" + s + "'"
    case other => stringify(other)
  }

  private def toIterable(v: Any): Seq[Any] = v match {
    case s: Seq[_] => s
    case m: Map[_, _] => m.keys.toSeq
    case s: String => s.map(_.toString)
    case _: Undefined => Nil
    case null => Nil
    case other => throw JinjaError(s"not iterable: $other")
  }

  /** `{% set x = v %}` rebinds a scope variable; `{% set ns.x = v %}`
    * mutates the namespace object's attribute (reachable through any
    * scope that sees `ns`). */
  private def assignTarget(ctx: Ctx, name: String, value: Any): Unit =
    if (!name.contains('.')) ctx.assign(name, value)
    else {
      val parts = name.split('.')
      val base = ctx.get(parts.head).getOrElse(
        throw JinjaError(s"undefined variable: ${parts.head}"))
      val target = parts.view.slice(1, parts.length - 1).foldLeft(base) {
        (cur, p) => attr(cur, p)
      }
      target match {
        case ns: Namespace => ns.put(parts.last, value)
        case other => throw JinjaError(
          s"cannot assign attribute '${parts.last}' on non-namespace: $other")
      }
    }

  def attr(obj: Any, name: String): Any = obj match {
    case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      // key lookup wins (existing config dicts may carry these names);
      // python dict methods fill the gaps for real-world macros
      mm.get(name).getOrElse(name match {
        case "items" => JFunc((_, _) =>
          mm.toVector.map { case (k, v) => Vector(k, v) })
        case "keys" => JFunc((_, _) => mm.keys.toVector)
        case "values" => JFunc((_, _) => mm.values.toVector)
        case "get" => JFunc((a, _) =>
          mm.getOrElse(stringify(a.head), a.lift(1).orNull))
        // mutation — only {} literals (JDict) are reference-mutable
        case "update" | "pop" | "setdefault" | "clear" => obj match {
          case d: JDict => name match {
            case "update" => JFunc { (a, _) =>
              d.m ++= a.head.asInstanceOf[scala.collection.Map[String, Any]]
              null
            }
            case "pop" => JFunc { (a, _) =>
              d.m.remove(stringify(a.head))
                .orElse(a.lift(1))
                .getOrElse(throw JinjaError(
                  s"dict.pop: missing key ${a.head}"))
            }
            case "setdefault" => JFunc { (a, _) =>
              d.m.getOrElseUpdate(stringify(a.head), a.lift(1).orNull)
            }
            case "clear" => JFunc { (_, _) => d.m.clear(); null }
          }
          case _ => throw JinjaError(
            s"$name on an immutable mapping — only {} literals are mutable")
        }
        case _ => Undefined(name)
      })
    case o: JObject => o.attr(name).getOrElse(Undefined(name))
    case u: Undefined => u
    case s: String => name match {
      case "upper" => JFunc((_, _) => s.toUpperCase)
      case "lower" => JFunc((_, _) => s.toLowerCase)
      case "strip" => JFunc((_, _) => s.trim)
      case "startswith" => JFunc((a, _) => s.startsWith(a.head.toString))
      case "endswith" => JFunc((a, _) => s.endsWith(a.head.toString))
      case "replace" => JFunc((a, _) => s.replace(a(0).toString, a(1).toString))
      case "split" => JFunc((a, _) => s.split(java.util.regex.Pattern.quote(a.head.toString)).toVector)
      case "format" => JFunc((a, _) => s.format(a: _*))
      case "join" => JFunc((a, _) => toIterable(a.head).map(stringify).mkString(s))
      case _ => Undefined(name)
    }
    case l: JList =>
      val buf = l.buf
      name match {
        case "append" => JFunc { (a, _) => buf += a.head; null }
        case "extend" => JFunc { (a, _) => buf ++= toIterable(a.head); null }
        case "insert" => JFunc { (a, _) =>
          buf.insert(num(a.head).fold(_.toInt, _.toInt), a(1)); null }
        case "pop" => JFunc { (a, _) =>
          val i = a.headOption.map(v => num(v).fold(_.toInt, _.toInt))
            .getOrElse(buf.length - 1)
          buf.remove(if (i < 0) buf.length + i else i)
        }
        case "remove" => JFunc { (a, _) =>
          val i = buf.indexWhere(jEquals(_, a.head))
          if (i < 0) throw JinjaError(s"list.remove: ${a.head} not in list")
          buf.remove(i); null
        }
        case _ => Undefined(name)
      }
    case xs: Seq[_] => name match {
      case "append" | "extend" | "insert" | "pop" | "remove" =>
        throw JinjaError(
          s"$name on an immutable sequence — only [] literals are mutable")
      case _ => Undefined(name)
    }
    case null => Undefined(name)
    case _ => Undefined(name)
  }

  private def index(obj: Any, idx: Any): Any = (obj, idx) match {
    case (m: Map[_, _], k) =>
      m.asInstanceOf[Map[String, Any]].getOrElse(stringify(k), Undefined(stringify(k)))
    case (s: Seq[_], i: Long) =>
      val ii = if (i < 0) s.length + i.toInt else i.toInt
      if (ii >= 0 && ii < s.length) s(ii) else Undefined(s"[$i]")
    case (s: String, i: Long) =>
      val ii = if (i < 0) s.length + i.toInt else i.toInt
      s.charAt(ii).toString
    case (o: JObject, k) => attr(o, stringify(k))
    case other => throw JinjaError(s"cannot index $other")
  }

  private def num(v: Any): Either[Long, Double] = v match {
    case l: Long => Left(l)
    case i: Int => Left(i.toLong)
    case d: Double => Right(d)
    case s: String if s.matches("-?\\d+") => Left(s.toLong)
    case s: String if s.matches("-?\\d*\\.\\d+") => Right(s.toDouble)
    case b: Boolean => Left(if (b) 1L else 0L)
    case other => throw JinjaError(s"not a number: $other")
  }

  private def arith(op: String, l: Any, r: Any): Any = (num(l), num(r)) match {
    case (Left(a), Left(b)) => op match {
      case "+" => a + b
      case "-" => a - b
      case "*" => a * b
      case "%" => a % b
      case "//" => Math.floorDiv(a, b)
      case "/" => a.toDouble / b
    }
    case (a, b) =>
      val (x, y) = (a.fold(_.toDouble, identity), b.fold(_.toDouble, identity))
      op match {
        case "+" => x + y
        case "-" => x - y
        case "*" => x * y
        case "%" => x % y
        case "//" => (x / y).floor
        case "/" => x / y
      }
  }

  private def cmp(l: Any, r: Any): Int = (l, r) match {
    case (a: String, b: String) => a.compareTo(b)
    case (a: PyModules.PyDateTime, b: PyModules.PyDateTime) =>
      java.lang.Long.compare(a.epochMs, b.epochMs)
    case (a: PyModules.PyTimeDelta, b: PyModules.PyTimeDelta) =>
      java.lang.Long.compare(a.ms, b.ms)
    case (a, b) =>
      val x = num(a).fold(_.toDouble, identity)
      val y = num(b).fold(_.toDouble, identity)
      java.lang.Double.compare(x, y)
  }

  private def jEquals(l: Any, r: Any): Boolean = (l, r) match {
    case (null, null) => true
    case (_: Undefined, null) | (null, _: Undefined) => true
    case (a: Undefined, b: Undefined) => true
    case (null, _) | (_, null) => false
    case (a: Long, b: Double) => a.toDouble == b
    case (a: Double, b: Long) => a == b.toDouble
    case (a, b) => a == b
  }

  private def binop(op: String, l: Any, r: Any): Any = op match {
    case "~" => stringify(l) + stringify(r)
    case "+" => (l, r) match {
      case (a: String, b) => a + stringify(b)
      case (a, b: String) => stringify(a) + b
      case (a: Seq[_], b: Seq[_]) => a ++ b
      // python datetime arithmetic (modules.datetime, PyModules)
      case (a: PyModules.PyDateTime, b: PyModules.PyTimeDelta) =>
        a.copy(epochMs = a.epochMs + b.ms)
      case (a: PyModules.PyTimeDelta, b: PyModules.PyDateTime) =>
        b.copy(epochMs = b.epochMs + a.ms)
      case (a: PyModules.PyTimeDelta, b: PyModules.PyTimeDelta) =>
        PyModules.PyTimeDelta(a.ms + b.ms)
      case _ => arith("+", l, r)
    }
    case "-" => (l, r) match {
      case (a: PyModules.PyDateTime, b: PyModules.PyTimeDelta) =>
        a.copy(epochMs = a.epochMs - b.ms)
      case (a: PyModules.PyDateTime, b: PyModules.PyDateTime) =>
        PyModules.PyTimeDelta(a.epochMs - b.epochMs)
      case (a: PyModules.PyTimeDelta, b: PyModules.PyTimeDelta) =>
        PyModules.PyTimeDelta(a.ms - b.ms)
      case _ => arith("-", l, r)
    }
    case "*" => (l, r) match {
      case (a: PyModules.PyTimeDelta, b) =>
        PyModules.PyTimeDelta((a.ms * num(b).fold(_.toDouble, identity)).round)
      case (a, b: PyModules.PyTimeDelta) =>
        PyModules.PyTimeDelta((b.ms * num(a).fold(_.toDouble, identity)).round)
      case _ => arith("*", l, r)
    }
    case "/" | "%" | "//" => arith(op, l, r)
    case "==" => jEquals(l, r)
    case "!=" => !jEquals(l, r)
    case "<" => cmp(l, r) < 0
    case "<=" => cmp(l, r) <= 0
    case ">" => cmp(l, r) > 0
    case ">=" => cmp(l, r) >= 0
    case "in" => r match {
      case s: Seq[_] => s.exists(jEquals(_, l))
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].contains(stringify(l))
      case s: String => s.contains(stringify(l))
      case _ => false
    }
    case "not in" => !binop("in", l, r).asInstanceOf[Boolean]
    case other => throw JinjaError(s"unknown operator $other")
  }
}
