package graft.jinja

import Jinja._
import scala.collection.mutable.ArrayBuffer

/** Recursive-descent parser for the Jinja expression sublanguage
  * (precedence mirrors minijinja's parser,
  * crates/dbt-jinja/minijinja/src/compiler/parser.rs). */
object ExprParser {

  private sealed trait Tok
  private final case class TId(s: String) extends Tok
  private final case class TNum(v: Any) extends Tok
  private final case class TStr(s: String) extends Tok
  private final case class TOp(s: String) extends Tok

  private def tokenize(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < n && src.charAt(i + 1).isDigit)) {
        val start = i
        while (i < n && (src.charAt(i).isDigit || src.charAt(i) == '.')) i += 1
        val s = src.substring(start, i)
        out += TNum(if (s.contains('.')) s.toDouble else s.toLong)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (src.charAt(i).isLetterOrDigit || src.charAt(i) == '_')) i += 1
        out += TId(src.substring(start, i))
      } else if (c == '\'' || c == '"') {
        val sb = new StringBuilder
        i += 1
        while (i < n && src.charAt(i) != c) {
          if (src.charAt(i) == '\\' && i + 1 < n) {
            i += 1
            src.charAt(i) match {
              case 'n' => sb += '\n'; case 't' => sb += '\t'
              case 'r' => sb += '\r'; case '\\' => sb += '\\'
              case q @ ('\'' | '"') => sb += q
              // python/jinja keep unknown escapes verbatim — regex
              // strings like '\d+' must survive ('\\d' stays \d)
              case other => sb += '\\'; sb += other
            }
          } else sb += src.charAt(i)
          i += 1
        }
        if (i >= n) throw JinjaError(s"unclosed string in: $src")
        i += 1
        out += TStr(sb.toString)
      } else {
        val two = if (i + 1 < n) src.substring(i, i + 2) else ""
        if (Set("==", "!=", "<=", ">=", "//", "**").contains(two)) {
          out += TOp(two); i += 2
        } else {
          out += TOp(c.toString); i += 1
        }
      }
    }
    out.result()
  }

  private final class P(val toks: Vector[Tok]) {
    var pos = 0
    def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def accept(op: String): Boolean = peek match {
      case Some(TOp(`op`)) => pos += 1; true
      case _ => false
    }
    def acceptId(id: String): Boolean = peek match {
      case Some(TId(`id`)) => pos += 1; true
      case _ => false
    }
    def expect(op: String): Unit =
      if (!accept(op)) throw JinjaError(s"expected '$op' at $pos in $toks")

    // cond: or_expr ['if' or_expr 'else' cond]
    def condExpr(): Expr = {
      val v = orExpr()
      if (acceptId("if")) {
        val c = orExpr()
        if (!acceptId("else")) throw JinjaError("inline if requires else")
        val f = condExpr()
        ECond(c, v, f)
      } else v
    }

    def orExpr(): Expr = {
      var l = andExpr()
      while (acceptId("or")) l = EBin("or", l, andExpr())
      l
    }

    def andExpr(): Expr = {
      var l = notExpr()
      while (acceptId("and")) l = EBin("and", l, notExpr())
      l
    }

    def notExpr(): Expr =
      if (acceptId("not")) EUnary("not", notExpr()) else comparison()

    def comparison(): Expr = {
      var l = addSub()
      var loop = true
      while (loop) {
        peek match {
          case Some(TOp(op)) if Set("==", "!=", "<", "<=", ">", ">=").contains(op) =>
            pos += 1; l = EBin(op, l, addSub())
          case Some(TId("in")) => pos += 1; l = EBin("in", l, addSub())
          case Some(TId("not")) if peekAhead(1).contains(TId("in")) =>
            pos += 2; l = EBin("not in", l, addSub())
          case Some(TId("is")) =>
            pos += 1
            val negate = acceptId("not")
            val name = next() match {
              case TId(s) => s
              case other => throw JinjaError(s"bad test name: $other")
            }
            // optional single arg: `is divisibleby 3` or `is sameas(x)`
            val args: Seq[Expr] =
              if (accept("(")) {
                val as = ArrayBuffer.empty[Expr]
                if (!accept(")")) {
                  as += condExpr()
                  while (accept(",")) as += condExpr()
                  expect(")")
                }
                as.toSeq
              } else peek match {
                case Some(TNum(_) | TStr(_)) => Seq(primary())
                case _ => Nil
              }
            l = ETest(l, name, args, negate)
          case _ => loop = false
        }
      }
      l
    }

    private def peekAhead(k: Int): Option[Tok] =
      if (pos + k < toks.length) Some(toks(pos + k)) else None

    def addSub(): Expr = {
      var l = mulDiv()
      var loop = true
      while (loop) {
        peek match {
          case Some(TOp(op)) if op == "+" || op == "-" || op == "~" =>
            pos += 1; l = EBin(op, l, mulDiv())
          case _ => loop = false
        }
      }
      l
    }

    def mulDiv(): Expr = {
      var l = unary()
      var loop = true
      while (loop) {
        peek match {
          case Some(TOp(op)) if Set("*", "/", "%", "//").contains(op) =>
            pos += 1; l = EBin(op, l, unary())
          case _ => loop = false
        }
      }
      l
    }

    def unary(): Expr =
      if (accept("-")) EUnary("-", unary()) else postfix()

    /** primary with trailing .attr / [idx] / (args) / |filter chains. */
    def postfix(): Expr = {
      var e = primary()
      var loop = true
      while (loop) {
        if (accept(".")) {
          next() match {
            case TId(name) => e = EAttr(e, name)
            case other => throw JinjaError(s"bad attribute: $other")
          }
        } else if (accept("[")) {
          e = EIndex(e, condExpr())
          expect("]")
        } else if (accept("(")) {
          val (args, kwargs) = callArgs()
          e = ECall(e, args, kwargs)
        } else if (accept("|")) {
          next() match {
            case TId(name) =>
              if (accept("(")) {
                val (args, kwargs) = callArgs()
                e = EFilter(e, name, args, kwargs)
              } else e = EFilter(e, name, Nil, Nil)
            case other => throw JinjaError(s"bad filter: $other")
          }
        } else loop = false
      }
      e
    }

    private def callArgs(): (Seq[Expr], Seq[(String, Expr)]) = {
      val args = ArrayBuffer.empty[Expr]
      val kwargs = ArrayBuffer.empty[(String, Expr)]
      if (!accept(")")) {
        var more = true
        while (more) {
          peek match {
            case Some(TId(name)) if peekAhead(1).contains(TOp("=")) &&
                !peekAhead(2).contains(TOp("=")) =>
              pos += 2
              kwargs += name -> condExpr()
            case _ => args += condExpr()
          }
          more = accept(",")
        }
        expect(")")
      }
      (args.toSeq, kwargs.toSeq)
    }

    def primary(): Expr = next() match {
      case TNum(v) => ELit(v)
      case TStr(s) => ELit(s)
      case TId("true") | TId("True") => ELit(true)
      case TId("false") | TId("False") => ELit(false)
      case TId("none") | TId("None") => ELit(null)
      case TId(name) => EVar(name)
      case TOp("(") =>
        val e = condExpr()
        // tuple literal (a, b, c)
        if (accept(",")) {
          val items = ArrayBuffer(e)
          if (!peek.contains(TOp(")"))) {
            items += condExpr()
            while (accept(",")) items += condExpr()
          }
          expect(")")
          EList(items.toSeq)
        } else { expect(")"); e }
      case TOp("[") =>
        val items = ArrayBuffer.empty[Expr]
        if (!accept("]")) {
          items += condExpr()
          while (accept(",")) items += condExpr()
          expect("]")
        }
        EList(items.toSeq)
      case TOp("{") =>
        val pairs = ArrayBuffer.empty[(Expr, Expr)]
        if (!accept("}")) {
          def pair(): Unit = {
            val k = condExpr()
            expect(":")
            pairs += k -> condExpr()
          }
          pair()
          while (accept(",")) pair()
          expect("}")
        }
        EDict(pairs.toSeq)
      case other => throw JinjaError(s"unexpected token $other")
    }
  }

  def parse(src: String): Expr = {
    val p = new P(tokenize(src))
    val e = p.condExpr()
    if (p.pos != p.toks.length)
      throw JinjaError(s"trailing tokens in expression: $src")
    e
  }
}
