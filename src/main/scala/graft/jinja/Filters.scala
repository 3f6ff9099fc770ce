package graft.jinja

import Jinja._

/** Built-in filters — the subset of the reference's ~50
  * (crates/dbt-jinja/minijinja/src/defaults.rs:56-113) that dbt project
  * code actually exercises. */
object Filters {

  private def asSeq(v: Any): Seq[Any] = v match {
    case s: Seq[_] => s.asInstanceOf[Seq[Any]]
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].keys.toSeq
    case s: String => s.map(_.toString)
    case null | _: Undefined => Nil
    case other => throw JinjaError(s"not a sequence: $other")
  }

  private def keyOf(v: Any): String = Jinja.stringify(v)

  def apply(name: String, value: Any, args: Seq[Any], kwargs: Map[String, Any]): Any =
    name match {
      case "lower" => keyOf(value).toLowerCase
      case "upper" => keyOf(value).toUpperCase
      case "title" => keyOf(value).split(' ').map(_.capitalize).mkString(" ")
      case "capitalize" => keyOf(value).capitalize
      case "trim" => keyOf(value).trim
      case "replace" => keyOf(value).replace(keyOf(args(0)), keyOf(args(1)))
      case "join" =>
        val sep = args.headOption.map(keyOf).getOrElse("")
        asSeq(value).map(keyOf).mkString(sep)
      case "split" => keyOf(value)
        .split(java.util.regex.Pattern.quote(keyOf(args.head))).toVector
      case "default" | "d" =>
        val useDefault = value match {
          case null | _: Undefined => true
          case "" => args.length > 1 && Jinja.truthy(args(1))
          case _ => false
        }
        if (useDefault) args.headOption.orNull else value
      case "length" | "count" => value match {
        case s: String => s.length.toLong
        case s: Seq[_] => s.length.toLong
        case m: Map[_, _] => m.size.toLong
        case _ => throw JinjaError("length of non-sequence")
      }
      case "first" => asSeq(value).headOption.getOrElse(Undefined("first"))
      case "last" => asSeq(value).lastOption.getOrElse(Undefined("last"))
      case "min" => asSeq(value).minBy(numKey)
      case "max" => asSeq(value).maxBy(numKey)
      case "sum" => asSeq(value).map(numKey).sum match {
        case d if d == d.floor => d.toLong
        case d => d
      }
      case "abs" => value match {
        case l: Long => Math.abs(l)
        case d: Double => Math.abs(d)
        case other => Math.abs(keyOf(other).toDouble)
      }
      case "round" =>
        val prec = args.headOption.map(numKey(_).toInt).getOrElse(0)
        val d = numKey(value)
        val f = Math.pow(10, prec)
        val r = Math.round(d * f) / f
        if (prec == 0) r else r
      case "int" => value match {
        case l: Long => l
        case d: Double => d.toLong
        case s: String => s.trim.toDouble.toLong
        case b: Boolean => if (b) 1L else 0L
        case _ => 0L
      }
      case "float" => numKey(value)
      case "string" => keyOf(value)
      case "list" => asSeq(value).toVector
      case "sort" =>
        val rev = Jinja.truthy(kwargs.getOrElse("reverse", false))
        val attr = kwargs.get("attribute").map(keyOf)
        val s = asSeq(value).sortWith { (a, b) =>
          val (x, y) = attr match {
            case Some(at) => (Jinja.attr(a, at), Jinja.attr(b, at))
            case None => (a, b)
          }
          compareAny(x, y) < 0
        }
        if (rev) s.reverse.toVector else s.toVector
      case "reverse" => asSeq(value).reverse.toVector
      case "unique" => asSeq(value).distinct.toVector
      case "batch" =>
        // fill_with pads only the LAST batch up to `size` (filters.rs:1126)
        val size = numKey(args.head).toInt
        if (size == 0) throw JinjaError("batch count cannot be 0")
        val fill = kwargs.get("fill_with").orElse(args.lift(1))
        asSeq(value).grouped(size).map { g =>
          fill match {
            case Some(f) if g.length < size =>
              (g ++ Seq.fill(size - g.length)(f)).toVector
            case _ => g.toVector
          }
        }.toVector
      case "slice" =>
        // n columns; fill_with pads the SHORT columns (filters.rs:1069)
        val n = numKey(args.head).toInt
        val fill = kwargs.get("fill_with").orElse(args.lift(1))
        val xs = asSeq(value)
        val base = xs.length / n
        val extra = xs.length % n
        var idx = 0
        (0 until n).map { i =>
          val len = base + (if (i < extra) 1 else 0)
          val out = xs.slice(idx, idx + len).toVector
          idx += len
          fill match {
            case Some(f) if extra > 0 && i >= extra => out :+ f
            case _ => out
          }
        }.toVector
      case "indent" =>
        val width = args.headOption.map(numKey(_).toInt).getOrElse(4)
        val pad = " " * width
        keyOf(value).linesIterator.zipWithIndex
          .map { case (l, i) => if (i == 0) l else pad + l }.mkString("\n")
      case "map" =>
        kwargs.get("attribute") match {
          case Some(at) => asSeq(value).map(v => Jinja.attr(v, keyOf(at))).toVector
          case None =>
            val fname = keyOf(args.head)
            asSeq(value).map(v => Filters(fname, v, Nil, Map.empty)).toVector
        }
      case "selectattr" | "rejectattr" =>
        val at = keyOf(args.head)
        val want = name == "selectattr"
        val pred: Any => Boolean =
          if (args.length >= 2) {
            val test = keyOf(args(1))
            val targs = args.drop(2)
            v => Tests.apply(test, Jinja.attr(v, at), targs)
          } else v => Jinja.truthy(Jinja.attr(v, at))
        asSeq(value).filter(v => pred(v) == want).toVector
      case "select" | "reject" =>
        val want = name == "select"
        val pred: Any => Boolean =
          if (args.nonEmpty) {
            val test = keyOf(args.head)
            val targs = args.tail
            v => Tests.apply(test, v, targs)
          } else v => Jinja.truthy(v)
        asSeq(value).filter(v => pred(v) == want).toVector
      case "groupby" =>
        val at = keyOf(args.head)
        asSeq(value).groupBy(v => Jinja.attr(v, at))
          .toVector.sortBy(kv => keyOf(kv._1))
          .map { case (k, vs) => Vector(k, vs.toVector) }
      case "items" => value match {
        case m: Map[_, _] =>
          m.asInstanceOf[Map[String, Any]].toVector.map { case (k, v) => Vector(k, v) }
        case other => throw JinjaError(s"items on non-mapping: $other")
      }
      case "keys" => value match {
        case m: Map[_, _] => m.keys.toVector
        case other => throw JinjaError(s"keys on non-mapping: $other")
      }
      case "values" => value match {
        case m: Map[_, _] => m.values.toVector
        case other => throw JinjaError(s"values on non-mapping: $other")
      }
      case "tojson" => Json.write(value)
      case "fromjson" => Json.parse(keyOf(value))
      case "urlencode" => value match {
        // maps render as a query string, skipping none/undefined values
        // (filters.rs:1300-1330)
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].toSeq
          .filter { case (_, v) => v != null && !v.isInstanceOf[Undefined] }
          .map { case (k, v) => s"${pctEncode(k)}=${pctEncode(keyOf(v))}" }
          .mkString("&")
        case _ => pctEncode(keyOf(value))
      }
      case "format" => keyOf(value).format(args: _*)
      case "safe" => value // no auto-escaping in this engine: identity
      case "dictsort" => value match {
        // map → sorted [key, value] pairs; Jinja signature is
        // dictsort(case_sensitive=false, by='key', reverse=false), so
        // positional 0 is case_sensitive and positional 1 is by
        // (filters.rs:444-480); numeric values sort numerically, matching
        // minijinja's typed value ordering (10 after 2, not before)
        case m: Map[_, _] =>
          val caseSensitive = Jinja.truthy(kwargs.getOrElse("case_sensitive",
            args.headOption.getOrElse(false)))
          val byValue = kwargs.get("by").map(keyOf)
            .orElse(args.lift(1).map(keyOf)).contains("value")
          val rev = Jinja.truthy(kwargs.getOrElse("reverse", false))
          def toNum(v: Any): Option[Double] = v match {
            case n: Byte => Some(n.toDouble)
            case n: Short => Some(n.toDouble)
            case n: Int => Some(n.toDouble)
            case n: Long => Some(n.toDouble)
            case n: Float => Some(n.toDouble)
            case n: Double => Some(n)
            case n: BigDecimal => Some(n.toDouble)
            case n: java.math.BigDecimal => Some(n.doubleValue)
            case _ => None
          }
          // type-rank first (numbers before strings, minijinja's kind
          // ordering) so the comparator stays transitive on mixed values —
          // comparing 2 vs "10" numerically-sometimes breaks TimSort
          def cmpVals(a: Any, b: Any): Int = (toNum(a), toNum(b)) match {
            case (Some(x), Some(y)) => java.lang.Double.compare(x, y)
            case (Some(_), None) => -1
            case (None, Some(_)) => 1
            case (None, None) =>
              val (s, t) = (keyOf(a), keyOf(b))
              if (caseSensitive) s.compareTo(t) else s.compareToIgnoreCase(t)
          }
          val sorted = m.asInstanceOf[Map[String, Any]].toVector
            .sortWith { case ((ka, va), (kb, vb)) =>
              cmpVals(if (byValue) va else ka, if (byValue) vb else kb) < 0 }
            .map { case (k, v) => Vector[Any](k, v) }
          if (rev) sorted.reverse else sorted
        case other => throw JinjaError(s"dictsort on non-mapping: $other")
      }
      case "lines" => keyOf(value).linesIterator.toVector
      case "attr" => Jinja.attr(value, keyOf(args.head))
      case "bool" => Jinja.truthy(value)
      case "pprint" => keyOf(value)
      case "is_list" => value.isInstanceOf[Seq[_]]
      case "escape" | "e" => keyOf(value)
        .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      case "md5" => Json.md5(keyOf(value))
      case "as_bool" => Jinja.truthy(value)
      case "as_number" => numKey(value) match {
        case d if d == d.floor => d.toLong
        case d => d
      }
      case "as_text" => keyOf(value)
      case "as_native" => value
      case other => throw JinjaError(s"unknown filter: $other")
    }

  /** minijinja's urlencode set: every non-alphanumeric byte percent-encodes
    * except `/ . - _` — space is %20, NOT `+` (filters.rs:1300-1306). */
  private def pctEncode(s: String): String =
    s.getBytes("UTF-8").flatMap { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit && c < 128 || "/._-".contains(c)) c.toString
      else f"%%${b & 0xff}%02X"
    }.mkString

  private def numKey(v: Any): Double = v match {
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case d: Double => d
    case s: String => s.trim.toDouble
    case b: Boolean => if (b) 1.0 else 0.0
    case other => throw JinjaError(s"not numeric: $other")
  }

  private def compareAny(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) => x.compareTo(y)
    case _ => java.lang.Double.compare(numKey(a), numKey(b))
  }
}

/** `is` tests (reference defaults.rs:122-178 subset). */
object Tests {
  def apply(name: String, value: Any, args: Seq[Any]): Boolean = name match {
    case "defined" => !value.isInstanceOf[Jinja.Undefined]
    case "undefined" => value.isInstanceOf[Jinja.Undefined]
    case "none" => value == null
    case "string" => value.isInstanceOf[String]
    case "number" => value.isInstanceOf[Long] || value.isInstanceOf[Double] ||
      value.isInstanceOf[Int]
    case "boolean" => value.isInstanceOf[Boolean]
    case "mapping" => value.isInstanceOf[Map[_, _]]
    case "sequence" | "iterable" =>
      value.isInstanceOf[Seq[_]] || value.isInstanceOf[String] ||
        value.isInstanceOf[Map[_, _]]
    case "callable" => value.isInstanceOf[Jinja.JFunc]
    case "true" => value == true
    case "false" => value == false
    case "odd" => value match { case l: Long => l % 2 != 0; case _ => false }
    case "even" => value match { case l: Long => l % 2 == 0; case _ => false }
    case "divisibleby" => value match {
      case l: Long => l % args.head.asInstanceOf[Long] == 0
      case _ => false
    }
    case "equalto" | "eq" | "sameas" => value == args.head
    case "ne" => value != args.head
    case "gt" | "greaterthan" => cmpNum(value, args.head) > 0
    case "lt" | "lessthan" => cmpNum(value, args.head) < 0
    case "ge" => cmpNum(value, args.head) >= 0
    case "le" => cmpNum(value, args.head) <= 0
    case "integer" | "int" => value.isInstanceOf[Long] || value.isInstanceOf[Int]
    case "float" => value.isInstanceOf[Double]
    case "startingwith" =>
      Jinja.stringify(value).startsWith(Jinja.stringify(args.head))
    case "endingwith" =>
      Jinja.stringify(value).endsWith(Jinja.stringify(args.head))
    case "lower" => { val s = Jinja.stringify(value); s == s.toLowerCase }
    case "upper" => { val s = Jinja.stringify(value); s == s.toUpperCase }
    case "in" => args.head match {
      case s: Seq[_] => s.contains(value)
      case s: String => s.contains(Jinja.stringify(value))
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].contains(Jinja.stringify(value))
      case _ => false
    }
    case other => throw Jinja.JinjaError(s"unknown test: $other")
  }

  private def cmpNum(a: Any, b: Any): Int = {
    def num(v: Any) = Filters.apply("float", v, Nil, Map.empty).asInstanceOf[Double]
    (a, b) match {
      case (x: String, y: String) => x.compareTo(y)
      case _ => java.lang.Double.compare(num(a), num(b))
    }
  }
}

/** Minimal JSON + md5 helpers for filters and context functions (the
  * reference exposes tojson/fromjson/local_md5,
  * crates/dbt-jinja-utils/src/functions/base.rs). */
object Json {
  def write(v: Any): String = v match {
    case null | None | _: Jinja.Undefined => "null"
    case b: Boolean => b.toString
    case l: Long => l.toString
    case i: Int => i.toString
    case d: Double => if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
    case s: String => quote(s)
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      .map { case (k, x) => s"${quote(k)}: ${write(x)}" }.mkString("{", ", ", "}")
    case s: Seq[_] => s.map(write).mkString("[", ", ", "]")
    case other => quote(other.toString)
  }

  def quote(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Tiny JSON reader for fromjson (config values, fixture rows). */
  def parse(s: String): Any = new JsonReader(s).parseValue()

  private final class JsonReader(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def parseValue(): Any = {
      ws()
      s.charAt(i) match {
        case '{' =>
          i += 1; ws()
          val m = Map.newBuilder[String, Any]
          if (s.charAt(i) == '}') { i += 1 }
          else {
            var more = true
            while (more) {
              ws()
              val k = parseString()
              ws(); require(s.charAt(i) == ':'); i += 1
              m += k -> parseValue()
              ws()
              if (s.charAt(i) == ',') { i += 1 } else { require(s.charAt(i) == '}'); i += 1; more = false }
            }
          }
          m.result()
        case '[' =>
          i += 1; ws()
          val b = Vector.newBuilder[Any]
          if (s.charAt(i) == ']') { i += 1 }
          else {
            var more = true
            while (more) {
              b += parseValue()
              ws()
              if (s.charAt(i) == ',') { i += 1 } else { require(s.charAt(i) == ']'); i += 1; more = false }
            }
          }
          b.result()
        case '"' => parseString()
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case 'n' => i += 4; null
        case _ =>
          val start = i
          while (i < s.length && "-+.eE0123456789".indexOf(s.charAt(i)) >= 0) i += 1
          val t = s.substring(start, i)
          if (t.matches("-?\\d+")) t.toLong else t.toDouble
      }
    }
    private def parseString(): String = {
      require(s.charAt(i) == '"'); i += 1
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') {
          i += 1
          sb += (s.charAt(i) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case 'u' =>
              val code = Integer.parseInt(s.substring(i + 1, i + 5), 16)
              i += 4
              code.toChar
            case other => other
          })
        } else sb += s.charAt(i)
        i += 1
      }
      i += 1
      sb.toString
    }
  }
}
