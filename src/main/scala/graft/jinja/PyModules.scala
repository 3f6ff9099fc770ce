package graft.jinja

import java.time._
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.time.temporal.ChronoField

/** Python-stdlib-shaped `modules.*` for templates (reference:
  * minijinja-contrib/src/modules/{py_datetime,pytz.rs,re.rs} — dbt exposes
  * modules.datetime / modules.pytz / modules.re in every Jinja phase).
  * This is a Scala re-expression of the same PYTHON surface, scoped to
  * what real dbt macros use: datetime/date/timedelta construction,
  * now/today/strptime/strftime/isoformat, timedelta arithmetic and
  * comparisons (wired through the interpreter's binop/cmp), and
  * re.match/search/sub/findall/split/escape/compile with named-group
  * translation. Datetimes are naive-at-UTC with millisecond precision —
  * pytz.utc / pytz.timezone() are accepted and resolve to zone tags so
  * `datetime.now(modules.pytz.utc)` style calls work. */
object PyModules {
  import Jinja.{JFunc, JObject, JCallable, JinjaError}

  // ---- strftime/strptime: Python directives → DateTimeFormatter --------
  private val directiveMap: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
    'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss",
    'f' -> "SSSSSS", 'j' -> "DDD", 'a' -> "EEE", 'A' -> "EEEE",
    'b' -> "MMM", 'B' -> "MMMM", 'p' -> "a",
    // python renders %z/%Z as EMPTY on naive datetimes — this engine's
    // datetimes are all naive-at-UTC
    'z' -> "", 'Z' -> "")

  /** Translate a Python format string, quoting every literal run so
    * pattern letters in literals (e.g. the T in ISO stamps) stay text.
    * %V/%u/%G append ISO fields DIRECTLY (IsoFields.WEEK_OF_WEEK_BASED_
    * YEAR / WEEK_BASED_YEAR, ChronoField.DAY_OF_WEEK) — Java's ww/e/YYYY
    * pattern letters are locale week fields (Sunday-start under
    * Locale.US), which diverge from Python's ISO semantics by one
    * week/day near year and week boundaries. */
  private[jinja] def buildFormatter(pyFmt: String): DateTimeFormatterBuilder = {
    val b = new DateTimeFormatterBuilder()
    val lit = new StringBuilder
    def flush(): Unit = if (lit.nonEmpty) {
      b.appendLiteral(lit.toString)
      lit.clear()
    }
    var i = 0
    while (i < pyFmt.length) {
      val c = pyFmt.charAt(i)
      if (c == '%' && i + 1 < pyFmt.length) {
        val d = pyFmt.charAt(i + 1)
        if (d == '%') { lit.append('%'); i += 2 }
        else d match {
          case 'V' =>
            flush()
            b.appendValue(java.time.temporal.IsoFields.WEEK_OF_WEEK_BASED_YEAR, 2)
            i += 2
          case 'G' =>
            flush()
            b.appendValue(java.time.temporal.IsoFields.WEEK_BASED_YEAR, 4)
            i += 2
          case 'u' =>
            flush()
            b.appendValue(ChronoField.DAY_OF_WEEK, 1)
            i += 2
          case _ => directiveMap.get(d) match {
            case Some(p) => flush(); if (p.nonEmpty) b.appendPattern(p); i += 2
            case None => throw JinjaError(
              s"strftime: unsupported directive %$d in '$pyFmt'")
          }
        }
      } else { lit.append(c); i += 1 }
    }
    flush()
    b
  }

  private def formatter(pyFmt: String): DateTimeFormatter =
    buildFormatter(pyFmt)
      .parseDefaulting(ChronoField.HOUR_OF_DAY, 0)
      .parseDefaulting(ChronoField.MINUTE_OF_HOUR, 0)
      .parseDefaulting(ChronoField.SECOND_OF_MINUTE, 0)
      .toFormatter(java.util.Locale.US)

  // ---- values ----------------------------------------------------------

  /** Naive datetime at UTC, ms precision (py_datetime/datetime.rs).
    * `dateOnly` marks values built by date()/date.today() so str() and
    * isoformat() render the Python date shape. */
  final case class PyDateTime(epochMs: Long, dateOnly: Boolean = false)
      extends JObject {
    private[jinja] def ldt: LocalDateTime =
      LocalDateTime.ofInstant(Instant.ofEpochMilli(epochMs), ZoneOffset.UTC)
    def attr(name: String): Option[Any] = name match {
      case "year" => Some(ldt.getYear.toLong)
      case "month" => Some(ldt.getMonthValue.toLong)
      case "day" => Some(ldt.getDayOfMonth.toLong)
      case "hour" => Some(ldt.getHour.toLong)
      case "minute" => Some(ldt.getMinute.toLong)
      case "second" => Some(ldt.getSecond.toLong)
      case "microsecond" => Some(ldt.getNano.toLong / 1000L)
      case "strftime" => Some(JFunc((a, _) =>
        formatter(a.head.toString).format(ldt)))
      case "isoformat" => Some(JFunc((_, _) =>
        if (dateOnly) ldt.toLocalDate.toString
        else ldt.format(DateTimeFormatter.ISO_LOCAL_DATE_TIME)))
      case "date" => Some(JFunc((_, _) =>
        PyDateTime(ldt.toLocalDate.atStartOfDay.toInstant(ZoneOffset.UTC)
          .toEpochMilli, dateOnly = true)))
      case "weekday" => Some(JFunc((_, _) =>
        (ldt.getDayOfWeek.getValue - 1).toLong)) // Monday = 0
      case "isoweekday" => Some(JFunc((_, _) =>
        ldt.getDayOfWeek.getValue.toLong)) // Monday = 1
      case "timestamp" => Some(JFunc((_, _) => epochMs.toDouble / 1000.0))
      case "replace" => Some(JFunc { (_, kw) =>
        var t = ldt
        kw.foreach {
          case ("year", v) => t = t.withYear(asInt(v))
          case ("month", v) => t = t.withMonth(asInt(v))
          case ("day", v) => t = t.withDayOfMonth(asInt(v))
          case ("hour", v) => t = t.withHour(asInt(v))
          case ("minute", v) => t = t.withMinute(asInt(v))
          case ("second", v) => t = t.withSecond(asInt(v))
          case ("microsecond", v) => t = t.withNano(asInt(v) * 1000)
          case ("tzinfo", _) => // naive engine: accepted, ignored
          case (k, _) => throw JinjaError(s"datetime.replace: unknown field $k")
        }
        PyDateTime(t.toInstant(ZoneOffset.UTC).toEpochMilli, dateOnly)
      })
      case _ => None
    }
    override def toString: String =
      if (dateOnly) ldt.toLocalDate.toString
      else {
        val base = ldt.format(DateTimeFormatter
          .ofPattern("yyyy-MM-dd HH:mm:ss"))
        if (ldt.getNano == 0) base
        else f"$base.${ldt.getNano / 1000}%06d"
      }
  }

  /** Python timedelta, ms precision (py_datetime/timedelta.rs). */
  final case class PyTimeDelta(ms: Long) extends JObject {
    def attr(name: String): Option[Any] = name match {
      case "days" => Some(Math.floorDiv(ms, 86400000L))
      case "seconds" => Some(Math.floorMod(ms, 86400000L) / 1000L)
      case "microseconds" => Some(Math.floorMod(ms, 1000L) * 1000L)
      case "total_seconds" => Some(JFunc((_, _) => ms.toDouble / 1000.0))
      case _ => None
    }
    override def toString: String = {
      val d = Math.floorDiv(ms, 86400000L)
      val rest = Math.floorMod(ms, 86400000L)
      val h = rest / 3600000L; val m = rest % 3600000L / 60000L
      val s = rest % 60000L / 1000L; val us = rest % 1000L * 1000L
      val frac = if (us == 0) "" else f".$us%06d"
      val hms = f"$h%d:$m%02d:$s%02d$frac"
      if (d == 0) hms
      else s"$d day${if (d == 1 || d == -1) "" else "s"}, $hms"
    }
  }

  /** A pytz-style zone tag (pytz.rs) — carried for API compatibility;
    * datetimes stay naive-at-UTC. */
  final case class PyTz(zone: String) extends JObject {
    def attr(name: String): Option[Any] = name match {
      case "zone" => Some(zone)
      case _ => None
    }
    override def toString: String = zone
  }

  private def asInt(v: Any): Int = v match {
    case l: Long => l.toInt
    case i: Int => i
    case d: Double => d.toInt
    case s: String => s.toInt
    case other => throw JinjaError(s"expected an integer, got $other")
  }
  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case d: Double => d.toLong
    case s: String => s.toLong
    case other => throw JinjaError(s"expected an integer, got $other")
  }

  // ---- class objects ---------------------------------------------------

  private object DatetimeClass extends JObject with JCallable {
    def attr(name: String): Option[Any] = name match {
      case "now" | "utcnow" => Some(JFunc((_, _) =>
        PyDateTime(System.currentTimeMillis()))) // tz arg accepted, naive UTC
      case "today" => Some(JFunc((_, _) =>
        PyDateTime(System.currentTimeMillis())))
      case "strptime" => Some(JFunc { (a, _) =>
        val (s, fmt) = (a.head.toString, a(1).toString)
        val parsed = formatter(fmt).parse(s)
        val date = LocalDate.of(
          // python strptime defaults the year to 1900
          if (parsed.isSupported(ChronoField.YEAR))
            parsed.get(ChronoField.YEAR) else 1900,
          if (parsed.isSupported(ChronoField.MONTH_OF_YEAR))
            parsed.get(ChronoField.MONTH_OF_YEAR) else 1,
          if (parsed.isSupported(ChronoField.DAY_OF_MONTH))
            parsed.get(ChronoField.DAY_OF_MONTH) else 1)
        val ldt = date.atTime(
          parsed.get(ChronoField.HOUR_OF_DAY),
          parsed.get(ChronoField.MINUTE_OF_HOUR),
          parsed.get(ChronoField.SECOND_OF_MINUTE),
          if (parsed.isSupported(ChronoField.NANO_OF_SECOND))
            parsed.get(ChronoField.NANO_OF_SECOND) else 0)
        PyDateTime(ldt.toInstant(ZoneOffset.UTC).toEpochMilli)
      })
      case "fromtimestamp" | "utcfromtimestamp" => Some(JFunc { (a, _) =>
        val secs = a.head match {
          case d: Double => d
          case other => asLong(other).toDouble
        }
        PyDateTime((secs * 1000.0).round)
      })
      case "fromisoformat" => Some(JFunc { (a, _) =>
        val s = a.head.toString
        val ldt =
          if (s.length <= 10) LocalDate.parse(s).atStartOfDay
          else LocalDateTime.parse(s.replace(' ', 'T'))
        PyDateTime(ldt.toInstant(ZoneOffset.UTC).toEpochMilli)
      })
      case "min" => Some(PyDateTime(
        LocalDateTime.of(1, 1, 1, 0, 0).toInstant(ZoneOffset.UTC).toEpochMilli))
      case "max" => Some(PyDateTime(
        LocalDateTime.of(9999, 12, 31, 23, 59, 59)
          .toInstant(ZoneOffset.UTC).toEpochMilli))
      case _ => None
    }
    def invoke(args: Seq[Any], kwargs: Map[String, Any]): Any = {
      def arg(i: Int, k: String, dflt: Int = 0): Int =
        if (args.length > i) asInt(args(i))
        else kwargs.get(k).map(asInt).getOrElse(dflt)
      val ldt = LocalDateTime.of(
        arg(0, "year"), arg(1, "month", 1), arg(2, "day", 1),
        arg(3, "hour"), arg(4, "minute"), arg(5, "second"),
        arg(6, "microsecond") * 1000)
      PyDateTime(ldt.toInstant(ZoneOffset.UTC).toEpochMilli)
    }
  }

  private object DateClass extends JObject with JCallable {
    def attr(name: String): Option[Any] = name match {
      case "today" => Some(JFunc((_, _) =>
        PyDateTime(LocalDate.now(ZoneOffset.UTC).atStartOfDay
          .toInstant(ZoneOffset.UTC).toEpochMilli, dateOnly = true)))
      case "fromisoformat" => Some(JFunc((a, _) =>
        PyDateTime(LocalDate.parse(a.head.toString).atStartOfDay
          .toInstant(ZoneOffset.UTC).toEpochMilli, dateOnly = true)))
      case _ => None
    }
    def invoke(args: Seq[Any], kwargs: Map[String, Any]): Any = {
      def arg(i: Int, k: String, dflt: Int = 1): Int =
        if (args.length > i) asInt(args(i))
        else kwargs.get(k).map(asInt).getOrElse(dflt)
      PyDateTime(LocalDate.of(arg(0, "year"), arg(1, "month"), arg(2, "day"))
        .atStartOfDay.toInstant(ZoneOffset.UTC).toEpochMilli, dateOnly = true)
    }
  }

  private object TimedeltaClass extends JObject with JCallable {
    def attr(name: String): Option[Any] = None
    def invoke(args: Seq[Any], kwargs: Map[String, Any]): Any = {
      def num(v: Any): Double = v match {
        case d: Double => d
        case other => asLong(other).toDouble
      }
      def arg(i: Int, k: String): Double =
        if (args.length > i) num(args(i))
        else kwargs.get(k).map(num).getOrElse(0.0)
      val ms = arg(0, "days") * 86400000.0 + arg(1, "seconds") * 1000.0 +
        arg(2, "microseconds") / 1000.0 + arg(3, "milliseconds") +
        arg(4, "minutes") * 60000.0 + arg(5, "hours") * 3600000.0 +
        arg(6, "weeks") * 604800000.0
      PyTimeDelta(ms.round)
    }
  }

  // ---- re --------------------------------------------------------------

  /** Python regex → Java: named groups (?P<x>…) / backrefs (?P=x). The
    * rest of the common vocabulary (classes, anchors, quantifiers,
    * lookarounds) already agrees. */
  private[jinja] def javaRegex(py: String): String = py
    .replaceAll("\\(\\?P<([A-Za-z][A-Za-z0-9_]*)>", "(?<$1>")
    .replaceAll("\\(\\?P=([A-Za-z][A-Za-z0-9_]*)\\)", "\\\\k<$1>")

  /** re match object: group()/group(n)/groups()/start()/end(). */
  final class PyMatch(m: java.util.regex.Matcher) extends JObject {
    def attr(name: String): Option[Any] = name match {
      case "group" => Some(JFunc { (a, _) =>
        a.headOption match {
          case None | Some(0L) | Some(0) => m.group()
          case Some(s: String) => m.group(s)
          case Some(n) => m.group(asInt(n))
        }
      })
      case "groups" => Some(JFunc((_, _) =>
        (1 to m.groupCount).map(m.group).toVector))
      case "start" => Some(JFunc((_, _) => m.start().toLong))
      case "end" => Some(JFunc((_, _) => m.end().toLong))
      case _ => None
    }
    override def toString: String = s"<re.Match '${m.group()}'>"
  }

  /** Python re flags → Java (re.I=2, re.M=8, re.S=16 — the common trio). */
  private def javaFlags(pyFlags: Long): Int = {
    var f = 0
    if ((pyFlags & 2L) != 0) f |= java.util.regex.Pattern.CASE_INSENSITIVE
    if ((pyFlags & 8L) != 0) f |= java.util.regex.Pattern.MULTILINE
    if ((pyFlags & 16L) != 0) f |= java.util.regex.Pattern.DOTALL
    f
  }
  private def compile(pattern: String, flags: Any): java.util.regex.Pattern =
    java.util.regex.Pattern.compile(javaRegex(pattern),
      javaFlags(flags match { case null => 0L; case v => asLong(v) }))

  /** A compiled pattern object (re.compile). */
  final class PyPattern(p: java.util.regex.Pattern) extends JObject {
    private def matcher(s: Any) = p.matcher(s.toString)
    def attr(name: String): Option[Any] = name match {
      case "match" => Some(JFunc { (a, _) =>
        val m = matcher(a.head); if (m.lookingAt()) new PyMatch(m) else null })
      case "fullmatch" => Some(JFunc { (a, _) =>
        val m = matcher(a.head); if (m.matches()) new PyMatch(m) else null })
      case "search" => Some(JFunc { (a, _) =>
        val m = matcher(a.head); if (m.find()) new PyMatch(m) else null })
      case "sub" => Some(JFunc((a, _) =>
        matcher(a(1)).replaceAll(
          java.util.regex.Matcher.quoteReplacement(a.head.toString)
            // python \1 backrefs → java $1
            .replaceAll("\\\\\\\\(\\d)", "\\$$1"))))
      case "findall" => Some(JFunc { (a, _) =>
        val m = matcher(a.head)
        val out = Vector.newBuilder[Any]
        while (m.find()) out += (
          if (m.groupCount == 0) m.group()
          else if (m.groupCount == 1) m.group(1)
          else (1 to m.groupCount).map(m.group).toVector)
        out.result()
      })
      case "split" => Some(JFunc((a, _) =>
        p.split(a.head.toString, -1).toVector))
      case _ => None
    }
  }

  private val ReModule: Map[String, Any] = Map(
    "match" -> JFunc { (a, _) =>
      val m = compile(a.head.toString, a.lift(2).orNull).matcher(a(1).toString)
      if (m.lookingAt()) new PyMatch(m) else null
    },
    "fullmatch" -> JFunc { (a, _) =>
      val m = compile(a.head.toString, a.lift(2).orNull).matcher(a(1).toString)
      if (m.matches()) new PyMatch(m) else null
    },
    "search" -> JFunc { (a, _) =>
      val m = compile(a.head.toString, a.lift(2).orNull).matcher(a(1).toString)
      if (m.find()) new PyMatch(m) else null
    },
    // re.sub(pattern, repl, string, count=0, flags=0) — python positions
    "sub" -> JFunc { (a, kw) =>
      val repl = java.util.regex.Matcher.quoteReplacement(a(1).toString)
        .replaceAll("\\\\\\\\(\\d)", "\\$$1")
      val count = a.lift(3).orElse(kw.get("count")).map(asLong).getOrElse(0L)
      val m = compile(a.head.toString,
        a.lift(4).orElse(kw.get("flags")).orNull).matcher(a(2).toString)
      if (count <= 0) m.replaceAll(repl)
      else {
        val sb = new java.lang.StringBuilder
        var done = 0L
        while (done < count && m.find()) { m.appendReplacement(sb, repl); done += 1 }
        m.appendTail(sb).toString
      }
    },
    "findall" -> JFunc { (a, _) =>
      val m = compile(a.head.toString, a.lift(2).orNull).matcher(a(1).toString)
      val out = Vector.newBuilder[Any]
      while (m.find()) out += (
        if (m.groupCount == 0) m.group()
        else if (m.groupCount == 1) m.group(1)
        else (1 to m.groupCount).map(m.group).toVector)
      out.result()
    },
    // re.split(pattern, string, maxsplit=0, flags=0) — python positions:
    // maxsplit=N means at most N splits (N+1 parts)
    "split" -> JFunc { (a, kw) =>
      val maxsplit =
        a.lift(2).orElse(kw.get("maxsplit")).map(asLong).getOrElse(0L)
      compile(a.head.toString, a.lift(3).orElse(kw.get("flags")).orNull)
        .split(a(1).toString,
          if (maxsplit <= 0) -1 else maxsplit.toInt + 1).toVector
    },
    "escape" -> JFunc((a, _) =>
      a.head.toString.replaceAll("([.\\^$*+?{}\\[\\]|()\\\\#&~\\-])", "\\\\$1")),
    "compile" -> JFunc((a, _) =>
      new PyPattern(compile(a.head.toString, a.lift(1).orNull))),
    "I" -> 2L, "IGNORECASE" -> 2L, "M" -> 8L, "MULTILINE" -> 8L,
    "S" -> 16L, "DOTALL" -> 16L)

  private val PytzModule: Map[String, Any] = Map(
    "utc" -> PyTz("UTC"),
    "UTC" -> PyTz("UTC"),
    "timezone" -> JFunc((a, _) => PyTz(a.head.toString)))

  /** The `modules` mapping for the template context. */
  val modules: Map[String, Any] = Map(
    "datetime" -> Map(
      "datetime" -> DatetimeClass,
      "date" -> DateClass,
      "time" -> DatetimeClass, // accepted; naive datetimes carry the time
      "timedelta" -> TimedeltaClass),
    "pytz" -> PytzModule,
    "re" -> ReModule)
}
