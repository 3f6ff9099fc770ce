package graft.sample

import graft.project.Yaml

/** Sampler plans — `--sample` / `dbt sample` dev-time source sampling
  * (reference: crates/dbt-sample/src/plan.rs:13-131 `SamplerPlan` /
  * `Keyset` / `Entry` / `Strategy`).
  *
  * A plan names a set of SOURCE tables (entries), a sampling strategy per
  * entry, and optional keysets: shared key tables that entries semi-join
  * against so the sampled slice stays referentially consistent (sample 5%
  * of customers once, then take exactly THOSE customers' orders and
  * lineitems). `graft sample` materializes each entry into a parallel
  * `<schema><suffix>` namespace; `run --sample <plan>` remaps `source()`
  * calls to the sampled relations (plan.rs:494-516 sample_renaming_map),
  * so the whole DAG runs against the slice with zero model changes — the
  * 100 TB iteration loop becomes a laptop loop.
  *
  * Plan YAML mirrors the reference's serde shape
  * (`#[serde(tag="type", content="args")]` on Strategy, untagged KeyFrom):
  *
  * {{{
  * version: 1
  * name: dev_slice
  * keysets:
  *   cust:
  *     cols: [c_custkey]
  *     from:
  *       root: src.tpch.customer
  *       strategy: {type: hash, args: {by: c_custkey, mod: 100, keep: 5}}
  * entries:
  *   - select: src.tpch.customer
  *     strategy: {type: hash, args: {by: c_custkey, mod: 100, keep: 5}}
  *   - select: src.tpch.orders
  *     strategy: {type: clone}
  *     filters:
  *       - use: cust
  *         on: o_custkey -> c_custkey
  * }}}
  */
object SamplerPlan {

  /** A (schema, identifier) the sampler reads from or writes to —
    * plan.rs:32-36 SamplerRel, minus the database coordinate (Spark has a
    * single catalog namespace). */
  final case class Rel(schema: String, identifier: String) {
    def fqn: String = s"$schema.$identifier"
  }

  /** Sampling strategies — plan.rs:87-125. Every strategy is DETERMINISTIC
    * (md5-derived pseudo-randomness, no RNG state), so a sampled slice is
    * reproducible across runs AND across engines — the DuckDB oracle
    * computes the identical sample. */
  sealed trait Strategy
  object Strategy {
    /** Materialize an identical copy (the default — rewires reads to the
      * sampled namespace without reducing them). */
    case object Clone extends Strategy
    /** Leave the source in place: no copy, no rewire — for tables that are
      * already small (dimension tables) where even a copy is waste. */
    case object Pass extends Strategy
    /** Keep a `frac` fraction of rows, chosen by a seeded hash of the whole
      * row. */
    final case class Random(frac: Double, seed: Long) extends Strategy
    /** Keep `n` rows, deterministically: the n smallest row-hashes (a
      * seeded shuffle prefix, not "whatever arrived first"). */
    final case class Limit(n: Long) extends Strategy
    /** Keep rows inside a time window on column `by`: either the `last`
      * "N days|hours|minutes" relative to the table's max(by), or an
      * explicit [start, end) literal window. */
    final case class Time(by: String, last: Option[String],
        start: Option[String], end: Option[String]) extends Strategy
    /** Keep rows whose seeded hash-bucket of `by` falls in [0, keep) of
      * `mod` buckets — the keyset-friendly strategy: the same (by, mod,
      * keep, seed) always selects the same keys. */
    final case class Hash(by: String, mod: Long, keep: Long, seed: Long)
        extends Strategy
    /** Keep the `nPerGroup` smallest row-hashes per `by` group — every
      * group survives, bounded. */
    final case class Group(by: String, nPerGroup: Long) extends Strategy
    /** Per-stratum keep-fraction on `by`; strata absent from `frac` are
      * dropped (a dev slice lists what it wants). */
    final case class Stratified(by: String, frac: Map[String, Double],
        seed: Long) extends Strategy
    /** Rows route to the FIRST matching predicate; branch i keeps
      * round(total·wᵢ/Σw) rows (smallest row-hashes). Non-matching rows
      * are dropped. */
    final case class Branch(predicates: Seq[String], total: Long,
        weights: Seq[Double]) extends Strategy
  }

  /** Keyset source — plan.rs:48-53 KeyFrom (untagged): either the values
    * of a seed, or a strategy applied to a root source. */
  sealed trait KeyFrom
  object KeyFrom {
    final case class FromSeed(seed: String) extends KeyFrom
    final case class FromRoot(root: String, strategy: Strategy) extends KeyFrom
  }

  /** cols + where the keys come from — plan.rs:39-46. */
  final case class Keyset(cols: Seq[String], from: KeyFrom)

  /** Entry filter — plan.rs:74-85: semi-join the entry against keyset
    * `use`, mapping entry columns to keyset columns; `on` entries are
    * "entry_col -> keyset_col" (bare "col" means col -> col). */
  final case class Filter(use: String, on: Seq[(String, String)])

  /** One sampled source — plan.rs:56-71. `select` is `src.<source>.<table>`
    * (the table part may be `*` to cover every table of the source). */
  final case class Entry(select: String, strategy: Strategy,
      filters: Seq[Filter])

  final case class Plan(version: Int, name: String,
      keysets: Map[String, Keyset], entries: Seq[Entry])

  // ---- parsing ----------------------------------------------------------

  /** Parse + validate a plan from YAML (or JSON — a JSON document is valid
    * YAML). `defaultName` stands in for a missing `name:` (the reference
    * uses the file stem, plan.rs:221-237). */
  def parse(text: String, defaultName: String = "DEFAULT"): Plan = {
    val m = Yaml.parseMap(text)
    val version = Yaml.dig(m, "version").map(Yaml.str(_).toInt).getOrElse(1)
    val name = Yaml.dig(m, "name").map(Yaml.str).filter(_.trim.nonEmpty)
      .getOrElse(defaultName)
    val keysets: Map[String, Keyset] = Yaml.dig(m, "keysets") match {
      case Some(km: Map[_, _]) =>
        km.asInstanceOf[Map[String, Any]].map { case (k, v) =>
          k -> parseKeyset(k, v)
        }
      case _ => Map.empty
    }
    val entries: Seq[Entry] = Yaml.dig(m, "entries") match {
      case Some(es: Seq[_]) => es.zipWithIndex.map {
        case (e: Map[_, _], idx) => parseEntry(e.asInstanceOf[Map[String, Any]], idx)
        case (other, idx) => fail(s"entries[$idx]: expected mapping, got $other")
      }
      case _ => Nil
    }
    val plan = Plan(version, name, keysets, entries)
    validate(plan)
    plan
  }

  def parseFile(path: String): Plan = {
    val p = java.nio.file.Paths.get(path)
    val stem = p.getFileName.toString.replaceAll("\\.[^.]+$", "")
    parse(java.nio.file.Files.readString(p),
      if (stem.nonEmpty) stem else "DEFAULT")
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"invalid sample plan: $msg")

  private def parseKeyset(name: String, v: Any): Keyset = v match {
    case km: Map[_, _] =>
      val k = km.asInstanceOf[Map[String, Any]]
      val cols = Yaml.dig(k, "cols").map(Yaml.strSeq).getOrElse(Nil)
      val from = Yaml.dig(k, "from") match {
        case Some(f: Map[_, _]) =>
          val fm = f.asInstanceOf[Map[String, Any]]
          (fm.get("seed"), fm.get("root")) match {
            case (Some(s), None) => KeyFrom.FromSeed(Yaml.str(s))
            case (None, Some(r)) => KeyFrom.FromRoot(Yaml.str(r),
              parseStrategy(fm.getOrElse("strategy",
                fail(s"keysets.$name.from.root requires a strategy")),
                s"keysets.$name"))
            case _ => fail(s"keysets.$name.from must be {seed: …} or " +
              "{root: …, strategy: …}")
          }
        case _ => fail(s"keysets.$name requires 'from'")
      }
      Keyset(cols, from)
    case other => fail(s"keysets.$name: expected mapping, got $other")
  }

  private def parseEntry(e: Map[String, Any], idx: Int): Entry = {
    val select = e.get("select").orElse(e.get("name")).map(Yaml.str)
      .filter(_.trim.nonEmpty)
      .getOrElse(fail(s"entries[$idx] must specify 'select'"))
    val strategy = e.get("strategy").map(parseStrategy(_, s"entries[$idx]"))
      .getOrElse(Strategy.Clone)
    val filters = e.get("filters") match {
      case Some(fs: Seq[_]) => fs.zipWithIndex.map {
        case (f: Map[_, _], fidx) =>
          val fm = f.asInstanceOf[Map[String, Any]]
          val use = fm.get("use").map(Yaml.str)
            .getOrElse(fail(s"entries[$idx].filters[$fidx] requires 'use'"))
          // YAML 1.1 (snakeyaml) resolves a bare `on` key to boolean true,
          // which our dynamic map stringifies as "true" — accept both
          val on = fm.get("on").orElse(fm.get("true")) match {
            case Some(s: Seq[_]) => s.map(x => parseMapping(Yaml.str(x)))
            case Some(one) => Seq(parseMapping(Yaml.str(one)))
            case None =>
              fail(s"entries[$idx].filters[$fidx] requires 'on'")
          }
          Filter(use, on)
        case (other, fidx) =>
          fail(s"entries[$idx].filters[$fidx]: expected mapping, got $other")
      }
      case _ => Nil
    }
    Entry(select, strategy, filters)
  }

  /** "a -> b" maps entry column a to keyset column b; bare "a" = a -> a
    * (plan.rs:457-483 normalize_mapping). */
  private def parseMapping(s: String): (String, String) = {
    val t = s.trim
    if (t.isEmpty) fail("empty mapping entry in 'on'")
    t.split("->") match {
      case Array(a, b) => (a.trim, b.trim)
      case Array(a) => (a.trim, a.trim)
      case _ => fail(s"bad mapping '$s' (expected 'entry_col -> keyset_col')")
    }
  }

  private def parseStrategy(v: Any, where: String): Strategy = v match {
    case sm: Map[_, _] =>
      val m = sm.asInstanceOf[Map[String, Any]]
      val typ = m.get("type").map(Yaml.str)
        .getOrElse(fail(s"$where.strategy requires 'type'"))
      val args = m.get("args") match {
        case Some(a: Map[_, _]) => a.asInstanceOf[Map[String, Any]]
        case _ => Map.empty[String, Any]
      }
      def str(k: String): String = args.get(k).map(Yaml.str)
        .getOrElse(fail(s"$where.strategy.$typ requires args.$k"))
      def optStr(k: String): Option[String] =
        args.get(k).filter(_ != null).map(Yaml.str)
      def num(k: String, dflt: Long = Long.MinValue): Long =
        args.get(k).map(Yaml.str(_).toLong)
          .getOrElse(if (dflt != Long.MinValue) dflt
            else fail(s"$where.strategy.$typ requires args.$k"))
      typ match {
        case "clone" => Strategy.Clone
        case "pass" => Strategy.Pass
        case "random" => Strategy.Random(
          args.get("frac").map(Yaml.str(_).toDouble)
            .getOrElse(fail(s"$where.strategy.random requires args.frac")),
          num("seed", 0L))
        case "limit" => Strategy.Limit(num("n"))
        case "time" => Strategy.Time(str("by"), optStr("last"),
          optStr("start"), optStr("end"))
        case "hash" => Strategy.Hash(str("by"), num("mod"), num("keep"),
          num("seed", 0L))
        case "group" => Strategy.Group(str("by"), num("n_per_group"))
        case "stratified" => Strategy.Stratified(str("by"),
          args.get("frac") match {
            case Some(fm: Map[_, _]) => fm.asInstanceOf[Map[String, Any]]
              .map { case (k, x) => k -> Yaml.str(x).toDouble }
            case _ => Map.empty
          }, num("seed", 0L))
        case "branch" => Strategy.Branch(
          args.get("predicates").map(Yaml.strSeq).getOrElse(Nil),
          Yaml.dig(args, "alloc", "total").map(Yaml.str(_).toLong)
            .getOrElse(fail(s"$where.strategy.branch requires alloc.total")),
          Yaml.dig(args, "alloc", "weights").map(Yaml.strSeq(_)
            .map(_.toDouble)).getOrElse(Nil))
        case other => fail(s"$where.strategy: unknown type '$other'")
      }
    case other => fail(s"$where.strategy: expected mapping, got $other")
  }

  // ---- validation (plan.rs:239-455) -------------------------------------

  private def validate(plan: Plan): Unit = {
    plan.keysets.foreach { case (k, ks) =>
      if (ks.cols.isEmpty)
        fail(s"keyset '$k' must specify at least one column in 'cols'")
      ks.from match {
        case KeyFrom.FromRoot(root, s) =>
          validateSelect(root, s"keysets.$k.from.root")
          validateStrategy(s, s"keys.$k")
        case _ => ()
      }
    }
    plan.entries.zipWithIndex.foreach { case (e, idx) =>
      validateSelect(e.select, s"entries[$idx].select")
      validateStrategy(e.strategy, s"entries[$idx]")
      e.filters.zipWithIndex.foreach { case (f, fidx) =>
        if (!plan.keysets.contains(f.use))
          fail(s"entries[$idx].filters[$fidx].use references unknown key " +
            s"'${f.use}': defined keys are ${plan.keysets.keys.toSeq.sorted.mkString(", ")}")
        if (f.on.isEmpty)
          fail(s"entries[$idx].filters[$fidx].on must contain at least one mapping")
      }
    }
  }

  private def validateSelect(sel: String, where: String): Unit =
    if (!sel.startsWith("src.") || sel.split("\\.").length != 3)
      fail(s"$where must be 'src.<source>.<table>' (got '$sel')")

  private def validateStrategy(s: Strategy, where: String): Unit = s match {
    case Strategy.Clone | Strategy.Pass => ()
    case Strategy.Random(frac, _) =>
      if (!(frac > 0.0 && frac <= 1.0))
        fail(s"$where.strategy.random.frac must have 0 < frac <= 1")
    case Strategy.Limit(n) =>
      if (n <= 0) fail(s"$where.strategy.limit.n must be > 0")
    case Strategy.Time(by, last, start, end) =>
      if (by.trim.isEmpty) fail(s"$where.strategy.time.by must be non-empty")
      if (last.isEmpty && (start.isEmpty || end.isEmpty))
        fail(s"$where.strategy.time must specify either 'last' or both " +
          "'start' and 'end'")
    case Strategy.Hash(by, mod, keep, _) =>
      if (by.trim.isEmpty) fail(s"$where.strategy.hash.by must be non-empty")
      if (mod <= 0 || keep <= 0 || keep > mod)
        fail(s"$where.strategy.hash must satisfy 0 < keep <= mod and mod > 0")
    case Strategy.Group(by, n) =>
      if (by.trim.isEmpty) fail(s"$where.strategy.group.by must be non-empty")
      if (n <= 0) fail(s"$where.strategy.group.n_per_group must be > 0")
    case Strategy.Stratified(by, frac, _) =>
      if (by.trim.isEmpty)
        fail(s"$where.strategy.stratified.by must be non-empty")
      if (frac.isEmpty)
        fail(s"$where.strategy.stratified.frac must contain at least one group")
      if (frac.values.exists(v => !(v > 0.0 && v <= 1.0)))
        fail(s"$where.strategy.stratified.frac entries must satisfy 0 < frac <= 1")
    case Strategy.Branch(preds, total, weights) =>
      if (preds.isEmpty)
        fail(s"$where.strategy.branch.predicates must have at least one predicate")
      if (weights.isEmpty)
        fail(s"$where.strategy.branch.alloc.weights must have at least one weight")
      if (weights.sum <= 0.0)
        fail(s"$where.strategy.branch.alloc.weights must sum to > 0")
      if (weights.length != preds.length)
        fail(s"$where.strategy.branch needs one weight per predicate")
      if (total <= 0) fail(s"$where.strategy.branch.alloc.total must be > 0")
  }
}
