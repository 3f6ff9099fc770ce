package graft.sample

import graft.core.{Relation, RelationType}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spark-side execution of [[SamplerPlan]] strategies.
  *
  * Scale + determinism design:
  *   - Every strategy is a MAP-SIDE filter or a bounded top-n — no strategy
  *     shuffles the full table except `group`/`branch` (one hash shuffle on
  *     the group key) and `limit` (TakeOrderedAndProject: per-partition
  *     top-n, then n rows to the driver — never a global sort).
  *   - Pseudo-randomness is md5-derived from row content + seed, never an
  *     RNG: the same plan over the same data yields the SAME sample on any
  *     engine (the DuckDB oracle reproduces it bit-for-bit), across runs,
  *     partitionings, and cluster sizes. `df.sample()` guarantees none of
  *     that — Spark's sample is seed-stable only for a fixed partitioning.
  *   - Keyset filters are broadcast semi-joins: the keyset is small by
  *     construction (it IS the sample), so entry tables never shuffle for
  *     referential consistency — the 100 TB fact table gets a map-side
  *     semi-join against a broadcast keyset.
  */
object Sampler {
  import SamplerPlan._

  /** Hex md5 of the whole row + seed: the deterministic "random" sort/
    * filter key. concat_ws skips NULLs identically in Spark and DuckDB;
    *  keeps adjacent columns from gluing into false collisions. */
  private[graft] def rowHash(cols: Seq[String], seed: Long): Column =
    md5(concat_ws("",
      cols.map(c => col(s"`$c`").cast("string")) :+ lit(s"#$seed"): _*))

  /** Uniform bucket in [0, mod) from a seeded key hash — 12 hex chars
    * (48 bits) so the conv() stays exact in a signed long, mirroring
    * `('0x' || substr(md5(k || '#seed'), 1, 12))::BIGINT % mod` in DuckDB. */
  private[graft] def hashBucket(key: Column, mod: Long, seed: Long): Column =
    pmod(conv(substring(md5(concat(key.cast("string"), lit(s"#$seed"))), 1, 12),
      16, 10).cast("long"), lit(mod))

  private val FRAC_MOD = 1000000L

  /** "3 days" / "12 hours" / "45 minutes" → (n, unit). */
  private def parseLast(s: String): (Long, String) =
    raw"(\d+)\s*(day|hour|minute)s?".r.findFirstMatchIn(s.trim.toLowerCase) match {
      case Some(m) => (m.group(1).toLong, m.group(2).toUpperCase)
      case None => throw new IllegalArgumentException(
        s"bad time.last '$s' (expected 'N days|hours|minutes')")
    }

  /** Apply one strategy. Clone and Pass are identity here — their meaning
    * (copy vs leave-in-place) lives at the plan level. */
  def apply(df: DataFrame, s: Strategy): DataFrame = s match {
    case Strategy.Clone | Strategy.Pass => df

    case Strategy.Random(frac, seed) =>
      df.filter(pmod(conv(substring(rowHash(df.columns, seed), 1, 12), 16, 10)
        .cast("long"), lit(FRAC_MOD)) < math.round(frac * FRAC_MOD))

    case Strategy.Limit(n) =>
      require(n <= Int.MaxValue, s"limit.n too large: $n")
      // orderBy+limit compiles to TakeOrderedAndProject: each partition
      // keeps its top-n, the driver merges — no global sort at scale
      df.withColumn("__rh", rowHash(df.columns, 0L))
        .orderBy(col("__rh")).limit(n.toInt).drop("__rh")

    case Strategy.Time(by, last, start, end) =>
      val byType = df.schema(by).dataType
      last match {
        case Some(l) =>
          val (n, unit) = parseLast(l)
          // window anchored at the table's max(by): one single-row agg,
          // broadcast back — the filter itself stays map-side
          df.crossJoin(broadcast(df.agg(max(col(by)).as("__max_by"))))
            .filter(col(by) >= col("__max_by") - expr(s"INTERVAL $n $unit"))
            .drop("__max_by")
        case None =>
          // explicit [start, end) literal window
          df.filter(col(by) >= lit(start.get).cast(byType) &&
            col(by) < lit(end.get).cast(byType))
      }

    case Strategy.Hash(by, mod, keep, seed) =>
      df.filter(hashBucket(col(s"`$by`"), mod, seed) < keep)

    case Strategy.Group(by, n) =>
      require(n <= Int.MaxValue, s"group.n_per_group too large: $n")
      df.withColumn("__rn", row_number().over(
          Window.partitionBy(col(s"`$by`"))
            .orderBy(rowHash(df.columns, 0L))))
        .filter(col("__rn") <= n.toInt).drop("__rn")

    case Strategy.Stratified(by, fracs, seed) =>
      val bucket = pmod(conv(substring(rowHash(df.columns, seed), 1, 12),
        16, 10).cast("long"), lit(FRAC_MOD))
      // strata absent from the map get threshold 0 → dropped
      val threshold = fracs.toSeq.sortBy(_._1)
        .foldLeft(lit(0L): Column) { case (acc, (stratum, frac)) =>
          when(col(s"`$by`") === stratum,
            lit(math.round(frac * FRAC_MOD))).otherwise(acc)
        }
      df.filter(bucket < threshold)

    case Strategy.Branch(preds, total, weights) =>
      val wsum = weights.sum
      val quotas = weights.map(w => math.round(total * w / wsum))
      require(quotas.forall(_ <= Int.MaxValue), "branch quota too large")
      // first matching predicate wins (plan.rs Branch semantics)
      val branch = preds.zipWithIndex.foldRight(lit(-1): Column) {
        case ((p, i), acc) => when(expr(p), lit(i)).otherwise(acc)
      }
      val quota = quotas.zipWithIndex.foldRight(lit(0L): Column) {
        case ((q, i), acc) => when(col("__branch") === i, lit(q)).otherwise(acc)
      }
      df.withColumn("__branch", branch)
        .filter(col("__branch") >= 0)
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("__branch")).orderBy(rowHash(df.columns, 0L))))
        .filter(col("__rn") <= quota)
        .drop("__branch", "__rn")
  }

  /** Build a keyset's key table: the DISTINCT `cols` of either a seed or
    * a strategy-sampled root source. Small by construction — broadcast at
    * the join sites. */
  def keysetDf(ks: Keyset, readSeed: String => DataFrame,
      readSource: String => DataFrame): DataFrame = {
    val base = ks.from match {
      case KeyFrom.FromSeed(seed) => readSeed(seed)
      case KeyFrom.FromRoot(root, strategy) => apply(readSource(root), strategy)
    }
    base.select(ks.cols.map(c => col(s"`$c`")): _*).distinct()
  }

  /** Filters first, strategy second: the strategy samples the
    * referentially-consistent universe (random 10% *of the sampled
    * customers' orders*), and a clone entry + keyset filter is exactly
    * "all rows belonging to the sample". */
  def applyEntry(df: DataFrame, entry: Entry,
      keysets: Map[String, DataFrame]): DataFrame = {
    val filtered = entry.filters.foldLeft(df) { (d, f) =>
      val ks = keysets(f.use)
      // alias keyset cols so an identity mapping (a -> a) stays unambiguous
      val proj = broadcast(
        ks.select(f.on.map { case (_, kc) =>
          col(s"`$kc`").as(s"__ks_$kc") }.distinct: _*).distinct())
      val cond = f.on.map { case (ec, kc) =>
        d(s"`$ec`") === proj(s"`__ks_$kc`") }.reduce(_ && _)
      d.join(proj, cond, "left_semi")
    }
    apply(filtered, entry.strategy)
  }

  /** The write relation for a sampled entry: same identifier, schema
    * suffixed (plan.rs:485-491 write_as). */
  def writeRel(read: Relation, table: String, suffix: String): Relation =
    Relation(None, read.schema + suffix, table, RelationType.Table)

  /** Expand an entry's `src.<source>.<table>` against the resolved source
    * map (`*` table = every table of the source). */
  def expandSelect(select: String,
      sources: Map[String, Map[String, Relation]]): Seq[(String, String)] = {
    val Array(_, src, tbl) = select.split("\\.", 3)
    val tables = sources.getOrElse(src, Map.empty)
    if (tbl == "*") tables.keys.toSeq.sorted.map(src -> _)
    else if (tables.contains(tbl)) Seq(src -> tbl)
    else throw new IllegalArgumentException(
      s"sample plan references unknown source $select")
  }

  /** `source()` remapping for `run --sample` (plan.rs:494-516
    * sample_renaming_map): every non-Pass entry's source relation is
    * replaced by its sampled write relation, so the DAG compiles against
    * the slice with zero model changes. */
  def remapSources(
      sources: Map[String, Map[String, Relation]],
      plan: Plan, suffix: String): Map[String, Map[String, Relation]] = {
    val remapped: Map[(String, String), Relation] = plan.entries
      .filter(_.strategy != Strategy.Pass)
      .flatMap { e =>
        expandSelect(e.select, sources).map { case (src, tbl) =>
          (src, tbl) -> writeRel(sources(src)(tbl), tbl, suffix)
        }
      }.toMap
    sources.map { case (src, tables) =>
      src -> tables.map { case (tbl, rel) =>
        tbl -> remapped.getOrElse((src, tbl), rel)
      }
    }
  }
}
