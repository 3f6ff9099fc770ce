package graft.mat

import graft.core.{BatchSize, Relation, RelationType}
import graft.ops.{Bpe, Dedup, FuzzyJoin, Multimodal, Packing, Sampling,
  Stats, TextAnalysis}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** `materialized='pipeline'`: the LLM-curation operator library surfaced
  * through the engine's own project interface — a model whose compiled
  * SELECT is the corpus input and whose `steps:` config (YAML-typed, in
  * schema.yml or dbt_project.yml) names a chain of curation operators
  * applied as DataFrame transforms before the atomic table write.
  *
  * This mirrors how the reference exposes capability to models — through
  * materializations and macro families shipped with the engine
  * (crates/dbt-loader/src/dbt_macro_assets/dbt-adapters/macros/,
  * MA/materializations/) — re-expressed Spark-first: each step is a
  * declarative DataFrame→DataFrame transform over the model's relation,
  * so Catalyst still sees ONE composed plan (pushdown/pruning cross step
  * boundaries; the gate's filter reaches the scan) and the write path is
  * the same staged-swap `writeTableAtomic` every table model uses —
  * partition_by/sort_by/zorder_by configs compose with pipelines.
  *
  * ```yaml
  * models:
  *   - name: curated
  *     config:
  *       materialized: pipeline
  *       steps:
  *         - op: gopher_gate
  *           text_col: text
  *         - op: exact_dedup
  *           text_col: text
  *           id_col: doc_id
  *         - op: token_count
  *           text_col: text
  *           drop_text: true
  *         - op: temperature_mix
  *           id_col: doc_id
  *           group_col: source
  *           tokens_col: n_tok
  *           budget: 5000
  * ```
  *
  * The full step vocabulary is [[PipelineSteps.knownOps]]: quality
  * gates (gopher_gate, span_gate, quality_classifier_filter — the
  * last trains its logistic model on the step's own input —
  * language_filter, and surprise_filter, the CCNet perplexity gate
  * whose bigram LM also trains on the step's own input), sampling
  * (weighted_sample — fixed-size E-S subsample ∝ a weight column), dedup
  * (exact_dedup, minhash_dedup, fuzzy_dedup — edit-distance surface
  * forms, semantic_dedup over an embedding column), domain selection (dsir_select — hashed-ngram importance
  * weights against a `target_where:` slice of the step's own input),
  * text prep (normalize, pii_mask, token_count — whitespace or
  * corpus-trained `tokenizer: bpe`), mixing (temperature_mix,
  * weighted_mix),
  * robust-stats cleanup (mad_outlier_filter, winsorize), and batch
  * assembly (pack_sequences, shard — both on the bucketed distributed
  * prefix sum, so the global packing order never costs a global
  * window).
  */
object PipelineMat extends Materialization {
  val name = "pipeline"
  def run(ctx: MatContext): MatResult = {
    val steps = PipelineSteps.parse(ctx.config.extra.get("steps"))
    if (steps.isEmpty)
      throw new IllegalArgumentException(
        "pipeline materialization needs a non-empty `steps:` config " +
          "(a YAML list of {op: <name>, ...} maps); known ops: " +
          PipelineSteps.knownOps.mkString(", "))
    val audits = PipelineAudits.parse(ctx.config.extra.get("audits"))
    // `incremental: true`: first run (or --full-refresh) builds the full
    // corpus AND persists per-step state (frozen trainer models, the
    // minhash signature index); later runs process ONLY the new batch
    // (the model SQL narrows its input via is_incremental(), exactly the
    // incremental-materialization contract — reference
    // MA/materializations/models/incremental/incremental.sql:2-99) and
    // APPEND their surviving rows. At 100 TB this is the difference
    // between a curation run that rescans the corpus and one that
    // touches the daily slice + bounded model/state relations.
    val incremental = ctx.config.extra.get("incremental")
      .exists(v => String.valueOf(v).toBoolean)
    val incrRun = incremental && !ctx.fullRefresh &&
      ctx.adapter.relationExists(ctx.target)
    if (incremental) steps.foreach(PipelineModels.checkIncrementalLegal)
    val message =
      if (incremental && ctx.config.eventTime.isDefined && incrRun)
        runWindows(ctx, steps)
      else {
        // full build OR a single (non-event-time) incremental batch
        processBatch(ctx, steps, ctx.compiled(), incremental, incrRun,
          window = None)
        (if (incrRun) "pipeline (incremental batch): "
         else "pipeline: ") + steps.map(_.op).mkString(" -> ")
      }
    TableMat.applyTblProperties(ctx)
    // audits run AFTER the swap over the WRITTEN table (what downstream
    // consumers will actually read), each landing in its own
    // `<model>__audit_<op>` side relation — the store_failures shape
    // applied to data-quality summaries
    if (audits.nonEmpty) {
      val written = ctx.adapter.read(ctx.target)
      audits.zip(PipelineAudits.relationSuffixes(audits)).foreach {
        case (a, suffix) =>
          val rel = ctx.target.copy(
            identifier = s"${ctx.target.identifier}$suffix")
          ctx.adapter.writeTableAtomic(a.apply(written), rel)
      }
    }
    MatResult(ctx.target, "success",
      message +
        (if (audits.isEmpty) ""
         else s" | audits: ${audits.map(_.op).mkString(", ")}"))
  }

  /** One batch through the step chain: apply every step (frozen
    * trainers / persisted indexes route through state relations), then
    * append (incremental batch) or atomically (re)write the target.
    * `window` carries the event-time slice being processed on a
    * windowed re-run: survivors anti-join the target's OWN window slice
    * on `unique_key` before appending, so a `lookback` re-run of an
    * already-written window is idempotent even for pipelines with no
    * dedup step (the dedup indexes make their rows idempotent; a pure
    * gate chain needs this target-side guard). The slice scan is
    * narrow (key columns only) and partition-prunes when the target is
    * partitioned by the event date. */
  private[mat] def processBatch(ctx: MatContext, steps: Seq[PipelineSteps.Step],
      input: DataFrame, incremental: Boolean, incrRun: Boolean,
      window: Option[(java.sql.Timestamp, java.sql.Timestamp)]): Unit = {
    // state mutations (index appends) are DEFERRED until the target
    // write lands: the kept-rows plan still reads the PRE-batch state,
    // and a failed run leaves the state untouched
    val deferred = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
    val out = steps.zip(PipelineModels.stepSuffixes(steps))
      .foldLeft(input) { case (df, (s, suffix)) =>
        PipelineModels.applyManaged(ctx, s, suffix, df, incremental,
          incrRun, deferred)
      }
    if (incrRun) {
      val guarded = window match {
        case Some((ws, we)) =>
          val et = ctx.config.eventTime.get
          val keys = ctx.config.uniqueKey
          val tgt = ctx.adapter.read(ctx.target)
          val slice = tgt
            .filter(col(s"`$et`") >= etBound(tgt, et, ws) &&
              col(s"`$et`") < etBound(tgt, et, we))
            .select(keys.map(k => col(s"`$k`")): _*)
          // an EXPLICIT backfill (--event-time-start) is APPEND-ONLY:
          // keys already in the window slice keep their settled rows —
          // the dedup indexes hold those docs as settled, so a
          // delete+rewrite would drop the reprocessed rows as
          // duplicates of themselves. Name what was skipped instead of
          // silently no-op'ing (the survivors plan is batch-sized;
          // pinning it eagerly costs one bounded materialization and
          // avoids running the step chain twice for the count).
          val src =
            if (ctx.explicitBackfill) out.localCheckpoint(true) else out
          val cond = keys.map(k => src(s"`$k`") <=> slice(s"`$k`"))
            .reduce(_ && _)
          if (ctx.explicitBackfill) {
            val dropped = src.join(slice, cond, "left_semi").count()
            if (dropped > 0) System.err.println(
              s"[warn] ${ctx.target.fqn}: explicit backfill window " +
                s"[$ws, $we) admits only genuinely new keys — $dropped " +
                "surviving row(s) whose unique_key already exists in " +
                "the window slice were dropped, not replaced (settled " +
                "dedup-index state cannot reconcile a rewrite). To " +
                "replace existing rows, rebuild with --full-refresh.")
          }
          src.join(slice, cond, "left_anti")
        case None => out
      }
      ctx.adapter.appendToTable(guarded, ctx.target)
    }
    else ctx.adapter.writeTableAtomic(out, ctx.target,
      ctx.config.partitionBy, ctx.config.sortBy,
      ctx.config.clusteredBy, ctx.config.buckets, ctx.config.zorderBy,
      ctx.config.layoutCurve, ctx.config.fileFormat)
    // REVERSE step order: a later step's append plan re-derives its
    // input THROUGH the earlier steps' state anti-joins (DataFrames are
    // plans — the state table is read at execution, not capture). Were
    // the exact-dedup index appended first, a downstream minhash append
    // would anti-join the batch against its own just-written hashes and
    // silently index nothing. Running last-step-first, every append
    // still sees the PRE-batch upstream state its kept-rows pass saw.
    deferred.reverseIterator.foreach(_.apply())
  }

  private def etBound(df: DataFrame, et: String,
      t: java.sql.Timestamp): Column = MicrobatchRunner.etBound(df, et, t)

  /** Does the compiled plan read the model's OWN target (`{{ this }}`
    * SQL)? Decides per-window recompilation and presence-pass safety in
    * [[runWindows]] — a self-reading model's input changes as windows
    * append. Inspects the ANALYZED plan's catalog relations, so views
    * and CTE aliases over the target count too; PATH-BASED reads (a
    * `spark.read.parquet(<target location>)` reaching the compiled
    * plan) and DSv2 relations match by storage location / identifier.
    * The check is CONSERVATIVE: a relation it cannot classify (a DSv2
    * table with no identifier, a non-file V1 relation without catalog
    * metadata) counts as self-reading — a missed self-reader would
    * silently run every window against a stale snapshot of the target,
    * while a false positive only costs per-window recompiles. */
  private[graft] def readsOwnTarget(ctx: MatContext, df: DataFrame): Boolean = {
    // normalized storage root of the target, for path-based matching.
    // Compare the PATH COMPONENT only: scheme/authority spellings vary
    // for one filesystem (hdfs://nn:8020 vs hdfs://nn, file:/ vs
    // file:///), and a missed self-read silently runs windows against
    // a stale snapshot while a path collision across filesystems only
    // costs conservative per-window recompiles — the cheap direction.
    val targetUri: Option[java.net.URI] = ctx.adapter
      .relationLocationUri(ctx.target)
      .map(u => new org.apache.hadoop.fs.Path(u).toUri)
    val targetLoc: Option[String] =
      targetUri.map(_.getPath.stripSuffix("/"))
    def underTarget(p: org.apache.hadoop.fs.Path): Boolean =
      targetLoc.exists { t =>
        if (t.nonEmpty) {
          val s = p.toUri.getPath.stripSuffix("/")
          s == t || s.startsWith(t + "/")
        } else {
          // bucket/filesystem-ROOT located table: the path component is
          // empty and would prefix-match every absolute path — fall
          // back to the full URI (scheme + authority), the only
          // discriminating part left
          val tf = targetUri.get.toString.stripSuffix("/")
          val s = p.toUri.toString.stripSuffix("/")
          s == tf || s.startsWith(tf + "/")
        }
      }
    var inconclusive = false
    val hits = df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.catalogTable.map(_.identifier) match {
          case Some(id) =>
            id.table.equalsIgnoreCase(ctx.target.identifier) &&
              id.database.exists(_.equalsIgnoreCase(ctx.target.schema))
          case None => l.relation match {
            case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              // path-based read: self iff a root path is the target's
              // storage root or a file/partition under it; an unknown
              // target location cannot rule the read out
              targetLoc.isEmpty || f.location.rootPaths.exists(underTarget)
            case _ => inconclusive = true; false
          }
        }
      case h: org.apache.spark.sql.catalyst.catalog.HiveTableRelation =>
        h.tableMeta.identifier.table
          .equalsIgnoreCase(ctx.target.identifier) &&
          h.tableMeta.identifier.database
            .exists(_.equalsIgnoreCase(ctx.target.schema))
      case d: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        d.identifier match {
          case Some(id) =>
            id.name.equalsIgnoreCase(ctx.target.identifier) &&
              id.namespace.exists(_.equalsIgnoreCase(ctx.target.schema))
          case None => inconclusive = true; false
        }
    }
    hits.exists(identity) || inconclusive
  }

  /** Microbatch × incremental pipeline (the continuous-ingestion shape
    * a 100 TB curation pipeline runs — reference microbatch config:
    * model_config.rs:79-82,209-210, DbtBatchSize common.rs:523): an
    * `incremental: true` pipeline with `event_time`/`batch_size`
    * processes each event-time window as ONE persisted-index batch.
    *
    * Semantics:
    *   - the FIRST run (target absent / --full-refresh) is the normal
    *     full build over the model's whole input — trainers train and
    *     indexes lay out over the complete history in one pass (this
    *     method only runs once the target exists);
    *   - later runs window [resume, now) by `batch_size`, where resume
    *     is `lookback` windows before the target's max event_time
    *     (dbt's late-data reopening) — each window filters the input to
    *     [start, end), runs the incremental step chain against the
    *     settled state, appends survivors, and flushes its index
    *     appends BEFORE the next window starts (windows are sequential
    *     index batches: window N+1 must see window N's docs as
    *     settled);
    *   - a `lookback` re-run of an already-written window is
    *     IDEMPOTENT: re-seen docs drop against the settled indexes (and
    *     the target-slice unique_key guard for index-less chains), and
    *     the deferred index appends skip ids the state already holds —
    *     only genuinely late rows land;
    *   - `--event-time-start/--event-time-end` reprocess exactly the
    *     named window span (resume suppressed). Unlike a plain
    *     microbatch MODEL (which replaces the window), a pipeline
    *     backfill is APPEND-ONLY: it admits genuinely new keys and
    *     keeps the settled rows for keys the window already holds —
    *     the persisted dedup indexes hold those docs as settled, so a
    *     delete+rewrite would drop the reprocessed rows as duplicates
    *     of themselves. When existing keys are skipped, a [warn] names
    *     the count and prescribes --full-refresh for a true rewrite.
    *
    * `unique_key` is required (the idempotence guard needs it);
    * `concurrent_batches` is rejected — index batches are
    * order-dependent by construction. */
  private def runWindows(ctx: MatContext,
      steps: Seq[PipelineSteps.Step]): String = {
    val cfg = ctx.config
    val et = cfg.eventTime.get
    if (cfg.uniqueKey.isEmpty)
      throw new IllegalArgumentException(
        "a microbatch pipeline (event_time + incremental: true) requires " +
          "unique_key: lookback re-runs are made idempotent by " +
          "anti-joining each window's survivors against the " +
          "already-written window slice on unique_key")
    if (cfg.concurrentBatches)
      throw new IllegalArgumentException(
        "concurrent_batches is not supported on an incremental pipeline: " +
          "each window is one persisted-index batch, and batch N+1 must " +
          "see batch N's docs as settled — windows run sequentially")
    val size = cfg.batchSize.getOrElse(BatchSize.Day)
    val begin = cfg.begin.map(java.sql.Timestamp.valueOf)
      .getOrElse(new java.sql.Timestamp(0L))
    // resume from the target's max event_time (minus lookback windows),
    // unless an explicit backfill window was named. NO catch-all here:
    // a transient metastore/IO failure must surface as itself — Try
    // would misread it as "no resume" and silently reprocess every
    // window since `begin` (see the same rule at checkParams).
    val lastEnd: Option[java.sql.Timestamp] =
      if (ctx.explicitBackfill) None
      else MicrobatchRunner.eventTimeValue(
        ctx.adapter.read(ctx.target).agg(max(col(s"`$et`"))).head.get(0))
    // an EXISTING but event-time-EMPTY target (e.g. built under
    // --empty) has no resume point; without a `begin` bound the window
    // loop would emit one batch per period since epoch — fail with the
    // recovery named instead
    if (lastEnd.isEmpty && cfg.begin.isEmpty)
      throw new IllegalStateException(
        s"${ctx.target.fqn}: cannot resume — the target has no " +
          s"`$et` rows and the model declares no `begin:`; set begin " +
          "or rebuild with --full-refresh")
    val windows = MicrobatchRunner.batches(begin, ctx.now, size,
      cfg.lookback, lastEnd)
    // ONE presence pass over the compiled input before the loop: each
    // window's rows are counted under the SAME `>= start && < end`
    // predicate the per-window filter uses (identical literal form, so
    // the type coercion for TIMESTAMP/NTZ/DATE event times cannot
    // drift), and windows with zero rows skip the per-window job
    // ladder entirely — processBatch on an empty slice appends nothing
    // and flushes nothing, it just costs ~a dozen Spark jobs, so a
    // sparse backfill over a long range (365 day-windows, most empty)
    // pays one scan instead of hundreds of empty step chains. The scan
    // is FILTERED to the windows' overall [first.start, last.end) span
    // with the same etBound literals, so it partition-prunes to exactly
    // the slices the windows would read — an unfiltered agg would
    // re-add the full-history scan the etBound literals exist to
    // avoid. The common steady-state run (lookback+1 windows, all
    // non-empty) BYPASSES the pass entirely: a scan that can skip at
    // most a window or two costs more than the empty ladders it saves.
    // A batch-aware compiled input (compiledBatch) is parameterized per
    // window — there is no single frame to scan — so every window
    // runs. Skipped windows also skip per-step param checks; the next
    // non-empty window still performs them.
    //
    // SELF-READING models (`{{ this }}` in the SELECT) opt out of BOTH
    // the shared plan and the presence pass: their input changes as
    // windows append to the target, so window N+1 must recompile to
    // see window N's appends, and a pre-run presence count could wrongly
    // skip a window whose rows only materialize later. Everything else
    // compiles ONCE and runs the whole invocation against that snapshot
    // — consistent corpus-per-run semantics; upstream rows arriving
    // mid-run are late data, which the next run's lookback reopens.
    lazy val sharedSrc = ctx.compiled()
    val selfReading =
      ctx.compiledBatch.isEmpty && readsOwnTarget(ctx, sharedSrc)
    val nonEmpty: Seq[MicrobatchRunner.Batch] =
      if (ctx.compiledBatch.isDefined || selfReading ||
          windows.length <= math.max(2, cfg.lookback + 1)) windows
      else {
        val src = sharedSrc
        val spanned = src.filter(
          col(s"`$et`") >= etBound(src, et, windows.head.start) &&
            col(s"`$et`") < etBound(src, et, windows.last.end))
        windows.grouped(512).flatMap { group =>
          val exprs = group.zipWithIndex.map { case (b, i) =>
            sum(when(col(s"`$et`") >= etBound(src, et, b.start) &&
              col(s"`$et`") < etBound(src, et, b.end), 1)).as(s"__w$i")
          }
          val counts = spanned.agg(exprs.head, exprs.tail: _*).head
          group.zipWithIndex.collect {
            case (b, i) if !counts.isNullAt(i) => b
          }
        }.toSeq
      }
    nonEmpty.foreach { b =>
      val raw = ctx.compiledBatch.fold(
          if (selfReading) ctx.compiled() else sharedSrc)(f =>
          f(b.start, b.end))
      val input = raw
        .filter(col(s"`$et`") >= etBound(raw, et, b.start) &&
          col(s"`$et`") < etBound(raw, et, b.end))
      processBatch(ctx, steps, input, incremental = true, incrRun = true,
        window = Some((b.start, b.end)))
    }
    s"pipeline microbatch: ${nonEmpty.length} windows of ${size.name}" +
      (if (nonEmpty.length < windows.length)
         s" (${windows.length - nonEmpty.length} empty skipped)"
       else "") +
      s": ${steps.map(_.op).mkString(" -> ")}"
  }
}

/** The audit registry for `audits:` on a pipeline model — each entry
  * summarizes the WRITTEN table into a `<model>__audit_<op>` side
  * relation (profile, k-anonymity, Benford, key skew), so the curation
  * output ships with its own data-quality report, no extra model
  * needed. */
object PipelineAudits {

  final case class Audit(op: String, apply: DataFrame => DataFrame)

  val knownOps: Seq[String] =
    Seq("profile", "k_anonymity", "benford", "key_skew", "moments",
      "gini", "tfidf_terms", "collocations", "zipf", "dup_rate")

  /** Side-relation suffix per audit: the first occurrence of an op keeps
    * the stable `__audit_<op>` name; repeats (e.g. two k_anonymity
    * audits over different column sets) get `__audit_<op>_<n>` so the
    * second can't silently overwrite the first. */
  def relationSuffixes(audits: Seq[Audit]): Seq[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    audits.map { a =>
      val n = seen.getOrElse(a.op, 0) + 1
      seen(a.op) = n
      if (n == 1) s"__audit_${a.op}" else s"__audit_${a.op}_$n"
    }
  }

  def parse(raw: Option[Any]): Seq[Audit] = raw match {
    case None => Nil
    case Some(v: Seq[_]) => v.map {
      case m: Map[_, _] => build(m.asInstanceOf[Map[String, Any]])
      case other => throw new IllegalArgumentException(
        s"each pipeline audit must be a mapping with an `op:` key, got: $other")
    }
    case Some(other) => throw new IllegalArgumentException(
      s"`audits:` must be a YAML list of audit mappings, got: $other")
  }

  private def strList(m: Map[String, Any], k: String,
      op: String): Seq[String] = m.get(k) match {
    case Some(v: Seq[_]) if v.nonEmpty => v.map(String.valueOf)
    case _ => throw new IllegalArgumentException(
      s"pipeline audit `$op` requires a non-empty `$k:` list")
  }
  private def reqStr(m: Map[String, Any], k: String, op: String): String =
    m.get(k).map(String.valueOf).getOrElse(
      throw new IllegalArgumentException(
        s"pipeline audit `$op` requires `$k:`"))
  private def str0(m: Map[String, Any], k: String, dflt: String): String =
    m.get(k).map(String.valueOf).getOrElse(dflt)
  private def int(m: Map[String, Any], k: String, dflt: Int): Int =
    m.get(k).map(String.valueOf(_).toInt).getOrElse(dflt)

  private def build(m: Map[String, Any]): Audit = {
    val op = m.get("op").map(String.valueOf).getOrElse(
      throw new IllegalArgumentException(
        "pipeline audit needs an `op:` key"))
    import graft.ops.{Audit => A}
    val fn: DataFrame => DataFrame = op match {
      case "profile" =>
        val cols = strList(m, "columns", op)
        df => A.profile(df, cols)
      case "k_anonymity" =>
        val cols = strList(m, "columns", op)
        val k = int(m, "k", 5)
        df => A.kAnonymity(df, cols, k)
      case "benford" =>
        val vc = reqStr(m, "value_col", op)
        df => A.benford(df, vc)
      case "key_skew" =>
        val kc = reqStr(m, "key_col", op)
        val k = int(m, "k", 20)
        df => A.keySkew(df, kc, k)
      case "moments" =>
        val gc = reqStr(m, "group_col", op)
        val vc = reqStr(m, "value_col", op)
        df => graft.ops.Stats.momentsByGroup(df, gc, vc)
      case "gini" =>
        val gc = reqStr(m, "group_col", op)
        val vc = reqStr(m, "value_col", op)
        df => graft.ops.Stats.giniByGroup(df, gc, vc)
      // c-TF-IDF: the k terms most characteristic of each group of the
      // WRITTEN corpus — "what did each source's surviving slice end up
      // being about" (topic drift shows here before it shows in loss)
      case "tfidf_terms" =>
        val gc = reqStr(m, "group_col", op)
        val tc = str0(m, "text_col", "text")
        val k = int(m, "k", 5)
        df => graft.ops.TextAnalysis.tfidfTopTermsByGroup(df, gc, tc, k)
      // PMI collocations over the written corpus: boilerplate and
      // template phrases surface as top pairs — the post-dedup check
      // that the near-dup pass actually removed the template mass
      case "collocations" =>
        val tc = str0(m, "text_col", "text")
        df => graft.ops.TextAnalysis.collocations(df, tc,
          minCount = int(m, "min_count", 5), topK = int(m, "k", 50))
      // per-group residual exact-dup rate over the WRITTEN table: after
      // a dedup pass this should be ~0 — the "did the dedup actually
      // work" line of the shipped data-quality report
      case "dup_rate" =>
        val gc = reqStr(m, "group_col", op)
        val tc = str0(m, "text_col", "text")
        df => A.dupRate(df, gc, tc)
      // Zipf slope per group: generated/templated slices flatten away
      // from the organic −1 — the one-number naturalness audit
      case "zipf" =>
        val gc = reqStr(m, "group_col", op)
        val tc = str0(m, "text_col", "text")
        df => graft.ops.TextAnalysis.zipfFit(df, gc, tc)
      case other => throw new IllegalArgumentException(
        s"unknown pipeline audit op `$other` (known: ${knownOps.mkString(", ")})")
    }
    Audit(op, fn)
  }
}

/** The step registry: each entry parses its typed params from the YAML
  * map and returns a DataFrame transform over `graft.ops`. Steps are
  * column-neutral where possible (filters/dedups return the input
  * columns) so chains compose without schema surprises. */
object PipelineSteps {

  /** `raw` is the step's full YAML map — [[PipelineModels]] re-reads
    * typed params from it when a step routes through frozen-model or
    * incremental-state management (state plumbing the plain `apply`
    * closure cannot carry). */
  final case class Step(op: String, raw: Map[String, Any],
    apply: DataFrame => DataFrame)

  val knownOps: Seq[String] = Seq("gopher_gate", "exact_dedup",
    "minhash_dedup", "fuzzy_dedup", "semantic_dedup", "token_count",
    "temperature_mix",
    "weighted_mix", "mad_outlier_filter", "winsorize", "normalize",
    "pii_mask", "language_filter", "surprise_filter", "weighted_sample",
    "collapse_repeats", "span_gate", "quality_classifier_filter",
    "dsir_select", "pack_sequences", "shard", "curriculum",
    "cdc_compact", "pagerank_weight", "cluster_assign", "simhash_dedup",
    "chunk", "decontaminate", "ngram_dedup", "media_dedup")

  def parse(raw: Option[Any]): Seq[Step] = raw match {
    case None => Nil
    case Some(v: Seq[_]) => v.map {
      case m: Map[_, _] => build(m.asInstanceOf[Map[String, Any]])
      case other => throw new IllegalArgumentException(
        s"each pipeline step must be a mapping with an `op:` key, got: $other")
    }
    case Some(other) => throw new IllegalArgumentException(
      s"`steps:` must be a YAML list of step mappings, got: $other")
  }

  // ---- typed param readers (YAML scalars arrive as Long/String/Boolean)
  private[mat] def str(m: Map[String, Any], k: String, dflt: => String): String =
    m.get(k).map(String.valueOf).getOrElse(dflt)
  private[mat] def reqStr(m: Map[String, Any], k: String, op: String): String =
    m.get(k).map(String.valueOf).getOrElse(throw new IllegalArgumentException(
      s"pipeline step `$op` requires `$k:`"))
  private[mat] def int(m: Map[String, Any], k: String, dflt: Int): Int =
    m.get(k).map(String.valueOf(_).toInt).getOrElse(dflt)
  private[mat] def lng(m: Map[String, Any], k: String, op: String): Long =
    m.get(k).map(String.valueOf(_).toLong).getOrElse(
      throw new IllegalArgumentException(s"pipeline step `$op` requires `$k:`"))
  private[mat] def dbl(m: Map[String, Any], k: String, dflt: Double): Double =
    m.get(k).map(String.valueOf(_).toDouble).getOrElse(dflt)
  private[mat] def bool(m: Map[String, Any], k: String, dflt: Boolean): Boolean =
    m.get(k).map(String.valueOf(_).toBoolean).getOrElse(dflt)
  private[mat] def strList(m: Map[String, Any], k: String,
      op: String): Seq[String] = m.get(k) match {
    case Some(v: Seq[_]) if v.nonEmpty => v.map(String.valueOf)
    case _ => throw new IllegalArgumentException(
      s"pipeline step `$op` requires a non-empty `$k:` list")
  }

  private[mat] def keepInputColumns(before: Array[String])(df: DataFrame): DataFrame =
    df.select(before.map(c => col(s"`$c`")).toIndexedSeq: _*)

  private def build(m: Map[String, Any]): Step = {
    val op = m.get("op").map(String.valueOf).getOrElse(
      throw new IllegalArgumentException(
        s"pipeline step missing `op:` (known: ${knownOps.mkString(", ")}): $m"))
    val fn: DataFrame => DataFrame = op match {

      // Gopher quality gate: keep rows passing every all-integer rule;
      // the audit columns (r_*, keep, n_tokens) are dropped so the chain
      // stays schema-stable
      case "gopher_gate" =>
        val textCol = str(m, "text_col", "text")
        df => keepInputColumns(df.columns)(
          TextAnalysis.gopherFilter(df, textCol,
            int(m, "min_tokens", 8), int(m, "max_tokens", 5000))
            .filter(col("keep")))

      // exact dedup: one canonical row per identical text — the min-id
      // row WITH its own values (lexicographic struct min, id leading),
      // never fields mixed from different rows
      case "exact_dedup" =>
        val textCol = str(m, "text_col", "text")
        val idCol = str(m, "id_col", "doc_id")
        df => {
          val others = df.columns.filterNot(c => c == textCol || c == idCol)
          val packed = (idCol +: others).map(c => col(s"`$c`"))
          df.groupBy(col(s"`$textCol`"))
            .agg(min(struct(packed.toIndexedSeq: _*)).as("__m"))
            .select((idCol +: others).map(c => col(s"__m.`$c`").as(c)) :+
              col(s"`$textCol`"): _*)
            .select(df.columns.map(c => col(s"`$c`")).toIndexedSeq: _*)
        }

      // minhash-LSH near-dup removal: banded signatures → bucket-pair
      // candidates → exact-Jaccard verify → connected components → keep
      // the min-id canonical per cluster, or with `priority_col:` the
      // max-priority doc ("keep the best copy"); + every unclustered
      // doc; column-neutral, cluster sizes dropped
      case "minhash_dedup" =>
        val textCol = str(m, "text_col", "text")
        val idCol = str(m, "id_col", "doc_id")
        val priorityCol = m.get("priority_col").map(String.valueOf)
        df => {
          val pairs = Dedup.minhashNearDups(df, idCol, textCol,
            k = int(m, "k", 3), perms = int(m, "perms", 128),
            bands = int(m, "bands", 21),
            threshold = dbl(m, "threshold", 0.8))
          val kept = priorityCol match {
            case Some(p) => Dedup.canonicalCorpusBy(df, pairs, idCol, p)
            case None => Dedup.canonicalCorpus(df, pairs, idCol)
          }
          keepInputColumns(df.columns)(kept)
        }

      // token-window chunking: each document splits into fixed-size
      // token windows (`chunk_tokens:`) with overlap (`stride_tokens:`
      // < chunk ⇒ consecutive chunks share the difference; default =
      // chunk, i.e. non-overlapping) — the standard pre-embedding /
      // pre-packing segmentation. Pure map-side explode, each row
      // expands independently; the text column is REPLACED by
      // (chunk_id, chunk_text)
      case "chunk" =>
        val textCol = str(m, "text_col", "text")
        val chunkT = int(m, "chunk_tokens", 512)
        df => TextAnalysis.chunk(df, textCol, chunkT,
          int(m, "stride_tokens", chunkT))

      // benchmark decontamination (the standard pre-training n-gram
      // overlap gate): drop every document sharing more than
      // `max_hits:` distinct word k-grams with a STATIC eval/benchmark
      // set named by `against_location:` (parquet path) or `against:`
      // (catalog table). The benchmark's distinct k-gram set is tiny
      // and broadcastable, so at 100 TB this is a broadcast semi-join
      // over a map-side explode — no corpus shuffle, and each row is
      // judged independently of the rest of the corpus
      case "decontaminate" =>
        val idCol = str(m, "id_col", "doc_id")
        val textCol = str(m, "text_col", "text")
        val benchTextCol = str(m, "against_text_col", textCol)
        val k = int(m, "k", 8)
        val maxHits = int(m, "max_hits", 0)
        val loc = m.get("against_location").map(String.valueOf)
        val tbl = m.get("against").map(String.valueOf)
        if (loc.isEmpty && tbl.isEmpty) throw new IllegalArgumentException(
          "pipeline step `decontaminate` requires `against_location:` " +
            "(parquet path) or `against:` (table name)")
        df => {
          val sp = df.sparkSession
          val bench = loc.map(sp.read.parquet(_)).getOrElse(sp.table(tbl.get))
          val hits = Dedup.contaminated(
            df.select(col(s"`$idCol`"), col(s"`$textCol`")),
            bench.select(col(s"`$benchTextCol`").as(textCol)),
            idCol, textCol, k)
            .filter(col("n_hits") > maxHits)
            .select(col(s"`$idCol`"))
          df.join(hits, Seq(idCol), "left_anti")
        }

      // 64-bit SimHash near-dup collapse: pairs within `max_hamming:`
      // (≤ 3 — the 4-chunk pigeonhole bound) merge transitively, each
      // component keeps its min-id row (or the `priority_col:` max);
      // column-neutral
      case "simhash_dedup" =>
        val textCol = str(m, "text_col", "text")
        val idCol = str(m, "id_col", "doc_id")
        val priorityCol = m.get("priority_col").map(String.valueOf)
        df => {
          val pairs = Dedup.simhashNearDups(df, idCol, textCol,
            maxHamming = int(m, "max_hamming", 3))
          val kept = priorityCol match {
            case Some(p) => Dedup.canonicalCorpusBy(df, pairs, idCol, p)
            case None => Dedup.canonicalCorpus(df, pairs, idCol)
          }
          keepInputColumns(df.columns)(kept)
        }

      // exact-verified n-gram near-dup collapse: pairs sharing a
      // k-shingle are verified exactly under `measure: jaccard`
      // (default) or `measure: containment` (asymmetric
      // |A∩B|/min(|A|,|B|) — catches a short doc quoted whole inside a
      // long one, the contamination shape a growing corpus re-checks);
      // within-threshold pairs merge transitively, each component keeps
      // its min-id row (or the `priority_col:` max); column-neutral
      case "ngram_dedup" =>
        val textCol = str(m, "text_col", "text")
        val idCol = str(m, "id_col", "doc_id")
        val k = int(m, "k", 3)
        val threshold = dbl(m, "threshold", 0.8)
        val measure = str(m, "measure", "jaccard")
        if (measure != "jaccard" && measure != "containment")
          throw new IllegalArgumentException(
            "pipeline step `ngram_dedup`: `measure:` must be jaccard " +
              s"or containment, got `$measure`")
        val priorityCol = m.get("priority_col").map(String.valueOf)
        df => {
          val pairs = measure match {
            case "containment" =>
              Dedup.containmentPairs(df, idCol, textCol, k, threshold)
            case _ => Dedup.ngramJaccard(df, idCol, textCol, k, threshold)
          }
          val kept = priorityCol match {
            case Some(p) => Dedup.canonicalCorpusBy(df, pairs, idCol, p)
            case None => Dedup.canonicalCorpus(df, pairs, idCol)
          }
          keepInputColumns(df.columns)(kept)
        }

      // media near-dup collapse over the stub codec's signature
      // columns — the multimodal corpus dedups through the SAME
      // pipeline surface as text. `method: exact` (default) merges
      // identical payload bodies via the (n_bytes, body-checksum) key;
      // `method: simhash` bands a 64-bit token bit-signature of the
      // body text, `method: phash` the REAL DCT perceptual hash of the
      // decoded gray pixels (graft.ops.Phash — resize/brightness
      // re-encodes of one image merge; decodes GRFT raw-gray AND the
      // standard still-image containers via the JDK's ImageIO) — both
      // through the same 4-chunk pigeonhole core as text simhash_dedup,
      // merging hamming ≤ `max_hamming:` components (min-id keep, or
      // the `priority_col:` max); `method: audio` the envelope-spectrum
      // fingerprint over DECODED PCM (graft.ops.AudioHash — WAV/AIFF/AU
      // via the JDK's javax.sound.sampled; gain-scaled, resampled, and
      // re-quantized copies of one recording merge), through the same
      // banding core. Payloads failing the container check
      // are ALWAYS kept (a corrupt file must not merge into the
      // checksum-0 garbage group); only audio/video container decode
      // stays the documented StubCodec boundary. Column-neutral.
      case "media_dedup" =>
        val idCol = str(m, "id_col", "doc_id")
        val payloadCol = str(m, "payload_col", "payload")
        val method = str(m, "method", "exact")
        val maxHamming = int(m, "max_hamming", 3)
        val priorityCol = m.get("priority_col").map(String.valueOf)
        if (method != "exact" && method != "simhash" && method != "phash" &&
            method != "frames" && method != "audio")
          throw new IllegalArgumentException(
            "pipeline step `media_dedup`: `method:` must be exact, " +
              s"simhash, phash, frames, or audio, got `$method`")
        // frames: clip/re-mux detection — frame-signature sets through
        // the n-gram containment machinery (see Multimodal.frameSets)
        val frameLen = int(m, "frame_len", 64)
        val stride = int(m, "stride", 32)
        val threshold = dbl(m, "threshold", 0.5)
        val measure = str(m, "measure", "containment")
        if (method == "frames" && (frameLen < 1 || stride < 1))
          throw new IllegalArgumentException(
            "pipeline step `media_dedup`: `frame_len:`/`stride:` must " +
              s"be >= 1, got $frameLen/$stride")
        df => method match {
          case "exact" =>
            val ck = Multimodal.withChecksum(df, payloadCol)
            val keepIds = ck.filter(col("__media_valid"))
              .groupBy(col("__n_bytes"), col("__checksum"))
              .agg(min(col(s"`$idCol`")).as("__keep_id"))
              .select(col("__keep_id"))
              .unionByName(ck.filter(!col("__media_valid"))
                .select(col(s"`$idCol`").as("__keep_id")))
            df.join(keepIds, df(s"`$idCol`") === col("__keep_id"),
              "left_semi")
          case _ =>
            // simhash: token bit-votes over the body text; phash: the
            // real DCT perceptual hash over the decoded gray pixels —
            // both band through the same 4-chunk pigeonhole core;
            // frames: frame-signature sets through the n-gram
            // containment machinery (clip-of / re-muxed-copy relation)
            val pairs =
              if (method == "phash")
                Multimodal.mediaNearDupsPhash(df, idCol, payloadCol,
                  maxHamming)
              else if (method == "audio")
                Multimodal.mediaNearDupsAudio(df, idCol, payloadCol,
                  maxHamming)
              else if (method == "frames")
                Dedup.ngramNearDupsFromSets(
                  Multimodal.frameSets(df, idCol, payloadCol, frameLen,
                    stride),
                  threshold, measure,
                  df.sparkSession.conf
                    .get("spark.graft.maxShingleDf", "1000").toInt)
              else Multimodal.mediaNearDups(df, idCol, payloadCol,
                maxHamming)
            val kept = priorityCol match {
              case Some(p) => Dedup.canonicalCorpusBy(df, pairs, idCol, p)
              case None => Dedup.canonicalCorpus(df, pairs, idCol)
            }
            keepInputColumns(df.columns)(kept)
        }

      // edit-distance near-dup collapse on a string column (titles,
      // names, URLs): within-max_dist pairs merge transitively, each
      // component keeps its min-id row; column-neutral
      case "fuzzy_dedup" =>
        val strCol = str(m, "str_col", "text")
        val idCol = str(m, "id_col", "doc_id")
        df => {
          val kept = FuzzyJoin.fuzzyDedup(
            df.select(col(s"`$idCol`"), col(s"`$strCol`")),
            idCol, strCol,
            maxDist = int(m, "max_dist", 2), q = int(m, "q", 2))
            .select(col(s"`$idCol`"))
          df.join(kept, Seq(idCol), "left_semi")
        }

      // token counting for downstream budgets: whitespace (default) or
      // `tokenizer: bpe` — corpus-trained byte-pair encoding (merges
      // learned from THIS step's input at build time; `merges:` budget,
      // optional `max_words:` cap bounding driver state), counted by
      // the map-side replace chain
      case "token_count" =>
        val textCol = str(m, "text_col", "text")
        val outCol = str(m, "out_col", "n_tok")
        val tokenizer = str(m, "tokenizer", "whitespace")
        df => {
          val counted = tokenizer match {
            case "whitespace" => size(split(col(s"`$textCol`"), " "))
            case "bpe" =>
              // max_words absent → Bpe's 1M default cap; max_words <= 0
              // is the explicit unbounded opt-out
              val learned = Bpe.train(df, textCol,
                numMerges = int(m, "merges", 20),
                maxWords = m.get("max_words").map(String.valueOf(_).toInt)
                  .map(v => if (v <= 0) None else Some(v))
                  .getOrElse(Some(Bpe.DefaultMaxWords)))
              Bpe.tokenCount(textCol, learned)
            case other => throw new IllegalArgumentException(
              s"token_count `tokenizer:` must be whitespace or bpe: $other")
          }
          val out = df.withColumn(outCol, counted)
          if (bool(m, "drop_text", dflt = false)) out.drop(textCol) else out
        }

      // sqrt-temperature mix to a token budget (α=0.5): per-stratum
      // weights floor(sqrt(token total)), map-side exact-decimal accept
      case "temperature_mix" =>
        val idCol = reqStr(m, "id_col", op)
        val groupCol = reqStr(m, "group_col", op)
        val tokensCol = reqStr(m, "tokens_col", op)
        val budget = lng(m, "budget", op)
        df => Sampling.temperatureMixByTokens(df, idCol, groupCol,
          tokensCol, budget)

      // explicit per-stratum weights (the domain-mixing step when the
      // recipe is hand-tuned rather than temperature-derived)
      case "weighted_mix" =>
        val idCol = reqStr(m, "id_col", op)
        val groupCol = reqStr(m, "group_col", op)
        val tokensCol = reqStr(m, "tokens_col", op)
        val budget = lng(m, "budget", op)
        val weights: Seq[(String, Long)] = m.get("weights") match {
          case Some(w: Map[_, _]) => w.asInstanceOf[Map[String, Any]]
            .map { case (k, v) => k -> String.valueOf(v).toLong }.toSeq.sorted
          case _ => throw new IllegalArgumentException(
            s"pipeline step `$op` requires `weights:` (stratum -> weight map)")
        }
        df => Sampling.mixByTokenWeights(df, idCol, groupCol, tokensCol,
          weights, budget)

      // robust outlier drop: remove rows with |x − median| > k·MAD of
      // their group; audit columns dropped
      case "mad_outlier_filter" =>
        val groupCol = reqStr(m, "group_col", op)
        val valueCol = reqStr(m, "value_col", op)
        df => keepInputColumns(df.columns)(
          Stats.madOutliers(df, groupCol, valueCol, int(m, "k", 3))
            .filter(!col("is_outlier")))

      // clip a value column into its group's exact [p-lo, p-hi] quantile
      // band; the value column is REPLACED by the clipped value (the
      // bounds stay internal) so the chain stays schema-stable
      case "winsorize" =>
        val groupCol = reqStr(m, "group_col", op)
        val valueCol = reqStr(m, "value_col", op)
        df => {
          val cols = df.columns
          val w = Stats.winsorize(df, groupCol, valueCol,
            int(m, "lo_num", 1), int(m, "lo_den", 100),
            int(m, "hi_num", 99), int(m, "hi_den", 100))
            .withColumn(valueCol, col("clipped"))
          keepInputColumns(cols)(w)
        }

      // text normalization: lowercase / strip non-alphanumerics /
      // collapse whitespace runs, each opt-in, REPLACING the text
      // column (schema-stable) — the pre-dedup canonicalization pass
      case "normalize" =>
        val textCol = str(m, "text_col", "text")
        val doLower = bool(m, "lowercase", dflt = true)
        val doStrip = bool(m, "strip_punct", dflt = false)
        val doCollapse = bool(m, "collapse_ws", dflt = true)
        df => {
          var c: Column = col(s"`$textCol`")
          if (doLower) c = lower(c)
          if (doStrip) c = regexp_replace(c, "[^a-zA-Z0-9 ]", "")
          if (doCollapse) c = trim(regexp_replace(c, " +", " "))
          df.withColumn(textCol, c)
        }

      // PII scrub: replace email / phone-shaped / long-digit-run spans
      // with class tags, REPLACING the text column (schema-stable) —
      // the redaction pass a shareable corpus needs before export
      case "pii_mask" =>
        val textCol = str(m, "text_col", "text")
        df => df.withColumn(textCol, TextAnalysis.maskPii(textCol))

      // language gate: keep rows whose predicted language is in
      // `langs:` — pure map-side column op, no shuffle, schema-stable
      case "language_filter" =>
        val textCol = str(m, "text_col", "text")
        val langs: Seq[String] = m.get("langs") match {
          case Some(v: Seq[_]) => v.map(String.valueOf)
          case _ => throw new IllegalArgumentException(
            s"pipeline step `$op` requires `langs:` (a YAML list)")
        }
        df => df.filter(TextAnalysis.languageId(textCol)
          .isin(langs.map(x => x: Any): _*))

      // collapse runs of immediately-repeated tokens (stutter cleanup)
      // — REPLACES the text column, schema-stable, pure map-side
      case "collapse_repeats" =>
        val textCol = str(m, "text_col", "text")
        df => {
          val (cleaned, _) = TextAnalysis.collapseRepeatTokens(textCol)
          df.withColumn(textCol, cleaned)
        }

      // fixed-size weighted subsample: keep the `k:` rows with the
      // highest E-S priority u^(1/w) — inclusion ∝ `weight_col:`;
      // column-neutral left-semi rejoin
      case "weighted_sample" =>
        val idCol = str(m, "id_col", "doc_id")
        val weightCol = reqStr(m, "weight_col", op)
        val k = int(m, "k", -1)
        if (k <= 0) throw new IllegalArgumentException(
          s"pipeline step `$op` requires a positive `k:`")
        df => {
          val kept = Sampling.weightedSample(
            df.select(col(s"`$idCol`"), col(s"`$weightCol`")),
            idCol, weightCol, k)
            .select(col(s"`$idCol`"))
          df.join(kept, Seq(idCol), "left_semi")
        }

      // CCNet-style perplexity gate: train the bigram LM on THIS
      // step's input, keep rows whose mean surprise is ≤ `max_surprise:`
      // (rounded-6 compare, same value the oracle-checked query emits).
      // Unscorable rows (< 2 tokens, NULL text) drop — they have no
      // surprise under the model, matching lmSurprise's contract.
      case "surprise_filter" =>
        val textCol = str(m, "text_col", "text")
        val idCol = str(m, "id_col", "doc_id")
        val maxSurprise = dbl(m, "max_surprise", 10.0)
        df => {
          val kept = TextAnalysis.lmSurprise(
            df.select(col(s"`$idCol`"), col(s"`$textCol`")), idCol, textCol)
            .filter(col("surprise") <= maxSurprise)
            .select(col(s"`$idCol`"))
          df.join(kept, Seq(idCol), "left_semi")
        }

      // duplicated-span gate: drop documents whose winnowed-fingerprint
      // dup fraction crosses the integer-exact threshold; audit columns
      // dropped
      case "span_gate" =>
        val textCol = str(m, "text_col", "text")
        val idCol = str(m, "id_col", "doc_id")
        df => {
          // duplicateSpans emits (id, fingerprint counts, keep) only —
          // survivors rejoin the input by id to stay column-neutral
          val kept = Dedup.duplicateSpans(df, idCol, textCol,
            k = int(m, "k", 8), w = int(m, "w", 8),
            minDocFreq = int(m, "min_doc_freq", 2),
            maxDupFracNum = int(m, "max_dup_frac_num", 1),
            maxDupFracDen = int(m, "max_dup_frac_den", 2))
            .filter(col("keep")).select(col(s"`$idCol`"))
          df.join(kept, Seq(idCol), "left_semi")
        }

      // distilled quality gate: train the logistic classifier on THIS
      // step's input against the Gopher rules, keep rows whose
      // fast-sigmoid score clears `threshold` (exact-portable doubles,
      // so the comparison is deterministic unrounded)
      case "quality_classifier_filter" =>
        val textCol = str(m, "text_col", "text")
        val idCol = str(m, "id_col", "doc_id")
        val iters = int(m, "iters", 8)
        val lr = dbl(m, "lr", 0.5)
        val threshold = dbl(m, "threshold", 0.5)
        df => {
          val xs = Seq("x1", "x2", "x3", "x4")
          val feat = graft.ops.Classify.gateFeatures(
            df.select(col(s"`$idCol`"), col(s"`$textCol`")),
            idCol, textCol, carryCols = Nil)
          val w = graft.ops.Classify.train(feat, xs, "y", iters, lr)
          val keep = feat.filter(graft.ops.Classify.fastSigmoid(
            graft.ops.Classify.z(w.toSeq, xs)) >= threshold)
            .select(col(s"`$idCol`"))
          df.join(keep, Seq(idCol), "left_semi")
        }

      // SemDeDup semantic near-dup removal over an embedding column:
      // k-means cells → within-cell cosine components → keep the
      // farthest-from-centroid copy; survivors rejoin by id so the step
      // stays column-neutral (the embedding column passes through)
      case "semantic_dedup" =>
        val idCol = str(m, "id_col", "doc_id")
        val vecCol = str(m, "vec_col", "embedding")
        str(m, "method", "kmeans") match {
          case "kmeans" => df => {
            val kept = Dedup.semanticDedup(df, idCol, vecCol,
              nlist = int(m, "nlist", 16), iters = int(m, "iters", 2),
              threshold = dbl(m, "threshold", 0.7))
              .select(col("id").as(idCol))
            df.join(kept, Seq(idCol), "left_semi")
          }
          // trained-state-free variant: deterministic hyperplane banding
          // instead of k-means cells, min-id keep instead of the
          // farthest-from-centroid rule — the only semantic-dedup form
          // an incremental pipeline can run (no corpus statistics)
          case "lsh" => df => {
            val pairs = Dedup.embeddingNearDupsLsh(df, idCol, vecCol,
              threshold = dbl(m, "threshold", 0.7),
              bands = int(m, "bands", 16),
              rowsPerBand = int(m, "rows_per_band", 8))
            val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
            val drop = cc.filter(col("id") =!= col("component_id"))
              .select(col("id").as("__drop_id"))
            df.join(drop, df(s"`$idCol`") === col("__drop_id"), "left_anti")
          }
          case other => throw new IllegalArgumentException(
            s"pipeline step `semantic_dedup`: `method:` must be kmeans " +
              s"or lsh, got `$other`")
        }

      // IVF-style coarse cluster assignment: deterministic Lloyd's
      // k-means (init = vectors of the k smallest ids, exact-decimal
      // argmin, order-independent decimal means) trains the coarse
      // quantizer; every row gains its nearest-centroid id — the
      // routing/sharding key an embedding corpus is laid out by. The
      // trained artifact is k×dim doubles (model-bounded, never
      // corpus-sized); assignment is one map-side pass against the
      // broadcast centroids. `mode: frozen` persists the centroid table
      // so incremental batches route under run-1's cells.
      case "cluster_assign" =>
        val vecCol = str(m, "vec_col", "embedding")
        val idCol = str(m, "id_col", "doc_id")
        val outCol = str(m, "out_col", "cluster_id")
        val k = int(m, "k", 8)
        val iters = int(m, "iters", 2)
        df => {
          val cents = graft.ops.Similarity.kmeansCentroids(
            df.select(col(s"`$idCol`"), col(s"`$vecCol`")), idCol, vecCol,
            k, iters)
          df.withColumn(outCol, graft.expressions.PipelineExpressions
            .nearest_centroids(col(s"`$vecCol`"), cents, 1)(0))
        }

      // DSIR domain selection: score every row's hashed-ngram likelihood
      // ratio against the slice matching `target_where:` (a SQL predicate
      // over THIS step's input — e.g. "lang = 'zh'"), then keep either
      // the `top_k:` highest-logw rows or those clearing `min_logw:`
      case "dsir_select" =>
        val idCol = str(m, "id_col", "doc_id")
        val textCol = str(m, "text_col", "text")
        val targetWhere = reqStr(m, "target_where", op)
        val buckets = int(m, "buckets", 4096)
        val topK = m.get("top_k").map(String.valueOf(_).toInt)
        val minLogw = m.get("min_logw").map(String.valueOf(_).toDouble)
        if (topK.isEmpty && minLogw.isEmpty)
          throw new IllegalArgumentException(
            "pipeline step `dsir_select` requires `top_k:` or `min_logw:`")
        df => {
          val slim = df.select(col(s"`$idCol`"), col(s"`$textCol`"))
          // the predicate may reference any input column (not just
          // id/text), so filter the full frame before projecting
          val target = df.filter(expr(targetWhere))
            .select(col(s"`$idCol`"), col(s"`$textCol`"))
          val kept = (topK match {
            case Some(k) => graft.ops.Dsir.selectTopK(slim, target,
              idCol, textCol, k, buckets)
            case None =>
              graft.ops.Dsir.importanceWeights(slim, target,
                idCol, textCol, buckets)
                .filter(col("logw") >= minLogw.get)
          }).select(col(s"`$idCol`"))
          df.join(kept, Seq(idCol), "left_semi")
        }

      // concat-and-chunk batch assembly: append the global token offset
      // + sequence-id span of every row at a fixed seq_len (bucketed
      // distributed prefix sum — no global window); downstream loaders
      // read the spans, so these columns stay in the output
      case "pack_sequences" =>
        val idCol = str(m, "id_col", "doc_id")
        val tokensCol = reqStr(m, "tokens_col", op)
        df => Packing.packSequences(df, idCol, tokensCol,
          seqLen = int(m, "seq_len", 2048),
          sepTokens = int(m, "sep_tokens", 1),
          buckets = int(m, "buckets", 256))

      // token-budget shard assignment: append the training-shard id in
      // id order (≤ 1-doc overflow contract, same prefix-sum machinery)
      case "shard" =>
        val idCol = str(m, "id_col", "doc_id")
        val tokensCol = reqStr(m, "tokens_col", op)
        df => Sampling.packByTokenBudget(df, idCol, tokensCol,
          budget = lng(m, "budget", op),
          shardCol = str(m, "out_col", "shard"),
          buckets = int(m, "buckets", 256))

      // curriculum schedule: append the difficulty band + the
      // band-rotating interleave key (ascending interleave_key = one
      // item per band in rotation, easy→hard within each rotation).
      // LEFT join: rows with a NULL score have no place in the schedule
      // (curriculumOrder drops them) but are NOT a filter step's
      // business to remove — they pass through with NULL band /
      // interleave_key for the caller to route
      case "curriculum" =>
        val idCol = str(m, "id_col", "doc_id")
        val scoreCol = reqStr(m, "score_col", op)
        val bands = int(m, "bands", 4)
        df => {
          val order = Sampling.curriculumOrder(df, idCol, scoreCol, bands)
          df.join(order.select(col(s"`$idCol`"), col("band"),
            col("interleave_key")), Seq(idCol), "left")
        }

      // CDC log compaction: rows are change events (key, change-time,
      // tie-break, op); keep the latest non-delete state per key — the
      // "current table" materialization of an upsert stream, as a
      // pipeline step so a curation model can land compacted state
      // directly. Column-neutral (the op/ts columns ride through).
      case "cdc_compact" =>
        val keyCols = strList(m, "key_cols", op)
        val tsCol = reqStr(m, "ts_col", op)
        val tieCols = m.get("tie_cols") match {
          case Some(v: Seq[_]) => v.map(String.valueOf)
          case _ => Nil
        }
        val opCol = reqStr(m, "op_col", op)
        val deleteOp = str(m, "delete_op", "D")
        df => keepInputColumns(df.columns)(
          graft.ops.Cdc.compact(df, keyCols, tsCol, tieCols, opCol,
            deleteOp))

      // PageRank node weighting: rows are edge occurrences (src, dst);
      // the step aggregates them to a weighted edge list (count, or
      // sum of `weight_col:`), runs the exact-integer power iteration
      // over the nodes appearing in the graph, and appends `out_col:`
      // = the `node_col:` endpoint's rank (e.g. weighting documents by
      // their source-domain's link authority). Rank is the same
      // DECIMAL(38,0) 1e12-unit integer as Graph.pageRank, cast LONG.
      // `weight_col:` values are QUANTIZED to 6 decimal places (the
      // scale-6 accumulator below) — finer fractions round before
      // summing; a group weight sum too large for DECIMAL(38,6) fails
      // loudly instead of dropping the edge (see the overflow guard).
      case "pagerank_weight" =>
        val srcCol = reqStr(m, "src_col", op)
        val dstCol = reqStr(m, "dst_col", op)
        val iters = int(m, "iters", 10)
        val outCol = str(m, "out_col", "rank_u")
        val nodeCol = str(m, "node_col", srcCol)
        val weightCol = m.get("weight_col").map(String.valueOf)
        df => {
          val w = weightCol match {
            // sum at scale 6 THEN convert to integer units: a per-row
            // (38,0) cast would round 0.4-weight edges to 0 before the
            // sum. The uniform 1e6 scale cancels in the rank's w/ow
            // ratios (exact floor division), so integer-weight results
            // are unchanged and ≤6-decimal weights are now exact.
            case Some(wc) =>
              val s6 = (sum(col(s"`$wc`").cast("decimal(38,6)")) *
                lit(1000000L)).cast("decimal(38,0)")
              // a weight sum past DECIMAL(38,6) saturates to NULL
              // (non-ANSI), which would silently drop the group's edge
              // from the rank — surface it as an error instead. A group
              // whose weights are ALL NULL legitimately sums to NULL
              // and passes through (zero non-null weights).
              coalesce(s6, assert_true(
                count(col(s"`$wc`")) === lit(0L),
                lit("pagerank_weight: the scale-6 weight sum " +
                  "overflowed DECIMAL(38,6); pre-scale the weight " +
                  "column into the exact range"))
                .cast("decimal(38,0)"))
            case None => count(lit(1))
          }
          val edges = df
            .groupBy(col(s"`$srcCol`").as("__src"),
              col(s"`$dstCol`").as("__dst"))
            .agg(w.as("__w"))
          val nodes = edges.select(col("__src").as("__id"))
            .unionByName(edges.select(col("__dst").as("__id"))).distinct()
          val ranks = graft.ops.Graph.pageRank(edges, "__src", "__dst",
            "__w", nodes, "__id", iters)
          df.join(ranks.select(col("id").as("__rid"),
              col("ru").cast("long").as(outCol)),
            df(s"`$nodeCol`") === col("__rid"), "left")
            .drop("__rid")
        }

      case other => throw new IllegalArgumentException(
        s"unknown pipeline step op `$other` (known: ${knownOps.mkString(", ")})")
    }
    Step(op, m, fn)
  }
}

/** Frozen-model and incremental-state management for pipeline steps —
  * the state discipline of the reference's incremental machinery
  * (MA/materializations/models/incremental/incremental.sql:2-99;
  * changeset tracking crates/dbt-common/src/changeset.rs:10-18) applied
  * to TRAINED artifacts:
  *
  *   - Trainer-bearing steps (surprise_filter's bigram LM,
  *     quality_classifier_filter's logistic weights, token_count's BPE
  *     merge table, dsir_select's bucket-ratio table) support
  *     `mode: frozen`: the first run trains on the step's own input and
  *     persists the model as a `<model>__model_<op>` side relation;
  *     every later run RELOADS that relation and applies it verbatim —
  *     so increments are gated by the SAME statistics as the base
  *     corpus (training each batch against its own stats is not
  *     reproducible and wrong for drift). The trained artifact is
  *     always round-tripped through the written relation before use, so
  *     run 1 scores under exactly the bytes run 2 will reload.
  *     `mode: retrain` (the default for plain pipelines) keeps the
  *     train-on-own-input behavior. Model relations are bounded by the
  *     model (vocabulary / weight count / buckets), never corpus-sized.
  *   - minhash_dedup inside an `incremental: true` pipeline keeps a
  *     `<model>__state_minhash_dedup` index of every (id, shingle-set,
  *     signature) it has SEEN; an incremental batch dedups against
  *     itself AND that index via Dedup.minhashNearDupsIncremental —
  *     settled old×old pairs are never re-enumerated, and history is
  *     touched only through its narrow signature table. Keep rule: a
  *     new doc survives iff its near-dup component touches NO settled
  *     doc and it is the min-id member (settled rows are already
  *     written and are never retracted — the q_dedup_incremental
  *     contract). The batch's signatures append to the index AFTER the
  *     target write lands.
  *
  * Inside an incremental pipeline every step must be batch-composable:
  * row-local ops pass through, trainer ops are implicitly frozen, and
  * corpus-global ops (mixing to a budget, corpus quantiles, global
  * packing/sharding, exact/fuzzy/semantic dedup without an index) are
  * rejected with the reason — silently wrong increments are worse than
  * a loud error. */
object PipelineModels {
  import PipelineSteps.{Step, str, int, dbl, bool, reqStr,
    keepInputColumns}

  /** Does this step train a model on its own input? */
  def trainerOp(s: Step): Boolean = s.op match {
    case "surprise_filter" | "quality_classifier_filter" |
         "dsir_select" => true
    // robust-stats gates train corpus statistics too: winsorize's clip
    // band and the MAD fence are per-group quantile artifacts, frozen
    // on run 1 exactly like the LM/classifier/ratio models
    case "winsorize" | "mad_outlier_filter" => true
    // the coarse quantizer's centroids are corpus statistics exactly
    // like the LM/classifier/ratio models
    case "cluster_assign" => true
    case "token_count" => str(s.raw, "tokenizer", "whitespace") == "bpe"
    case _ => false
  }

  /** Steps that are pure per-row transforms/filters — batch-composable
    * with no state at all. */
  private val rowLocal = Set("gopher_gate", "normalize", "pii_mask",
    "language_filter", "collapse_repeats", "token_count",
    // chunk explodes each row independently; decontaminate judges each
    // row against a STATIC external benchmark, never corpus statistics
    "chunk", "decontaminate")

  def checkIncrementalLegal(s: Step): Unit = {
    def fail(why: String) = throw new IllegalArgumentException(
      s"pipeline step `${s.op}` cannot run in an incremental pipeline: " +
        why)
    s.op match {
      case op if rowLocal(op) && !trainerOp(s) => ()
      case op if trainerOp(s) =>
        if (str(s.raw, "mode", "frozen") == "retrain")
          fail("`mode: retrain` re-trains on each batch's own input — " +
            "increments would be gated by batch-dependent statistics; " +
            "use `mode: frozen` (the default here)")
        if (op == "dsir_select" && s.raw.contains("top_k"))
          fail("`top_k:` is a corpus-global cut (top-k of one batch is " +
            "not top-k of the corpus); use `min_logw:` — a per-row " +
            "threshold under the frozen ratio table")
      // fuzzy_dedup: the prefix order is a FROZEN trainer artifact (the
      // base corpus's gram-frequency table), so batches are legal —
      // exact-levenshtein verification makes the pair set order-free
      case "minhash_dedup" | "simhash_dedup" | "ngram_dedup"
          | "media_dedup" | "fuzzy_dedup" =>
        if (s.raw.contains("priority_col"))
          fail("`priority_col:` can elect a new doc over an already-" +
            "written settled row, which an append-only increment " +
            "cannot retract; drop priority_col (min-id keep) or " +
            "full-rebuild")
      // exact dedup runs against a persisted text-hash index: a batch
      // row whose text was EVER seen drops, within-batch dups keep the
      // canonical — settled rows never retracted, same contract as the
      // minhash index
      case "exact_dedup" => ()
      case "semantic_dedup" =>
        if (str(s.raw, "method", "kmeans") != "lsh")
          fail("`method: kmeans` clusters the whole corpus — centroids " +
            "are corpus statistics a batch cannot reproduce; use " +
            "`method: lsh` (deterministic hyperplane banding against " +
            "the persisted vector index)")
      case other =>
        fail("it is corpus-global (budgeted mixing, corpus quantiles, " +
          "global packing order, or an index-less dedup); compute it " +
          "over the full corpus in a downstream non-incremental model, " +
          s"or full-rebuild (got: $other)")
    }
  }

  /** Side-relation suffix per step (same occurrence-indexing rule as
    * [[PipelineAudits.relationSuffixes]], so two steps of the same op
    * keep distinct model/state relations). */
  def stepSuffixes(steps: Seq[Step]): Seq[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    steps.map { s =>
      val n = seen.getOrElse(s.op, 0) + 1
      seen(s.op) = n
      if (n == 1) s"_${s.op}" else s"_${s.op}_$n"
    }
  }

  /** Apply one step under management: frozen trainers and the
    * incremental minhash index route through state relations; everything
    * else falls through to the step's own closure. */
  def applyManaged(ctx: MatContext, s: Step, suffix: String,
      df: DataFrame, incremental: Boolean, incrRun: Boolean,
      deferred: scala.collection.mutable.ArrayBuffer[() => Unit])
      : DataFrame = {
    val mode = str(s.raw, "mode",
      if (incremental && trainerOp(s)) "frozen" else "retrain")
    if (mode != "frozen" && mode != "retrain")
      throw new IllegalArgumentException(
        s"pipeline step `${s.op}`: `mode:` must be frozen or retrain, " +
          s"got `$mode`")
    if (s.op == "minhash_dedup" && incremental)
      incrementalMinhash(ctx, s, suffix, df, incrRun, deferred)
    else if (s.op == "exact_dedup" && incremental)
      incrementalExact(ctx, s, suffix, df, incrRun, deferred)
    else if (s.op == "semantic_dedup" && incremental)
      incrementalSemantic(ctx, s, suffix, df, incrRun, deferred)
    else if (s.op == "simhash_dedup" && incremental)
      incrementalSimhash(ctx, s, suffix, df, incrRun, deferred)
    else if (s.op == "ngram_dedup" && incremental)
      incrementalNgram(ctx, s, suffix, df, incrRun, deferred)
    else if (s.op == "media_dedup" && incremental)
      incrementalMedia(ctx, s, suffix, df, incrRun, deferred)
    else if (s.op == "fuzzy_dedup" && incremental)
      incrementalFuzzy(ctx, s, suffix, df, incrRun, deferred)
    else if (trainerOp(s) && mode == "frozen")
      applyFrozen(ctx, s, suffix, df, retrainNow = incremental && !incrRun,
        mustExist = incrRun)
    else s.apply(df)
  }

  private def modelRel(ctx: MatContext, suffix: String) =
    ctx.target.copy(identifier = s"${ctx.target.identifier}__model$suffix")
  private def stateRel(ctx: MatContext, suffix: String) =
    ctx.target.copy(identifier = s"${ctx.target.identifier}__state$suffix")

  /** Output-file sizing for the UNSORTED persisted-index writes (guide
    * §6): the index frames inherit the compute partitioning of their
    * derivation — locally the spread repartition (2×cores), on a cluster
    * the input splits — so every build/append wrote one file PER
    * PARTITION (measured: 64 tiny files per build at sf0.1, 128 after
    * one append) and every later batch pays the listing + open cost on
    * a table it re-reads several times per run. A REBALANCE hint lets
    * AQE size the write adaptively — one file for a tiny local index,
    * advisory-sized files at scale — for one extra exchange of bytes
    * that are about to be written anyway. The range-sorted twins keep
    * their repartitionByRange layout (their file count is already
    * AQE-coalesced and the sort IS their read contract). */
  private def sized(df: DataFrame): DataFrame = df.hint("rebalance")

  /** Idempotence guard for deferred index appends: only rows whose `id`
    * the index has never recorded get appended. A microbatch `lookback`
    * re-run feeds already-settled docs through the batch path again —
    * without this guard every re-run would re-settle them as duplicate
    * index rows, growing the state and double-counting signatures.
    * Shape: the index is probed through its `id` column ALONE via a
    * left_semi against the batch's (small) id set — AQE broadcasts the
    * batch side, so the full-width index rows never shuffle — and the
    * resulting re-seen set (tiny: only genuinely re-run ids) broadcasts
    * into the final anti-join. */
  private def unseenById(rows: DataFrame, index: DataFrame): DataFrame = {
    val seen = index.select(col("id"))
      .join(rows.select(col("id")).distinct(), Seq("id"), "left_semi")
    rows.join(seen, Seq("id"), "left_anti")
  }

  private val ParamsProp = "graft.pipeline.params"

  /** The training parameters a persisted artifact is only valid UNDER:
    * everything apply-time recomputation must share with the stored
    * bytes (minhash k/perms/bands — a batch's signatures must band the
    * index under the values it was built with; DSIR's bucket count —
    * score-time hashing must hit the ratio table's bucket space; the
    * text/id columns) plus the trainer's own knobs (iters/lr, merges)
    * so a config edit can't silently score under stale statistics.
    * Changing any of these between runs joins incompatible artifacts —
    * garbage dedup/scoring, not an error — so the recorded value gates
    * every load below. */
  private[mat] def trainParams(s: Step): String = {
    val kvs: Seq[(String, String)] = s.op match {
      case "minhash_dedup" => Seq(
        "k" -> int(s.raw, "k", 3).toString,
        "perms" -> int(s.raw, "perms", 128).toString,
        "bands" -> int(s.raw, "bands", 21).toString,
        "id_col" -> str(s.raw, "id_col", "doc_id"),
        "text_col" -> str(s.raw, "text_col", "text"))
      case "dsir_select" => Seq(
        "buckets" -> int(s.raw, "buckets", 4096).toString,
        "id_col" -> str(s.raw, "id_col", "doc_id"),
        "text_col" -> str(s.raw, "text_col", "text"))
      case "quality_classifier_filter" => Seq(
        "iters" -> int(s.raw, "iters", 8).toString,
        "lr" -> dbl(s.raw, "lr", 0.5).toString,
        "id_col" -> str(s.raw, "id_col", "doc_id"),
        "text_col" -> str(s.raw, "text_col", "text"))
      case "surprise_filter" => Seq(
        "id_col" -> str(s.raw, "id_col", "doc_id"),
        "text_col" -> str(s.raw, "text_col", "text"))
      case "token_count" => Seq(
        "merges" -> int(s.raw, "merges", 20).toString,
        "max_words" -> str(s.raw, "max_words",
          String.valueOf(Bpe.DefaultMaxWords)),
        "text_col" -> str(s.raw, "text_col", "text"))
      case "winsorize" => Seq(
        "group_col" -> reqStr(s.raw, "group_col", s.op),
        "value_col" -> reqStr(s.raw, "value_col", s.op),
        "lo" -> s"${int(s.raw, "lo_num", 1)}/${int(s.raw, "lo_den", 100)}",
        "hi" -> s"${int(s.raw, "hi_num", 99)}/${int(s.raw, "hi_den", 100)}")
      case "mad_outlier_filter" => Seq(
        "group_col" -> reqStr(s.raw, "group_col", s.op),
        "value_col" -> reqStr(s.raw, "value_col", s.op))
      case "exact_dedup" => Seq(
        // hash format version: v2 = the NULL-sentinel hashExpr. A
        // pre-sentinel index stored sha2(NULL)=NULL rows the new
        // expression never matches, so without this token the first
        // post-upgrade batch would silently re-admit one NULL-text
        // canonical; versioning makes stale-format state fail loudly
        // naming --full-refresh instead.
        "hash" -> "v2",
        "id_col" -> str(s.raw, "id_col", "doc_id"),
        "text_col" -> str(s.raw, "text_col", "text"))
      // threshold/measure stay apply-time: the index stores shingle
      // sets, a pure function of the text — valid under any later
      // threshold or measure
      case "ngram_dedup" => Seq(
        "k" -> int(s.raw, "k", 3).toString,
        "id_col" -> str(s.raw, "id_col", "doc_id"),
        "text_col" -> str(s.raw, "text_col", "text"))
      // q and max_dist are train params: the persisted prefix postings
      // were selected as the q·max_dist+1 rarest grams under the frozen
      // frequency order — a later run with a larger max_dist would need
      // MORE prefix grams than the index stores (silent recall loss)
      case "fuzzy_dedup" => Seq(
        "q" -> int(s.raw, "q", 2).toString,
        "max_dist" -> int(s.raw, "max_dist", 2).toString,
        "id_col" -> str(s.raw, "id_col", "doc_id"),
        "str_col" -> str(s.raw, "str_col", "text"))
      // method IS a train param: the exact method's (nb, ck) key set,
      // the simhash/phash signature tables, and the frames postings
      // are incompatible state formats; max_hamming/threshold/measure
      // stay apply-time; frame_len/stride define the frames postings'
      // element grid, so they train-record too
      case "media_dedup" =>
        val base = Seq(
          "method" -> str(s.raw, "method", "exact"),
          "id_col" -> str(s.raw, "id_col", "doc_id"),
          "payload_col" -> str(s.raw, "payload_col", "payload"))
        if (str(s.raw, "method", "exact") == "frames")
          base ++ Seq(
            "frame_len" -> int(s.raw, "frame_len", 64).toString,
            "stride" -> int(s.raw, "stride", 32).toString)
        else base
      // max_hamming stays apply-time: the index stores signatures, a
      // pure function of the text — valid under any later threshold
      case "simhash_dedup" => Seq(
        "id_col" -> str(s.raw, "id_col", "doc_id"),
        "text_col" -> str(s.raw, "text_col", "text"))
      case "semantic_dedup" => Seq(
        "bands" -> int(s.raw, "bands", 16).toString,
        "rows_per_band" -> int(s.raw, "rows_per_band", 8).toString,
        "id_col" -> str(s.raw, "id_col", "doc_id"),
        "vec_col" -> str(s.raw, "vec_col", "embedding"))
      case "cluster_assign" => Seq(
        "k" -> int(s.raw, "k", 8).toString,
        "iters" -> int(s.raw, "iters", 2).toString,
        "id_col" -> str(s.raw, "id_col", "doc_id"),
        "vec_col" -> str(s.raw, "vec_col", "embedding"))
      case _ => Seq.empty
    }
    kvs.map { case (k, v) => s"$k=$v" }.mkString(";")
  }

  /** A frozen artifact trained under --empty (schema-only input) is
    * DEGENERATE — the marker makes a later real run fail loudly instead
    * of silently scoring under empty statistics. Index state never
    * carries it: an empty corpus has legitimately settled nothing. */
  private val EmptyTrainedMarker = ";trained_on=empty"

  /** Record the step's training parameters on the freshly written
    * model/state relation (after the atomic swap, like every other
    * TBLPROPERTY in this engine). */
  private def recordParams(ctx: MatContext, rel: Relation, s: Step,
      markEmpty: Boolean = false): Unit = {
    val esc = (trainParams(s) +
      (if (markEmpty) EmptyTrainedMarker else ""))
      .replace("'", "''")
    ctx.adapter.execute(
      s"ALTER TABLE ${rel.fqn} SET TBLPROPERTIES ('$ParamsProp' = '$esc')",
      fetch = false)
    ()
  }

  /** Refuse to score/dedup under an artifact trained with different
    * parameters — the failure is LOUD (this error) instead of silent
    * garbage. A relation with no recorded parameters is equally
    * untrusted (pre-upgrade or foreign state). */
  private def checkParams(ctx: MatContext, rel: Relation, s: Step): Unit = {
    val want = trainParams(s)
    val wantEmpty = want + EmptyTrainedMarker
    // NO catch-all here: a transient metastore/IO failure must surface
    // as itself, not be misread as "<none recorded>" — that message
    // prescribes throwing away a valid index for a retryable error.
    // Only the property-genuinely-absent row maps to None.
    val got = ctx.spark
      .sql(s"SHOW TBLPROPERTIES ${rel.fqn} ('$ParamsProp')")
      .collect().headOption.map(_.getString(1))
      .filterNot(_.contains("does not have property"))
    if (got.contains(wantEmpty) && !ctx.emptyMode)
      throw new IllegalStateException(
        s"${rel.fqn}: this artifact was trained on an EMPTY input " +
          "(an --empty dry run, or a source that held no rows yet) — " +
          "scoring real data under empty statistics would silently " +
          "produce garbage; rebuild with --full-refresh")
    if (!got.contains(want) && !(ctx.emptyMode && got.contains(wantEmpty)))
      throw new IllegalStateException(
      s"${rel.fqn}: persisted training parameters " +
        s"(${got.getOrElse("<none recorded>")}) do not match this run's " +
        s"($want) — applying the step under an incompatible artifact " +
        "would silently produce garbage; rebuild with --full-refresh")
  }

  /** Train-or-load discipline: a missing model always trains on this
    * run's input and persists; `retrainNow` (incremental run 1 /
    * --full-refresh) overwrites; an incremental batch (`mustExist`)
    * refuses to train silently. The artifact is ALWAYS read back from
    * the written relation — run 1 scores under the persisted bytes. */
  private def applyFrozen(ctx: MatContext, s: Step, suffix: String,
      df: DataFrame, retrainNow: Boolean, mustExist: Boolean): DataFrame = {
    val rel = modelRel(ctx, suffix)
    val exists = ctx.adapter.relationExists(rel)
    if (!exists && mustExist) throw new IllegalStateException(
      s"${rel.fqn}: frozen model relation missing on an incremental " +
        "batch run — the state was lost; rebuild with --full-refresh")
    if (retrainNow || !exists) {
      ctx.adapter.writeTableAtomic(trainArtifact(ctx, s, df), rel)
      // mark on ACTUAL input emptiness, not just the --empty flag: a
      // pipeline deployed against a still-empty source trains the same
      // degenerate statistics an --empty dry run does (isEmpty is a
      // limit-1 probe — cheap next to the training pass above)
      recordParams(ctx, rel, s, markEmpty = ctx.emptyMode || df.isEmpty)
    } else checkParams(ctx, rel, s)
    applyArtifact(ctx, s, df, ctx.adapter.read(rel))
  }

  /** The persistable trained artifact of one trainer-bearing step. */
  private[mat] def trainArtifact(ctx: MatContext, s: Step,
      df: DataFrame): DataFrame = {
    val sp = ctx.spark
    import sp.implicits._
    s.op match {
      case "surprise_filter" =>
        val idCol = str(s.raw, "id_col", "doc_id")
        val textCol = str(s.raw, "text_col", "text")
        val (big, uni, voc) = TextAnalysis.lmCounts(
          df.select(col(s"`$idCol`"), col(s"`$textCol`")), idCol, textCol)
        // one relation, kind-discriminated: (bigram w1 w2 c12) ∪
        // (prefix w1 - c1) ∪ (vocab - - v)
        big.select(lit("bigram").as("kind"), col("w1"), col("w2"),
            col("c12").as("c"))
          .unionByName(uni.select(lit("prefix").as("kind"), col("w1"),
            lit(null).cast("string").as("w2"), col("c1").as("c")))
          .unionByName(voc.select(lit("vocab").as("kind"),
            lit(null).cast("string").as("w1"),
            lit(null).cast("string").as("w2"), col("v").as("c")))
      case "quality_classifier_filter" =>
        val idCol = str(s.raw, "id_col", "doc_id")
        val textCol = str(s.raw, "text_col", "text")
        val feat = graft.ops.Classify.gateFeatures(
          df.select(col(s"`$idCol`"), col(s"`$textCol`")), idCol, textCol,
          carryCols = Nil)
        val w = graft.ops.Classify.train(feat, classifierXs, "y",
          int(s.raw, "iters", 8), dbl(s.raw, "lr", 0.5))
        w.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
          .toDF("idx", "weight")
      case "token_count" =>
        val textCol = str(s.raw, "text_col", "text")
        val merges = Bpe.train(df, textCol,
          numMerges = int(s.raw, "merges", 20),
          maxWords = s.raw.get("max_words").map(String.valueOf(_).toInt)
            .map(v => if (v <= 0) None else Some(v))
            .getOrElse(Some(Bpe.DefaultMaxWords)))
        merges.zipWithIndex.map { case ((p1, p2), r) => (r, p1, p2) }
          .toDF("rank", "p1", "p2")
      case "dsir_select" =>
        val idCol = str(s.raw, "id_col", "doc_id")
        val textCol = str(s.raw, "text_col", "text")
        val slim = df.select(col(s"`$idCol`"), col(s"`$textCol`"))
        val target = df.filter(expr(reqStr(s.raw, "target_where", s.op)))
          .select(col(s"`$idCol`"), col(s"`$textCol`"))
        graft.ops.Dsir.bucketRatios(slim, target, idCol, textCol,
          int(s.raw, "buckets", 4096))
      // k×dim (cid, i, val) rows — the coarse quantizer's centroids,
      // model-bounded by construction
      case "cluster_assign" =>
        val idCol = str(s.raw, "id_col", "doc_id")
        val vecCol = str(s.raw, "vec_col", "embedding")
        val cents = graft.ops.Similarity.kmeansCentroids(
          df.select(col(s"`$idCol`"), col(s"`$vecCol`")), idCol, vecCol,
          int(s.raw, "k", 8), int(s.raw, "iters", 2))
        cents.zipWithIndex.flatMap { case (arr, cid) =>
          arr.zipWithIndex.map { case (v, i) => (cid, i, v) }
        }.toSeq.toDF("cid", "i", "val")
      // one row per group, bounded by group cardinality: the clip band
      case "winsorize" =>
        Stats.winsorizeBounds(df, reqStr(s.raw, "group_col", s.op),
          reqStr(s.raw, "value_col", s.op),
          int(s.raw, "lo_num", 1), int(s.raw, "lo_den", 100),
          int(s.raw, "hi_num", 99), int(s.raw, "hi_den", 100))
      // one row per group: (median, MAD); `k:` stays apply-time — the
      // fence artifact is valid under any multiplier
      case "mad_outlier_filter" =>
        Stats.madBounds(df, reqStr(s.raw, "group_col", s.op),
          reqStr(s.raw, "value_col", s.op))
      case other => throw new IllegalArgumentException(
        s"step `$other` has no trainable model")
    }
  }

  private val classifierXs = Seq("x1", "x2", "x3", "x4")

  /** Apply one trainer-bearing step under a FROZEN artifact relation. */
  private[mat] def applyArtifact(ctx: MatContext, s: Step, df: DataFrame,
      art: DataFrame): DataFrame = s.op match {
    case "surprise_filter" =>
      val idCol = str(s.raw, "id_col", "doc_id")
      val textCol = str(s.raw, "text_col", "text")
      val kept = TextAnalysis.lmSurpriseScore(
        df.select(col(s"`$idCol`"), col(s"`$textCol`")), idCol, textCol,
        art.filter(col("kind") === "bigram")
          .select(col("w1"), col("w2"), col("c").as("c12")),
        art.filter(col("kind") === "prefix")
          .select(col("w1"), col("c").as("c1")),
        art.filter(col("kind") === "vocab").select(col("c").as("v")))
        .filter(col("surprise") <= dbl(s.raw, "max_surprise", 10.0))
        .select(col(s"`$idCol`"))
      df.join(kept, Seq(idCol), "left_semi")
    case "quality_classifier_filter" =>
      val idCol = str(s.raw, "id_col", "doc_id")
      val textCol = str(s.raw, "text_col", "text")
      // the weight vector is (xs + bias) rows — driver-bounded by
      // construction, same shape Classify.train returns
      val w = art.orderBy("idx").collect().map(_.getDouble(1)).toSeq
      require(w.length == classifierXs.length + 1,
        s"frozen classifier artifact has ${w.length} weights, " +
          s"expected ${classifierXs.length + 1}")
      val feat = graft.ops.Classify.gateFeatures(
        df.select(col(s"`$idCol`"), col(s"`$textCol`")), idCol, textCol,
        carryCols = Nil)
      val keep = feat.filter(graft.ops.Classify.fastSigmoid(
        graft.ops.Classify.z(w, classifierXs)) >=
          dbl(s.raw, "threshold", 0.5))
        .select(col(s"`$idCol`"))
      df.join(keep, Seq(idCol), "left_semi")
    case "token_count" =>
      val textCol = str(s.raw, "text_col", "text")
      val merges = art.orderBy("rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      val out = df.withColumn(str(s.raw, "out_col", "n_tok"),
        Bpe.tokenCount(textCol, merges))
      if (bool(s.raw, "drop_text", dflt = false)) out.drop(textCol) else out
    case "dsir_select" =>
      val idCol = str(s.raw, "id_col", "doc_id")
      val textCol = str(s.raw, "text_col", "text")
      val buckets = int(s.raw, "buckets", 4096)
      val topK = s.raw.get("top_k").map(String.valueOf(_).toInt)
      val minLogw = s.raw.get("min_logw").map(String.valueOf(_).toDouble)
      if (topK.isEmpty && minLogw.isEmpty)
        throw new IllegalArgumentException(
          "pipeline step `dsir_select` requires `top_k:` or `min_logw:`")
      val scored = graft.ops.Dsir.scoreWithRatios(
        df.select(col(s"`$idCol`"), col(s"`$textCol`")), idCol, textCol,
        art, buckets)
      val kept = (topK match {
        case Some(k) =>
          scored.orderBy(col("logw").desc, col(s"`$idCol`").asc).limit(k)
        case None => scored.filter(col("logw") >= minLogw.get)
      }).select(col(s"`$idCol`"))
      df.join(kept, Seq(idCol), "left_semi")
    case "cluster_assign" =>
      val vecCol = str(s.raw, "vec_col", "embedding")
      // k×dim doubles — driver-bounded by the model size, never the corpus
      val cents = graft.ops.Similarity.centroidsFromRows(art)
      df.withColumn(str(s.raw, "out_col", "cluster_id"),
        graft.expressions.PipelineExpressions
          .nearest_centroids(col(s"`$vecCol`"), cents, 1)(0))
    case "winsorize" =>
      val groupCol = reqStr(s.raw, "group_col", s.op)
      val valueCol = reqStr(s.raw, "value_col", s.op)
      val cols = df.columns
      PipelineSteps.keepInputColumns(cols)(
        Stats.clipWithBounds(df, groupCol, valueCol, art)
          .withColumn(valueCol, col("clipped")))
    case "mad_outlier_filter" =>
      val groupCol = reqStr(s.raw, "group_col", s.op)
      val valueCol = reqStr(s.raw, "value_col", s.op)
      PipelineSteps.keepInputColumns(df.columns)(
        Stats.madFlagWithBounds(df, groupCol, valueCol,
          int(s.raw, "k", 3), art).filter(!col("is_outlier")))
    case other => throw new IllegalArgumentException(
      s"step `$other` has no frozen-apply path")
  }

  /** exact_dedup with a persisted text-hash index (incremental
    * pipelines). Full build: the normal canonical keep + persist ONE
    * sha2-256 per distinct text seen, range-sorted. Batch run: keep
    * the within-batch canonical per text, drop any row whose text hash
    * is already in the index (the text was seen — its canonical is
    * settled, an append-only increment cannot re-emit or replace it),
    * and append the batch's NEW hashes after the target write
    * (deferred, so a failed run leaves state untouched). The index is
    * one 32-byte column regardless of document size — at 100 TB the
    * per-batch anti-join exchanges hash bytes only, never text. The
    * 2^-128 collision bound stands in for exactness, the same trade
    * every production-scale hash dedup makes. */
  private def incrementalExact(ctx: MatContext, s: Step, suffix: String,
      df: DataFrame, incrRun: Boolean,
      deferred: scala.collection.mutable.ArrayBuffer[() => Unit])
      : DataFrame = {
    val textCol = str(s.raw, "text_col", "text")
    val rel = stateRel(ctx, suffix)
    // NULL-safe: sha2(NULL) is NULL, which an anti-join can never match
    // — a NULL-text canonical would survive EVERY batch and a NULL hash
    // row would re-append each run, silently diverging from the
    // full-corpus operator (which groups NULLs into one canonical). The
    // marker cannot collide with a real hash (sha2 hex is 64 chars).
    def hashExpr(c: Column): Column =
      when(c.isNull, lit("__NULL__"))
        .otherwise(sha2(c.cast("string"), 256))
    def hashOf(d: DataFrame) =
      d.select(hashExpr(col(s"`$textCol`")).as("h")).distinct()
    if (!incrRun) {
      ctx.adapter.writeTableAtomic(hashOf(df), rel, sortBy = Seq("h"))
      recordParams(ctx, rel, s)
      s.apply(df)
    } else {
      if (!ctx.adapter.relationExists(rel)) throw new IllegalStateException(
        s"${rel.fqn}: exact-dedup state relation missing on an " +
          "incremental batch run — the state was lost; rebuild with " +
          "--full-refresh")
      checkParams(ctx, rel, s)
      val state = ctx.adapter.read(rel)
      val canon = s.apply(df)
      val kept = canon.join(state,
        hashExpr(canon(s"`$textCol`")) === state("h"), "left_anti")
      deferred += (() => {
        val fresh = hashOf(df)
          .join(ctx.adapter.read(rel), Seq("h"), "left_anti")
        ctx.adapter.appendToTable(
          fresh.repartitionByRange(col("h")).sortWithinPartitions(col("h")),
          rel)
      })
      kept
    }
  }

  /** minhash_dedup with a persisted signature index (incremental
    * pipelines). Full build: normal dedup + persist every (id, shh,
    * sig) seen. Batch run: near-dup pairs of the batch against itself
    * AND the index; a new doc survives iff its component touches no
    * settled doc and it is the min-id member; the batch's signatures
    * append to the index after the target write (deferred). */
  private def incrementalMinhash(ctx: MatContext, s: Step, suffix: String,
      df: DataFrame, incrRun: Boolean,
      deferred: scala.collection.mutable.ArrayBuffer[() => Unit])
      : DataFrame = {
    val idCol = str(s.raw, "id_col", "doc_id")
    val textCol = str(s.raw, "text_col", "text")
    val k = int(s.raw, "k", 3)
    val perms = int(s.raw, "perms", 128)
    val bands = int(s.raw, "bands", 21)
    val threshold = dbl(s.raw, "threshold", 0.8)
    val rel = stateRel(ctx, suffix)
    // The index persists as TWO relations: the signature table (id,
    // shh, sig — the heavy arrays the exact-Jaccard verify needs) and
    // its NARROW banded twin (id, band, bandhash), range-laid-out by
    // (band, bandhash) so each parquet file covers a disjoint key
    // range. Batch runs band the history by scanning three integer
    // columns — never re-folding xxhash over every stored signature
    // array — and the sorted layout lets Spark's runtime semi-join
    // filters prune row groups the batch's buckets don't touch. At
    // 100 TB the sig/shh arrays dominate the index's bytes; this keeps
    // them out of the per-batch candidate path entirely.
    val bandsRel = rel.copy(identifier = s"${rel.identifier}_bands")
    if (!incrRun) {
      // full build: persist first, pair from the PERSISTED index (the
      // bytes later batches will join against), then canonical keep
      val sigs = Dedup.minhashSignatures(df, idCol, textCol, k, perms)
      ctx.adapter.writeTableAtomic(sized(sigs), rel)
      recordParams(ctx, rel, s)
      ctx.adapter.writeTableAtomic(
        Dedup.bandedRows(ctx.adapter.read(rel), perms, bands), bandsRel,
        sortBy = Seq("band", "bandhash"))
      val pairs = Dedup.minhashNearDupsFromSigs(ctx.adapter.read(rel),
        perms, bands, threshold, Dedup.maxBandBucket(df))
      keepInputColumns(df.columns)(Dedup.canonicalCorpus(df, pairs, idCol))
    } else {
      if (!ctx.adapter.relationExists(rel)) throw new IllegalStateException(
        s"${rel.fqn}: minhash signature index missing on an incremental " +
          "batch run — the state was lost; rebuild with --full-refresh")
      checkParams(ctx, rel, s)
      val index = ctx.adapter.read(rel)
      // pre-upgrade state may lack the banded twin: it is a pure
      // derivation of the signature table, so derive it in-memory for
      // this run and persist it with the deferred state writes below
      val bandsExist = ctx.adapter.relationExists(bandsRel)
      val bandedIdx =
        if (bandsExist) ctx.adapter.read(bandsRel)
        else Dedup.bandedRows(index, perms, bands)
      val newSigs = Dedup.maybeCache(
        Dedup.minhashSignatures(df, idCol, textCol, k, perms))
      val pairs = Dedup.minhashNearDupsIncrementalFromSigs(newSigs,
        index, bandedIdx, perms, bands, threshold,
        Dedup.maxBandBucket(df))
      val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      val settledComps = cc
        .join(index.select(col("id").as("__sid")), cc("id") === col("__sid"),
          "left_semi")
        .select(col("component_id").as("__sc")).distinct()
      // drop: any clustered doc whose component touches a settled doc,
      // plus non-min members of pure-new components (settled ids in the
      // drop list are harmless — the anti-join only affects batch rows)
      val drop = cc
        .join(settledComps, cc("component_id") === col("__sc"), "left")
        .filter(col("__sc").isNotNull || col("id") =!= col("component_id"))
        .select(col("id").as("__drop_id"))
      val kept = df.join(drop, df(s"`$idCol`") === col("__drop_id"),
        "left_anti")
      deferred += (() => {
        // materialize the idempotence-filtered rows ONCE, before the
        // first append: both appends below would otherwise re-evaluate
        // the anti-join against the index AFTER the signature append
        // landed and see their own rows as already-settled (an eager
        // localCheckpoint pins batch-sized blocks — never corpus-sized)
        val freshSigs = unseenById(newSigs, index).localCheckpoint(true)
        ctx.adapter.appendToTable(sized(freshSigs), rel)
        if (bandsExist)
          ctx.adapter.appendToTable(
            Dedup.bandedRows(freshSigs, perms, bands)
              .repartitionByRange(col("band"), col("bandhash"))
              .sortWithinPartitions(col("band"), col("bandhash")),
            bandsRel)
        else ctx.adapter.writeTableAtomic(
          Dedup.bandedRows(ctx.adapter.read(rel), perms, bands),
          bandsRel, sortBy = Seq("band", "bandhash"))
        // the state appends were the last readers of the cached batch
        // signatures — release the blocks so repeated batch runs in a
        // long-lived session don't accumulate eviction pressure
        newSigs.unpersist()
        ()
      })
      kept
    }
  }

  /** semantic_dedup (`method: lsh`) with a persisted vector index
    * (incremental pipelines). Full build: persist every (id, v, norm)
    * seen plus its NARROW banded twin (id, band, sig) range-laid-out by
    * (band, sig); pair from the PERSISTED vectors (the bytes later
    * batches join against) and keep the min-id member per component.
    * Batch run: near-dup pairs of the batch against itself AND the
    * index — history touched only through the banded twin, pre-pruned
    * to the batch's buckets — then the settled-keep rule: a new doc
    * survives iff its component touches no settled doc and it is the
    * min-id member; the batch's vectors and banded rows append after
    * the target write (deferred). Signatures come from the fixed
    * hyperplane model, not trained state, so batch recall per pair is
    * identical to the full-corpus operator. */
  private def incrementalSemantic(ctx: MatContext, s: Step, suffix: String,
      df: DataFrame, incrRun: Boolean,
      deferred: scala.collection.mutable.ArrayBuffer[() => Unit])
      : DataFrame = {
    val idCol = str(s.raw, "id_col", "doc_id")
    val vecCol = str(s.raw, "vec_col", "embedding")
    val bands = int(s.raw, "bands", 16)
    val rpb = int(s.raw, "rows_per_band", 8)
    val threshold = dbl(s.raw, "threshold", 0.7)
    val rel = stateRel(ctx, suffix)
    val bandsRel = rel.copy(identifier = s"${rel.identifier}_bands")
    def dropNonCanonical(pairs: DataFrame, base: DataFrame): DataFrame = {
      val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      val drop = cc.filter(col("id") =!= col("component_id"))
        .select(col("id").as("__drop_id"))
      base.join(drop, base(s"`$idCol`") === col("__drop_id"), "left_anti")
    }
    if (!incrRun) {
      val vecs = Dedup.embeddingVectors(df, idCol, vecCol)
      ctx.adapter.writeTableAtomic(sized(vecs), rel)
      recordParams(ctx, rel, s)
      ctx.adapter.writeTableAtomic(
        Dedup.embeddingBandedRows(ctx.adapter.read(rel), bands, rpb),
        bandsRel, sortBy = Seq("band", "sig"))
      val pairs = Dedup.embeddingNearDupsLshFromVecs(ctx.adapter.read(rel),
        threshold, bands, rpb, Dedup.maxBandBucket(df))
      dropNonCanonical(pairs, df)
    } else {
      if (!ctx.adapter.relationExists(rel)) throw new IllegalStateException(
        s"${rel.fqn}: semantic-dedup vector index missing on an " +
          "incremental batch run — the state was lost; rebuild with " +
          "--full-refresh")
      checkParams(ctx, rel, s)
      val index = ctx.adapter.read(rel)
      val bandsExist = ctx.adapter.relationExists(bandsRel)
      val bandedIdx =
        if (bandsExist) ctx.adapter.read(bandsRel)
        else Dedup.embeddingBandedRows(index, bands, rpb)
      val newVecs = Dedup.maybeCache(
        Dedup.embeddingVectors(df, idCol, vecCol))
      val pairs = Dedup.embeddingNearDupsLshIncremental(newVecs, index,
        bandedIdx, threshold, bands, rpb, Dedup.maxBandBucket(df))
      val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      val settledComps = cc
        .join(index.select(col("id").as("__sid")), cc("id") === col("__sid"),
          "left_semi")
        .select(col("component_id").as("__sc")).distinct()
      val drop = cc
        .join(settledComps, cc("component_id") === col("__sc"), "left")
        .filter(col("__sc").isNotNull || col("id") =!= col("component_id"))
        .select(col("id").as("__drop_id"))
      val kept = df.join(drop, df(s"`$idCol`") === col("__drop_id"),
        "left_anti")
      deferred += (() => {
        // see incrementalMinhash: materialize pre-append, once
        val freshVecs = unseenById(newVecs, index).localCheckpoint(true)
        ctx.adapter.appendToTable(sized(freshVecs), rel)
        if (bandsExist) {
          val nb = Dedup.embeddingBandedRows(freshVecs, bands, rpb)
          ctx.adapter.appendToTable(
            nb.repartitionByRange(col("band"), col("sig"))
              .sortWithinPartitions(col("band"), col("sig")),
            bandsRel)
        } else ctx.adapter.writeTableAtomic(
          Dedup.embeddingBandedRows(ctx.adapter.read(rel), bands, rpb),
          bandsRel, sortBy = Seq("band", "sig"))
        newVecs.unpersist()
        ()
      })
      kept
    }
  }

  /** simhash_dedup with a persisted signature index (incremental
    * pipelines). Full build: normal min-id keep + persist FIVE ints per
    * document (id, c0..c3) plus the narrow (id, band, bv) banded twin,
    * range-sorted by (band, bv). Batch run: near-dup pairs of the batch
    * against itself AND the pruned index (settled-keep: a new doc whose
    * component touches ANY settled doc drops, pure-new components keep
    * min id); the batch's signatures and banded rows append after the
    * target write (deferred). With hamming ≤ 3 and 4 chunks the
    * pigeonhole bound makes per-pair recall EXACT, so incremental
    * results compose identically to the full-corpus operator — the
    * index never stores text, and at 100 TB a batch exchanges only
    * int rows pre-pruned to its own buckets. */
  private def incrementalSimhash(ctx: MatContext, s: Step, suffix: String,
      df: DataFrame, incrRun: Boolean,
      deferred: scala.collection.mutable.ArrayBuffer[() => Unit])
      : DataFrame = {
    val idCol = str(s.raw, "id_col", "doc_id")
    val textCol = str(s.raw, "text_col", "text")
    incrementalSimhashCore(ctx, s, suffix, df, incrRun, deferred,
      idCol, int(s.raw, "max_hamming", 3),
      d => Dedup.simhashSignatures(d, idCol, textCol))
  }

  /** The persisted-signature-index discipline shared by text
    * simhash_dedup and media_dedup(method: simhash) — only the
    * signature derivation differs (`sigsOf` must yield (id, c0..c3);
    * rows it omits, e.g. corrupt media payloads, never cluster and are
    * always kept). */
  private def incrementalSimhashCore(ctx: MatContext, s: Step,
      suffix: String, df: DataFrame, incrRun: Boolean,
      deferred: scala.collection.mutable.ArrayBuffer[() => Unit],
      idCol: String, maxHamming: Int,
      sigsOf: DataFrame => DataFrame): DataFrame = {
    val rel = stateRel(ctx, suffix)
    val bandsRel = rel.copy(identifier = s"${rel.identifier}_bands")
    if (!incrRun) {
      val sigs = sigsOf(df)
      ctx.adapter.writeTableAtomic(sized(sigs), rel)
      recordParams(ctx, rel, s)
      ctx.adapter.writeTableAtomic(
        Dedup.simhashBandedRows(ctx.adapter.read(rel)), bandsRel,
        sortBy = Seq("band", "bv"))
      val pairs = Dedup.simhashNearDupsFromSigs(ctx.adapter.read(rel),
        maxHamming, Dedup.maxBandBucket(df))
      keepInputColumns(df.columns)(Dedup.canonicalCorpus(df, pairs, idCol))
    } else {
      if (!ctx.adapter.relationExists(rel)) throw new IllegalStateException(
        s"${rel.fqn}: simhash signature index missing on an incremental " +
          "batch run — the state was lost; rebuild with --full-refresh")
      checkParams(ctx, rel, s)
      val index = ctx.adapter.read(rel)
      val bandsExist = ctx.adapter.relationExists(bandsRel)
      val bandedIdx =
        if (bandsExist) ctx.adapter.read(bandsRel)
        else Dedup.simhashBandedRows(index)
      val newSigs = Dedup.maybeCache(sigsOf(df))
      val pairs = Dedup.simhashNearDupsIncrementalFromSigs(newSigs, index,
        bandedIdx, maxHamming, Dedup.maxBandBucket(df))
      val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      val settledComps = cc
        .join(index.select(col("id").as("__sid")), cc("id") === col("__sid"),
          "left_semi")
        .select(col("component_id").as("__sc")).distinct()
      val drop = cc
        .join(settledComps, cc("component_id") === col("__sc"), "left")
        .filter(col("__sc").isNotNull || col("id") =!= col("component_id"))
        .select(col("id").as("__drop_id"))
      val kept = df.join(drop, df(s"`$idCol`") === col("__drop_id"),
        "left_anti")
      deferred += (() => {
        // see incrementalMinhash: materialize pre-append, once
        val freshSigs = unseenById(newSigs, index).localCheckpoint(true)
        ctx.adapter.appendToTable(sized(freshSigs), rel)
        if (bandsExist)
          ctx.adapter.appendToTable(
            Dedup.simhashBandedRows(freshSigs)
              .repartitionByRange(col("band"), col("bv"))
              .sortWithinPartitions(col("band"), col("bv")),
            bandsRel)
        else ctx.adapter.writeTableAtomic(
          Dedup.simhashBandedRows(ctx.adapter.read(rel)), bandsRel,
          sortBy = Seq("band", "bv"))
        newSigs.unpersist()
        ()
      })
      kept
    }
  }

  /** ngram_dedup with a persisted shingle-set index (incremental
    * pipelines). Full build: normal min-id keep + persist every (id,
    * shh) shingle set plus the NARROW postings twin (id, s) — one long
    * per (doc, distinct shingle) — range-sorted by s. Batch run:
    * candidates of the batch against itself AND the postings, left-semi
    * pruned to the batch's own shingles BEFORE pairing (settled-keep: a
    * new doc whose verified component touches ANY settled doc drops,
    * pure-new components keep min id); the batch's sets and postings
    * append after the target write (deferred). Verification is the
    * EXACT set measure (jaccard or containment) over stored sets, so
    * incremental results compose identically to the full-corpus
    * operator up to the shared hot-shingle cap — at 100 TB a batch
    * exchanges only pre-pruned long rows, and the heavy arrays are read
    * for verified candidate ids alone. Containment is the natural
    * incremental contamination gate: each batch asks "is this new doc
    * (mostly) contained in anything the corpus has EVER seen". */
  private def incrementalNgram(ctx: MatContext, s: Step, suffix: String,
      df: DataFrame, incrRun: Boolean,
      deferred: scala.collection.mutable.ArrayBuffer[() => Unit])
      : DataFrame = {
    val idCol = str(s.raw, "id_col", "doc_id")
    val textCol = str(s.raw, "text_col", "text")
    val k = int(s.raw, "k", 3)
    incrementalSetsCore(ctx, s, suffix, df, incrRun, deferred, idCol,
      dbl(s.raw, "threshold", 0.8), str(s.raw, "measure", "jaccard"),
      d => Dedup.shingleSets(d, idCol, textCol, k))
  }

  /** Shared sets-postings incremental core for the n-gram-MEASURE family
    * — word shingles (`ngram_dedup`) and media frame signatures
    * (`media_dedup` method: frames): the state is the (id, shh) set
    * table plus the narrow (id, s) postings twin range-sorted by `s`;
    * a batch pairs against history through postings pruned to the
    * batch's own element values, verifies the exact measure, applies
    * settled-keep, and defers unseenById appends. `threshold`/`measure`
    * stay apply-time (the sets are a pure function of the content,
    * valid under any later threshold); whatever parameterizes `setsOf`
    * (k, frame_len, stride) must be a RECORDED train param at the call
    * site — the persisted postings are only comparable under the same
    * element definition. */
  private def incrementalSetsCore(ctx: MatContext, s: Step, suffix: String,
      df: DataFrame, incrRun: Boolean,
      deferred: scala.collection.mutable.ArrayBuffer[() => Unit],
      idCol: String, threshold: Double, measure: String,
      setsOf: DataFrame => DataFrame): DataFrame = {
    val maxDf = ctx.spark.conf
      .get("spark.graft.maxShingleDf", "1000").toInt
    val rel = stateRel(ctx, suffix)
    val gramsRel = rel.copy(identifier = s"${rel.identifier}_grams")
    if (!incrRun) {
      val sets = setsOf(df)
      ctx.adapter.writeTableAtomic(sized(sets), rel)
      recordParams(ctx, rel, s)
      ctx.adapter.writeTableAtomic(
        Dedup.shinglePostings(ctx.adapter.read(rel)), gramsRel,
        sortBy = Seq("s"))
      val pairs = Dedup.ngramNearDupsFromSets(ctx.adapter.read(rel),
        threshold, measure, maxDf)
      keepInputColumns(df.columns)(Dedup.canonicalCorpus(df, pairs, idCol))
    } else {
      if (!ctx.adapter.relationExists(rel)) throw new IllegalStateException(
        s"${rel.fqn}: element-set index (shingles / frame signatures) " +
          "missing on an incremental batch run — the state was lost; " +
          "rebuild with --full-refresh")
      checkParams(ctx, rel, s)
      val index = ctx.adapter.read(rel)
      val gramsExist = ctx.adapter.relationExists(gramsRel)
      val postingsIdx =
        if (gramsExist) ctx.adapter.read(gramsRel)
        else Dedup.shinglePostings(index)
      val newSets = Dedup.maybeCache(setsOf(df))
      val pairs = Dedup.ngramNearDupsIncrementalFromSets(newSets, index,
        postingsIdx, threshold, measure, maxDf)
      val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      val settledComps = cc
        .join(index.select(col("id").as("__sid")), cc("id") === col("__sid"),
          "left_semi")
        .select(col("component_id").as("__sc")).distinct()
      val drop = cc
        .join(settledComps, cc("component_id") === col("__sc"), "left")
        .filter(col("__sc").isNotNull || col("id") =!= col("component_id"))
        .select(col("id").as("__drop_id"))
      val kept = df.join(drop, df(s"`$idCol`") === col("__drop_id"),
        "left_anti")
      deferred += (() => {
        // see incrementalMinhash: materialize pre-append, once
        val freshSets = unseenById(newSets, index).localCheckpoint(true)
        ctx.adapter.appendToTable(sized(freshSets), rel)
        if (gramsExist)
          ctx.adapter.appendToTable(
            Dedup.shinglePostings(freshSets)
              .repartitionByRange(col("s"))
              .sortWithinPartitions(col("s")),
            gramsRel)
        else ctx.adapter.writeTableAtomic(
          Dedup.shinglePostings(ctx.adapter.read(rel)), gramsRel,
          sortBy = Seq("s"))
        newSets.unpersist()
        ()
      })
      kept
    }
  }

  /** media_dedup with persisted indexes (incremental pipelines) — the
    * multimodal corpus keeps the same continuous-ingest contract as
    * text. `method: exact`: the state is the NARROW (n_bytes, body
    * checksum) key set of every VALID payload seen, range-sorted by
    * checksum; a batch row whose body was EVER seen drops, within-batch
    * dups keep the canonical, corrupt payloads are always kept and
    * never enter the state. `method: simhash` / `method: phash`: the
    * state is the same 5-int signature table + banded twin as text
    * simhash (signatures from the body tokens, or from the decoded
    * pixels via the DCT pHash), running through
    * [[incrementalSimhashCore]] — corrupt payloads have no signature,
    * never cluster, and are always kept. `method: audio` runs the
    * envelope-spectrum fingerprint ([[graft.ops.AudioHash]]) through
    * the identical core. Method is a recorded train
    * param: the state formats (and hash functions) are incompatible. */
  private def incrementalMedia(ctx: MatContext, s: Step, suffix: String,
      df: DataFrame, incrRun: Boolean,
      deferred: scala.collection.mutable.ArrayBuffer[() => Unit])
      : DataFrame = {
    val idCol = str(s.raw, "id_col", "doc_id")
    val payloadCol = str(s.raw, "payload_col", "payload")
    val method = str(s.raw, "method", "exact")
    if (method == "frames") {
      // clip/re-mux detection over a persisted frame-signature index —
      // the n-gram sets-postings core with frames as the elements;
      // frame_len/stride are recorded train params (the postings are
      // only comparable under the same frame grid)
      incrementalSetsCore(ctx, s, suffix, df, incrRun, deferred, idCol,
        dbl(s.raw, "threshold", 0.5), str(s.raw, "measure", "containment"),
        d => Multimodal.frameSets(d, idCol, payloadCol,
          int(s.raw, "frame_len", 64), int(s.raw, "stride", 32)))
    } else if (method == "simhash" || method == "phash" ||
        method == "audio") {
      // all three persist the same 5-int signature format; which hash
      // filled it is a recorded train param, so the formats can never mix
      val sigsOf: DataFrame => DataFrame =
        if (method == "phash")
          d => Multimodal.phashSignatures(d, idCol, payloadCol)
        else if (method == "audio")
          d => Multimodal.audioSignatures(d, idCol, payloadCol)
        else
          d => Dedup.simhashSignatures(
            d.filter(Multimodal.isGrft(payloadCol))
              .withColumn("__body", Multimodal.bodyText(payloadCol)),
            idCol, "__body")
      incrementalSimhashCore(ctx, s, suffix, df, incrRun, deferred,
        idCol, int(s.raw, "max_hamming", 3), sigsOf)
    } else {
      val rel = stateRel(ctx, suffix)
      def keysOf(d: DataFrame): DataFrame =
        Multimodal.withChecksum(d, payloadCol)
          .filter(col("__media_valid"))
          .select(col("__n_bytes").as("nb"), col("__checksum").as("ck"))
          .distinct()
      if (!incrRun) {
        ctx.adapter.writeTableAtomic(keysOf(df), rel, sortBy = Seq("ck"))
        recordParams(ctx, rel, s)
        s.apply(df)
      } else {
        if (!ctx.adapter.relationExists(rel)) throw new IllegalStateException(
          s"${rel.fqn}: media checksum index missing on an incremental " +
            "batch run — the state was lost; rebuild with --full-refresh")
        checkParams(ctx, rel, s)
        val state = ctx.adapter.read(rel)
        val canon = s.apply(df) // within-batch exact dedup first
        val ck = Multimodal.withChecksum(canon, payloadCol)
        val kept = ck.join(state,
            ck("__n_bytes") === state("nb") &&
              ck("__checksum") === state("ck") && col("__media_valid"),
            "left_anti")
          .select(df.columns.map(c => col(s"`$c`")).toIndexedSeq: _*)
        deferred += (() => {
          val fresh = keysOf(df)
            .join(ctx.adapter.read(rel), Seq("nb", "ck"), "left_anti")
          ctx.adapter.appendToTable(
            fresh.repartitionByRange(col("ck")).sortWithinPartitions(col("ck")),
            rel)
        })
        kept
      }
    }
  }

  /** fuzzy_dedup with a persisted string index (incremental pipelines).
    * Three relations: the (id, str) strings seen, the FROZEN (gram, f)
    * frequency table trained on run 1 (vocabulary-bounded — it defines
    * the global prefix order and is NEVER appended; unseen grams rank
    * rarest by rule, identically in every batch), and the NARROW
    * (id, gram) prefix-posting twin range-sorted by gram. Batch runs
    * select their prefixes under the frozen order, left-semi prune the
    * postings to their own grams BEFORE pairing, join strings back only
    * for length-banded candidates, verify exact levenshtein, apply the
    * settled-keep rule, and append strings + batch postings after the
    * target write lands. Recall is EXACT: the q·k+1 prefix lemma needs
    * only a common total order (which freezing provides), and the
    * verification is exact either way — so batch composition ≡ the
    * full-corpus operator. max_dist/q are recorded train params (the
    * stored prefix size is q·max_dist+1). */
  private def incrementalFuzzy(ctx: MatContext, s: Step, suffix: String,
      df: DataFrame, incrRun: Boolean,
      deferred: scala.collection.mutable.ArrayBuffer[() => Unit])
      : DataFrame = {
    val idCol = str(s.raw, "id_col", "doc_id")
    val strCol = str(s.raw, "str_col", "text")
    val maxDist = int(s.raw, "max_dist", 2)
    val q = int(s.raw, "q", 2)
    val rel = stateRel(ctx, suffix)
    val freqRel = rel.copy(identifier = s"${rel.identifier}_freq")
    val gramsRel = rel.copy(identifier = s"${rel.identifier}_grams")
    def stringsOf(d: DataFrame): DataFrame =
      d.select(col(s"`$idCol`").as("id"), col(s"`$strCol`").as("str"))
        .filter(col("str").isNotNull)
    if (!incrRun) {
      ctx.adapter.writeTableAtomic(sized(stringsOf(df)), rel)
      // markEmpty: the FROZEN gram-frequency order is a trained
      // artifact — built on an empty input it degenerates (every gram
      // "rarest", prefix buckets inflate toward the quadratic Ed-Join
      // collapse), so a later real run must fail loudly like the other
      // frozen trainers
      recordParams(ctx, rel, s, markEmpty = ctx.emptyMode || df.isEmpty)
      ctx.adapter.writeTableAtomic(
        sized(FuzzyJoin.gramFrequencies(df, strCol, q)), freqRel)
      ctx.adapter.writeTableAtomic(
        FuzzyJoin.prefixGramsFrozen(ctx.adapter.read(rel), "id", "str",
          ctx.adapter.read(freqRel), maxDist, q),
        gramsRel, sortBy = Seq("gram"))
      // pair from the PERSISTED strings; any prefix order yields the
      // same exact-verified pair set
      val pairs = FuzzyJoin.editDistanceSelfJoin(
        ctx.adapter.read(rel), "id", "str", maxDist, q)
      keepInputColumns(df.columns)(Dedup.canonicalCorpus(df, pairs, idCol))
    } else {
      if (!ctx.adapter.relationExists(rel)) throw new IllegalStateException(
        s"${rel.fqn}: fuzzy string index missing on an incremental " +
          "batch run — the state was lost; rebuild with --full-refresh")
      checkParams(ctx, rel, s)
      val index = ctx.adapter.read(rel)
      val frozenFreq =
        if (ctx.adapter.relationExists(freqRel)) ctx.adapter.read(freqRel)
        else FuzzyJoin.gramFrequencies(
          index.withColumnRenamed("str", strCol), strCol, q)
      val indexPrefix =
        if (ctx.adapter.relationExists(gramsRel)) ctx.adapter.read(gramsRel)
        else FuzzyJoin.prefixGramsFrozen(index, "id", "str", frozenFreq,
          maxDist, q)
      val pairs = FuzzyJoin.editDistanceIncremental(df, idCol, strCol,
        index, indexPrefix, frozenFreq, maxDist, q)
      val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      val settledComps = cc
        .join(index.select(col("id").as("__sid")), cc("id") === col("__sid"),
          "left_semi")
        .select(col("component_id").as("__sc")).distinct()
      val drop = cc
        .join(settledComps, cc("component_id") === col("__sc"), "left")
        .filter(col("__sc").isNotNull || col("id") =!= col("component_id"))
        .select(col("id").as("__drop_id"))
      val kept = df.join(drop, df(s"`$idCol`") === col("__drop_id"),
        "left_anti")
      deferred += (() => {
        // see incrementalMinhash: materialize pre-append, once
        val freshStrs = unseenById(stringsOf(df), index).localCheckpoint(true)
        ctx.adapter.appendToTable(sized(freshStrs), rel)
        ctx.adapter.appendToTable(
          FuzzyJoin.prefixGramsFrozen(freshStrs, "id", "str",
              frozenFreq, maxDist, q)
            .repartitionByRange(col("gram"))
            .sortWithinPartitions(col("gram")),
          gramsRel)
        // the frozen frequency table is deliberately NOT updated
        ()
      })
      kept
    }
  }
}

/** `materialized='streaming_table'`: a Structured Streaming model — the
  * compiled SELECT defines the stream's content (staged to a directory
  * and replayed through a file stream source, exactly how a bounded
  * backfill of an arriving-files lake runs), a configured stateful
  * operator transforms it, and the bounded AvailableNow run lands in the
  * target table through the same atomic write as any table model.
  *
  * `state_ttl:` (ISO-8601 duration, e.g. "PT1H") is the operator's
  * processing-time state TTL — the unbounded-key-count guard a
  * CONTINUOUS deployment of the same model needs (see
  * graft.streaming.StreamingOps scaladoc). The bounded AvailableNow
  * build PARSES and VALIDATES it, records it on the built table
  * (TBLPROPERTY `graft.streaming.state_ttl`), but does NOT arm it:
  * arming ProcessingTimeTimeout makes the engine always "have another
  * batch" so AvailableNow never terminates, and a timeout that DID fire
  * mid-replay would make the bounded result depend on wall-clock batch
  * pacing — nondeterministic, never oracle-checkable. A continuous
  * deployment of the same configured transform arms it via
  * [[StreamingTableMat.buildStream]] (`armTtl = true`), the exact code
  * path `StreamingTableMatSpec` drives with a MemoryStream.
  *
  * ```yaml
  * models:
  *   - name: sessions
  *     config:
  *       materialized: streaming_table
  *       stream_op: sessionize      # sessionize | dedup | funnel
  *       gap_minutes: 30
  *       state_ttl: PT1H
  * ```
  */
object StreamingTableMat extends Materialization {
  import graft.streaming.StreamingOps
  import org.apache.spark.sql.streaming.Trigger
  import java.nio.file.Files

  val name = "streaming_table"

  private[graft] def parseTtl(cfg: Map[String, Any]): Option[java.time.Duration] =
    cfg.get("state_ttl").map(String.valueOf)
      .filter(_.nonEmpty).map { s =>
        try java.time.Duration.parse(s)
        catch {
          case _: java.time.format.DateTimeParseException =>
            throw new IllegalArgumentException(
              s"state_ttl must be an ISO-8601 duration (e.g. PT1H): $s")
        }
      }

  /** Event-time column → exact Long microseconds (the ops' arithmetic
    * domain); accepts timestamp or already-µs long columns. */
  private def usOf(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType => col(s"`$tsCol`")
      case _ => unix_micros(col(s"`$tsCol`"))
    }

  /** The configured stateful transform over an already-constructed
    * stream — the single definition both execution modes share.
    * `armTtl = false` (the bounded AvailableNow build): `state_ttl` is
    * parsed and validated but the ops run with NoTimeout, because armed
    * processing-time timeouts (a) keep AvailableNow from ever
    * terminating — the engine always "has another batch" to service
    * timeouts — and (b) would tie the bounded result to wall-clock
    * batch pacing. `armTtl = true` (a continuous deployment / the
    * MemoryStream-driven spec): the parsed TTL reaches the ops'
    * timeout option verbatim. */
  private[graft] def buildStream(cfg: Map[String, Any], stream: DataFrame,
      schemaSource: DataFrame, armTtl: Boolean): DataFrame = {
    import stream.sparkSession.implicits._
    def str(k: String, dflt: => String): String =
      cfg.get(k).map(String.valueOf).getOrElse(dflt)
    val parsedTtl = parseTtl(cfg) // always validated, armed only when asked
    val ttl = if (armTtl) parsedTtl else None
    str("stream_op", "") match {
      case "sessionize" =>
        val userCol = str("user_col", "user_id")
        val tsCol = str("ts_col", "ts")
        StreamingOps.sessionizeStream(
          stream.select(col(s"`$userCol`"), usOf(schemaSource, tsCol))
            .as[(Long, Long)],
          gapMinutes = str("gap_minutes", "30").toInt, ttl = ttl)
      case "dedup" =>
        val idCol = str("id_col", "event_id")
        val userCol = str("user_col", "user_id")
        val typeCol = str("type_col", "event_type")
        StreamingOps.streamingDedupStream(
          stream.select(col(s"`$idCol`"), col(s"`$userCol`"),
            col(s"`$typeCol`")).as[(Long, Long, String)], ttl = ttl)
      case "funnel" =>
        val userCol = str("user_col", "user_id")
        val typeCol = str("type_col", "event_type")
        val tsCol = str("ts_col", "ts")
        val steps = cfg.get("funnel_steps") match {
          case Some(s: Seq[_]) => s.map(String.valueOf)
          case _ => throw new IllegalArgumentException(
            "streaming_table funnel requires `funnel_steps:` (a YAML list)")
        }
        StreamingOps.funnelDepthStream(
          stream.select(col(s"`$userCol`"), col(s"`$typeCol`"),
            usOf(schemaSource, tsCol)).as[(Long, String, Long)],
          steps, cap = str("cap", "10000").toInt, ttl = ttl)
      case "media_dedup" =>
        // EXACT-invariance media dedup (first class occurrence wins);
        // hamming-ball near-dup merging stays with the batch/
        // incremental media_dedup step — see mediaDedupStream scaladoc
        StreamingOps.mediaDedupStream(stream,
          method = str("method", "phash"),
          idCol = str("id_col", "doc_id"),
          payloadCol = str("payload_col", "payload"), ttl = ttl)
      case "" => throw new IllegalArgumentException(
        "streaming_table requires `stream_op:` " +
          "(sessionize | dedup | media_dedup | funnel | curate)")
      case other => throw new IllegalArgumentException(
        s"unknown stream_op `$other` " +
          "(known: sessionize, dedup, media_dedup, funnel, curate)")
    }
  }

  def run(ctx: MatContext): MatResult = {
    val spark = ctx.spark
    val cfg = ctx.config.extra
    def str(k: String, dflt: => String): String =
      cfg.get(k).map(String.valueOf).getOrElse(dflt)
    val ttl = parseTtl(cfg) // validate up front; carried, not armed
    if (str("stream_op", "") == "curate") return runCurate(ctx)

    // stage the compiled relation as the stream's source directory —
    // the bounded replay of an arriving-files lake; schema comes from
    // the staged batch, so any model SELECT works
    val batch = ctx.compiled()
    val srcDir = Files.createTempDirectory("graft_stbl_src").toString
    batch.write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)

    val out = buildStream(cfg, stream, batch, armTtl = false)

    val sink = Files.createTempDirectory("graft_stbl_sink").toString
    val checkpoint = Files.createTempDirectory("graft_stbl_cp").toString
    val q = out.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(sink)
    q.awaitTermination()

    // funnel streams emit one row per state update; the table keeps the
    // final depth per key (max_by over the monotone update index)
    val result0 = spark.read.parquet(sink)
    val result =
      if (str("stream_op", "") == "funnel")
        result0.groupBy(col("user_id"))
          .agg(expr("max_by(funnel_depth, update_idx)").as("funnel_depth"))
      else result0

    ctx.adapter.writeTableAtomic(result, ctx.target,
      ctx.config.partitionBy, ctx.config.sortBy,
      ctx.config.clusteredBy, ctx.config.buckets, ctx.config.zorderBy,
      ctx.config.layoutCurve, ctx.config.fileFormat)
    // record the carried TTL on the table so the continuous-deployment
    // config is observable from the catalog
    ttl.foreach(t => ctx.adapter.execute(
      s"ALTER TABLE ${ctx.target.fqn} SET TBLPROPERTIES " +
        s"('graft.streaming.state_ttl' = '$t')", fetch = false))
    MatResult(ctx.target.withType(RelationType.Table), "success",
      s"streaming_table: ${str("stream_op", "")}" +
        ttl.map(t => s" (state_ttl=$t, armed on continuous deploys)")
          .getOrElse(""))
  }

  /** `stream_op: curate` — CONTINUOUS curation: every Structured
    * Streaming micro-batch runs as ONE incremental-pipeline index batch
    * (the same [[PipelineMat.processBatch]] the batch engine uses:
    * frozen trainers, persisted banded indexes, settled-keep, deferred
    * appends flushed before the next micro-batch, idempotent
    * `unseenById` state appends). The first micro-batch is the full
    * build (trainers train on it — the frozen-run-1 discipline); later
    * micro-batches dedup/gate against the settled state and APPEND.
    *
    * The bounded build stages the compiled relation as `stream_batches`
    * files range-laid by `arrival_col` with STRICTLY INCREASING
    * mtimes, so FileStreamSource's (mtime, path) order replays arrival
    * order deterministically and the result is oracle-checkable — the
    * same arriving-files replay shape the other stream ops use, driven
    * through foreachBatch because the curation state lives in catalog
    * relations, not operator state.
    *
    * A continuous DEPLOYMENT sets `landing_dir:` instead: the stream
    * reads a REAL arriving-files parquet directory through a DURABLE
    * checkpoint (`checkpoint_dir:`, default derived under the
    * adapter's location / warehouse dir), so each invocation drains
    * only files the last invocation had not committed, and a killed
    * run resumes at the first uncommitted micro-batch. Durable mode
    * requires `unique_key`: a crash can land BETWEEN the target append
    * and the deferred index flush, and only the target-key replay
    * guard makes the checkpoint's replay of that micro-batch
    * exactly-once at the target (the `unseenById` guard already makes
    * it exactly-once at the indexes). The guard's membership probe is
    * the persisted BUCKETED key index under the checkpoint
    * ([[CurateKeyIndex]]: synced from the target's own data files at
    * each batch start, read pruned to the batch's hash buckets) — NOT
    * a full target key scan per micro-batch, which at deployment scale
    * would be a corpus-sized term per landed file;
    * `key_index_buckets:` sizes the bucket layout (recorded, verified,
    * default 64). The stream schema is PINNED under the checkpoint on
    * the first invocation; a landed file that adds/drops/retypes
    * columns fails by name instead of silently shifting the contract
    * (`--full-refresh` re-pins). A sibling `<checkpoint>.lock` file
    * rejects a second concurrent invocation by name — overlapping
    * drains of one checkpoint would race on the committed-files log.
    * `max_batches_per_run:` bounds one invocation's
    * drain (ops lever; also the restart-test lever) — the limit-hit
    * batch is NOT processed and NOT committed, so the next run resumes
    * exactly there. With `event_time` + `unique_key` configured, each
    * micro-batch anti-joins its survivors against the target's OWN
    * event-time slice (partition-prunable) instead of the key index —
    * late re-delivery of a settled window drops exactly as
    * the microbatch pipeline drops it, and only genuinely novel rows
    * land. NULL event times are outside every window and never
    * process (the microbatch convention — runWindows never admits
    * them either); keeping them would leave the replay guard's window
    * slice unable to see them, so a re-delivered null-et row would
    * silently duplicate. */
  private def runCurate(ctx: MatContext): MatResult = {
    val spark = ctx.spark
    val cfg = ctx.config.extra
    val steps = PipelineSteps.parse(cfg.get("steps"))
    if (steps.isEmpty)
      throw new IllegalArgumentException(
        "stream_op: curate needs a non-empty `steps:` config (the " +
          "incremental-pipeline step chain each micro-batch runs)")
    steps.foreach(PipelineModels.checkIncrementalLegal)
    // curate targets are parquet BY CONTRACT, refused by name up front:
    // the replay guard's key index derives from the target's own data
    // files read as parquet (CurateKeyIndex.seal), and the durable
    // landing-dir/per-footer schema machinery is parquet throughout —
    // an orc/json/csv target would build fine and then die mid-drain
    // inside the seal's raw parquet read with an unnamed decode error
    if (ctx.config.fileFormat != "parquet")
      throw new IllegalArgumentException(
        s"stream_op: curate requires file_format: parquet, got " +
          s"`${ctx.config.fileFormat}` — the exactly-once replay guard " +
          "derives its key index from the target's own data files and " +
          "reads them as parquet, so a non-parquet target would fail " +
          "mid-drain, after rows were already appended")
    val landingDir = cfg.get("landing_dir").map(String.valueOf)
    // a re-run of the model REPLAYS the whole staged input; idempotence
    // comes from an index-backed dedup step (every doc it sees settles)
    // or from a unique_key anti-join against the target — a bare gate
    // chain with neither would duplicate every row on each run
    val indexedOps = Set("exact_dedup", "minhash_dedup", "simhash_dedup",
      "ngram_dedup", "fuzzy_dedup", "media_dedup", "semantic_dedup")
    val keyGuard: Seq[String] = ctx.config.uniqueKey
    if (landingDir.isDefined && keyGuard.isEmpty)
      throw new IllegalArgumentException(
        "stream_op: curate with `landing_dir:` (durable mode) requires " +
          "unique_key — a crash can land between the target append and " +
          "the deferred index flush, and only the target-key anti-join " +
          "keeps the checkpoint's replay of that micro-batch " +
          "exactly-once at the target")
    if (!steps.exists(st => indexedOps(st.op)) && keyGuard.isEmpty)
      throw new IllegalArgumentException(
        "stream_op: curate needs an index-backed dedup step OR a " +
          "unique_key — without either, a re-run replays the staged " +
          "input and appends every row again")
    // source + checkpoint: durable mode reads the real landing directory
    // through a persistent checkpoint; bounded replay stages the
    // compiled relation to per-run throwaway dirs
    val (srcDir, checkpoint) = landingDir match {
      case Some(ld) =>
        // Hadoop FS, not java.io.File: a real deployment's landing dir
        // and checkpoint are object-store/HDFS URIs as often as local
        // paths, and the same calls serve both
        val hconf = spark.sessionState.newHadoopConf()
        val ldPath = new org.apache.hadoop.fs.Path(ld)
        val ldFs = ldPath.getFileSystem(hconf)
        if (!ldFs.exists(ldPath) || !ldFs.getFileStatus(ldPath).isDirectory)
          throw new IllegalArgumentException(
            s"stream_op: curate `landing_dir:` is not a directory: $ld")
        val cp = cfg.get("checkpoint_dir").map(String.valueOf).getOrElse {
          val base = ctx.adapter.location.getOrElse(
            spark.conf.get("spark.sql.warehouse.dir"))
          s"$base/_graft_checkpoints/" +
            s"${ctx.target.schema}.${ctx.target.identifier}"
        }
        // concurrent-invocation guard BEFORE anything mutates: two
        // overlapping drains of one checkpoint (the cron-overlap ops
        // reality of max_batches_per_run) race on the committed-files
        // log and double-append at the target. The lock is a SIBLING of
        // the checkpoint dir so --full-refresh's checkpoint delete
        // cannot drop our own lock mid-run. Released in the finally;
        // a kill -9 leaves it behind, and the error text names the
        // file to delete after confirming that process is dead.
        acquireCurateLock(spark, cp)
        // --full-refresh reprocesses the WHOLE landing history: the
        // rebuild starts from scratch, so the old checkpoint's
        // committed-files log must go with the old target rows (and
        // with it the pinned stream schema + durable key index, which
        // re-derive from the post-refresh state). Failures here happen
        // AFTER lock acquisition but BEFORE the drain's try/finally —
        // release explicitly or the lock leaks.
        if (ctx.fullRefresh)
          try {
            val cpPath = new org.apache.hadoop.fs.Path(cp)
            val cpFs = cpPath.getFileSystem(hconf)
            if (cpFs.exists(cpPath)) cpFs.delete(cpPath, true)
          } catch {
            case e: Throwable => releaseCurateLock(spark, cp); throw e
          }
        (ld, cp)
      case None =>
        val nBatches = cfg.get("stream_batches")
          .map(v => String.valueOf(v).toInt).getOrElse(4)
        val arrivalCol = cfg.get("arrival_col").map(String.valueOf)
          .getOrElse(throw new IllegalArgumentException(
            "stream_op: curate needs `arrival_col:` — the column whose " +
              "order defines arrival (each staged slice becomes one " +
              "micro-batch = one index batch) — or `landing_dir:` for " +
              "a durable deployment where files arrive in real time"))
        val batch = ctx.compiled()
        val dir = Files.createTempDirectory("graft_curate_src").toString
        batch.repartitionByRange(nBatches, col(s"`$arrivalCol`"))
          .sortWithinPartitions(col(s"`$arrivalCol`"))
          .write.mode("overwrite").parquet(dir)
        // strictly increasing mtimes in part order: range partition i
        // holds the i-th arrival slice, and FileStreamSource replays
        // (mtime, path)
        val parts = new java.io.File(dir).listFiles()
          .filter(_.getName.startsWith("part-")).sortBy(_.getName)
        parts.zipWithIndex.foreach { case (f, i) =>
          f.setLastModified(1700000000000L + i * 60000L) }
        (dir, Files.createTempDirectory("graft_curate_cp").toString)
    }
    try curateDrain(ctx, steps, cfg, landingDir, srcDir, checkpoint,
      keyGuard)
    finally if (landingDir.isDefined) releaseCurateLock(spark, checkpoint)
  }

  /** The drain itself — everything after checkpoint/lock resolution, so
    * [[runCurate]]'s single try/finally releases the durable-mode lock
    * on EVERY exit path (schema drift, param errors, stream failure,
    * the post-drain empty rebuild). */
  private def curateDrain(ctx: MatContext, steps: Seq[PipelineSteps.Step],
      cfg: Map[String, Any], landingDir: Option[String], srcDir: String,
      checkpoint: String, keyGuard: Seq[String]): MatResult = {
    val spark = ctx.spark
    val schema = try {
      if (landingDir.isDefined) curateStreamSchema(spark, srcDir, checkpoint)
      else spark.read.parquet(srcDir).schema
    } catch {
      case e: org.apache.spark.sql.AnalysisException
          if landingDir.isDefined =>
        throw new IllegalStateException(
          s"stream_op: curate landing_dir `$srcDir` holds no readable " +
            "parquet yet — the first invocation needs at least one " +
            s"landed file to infer the stream schema (${e.getMessage})")
    }
    val mfpt =
      if (landingDir.isDefined)
        cfg.get("max_files_per_trigger")
          .map(v => String.valueOf(v).toInt).getOrElse(1)
      else 1
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", mfpt).parquet(srcDir)
    val maxBatches = cfg.get("max_batches_per_run")
      .map(v => String.valueOf(v).toInt)
    maxBatches.filter(_ < 1).foreach(n =>
      throw new IllegalArgumentException(
        s"stream_op: curate `max_batches_per_run:` must be >= 1, got $n " +
          "— a zero-batch drain would report success while processing " +
          "nothing (and under --full-refresh would leave the stale " +
          "target in place)"))
    // fault injection for the restart spec: process the (N+1)-th
    // micro-batch FULLY, then die before its checkpoint commit — the
    // restart must replay it and append nothing (index unseenById +
    // target-key anti-join)
    val crashAfter = spark.conf
      .getOption("graft.curate.crashAfterBatches").map(_.toInt)
    var batches = 0
    // --full-refresh: the FIRST processed micro-batch rebuilds target +
    // state from scratch (its own checkParams errors prescribe exactly
    // this recovery), later micro-batches go incremental as usual
    var rebuilt = false
    val et = ctx.config.eventTime
    // bucketed key index for the index-less replay guard: lives under
    // the checkpoint (durable mode persists it across invocations;
    // bounded mode's per-run temp checkpoint rebuilds it from the
    // target's files on the first batch — one key-only catch-up read
    // per RUN instead of a full target scan per BATCH)
    val idxBuckets = cfg.get("key_index_buckets")
      .map(v => String.valueOf(v).toInt)
    idxBuckets.filter(_ < 1).foreach(n =>
      throw new IllegalArgumentException(
        s"stream_op: curate `key_index_buckets:` must be >= 1, got $n"))
    // buckets default to None: the first seal auto-sizes from the
    // per-file key count it observes (CurateKeyIndex.autoBuckets) and
    // records the choice in the params file
    val keyIdx = CurateKeyIndex.Handle(spark, checkpoint, keyGuard,
      idxBuckets)
    // COMPACTION: every seal appends up to one file per touched bucket,
    // so a long drain accretes small parquet files linearly in batch
    // count — eventually the listing/footer overhead, not the data, is
    // the per-batch cost. The index is DERIVED state, so compaction is
    // a reset: drop the sealed log FIRST (a crash between the deletes
    // must leave "nothing sealed", never "sealed but unindexed"), then
    // the index — the next seal() re-derives both from the target's
    // files in one bucketed pass (≤ one file per bucket).
    // `key_index_compact_files:` tunes the trigger; the default scales
    // with the resolved bucket count (16 seals' worth of accrual,
    // CurateKeyIndex.defaultCompactAt) so each compaction's full
    // re-derive amortizes over ≥ ~16 batches. The check runs per
    // MICRO-BATCH on an in-memory accrual estimate (one capped listing
    // initializes it), so a 1000-batch drain compacts MID-RUN instead
    // of accreting until the next invocation.
    val compactCfg = cfg.get("key_index_compact_files")
      .map(v => String.valueOf(v).toInt)
    compactCfg.filter(_ < 1).foreach(n =>
      throw new IllegalArgumentException(
        "stream_op: curate `key_index_compact_files:` must be >= 1, " +
          s"got $n"))
    def compactAt: Int =
      compactCfg.getOrElse(CurateKeyIndex.defaultCompactAt(keyIdx))
    // TARGET-side relief, opt-in (`target_compact_files:`): the drain
    // appends ~one parquet file per micro-batch to the TARGET forever —
    // a max_files_per_trigger: 1 deployment draining thousands of
    // landed files leaves thousands of target files, and the seal's
    // per-batch file listing plus the sealed-log size grow linearly
    // with them (the index's own accrual is already bounded above).
    // Past the threshold the drain rewrites the target in place
    // (SparkAdapter.compact — a FULL target rewrite, so the threshold
    // is the amortization lever; it runs UNDER the already-held lock,
    // single writer by construction) and resets the derived key index:
    // the rewritten files all have new names, so the sealed log would
    // hold only dead entries and the next seal would re-index the full
    // rewritten set anyway — resetting first is the same one-time
    // bucketed catch-up without dragging the dead-name log and
    // duplicate index rows forever. Duplicate index rows could never
    // flip an anti-join verdict, so the rewrite is SAFE by
    // construction even mid-sequence; opt-in only because the rewrite
    // cost is the operator's to schedule. Event-time mode has no key
    // index to synchronize — run-operation compact covers it
    // out-of-band with no interaction to pin.
    val targetCompactCfg = cfg.get("target_compact_files")
      .map(v => String.valueOf(v).toInt)
    targetCompactCfg.filter(_ < 2).foreach(n =>
      throw new IllegalArgumentException(
        "stream_op: curate `target_compact_files:` must be >= 2, got " +
          s"$n — the target always holds at least one file, so a lower " +
          "threshold would rewrite the full target every micro-batch"))
    // how small to compact TO: files per partition value (partitioned
    // targets) or total files (unpartitioned); the default leaves ~7/8
    // of the threshold as headroom before the next rewrite
    val targetCompactToCfg = cfg.get("target_compact_to")
      .map(v => String.valueOf(v).toInt)
    if (targetCompactToCfg.isDefined && targetCompactCfg.isEmpty)
      throw new IllegalArgumentException(
        "stream_op: curate `target_compact_to:` is set but " +
          "`target_compact_files:` is not — the sizing has no threshold " +
          "to act on and would be silently inert")
    val targetCompactTo = targetCompactToCfg.getOrElse(
      if (ctx.config.partitionBy.nonEmpty) 1
      else math.max(1, targetCompactCfg.getOrElse(8) / 8))
    if (targetCompactTo < 1)
      throw new IllegalArgumentException(
        s"stream_op: curate `target_compact_to:` must be >= 1, got " +
          s"$targetCompactTo")
    // a compaction that cannot land under the threshold degenerates to
    // a full target rewrite EVERY batch — refuse the provably-wrong
    // shape up front (partitioned targets multiply `to` by a partition
    // count only the runtime knows; the post-compaction count check in
    // the drain is the backstop for that case)
    targetCompactCfg.filter(_ <= targetCompactTo).foreach(thr =>
      throw new IllegalArgumentException(
        s"stream_op: curate `target_compact_to: $targetCompactTo` >= " +
          s"`target_compact_files: $thr` — every compaction would land " +
          "at-or-above the threshold and the drain would rewrite the " +
          "full target every micro-batch"))
    // fail loud, never ignore: the config only takes effect on the
    // key-index guard path, so accepting it elsewhere would let an
    // operator believe a drain is compacting when it never does
    if (targetCompactCfg.isDefined &&
        (keyGuard.isEmpty || ctx.config.eventTime.isDefined))
      throw new IllegalArgumentException(
        "stream_op: curate `target_compact_files:` applies only to the " +
          "key-index replay-guard path (unique_key WITHOUT event_time) " +
          "— the rewrite must reset and re-derive the key index it " +
          "invalidates. For event-time or index-less chains run " +
          "adapter.compact via run-operation out-of-band instead " +
          "(safe there: no index to synchronize)")
    // refuse a drifted bucket layout AT INVOCATION, not at the first
    // batch — a drained landing dir (zero batches) must not report
    // success under a config the persisted index cannot serve
    if (landingDir.isDefined && keyGuard.nonEmpty && et.isEmpty) {
      CurateKeyIndex.checkParams(keyIdx)
      CurateKeyIndex.compactIfNeeded(keyIdx, compactAt)
    }
    // a checkpoint with COMMITTED batches whose target relation is GONE
    // must refuse, never resume: the resumed drain would treat the first
    // uncommitted file as the FULL BUILD and report success while every
    // previously drained row is lost. Reachable via a crash inside the
    // target compaction's staged swap (the rows survive as
    // `<identifier>__dbt_tmp`/`__dbt_backup` — restore one) or a manual
    // DROP; `--full-refresh` (which deletes the checkpoint and replays
    // the whole landing history) is the from-scratch recovery.
    if (landingDir.isDefined && !ctx.adapter.relationExists(ctx.target)) {
      val commitsPath =
        new org.apache.hadoop.fs.Path(s"$checkpoint/commits")
      val cfs = commitsPath.getFileSystem(
        spark.sessionState.newHadoopConf())
      val hasCommits = cfs.exists(commitsPath) &&
        cfs.listStatus(commitsPath).exists(st =>
          st.isFile && !st.getPath.getName.startsWith("."))
      if (hasCommits && !committedDrainProvablyEmpty(spark, checkpoint))
        throw new IllegalStateException(
          s"stream_op: curate checkpoint $checkpoint records committed " +
            s"micro-batches but the target ${ctx.target.fqn} does not " +
            "exist — resuming would rebuild from only the uncommitted " +
            "files and silently lose every previously drained row. " +
            "Restore the target (a crash during target compaction " +
            s"leaves the rows as ${ctx.target.identifier}__dbt_tmp or " +
            s"${ctx.target.identifier}__dbt_backup), or rebuild from " +
            "the full landing history with --full-refresh. (A committed " +
            "history that provably drained ZERO rows — every landed " +
            "file a committed batch read still present and empty — " +
            "resumes without this error; seeing it means at least one " +
            "committed file held rows, or the evidence is gone)")
    }
    val q = stream.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        // the limit-hit batch is NOT processed and NOT committed, so
        // the next invocation's checkpoint resumes exactly here
        if (maxBatches.exists(batches >= _)) throw new DrainLimitReached
        // test-only pacing hook: the concurrent-lock spec needs run A
        // still draining while run B attempts the lock
        spark.conf.getOption("graft.curate.sleepPerBatchMillis")
          .foreach(ms => Thread.sleep(ms.toLong))
        // the flat-landing contract holds for the WHOLE drain: a
        // subdirectory created mid-drain fails by name before this
        // batch commits (invocation-time enforcement alone would leave
        // the rest of a long drain in the undefined zone)
        landingDir.foreach(ld => assertFlatLanding(spark, ld))
        // an empty slice (a skewed range partition) must not become the
        // FULL BUILD and train artifacts on nothing
        if (!b.isEmpty) {
          // foreachBatch hands a frame bound to the stream's CLONED
          // session; the curation plans join it against state relations
          // read through the adapter's ORIGINAL session — cross-session
          // plan mixing is where survivors silently vanish. Hand off
          // through the session-agnostic InternalRow RDD instead of a
          // disk re-stage: pin the micro-batch ONCE (eager
          // localCheckpoint, batch-sized blocks) and rebuild a frame
          // over those rows in the adapter's session, so the many
          // downstream actions re-read block-manager blocks and the
          // batch never writes scratch parquet.
          val pinned = b.localCheckpoint(true)
          try {
            val staged = org.apache.spark.sql.GraftSqlBridge
              .dataFrameFromRdd(ctx.spark,
                pinned.queryExecution.toRdd, pinned.schema)
            // target existence decides full-build vs incremental — exactly
            // the PipelineMat contract, so replay and batch runs compose
            val incrRun = (!ctx.fullRefresh || rebuilt) &&
              ctx.adapter.relationExists(ctx.target)
            // event_time + unique_key: guard survivors against the
            // batch's OWN event-time slice of the target (narrow,
            // partition-prunable) instead of the whole target key set —
            // late re-delivery of a settled window drops exactly as the
            // microbatch pipeline drops it
            // event-time mode drops NULL-event-time rows up front: a
            // null is outside every window (the microbatch pipeline's
            // runWindows filter never admits them either — the dbt
            // convention), and keeping them here would leave the
            // replay guard's window slice unable to see them — a
            // re-delivered null-et row would silently duplicate.
            // Applied WHENEVER event-time mode is configured, full
            // build included: were the drop gated on incrRun, the
            // first micro-batch of a --full-refresh would keep
            // null-et rows while batches 2+ drop them, making the
            // rebuilt target depend on maxFilesPerTrigger file
            // grouping.
            val etStaged =
              if (et.isDefined && keyGuard.nonEmpty)
                staged.filter(col(s"`${et.get}`").isNotNull)
              else staged
            val window: Option[(java.sql.Timestamp, java.sql.Timestamp)] =
              if (et.isDefined && keyGuard.nonEmpty && incrRun) {
                val e = et.get
                val r = etStaged.agg(
                  min(col(s"`$e`")).cast("timestamp"),
                  max(col(s"`$e`")).cast("timestamp")).head
                if (r.isNullAt(0)) None
                else Some((r.getTimestamp(0),
                  new java.sql.Timestamp(r.getTimestamp(1).getTime + 1L)))
              } else None
            // index-less chains (no event_time): drop keys the target
            // already holds anywhere, so a replay (or late re-delivery)
            // cannot append a row twice. The membership probe is the
            // persisted BUCKETED key index under the checkpoint — NOT
            // the raw target key column: with max_files_per_trigger: 1
            // a long drain against the raw target is one corpus-sized
            // scan PER LANDED FILE. seal() first syncs the index with
            // the target's current data files (steady state: just the
            // previous batch's files; crash replay: the uncommitted
            // batch's files — which is exactly what makes the replay
            // exactly-once), then guard() reads only the hash buckets
            // this batch's keys touch.
            val local =
              if (keyGuard.nonEmpty && incrRun && et.isEmpty) {
                // in-drain compaction relief BEFORE the seal: the next
                // seal then re-derives the reset index in one bucketed
                // pass and the guard below sees the full key set
                CurateKeyIndex.compactIfNeeded(keyIdx, compactAt)
                // ONE DataFrame instance for the file-count check and
                // the seal: its resolved FileIndex caches the listing,
                // so the opt-in check adds no second listing RPC
                var targetDf = ctx.adapter.read(ctx.target)
                targetCompactCfg.foreach { thr =>
                  val n = targetDf.inputFiles.length
                  if (n > thr) {
                    // refuse BEFORE paying the rewrite when the floor is
                    // provably unreachable: a partitioned target lands at
                    // ≥ partitionCount × target_compact_to files, and a
                    // post-rewrite failure would re-pay a full target
                    // rewrite on every retry (one catalog call, only on
                    // the about-to-compact path)
                    val floor = ctx.config.partitionBy.headOption.map(_ =>
                      ctx.adapter.partitionCount(ctx.target) *
                        targetCompactTo.toLong)
                    floor.filter(_ > thr).foreach(f =>
                      throw new IllegalStateException(
                        "stream_op: curate target compaction cannot land " +
                          s"under target_compact_files: $thr — the target " +
                          s"has ${f / targetCompactTo} partition values × " +
                          s"target_compact_to: $targetCompactTo ≥ $f " +
                          "files. Raise target_compact_files above that " +
                          "floor"))
                    // partition/bucket specs derive from the catalog
                    // inside compact; sort/zorder are write-time layout
                    // only the config knows — pass them through so the
                    // rewrite preserves the model's declared layout
                    val (before, after) = ctx.adapter.compact(ctx.target,
                      targetFiles = targetCompactTo,
                      sortBy = ctx.config.sortBy,
                      zorderBy = ctx.config.zorderBy,
                      layoutCurve = ctx.config.layoutCurve)
                    System.err.println(
                      s"[graft] curate target compaction at batch " +
                        s"$batches: $before -> $after files " +
                        s"(threshold $thr); key index reset for " +
                        "re-derive over the rewritten file set")
                    if (after > thr)
                      throw new IllegalStateException(
                        "stream_op: curate target compaction landed at " +
                          s"$after files, still above target_compact_" +
                          s"files: $thr — the next batch would rewrite " +
                          "the full target again, every batch. Raise " +
                          "target_compact_files above the compacted " +
                          "floor (partitioned targets: at least the " +
                          "partition count × target_compact_to)")
                    CurateKeyIndex.reset(keyIdx)
                    targetDf = ctx.adapter.read(ctx.target)
                  }
                }
                CurateKeyIndex.seal(keyIdx, targetDf,
                  ctx.adapter.relationLocationUri(ctx.target),
                  // first-seal auto-sizing evidence: THIS batch's
                  // DISTINCT key count — autoBuckets' contract is keys,
                  // not rows, and a replay/duplicate-heavy first batch
                  // would otherwise oversize B, the expensive direction
                  // (oversizing explodes per-seal file churn; see
                  // autoBuckets). One first-seal-only distinct job over
                  // pinned blocks — a bootstrap cost, never per-batch.
                  batchKeysHint = Some(() => etStaged
                    .select(keyGuard.map(k => col(s"`$k`")): _*)
                    .distinct().count()))
                CurateKeyIndex.guard(keyIdx, etStaged)
              } else etStaged
            PipelineMat.processBatch(ctx, steps, local, incremental = true,
              incrRun = incrRun, window = window)
            rebuilt = true
            batches += 1
          } finally {
            // release the batch's pinned blocks: Dataset.unpersist is a
            // no-op for a local checkpoint (no CacheManager entry) — the
            // LogicalRDD's rdd must be unpersisted directly, or every
            // batch of a long drain leaks its blocks until GC
            org.apache.spark.sql.GraftSqlBridge.checkpointedRdd(pinned)
              .foreach(_.unpersist(blocking = false))
          }
          if (crashAfter.exists(_ < batches))
            throw new IllegalStateException(
              "graft.curate.crashAfterBatches fault injection: dying " +
                s"after processing micro-batch $batches, before commit")
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    var drainLimited = false
    try q.awaitTermination()
    catch {
      case ex: Throwable =>
        if (causeChain(ex).exists(_.isInstanceOf[DrainLimitReached]))
          drainLimited = true
        else throw ex
    } finally {
      // bounded-replay scratch: the staged corpus copy and the
      // checkpoint are per-run throwaways — leaking them (ALSO on a
      // failing micro-batch) fills /tmp. Durable mode keeps both: the
      // landing dir is the user's data, the checkpoint is the resume
      // point.
      if (landingDir.isEmpty) {
        deleteDir(java.nio.file.Paths.get(srcDir))
        deleteDir(java.nio.file.Paths.get(checkpoint))
      }
    }
    // a requested full refresh where NO micro-batch processed (all-empty
    // staged input, an --empty dry run) must still REBUILD — target and
    // per-step state rewritten schema-only, the batch pipeline's exact
    // contract — not report success over the stale pre-refresh rows;
    // likewise a missing target must exist schema-only for downstream.
    // A drain-limited run is intentionally partial: no empty rebuild.
    if (!drainLimited &&
        (!ctx.adapter.relationExists(ctx.target) ||
          (ctx.fullRefresh && !rebuilt)))
      PipelineMat.processBatch(ctx, steps,
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          schema),
        incremental = true, incrRun = false, window = None)
    TableMat.applyTblProperties(ctx)
    MatResult(ctx.target.withType(RelationType.Table), "success",
      s"streaming curate: $batches micro-batches as incremental index " +
        s"batches: ${steps.map(_.op).mkString(" -> ")}" +
        (if (drainLimited)
           s" (drain limited to ${maxBatches.get}; the next run " +
             "resumes at the checkpoint)"
         else "") +
        landingDir.map(ld =>
          s" [landing: $ld, checkpoint: $checkpoint]").getOrElse(""))
  }

  /** Can the committed history be PROVEN row-free? The target-gone
    * refusal above exists to prevent silent row loss, but a drain
    * whose committed batches all read EMPTY landed files never creates
    * the target (an empty slice must not become the full build), so a
    * death before the end-of-drain schema-only rebuild — e.g. a
    * mid-drain flat-landing violation — leaves commits + no target
    * with nothing actually lost, and the refusal would force a
    * needless full-refresh. Evidence, not assumption: the file
    * source's metadata log under `sources/0` records exactly which
    * landed files each batch read (`{"path":…,"batchId":N}` JSON
    * lines, batch-N files plus periodic `.compact` rollups); if every
    * file a COMMITTED batch references still exists and holds zero
    * rows, the history drained nothing. Any parse failure, missing
    * file, or live row keeps the refusal — the fail-safe direction.
    * Cost sits entirely on the already-fatal path: nothing is read
    * unless the refusal was about to fire. */
  private def committedDrainProvablyEmpty(spark: SparkSession,
      checkpoint: String): Boolean = {
    import org.apache.hadoop.fs.Path
    try {
      val conf = spark.sessionState.newHadoopConf()
      val commits = new Path(s"$checkpoint/commits")
      val cfs = commits.getFileSystem(conf)
      val committed = cfs.listStatus(commits).toSeq
        .filter(st => st.isFile && !st.getPath.getName.startsWith("."))
        .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
        .toSet
      if (committed.isEmpty) return false
      val srcDir = new Path(s"$checkpoint/sources/0")
      val sfs = srcDir.getFileSystem(conf)
      if (!sfs.exists(srcDir)) return false
      val logFiles = sfs.listStatus(srcDir).toSeq
        .filter(st => st.isFile && !st.getPath.getName.startsWith("."))
      // absence of evidence is NOT evidence of an empty drain: every
      // committed batch's log record must be PRESENT — either its own
      // sources/0/<id> file, or a `.compact` rollup at-or-after it
      // (compaction subsumes and deletes the per-batch files). A
      // partially restored checkpoint whose commits survived but whose
      // source log did not must refuse, exactly like a missing dir.
      val names = logFiles.map(_.getPath.getName)
      val compactIds = names.filter(_.endsWith(".compact"))
        .flatMap(n => scala.util.Try(
          n.stripSuffix(".compact").toLong).toOption)
      val plainIds = names
        .flatMap(n => scala.util.Try(n.toLong).toOption).toSet
      if (!committed.forall(id =>
        plainIds(id) || compactIds.exists(_ >= id))) return false
      val pathRe = """"path":"((?:[^"\\]|\\.)*)"""".r
      val batchRe = """"batchId":(-?\d+)""".r
      val referenced = scala.collection.mutable.Set.empty[String]
      for (st <- logFiles) {
        // the filename is a valid batch-id fallback ONLY for a plain
        // per-batch file (its entries ARE that batch); a `.compact`
        // rollup holds EVERY batch's entries, so attributing them all
        // to the rollup's own id would misfile earlier batches' files
        // — e.g. under an uncommitted rollup id, committed row-bearing
        // paths would silently escape the emptiness proof
        val name = st.getPath.getName
        val fileBatch =
          if (name.endsWith(".compact")) None
          else scala.util.Try(name.toLong).toOption
        val in = sfs.open(st.getPath)
        val text =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        for (line <- text.split('\n') if line.startsWith("{")) {
          // each entry carries its own batchId (a .compact rollup holds
          // every batch's entries); the file name is the fallback for
          // plain files only. An entry we cannot attribute OR whose
          // path we cannot extract might hide a committed row-bearing
          // file — unparseable evidence keeps the refusal (return
          // false), never skips.
          val bid = batchRe.findFirstMatchIn(line).map(_.group(1).toLong)
            .orElse(fileBatch)
          val path = pathRe.findFirstMatchIn(line).map(_.group(1))
          if (bid.isEmpty || path.isEmpty) return false
          if (bid.exists(committed))
            referenced +=
              path.get.replace("\\/", "/").replace("\\\\", "\\")
        }
      }
      // all committed batches' records seen, none referenced a file
      if (referenced.isEmpty) return true
      val uris = referenced.toSeq.sorted
      uris.forall { u =>
        val p = new Path(new java.net.URI(u))
        p.getFileSystem(conf).exists(p)
      } && spark.read.parquet(uris: _*).isEmpty
    } catch { case scala.util.control.NonFatal(_) => false }
  }

  private def curateLockPath(checkpoint: String) =
    new org.apache.hadoop.fs.Path(
      checkpoint.stripSuffix("/") + ".lock")

  /** Stable MACHINE identity for the lock's self-heal gate. Bare
    * hostnames are not identity: containerized deployments commonly
    * produce colliding generic hostnames across machines, and two such
    * hosts sharing an object-store checkpoint would let host B break
    * host A's LIVE lock whenever A's pid number happens to be absent
    * on B — reintroducing the double-drain the lock prevents. Source:
    * `/etc/machine-id` (systemd's per-machine id) when readable; else
    * a random nonce persisted at a LOCAL per-machine path (the JVM's
    * tmpdir — NOT the warehouse, which is commonly a SHARED object
    * store where every machine would read one nonce and the gate would
    * pass vacuously); else a per-process nonce, under which self-heal
    * simply never fires — the safe direction (refuse, don't break).
    * `private[graft]` so the lock specs can forge same/other-machine
    * holders. */
  private[graft] lazy val machineId: String = {
    def read(p: java.nio.file.Path): Option[String] =
      try Some(new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .trim).filter(_.nonEmpty)
      catch { case _: Throwable => None }
    machineIdRead(read)
  }

  /** The scope within which a pid NUMBER is meaningful liveness
    * evidence: boot id (random per boot — distinct across cloned VMs
    * whose images bake one machine-id, the classic misconfig) plus the
    * pid-namespace id (distinct across containers on one host, whose
    * shared kernel gives them one boot id but separate pid tables — a
    * sibling container would otherwise read a LIVE holder's pid as
    * absent and break its lock). Self-heal fires only when machine-id
    * AND this scope both match: same machine, same boot, same pid
    * namespace — exactly where `ProcessHandle.of(pid)` is
    * authoritative. The cost: a containerized scheduler that launches
    * each run in a FRESH container never self-heals (new namespace) —
    * it refuses with the manual-clearing guidance instead, which is the
    * safe direction (its pid check was never meaningful there). Both
    * reads empty on non-Linux → the gate degrades to machine-id
    * equality, correct where namespaces don't exist. */
  private[graft] lazy val livenessScope: String = {
    def read(p: String): String =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), "UTF-8").trim
      catch { case _: Throwable => "" }
    val ns =
      try java.nio.file.Files.readSymbolicLink(
        java.nio.file.Paths.get("/proc/self/ns/pid")).toString
      catch { case _: Throwable => "" }
    read("/proc/sys/kernel/random/boot_id") + "#" + ns
  }

  private def machineIdRead(
      read: java.nio.file.Path => Option[String]): String = {
    read(java.nio.file.Paths.get("/etc/machine-id")).getOrElse {
      val p = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_machine_id")
      read(p).getOrElse {
        val nonce = java.util.UUID.randomUUID().toString
        try {
          val tmp = java.nio.file.Files.createTempFile(
            p.getParent, "graft_machine_id", ".tmp")
          java.nio.file.Files.writeString(tmp, nonce)
          if (!java.nio.file.Files.exists(p))
            java.nio.file.Files.move(tmp, p,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          else java.nio.file.Files.deleteIfExists(tmp)
          // re-read: a same-instant racer's nonce may have won the
          // move — both processes must then agree on the FILE's value
          read(p).getOrElse(nonce)
        } catch { case _: Throwable => nonce }
      }
    }
  }

  /** Claim the durable checkpoint for this invocation: create-if-absent
    * of a SIBLING `<checkpoint>.lock` file. Atomicity is the store's:
    * HDFS `create(overwrite=false)` is atomic; on the local FS and most
    * object stores it is check-then-create, so two invocations started
    * at the same INSTANT can in principle both acquire — the guard is
    * against the scheduled-overlap case (a cron drain still running
    * when the next fires, seconds-to-minutes apart), not byzantine
    * same-millisecond racers. Fails by name when held: two drains of
    * one checkpoint race on the committed-files log and double-append
    * at the target.
    *
    * SELF-HEALING for the kill -9 case: the lock content records
    * pid/host/machine-id/liveness-scope, so when the holder is THIS
    * MACHINE ([[machineId]] equality — hostname alone is not identity;
    * containers commonly collide on generic hostnames across machines)
    * in THIS boot + pid namespace ([[livenessScope]] — where a pid
    * check is actually authoritative) and `ProcessHandle` proves the
    * pid dead, the stale lock is broken and re-claimed without human
    * intervention (a host-scheduled deployment whose run crashed must
    * not stay wedged until someone deletes a file). A live holder, a
    * cross-machine/cross-boot/cross-namespace holder (no liveness
    * oracle from here), unreadable lock content, or a lock with no
    * recorded machine id/scope still refuses by name — breaking on a
    * guess would reintroduce the double-append the lock exists to
    * prevent. */
  private def acquireCurateLock(spark: SparkSession, checkpoint: String)
      : Unit = {
    val lp = curateLockPath(checkpoint)
    val fs = lp.getFileSystem(spark.sessionState.newHadoopConf())
    if (lp.getParent != null) fs.mkdirs(lp.getParent)
    def tryCreate(): Option[org.apache.hadoop.fs.FSDataOutputStream] =
      try Some(fs.create(lp, false))
      catch {
        case e: java.io.IOException =>
          if (!fs.exists(lp)) throw e // a genuine IO failure, not contention
          None
      }
    def readHolder(): String =
      try {
        val in = fs.open(lp)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      } catch { case _: Throwable => "(unreadable lock content)" }
    def provablyDeadHere(holder: String): Boolean = {
      val pid = """"pid":(\d+)""".r.findFirstMatchIn(holder)
        .map(_.group(1).toLong)
      val mid = """"machine":"([^"]*)"""".r.findFirstMatchIn(holder)
        .map(_.group(1))
      val scope = """"scope":"([^"]*)"""".r.findFirstMatchIn(holder)
        .map(_.group(1))
      // same MACHINE (machine-id, not hostname — containers/pods
      // commonly collide on generic hostnames across machines, and a
      // hostname-gated break would kill a LIVE cross-machine holder
      // whenever its pid number is absent here), same LIVENESS SCOPE
      // (boot id + pid namespace: cloned-image VMs share a baked
      // machine-id across distinct machines, and sibling containers on
      // one host share machine-id + boot but not pid tables — in both,
      // "pid absent here" says nothing about the holder), AND the pid
      // provably absent. A recycled pid reads as alive and refuses; a
      // lock with no recorded machine/scope (a pre-r18 writer) also
      // refuses — all the safe direction.
      pid.isDefined && mid.contains(machineId) &&
        scope.contains(livenessScope) &&
        !ProcessHandle.of(pid.get).isPresent
    }
    val out = tryCreate().orElse {
      val holder = readHolder()
      if (provablyDeadHere(holder)) {
        // break via RENAME, not delete: rename is the one mutation
        // only ONE racer can win (the loser's rename fails, source
        // gone) — a delete-then-create break would let a second
        // self-healer delete the first's freshly CLAIMED live lock.
        // The tombstone keeps the dead holder's content for the log
        // and is removed after the claim.
        val tomb = new org.apache.hadoop.fs.Path(
          lp.toString + s".broken.${ProcessHandle.current().pid()}")
        if (fs.rename(lp, tomb)) {
          System.err.println(
            s"[graft] breaking stale curate lock $lp: recorded holder " +
              s"$holder is this machine and its pid is dead")
          fs.delete(tomb, false)
          tryCreate() // a racer may claim the gap first; refuse below
        } else None // another self-healer won the rename
      } else None
    }.getOrElse {
      val holder = readHolder()
      // staleness guidance: two same-instant racers on a
      // check-then-create store can interleave their writes into
      // content matching NEITHER — both refuse at read-back and the
      // garbage lock has no live holder, so the pid-gated self-heal
      // never fires. The recorded start time (when parseable) plus the
      // operator's own drain cadence is the evidence for safely
      // clearing such a lock by hand.
      val age = """"started_epoch_ms":(\d+)""".r.findFirstMatchIn(holder)
        .map(m => (System.currentTimeMillis() - m.group(1).toLong) / 1000L)
      throw new IllegalStateException(
        s"stream_op: curate: another invocation holds this " +
          s"checkpoint's lock ($lp, held by $holder" +
          age.map(s => s", started ${s}s ago").getOrElse("") + ") — " +
          "concurrent drains of one checkpoint race on the " +
          "committed-files log and double-append at the target. Wait " +
          "for that run to finish, or delete the lock file after " +
          "confirming its process is dead (a kill -9 on ANOTHER " +
          "machine leaves it behind; a dead holder from this machine, " +
          "boot, and pid namespace is reclaimed automatically). A " +
          "lock whose content is garbage " +
          "or far older than your drain cadence has no live holder — " +
          "safe to delete by hand")
    }
    val info = s"""{"pid":${ProcessHandle.current().pid()},""" +
      s""""host":"${java.net.InetAddress.getLocalHost.getHostName}",""" +
      s""""machine":"$machineId","scope":"$livenessScope",""" +
      s""""started_epoch_ms":${System.currentTimeMillis()}}"""
    try out.write(info.getBytes("UTF-8")) finally out.close()
    // read-back verify: on stores where create(overwrite=false) is
    // check-then-create, two racers can both think they created the
    // file — whoever's content is NOT the one that survived must step
    // back WITHOUT deleting (the file is the winner's now). Retried:
    // a TRANSIENT read failure must not make the sole legitimate
    // holder refuse and leave its own lock wedging the checkpoint.
    val back = Iterator.range(0, 3).map { i =>
      if (i > 0) Thread.sleep(200L * i)
      readHolder()
    }.find(c => c == info || !c.startsWith("(unreadable"))
      .getOrElse("(unreadable lock content)")
    if (back != info)
      throw new IllegalStateException(
        s"stream_op: curate: lost the lock-creation race for $lp to " +
          s"$back — that invocation proceeds, this one refuses; " +
          "re-run after it finishes")
  }

  /** Release is OWNERSHIP-CHECKED: delete only a lock recording OUR
    * pid — if a racer's self-heal replaced the file mid-run, deleting
    * it would admit a third invocation while the racer still drains.
    * (We only reach here having won the read-back verify, so a foreign
    * pid means the lock changed hands after acquisition — log, don't
    * touch.) */
  private def releaseCurateLock(spark: SparkSession, checkpoint: String)
      : Unit = {
    val lp = curateLockPath(checkpoint)
    val fs = lp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(lp)) return
    val content =
      try {
        val in = fs.open(lp)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      } catch { case _: Throwable => "" }
    if (content.contains(s""""pid":${ProcessHandle.current().pid()},"""))
      fs.delete(lp, false)
    else
      System.err.println(
        s"[graft] curate lock $lp no longer records this invocation " +
          s"($content) — leaving it in place")
  }

  /** Durable-mode stream schema: pinned under the checkpoint on the
    * FIRST invocation (from the landing dir's merged parquet schema),
    * then every later invocation re-derives the landing schema and
    * FAILS BY NAME on drift — a landed file with added/missing/retyped
    * columns must not silently shift the stream contract between
    * invocations (missing columns would read as nulls, extra ones would
    * silently drop, retyped ones would fail deep inside the parquet
    * reader). `--full-refresh` deletes the checkpoint, so the pin
    * re-derives with the rebuild — the prescribed recovery for an
    * INTENTIONAL schema change. */
  private def curateStreamSchema(spark: SparkSession, srcDir: String,
      checkpoint: String): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types.{DataType, StructType}
    assertFlatLanding(spark, srcDir)
    val inferred =
      try spark.read.option("mergeSchema", "true").parquet(srcDir).schema
      catch {
        case e: Throwable
            if e.getMessage != null &&
              (e.getMessage.contains("MERGE_SCHEMAS") ||
                e.getMessage.contains("Failed to merge")) =>
          throw new IllegalStateException(
            s"stream_op: curate landing_dir `$srcDir` holds files with " +
              "INCOMPATIBLE schemas — a landed file retyped a column. " +
              "Remove or fix the drifted file (the stream schema is a " +
              s"contract): ${e.getMessage}")
      }
    val pin = new org.apache.hadoop.fs.Path(
      s"$checkpoint/_graft_stream_schema.json")
    val fs = pin.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(pin)) {
      // the first invocation (and the post---full-refresh re-pin) must
      // not pin a contract some landed file ALREADY violates: a file
      // missing a column of the merged schema would stream NULLs into
      // the very first build. Same per-footer check as later runs.
      checkLandedFields(spark, srcDir, checkpoint,
        inferred.fields.map(_.name).toSet, pin)
      fs.mkdirs(pin.getParent)
      val out = fs.create(pin, true)
      try out.write(inferred.json.getBytes("UTF-8")) finally out.close()
      inferred
    } else {
      val in = fs.open(pin)
      val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val pinned = DataType.fromJson(json).asInstanceOf[StructType]
      val p = pinned.fields.map(f => f.name -> f.dataType).toMap
      val c = inferred.fields.map(f => f.name -> f.dataType).toMap
      val missing = pinned.fields.map(_.name).filterNot(c.contains)
      val added = inferred.fields.map(_.name).filterNot(p.contains)
      val retyped = pinned.fields.map(_.name)
        .filter(n => c.contains(n) && c(n) != p(n))
      if (missing.nonEmpty || added.nonEmpty || retyped.nonEmpty)
        throw new IllegalStateException(
          s"stream_op: curate landing_dir `$srcDir` drifted from the " +
            s"pinned stream schema ($pin):" +
            (if (added.nonEmpty)
               s" added [${added.mkString(", ")}]" else "") +
            (if (missing.nonEmpty)
               s" missing [${missing.mkString(", ")}]" else "") +
            (if (retyped.nonEmpty)
               retyped.map(n => s" $n retyped " +
                 s"${p(n).catalogString} -> ${c(n).catalogString}")
                 .mkString(" ") else "") +
            " — remove or fix the drifted landed file, or rebuild with " +
            "--full-refresh to re-pin the contract")
      // a file that DROPS a pinned column is invisible to the MERGED
      // schema (older files still contribute the column, so `missing`
      // above never fires while they remain) — yet its rows would read
      // as NULLs under the pinned schema, silently vanishing in
      // event-time mode (null-et drop) or landing null keys in the
      // replay guard.
      checkLandedFields(spark, srcDir, checkpoint,
        pinned.fields.map(_.name).toSet, pin)
      pinned
    }
  }

  /** The landing-dir layout contract is FLAT arrival, refused by name
    * (a partition-style subdirectory would otherwise surface as
    * spurious schema drift, a plain one as a conflicting-structure
    * error): the per-footer schema check lists top-level files only,
    * while the file-stream source's discovery has its own
    * (partition-aware) recursion rules — a file landed under a
    * subdirectory could be streamed without ever being field-checked,
    * or silently ignored, depending on discovery. Neither is
    * acceptable as UNDEFINED behavior. Enforced at invocation (before
    * schema inference) AND per micro-batch (one top-level listStatus —
    * metadata-sized): a producer that creates a subdirectory MID-drain
    * must fail by name before the next batch commits, not re-enter the
    * undefined zone until the next invocation. */
  private def assertFlatLanding(spark: SparkSession, srcDir: String)
      : Unit = {
    val ldPath = new org.apache.hadoop.fs.Path(srcDir)
    val ldFs = ldPath.getFileSystem(spark.sessionState.newHadoopConf())
    val subdirs = ldFs.listStatus(ldPath).filter(st =>
      st.isDirectory && {
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
    if (subdirs.nonEmpty)
      throw new IllegalStateException(
        s"stream_op: curate landing_dir `$srcDir` contains " +
          s"subdirectories [${subdirs.map(_.getPath.getName).sorted
            .mkString(", ")}] — the landing contract is a FLAT " +
          "directory of immutable files (the stream schema check and " +
          "the file-stream source must discover exactly the same " +
          "files); land files at the top level, or point landing_dir: " +
          "at the subdirectory itself")
  }

  /** Per-footer FIELD-NAME check of landed files against the pinned
    * columns, O(NEW files) per invocation: files that passed once are
    * recorded in a `_graft_schema_checked` log under the checkpoint and
    * never re-opened (landed files are immutable by the arriving-files
    * contract; `--full-refresh` resets the log with the checkpoint). A
    * torn log reads as empty and the re-check is idempotent. */
  private def checkLandedFields(spark: SparkSession, srcDir: String,
      checkpoint: String, pinnedNames: Set[String],
      pin: org.apache.hadoop.fs.Path): Unit = {
    val ldConf = spark.sessionState.newHadoopConf()
    val ldPath = new org.apache.hadoop.fs.Path(srcDir)
    val ldFs = ldPath.getFileSystem(ldConf)
    val dataFiles = ldFs.listStatus(ldPath).filter(st => st.isFile && {
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    })
    val logDir = s"$checkpoint/_graft_schema_checked"
    val logPath = new org.apache.hadoop.fs.Path(logDir)
    val logFs = logPath.getFileSystem(ldConf)
    // benign torn first write (dir exists, no data files) reads as
    // empty — every landed file just re-checks, which is idempotent;
    // a log that HOLDS DATA but cannot be read fails by name like the
    // key index's sealed log (silently re-deriving over corruption is
    // the posture this engine refuses everywhere else)
    val already: Set[String] =
      if (!logFs.exists(logPath)) Set.empty
      else
        try spark.read.parquet(logDir).collect().map(_.getString(0)).toSet
        catch {
          case e: org.apache.spark.sql.AnalysisException =>
            val it = logFs.listFiles(logPath, true)
            var hasData = false
            while (!hasData && it.hasNext) {
              val st = it.next()
              val n = st.getPath.getName
              hasData = st.isFile && !n.startsWith("_") && !n.startsWith(".")
            }
            if (!hasData) Set.empty
            else throw new IllegalStateException(
              s"stream_op: curate schema-check log at $logDir holds " +
                "data but cannot be read — rebuild with --full-refresh " +
                s"(${e.getMessage})", e)
        }
    val fresh = dataFiles.filterNot(st => already(st.getPath.toString))
    if (fresh.isEmpty) return
    import scala.jdk.CollectionConverters._
    fresh.foreach { st =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(st, ldConf))
      val names =
        try reader.getFooter.getFileMetaData.getSchema.getFields
          .asScala.map(_.getName).toSet
        finally reader.close()
      val dropped = pinnedNames -- names
      if (dropped.nonEmpty)
        throw new IllegalStateException(
          s"stream_op: curate landed file `${st.getPath}` drifted " +
            s"from the pinned stream schema ($pin): missing " +
            s"[${dropped.toSeq.sorted.mkString(", ")}] — its rows " +
            "would read as NULLs, not fail; remove or fix the file, " +
            "or rebuild with --full-refresh to re-pin the contract")
    }
    // log only AFTER every fresh file passed: a failing run must
    // re-check the offender (and the user may fix the file in place)
    import spark.implicits._
    spark.createDataset(fresh.map(_.getPath.toString).toSeq).toDF("path")
      .coalesce(1).write.mode("append").parquet(logDir)
  }

  /** Thrown by the curate foreachBatch when `max_batches_per_run` is
    * hit — the marker batch never processes or commits, so the durable
    * checkpoint resumes exactly there on the next invocation. */
  private final class DrainLimitReached extends RuntimeException(
    "max_batches_per_run reached")

  private def causeChain(t: Throwable): List[Throwable] =
    if (t == null) Nil
    else t :: (if (t.getCause ne t) causeChain(t.getCause) else Nil)

  private def deleteDir(p: java.nio.file.Path): Unit =
    graft.core.FsUtil.deleteRecursively(p)
}
