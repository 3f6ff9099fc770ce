package graft.mat

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted BUCKETED unique-key index bounding the durable-curate
  * replay guard (`stream_op: curate` without `event_time`).
  *
  * The guard's contract is "drop batch rows whose unique_key the target
  * already holds anywhere" — target-as-truth exactly-once under
  * checkpoint replay. Anti-joining each micro-batch against the RAW
  * target key column satisfies it but scans the full target per batch:
  * with `max_files_per_trigger: 1`, draining N landed files against a
  * 100 TB target is N corpus-sized scans — the per-batch term this
  * index removes.
  *
  * Layout, under the stream's checkpoint dir (so `--full-refresh`'s
  * checkpoint delete resets the index with the target, and object-store
  * checkpoint URIs work unchanged):
  *
  *   <cp>/_graft_key_index/__kb=<b>/…parquet   key columns, partitioned
  *                                             by `pmod(hash(keys), B)`
  *   <cp>/_graft_sealed/…parquet               target data-file paths
  *                                             whose keys the index holds
  *   <cp>/_graft_key_index_params.json         {buckets, keys, types} —
  *                                             recorded at the FIRST
  *                                             seal, verified every run
  *
  * The index is DERIVED STATE, synchronized from target files at each
  * batch start ([[seal]]): list the target's data files, read the key
  * columns of just the not-yet-sealed ones (in steady state, the single
  * previous batch's files), append them under their hash buckets, log
  * the files as sealed. Deriving from files — rather than flushing keys
  * after each append — closes every crash window by construction: a
  * batch that appended to the target but never committed its checkpoint
  * leaves unsealed files, and the replay's own seal() indexes them
  * before the guard runs. There is no moment where the target holds a
  * key the (sealed ∪ unsealed-about-to-seal) index cannot see.
  *
  * [[guard]] then anti-joins the batch against ONLY the index buckets
  * the batch's own keys hash into (`__kb IN (…)` partition-prunes the
  * read): per-batch cost is the batch itself plus
  * (touched-buckets / B) of a key-only table. Sizing: pruning bites
  * when the batch's distinct keys ≲ B, so the DEFAULT derives B from
  * the first seal's own evidence — the per-file key count of the files
  * it indexes (a landed file IS a batch in durable mode) — rounded to
  * a power of two and clamped to [16, 4096]; `key_index_buckets:`
  * overrides it. The floor is a full scan of the NARROW key-only index
  * — the same accepted floor as the settled exact-dedup index the
  * growth rows already fence — never a scan of the wide target. A
  * changed `key_index_buckets:`/`unique_key`, or a RETYPED key column,
  * is refused by name ([[checkParams]]/[[resolveParams]]): bucket
  * membership is hash-determined over the column's TYPE as much as its
  * value (`hash(1L)` ≠ `hash("1")`), so an index laid out under
  * different params would silently miss keys.
  *
  * Failure posture: a torn FIRST write (the index/sealed dir exists but
  * holds no data files) reads as empty and self-heals by re-seal; any
  * OTHER unreadable-index state fails BY NAME prescribing
  * `--full-refresh` — a guard that silently skipped would let duplicate
  * rows append with no error, the one outcome the index exists to
  * prevent.
  *
  * Reference spec: dbt-fusion's microbatch/incremental idempotence
  * contracts (crates/dbt-schemas/src/schemas/common.rs:523 batch
  * sizing, model_config.rs:79-82 event_time) — the durable landing-dir
  * drain itself is this engine's continuous-deployment extension.
  */
private[graft] object CurateKeyIndex {

  /** Recorded index layout: bucket count, key column names, and the key
    * columns' catalog type strings (types recorded since r17; a params
    * file written before that carries none — the FIRST typed
    * seal/guard backfills them in place, a one-time upgrade, so a
    * later retype on a legacy checkpoint is fenced exactly like a
    * born-typed one). */
  final case class Params(buckets: Int, keys: Seq[String],
      types: Seq[String])

  final case class Handle(spark: SparkSession, checkpoint: String,
      keys: Seq[String], bucketsConfig: Option[Int]) {
    def indexDir: String = s"$checkpoint/_graft_key_index"
    def sealedDir: String = s"$checkpoint/_graft_sealed"
    def paramsPath: String = s"$checkpoint/_graft_key_index_params.json"
    /** Sealed-file names, loaded from the log ONCE per invocation and
      * maintained in memory as seals append — the lock guarantees a
      * single writer, so re-reading the (file-count-sized) log every
      * micro-batch would be pure per-batch overhead. */
    private[CurateKeyIndex] var sealedCache: Set[String] = _
    /** Params resolved once per invocation (from the params file, the
      * explicit config, or the first seal's auto-sizing). */
    private[CurateKeyIndex] var paramsCache: Option[Params] = None
    /** Estimated file count under [[indexDir]], maintained in memory so
      * the per-batch compaction check costs no listing: initialized by
      * ONE capped listing the first time it is needed, advanced by each
      * seal's (bounded) append estimate, reset by compaction. -1 =
      * not yet initialized. */
    private[CurateKeyIndex] var estFiles: Long = -1L
    /** Touched-bucket count of the LAST guard probe — a tight zero-job
      * upper bound on the files the NEXT seal appends (the next seal
      * indexes the previous batch's survivors, whose buckets ⊆ the
      * previous probe's). -1 = no probe yet this invocation. */
    private[CurateKeyIndex] var lastProbe: Int = -1
  }

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    fsOf(spark, p).exists(p)
  }

  /** Does `dir` hold any DATA file (recursively; `_`/`.`-prefixed
    * metadata like _SUCCESS/_temporary excluded)? Distinguishes the
    * benign torn-first-write (dir exists, nothing visible — safe to
    * read as empty) from a genuinely unreadable index (data present
    * but the read fails — must fail loudly, never skip the guard). */
  /** Is this listed file a DATA file under `root`? The rule Spark's own
    * readers apply (InMemoryFileIndex): a path component starting with
    * `_`/`.` is metadata UNLESS it contains `=` (partition directories
    * like the index's own `__kb=3/` are data), and the rule covers the
    * file name AND every directory component below the root — a part
    * file nested under a crashed write's `_temporary/` tree is NOT
    * data (the parquet read excludes it), and counting it would let a
    * dataless dir read as populated. ONE definition shared by
    * [[hasDataFiles]] and [[compactIfNeeded]]'s counter, so the
    * estFiles signal and the guard's data probe can never disagree. */
  private def isDataFile(root: Path,
      st: org.apache.hadoop.fs.LocatedFileStatus): Boolean = {
    if (!st.isFile) return false
    var p = st.getPath
    val rootUri = root.toUri.getPath
    while (p != null && p.toUri.getPath != rootUri) {
      val n = p.getName
      if ((n.startsWith("_") || n.startsWith(".")) && !n.contains("="))
        return false
      p = p.getParent
    }
    true
  }

  private def hasDataFiles(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return false
    val root = fs.makeQualified(p)
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      if (isDataFile(root, it.next())) return true
    }
    false
  }

  /** Deterministic bucket of a key tuple: murmur3 `hash` (stable across
    * sessions/JVMs — the same function Spark's own hash partitioning
    * uses) mod `buckets`. NULL keys hash like any value. */
  def bucketOf(keys: Seq[String], buckets: Int): Column =
    pmod(hash(keys.map(k => col(s"`$k`")): _*), lit(buckets))

  private def paramsJson(p: Params): String =
    s"""{"buckets":${p.buckets},"keys":[${p.keys
      .map(k => "\"" + k + "\"").mkString(",")}],"types":[${p.types
      .map(t => "\"" + t + "\"").mkString(",")}]}"""

  private def readParamsFile(h: Handle): Option[Params] = {
    val p = new Path(h.paramsPath)
    val fs = fsOf(h.spark, p)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    // elements are the QUOTED strings inside the bracket — never split
    // on bare commas: a catalog type string carries its own
    // (decimal(10,2), struct<a:int,b:string>, map<string,int>), and a
    // comma-split would mangle it into two elements that can never
    // verify again, --full-refresh included
    def strList(field: String): Seq[String] =
      (raw""""$field":\[([^\]]*)\]""".r.findFirstMatchIn(got) match {
        case Some(m) =>
          """"([^"]*)"""".r.findAllMatchIn(m.group(1))
            .map(_.group(1)).toSeq
        case _ => Seq.empty
      })
    val buckets = """"buckets":(\d+)""".r.findFirstMatchIn(got)
      .map(_.group(1).toInt).getOrElse(throw new IllegalStateException(
        s"stream_op: curate durable key index params at ${h.paramsPath} " +
          s"are unreadable ($got) — rebuild with --full-refresh"))
    Some(Params(buckets, strList("keys"), strList("types")))
  }

  /** Refuse a drifted layout by name: recorded vs configured buckets,
    * key names, and (when both sides know them) key column types. An
    * index laid out under different params would silently miss keys
    * (wrong bucket / different hash), turning the exactly-once guard
    * into a sometimes guard. */
  private def verifyAgainst(h: Handle, rec: Params,
      types: Option[Seq[String]]): Params = {
    def refuse(what: String): Nothing =
      throw new IllegalStateException(
        s"stream_op: curate durable key index at ${h.indexDir} was " +
          s"built under ${paramsJson(rec)} but this run $what — bucket " +
          "membership is hash-determined over the key's type and value, " +
          "so a changed key_index_buckets/unique_key/key type cannot " +
          "reuse the index; rebuild with --full-refresh")
    h.bucketsConfig.filter(_ != rec.buckets).foreach(b =>
      refuse(s"configures key_index_buckets=$b"))
    if (h.keys != rec.keys)
      refuse(s"configures unique_key=[${h.keys.mkString(", ")}]")
    types.foreach { t =>
      if (rec.types.nonEmpty && rec.types != t)
        refuse(s"reads key columns typed [${t.mkString(", ")}] " +
          s"(recorded [${rec.types.mkString(", ")}])")
    }
    rec
  }

  /** Default bucket count from the first seal's evidence: the KEY
    * COUNT OF THE BATCH being drained (a landed file IS a micro-batch
    * in durable mode), divided by 32, next power of two, clamped to
    * [16, 4096]. The /32 is the churn/pruning balance: every seal
    * writes ~one file per TOUCHED bucket — B(1−e^(−K/B)) ≈ B files for
    * a K ≥ B key batch — so an OVERSIZED B pays ~K small files per
    * seal (measured 8× per-batch regression when a 12k-key full-build
    * file sized B to 2048) while an UNDERSIZED B only weakens pruning
    * toward the accepted floor (one narrow key-only index scan per
    * batch). Hence the evidence is the batch, never the target's own
    * (few, large) files, and the bias is low: B ≈ K/32 caps seal churn
    * at ~K/32 files, keeps compaction re-derives B-way parallel, and
    * SMALL probes (replay of a file fraction, skewed re-delivery)
    * still prune. The compaction default scales with the same B
    * ([[defaultCompactAt]]) so re-derives amortize to ≤ 1/16 of
    * seals regardless of sizing. */
  private[graft] def autoBuckets(batchKeys: Long): Int = {
    val target = math.max(1L, batchKeys / 32)
    val pow = java.lang.Long.highestOneBit(math.max(1L, target - 1)) * 2
    math.min(4096L, math.max(16L, pow)).toInt
  }

  /** Default `key_index_compact_files`: 16 compaction-free seals'
    * worth of accrual at ~B files per seal (floored at 1024 for small
    * layouts) — each compaction's price is one full re-derive of the
    * index from the target's files, so the threshold must scale WITH
    * the bucket count or a large-B layout would re-derive every
    * couple of batches. Resolved from the recorded params when known
    * (first batch of a fresh checkpoint: the pre-auto-size floor). */
  private[graft] def defaultCompactAt(h: Handle): Int =
    math.max(1024, 16 * h.paramsCache.map(_.buckets).getOrElse(64))

  /** Stage-then-rename, never truncate-in-place: the legacy type
    * backfill REWRITES this file over an established checkpoint, and a
    * crash between `fs.create(path, true)` (which truncates
    * immediately) and the content write would leave a torn params file
    * over surviving index data — bricking the checkpoint into a
    * full-refresh for a one-time metadata upgrade. Staging moves the
    * content write out of the window; the residual crash slot is the
    * delete→rename metadata pair, which at worst leaves the file
    * MISSING (the named params-missing-over-data refusal) or the
    * stale-but-valid original, never garbage. The `.tmp` name keeps
    * the underscore prefix, so data-file listings ignore it. */
  private def writeParamsFile(h: Handle, p: Params): Unit = {
    val path = new Path(h.paramsPath)
    val fs = fsOf(h.spark, path)
    val tmp = new Path(h.paramsPath + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(paramsJson(p).getBytes("UTF-8")) finally out.close()
    if (fs.exists(path)) fs.delete(path, false)
    if (!fs.rename(tmp, path))
      throw new IllegalStateException(
        s"stream_op: curate could not move staged params $tmp into " +
          s"place at $path — the store refused the rename")
  }

  /** A record whose `types` are empty predates typed params (pre-r17
    * checkpoint): the first verify that KNOWS the live types backfills
    * them into the file — without the rewrite, the legacy checkpoint
    * would stay unfenced forever (every later run would again see
    * empty recorded types and skip the drift check), and a retyped key
    * would hash into wrong buckets silently. */
  private def upgradeTypes(h: Handle, rec: Params,
      types: Option[Seq[String]]): Params =
    types.filter(t => rec.types.isEmpty && t.nonEmpty) match {
      case Some(t) =>
        val up = rec.copy(types = t)
        writeParamsFile(h, up)
        up
      case None => rec
    }

  /** Resolve the effective params: the recorded file wins (verified
    * against the config and, when known, the live key types); absent a
    * file, `record` writes one — explicit config or auto-sizing. */
  private def resolveParams(h: Handle, types: Option[Seq[String]],
      record: Option[() => Params]): Params = {
    val cached = h.paramsCache
    if (cached.isDefined) {
      val p = upgradeTypes(h, verifyAgainst(h, cached.get, types), types)
      h.paramsCache = Some(p)
      return p
    }
    readParamsFile(h) match {
      case Some(rec) =>
        val p = upgradeTypes(h, verifyAgainst(h, rec, types), types)
        h.paramsCache = Some(p)
        p
      case None =>
        // recording fresh params is only legal over an EMPTY index: a
        // missing params file with surviving index data (partial
        // checkpoint restore, manual cleanup) is unverifiable — writing
        // a new layout over old-layout files would prune the guard's
        // probe into the wrong buckets and re-delivered rows would
        // append as silent duplicates. seal() hits this path too, so
        // the refusal cannot be bypassed by call order.
        val mk = record.filter(_ =>
          !hasDataFiles(h.spark, h.indexDir)).getOrElse(
          throw new IllegalStateException(
            s"stream_op: curate durable key index at ${h.indexDir} holds " +
              s"data but its params file (${h.paramsPath}) is missing — " +
              "the layout cannot be verified; rebuild with --full-refresh"))
        val p = mk()
        writeParamsFile(h, p)
        h.paramsCache = Some(p)
        p
    }
  }

  /** A sealed log with entries but NO live index data is partial
    * manual cleanup — the engine can never produce the state: [[seal]]
    * writes index data BEFORE sealed names, and [[reset]] deletes the
    * sealed log FIRST, so a crash anywhere leaves at worst index data
    * without its log (harmlessly re-indexed). If the state were waved
    * through, the next seal would trust the log, skip re-indexing
    * every listed file, and the guard would pass replays through as
    * silent duplicates — the exact failure the index exists to
    * prevent. Refuse by name instead. */
  private def assertNoOrphanSealedLog(h: Handle): Unit = {
    val logged = sealedPaths(h)
    if (logged.nonEmpty)
      throw new IllegalStateException(
        s"stream_op: curate sealed-file log at ${h.sealedDir} records " +
          s"${logged.size} sealed files but the key index at " +
          s"${h.indexDir} holds no data — the index was removed " +
          "without its log (partial cleanup), so neither can be " +
          "trusted and the replay guard cannot run; rebuild with " +
          "--full-refresh")
  }

  /** Invocation-time layout check: verify the recorded params against
    * the configuration BEFORE any batch runs — a drained run (zero
    * batches) must not report success under a config the persisted
    * index cannot serve, and a params file MISSING over surviving
    * index data must refuse HERE (named, before the lock and the
    * stream) rather than from inside the first batch's seal. Nothing
    * recorded and nothing indexed is fine: recording happens at the
    * first [[seal]], which also knows the key TYPES and the
    * auto-sizing evidence. */
  def checkParams(h: Handle): Unit = {
    readParamsFile(h) match {
      case Some(rec) => h.paramsCache = Some(verifyAgainst(h, rec, None))
      case None =>
        if (hasDataFiles(h.spark, h.indexDir))
          throw new IllegalStateException(
            s"stream_op: curate durable key index at ${h.indexDir} " +
              s"holds data but its params file (${h.paramsPath}) is " +
              "missing — the layout cannot be verified; rebuild with " +
              "--full-refresh")
    }
    // surface partial cleanup (sealed log without index data) HERE —
    // named, before the lock and the stream — not from inside the
    // first batch's guard
    if (!hasDataFiles(h.spark, h.indexDir)) assertNoOrphanSealedLog(h)
  }

  private def sealedPaths(h: Handle): Set[String] = {
    if (h.sealedCache != null) return h.sealedCache
    h.sealedCache =
      if (!exists(h.spark, h.sealedDir)) Set.empty
      else if (!hasDataFiles(h.spark, h.sealedDir)) Set.empty
      // a dir torn by a killed write (only _temporary/_SUCCESS inside)
      // reads as empty above: the files it would have sealed stay
      // unsealed and this very call's caller re-indexes them (duplicate
      // index rows cannot change an anti-join's verdict, so the re-seal
      // is idempotent). DATA present but unreadable is NOT benign —
      // treating it as empty would silently re-derive over corruption.
      else
        try h.spark.read.parquet(h.sealedDir)
          .collect().map(_.getString(0)).toSet
        catch {
          case e: org.apache.spark.sql.AnalysisException =>
            throw new IllegalStateException(
              s"stream_op: curate durable key index sealed-file log at " +
                s"${h.sealedDir} holds data but cannot be read — rebuild " +
                s"with --full-refresh (${e.getMessage})", e)
        }
    h.sealedCache
  }

  /** Synchronize the index with the target's CURRENT data files: index
    * the key columns of files not yet sealed, then log them sealed. In
    * steady state the unsealed set is the previous micro-batch's files;
    * after a full build (or rows landed by other writers) it is a
    * one-time catch-up of the new files. `basePath` is the table root,
    * so partition-directory columns survive the raw-file read when a
    * key column is also a partition column. The FIRST seal records the
    * params file: explicit config, or buckets auto-sized from the
    * BATCH key count (`batchKeysHint`, supplied by the drain from the
    * micro-batch it is about to guard — the target's own files are few
    * and large after a full build, the WRONG churn evidence; see
    * [[autoBuckets]]). Without a hint the unsealed key count stands
    * in. */
  def seal(h: Handle, target: DataFrame, basePath: Option[String],
      batchKeysHint: Option[() => Long] = None): Unit = {
    val files = target.inputFiles.toSeq
    val already = sealedPaths(h)
    val unsealed = files.filterNot(already)
    if (unsealed.isEmpty) return
    // the raw-file read happens UNDER THE TARGET'S DECLARED SCHEMA for
    // the key columns: partition-directory values would otherwise be
    // type-INFERRED ('42' → int, '2024-01-01' → date) and murmur3
    // hashes the type as much as the value — an int-inferred seal and
    // a bigint-declared guard would bucket the same key differently
    // and the anti-join would silently miss. A post-hoc CAST is not
    // enough either: inference is lossy before the cast ever runs (a
    // string partition value '007' infers int 7, casting back yields
    // '7' ≠ '007'), so the declared type must reach the PARSER.
    // Key fields resolve case-insensitively, like every col() lookup
    // on the analysis path (spark.sql.caseSensitive=false default).
    val keyFields = h.keys.map(k =>
      target.schema.fields.find(_.name.equalsIgnoreCase(k)).getOrElse(
        throw new IllegalArgumentException(
          s"stream_op: curate unique_key column `$k` does not exist " +
            s"on the target (columns: ${target.schema.fieldNames
              .mkString(", ")})")))
    val reader = basePath.foldLeft(
      h.spark.read.schema(
        org.apache.spark.sql.types.StructType(keyFields)))(
      (r, bp) => r.option("basePath", bp))
    val keyFrame = reader.parquet(unsealed: _*)
      .select(h.keys.map(k => col(s"`$k`")): _*)
    // unsealed files with ZERO rows between them (the schema-only
    // rebuild's empty target file) must not enter the sealed log WHILE
    // THE INDEX IS DATALESS: the partitioned write of an empty key
    // frame emits no data files, so logging them would MANUFACTURE the
    // orphan sealed-log-over-dataless-index state the guard refuses as
    // partial cleanup — bricking a healthy checkpoint at its first
    // real batch. The probe is gated on the in-memory accrual signal:
    // `estFiles > 0` means the index provably holds data (initialized
    // from a real listing, advanced only by seals that wrote files,
    // zeroed by reset), so the orphan state is impossible and a
    // zero-key file may seal harmlessly — steady-state seals pay no
    // extra job. Only the dataless/unknown window (first seals of a
    // fresh or just-reset index) runs the limit-1 read.
    if (h.estFiles <= 0 && keyFrame.isEmpty) return
    val types = keyFrame.schema.fields.map(_.dataType.catalogString).toSeq
    val params = resolveParams(h, Some(types), Some(() =>
      Params(h.bucketsConfig.getOrElse {
        // one count job — a first-seal-only bootstrap cost
        autoBuckets(batchKeysHint.map(_()).getOrElse(keyFrame.count()))
      }, h.keys, types)))
    keyFrame
      .withColumn("__kb", bucketOf(h.keys, params.buckets))
      // shuffle each bucket into ONE task before the partitioned write:
      // a raw partitionBy write emits one file per (task, bucket) pair —
      // up to tasks×buckets small files PER SEAL; this caps it at one
      // file per bucket per seal while the big post-full-build catch-up
      // still writes with full cluster parallelism (min(buckets, cores))
      .repartition(col("__kb"))
      .write.mode("append").partitionBy("__kb").parquet(h.indexDir)
    // the sealed log is append-only file names; written AFTER the index
    // append so a crash between the two re-reads the files as unsealed
    // — the guard-style anti-join below in the NEXT seal is not needed
    // because duplicate index rows cannot change an anti-join's verdict
    import h.spark.implicits._
    h.spark.createDataset(unsealed).toDF("path")
      .coalesce(1).write.mode("append").parquet(h.sealedDir)
    h.sealedCache = already ++ unsealed
    // advance the in-memory accrual estimate: this seal wrote one file
    // per distinct bucket of the indexed keys — bounded by the LAST
    // guard probe's touched-bucket count (the indexed rows are the
    // previous batch's survivors) when one exists, by the bucket count
    // otherwise. An overestimate only compacts earlier — safe direction.
    if (h.estFiles >= 0)
      h.estFiles +=
        (if (h.lastProbe >= 0) math.min(h.lastProbe.toLong, params.buckets)
         else params.buckets.toLong)
  }

  /** Reset the index when its accreted small files outnumber
    * `maxFiles` — the per-seal appends (≤ one file per bucket) grow
    * linearly in batch count, and past a point listing/footer overhead
    * dominates the key data. The index is DERIVED state: deletion IS
    * compaction, because the next [[seal]] re-derives it from the
    * target's files in one bucketed pass. Delete order is load-bearing:
    * sealed log FIRST — a crash between the two deletes must leave
    * "nothing sealed" (full re-derive, correct), never "sealed but
    * unindexed" (guard misses keys → duplicates). The params file is
    * KEPT: bucket layout survives compaction, so re-derived buckets
    * match every index row ever written. */
  def compactIfNeeded(h: Handle, maxFiles: Int): Unit = {
    if (!exists(h.spark, h.indexDir)) {
      if (h.estFiles < 0) h.estFiles = 0
      return
    }
    val idxPath = new Path(h.indexDir)
    val fs = fsOf(h.spark, idxPath)
    // ONE capped listing initializes the estimate; afterwards seal()
    // advances it in memory — the check is called per MICRO-BATCH (a
    // long drain must compact mid-run, not only at the next
    // invocation: each seal appends up to touched-buckets files, and
    // without in-drain relief the guard's per-batch index read would
    // pay an ever-growing file listing), so it must not itself list
    // the tree it exists to keep small
    if (h.estFiles < 0) {
      var count = 0L
      // DATA files only, the same shared rule as hasDataFiles (incl.
      // `_temporary` ancestors): counting markers or crashed-write
      // leftovers would (a) inflate the compaction estimate and (b)
      // let a dataless dir read as estFiles > 0 — which seal's
      // zero-key gate trusts as "index provably holds data",
      // re-opening the orphan-sealed-log window the gate closes
      val root = fs.makeQualified(idxPath)
      val it = fs.listFiles(idxPath, true)
      while (count <= maxFiles && it.hasNext) {
        if (isDataFile(root, it.next())) count += 1
      }
      h.estFiles = count
    }
    if (h.estFiles > maxFiles) reset(h)
  }

  /** Drop the index + sealed log (params KEPT — the bucket layout must
    * survive so re-derived buckets match any row ever written); the
    * next [[seal]] re-derives both from the target's current files in
    * one bucketed pass. Called by [[compactIfNeeded]] past the file
    * threshold, and by the drain after a TARGET compaction: the
    * rewritten target's files all have new names, so the sealed log
    * holds only dead entries and the old index only rows under dead
    * files — the re-derive is the SAME one-time bucketed catch-up the
    * post-rewrite seal would do anyway, minus the dead-name log and
    * the duplicate index rows it would otherwise drag forever. Delete
    * order is load-bearing: sealed log FIRST — a crash between the two
    * deletes must leave "nothing sealed" (full re-derive, correct),
    * never "sealed but unindexed" (guard misses keys → duplicates). */
  def reset(h: Handle): Unit = {
    val idxPath = new Path(h.indexDir)
    val fs = fsOf(h.spark, idxPath)
    val sealedPath = new Path(h.sealedDir)
    if (fs.exists(sealedPath)) fs.delete(sealedPath, true)
    if (fs.exists(idxPath)) fs.delete(idxPath, true)
    h.sealedCache = null // force a re-read (now empty) on next seal
    h.estFiles = 0
    // the NEXT seal is a full re-derive over all target files (up to
    // one file per bucket), not the previous batch's survivors — a
    // stale probe count would undercount its accrual by up to B
    h.lastProbe = -1
  }

  /** Drop batch rows whose key tuple the index holds — reading ONLY the
    * hash buckets the batch's own keys occupy (`__kb IN …` prunes the
    * partitioned read). Null-safe key equality, like every unique_key
    * guard in the engine. The batch's key TYPES are verified against
    * the recorded params (the durable stream-schema pin fences retypes
    * upstream, but bounded mode's per-run checkpoint and direct Handle
    * use have no such fence — a retyped key hashes to different
    * buckets, which must refuse by name, never silently miss). */
  def guard(h: Handle, batch: DataFrame): DataFrame = {
    if (!exists(h.spark, h.indexDir)) {
      // a missing index is only benign while the sealed log is ALSO
      // empty — see assertNoOrphanSealedLog (and sealedPaths
      // short-circuits on a missing log dir, so the fresh-start and
      // bounded-mode paths pay one exists() probe)
      assertNoOrphanSealedLog(h)
      return batch
    }
    // case-insensitive, like every col() lookup on the analysis path
    val batchTypes = h.keys.map(k =>
      batch.schema.fields.find(_.name.equalsIgnoreCase(k)).getOrElse(
        throw new IllegalArgumentException(
          s"stream_op: curate unique_key column `$k` does not exist " +
            s"on the batch (columns: ${batch.schema.fieldNames
              .mkString(", ")})")).dataType.catalogString)
    // an index dir that exists but holds neither data nor params is the
    // torn FIRST write (or a manual cleanup that removed both): nothing
    // is indexed, so there is nothing to drop — the guard no-ops and
    // the next seal records fresh params. Only params-missing-over-
    // SURVIVING-DATA refuses (inside resolveParams), because that
    // layout is unverifiable.
    if (h.paramsCache.isEmpty && readParamsFile(h).isEmpty &&
        !hasDataFiles(h.spark, h.indexDir)) {
      // ...unless the sealed log still lists files: then this is not a
      // torn first write but a partially cleaned index, and no-opping
      // would let the next seal trust the log and skip re-indexing
      assertNoOrphanSealedLog(h)
      return batch
    }
    val params = resolveParams(h, Some(batchTypes), None)
    val touched = batch
      .select(bucketOf(h.keys, params.buckets).as("__kb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    h.lastProbe = touched.length
    if (touched.isEmpty) return batch
    // a dataless index dir (torn first write) holds no keys to drop —
    // and anything the target actually holds was just re-indexed by
    // this batch's own seal() before guard() runs. Data present but
    // unreadable REFUSES: returning the batch unguarded would append
    // duplicates with no error — the exact failure the index prevents.
    val idx =
      try h.spark.read.parquet(h.indexDir)
        .filter(col("__kb").isin(touched: _*))
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          if (!hasDataFiles(h.spark, h.indexDir)) {
            assertNoOrphanSealedLog(h)
            return batch
          }
          throw new IllegalStateException(
            s"stream_op: curate durable key index at ${h.indexDir} " +
              "holds data but cannot be read — the replay guard cannot " +
              "run, and skipping it would append duplicate rows " +
              s"silently; rebuild with --full-refresh (${e.getMessage})",
            e)
      }
    val cond = h.keys.map(k => batch(s"`$k`") <=> idx(s"`$k`"))
      .reduce(_ && _)
    batch.join(idx, cond, "left_anti")
  }
}
