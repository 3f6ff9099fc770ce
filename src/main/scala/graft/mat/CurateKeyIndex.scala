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
  *   <cp>/_graft_key_index_params.json         {buckets, keys} — recorded
  *                                             once, verified every run
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
  * when the batch's distinct keys ≲ B (a batch with many more keys
  * than buckets touches them all — size `key_index_buckets:` to the
  * expected per-file key count in durable mode); the floor is a full
  * scan of the NARROW key-only index — the same accepted floor as the
  * settled exact-dedup index the growth rows already fence — never a
  * scan of the wide target. A changed `key_index_buckets:` or
  * `unique_key` is refused by name ([[checkParams]]): bucket
  * membership is hash-determined, and an index laid out under
  * different params would silently miss keys.
  *
  * Reference spec: dbt-fusion's microbatch/incremental idempotence
  * contracts (crates/dbt-schemas/src/schemas/common.rs:523 batch
  * sizing, model_config.rs:79-82 event_time) — the durable landing-dir
  * drain itself is this engine's continuous-deployment extension.
  */
private[graft] object CurateKeyIndex {

  final case class Handle(spark: SparkSession, checkpoint: String,
      keys: Seq[String], buckets: Int) {
    def indexDir: String = s"$checkpoint/_graft_key_index"
    def sealedDir: String = s"$checkpoint/_graft_sealed"
    def paramsPath: String = s"$checkpoint/_graft_key_index_params.json"
    /** Sealed-file names, loaded from the log ONCE per invocation and
      * maintained in memory as seals append — the lock guarantees a
      * single writer, so re-reading the (file-count-sized) log every
      * micro-batch would be pure per-batch overhead. */
    private[CurateKeyIndex] var sealedCache: Set[String] = _
  }

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    fsOf(spark, p).exists(p)
  }

  /** Deterministic bucket of a key tuple: murmur3 `hash` (stable across
    * sessions/JVMs — the same function Spark's own hash partitioning
    * uses) mod `buckets`. NULL keys hash like any value. */
  def bucketOf(keys: Seq[String], buckets: Int): Column =
    pmod(hash(keys.map(k => col(s"`$k`")): _*), lit(buckets))

  /** Record {buckets, keys} on first use; refuse a drifted config by
    * name afterwards — an index laid out under different params would
    * silently miss keys (wrong bucket), turning the exactly-once guard
    * into a sometimes guard. */
  def checkParams(h: Handle): Unit = {
    val p = new Path(h.paramsPath)
    val fs = fsOf(h.spark, p)
    val want = s"""{"buckets":${h.buckets},"keys":[${h.keys
      .map(k => "\"" + k + "\"").mkString(",")}]}"""
    if (fs.exists(p)) {
      val in = fs.open(p)
      val got = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      if (got.trim != want)
        throw new IllegalStateException(
          s"stream_op: curate durable key index at ${h.indexDir} was " +
            s"built under $got but this run configures $want — bucket " +
            "membership is hash-determined, so a changed " +
            "key_index_buckets/unique_key cannot reuse the index; " +
            "rebuild with --full-refresh")
    } else {
      val out = fs.create(p, true)
      try out.write(want.getBytes("UTF-8")) finally out.close()
    }
  }

  private def sealedPaths(h: Handle): Set[String] = {
    if (h.sealedCache != null) return h.sealedCache
    h.sealedCache =
      if (!exists(h.spark, h.sealedDir)) Set.empty
      else
        // a dir torn by a killed write (only _temporary/_SUCCESS inside)
        // reads as UNABLE_TO_INFER_SCHEMA — treat it as empty: the files
        // it would have sealed stay unsealed and this very call's caller
        // re-indexes them (duplicate index rows cannot change an
        // anti-join's verdict, so the re-seal is idempotent)
        try h.spark.read.parquet(h.sealedDir)
          .collect().map(_.getString(0)).toSet
        catch {
          case _: org.apache.spark.sql.AnalysisException => Set.empty
        }
    h.sealedCache
  }

  /** Synchronize the index with the target's CURRENT data files: index
    * the key columns of files not yet sealed, then log them sealed. In
    * steady state the unsealed set is the previous micro-batch's files;
    * after a full build (or rows landed by other writers) it is a
    * one-time catch-up of the new files. `basePath` is the table root,
    * so partition-directory columns survive the raw-file read when a
    * key column is also a partition column. */
  def seal(h: Handle, target: DataFrame, basePath: Option[String]): Unit = {
    val files = target.inputFiles.toSeq
    val already = sealedPaths(h)
    val unsealed = files.filterNot(already)
    if (unsealed.isEmpty) return
    checkParams(h)
    val reader = basePath.foldLeft(h.spark.read)(
      (r, bp) => r.option("basePath", bp))
    reader.parquet(unsealed: _*)
      .select(h.keys.map(k => col(s"`$k`")): _*)
      .withColumn("__kb", bucketOf(h.keys, h.buckets))
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
  }

  /** Reset the index when its accreted small files outnumber
    * `maxFiles` — the per-seal appends (≤ one file per bucket) grow
    * linearly in batch count, and past a point listing/footer overhead
    * dominates the key data. The index is DERIVED state: deletion IS
    * compaction, because the next [[seal]] re-derives it from the
    * target's files in one bucketed pass. Delete order is load-bearing:
    * sealed log FIRST — a crash between the two deletes must leave
    * "nothing sealed" (full re-derive, correct), never "sealed but
    * unindexed" (guard misses keys → duplicates). */
  def compactIfNeeded(h: Handle, maxFiles: Int): Unit = {
    if (!exists(h.spark, h.indexDir)) return
    val idxPath = new Path(h.indexDir)
    val fs = fsOf(h.spark, idxPath)
    var count = 0
    val it = fs.listFiles(idxPath, true)
    while (count <= maxFiles && it.hasNext) {
      if (it.next().isFile) count += 1
    }
    if (count > maxFiles) {
      val sealedPath = new Path(h.sealedDir)
      if (fs.exists(sealedPath)) fs.delete(sealedPath, true)
      fs.delete(idxPath, true)
      h.sealedCache = null // force a re-read (now empty) on next seal
    }
  }

  /** Drop batch rows whose key tuple the index holds — reading ONLY the
    * hash buckets the batch's own keys occupy (`__kb IN …` prunes the
    * partitioned read). Null-safe key equality, like every unique_key
    * guard in the engine. */
  def guard(h: Handle, batch: DataFrame): DataFrame = {
    if (!exists(h.spark, h.indexDir)) return batch
    checkParams(h)
    val touched = batch
      .select(bucketOf(h.keys, h.buckets).as("__kb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return batch
    // a dataless index dir (torn first write) holds no keys to drop —
    // and anything the target actually holds was just re-indexed by
    // this batch's own seal() before guard() runs
    val idx =
      try h.spark.read.parquet(h.indexDir)
        .filter(col("__kb").isin(touched: _*))
      catch {
        case _: org.apache.spark.sql.AnalysisException => return batch
      }
    val cond = h.keys.map(k => batch(s"`$k`") <=> idx(s"`$k`"))
      .reduce(_ && _)
    batch.join(idx, cond, "left_anti")
  }
}
