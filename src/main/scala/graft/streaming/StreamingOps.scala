package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Structured Streaming materializations (SURVEY §2.A streaming_table /
  * microbatch streaming mode, reference common.rs:231-232 + the
  * `event_time`/`lookback` microbatch config family).
  *
  * The batch microbatch loop (graft.mat.MicrobatchRunner) is the primary
  * path, exactly like the reference; this module is the additive streaming
  * mode: `readStream` → watermark → tumbling-window agg →
  * `writeStream` with Trigger.AvailableNow. The watermark delay plays the
  * role of `lookback` — late rows inside the delay still land in their
  * window; windows only emit (append mode) once the watermark passes, so
  * results over a bounded input are deterministic.
  */
object StreamingOps {

  /** Raw schema of events.parquet for readStream (which requires a user
    * schema). The file's ts column has shipped both as parquet
    * TIMESTAMP(NANOS) — readable only as a raw nanos long via the legacy
    * conf — and as TIMESTAMP(MICROS) without timezone (NTZ), so probe the
    * footer with a one-file batch read and adapt, exactly like
    * [[graft.Tables]]. */
  def rawEventsSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Run `f` with `spark.sql.legacy.parquet.nanosAsLong=true`, restoring
    * the previous session value (or unsetting) afterwards. The flag is
    * needed while an op probes the events footer AND while its stream
    * plans/executes (nanos generations of events.parquet are unreadable
    * without it), but it must not leak into the session and change how
    * unrelated parquet reads see TIMESTAMP(NANOS) columns afterwards. */
  private def withNanosAsLong[T](spark: SparkSession)(f: => T): T = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try f finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** The ts column's storage type in this sfDir's events file (LongType
    * for nanos generations, TIMESTAMP_NTZ for micros generations).
    * Driver-side metadata read of one footer — no data scan. */
  private def eventsTsType(spark: SparkSession, sfDir: String): DataType =
    withNanosAsLong(spark) {
      spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    }

  /** ts normalized to epoch MICROSECONDS (long) for either generation.
    * Session TZ is UTC everywhere, so the NTZ→session-type cast preserves
    * the wall clock. */
  private def tsUs(tsType: DataType): org.apache.spark.sql.Column =
    tsType match {
      case LongType => expr("ts div 1000")
      case TimestampType => unix_micros(col("ts"))
      case _ => unix_micros(col("ts").cast(TimestampType))
    }

  /** ts normalized to a session-type TIMESTAMP for either generation. */
  private def tsStamp(tsType: DataType): org.apache.spark.sql.Column =
    tsType match {
      case LongType => expr("timestamp_micros(ts div 1000)")
      case TimestampType => col("ts")
      case _ => col("ts").cast(TimestampType)
    }

  /** The file stream source wants a DIRECTORY to monitor; stage the table
    * file into one (in production the events lake already is a directory
    * of arriving files). */
  private def stageDir(sfDir: String): String = {
    val dir = Files.createTempDirectory("graft_stream_src")
    Files.copy(java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  /** One-day tumbling-window aggregation over the events stream, emitted
    * incrementally with a 1-day watermark. Returns the final sink contents
    * (windows whose end the closing watermark passed — on bounded input:
    * every day ≤ max(ts) − 2 days). */
  def dailyWindowAgg(spark: SparkSession, sfDir: String): DataFrame =
      withNanosAsLong(spark) {
    val sink = Files.createTempDirectory("graft_stream_sink").toString
    val checkpoint = Files.createTempDirectory("graft_stream_cp").toString

    val tsT = eventsTsType(spark, sfDir)
    val stream = spark.readStream
      .schema(rawEventsSchema(tsT))
      .parquet(stageDir(sfDir))
      .withColumn("ts", tsStamp(tsT))
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total_value"))
      .select(col("window.start").cast("date").as("day"),
        col("event_type"), col("n_events"), col("total_value"))

    val q = stream.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(sink)
    q.awaitTermination()
    spark.read.parquet(sink)
  }

  /** SLIDING-window streaming aggregation: 7-day windows advancing one
    * day — the rolling-metric mode (7-day actives, rolling revenue)
    * where each event lands in 7 overlapping windows. All state is the
    * built-in watermarked window aggregation (windows × event-types
    * rows; the ×7 fan-out happens map-side in the window generator, not
    * in state rows per event). Append mode emits a window once the
    * watermark passes its END, exactly as for tumbling windows — the
    * q_stream_window closed-window cutoff rule applies to window.end
    * unchanged. */
  def slidingWindowAgg(spark: SparkSession, sfDir: String): DataFrame =
      withNanosAsLong(spark) {
    val sink = Files.createTempDirectory("graft_slide_sink").toString
    val checkpoint = Files.createTempDirectory("graft_slide_cp").toString
    val tsT = eventsTsType(spark, sfDir)
    val stream = spark.readStream
      .schema(rawEventsSchema(tsT))
      .parquet(stageDir(sfDir))
      .withColumn("ts", tsStamp(tsT))
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "7 days", "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").cast("date").as("win_start"),
        col("window.end").cast("date").as("win_end"),
        col("event_type"), col("n_events"))
    val q = stream.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(sink)
    q.awaitTermination()
    spark.read.parquet(sink)
  }

  /** Built-in SESSION-window aggregation (`session_window(ts, gap)`):
    * Spark's native merging-window state instead of
    * [[sessionizeStream]]'s custom flatMapGroupsWithState — the
    * recommended path when per-session output is a plain aggregate
    * (count/sum), since the state store handles window merging,
    * watermark eviction, and recovery for free; the custom-state
    * operator remains for outputs an aggregate can't express. Append
    * mode emits a session once the watermark passes its END, so —
    * unlike the custom op's every-closed-session contract — the cutoff
    * rule here is the same watermark-past-end rule the tumbling and
    * sliding window ops pin. */
  def sessionWindowAgg(spark: SparkSession, sfDir: String,
      gapMinutes: Int = 30): DataFrame = withNanosAsLong(spark) {
    val sink = Files.createTempDirectory("graft_sesswin_sink").toString
    val checkpoint = Files.createTempDirectory("graft_sesswin_cp").toString
    val tsT = eventsTsType(spark, sfDir)
    val stream = spark.readStream
      .schema(rawEventsSchema(tsT))
      .parquet(stageDir(sfDir))
      .withColumn("ts", tsStamp(tsT))
      .withWatermark("ts", "1 day")
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
    val q = stream.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(sink)
    q.awaitTermination()
    spark.read.parquet(sink)
  }

  /** Streaming per-window top-k (trending event types per day): the
    * watermarked 1-day window aggregation holds windows × event-types
    * rows of built-in state (no custom state), and the rank finisher
    * runs batch over the CLOSED windows in the sink — the same
    * sketch-then-finish split as the streaming HLL/quantile ops, so
    * continuous deployments pay only the bounded window-agg state.
    * Ties rank deterministically (count desc, event_type asc). */
  def dailyTopEventTypes(spark: SparkSession, sfDir: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("day"))
      .orderBy(col("n_events").desc, col("event_type"))
    dailyWindowAgg(spark, sfDir)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("day"), col("event_type"), col("n_events"), col("rank"))
  }

  /** Streaming distribution-drift monitor: watermarked 1-day windows
    * aggregate per-event-type counts (append mode — only closed
    * windows emit), then each closed day's event-type distribution is
    * scored against the distribution over ALL closed days with the
    * same Laplace-smoothed KL contract as the batch
    * [[graft.ops.TextAnalysis.tokenKlDrift]] (the count-table entry
    * point [[graft.ops.TextAnalysis.klFromTokenCounts]]) — the
    * production shape for "did today's traffic mix drift": streaming
    * state is just Spark's built-in windowed aggregation (windows ×
    * event types rows), and the KL assembly runs batch over the sink,
    * deterministic and oracle-checkable. Output per closed day:
    * event count and KL in nats (rounded 6). */
  def eventTypeDriftDaily(spark: SparkSession, sfDir: String): DataFrame =
      withNanosAsLong(spark) {
    val sink = Files.createTempDirectory("graft_stream_sink").toString
    val checkpoint = Files.createTempDirectory("graft_stream_cp").toString
    val tsT = eventsTsType(spark, sfDir)
    val stream = spark.readStream
      .schema(rawEventsSchema(tsT))
      .parquet(stageDir(sfDir))
      .withColumn("ts", tsStamp(tsT))
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("date").as("day"),
        col("event_type"), col("n"))
    val q = stream.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(sink)
    q.awaitTermination()
    graft.ops.TextAnalysis.klFromTokenCounts(
      spark.read.parquet(sink), "day", "event_type", "n")
      .withColumnRenamed("n_tokens", "n_events")
  }

  /** Streaming mix-collapse monitor: each closed 1-day window's
    * event-type ENTROPY (is today's traffic diverse or did one source
    * swallow the mix?) — [[eventTypeDriftDaily]]'s sibling on the same
    * built-in watermarked window aggregation, finished with the batch
    * entropy contract (TextAnalysis.entropyFromTokenCounts), so
    * streaming and batch share one verified decimal-summed math. */
  def eventTypeEntropyDaily(spark: SparkSession, sfDir: String): DataFrame =
      withNanosAsLong(spark) {
    val sink = Files.createTempDirectory("graft_stream_sink").toString
    val checkpoint = Files.createTempDirectory("graft_stream_cp").toString
    val tsT = eventsTsType(spark, sfDir)
    val stream = spark.readStream
      .schema(rawEventsSchema(tsT))
      .parquet(stageDir(sfDir))
      .withColumn("ts", tsStamp(tsT))
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("date").as("day"),
        col("event_type"), col("n"))
    val q = stream.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(sink)
    q.awaitTermination()
    graft.ops.TextAnalysis.entropyFromTokenCounts(
      spark.read.parquet(sink), "day", "event_type", "n")
      .withColumnRenamed("n_tokens", "n_events")
  }

  /** Streaming exact dedup by key with state: first occurrence wins, state
    * keyed per event_id — the KeyValueGroupedDataset.flatMapGroupsWithState
    * shape used for custom streaming state. Bounded input + AvailableNow ⇒
    * deterministic output set. */
  def streamingDedup(spark: SparkSession, sfDir: String): DataFrame =
      withNanosAsLong(spark) {
    import spark.implicits._
    val sink = Files.createTempDirectory("graft_dedup_sink").toString
    val checkpoint = Files.createTempDirectory("graft_dedup_cp").toString

    val stream = spark.readStream
      .schema(rawEventsSchema(eventsTsType(spark, sfDir)))
      .parquet(stageDir(sfDir))
      // duplicate the stream so the dedup has real work to do
      .select(col("event_id"), col("user_id"), col("event_type"))
    val doubled = stream.unionByName(stream)

    val deduped = streamingDedupStream(doubled.as[(Long, Long, String)])

    val q = deduped.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(sink)
    q.awaitTermination()
    spark.read.parquet(sink)
  }

  /** The dedup state transform over an already-constructed
    * (event_id, user_id, event_type) stream — factored from
    * [[streamingDedup]] so tests can drive it across micro-batches.
    * State per key is ONE boolean, but the key space is every event id
    * ever seen — unbounded on a continuous stream. `ttl` arms a
    * processing-time timeout that frees a key's seen-flag, turning exact
    * forever-dedup into windowed dedup (a duplicate arriving after the
    * horizon re-emits — the standard bounded-state trade, same contract
    * as dropDuplicates + watermark). Bounded AvailableNow replays leave
    * it unset, preserving the exact-dedup oracle. */
  def streamingDedupStream(stream: Dataset[(Long, Long, String)],
      ttl: Option[java.time.Duration] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import stream.sparkSession.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, Long, String)](
        OutputMode.Append(), timeoutConf) {
        case (_, rows, state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) {
            ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
            Iterator.empty
          } else {
            state.update(true)
            ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
            rows.take(1)
          }
      }
      .toDF("event_id", "user_id", "event_type")
  }

  /** Streaming media dedup — the streaming twin of the batch
    * `media_dedup` step for its EXACT-invariance dup classes: each
    * payload maps to a 64-bit fingerprint through the SAME native
    * expressions the batch op uses (`phash` = DCT image hash over the
    * decoded pixels, `audio` = envelope-spectrum hash over the decoded
    * PCM, `exact` = body checksum, each paired with the payload length
    * as a collision backstop), and one boolean of state per fingerprint
    * class keeps the FIRST occurrence. "First" is deterministic: the
    * MIN id within a micro-batch, the earliest batch across batches —
    * so a bounded single-batch replay emits exactly min-id per class,
    * which is what the oracle pins. Payloads the method cannot decode,
    * and decodable payloads with no perceptual signal (the 0L
    * sentinel), are ALWAYS KEPT and bypass the stateful operator
    * entirely (no state, no key-0 hot partition) — the batch step's
    * exact contract for the same rows.
    *
    * BOUNDARY (the batch/incremental ops keep it): hamming-ball
    * near-dup merging — re-encodes within ≤3 bits that are NOT exact
    * invariances, e.g. lossy JPEG or 8-bit audio re-quantization —
    * does not stream here. It would need banded multi-key state (4
    * band keys per doc) plus a cross-key verify join per batch; the
    * incremental pipeline already provides exactly that against
    * persisted indexes. The EXACT invariances (identical pixels across
    * PNG/JPEG-lossless/GRFT containers, gain scaling and resampling
    * for audio — see PhashSpec/AudioHashSpec) DO merge here, because
    * the fingerprints are bit-identical.
    *
    * State per class is one boolean; the class count is unbounded on a
    * continuous stream — `ttl` arms the standard processing-time
    * timeout (a dup arriving after the horizon re-emits, the bounded-
    * state trade every stream twin documents). Bounded AvailableNow
    * replays leave it unset. */
  def mediaDedupStream(stream: DataFrame, method: String = "phash",
      idCol: String = "doc_id", payloadCol: String = "payload",
      ttl: Option[java.time.Duration] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import graft.expressions.PipelineExpressions
    import graft.ops.Multimodal
    import stream.sparkSession.implicits._
    val pay = col(s"`$payloadCol`")
    // (fingerprint, length) class key + the always-keep flag; fp is
    // NULL (→ flagged) when the container sniff fails or the hash is
    // the 0L no-signal sentinel
    val fp: Column = method match {
      case "phash" =>
        when(Multimodal.isPhashable(payloadCol),
          PipelineExpressions.media_phash(pay)).otherwise(lit(null))
      case "audio" =>
        when(Multimodal.isAudioContainer(payloadCol),
          PipelineExpressions.media_audio_hash(pay)).otherwise(lit(null))
      case "exact" =>
        when(Multimodal.isGrft(payloadCol),
          PipelineExpressions.media_checksum(pay)).otherwise(lit(null))
      case other => throw new IllegalArgumentException(
        s"media_dedup stream method must be phash|audio|exact: $other")
    }
    // id column resolves case-insensitively (like every col() lookup)
    // and must exist, named; the min-id keep then needs an ordered id —
    // refuse anything else by name (a cast would silently NULL
    // non-numeric ids), exactly like the batch step's contract
    val idField = stream.schema.fields
      .find(_.name.equalsIgnoreCase(idCol)).getOrElse(
        throw new IllegalArgumentException(
          s"media_dedup stream `id_col` ($idCol) does not exist on " +
            s"the stream (columns: ${stream.schema.fieldNames
              .mkString(", ")})"))
    val idName = idField.name
    if (!Set[org.apache.spark.sql.types.DataType](LongType, IntegerType,
        ShortType, ByteType).contains(idField.dataType))
      throw new IllegalArgumentException(
        s"media_dedup stream `id_col` ($idCol) must be an integral " +
          s"type for the min-id keep, got ${idField.dataType.catalogString}")
    // the class key pairs the checksum with the payload LENGTH only for
    // `exact` (the batch op's (n_bytes, checksum) key); the perceptual
    // hashes must NOT carry it — equal pixels/PCM in different
    // containers hash identically but differ in container bytes, and
    // splitting on length would undo exactly those merges
    val lenKey: Column =
      if (method == "exact") length(pay).cast("long") else lit(0L)
    // output keeps the FULL ROW of each kept occurrence (the batch
    // step is column-neutral; dropping payload/metadata here would
    // leave a streaming_table target holding a bare id list)
    val tagged = stream
      .withColumn("__fp", fp).withColumn("__len", lenKey)
    // NULL ids pass through with the sentinels: an id-less row cannot
    // participate in a min-id keep, and silently crashing the state
    // function on it (minBy over null) is the one wrong answer
    val keep = col("__fp").isNull || col("__fp") === 0L ||
      col(s"`$idName`").isNull
    val pass = tagged.filter(keep).drop("__fp", "__len")
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val dedupIn = tagged.filter(!keep)
    val fpIdx = dedupIn.schema.fieldIndex("__fp")
    val lenIdx = dedupIn.schema.fieldIndex("__len")
    val iIdx = dedupIn.schema.fieldIndex(idName)
    implicit val keyEnc: org.apache.spark.sql.Encoder[(Long, Long)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong)
    val rowEnc = org.apache.spark.sql.Encoders.row(dedupIn.schema)
    val deduped = dedupIn
      .groupByKey(r => (r.getLong(fpIdx), r.getLong(lenIdx)))
      .flatMapGroupsWithState[Boolean, org.apache.spark.sql.Row](
        OutputMode.Append(), timeoutConf) {
        (_, rows, state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) {
            ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
            Iterator.empty
          } else {
            state.update(true)
            ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
            // min-id row of THIS batch's class members — group-sized
            Iterator.single(rows.minBy(
              _.getAs[Number](iIdx).longValue()))
          }
      }(implicitly, rowEnc)
      .drop("__fp", "__len")
    deduped.unionByName(pass)
  }

  /** Drive a streaming transform over a bounded ONE-BATCH replay of
    * `batch`: stage to a throwaway dir, readStream it whole (no
    * maxFilesPerTrigger ⇒ AvailableNow processes everything as one
    * micro-batch), run `transform`, drain to a parquet sink, read the
    * sink back. The single-batch shape is what makes min-id-per-class
    * stream ops deterministic and oracle-checkable. */
  def boundedReplay(batch: DataFrame)
      (transform: DataFrame => DataFrame): DataFrame = {
    val spark = batch.sparkSession
    val srcDir = Files.createTempDirectory("graft_breplay_src").toString
    val sink = Files.createTempDirectory("graft_breplay_sink").toString
    val checkpoint = Files.createTempDirectory("graft_breplay_cp").toString
    // the staged corpus copy and the checkpoint are per-run throwaways
    // — deleted ALSO on a failing stream, or repeated gate runs fill
    // /tmp with full media-corpus copies. The SINK must outlive this
    // call: the returned DataFrame reads it lazily.
    try {
      batch.write.mode("overwrite").parquet(srcDir)
      val schema = spark.read.parquet(srcDir).schema
      val out = transform(spark.readStream.schema(schema).parquet(srcDir))
      val q = out.writeStream
        .format("parquet")
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start(sink)
      q.awaitTermination()
      spark.read.parquet(sink)
    } finally {
      graft.core.FsUtil.deleteRecursively(java.nio.file.Paths.get(srcDir))
      graft.core.FsUtil.deleteRecursively(
        java.nio.file.Paths.get(checkpoint))
    }
  }

  /** Streaming CDC compaction: maintain each key's LATEST change (by
    * (ts, seq)) and emit a row whenever a micro-batch advances it — the
    * upsert stream a "materialized latest-state view" consumes, and the
    * streaming twin of [[graft.ops.Cdc.compact]]. Delete-as-latest
    * emits too (a TOMBSTONE row, op preserved) so downstream knows the
    * key vanished; stale changes (older than the current latest) emit
    * nothing. On bounded single-batch input every key emits exactly
    * once — its global latest change — which is what the oracle pins.
    *
    * State per key is one (ts, seq, op, value) 4-tuple — O(1) — but the
    * KEY COUNT is unbounded on a continuous stream; `ttl` arms the
    * processing-time timeout that frees inactive keys (after expiry a
    * STALE change would re-emit as if fresh — the bounded-state trade,
    * acceptable when the TTL exceeds the source's max disorder). */
  def cdcCompactStream(stream: Dataset[(Long, Long, Long, String, Double)],
      ttl: Option[java.time.Duration] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import stream.sparkSession.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, String, Double),
        (Long, Long, Long, String, Double)](
        OutputMode.Append(), timeoutConf) {
        case (key, rows, state: GroupState[(Long, Long, String, Double)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // newest change in THIS batch, (ts, seq) order
            def newer(aTs: Long, aSeq: Long, bTs: Long, bSeq: Long) =
              aTs > bTs || (aTs == bTs && aSeq > bSeq)
            val batchBest = rows.foldLeft(
              Option.empty[(Long, Long, String, Double)]) { (acc, r) =>
              val cand = (r._2, r._3, r._4, r._5)
              if (acc.forall(a => newer(cand._1, cand._2, a._1, a._2)))
                Some(cand)
              else acc
            }
            ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
            batchBest match {
              case Some(b) if state.getOption
                  .forall(s => newer(b._1, b._2, s._1, s._2)) =>
                state.update(b)
                Iterator.single((key, b._1, b._2, b._3, b._4))
              case _ => Iterator.empty
            }
          }
      }
      .toDF("user_id", "ts_us", "seq", "op", "value")
  }

  /** Streaming level-shift monitor: each event type's closed-day count
    * series through the batch changepoint op — "which day did this
    * metric's level move" refreshed as windows close;
    * [[eventTypeDriftDaily]]'s sibling on the same built-in watermarked
    * window aggregation, finished with
    * Timeseries.changepointByGroup so streaming and batch share one
    * verified prefix-sum segmentation. */
  def eventTypeChangepointDaily(spark: SparkSession,
      sfDir: String): DataFrame = withNanosAsLong(spark) {
    val sink = Files.createTempDirectory("graft_stream_sink").toString
    val checkpoint = Files.createTempDirectory("graft_stream_cp").toString
    val tsT = eventsTsType(spark, sfDir)
    val stream = spark.readStream
      .schema(rawEventsSchema(tsT))
      .parquet(stageDir(sfDir))
      .withColumn("ts", tsStamp(tsT))
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("date").as("day"),
        col("event_type"), col("n"))
    val q = stream.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(sink)
    q.awaitTermination()
    graft.ops.Timeseries.changepointByGroup(
      spark.read.parquet(sink), "event_type", "day", "n")
  }

  /** Streaming first-order transition pairs: per-key state is ONE
    * (ts_us, event_id, state) triple — the key's last seen event. Each
    * micro-batch sorts its rows per key in (ts, id) order, emits a
    * (from, to) pair for every adjacency INCLUDING the bridge from the
    * stored last event to the batch's first, then stores the batch's
    * last. A single AvailableNow batch therefore reproduces the batch
    * operator's pair multiset exactly (same (ts, id) total order), and
    * a continuous deployment accumulates identical pairs across batch
    * boundaries — the bridge is what windowed re-derivation would
    * lose. Optional processing-time TTL frees idle keys (a re-arriving
    * key restarts with no bridge). Input tuples:
    * (key, ts_us, event_id, state) with NULL states filtered by the
    * caller. */
  def transitionStream(stream: Dataset[(Long, Long, Long, String)],
      ttl: Option[java.time.Duration] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import stream.sparkSession.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, String), (String, String)](
        OutputMode.Append(), timeoutConf) {
        case (_, rows, state: GroupState[(Long, Long, String)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.map(r => (r._2, r._3, r._4)).toSeq
              .sortBy(r => (r._1, r._2))
            if (sorted.isEmpty) Iterator.empty
            else {
              ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
              val chain = state.getOption.toSeq ++ sorted
              state.update(sorted.last)
              chain.iterator.sliding(2).withPartial(false)
                .map { case Seq(a, b) => (a._3, b._3) }
            }
          }
      }
      .toDF("from_state", "to_state")
  }

  /** Driver entry for [[transitionStream]]: per-user event-type
    * transitions over the staged events, one AvailableNow batch, then
    * the batch finisher (Sessions.transitionsFromPairs) — so the result
    * hash-matches the batch q_seq_transitions oracle verbatim. */
  def transitions(spark: SparkSession, sfDir: String): DataFrame =
      withNanosAsLong(spark) {
    import spark.implicits._
    val sink = Files.createTempDirectory("graft_trans_sink").toString
    val checkpoint = Files.createTempDirectory("graft_trans_cp").toString
    val tsT = eventsTsType(spark, sfDir)
    val stream = spark.readStream
      .schema(rawEventsSchema(tsT))
      .parquet(stageDir(sfDir))
      .filter(col("event_type").isNotNull)
      .select(col("user_id"), tsUs(tsT).as("ts_us"), col("event_id"),
        col("event_type"))
    val pairs = transitionStream(
      stream.as[(Long, Long, Long, String)])
    val q = pairs.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(sink)
    q.awaitTermination()
    graft.ops.Sessions.transitionsFromPairs(
      spark.read.parquet(sink), "from_state", "to_state")
  }

  /** Driver entry for [[cdcCompactStream]]: events as a per-user
    * changelog ('error' = delete), one AvailableNow batch → exactly one
    * emission per user (its latest change incl. tombstones). */
  def cdcCompact(spark: SparkSession, sfDir: String): DataFrame =
      withNanosAsLong(spark) {
    import spark.implicits._
    val sink = Files.createTempDirectory("graft_cdc_sink").toString
    val checkpoint = Files.createTempDirectory("graft_cdc_cp").toString
    val tsT = eventsTsType(spark, sfDir)
    val stream = spark.readStream
      .schema(rawEventsSchema(tsT))
      .parquet(stageDir(sfDir))
      .select(col("user_id"), tsUs(tsT).as("ts_us"), col("event_id"),
        when(col("event_type") === "error", lit("D"))
          .otherwise(lit("U")).as("op"),
        col("value"))
    val compacted = cdcCompactStream(
      stream.as[(Long, Long, Long, String, Double)])
    val q = compacted.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(sink)
    q.awaitTermination()
    spark.read.parquet(sink)
  }

  /** Gap-based sessionization per user — the custom-state streaming shape
    * (KeyValueGroupedDataset.flatMapGroupsWithState) a training pipeline
    * uses to group event/interaction logs into sessions. A session CLOSES
    * when a later event from the same user arrives more than `gapMinutes`
    * after the previous one; closed sessions emit immediately, the
    * still-open tail session stays in state (and, on bounded input, is
    * intentionally never emitted — exactly what the oracle mirrors).
    * All gap arithmetic runs in Long microseconds (exact, no timestamp
    * rounding); state is the open session (start_us, last_us, n).
    * At scale the stream shuffles once on user_id and state is O(1) per
    * user. Within a batch the group's rows are sorted by event time
    * (bounded per user-batch); the single-file AvailableNow source here
    * yields one batch, and a production multi-batch stream relies on the
    * watermark ordering batches by event time. */
  def sessionize(spark: SparkSession, sfDir: String,
      gapMinutes: Int = 30): DataFrame = withNanosAsLong(spark) {
    import spark.implicits._
    val sink = Files.createTempDirectory("graft_sess_sink").toString
    val checkpoint = Files.createTempDirectory("graft_sess_cp").toString

    val tsT = eventsTsType(spark, sfDir)
    val stream = spark.readStream
      .schema(rawEventsSchema(tsT))
      .parquet(stageDir(sfDir))
      .select(col("user_id"), tsUs(tsT).as("ts_us"))
      .as[(Long, Long)]
    val closed = sessionizeStream(stream, gapMinutes)

    val q = closed.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(sink)
    q.awaitTermination()
    spark.read.parquet(sink)
  }

  /** The sessionize state transform over an already-constructed
    * (user_id, ts_us) stream — factored from [[sessionize]] so tests can
    * drive it with a MemoryStream across multiple micro-batches.
    *
    * `ttl`, when set, arms a PROCESSING-TIME timeout per key: a key with
    * no new events inside the window has its open tail session emitted
    * (closed by inactivity) and its state freed, so key cardinality
    * cannot grow without bound on a continuous stream — without a TTL
    * the state store eventually holds every key ever seen. Bounded
    * AvailableNow replays leave `ttl` unset (state dies with the query,
    * the open tail is intentionally never emitted), which is exactly
    * what the batch-equivalence oracles pin. */
  def sessionizeStream(stream: Dataset[(Long, Long)], gapMinutes: Int = 30,
      ttl: Option[java.time.Duration] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import stream.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long, Long)](
        OutputMode.Append(), timeoutConf) {
        case (user, rows, state: GroupState[(Long, Long, Long)]) =>
          if (state.hasTimedOut) {
            // inactivity close: the open tail session emits, the key's
            // state is freed — a later event starts a fresh session
            val tail = state.getOption.map { case (s, l, n) => (user, s, l, n) }
            state.remove()
            tail.iterator
          } else {
            val ts = rows.map(_._2).toArray.sorted
            var (start, last, n) = state.getOption.getOrElse((-1L, -1L, 0L))
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Long, Long, Long)]
            ts.foreach { t =>
              if (start < 0) { start = t; last = t; n = 1 }
              else if (t - last > gapUs) {
                out += ((user, start, last, n))
                start = t; last = t; n = 1
              } else { last = t; n += 1 }
            }
            if (start >= 0) state.update((start, last, n))
            ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
            out.iterator
          }
      }
      .toDF("user_id", "start_us", "end_us", "n_events")
      .select(col("user_id"),
        expr("timestamp_micros(start_us)").as("session_start"),
        expr("timestamp_micros(end_us)").as("session_end"),
        col("n_events"))
  }

  /** Streaming windowed HLL registers: approximate distinct counting
    * per tumbling day window — the streaming twin of
    * [[graft.ops.Sketch.hllRegisters]]. The register update is a plain
    * watermarked `max` aggregation (HLL's merge IS max, so Spark's
    * built-in streaming aggregation state — at most windows × 2^p rows —
    * carries the whole sketch; no custom state needed), emitted in
    * append mode once the watermark closes each window. Feed the sink to
    * [[graft.ops.Sketch.hllEstimateByGroup]] for per-day estimates with
    * the same exact-integer math as the batch sketch. */
  def dailyHllRegisters(spark: SparkSession, sfDir: String,
      itemCol: String, p: Int = 6): DataFrame = withNanosAsLong(spark) {
    val sink = Files.createTempDirectory("graft_hll_sink").toString
    val checkpoint = Files.createTempDirectory("graft_hll_cp").toString
    // the SAME bucket/rank derivation as the batch sketches — one
    // definition, no drift
    val (bucket, rank) = graft.ops.Sketch.hllBucketAndRank(col(itemCol), p)

    val tsT = eventsTsType(spark, sfDir)
    val stream = spark.readStream
      .schema(rawEventsSchema(tsT))
      .parquet(stageDir(sfDir))
      .withColumn("ts", tsStamp(tsT))
      .withWatermark("ts", "1 day")
      .select(col("ts"), bucket.as("bucket"), rank.as("rank"))
      .groupBy(window(col("ts"), "1 day"), col("bucket"))
      .agg(max("rank").as("register"))
      .select(col("window.start").cast("date").as("day"),
        col("bucket"), col("register"))

    val qy = stream.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(sink)
    qy.awaitTermination()
    spark.read.parquet(sink)
  }

  /** Streaming per-day value-histogram cells: the power-of-two histogram
    * sketch's bucket counts MERGE BY SUM, so per-window histograms ride
    * Spark's built-in watermarked window aggregation — state is
    * windows × ≤ 64 bucket rows, no custom state — exactly the
    * [[dailyHllRegisters]] reuse shape. The bucket derivation (bit
    * length of floor(value)) is the SAME expression as the batch
    * [[graft.ops.Sketch.logHistogramQuantiles]]; quantile extraction
    * over the closed windows is its shared batch finisher
    * `histogramQuantilesFromCells` — one definition, no drift. */
  def dailyValueHistogramCells(spark: SparkSession,
      sfDir: String): DataFrame = withNanosAsLong(spark) {
    val sink = Files.createTempDirectory("graft_histq_sink").toString
    val checkpoint = Files.createTempDirectory("graft_histq_cp").toString
    val tsT = eventsTsType(spark, sfDir)
    val stream = spark.readStream
      .schema(rawEventsSchema(tsT))
      .parquet(stageDir(sfDir))
      .withColumn("ts", tsStamp(tsT))
      .withWatermark("ts", "1 day")
      .withColumn("__bkt",
        length(bin(floor(col("value")).cast("long"))))
      .groupBy(window(col("ts"), "1 day"), col("__bkt"))
      .agg(count(lit(1)).as("__c"))
      .select(col("window.start").cast("date").as("day"),
        col("__bkt"), col("__c"))
    val q = stream.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(sink)
    q.awaitTermination()
    spark.read.parquet(sink)
  }

  /** Streaming ordered funnel — the incremental twin of
    * [[graft.ops.Funnel]]: per-key funnel depth maintained in
    * `flatMapGroupsWithState`. State per key is the first `maxPerStep`
    * event timestamps of each step (sorted, HARD-bounded — the same
    * default-on buffer bound as the batch operator, so a bot key cannot
    * balloon streaming state); each batch merges its events into the
    * bounded arrays, recomputes the completion cascade
    * t_i = first(s_i ≥ t_{i−1}), and emits the key's current depth
    * (each row carries the key's update counter, and the final select
    * keeps only each key's LAST emission via max_by, so a key whose
    * events span several micro-batches still yields exactly one row).
    * Bounded input + `Trigger.AvailableNow` ⇒ exactly the batch
    * funnel's answer. The buffer bound defaults from the SAME conf as
    * the batch operator (`spark.graft.funnelMaxPerStep`) so the two
    * stay answer-equivalent by default.
    *
    * @param beforeUs only events strictly before this epoch-micros bound
    *                 enter the funnel (None = all) */
  def funnelDepth(spark: SparkSession, sfDir: String, steps: Seq[String],
      maxPerStep: Option[Int] = None,
      beforeUs: Option[Long] = None): DataFrame = {
    import spark.implicits._
    require(steps.size >= 2, s"a funnel needs at least 2 steps: $steps")
    maxPerStep.foreach(n => require(n > 0, s"maxPerStep must be positive: $n"))
    val cap = math.max(1, maxPerStep.getOrElse(
      spark.conf.get("spark.graft.funnelMaxPerStep", "10000").toInt))
    withNanosAsLong(spark) {
    val sink = Files.createTempDirectory("graft_funnel_sink").toString
    val checkpoint = Files.createTempDirectory("graft_funnel_cp").toString

    val tsT = eventsTsType(spark, sfDir)
    val stream = spark.readStream
      .schema(rawEventsSchema(tsT))
      .parquet(stageDir(sfDir))
      .select(col("user_id"), col("event_type"),
        tsUs(tsT).as("ts_us"))
      .filter(beforeUs.map(b => col("ts_us") < b).getOrElse(lit(true)))
      .as[(Long, String, Long)]

    val depths = funnelDepthStream(stream, steps, cap)

    val q = depths.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(sink)
    q.awaitTermination()
    // one row per key: the LAST emission wins when a key's events
    // spanned several micro-batches (update_idx is the per-key counter)
    spark.read.parquet(sink)
      .groupBy(col("user_id"))
      .agg(expr("max_by(funnel_depth, update_idx)").as("funnel_depth"))
    }
  }

  /** The funnel state transform over an already-constructed
    * (user_id, event_type, ts_us) stream — factored from [[funnelDepth]]
    * so tests can drive it with a MemoryStream across micro-batches.
    *
    * State = per-step sorted arrays of the first `cap` timestamps, plus
    * a leading 1-element update counter; a key with events of NO step
    * still holds (empty) state so depth-0 users are emitted, matching
    * the batch operator's groupBy. Per-key state is hard-bounded by
    * `cap`, but without a TTL the KEY COUNT grows without bound on a
    * continuous stream; `ttl` arms a processing-time timeout that frees
    * an inactive key's state (no emission — its depth was already
    * emitted on every update). Bounded AvailableNow replays leave `ttl`
    * unset, preserving the batch-equivalence contract the oracles pin. */
  def funnelDepthStream(stream: Dataset[(Long, String, Long)],
      steps: Seq[String], cap: Int,
      ttl: Option[java.time.Duration] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import stream.sparkSession.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    val nSteps = steps.size
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    stream
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Seq[Long]], (Long, Long, Int)](
        OutputMode.Append(), timeoutConf) {
        case (user, rows, state: GroupState[Seq[Seq[Long]]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
          val prior = state.getOption
            .getOrElse(Seq(Seq(0L)) ++ Seq.fill(nSteps)(Seq.empty[Long]))
          // emission index = (processing-time ms, within-state counter):
          // the counter alone RESTARTS after a TTL expiry frees the key,
          // and a max_by(depth, update_idx) consumer would tie a fresh
          // emission against a stale pre-expiry one; the time component
          // keeps post-expiry indices strictly above them (an expiry is
          // always ≥ the TTL after the last emission, so same-ms
          // collisions across an expiry cannot happen)
          val counter = prior.head.head + 1
          val update =
            state.getCurrentProcessingTimeMs() * 65536L + (counter & 0xffffL)
          val arrays = prior.tail
          val incoming = Array.fill(nSteps)(
            scala.collection.mutable.ArrayBuffer.empty[Long])
          rows.foreach { case (_, tpe, ts) =>
            stepIdx.get(tpe).foreach(i => incoming(i) += ts)
          }
          val merged = arrays.zipWithIndex.map { case (old, i) =>
            if (incoming(i).isEmpty) old
            else (old ++ incoming(i)).sorted.take(cap)
          }
          state.update(Seq(Seq(counter)) ++ merged)
          ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
          // cascade: t_i = first event of step i at-or-after t_{i-1}
          var depth = 0
          var prev = Long.MinValue
          var i = 0
          var stuck = false
          while (i < nSteps && !stuck) {
            merged(i).find(_ >= prev) match {
              case Some(t) => depth = i + 1; prev = t
              case None => stuck = true
            }
            i += 1
          }
          Iterator.single((user, update, depth))
          }
      }
      .toDF("user_id", "update_idx", "funnel_depth")
  }

  /** Stream–stream interval join: the stateful two-stream shape — click
    * events join purchase events of the SAME user within a bounded
    * event-time window. Both sides carry watermarks and the join
    * condition bounds purchase_ts ∈ [click_ts, click_ts + window], so
    * Spark can expire join state (unbounded state is the classic
    * stream-stream failure mode at scale; the time bound is what makes
    * 100 TB/day streams joinable). Bounded input + AvailableNow +
    * watermark ≥ the data's full span ⇒ the complete, deterministic
    * batch-equivalent result. */
  def intervalJoin(spark: SparkSession, sfDir: String,
      windowMinutes: Int = 60): DataFrame = withNanosAsLong(spark) {
    val sink = Files.createTempDirectory("graft_ssjoin_sink").toString
    val checkpoint = Files.createTempDirectory("graft_ssjoin_cp").toString
    val staged = stageDir(sfDir)
    val tsT = eventsTsType(spark, sfDir)

    def side(eventType: String, prefix: String) = spark.readStream
      .schema(rawEventsSchema(tsT))
      .parquet(staged)
      .filter(col("event_type") === eventType)
      .select(col("event_id").as(s"${prefix}_id"),
        col("user_id").as(s"${prefix}_user"),
        tsStamp(tsT).as(s"${prefix}_ts"),
        col("value").as(s"${prefix}_value"))
      .withWatermark(s"${prefix}_ts", "30 days")

    val joined = side("click", "c").join(side("purchase", "p"),
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("c_user").as("user_id"), col("c_id").as("click_id"),
        col("p_id").as("purchase_id"), col("c_ts").as("click_ts"),
        col("p_ts").as("purchase_ts"))

    val q = joined.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(sink)
    q.awaitTermination()
    spark.read.parquet(sink)
  }

  /** Stream–stream LEFT OUTER interval join — the attribution shape
    * where unconverted clicks must still come out the other side. The
    * null-extended row for an unmatched left event can only emit once
    * the watermark proves no match can still arrive (left.ts + window
    * all the way past the watermark), so the watermark delay is the
    * emission latency for misses: 1 day here, vs the inner join's
    * lenient 30 days — outer results are exactly why the delay must be
    * chosen, not maximal. State on both sides stays event-time-bounded
    * exactly as in the inner join. */
  def intervalJoinLeftOuter(spark: SparkSession, sfDir: String,
      windowMinutes: Int = 60): DataFrame = withNanosAsLong(spark) {
    val sink = Files.createTempDirectory("graft_ssloj_sink").toString
    val checkpoint = Files.createTempDirectory("graft_ssloj_cp").toString
    val staged = stageDir(sfDir)
    val tsT = eventsTsType(spark, sfDir)
    def side(eventType: String, prefix: String) = spark.readStream
      .schema(rawEventsSchema(tsT))
      .parquet(staged)
      .filter(col("event_type") === eventType)
      .select(col("event_id").as(s"${prefix}_id"),
        col("user_id").as(s"${prefix}_user"),
        tsStamp(tsT).as(s"${prefix}_ts"),
        col("value").as(s"${prefix}_value"))
      .withWatermark(s"${prefix}_ts", "1 day")
    val joined = side("click", "c").join(side("purchase", "p"),
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
      "left_outer")
      .select(col("c_user").as("user_id"), col("c_id").as("click_id"),
        col("p_id").as("purchase_id"), col("c_ts").as("click_ts"),
        col("p_ts").as("purchase_ts"))
    val q = joined.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(sink)
    q.awaitTermination()
    spark.read.parquet(sink)
  }

  /** Stream–static enrichment join: the stateless streaming shape — each
    * micro-batch of the events stream hash-joins against a STATIC
    * dimension snapshot (read per batch, broadcast by Catalyst since the
    * dim is small). No state store, no watermark: at scale this is the
    * standard "decorate the firehose" pattern, and the only shuffle is
    * whatever the static side's broadcast costs. Inner join ⇒ append mode
    * is exact; bounded input + AvailableNow ⇒ deterministic output set. */
  def enrichWithStatic(spark: SparkSession, sfDir: String): DataFrame =
      withNanosAsLong(spark) {
    val sink = Files.createTempDirectory("graft_enrich_sink").toString
    val checkpoint = Files.createTempDirectory("graft_enrich_cp").toString

    val dim = spark.read.parquet(s"$sfDir/nation.parquet")
      .select(col("n_nationkey"), col("n_name"))
    val enriched = spark.readStream
      .schema(rawEventsSchema(eventsTsType(spark, sfDir)))
      .parquet(stageDir(sfDir))
      .withColumn("nation_key", pmod(col("user_id"), lit(25)).cast("int"))
      .join(dim, col("nation_key") === col("n_nationkey"))
      .select(col("event_id"), col("event_type"), col("n_name"),
        col("value"))

    val q = enriched.writeStream
      .format("parquet")
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start(sink)
    q.awaitTermination()
    spark.read.parquet(sink)
  }
}
