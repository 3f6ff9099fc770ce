package graft.packs

import graft.streaming.StreamingOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming operators (SURVEY §2.A streaming_table): the
  * streaming mode of microbatch processing, driven to completion with
  * Trigger.AvailableNow so results are deterministic and oracle-checkable. */
object StreamingPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // watermarked tumbling-window aggregation, append mode
    "q_stream_window" -> ((s, dir) => {
      StreamingOps.dailyWindowAgg(s, dir)
        .orderBy("day", "event_type")
    }),

    // flatMapGroupsWithState streaming dedup (first occurrence wins)
    "q_stream_dedup" -> ((s, dir) => {
      StreamingOps.streamingDedup(s, dir)
        .orderBy("event_id")
    }),

    // built-in session_window aggregation: native merging-window state
    // (no custom state); append emits once the watermark passes the
    // session END
    "q_stream_session_window" -> ((s, dir) => {
      StreamingOps.sessionWindowAgg(s, dir, gapMinutes = 30)
        .orderBy("user_id", "session_start")
    }),

    // sliding 7-day windows advancing daily: each event lands in 7
    // overlapping windows map-side; state stays windows × event-types
    "q_stream_sliding" -> ((s, dir) => {
      StreamingOps.slidingWindowAgg(s, dir)
        .orderBy("win_start", "event_type")
    }),

    // flatMapGroupsWithState CDC compaction: one O(1) latest-change
    // state per key; single AvailableNow batch ⇒ exactly one emission
    // per user — its latest change, tombstones included
    "q_stream_cdc" -> ((s, dir) => {
      StreamingOps.cdcCompact(s, dir)
        .orderBy("user_id")
    }),

    // flatMapGroupsWithState gap-based sessionization: closed sessions
    // emit; each user's open tail session stays in state
    "q_stream_sessionize" -> ((s, dir) => {
      StreamingOps.sessionize(s, dir, gapMinutes = 30)
        .orderBy("user_id", "session_start")
    }),

    // streaming per-day top-k event types: built-in watermarked window
    // agg state only; the rank finisher runs batch over closed windows
    "q_stream_topk" -> ((s, dir) => {
      StreamingOps.dailyTopEventTypes(s, dir, k = 2)
        .orderBy("day", "rank")
    }),

    // stream–static broadcast enrichment (stateless, append-exact)
    "q_stream_enrich" -> ((s, dir) => {
      StreamingOps.enrichWithStatic(s, dir)
        .orderBy("event_id")
    }),

    // stream–stream interval join (watermarked, state-bounded)
    "q_stream_join" -> ((s, dir) => {
      StreamingOps.intervalJoin(s, dir, windowMinutes = 60)
        .orderBy("user_id", "click_id", "purchase_id")
    }),

    // LEFT OUTER stream–stream interval join: unconverted clicks emit
    // null-extended once the watermark proves no match can arrive
    "q_stream_left_join" -> ((s, dir) => {
      StreamingOps.intervalJoinLeftOuter(s, dir, windowMinutes = 60)
        .orderBy("user_id", "click_id", "purchase_id")
    }),

    // streaming windowed HLL: per-day approximate distinct users —
    // HLL's register merge IS max, so the whole sketch rides Spark's
    // built-in watermarked aggregation state (windows × 2^p rows);
    // estimates come from the same exact-integer math as the batch op
    "q_stream_hll_daily" -> ((s, dir) => {
      val regs = StreamingOps.dailyHllRegisters(s, dir, "user_id", p = 6)
      graft.ops.Sketch.hllEstimateByGroup(regs, Seq("day"), p = 6)
        .orderBy("day")
    }),

    // streaming per-day value quantiles: merge-by-sum histogram cells
    // ride the built-in watermarked window agg; the batch finisher
    // extracts the quantiles over the closed days
    "q_stream_histq" -> ((s, dir) => {
      val cells = StreamingOps.dailyValueHistogramCells(s, dir)
      graft.ops.Sketch.histogramQuantilesFromCells(cells, "day",
        "__bkt", "__c", Seq(("p50", 1, 2), ("p95", 19, 20)))
        .orderBy("day", "label")
    }),

    // streaming drift monitor: closed 1-day windows' event-type mix
    // scored against all closed days with the batch KL contract —
    // state is only the built-in windowed aggregation
    "q_stream_drift" -> ((s, dir) => {
      StreamingOps.eventTypeDriftDaily(s, dir)
        .orderBy("day")
    }),

    // each closed day's event-type mix entropy — the mix-collapse
    // monitor on the same watermarked window state, batch entropy math
    "q_stream_entropy" -> ((s, dir) => {
      StreamingOps.eventTypeEntropyDaily(s, dir)
        .orderBy("day")
    }),

    // streaming level-shift monitor: closed-day counts through the
    // batch changepoint segmentation — shared math, watermark cutoff
    "q_stream_changepoint" -> ((s, dir) => {
      StreamingOps.eventTypeChangepointDaily(s, dir)
        .orderBy("event_type")
    }),

    // streaming Markov transitions: one (ts, id, state) triple of state
    // per key bridges batch boundaries, so the AvailableNow run
    // reproduces the batch operator exactly — shared oracle
    "q_stream_transitions" -> ((s, dir) => {
      StreamingOps.transitions(s, dir)
        .orderBy("from_state", "to_state")
    }),

    // streaming media dedup (stream_op: media_dedup, method: audio):
    // per-payload envelope-spectrum fingerprint map-side, one boolean
    // of state per fingerprint class, min-id-per-class on the bounded
    // one-batch replay. Fixture mirrors q_media_dedup_audio's EXACT
    // invariances: every 2nd/3rd recording re-appears gain-scaled /
    // resampled under a high id — bit-identical fingerprints, so each
    // variant merges into its original; the near-dup (hamming-ball)
    // cases stay with the batch op by the documented boundary.
    "q_stream_media_dedup" -> ((s, dir) => {
      import graft.ops.Multimodal
      val docs = graft.Tables(s, dir, "documents")
        .filter(col("doc_id") % 7 === 0 && length(col("text")) >= 32)
        .select("doc_id", "text")
      val media = Multimodal.syntheticAudioWav(docs)
      val re = udf((p: Array[Byte], g: Double, dec: Int) =>
        graft.ops.AudioHash.reencode(p, g, dec))
      val v1 = media.filter(col("doc_id") % 14 === 0)
        .withColumn("doc_id", col("doc_id") + 500000L)
        .withColumn("payload", re(col("payload"), lit(0.7), lit(1)))
      val v2 = media.filter(col("doc_id") % 21 === 0)
        .withColumn("doc_id", col("doc_id") + 600000L)
        .withColumn("payload", re(col("payload"), lit(0.85), lit(2)))
      val corpus = media.unionByName(v1).unionByName(v2)
        .select("doc_id", "payload")
      // project INSIDE the transform: the replay's parquet sink must
      // outlive this call (the result reads it lazily), so narrowing
      // before the sink keeps it an id list instead of a kept-media copy
      StreamingOps.boundedReplay(corpus)(s =>
        StreamingOps.mediaDedupStream(s, method = "audio")
          .select("doc_id"))
        .orderBy("doc_id")
    }),

    // streaming media dedup, method: phash — the DCT image hash over
    // DECODED pixels through the stream twin. Fixture mirrors
    // q_media_dedup_phash's EXACT invariances: pixel-replication
    // upscale (+brightness) re-encodes hash IDENTICALLY to their
    // originals (box-filter + AC-median invariances, measured hamming
    // 0), so exact-fingerprint state merges each variant into its
    // original; unrelated mosaics sit at ≥14 bits and never merge.
    "q_stream_media_dedup_phash" -> ((s, dir) => {
      import graft.ops.Multimodal
      val docs = graft.Tables(s, dir, "documents")
        .filter(col("doc_id") % 6 === 0 && length(col("text")) >= 60 &&
          col("doc_id") % 640 >= 7 && col("doc_id") % 480 >= 7)
        .select("doc_id", "text")
      val media = Multimodal.syntheticMedia2D(docs)
      val re = udf((p: Array[Byte], sc: Int, b: Int) =>
        graft.ops.Phash.reencodeGray(p, sc, b))
      val v1 = media.filter(col("doc_id") % 12 === 0)
        .withColumn("doc_id", col("doc_id") + 500000L)
        .withColumn("payload", re(col("payload"), lit(2), lit(9)))
      val v2 = media.filter(col("doc_id") % 18 === 0)
        .withColumn("doc_id", col("doc_id") + 600000L)
        .withColumn("payload", re(col("payload"), lit(3), lit(0)))
      val corpus = media.unionByName(v1).unionByName(v2)
        .select("doc_id", "payload")
      StreamingOps.boundedReplay(corpus)(s2 =>
        StreamingOps.mediaDedupStream(s2, method = "phash")
          .select("doc_id"))
        .orderBy("doc_id")
    }),

    // streaming media dedup, method: exact — the (body checksum,
    // length) class through the stream twin. Fixture mirrors
    // q_media_dedup_exact: every 4th media doc re-appears under a high
    // id with GRFT header dims derived from the NEW id but an
    // identical BODY (the checksum covers body bytes only and the
    // header is fixed-width, so the class key matches exactly).
    "q_stream_media_dedup_exact" -> ((s, dir) => {
      import graft.ops.Multimodal
      val docs = graft.Tables(s, dir, "documents")
        .filter(col("doc_id") % 5 === 0).select("doc_id", "text")
      val corpus = docs.unionByName(
        docs.filter(col("doc_id") % 4 === 0)
          .withColumn("doc_id", col("doc_id") + 500000L))
      val media = Multimodal.syntheticMedia(corpus)
        .select("doc_id", "payload")
      StreamingOps.boundedReplay(media)(s2 =>
        StreamingOps.mediaDedupStream(s2, method = "exact")
          .select("doc_id"))
        .orderBy("doc_id")
    }),

    // incremental ordered funnel with bounded per-key state — same
    // two-day slice and depth distribution as the batch q_funnel, so it
    // shares that oracle verbatim (streaming == batch on bounded input)
    "q_stream_funnel" -> ((s, dir) => {
      // 2024-01-03T00:00:00Z in epoch micros
      StreamingOps.funnelDepth(s, dir,
        steps = Seq("signup", "click", "purchase"),
        beforeUs = Some(1704240000000000L))
        .groupBy("funnel_depth")
        .agg(count(lit(1)).as("n_users"))
        .orderBy("funnel_depth")
    })
  )

  def oracles: Map[String, String] = Map(
    // append mode only emits windows whose END the closing watermark
    // (max(ts) − 1 day) passed ⇒ days ≤ date(max(ts) − 2 days)
    "q_stream_window" ->
      """WITH wm AS (SELECT CAST(max(ts) - INTERVAL 2 DAY AS DATE) AS last_day
        |            FROM events)
        |SELECT CAST(ts AS DATE) AS day, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
        |FROM events
        |WHERE CAST(ts AS DATE) <= (SELECT last_day FROM wm)
        |GROUP BY 1, 2
        |ORDER BY day, event_type""".stripMargin,

    "q_stream_dedup" ->
      """SELECT event_id, user_id, event_type FROM events
        |ORDER BY event_id""".stripMargin,

    // session_window's end = last event + gap; append emits once the
    // closing watermark (max ts − 1 day) passes that end
    "q_stream_session_window" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |sess AS (
        |  SELECT user_id, ts,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |                        ROWS UNBOUNDED PRECEDING) AS sno
        |  FROM marked),
        |agg AS (
        |  SELECT user_id, min(ts) AS session_start,
        |    max(ts) + INTERVAL 30 MINUTE AS session_end,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM sess GROUP BY user_id, sno),
        |m AS (SELECT max(CAST(ts AS TIMESTAMP)) AS mx FROM events)
        |SELECT user_id, session_start, session_end, n_events
        |FROM agg WHERE session_end <= (SELECT mx - INTERVAL 1 DAY FROM m)
        |ORDER BY user_id, session_start""".stripMargin,

    // an event at day d lands in the 7 daily-aligned windows starting
    // d-6..d; append mode emits once the closing watermark
    // (max ts − 1 day) passes the window END
    "q_stream_sliding" ->
      """WITH wm AS (
        |  SELECT CAST(max(ts) - INTERVAL 1 DAY AS DATE) AS cutoff
        |  FROM events),
    |x AS (
        |  SELECT CAST(ts AS DATE) - CAST(o.off AS INT) AS win_start,
        |    event_type
        |  FROM events CROSS JOIN (SELECT unnest(range(7)) AS off) o),
        |w AS (
        |  SELECT win_start, win_start + 7 AS win_end, event_type,
        |    count(*) AS n_events
        |  FROM x GROUP BY 1, 2, 3)
        |SELECT win_start, win_end, event_type,
        |  CAST(n_events AS BIGINT) AS n_events
        |FROM w, wm WHERE win_end <= cutoff
        |ORDER BY win_start, event_type""".stripMargin,

    // one batch ⇒ one emission per key: its (ts, event_id)-latest
    // change, deletes included as tombstones (op = 'D')
    "q_stream_cdc" ->
      """WITH log AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id AS seq,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, ts_us, seq, op, value
        |FROM log WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // the q_stream_window closed-day cutoff, then rank per day by
    // (count desc, event_type asc), keep the top 2
    "q_stream_topk" ->
      """WITH wm AS (SELECT CAST(max(ts) - INTERVAL 2 DAY AS DATE) AS last_day
        |            FROM events),
        |counts AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n_events
        |  FROM events
        |  WHERE CAST(ts AS DATE) <= (SELECT last_day FROM wm)
        |  GROUP BY 1, 2)
        |SELECT day, event_type, n_events, rank FROM (
        |  SELECT day, event_type, n_events,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY day
        |      ORDER BY n_events DESC, event_type) AS INT) AS rank
        |  FROM counts) t
        |WHERE rank <= 2 ORDER BY day, rank""".stripMargin,

    // same closed-window cutoff as q_stream_window, then the
    // klDriftSql grid over (day, event_type) counts — four exact
    // double factors, DECIMAL(38,18) order-independent day sums
    "q_stream_drift" ->
      """WITH wm AS (SELECT CAST(max(ts) - INTERVAL 2 DAY AS DATE) AS last_day
        |            FROM events),
        |gt AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type AS t, count(*) AS cgt
        |  FROM events
        |  WHERE CAST(ts AS DATE) <= (SELECT last_day FROM wm)
        |  GROUP BY 1, 2),
        |g AS (SELECT day, sum(cgt) AS ng FROM gt GROUP BY 1),
        |tv AS (SELECT t, sum(cgt) AS ct FROM gt GROUP BY 1),
        |tot AS (SELECT sum(cgt) AS n, count(DISTINCT t) AS v FROM gt),
        |grid AS (
        |  SELECT g.day, tv.t, g.ng, tv.ct, tot.n, tot.v,
        |    COALESCE(x.cgt, 0) AS cgt
        |  FROM g CROSS JOIN tv CROSS JOIN tot
        |  LEFT JOIN gt x ON x.day = g.day AND x.t = tv.t),
        |terms AS (
        |  SELECT day, ng,
        |    CAST((CAST(cgt AS DOUBLE) + 1.0)
        |           / (CAST(ng AS DOUBLE) + CAST(v AS DOUBLE))
        |         * ln(((CAST(cgt AS DOUBLE) + 1.0)
        |                * (CAST(n AS DOUBLE) + CAST(v AS DOUBLE)))
        |              / ((CAST(ng AS DOUBLE) + CAST(v AS DOUBLE))
        |                 * (CAST(ct AS DOUBLE) + 1.0)))
        |      AS DECIMAL(38,18)) AS kl_term
        |  FROM grid)
        |SELECT day, CAST(max(ng) AS BIGINT) AS n_events,
        |  round(CAST(sum(kl_term) AS DOUBLE), 6) AS kl
        |FROM terms GROUP BY day ORDER BY day""".stripMargin,

    // the watermark cutoff feeding the same prefix-sum binary
    // segmentation as the batch q_ts_changepoint oracle
    "q_stream_changepoint" ->
      """WITH wm AS (SELECT CAST(max(ts) - INTERVAL 2 DAY AS DATE) AS last_day
        |            FROM events),
        |daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
        |  FROM events
        |  WHERE CAST(ts AS DATE) <= (SELECT last_day FROM wm)
        |  GROUP BY 1, 2),
        |b AS (
        |  SELECT event_type, day, x,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t,
        |    SUM(CAST(x AS HUGEINT)) OVER (PARTITION BY event_type
        |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      CURRENT ROW) AS ps,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n,
        |    SUM(CAST(x AS HUGEINT)) OVER (PARTITION BY event_type) AS s
        |  FROM daily),
        |c AS (
        |  SELECT event_type, day, n, t,
        |    CAST(ps AS DOUBLE) / CAST(t AS DOUBLE) AS ml,
        |    CAST(s - ps AS DOUBLE) /
        |      (CAST(n AS DOUBLE) - CAST(t AS DOUBLE)) AS mr,
        |    round(sqrt(CAST(t AS DOUBLE) *
        |        (CAST(n AS DOUBLE) - CAST(t AS DOUBLE)) /
        |        CAST(n AS DOUBLE)) *
        |      abs(CAST(ps AS DOUBLE) / CAST(t AS DOUBLE) -
        |        CAST(s - ps AS DOUBLE) /
        |        (CAST(n AS DOUBLE) - CAST(t AS DOUBLE))), 6) AS stat
        |  FROM b WHERE t < n),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |    ORDER BY stat DESC, t) AS rk
        |  FROM c)
        |SELECT event_type, CAST(n AS BIGINT) AS n, day AS split_after,
        |  stat, round(ml, 6) AS mean_before, round(mr, 6) AS mean_after
        |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,

    // identical to the batch q_seq_transitions oracle: the streaming
    // bridge state makes batch and stream emit the same pair multiset
    "q_stream_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS from_state,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS to_state
        |  FROM events WHERE event_type IS NOT NULL)
        |SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(count(*) AS DOUBLE) /
        |    CAST(sum(count(*)) OVER (PARTITION BY from_state) AS DOUBLE), 6)
        |    AS p
        |FROM seq WHERE to_state IS NOT NULL
        |GROUP BY from_state, to_state
        |ORDER BY from_state, to_state""".stripMargin,

    "q_stream_entropy" ->
      """WITH wm AS (SELECT CAST(max(ts) - INTERVAL 2 DAY AS DATE) AS last_day
        |            FROM events),
        |gt AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type AS t, count(*) AS c
        |  FROM events
        |  WHERE CAST(ts AS DATE) <= (SELECT last_day FROM wm)
        |  GROUP BY 1, 2),
        |gr AS (SELECT day, sum(c) AS n, count(*) AS v FROM gt GROUP BY 1),
        |terms AS (
        |  SELECT gt.day, gr.n, gr.v,
        |    CAST((CAST(gt.c AS DOUBLE) / CAST(gr.n AS DOUBLE)) *
        |      ln(CAST(gr.n AS DOUBLE) / CAST(gt.c AS DOUBLE))
        |      AS DECIMAL(38,18)) AS h
        |  FROM gt JOIN gr ON gr.day = gt.day)
        |SELECT day, CAST(max(n) AS BIGINT) AS n_events,
        |  CAST(max(v) AS BIGINT) AS n_types,
        |  round(CAST(sum(h) AS DOUBLE), 6) AS entropy,
        |  CASE WHEN max(v) > 1 THEN
        |    round(CAST(sum(h) AS DOUBLE) / ln(CAST(max(v) AS DOUBLE)), 6)
        |  END AS norm_entropy
        |FROM terms GROUP BY day ORDER BY day""".stripMargin,

    "q_stream_enrich" ->
      """SELECT e.event_id, e.event_type, n.n_name, e.value
        |FROM events e
        |JOIN nation n ON n.n_nationkey = e.user_id % 25
        |ORDER BY e.event_id""".stripMargin,

    // CAST(ts AS TIMESTAMP) truncates the nanos column to micros exactly
    // like the engine's `ts div 1000`
    "q_stream_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |  CAST(c.ts AS TIMESTAMP) AS click_ts,
        |  CAST(p.ts AS TIMESTAMP) AS purchase_ts
        |FROM events c JOIN events p
        |  ON p.user_id = c.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
        | AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL 60 MINUTE
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,

    // matched pairs emit on sight; a null-extended miss emits once the
    // closing watermark (max ts − 1 day) passes click_ts + window
    "q_stream_left_join" ->
      """WITH m AS (SELECT max(CAST(ts AS TIMESTAMP)) AS mx FROM events),
        |c AS (
        |  SELECT user_id, event_id AS click_id,
        |    CAST(ts AS TIMESTAMP) AS click_ts
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, event_id AS purchase_id,
        |    CAST(ts AS TIMESTAMP) AS purchase_ts
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT c.user_id, c.click_id, p.purchase_id, c.click_ts,
        |    p.purchase_ts
        |  FROM c JOIN p ON p.user_id = c.user_id
        |    AND p.purchase_ts >= c.click_ts
        |    AND p.purchase_ts <= c.click_ts + INTERVAL 60 MINUTE),
        |u AS (
        |  SELECT c.user_id, c.click_id, NULL::BIGINT AS purchase_id,
        |    c.click_ts, NULL::TIMESTAMP AS purchase_ts
        |  FROM c
        |  WHERE NOT EXISTS (SELECT 1 FROM j WHERE j.click_id = c.click_id)
        |    AND c.click_ts + INTERVAL 60 MINUTE <
        |        (SELECT mx - INTERVAL 1 DAY FROM m))
        |SELECT * FROM j UNION ALL SELECT * FROM u
        |ORDER BY user_id, click_id, purchase_id""".stripMargin,

    // gaps-and-islands sessionization; CAST(ts AS TIMESTAMP) truncates the
    // nanos column to micros exactly like the engine's `ts div 1000`. The
    // last (still-open) session of each user is NOT emitted by the stream,
    // so it is excluded here too.
    "q_stream_sessionize" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e),
        |sess AS (
        |  SELECT user_id, ts,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |                        ROWS UNBOUNDED PRECEDING) AS sess_no
        |  FROM marked),
        |agg AS (
        |  SELECT user_id, sess_no, MIN(ts) AS session_start,
        |         MAX(ts) AS session_end, COUNT(*) AS n_events
        |  FROM sess GROUP BY 1, 2)
        |SELECT user_id, session_start, session_end, n_events
        |FROM agg
        |WHERE sess_no < (SELECT MAX(a2.sess_no) FROM agg a2
        |                 WHERE a2.user_id = agg.user_id)
        |ORDER BY user_id, session_start""".stripMargin,

    // the streaming funnel's contract is batch-equivalence on bounded
    // input, so it shares the batch operator's oracle verbatim
    "q_stream_funnel" -> PipelinePack.oracles("q_funnel"),

    // the stream twin keeps min-id per fingerprint class; the fixture's
    // classes are exactly text-equality groups (equal texts render
    // identical WAVs, the gain/resample variants hash bit-identically
    // to their originals and carry strictly higher ids, unrelated
    // recordings sit at the ~32-bit background distance) — so SQL
    // states the kept set without recomputing the hash
    "q_stream_media_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id % 7 = 0 AND length(text) >= 32)
        |SELECT min(doc_id) AS doc_id FROM corpus GROUP BY text
        |ORDER BY doc_id""".stripMargin,

    // same kept-set statement as the batch exact oracle (the stub
    // body IS the text bytes, so checksum classes are text classes;
    // cross-header copies carry strictly higher ids)
    "q_stream_media_dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 500000, text FROM documents
        |  WHERE doc_id % 5 = 0 AND doc_id % 4 = 0)
        |SELECT min(doc_id) AS doc_id FROM corpus GROUP BY text
        |ORDER BY doc_id""".stripMargin,

    // same kept-set statement as the batch phash oracle: the mosaic
    // fixture's classes are text-equality groups plus EXACT-invariant
    // re-encodes carrying strictly higher ids
    "q_stream_media_dedup_phash" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id % 6 = 0 AND length(text) >= 60
        |    AND doc_id % 640 >= 7 AND doc_id % 480 >= 7)
        |SELECT min(doc_id) AS doc_id FROM corpus GROUP BY text
        |ORDER BY doc_id""".stripMargin,

    // per-day HLL with the q_stream_window append-mode cutoff (windows
    // whose end the closing watermark passed) — estimate constants are
    // the p=6 set (m=64, q+1=43, alpha=0.709), identical parenthesization
    // to the batch hll oracles
    "q_stream_histq" ->
      """WITH wm AS (SELECT CAST(max(ts) - INTERVAL 2 DAY AS DATE) AS last_day
        |            FROM events),
        |cells AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    length(bin(CAST(floor(value) AS BIGINT))) AS bkt,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |cum AS (
        |  SELECT day, bkt,
        |    SUM(c) OVER (PARTITION BY day ORDER BY bkt) AS cum,
        |    SUM(c) OVER (PARTITION BY day) AS n
        |  FROM cells),
        |specs(label, num, den) AS (VALUES ('p50', 1, 2), ('p95', 19, 20)),
        |hit AS (
        |  SELECT day, label, MIN(bkt) AS b
        |  FROM cum CROSS JOIN specs
        |  WHERE cum >= (n * num + den - 1) // den
        |  GROUP BY 1, 2)
        |SELECT h.day, h.label, CAST((1::BIGINT << b) - 1 AS BIGINT) AS est
        |FROM hit h, wm WHERE h.day <= wm.last_day
        |ORDER BY h.day, h.label""".stripMargin,

    "q_stream_hll_daily" ->
      """WITH wm AS (SELECT CAST(max(ts) - INTERVAL 2 DAY AS DATE) AS last_day
        |            FROM events),
        |h AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
        |     ::BIGINT) AS h48
        |  FROM events),
        |r AS (
        |  SELECT day, h48 % 64 AS bucket,
        |    CASE WHEN h48 // 64 = 0 THEN 43
        |         ELSE 43 - length(bin(h48 // 64)) END AS rank
        |  FROM h),
        |regs AS (SELECT day, bucket, max(rank) AS register
        |         FROM r GROUP BY 1, 2),
        |agg AS (
        |  SELECT day,
        |    sum(1::BIGINT << (43 - register))
        |      + (64 - count(*)) * (1::BIGINT << 43) AS s,
        |    64 - count(*) AS zeros
        |  FROM regs GROUP BY 1),
        |est AS (
        |  SELECT day, CAST(floor(CASE
        |    WHEN ((0.709::DOUBLE * 4096.0) * 8796093022208.0)
        |           / CAST(s AS DOUBLE) <= 160.0 AND zeros > 0
        |      THEN 64.0 * ln(64.0 / CAST(zeros AS DOUBLE))
        |    ELSE ((0.709::DOUBLE * 4096.0) * 8796093022208.0)
        |           / CAST(s AS DOUBLE) END) AS BIGINT) AS est
        |  FROM agg)
        |SELECT e.day, e.est FROM est e, wm
        |WHERE e.day <= wm.last_day ORDER BY e.day""".stripMargin
  )
}
