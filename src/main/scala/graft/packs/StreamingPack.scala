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
        |ORDER BY event_id""".stripMargin
  )
}
