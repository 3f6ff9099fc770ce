package graft.adapter

import graft.jinja.Json
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Record & replay of warehouse interactions (reference:
  * crates/dbt-adapter/src/record_and_replay.rs + the test harness in
  * crates/dbt-test-utils/src/task/record_and_replay.rs). The reference
  * taps its ADBC layer to persist every query a run issues and replays
  * the recording in tests, making warehouse regressions diffable without
  * a live connection. Spark-native framing: the adapter IS the warehouse
  * boundary, so the tap lives in [[SparkAdapter]] — every interaction
  * (executed SQL statement, table write, rename, drop, view create, …)
  * streams through here as one normalized JSONL line.
  *
  * Modes, per session:
  *   spark.graft.interactionLog.mode = off | record | verify
  *   spark.graft.interactionLog.path = <file.jsonl>
  *
  * `record` appends `{"seq":n,"op":…,"detail":…,"result":…}` per
  * interaction; `detail` runs through [[QueryCache.normalize]] so the
  * volatile name classes the reference also scrubs
  * (record_and_replay.rs:47-58 — `dbt_tmp_<uuid>` names, generated
  * schema stamps) don't poison the diff. `verify` replays a recorded run
  * against a live one as a MULTISET comparison: every live interaction
  * must appear in the recording (op + detail + read-result checksum) and
  * vice versa, but global order is free — a parallel scheduler
  * (`--threads N`) interleaves independent nodes nondeterministically,
  * and the reference harness likewise matches per node rather than by
  * global sequence (record_and_replay.rs compute_file_name: node id +
  * per-node counter). Divergences accumulate as [[Mismatch]]es instead
  * of throwing, so a regression test gets the whole diff: unmatched live
  * interactions surface as they happen, unconsumed recorded ones via
  * [[report]].
  *
  * Scale note: this is test infra on the DDL/DML control path — one
  * file append per warehouse interaction (thousands per run, not
  * per-row). Nothing here touches the data plane.
  */
object InteractionLog {

  final val ModeKey = "spark.graft.interactionLog.mode"
  final val PathKey = "spark.graft.interactionLog.path"

  /** One divergence between the recording and the live run. `expected`
    * is empty for a live interaction the recording never contained;
    * `actual` is empty for a recorded interaction the live run never
    * issued. `seq` is the live sequence number at detection (or the
    * recording's remaining count for unconsumed entries). */
  final case class Mismatch(seq: Int, expected: String, actual: String)

  private final class State(val mode: String, val path: Path) {
    var seq: Int = 0
    val mismatches = scala.collection.mutable.ArrayBuffer.empty[Mismatch]
    // golden entries as a multiset of comparable "op|detail|result"
    // strings; each live interaction consumes one occurrence
    val golden = scala.collection.mutable.Map.empty[String, Int]
    if (mode == "verify" && Files.exists(path))
      Files.readAllLines(path).asScala.filter(_.nonEmpty).foreach { l =>
        val m = Json.parse(l).asInstanceOf[Map[String, Any]]
        val key = comparable(m.getOrElse("op", "").toString,
          m.getOrElse("detail", "").toString,
          m.get("result").filter(_ != null).map(_.toString))
        golden(key) = golden.getOrElse(key, 0) + 1
      }
  }

  private def comparable(op: String, detail: String,
      result: Option[String]): String =
    s"$op|$detail|${result.getOrElse("")}"

  // per-session state; weak keys so a retired session isn't pinned
  private val states =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, State]())

  private def stateOf(spark: SparkSession): Option[State] = {
    val mode = spark.conf.getOption(ModeKey).getOrElse("off")
    if (mode == "off") { states.remove(spark); return None }
    val path = Paths.get(spark.conf.getOption(PathKey).getOrElse(
      throw new IllegalArgumentException(
        s"$PathKey must be set when $ModeKey != off")))
    // check-then-create must be atomic: two pool threads logging their
    // first interaction concurrently would otherwise BOTH build a State,
    // and in record mode the loser's constructor deletes the file the
    // winner already appended to
    states.synchronized {
      val cur = states.get(spark)
      if (cur != null && cur.mode == mode && cur.path == path) Some(cur)
      else {
        val s = new State(mode, path)
        if (mode == "record") {
          Files.createDirectories(
            Option(path.toAbsolutePath.getParent).getOrElse(Paths.get(".")))
          Files.deleteIfExists(path)
        }
        states.put(spark, s)
        Some(s)
      }
    }
  }

  /** Record or verify one warehouse interaction. `detail` is normalized
    * (comments, whitespace, volatile temp/backup names); `result` is a
    * read-query checksum when the op fetched rows. No-op when the mode
    * is off. */
  def log(spark: SparkSession, op: String, detail: String,
      result: Option[String] = None): Unit =
    stateOf(spark).foreach { s =>
      val line = comparable(op, QueryCache.normalize(detail), result)
      s.synchronized {
        if (s.mode == "record") {
          Files.writeString(s.path, Json.write(Map(
            "seq" -> s.seq, "op" -> op,
            "detail" -> QueryCache.normalize(detail),
            "result" -> result.orNull)) + "\n",
            StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        } else {
          s.golden.get(line) match {
            case Some(n) if n > 1 => s.golden(line) = n - 1
            case Some(_) => s.golden.remove(line)
            case None => s.mismatches += Mismatch(s.seq, "", line)
          }
        }
        s.seq += 1
      }
    }

  /** Checksum of a fetched result table: column names + every cell,
    * row order preserved (the adapter's reads are deterministic). */
  def tableHash(t: AgateTable): String =
    Json.md5((t.columnNames +: t.rows.map(_.map(String.valueOf(_))))
      .map(_.mkString("")).mkString("\n"))

  /** Verify-mode outcome: live interactions the recording never
    * contained, plus recorded interactions the live run never issued
    * (one entry per remaining occurrence count). Empty ⇒ the live run
    * replayed the recording's interaction multiset exactly. */
  def report(spark: SparkSession): Seq[Mismatch] = {
    // resolve through stateOf, NOT the raw map: a verify run that issued
    // ZERO interactions has no lazily-created state yet, and reporting
    // "no mismatches" for it would pass a recording nothing consumed —
    // stateOf materializes the golden multiset so every recorded
    // interaction surfaces as unconsumed
    val s = try stateOf(spark).orNull catch { case _: Exception => null }
    if (s == null) Nil
    else s.synchronized {
      val unconsumed =
        if (s.mode == "verify")
          s.golden.toSeq.sortBy(_._1).map { case (k, n) => Mismatch(n, k, "") }
        else Nil
      s.mismatches.toSeq ++ unconsumed
    }
  }

  /** Drop the session's in-memory state (tests switching modes). */
  def reset(spark: SparkSession): Unit = states.remove(spark)
}
