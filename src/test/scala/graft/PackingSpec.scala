package graft

import graft.ops.Packing
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Concat-and-chunk sequence packing: hand-computed offsets, bucketing
  * independence, and the empty-corpus edge. */
class PackingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("offsets and spans match the hand computation") {
    import spark.implicits._
    // contributions (n+1): 4, 1, 6, 3 -> exclusive offsets 0, 4, 5, 11
    val df = Seq((10L, 3L), (20L, 0L), (30L, 5L), (40L, 2L))
      .toDF("doc_id", "n_tokens")
    val got = Packing.packSequences(df, "doc_id", "n_tokens", seqLen = 4)
      .select("doc_id", "tok_start", "seq_first", "seq_last")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // doc 20 is empty: it spans the sequence holding its own offset
    assert(got.toSeq === Seq(
      (10L, 0L, 0L, 0L),
      (20L, 4L, 1L, 1L),
      (30L, 5L, 1L, 2L),
      (40L, 11L, 2L, 3L)))
  }

  test("result is independent of the bucket count, even with sparse ids") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // sparse, clustered ids: bucket sizes are uneven on purpose
    val rows = (0 until 500).map { i =>
      val id = i.toLong * (if (i % 7 == 0) 1000L else 3L) + 5L
      (id, rnd.nextInt(200).toLong)
    }.distinct
    val df = rows.toDF("doc_id", "n_tokens").repartition(8)
    def run(buckets: Int) =
      Packing.packSequences(df, "doc_id", "n_tokens", seqLen = 128,
          buckets = buckets)
        .select("doc_id", "tok_start", "seq_first", "seq_last")
        .orderBy("doc_id").collect().toSeq
    val one = run(1) // degenerates to the single global window
    assert(run(7) === one)
    assert(run(1000) === one)
    // cross-check the single-window reference directly
    val sorted = rows.sortBy(_._1)
    val starts = sorted.map(_._2 + 1L).scanLeft(0L)(_ + _)
    val expect = sorted.zip(starts).map { case ((id, n), st) =>
      (id, st, st / 128, (st + math.max(n - 1, 0L)) / 128)
    }
    assert(one.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))) === expect)
  }

  test("no window in the plan is partitionless (the global-window trap)") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, i % 9)).toDF("doc_id", "n_tokens")
    // AQE off: the static plan exposes the WindowExec for inspection
    // without having to execute-and-finalize the adaptive instance
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val windows =
      try Packing.packSequences(df, "doc_id", "n_tokens", seqLen = 64)
        .queryExecution.executedPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(windows.nonEmpty, "expected a WindowExec in the static plan")
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"running sum must never use a partitionless window:\n$w")
    }
  }

  test("assembled sequences reconstruct the EOS-separated stream exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"),        // tokens 0-2, sep at 3
      (2L, ""),             // empty: sep only, at 4
      (3L, "d e f g h"),    // tokens 5-9, sep at 10
      (4L, "i j"))          // tokens 11-12, sep at 13
      .toDF("doc_id", "text")
    val out = Packing.assembleSequences(docs, "doc_id", "text", seqLen = 4)
      .orderBy("seq_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val stream = "a b c </s> </s> d e f g h </s> i j </s>".split(" ")
    val expect = stream.grouped(4).zipWithIndex
      .map { case (g, i) => (i.toLong, g.length.toLong, g.mkString(" ")) }
      .toSeq
    assert(out.toSeq === expect)
    // every sequence except the tail is exactly seqLen tokens
    assert(out.dropRight(1).forall(_._2 == 4L))
  }

  test("separator width 0 packs back-to-back; empty corpus yields no rows") {
    import spark.implicits._
    val df = Seq((1L, 4L), (2L, 4L)).toDF("doc_id", "n_tokens")
    val got = Packing.packSequences(df, "doc_id", "n_tokens", seqLen = 4,
        sepTokens = 0)
      .orderBy("doc_id")
      .select("tok_start", "seq_first", "seq_last")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((0L, 0L, 0L), (4L, 1L, 1L)))

    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n_tokens")
    assert(Packing.packSequences(empty, "doc_id", "n_tokens", seqLen = 4)
      .count() === 0L)
  }
}
