package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Guards the PlanCheck dev tool's codegen-span counter: under AQE the
  * executed plan's toString hides the `*(n)` markers, so the old
  * regex-based counter reported 0 spans on plans that really have them.
  * The structural walk must see through the adaptive root. */
class PlanCheckSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** The three scale-critical properties of the persisted-index
    * machinery asserted in ONE place over a REAL incremental batch run
    * (the per-operator DedupSpec asserts cover each core in isolation;
    * this composed gate fails if any future step re-derives heavy
    * columns or drops the pruning):
    *   (a) every persisted banded/postings twin is scanned behind a
    *       LeftSemi prune to the batch's own buckets,
    *   (b) no twin scan's ReadSchema touches the heavy sig/shh/chunk
    *       columns — history is banded from narrow rows only,
    *   (c) the IVF cell join carries dynamic partition pruning, so a
    *       search touches only the probed cells' files. */
  test("composed scale gate: multi-index batch twins scanned narrow " +
      "behind LeftSemi; IVF cell join dynamically prunes") {
    import spark.implicits._
    import graft.adapter.SparkAdapter
    import graft.core.{Node, NodeConfig, NodeKind, Relation}
    import graft.mat.{MatContext, PipelineMat}
    import graft.ops.Similarity
    import org.apache.spark.sql.functions.col

    val loc = java.nio.file.Files.createTempDirectory("graft_plangate")
      .toString
    spark.sql("DROP DATABASE IF EXISTS g_plangate CASCADE")
    val a = new SparkAdapter(spark, "g_plangate", Some(loc))
    val rel = Relation("g_plangate", "gated")
    def runPipeline(df: org.apache.spark.sql.DataFrame): Unit =
      PipelineMat.run(MatContext(a,
        Node(uniqueId = "model.spec.gated", name = "gated",
          packageName = "spec", kind = NodeKind.Model,
          config = NodeConfig(materialized = "pipeline", extra = Map(
            "incremental" -> "true",
            "steps" -> Vector(
              Map("op" -> "minhash_dedup", "text_col" -> "text",
                "id_col" -> "doc_id"),
              Map("op" -> "simhash_dedup", "text_col" -> "text",
                "id_col" -> "doc_id"),
              Map("op" -> "ngram_dedup", "text_col" -> "text",
                "id_col" -> "doc_id"))))),
        rel, () => df, fullRefresh = false))

    val texts = (0 until 8).map(g =>
      s"group $g shares this exact long duplicated sentence body number " +
        s"$g with several siblings across the split boundary")
    val docs = (0L until 24L).map(i => (i, texts((i % 8).toInt)))
      .toDF("doc_id", "text")
    runPipeline(docs.filter(col("doc_id") < 16)) // full build: indexes persist

    // collect every plan the BATCH run executes (listener delivery is
    // async — poll with a deadline below)
    val plans = new scala.collection.mutable.ArrayBuffer[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.synchronized {
        plans += qe.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try runPipeline(docs.filter(col("doc_id") >= 16)) // incremental batch
    finally {
      val twins = Seq(
        ("gated__state_minhash_dedup_bands", Seq("band", "bandhash"),
          Seq("sig", "shh")),
        ("gated__state_simhash_dedup_bands", Seq("band", "bv"),
          Seq("c0", "c1")),
        ("gated__state_ngram_dedup_grams", Seq("s"), Seq("shh")))
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def snapshot() = plans.synchronized { plans.toVector }
      while (twins.exists(t => !snapshot().exists(_.contains(t._1))) &&
          System.nanoTime() < deadline) Thread.sleep(100)
      spark.listenerManager.unregister(listener)
      val all = snapshot()
      // attribute each scan's ReadSchema to its table (formatted mode
      // prints "(N) Scan parquet db.tbl" then the node's ReadSchema)
      def scanSchemas(p: String): Seq[(String, String)] = {
        var last = ""
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        p.linesIterator.foreach { l =>
          val t = l.trim
          if (t.contains("Scan parquet "))
            last = t.substring(t.indexOf("Scan parquet ") + 13).trim
          else if (t.startsWith("ReadSchema")) out += ((last, t))
        }
        out.toSeq
      }
      twins.foreach { case (twin, narrow, heavy) =>
        val hits = all.filter(_.contains(twin))
        assert(hits.nonEmpty, s"no batch plan scans $twin")
        assert(hits.exists(_.contains("LeftSemi")),
          s"$twin not pre-pruned by a left-semi on the batch's keys")
        val schemas = hits.flatMap(scanSchemas)
          .filter(_._1.contains(twin)).map(_._2)
        assert(schemas.nonEmpty, s"no ReadSchema attributed to $twin")
        schemas.foreach { sch =>
          narrow.foreach(c => assert(sch.contains(s"$c:"),
            s"$twin scan missing narrow column $c: $sch"))
          heavy.foreach(c => assert(!sch.contains(s"$c:"),
            s"$twin scan reads heavy column $c: $sch"))
        }
      }
    }

    // (c) the IVF cell join: routed corpus partitioned by cell, search
    // under frozen centroids touches only probed cells
    val vecDim = 8
    def vec(i: Int): Array[Float] =
      Array.tabulate(vecDim)(d => ((i * 31 + d * 7) % 97).toFloat / 97f)
    val emb = (0 until 120).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      k = 8, iters = 2)
    val vdir = java.nio.file.Files.createTempDirectory("graft_plangate_v")
      .toString
    emb.withColumn("cluster_id", graft.expressions.PipelineExpressions
        .nearest_centroids(col("embedding"), cents, 1)(0))
      .write.partitionBy("cluster_id").parquet(s"$vdir/routed")
    val routed = spark.read.parquet(s"$vdir/routed")
    val got = Similarity.ivfTopKIndexed(
      routed.filter(col("vec_id") % 20 === 0), routed, cents,
      "vec_id", "embedding", "cluster_id", k = 5, nprobe = 2)
    assert(got.collect().nonEmpty)
    val ivfPlan = got.queryExecution.executedPlan.toString
    assert(ivfPlan.contains("dynamicpruning"),
      s"IVF cell join lost dynamic partition pruning:\n${ivfPlan.take(2000)}")
  }

  test("microbatch-pipeline window gate: the unique-key guard scans the " +
      "target slice NARROW and the idempotence probe reads the index's " +
      "id column alone") {
    import spark.implicits._
    import graft.adapter.SparkAdapter
    import graft.core.{BatchSize, Node, NodeConfig, NodeKind, Relation}
    import graft.mat.{MatContext, PipelineMat}
    import org.apache.spark.sql.functions.col

    val loc = java.nio.file.Files.createTempDirectory("graft_planmb").toString
    spark.sql("DROP DATABASE IF EXISTS g_planmb CASCADE")
    val a = new SparkAdapter(spark, "g_planmb", Some(loc))
    val rel = Relation("g_planmb", "windowed")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val cfg = NodeConfig(materialized = "pipeline",
      uniqueKey = Seq("doc_id"), eventTime = Some("ts"),
      batchSize = Some(BatchSize.Day), begin = Some("2025-01-01 00:00:00"),
      extra = Map("incremental" -> "true",
        "steps" -> Vector(Map("op" -> "minhash_dedup",
          "text_col" -> "text", "id_col" -> "doc_id"))))
    def runMb(df: org.apache.spark.sql.DataFrame,
        now: java.sql.Timestamp): Unit =
      PipelineMat.run(MatContext(a, Node(uniqueId = "model.spec.windowed",
        name = "windowed", packageName = "spec", kind = NodeKind.Model,
        config = cfg), rel, () => df, now = now))

    val texts = (0 until 6).map(g =>
      s"window gate group $g repeats this long sentence body $g across " +
        "the day boundary for banding")
    def docs(ids: Range, day: Int) = ids.map(i =>
      (i.toLong, texts(i % 6), ts(f"2025-01-0${day}%d 0${i % 8}%d:00:00")))
      .toDF("doc_id", "text", "ts")
    runMb(docs(0 until 12, 1), ts("2025-01-02 00:00:00")) // full build

    val plans = new scala.collection.mutable.ArrayBuffer[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.synchronized {
        plans += qe.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    // a windowed run: lookback reopens day 1, day 2 is new
    try runMb(docs(0 until 20, 1).filter(col("doc_id") < 12)
        .unionByName(docs(12 until 20, 2)), ts("2025-01-03 00:00:00"))
    finally {
      def snapshot() = plans.synchronized { plans.toVector }
      def scanSchemas(p: String): Seq[(String, String)] = {
        var last = ""
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        p.linesIterator.foreach { l =>
          val t = l.trim
          if (t.contains("Scan parquet "))
            last = t.substring(t.indexOf("Scan parquet ") + 13).trim
          else if (t.startsWith("ReadSchema")) out += ((last, t))
        }
        out.toSeq
      }
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def targetScans() = snapshot().flatMap(scanSchemas)
        .filter(_._1.endsWith("g_planmb.windowed")).map(_._2)
      def sigScans() = snapshot().flatMap(scanSchemas)
        .filter(_._1.contains("__state_minhash_dedup"))
        .filterNot(_._1.contains("_bands")).map(_._2)
      while ((targetScans().isEmpty || sigScans().isEmpty) &&
          System.nanoTime() < deadline) Thread.sleep(100)
      spark.listenerManager.unregister(listener)
      // (a) unique-key guard: every scan of the TARGET during the
      // windowed run reads key + event-time only, never the data
      // columns — the guard must not widen the target read
      val tgt = targetScans()
      assert(tgt.nonEmpty, "no batch plan scanned the target")
      tgt.foreach { sch =>
        assert(!sch.contains("text:"),
          s"target slice scan reads the data column: $sch")
      }
      // the guard's window predicate must reach the parquet scan: each
      // append writes one window's rows, so files are event-time-
      // aligned and the pushed ts filter skips non-window files by
      // row-group stats — the slice read stays batch-sized even on an
      // unpartitioned target
      val tgtPlans = snapshot().filter(_.contains("g_planmb.windowed"))
      assert(tgtPlans.exists(p => p.linesIterator.exists(l =>
        l.contains("PushedFilters") && l.contains("ts"))),
        "no plan pushes the window's ts predicate into the target scan")
      // (b) idempotence probe: at least one signature-index scan is
      // id-ONLY (unseenById / settled-component probes) — the heavy
      // sig/shh arrays stay out of the probe path
      val sig = sigScans()
      assert(sig.nonEmpty, "no batch plan scanned the signature index")
      assert(sig.exists(s => s.contains("id:") && !s.contains("shh") &&
        !s.contains("sig:")),
        s"no id-only probe scan of the signature index:\n${sig.mkString("\n")}")
    }
  }

  test("DATE event-time on a dt-partitioned target: the window guard's " +
      "slice predicate stays a PARTITION filter (no cast)") {
    // THE deployment shape for a microbatch pipeline at scale: a DATE
    // event-time column with the target partitioned by it. The guard's
    // boundary literals must be DATE (etBound) — a TIMESTAMP literal
    // casts the partition column and the predicate falls out of
    // PartitionFilters, silently scanning the whole target every
    // window (the windowed growth rehearsal measured exactly that).
    import spark.implicits._
    import graft.adapter.SparkAdapter
    import graft.core.{BatchSize, Node, NodeConfig, NodeKind, Relation}
    import graft.mat.{MatContext, PipelineMat}

    val loc = java.nio.file.Files.createTempDirectory("graft_plandt").toString
    spark.sql("DROP DATABASE IF EXISTS g_plandt CASCADE")
    val a = new SparkAdapter(spark, "g_plandt", Some(loc))
    val rel = Relation("g_plandt", "windowed_dt")
    def d(s: String) = java.sql.Date.valueOf(s)
    val cfg = NodeConfig(materialized = "pipeline",
      uniqueKey = Seq("doc_id"), eventTime = Some("dt"),
      batchSize = Some(BatchSize.Day), begin = Some("2025-01-01 00:00:00"),
      partitionBy = Seq("dt"),
      extra = Map("incremental" -> "true",
        "steps" -> Vector(Map("op" -> "exact_dedup", "id_col" -> "doc_id"))))
    def run(df: org.apache.spark.sql.DataFrame, now: String): Unit =
      PipelineMat.run(MatContext(a, Node(uniqueId = "model.spec.wdt",
        name = "windowed_dt", packageName = "spec", kind = NodeKind.Model,
        config = cfg), rel, () => df,
        now = java.sql.Timestamp.valueOf(now)))
    val day1 = (0L until 8L).map(i => (i, s"text $i", d("2025-01-01")))
      .toDF("doc_id", "text", "dt")
    run(day1, "2025-01-02 00:00:00") // full build
    val plans = new scala.collection.mutable.ArrayBuffer[String]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.synchronized {
        plans += qe.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try run(day1.unionByName(
        (10L until 16L).map(i => (i, s"text $i", d("2025-01-02")))
          .toDF("doc_id", "text", "dt")), "2025-01-03 00:00:00")
    finally {
      def snapshot() = plans.synchronized { plans.toVector }
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      def pruned() = snapshot().exists { p =>
        p.contains("g_plandt.windowed_dt") && p.linesIterator.exists(l =>
          l.contains("PartitionFilters") && l.contains("dt") &&
            l.contains(">="))
      }
      while (!pruned() && System.nanoTime() < deadline) Thread.sleep(100)
      spark.listenerManager.unregister(listener)
      assert(pruned(),
        "no target scan carries the window bounds as PARTITION filters " +
          "— the DATE guard predicate degraded to a cast:\n" +
          snapshot().filter(_.contains("windowed_dt")).take(2).mkString("\n"))
      // and the run itself must stay correct: settled day-1 rows kept
      // once, day-2 rows landed
      val got = a.read(rel).select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(got == ((0L until 8L) ++ (10L until 16L)).toSet)
    }
  }

  test("codegenSpans sees through the AQE root instead of reporting 0") {
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val df = (1 to 1000).toDF("n")
      .groupBy(($"n" % 7).as("k")).count()
    val plan = df.queryExecution.executedPlan
    assert(plan.isInstanceOf[AdaptiveSparkPlanExec], plan.getClass.getName)
    // the old tool executed a DIFFERENT QueryExecution (df.write spawns a
    // fresh one), so this instance stayed un-finalized and reported 0
    val beforeRun = raw"\*\(\d+\)".r
      .findAllMatchIn(plan.toString).map(_.group(0)).toSet.size
    assert(beforeRun == 0)
    PlanCheck.runPlan(plan)
    assert(PlanCheck.codegenSpans(plan) >= 2)
  }
}
