package graft

import graft.adapter.SparkAdapter
import graft.core._
import graft.mat.{IncrementalMat, MatContext}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Partition-pruned merge/delete+insert: on a partitioned target only the
  * partitions holding incoming rows or matched keys are rewritten; the
  * untouched remainder keeps its exact files (no read, no rewrite) — the
  * property that makes keyed incrementals viable at 100 TB. */
class IncrementalPruneSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def freshAdapter(name: String): SparkAdapter = {
    val loc = Files.createTempDirectory(s"graft_$name").toString
    val schema = s"g_$name"
    spark.sql(s"DROP DATABASE IF EXISTS `$schema` CASCADE")
    new SparkAdapter(spark, schema, Some(loc))
  }

  private def node(name: String, cfg: NodeConfig): Node =
    Node(uniqueId = s"model.spec.$name", name = name, packageName = "spec",
      kind = NodeKind.Model, config = cfg)

  private val T0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  private def run(a: SparkAdapter, rel: Relation, cfg: NodeConfig,
      df: org.apache.spark.sql.DataFrame): Unit =
    IncrementalMat.run(MatContext(a, node(rel.identifier, cfg), rel,
      () => df, fullRefresh = false, T0))

  private def filesOfPartition(a: SparkAdapter, rel: Relation, y: Int): Set[String] = {
    import spark.implicits._
    a.read(rel).filter(col("y") === y)
      .select(input_file_name()).as[String].distinct().collect().toSet
  }

  test("merge rewrites only touched partitions") {
    import spark.implicits._
    val a = freshAdapter("prune_merge")
    val rel = Relation(a.defaultSchema, "t_prune")
    val cfg = NodeConfig(materialized = "incremental",
      incrementalStrategy = Some(IncrementalStrategy.Merge),
      uniqueKey = Seq("id"), partitionBy = Seq("y"))
    val base = Seq((1L, "a", 2000), (2L, "b", 2001), (3L, "c", 2002))
      .toDF("id", "v", "y")
    run(a, rel, cfg, base)

    val before2000 = filesOfPartition(a, rel, 2000)
    assert(before2000.nonEmpty)

    // delta: update id=2 (partition 2001), insert id=4 into 2003
    val delta = Seq((2L, "b2", 2001), (4L, "d", 2003)).toDF("id", "v", "y")
    run(a, rel, cfg, delta)

    val got = a.read(rel).orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, "a", 2000), (2L, "b2", 2001), (3L, "c", 2002), (4L, "d", 2003)))
    // untouched partition kept its exact files — proof it was not rewritten
    assert(filesOfPartition(a, rel, 2000) == before2000)
  }

  test("hash_buckets merge rewrites only buckets holding incoming keys") {
    import spark.implicits._
    val a = freshAdapter("prune_bucket")
    val rel = Relation(a.defaultSchema, "t_bucket")
    // UNPARTITIONED keyed merge + hash_buckets: the materialization derives
    // a _graft_bucket partition column from the key, so the existing
    // touched-partition pruning bounds the rewrite
    val cfg = NodeConfig(materialized = "incremental",
      incrementalStrategy = Some(IncrementalStrategy.Merge),
      uniqueKey = Seq("id"), extra = Map("hash_buckets" -> 8L))
    val base = (0L until 64L).map(i => (i, s"v$i")).toDF("id", "v")
    run(a, rel, cfg, base)
    // 8 bucket partitions exist
    val buckets = a.read(rel).select(col(IncrementalMat.BucketCol))
      .distinct().as[Long].collect().toSet
    assert(buckets.size == 8, buckets)

    def filesOfBucket(b: Long): Set[String] =
      a.read(rel).filter(col(IncrementalMat.BucketCol) === b)
        .select(input_file_name()).as[String].distinct().collect().toSet
    val delta = Seq((7L, "v7-upd"), (200L, "new")).toDF("id", "v")
    val touchedBuckets = delta
      .withColumn("b", expr("pmod(xxhash64(id), 8)"))
      .select("b").as[Long].collect().toSet
    val untouched = (buckets -- touchedBuckets).head
    val beforeFiles = filesOfBucket(untouched)

    run(a, rel, cfg, delta)
    // correctness: update landed, insert landed, rest intact
    val got = a.read(rel).select("id", "v").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got.length == 65)
    assert(got.contains((7L, "v7-upd")) && got.contains((200L, "new")))
    assert(got.contains((8L, "v8")))
    // the untouched bucket kept its exact files — bounded rewrite proof
    assert(filesOfBucket(untouched) == beforeFiles)
  }

  test("hash_buckets is inert for insert_overwrite (no silent bucket overwrite)") {
    import spark.implicits._
    val a = freshAdapter("bucket_io")
    val rel = Relation(a.defaultSchema, "t_bucket_io")
    val cfg = NodeConfig(materialized = "incremental",
      incrementalStrategy = Some(IncrementalStrategy.InsertOverwrite),
      uniqueKey = Seq("id"), extra = Map("hash_buckets" -> 8L))
    run(a, rel, cfg, (0L until 20L).map(i => (i, s"v$i")).toDF("id", "v"))
    // insert_overwrite must NOT adopt the bucket layout: unpartitioned
    // target → each run is a full atomic replace, never a per-bucket
    // dynamic overwrite that would drop other keys in touched buckets
    assert(!a.read(rel).columns.contains(IncrementalMat.BucketCol))
    run(a, rel, cfg, Seq((1L, "v1b"), (100L, "new")).toDF("id", "v"))
    val got = a.read(rel).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "v1b"), (100L, "new"))) // full replace semantics
  }

  test("compact rewrites many small files into few, preserving rows") {
    import spark.implicits._
    val a = freshAdapter("compact")
    val rel = Relation(a.defaultSchema, "t_compact")
    val cfg = NodeConfig(materialized = "incremental",
      incrementalStrategy = Some(IncrementalStrategy.Append))
    // 6 append runs → at least 6 files
    (0 until 6).foreach { i =>
      run(a, rel, cfg, Seq((i.toLong, s"v$i")).toDF("id", "v"))
    }
    val rows = a.read(rel).orderBy("id").collect().map(_.getLong(0)).toSeq
    val (before, after) = a.compact(rel)
    assert(before >= 6L)
    assert(after == 1L)
    assert(a.read(rel).orderBy("id").collect().map(_.getLong(0)).toSeq == rows)
  }

  test("compact preserves a SORTED layout at the compacted file count " +
      "and keeps a BUCKETED table at one file per bucket") {
    import spark.implicits._
    val a = freshAdapter("compact_layout")
    // sorted: the sortBy pass must not fall into writeTableAtomic's
    // range-shuffle (spark.sql.shuffle.partitions files = un-compacted)
    val relS = Relation(a.defaultSchema, "t_sorted")
    val cfgS = NodeConfig(materialized = "incremental",
      incrementalStrategy = Some(IncrementalStrategy.Append))
    (0 until 5).foreach { i =>
      run(a, relS, cfgS,
        Seq((i.toLong, s"v$i"), (i + 100L, s"w$i")).toDF("id", "v"))
    }
    val rowsS = a.read(relS).orderBy("id").collect().map(_.getLong(0)).toSeq
    val (bS, aS) = a.compact(relS, targetFiles = 2, sortBy = Seq("id"))
    assert(bS >= 5L)
    assert(aS <= 2L, s"sorted compaction must land at targetFiles: $aS")
    assert(a.read(relS).orderBy("id").collect().map(_.getLong(0)).toSeq
      == rowsS)
    // bucketed: one file per bucket, never targetFiles × buckets
    val relB = Relation(a.defaultSchema, "t_bucketed")
    a.writeTableAtomic(
      (0 until 64).map(i => (i.toLong, s"v$i")).toDF("id", "v"), relB,
      clusteredBy = Seq("id"), buckets = 4)
    a.appendToTable(Seq((1000L, "x")).toDF("id", "v"), relB)
    val rowsB = a.read(relB).count()
    val (_, aB) = a.compact(relB, targetFiles = 8)
    assert(aB <= 4L, s"bucketed compaction must land at <= numBuckets: $aB")
    assert(a.read(relB).count() == rowsB)
    // the bucket spec survives the rewrite (catalog-derived, not lost)
    assert(spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(
        relB.identifier, Some(relB.schema))).bucketSpec.exists(
      _.numBuckets == 4))
    // a partition_by contradicting the catalog refuses by name
    val e = intercept[IllegalArgumentException](
      a.compact(relS, partitionBy = Seq("v")))
    assert(e.getMessage.contains("preserves layout"), e.getMessage)
  }

  test("compact preserves the STORAGE FORMAT: an ORC table rewrites as " +
      "ORC files, and an unsupported provider refuses by name") {
    import spark.implicits._
    val a = freshAdapter("compact_fmt")
    val rel = Relation(a.defaultSchema, "t_orc")
    a.writeTableAtomic(
      (0 until 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      rel, fileFormat = "orc")
    (0 until 3).foreach(i =>
      a.appendToTable(Seq((100L + i, "x")).toDF("id", "v"), rel))
    val rows = a.read(rel).count()
    val (b, c) = a.compact(rel)
    assert(c < b, s"compaction must reduce files: $b -> $c")
    assert(a.read(rel).count() == rows)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(
        rel.identifier, Some(rel.schema)))
    assert(meta.provider.exists(_.equalsIgnoreCase("orc")),
      s"provider must survive the rewrite: ${meta.provider}")
    assert(a.read(rel).inputFiles.forall(_.endsWith(".orc")),
      "data files must be ORC, not the parquet default")
    // format OPTIONS are layout too: a ;-separated headered CSV must
    // stay readable under its declared contract — a rewrite that
    // dropped the options would emit comma-separated headerless files
    // and the catalog read (and every external reader naming the
    // contract) would misparse every row
    spark.sql(
      s"CREATE TABLE ${a.defaultSchema}.t_csv (id BIGINT, v STRING) " +
        "USING csv OPTIONS (header 'true', sep ';')")
    (1 to 4).foreach(i => spark.sql(
      s"INSERT INTO ${a.defaultSchema}.t_csv VALUES ($i, 'v;$i')"))
    val relC = Relation(a.defaultSchema, "t_csv")
    val rowsC = a.read(relC).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val (bc, cc) = a.compact(relC)
    assert(cc < bc, s"csv compaction must reduce files: $bc -> $cc")
    assert(a.read(relC).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == rowsC,
      "csv header/sep options must survive the rewrite")
    val metaC = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(
        relC.identifier, Some(relC.schema)))
    assert(metaC.storage.properties.get("sep").contains(";"),
      s"options must reach the new catalog entry: ${metaC.storage.properties}")
    // a provider outside the engine's write set refuses before any work
    spark.sql(s"CREATE TABLE ${a.defaultSchema}.t_text (v STRING) USING text")
    spark.sql(s"INSERT INTO ${a.defaultSchema}.t_text VALUES ('a'), ('b')")
    val e = intercept[IllegalArgumentException](
      a.compact(Relation(a.defaultSchema, "t_text")))
    assert(e.getMessage.contains("provider 'text'"), e.getMessage)
  }

  test("compact of a PARTITIONED + ZORDERED table groups the curve by " +
      "partition value — never tasks × values files") {
    import spark.implicits._
    val a = freshAdapter("compact_zp")
    val rel = Relation(a.defaultSchema, "t_zp")
    val mk = (lo: Int, hi: Int) => (lo until hi)
      .map(i => (i.toLong, i % 4, i.toLong, (399 - i).toLong))
      .toDF("id", "p", "x", "y")
    a.writeTableAtomic(mk(0, 200), rel, partitionBy = Seq("p"))
    (0 until 4).foreach(k =>
      a.appendToTable(mk(200 + k * 50, 250 + k * 50), rel))
    val rows = a.read(rel).count()
    val (before, after) = a.compact(rel, targetFiles = 2,
      zorderBy = Seq("x", "y"))
    assert(before >= 16L, s"appends must have fragmented the table: $before")
    // totalFiles = targetFiles × 4 partition values = 8 range tasks on
    // (p, curve key); only a range-boundary task can straddle two
    // partition values, so files ≤ tasks + values − 1 = 11. A curve
    // shuffle that ignored p would scatter every value into every task
    // → up to 8 × 4 = 32 files, MORE than before compaction.
    assert(after <= 11L, s"partitioned zorder compaction fanned out: $after")
    assert(a.read(rel).count() == rows)
    // curve clustering survives per partition value: within one value,
    // the per-file x ranges must not all span the full domain — at
    // least one pair of files is disjoint in x
    import org.apache.spark.sql.functions.{col => c, input_file_name,
      min => fmin, max => fmax}
    val spans = a.read(rel).filter(c("p") === 0)
      .groupBy(input_file_name()).agg(fmin("x").as("lo"), fmax("x").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(spans.length >= 2 && spans.exists(s1 => spans.exists(s2 =>
      s1._2 < s2._1 || s2._2 < s1._1)),
      s"curve layout lost inside a partition: ${spans.mkString(", ")}")
  }

  test("merge drops a touched partition whose rows all moved away") {
    import spark.implicits._
    val a = freshAdapter("prune_empty")
    val rel = Relation(a.defaultSchema, "t_empty")
    val cfg = NodeConfig(materialized = "incremental",
      incrementalStrategy = Some(IncrementalStrategy.Merge),
      uniqueKey = Seq("id"), partitionBy = Seq("y"))
    run(a, rel, cfg, Seq((1L, "a", 2000), (2L, "b", 2001)).toDF("id", "v", "y"))
    // id=1 moves from partition 2000 to 2002 — 2000 is emptied and must be
    // dropped, or its stale row would survive the dynamic overwrite
    run(a, rel, cfg, Seq((1L, "a2", 2002)).toDF("id", "v", "y"))
    val got = a.read(rel).orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, "a2", 2002), (2L, "b", 2001)))
  }

  test("replace_where swaps only the predicate slice, prunes partitions") {
    import spark.implicits._
    val a = freshAdapter("prune_replw")
    val rel = Relation(a.defaultSchema, "t_replw")
    val cfg = NodeConfig(materialized = "incremental",
      incrementalStrategy = Some(IncrementalStrategy.ReplaceWhere),
      partitionBy = Seq("y"),
      incrementalPredicates = Seq("y = 2001 AND v = 'b'"))
    val base = Seq((1L, "a", 2000), (2L, "b", 2001), (3L, "c", 2001))
      .toDF("id", "v", "y")
    run(a, rel, cfg, base)
    val before2000 = filesOfPartition(a, rel, 2000)

    // replaces only (2001,'b'); (2001,'c') survives the partition rewrite
    run(a, rel, cfg, Seq((9L, "b", 2001)).toDF("id", "v", "y"))
    val got = a.read(rel).orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, "a", 2000), (3L, "c", 2001), (9L, "b", 2001)))
    assert(filesOfPartition(a, rel, 2000) == before2000)
  }

  test("delete+insert prunes to touched partitions") {
    import spark.implicits._
    val a = freshAdapter("prune_delins")
    val rel = Relation(a.defaultSchema, "t_delins")
    val cfg = NodeConfig(materialized = "incremental",
      incrementalStrategy = Some(IncrementalStrategy.DeleteInsert),
      uniqueKey = Seq("id"), partitionBy = Seq("y"))
    val base = Seq((1L, "a", 2000), (2L, "b", 2001), (3L, "c", 2001))
      .toDF("id", "v", "y")
    run(a, rel, cfg, base)
    val before2000 = filesOfPartition(a, rel, 2000)

    // delete+insert id=2 twice (dup-preserving) into 2001 only
    val delta = Seq((2L, "x", 2001), (2L, "x", 2001)).toDF("id", "v", "y")
    run(a, rel, cfg, delta)

    val got = a.read(rel).orderBy(col("id"), col("v")).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, "a", 2000), (2L, "x", 2001), (2L, "x", 2001), (3L, "c", 2001)))
    assert(filesOfPartition(a, rel, 2000) == before2000)
  }

  test("concurrent_batches parallel microbatch equals the serial result") {
    import spark.implicits._
    import graft.mat.MicrobatchRunner
    val events = (0 until 600).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2026-01-${i % 6 + 1}%02d 08:00:00"),
        (i % 6 + 1) * 100 + i % 7)
    }.toDF("id", "ts", "v").withColumn("day", to_date(col("ts")))
    val a = freshAdapter("mbconc")
    def cfg(conc: Boolean) = NodeConfig(materialized = "incremental",
      incrementalStrategy = Some(IncrementalStrategy.Microbatch),
      eventTime = Some("ts"), batchSize = Some(BatchSize.Day),
      begin = Some("2026-01-01 00:00:00"), partitionBy = Seq("day"),
      concurrentBatches = conc)
    def runTo(name: String, conc: Boolean): Relation = {
      val rel = Relation(a.defaultSchema, name)
      val r = MicrobatchRunner.run(MatContext(a, node(name, cfg(conc)), rel,
        () => events, fullRefresh = false,
        java.sql.Timestamp.valueOf("2026-01-08 00:00:00")))
      assert(r.status == "success", r.message)
      if (conc) assert(r.message.contains("(concurrent)"), r.message)
      rel
    }
    val serial = runTo("mb_serial", conc = false)
    val parallel = runTo("mb_conc", conc = true)
    val s = a.read(serial).select("id", "ts", "v", "day")
    val p = a.read(parallel).select("id", "ts", "v", "day")
    assert(s.count() == 600 && p.count() == 600)
    assert(s.exceptAll(p).isEmpty && p.exceptAll(s).isEmpty)
  }

  test("zorder_by tolerates empty input (schema-only dry runs)") {
    import spark.implicits._
    val a = freshAdapter("zempty")
    val rel = Relation(a.defaultSchema, "zempty_t")
    val empty = Seq.empty[(Int, Int)].toDF("x", "y")
    a.writeTableAtomic(empty, rel, zorderBy = Seq("x", "y"))
    assert(a.read(rel).count() == 0)
    assert(a.read(rel).columns.toSeq == Seq("x", "y"))
  }

  test("zorder_by bounds BOTH dimensions per file where sort_by serves one") {
    import spark.implicits._
    val a = freshAdapter("zorder")
    // 64×64 grid, shuffled: each (x, y) uniform over [0, 64)²
    val rows = new scala.util.Random(11)
      .shuffle((0 until 64).flatMap(x => (0 until 64).map(y => (x, y))).toList)
    val df = rows.toDF("x", "y").repartition(4)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // enough range partitions that the Morton prefix splits BOTH
    // dimensions (2 files can only split the top bit's dimension)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val zrel = Relation(a.defaultSchema, "zordered")
      a.writeTableAtomic(df, zrel, zorderBy = Seq("x", "y"))
      val srel = Relation(a.defaultSchema, "sorted1d")
      a.writeTableAtomic(df, srel, sortBy = Seq("x"))
      def fileRanges(rel: Relation): Seq[((Int, Int), (Int, Int))] =
        a.read(rel).select(input_file_name().as("f"), col("x"), col("y"))
          .as[(String, Int, Int)].collect().groupBy(_._1).values.map { rs =>
            ((rs.map(_._2).min, rs.map(_._2).max),
              (rs.map(_._3).min, rs.map(_._3).max))
          }.toSeq
      val z = fileRanges(zrel)
      val s = fileRanges(srel)
      assert(z.size > 1 && s.size > 1)
      // avg per-file span of the SECOND dimension: z-order keeps it a
      // fraction of the domain; 1-d sort leaves it the whole domain
      def avgYSpan(rs: Seq[((Int, Int), (Int, Int))]): Double =
        rs.map { case (_, (lo, hi)) => (hi - lo + 1).toDouble }.sum / rs.size
      assert(avgYSpan(s) > 60.0, s"sort_by y-span ${avgYSpan(s)}")
      assert(avgYSpan(z) < 40.0, s"zorder y-span ${avgYSpan(z)}")
      // and x stays bounded too (both layouts serve x)
      def avgXSpan(rs: Seq[((Int, Int), (Int, Int))]): Double =
        rs.map { case ((lo, hi), _) => (hi - lo + 1).toDouble }.sum / rs.size
      assert(avgXSpan(z) < 40.0, s"zorder x-span ${avgXSpan(z)}")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }

  test("layout_curve: hilbert bounds both dimensions; bad curve rejected") {
    import spark.implicits._
    val a = freshAdapter("hilbert")
    val rows = new scala.util.Random(11)
      .shuffle((0 until 64).flatMap(x => (0 until 64).map(y => (x, y))).toList)
    val df = rows.toDF("x", "y").repartition(4)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val hrel = Relation(a.defaultSchema, "hilberted")
      a.writeTableAtomic(df, hrel, zorderBy = Seq("x", "y"),
        layoutCurve = "hilbert")
      val rs = a.read(hrel).select(input_file_name().as("f"), col("x"), col("y"))
        .as[(String, Int, Int)].collect().groupBy(_._1).values.map { g =>
          ((g.map(_._2).min, g.map(_._2).max),
            (g.map(_._3).min, g.map(_._3).max))
        }.toSeq
      assert(rs.size > 1)
      def avg(f: ((Int, Int), (Int, Int)) => Int): Double =
        rs.map(r => f(r._1, r._2).toDouble).sum / rs.size
      val xs = avg((x, _) => x._2 - x._1 + 1)
      val ys = avg((_, y) => y._2 - y._1 + 1)
      assert(xs < 40.0, s"hilbert x-span $xs")
      assert(ys < 40.0, s"hilbert y-span $ys")
      intercept[IllegalArgumentException] {
        a.writeTableAtomic(df, Relation(a.defaultSchema, "badcurve"),
          zorderBy = Seq("x", "y"), layoutCurve = "peano")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }

  test("clustered_by buckets co-locate same-key joins: no exchange") {
    import spark.implicits._
    val a = freshAdapter("buckets")
    val left = Relation(a.defaultSchema, "fact")
    val right = Relation(a.defaultSchema, "other")
    val df1 = (0L until 2000L).map(i => (i % 97, i)).toDF("k", "v1")
    val df2 = (0L until 1000L).map(i => (i % 97, i * 2)).toDF("k", "v2")
    a.writeTableAtomic(df1, left, clusteredBy = Seq("k"), buckets = 8)
    a.writeTableAtomic(df2, right, clusteredBy = Seq("k"), buckets = 8)
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = a.read(left).join(a.read(right), "k")
      assert(joined.count() > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange"), plan.take(1500))
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
  }

  test("sort_by orders rows within every written file (data-skipping layout)") {
    import spark.implicits._
    val a = freshAdapter("sortby")
    val rel = Relation(a.defaultSchema, "clustered")
    // shuffled input across several tasks — without sort_by each file
    // would interleave keys and row-group min/max stats would span the
    // whole domain
    val df = new scala.util.Random(7).shuffle((0 until 4000).toList)
      .map(i => (i.toLong, i % 13, s"p$i"))
      .toDF("k", "grp", "payload").repartition(4)
    // AQE would coalesce this tiny range shuffle to one 64 MB-target
    // partition (correct at scale, defeats the multi-file assertion here)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try a.writeTableAtomic(df, rel, sortBy = Seq("k"))
    finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    val perFile = a.read(rel)
      .select(input_file_name().as("f"), col("k"))
      .as[(String, Long)].collect().groupBy(_._1).values
    assert(perFile.size > 1) // really multiple files
    perFile.foreach { rows =>
      val ks = rows.map(_._2).toSeq
      assert(ks == ks.sorted, "file not sorted on k")
    }
    // disjoint file key-ranges ⇒ a point lookup touches exactly one file
    val ranges = perFile.map(rows => (rows.map(_._2).min, rows.map(_._2).max))
      .toSeq.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) => assert(hi < lo, s"overlapping ranges $ranges")
      case _ =>
    }
  }
}
