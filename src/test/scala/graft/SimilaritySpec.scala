package graft

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native HyperplaneSig/HyperplaneBandSigs expressions must produce
  * bit-identical buckets to the SQL formulation they replaced (which
  * survives as the DuckDB oracle mirror, PipelinePack.sigSql), and the
  * interpreted HOF mega-expression must be gone from the plans. */
class SimilaritySpec extends AnyFunSuite {

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

  private def vec(seed: Int, dim: Int = 64): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(dim)((r.nextDouble() - 0.5).toFloat)
  }

  /** The pre-native SQL formulation, verbatim — the reference semantics
    * mirrored by the DuckDB oracle. */
  private def sigSqlExpr(vecCol: String, bits: Int, dim: Int = 64): String = {
    val qv = s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"
    (0 until bits).map { i =>
      val ws = (0 until dim).map(d => Similarity.hyperplaneWeight(i, d))
        .mkString("array(", "L, ", "L)")
      s"(CASE WHEN aggregate(zip_with($qv, $ws, (x, h) -> x * h), 0L, (a, b) -> a + b) > 0 THEN ${1L << i}L ELSE 0L END)"
    }.mkString(" + ")
  }

  test("native hyperplane signature matches SQL formulation bit-for-bit") {
    import spark.implicits._
    val df = (0 until 200).map(i => (i.toLong, vec(i))).toDF("id", "v")
    val both = df.select(
      Similarity.hyperplaneSignature("v", 12).as("native"),
      expr(sigSqlExpr("v", 12)).as("sql"))
    assert(both.filter(col("native") =!= col("sql")).count() == 0)
    // 30-bit variant used by ivfAssign
    val both30 = df.select(
      Similarity.hyperplaneSignature("v", 30).as("native"),
      expr(sigSqlExpr("v", 30)).as("sql"))
    assert(both30.filter(col("native") =!= col("sql")).count() == 0)
  }

  test("native band signatures match per-band SQL bits") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, vec(i + 5000))).toDF("id", "v")
    val bands = 4
    val r = 6
    // band b bit j = global hyperplane b*r+j with weight 1<<j — rebuild
    // from the flat SQL signature of bands*r bits by slicing bit ranges
    val flat = df.select(col("id"), expr(sigSqlExpr("v", bands * r)).as("flat"),
      Similarity.bandSignatures("v", bands, r).as("native"))
    val bandCols = Seq(col("id"), col("native")) ++ (0 until bands).map(b =>
      shiftright(col("flat"), b * r).bitwiseAND(lit((1L << r) - 1))
        .as(s"b$b"))
    val mismatches = flat.select(bandCols: _*)
      .filter((0 until bands).map(b =>
        col("native").getItem(b) =!= col(s"b$b")).reduce(_ || _))
    assert(mismatches.count() == 0)
  }

  test("null vectors and null elements bucket to signature 0, matching SQL") {
    import spark.implicits._
    val rows = Seq(
      (1L, null.asInstanceOf[Array[java.lang.Float]]),          // null vector
      (2L, Array.fill(64)(java.lang.Float.valueOf(0.5f))
        .updated(7, null.asInstanceOf[java.lang.Float])))       // null element
    val df = rows.toDF("id", "v")
    val out = df.select(col("id"),
      Similarity.hyperplaneSignature("v", 12).as("sig"),
      Similarity.bandSignatures("v", 2, 6).as("bands"))
      .collect().sortBy(_.getLong(0))
    // the SQL CASE yields bit 0 everywhere (null dot) — never NULL, so
    // the rows still land in bucket 0 of an equi-join
    out.foreach { r =>
      assert(!r.isNullAt(1) && r.getLong(1) == 0L, r.toString)
      assert(r.getSeq[Long](2) == Seq(0L, 0L), r.toString)
    }
    // a dim-MISMATCHED vector signs against the zero-padded subspace —
    // identical to its explicitly zero-padded dim-64 twin, and NOT the
    // constant all-zero signature (which would put every vector in one
    // band bucket and send the banded self-join quadratic; found by the
    // write-path growth rehearsal on dim-32 corpora)
    val short = Array.fill(3)(java.lang.Float.valueOf(0.5f))
    val padded = short ++ Array.fill(61)(java.lang.Float.valueOf(0f))
    val pair = Seq((1L, short), (2L, padded)).toDF("id", "v")
      .select(col("id"),
        Similarity.hyperplaneSignature("v", 12).as("sig"),
        Similarity.bandSignatures("v", 2, 6).as("bands"))
      .collect().sortBy(_.getLong(0))
    assert(pair(0).getLong(1) == pair(1).getLong(1), "sig ≡ zero-padded twin")
    assert(pair(0).getSeq[Long](2) == pair(1).getSeq[Long](2))
    assert(pair(0).getLong(1) != 0L || pair(0).getSeq[Long](2).exists(_ != 0L),
      "mismatched dims must not collapse to the constant signature")
    // structural equality: two separately-built instances over the same
    // child must be equal (case-class equality feeds semanticEquals →
    // subexpression elimination / plan reuse); with Array weights these
    // compared by reference and never matched
    val child = org.apache.spark.sql.catalyst.expressions.Literal
      .create(Array(0.5f, 0.5f), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))
    val w = IndexedSeq(IndexedSeq(1L, 2L), IndexedSeq(3L, 4L))
    assert(graft.expressions.PipelineExpressions.HyperplaneSig(child, w) ==
      graft.expressions.PipelineExpressions.HyperplaneSig(child,
        IndexedSeq(IndexedSeq(1L, 2L), IndexedSeq(3L, 4L))))
  }

  test("k-means centroids are partition-invariant and clusters converge") {
    import spark.implicits._
    // 3 planted blobs: base vectors 0/1/2, each with 20 small perturbations
    def blob(base: Int, seed: Int): Array[Float] = {
      val b = vec(base)
      val r = new scala.util.Random(seed)
      b.map(x => x + (r.nextDouble() - 0.5).toFloat * 0.05f)
    }
    val rows = (0 until 60).map(i => (i.toLong, blob(i % 3, 7000 + i)))
    val df1 = rows.toDF("vec_id", "embedding")
    val df2 = rows.reverse.toDF("vec_id", "embedding").repartition(7)
    val c1 = Similarity.kmeansCentroids(df1, "vec_id", "embedding", 3, 2)
    val c2 = Similarity.kmeansCentroids(df2, "vec_id", "embedding", 3, 2)
    // decimal-exact accumulation ⇒ bit-identical centroids no matter the
    // partitioning or row order
    assert(c1.length == 3)
    assert(c1.zip(c2).forall { case (a, b) => a.sameElements(b) })
    // every blob member lands with its own blob's majority cluster
    val asg = df1.select(col("vec_id"),
      graft.expressions.PipelineExpressions
        .nearest_centroids(col("embedding"), c1, 1)(0).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0 until 3).foreach { blobId =>
      val members = (0 until 60).filter(_ % 3 == blobId).map(i => asg(i.toLong))
      assert(members.distinct.size == 1,
        s"blob $blobId split across clusters: $members")
    }
  }

  test("k-means ragged-dim corpus: each dimension divides by the rows " +
      "that carry it, not the cluster size") {
    import spark.implicits._
    // model dim = 3 (from the smallest id); shorter rows contribute to
    // the leading dimensions only — the per-(cid, d) divisor semantics
    // of the original posexplode + groupBy(cid, d) update pass
    val df = Seq(
      (0L, Array(2.0f, 4.0f, 8.0f)),
      (1L, Array(4.0f, 6.0f)),
      (2L, Array(6.0f))).toDF("vec_id", "embedding")
    val c = Similarity.kmeansCentroids(df, "vec_id", "embedding",
      k = 1, iters = 1)
    assert(c.length == 1)
    // d0: (2+4+6)/3, d1: (4+6)/2 — NOT /3 —, d2: 8/1
    assert(c(0).toSeq == Seq(4.0, 5.0, 8.0),
      s"ragged-dim centroid wrong: ${c(0).toSeq}")
  }

  test("ivfTopK recall vs brute force on clustered data") {
    import spark.implicits._
    val rows = (0 until 120).map { i =>
      val base = vec(i % 6)
      val r = new scala.util.Random(9000 + i)
      (i.toLong, base.map(x => x + (r.nextDouble() - 0.5).toFloat * 0.05f))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") % 40 === 0)
    val exact = Similarity.bruteForceTopK(queries, corpus, "vec_id",
      "embedding", k = 5).select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(queries, corpus, "vec_id", "embedding",
      k = 5, nlist = 6, nprobe = 2, iters = 2)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall < 0.8 (got ${ivf.size} rows)")
  }

  test("ivfTopKIndexed over a persisted routed table ≡ ivfTopK; probed " +
      "cells prune partitions") {
    import spark.implicits._
    val df = (0 until 120).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") % 20 === 0)
    val expected = Similarity.ivfTopK(queries, df, "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet

    // persist the index: frozen centroids (the cluster_assign artifact
    // shape) + the corpus routed and PARTITIONED by its cell
    val cents = Similarity.kmeansCentroids(df, "vec_id", "embedding",
      k = 8, iters = 2)
    val art = cents.zipWithIndex.flatMap { case (arr, cid) =>
      arr.zipWithIndex.map { case (v, i) => (cid, i, v) } }.toSeq
      .toDF("cid", "i", "val")
    val dir = java.nio.file.Files.createTempDirectory("graft_vidx").toString
    art.write.parquet(s"$dir/model")
    df.withColumn("cluster_id", graft.expressions.PipelineExpressions
        .nearest_centroids(col("embedding"), cents, 1)(0))
      .write.partitionBy("cluster_id").parquet(s"$dir/routed")

    val routed = spark.read.parquet(s"$dir/routed")
    val loaded = Similarity.centroidsFromRows(
      spark.read.parquet(s"$dir/model"))
    val got = Similarity.ivfTopKIndexed(
      routed.filter(col("vec_id") % 20 === 0), routed, loaded,
      "vec_id", "embedding", "cluster_id", k = 5, nprobe = 2)
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .toSet === expected,
      "persisted-index search ≡ train-at-query-time ivfTopK")
    // the corpus scan must carry a dynamic partition filter on the cell
    // id — the probed-cells-only contract that makes the index an index
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning on cluster_id:\n${plan.take(3000)}")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
  }

  test("pqTopK recall vs brute force, partition-invariant, corpus unshuffled") {
    import spark.implicits._
    val rows = (0 until 120).map { i =>
      val base = vec(i % 6)
      val r = new scala.util.Random(9000 + i)
      (i.toLong, base.map(x => x + (r.nextDouble() - 0.5).toFloat * 0.05f))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") % 40 === 0)
    val pq = Similarity.pqTopK(queries, corpus, "vec_id", "embedding",
      k = 5, m = 4, codebookSize = 8, iters = 1)
    val pqRows = pq.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pqRows.size == 15, s"expected 3 queries x 5: $pqRows")
    // quantization deliberately collapses WITHIN-blob distances (members
    // share codes, ADC ties break by id), so the guaranteed property is
    // cluster membership: every returned neighbor is from the query's
    // own blob (blob id = vec_id % 6)
    pqRows.foreach { case (q, n) =>
      assert(n % 6 == q % 6, s"neighbor $n not in query $q's blob") }

    // deterministic: identical rows under different partitioning/order
    val again = Similarity.pqTopK(
      queries, rows.reverse.toDF("vec_id", "embedding").repartition(7),
      "vec_id", "embedding", k = 5, m = 4, codebookSize = 8, iters = 1)
      .collect().map(_.toString).sorted
    assert(pq.collect().map(_.toString).sorted.sameElements(again))

    // scan-side shape: the corpus is never exchanged before scoring —
    // the only exchange is the top-k window on (query, neighbor) rows
    // (AQE's toString appends the initial plan; count the final one only)
    val plan = pq.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      plan.take(3000))
  }

  test("ivfpqTopK: coarse pruning keeps PQ's blob answers, hash-joins the probe") {
    import spark.implicits._
    val rows = (0 until 120).map { i =>
      val base = vec(i % 6)
      val r = new scala.util.Random(9000 + i)
      (i.toLong, base.map(x => x + (r.nextDouble() - 0.5).toFloat * 0.05f))
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") % 40 === 0)
    val pq = Similarity.pqTopK(queries, corpus, "vec_id", "embedding",
      k = 5, m = 4, codebookSize = 8, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = Similarity.ivfpqTopK(queries, corpus, "vec_id", "embedding",
      k = 5, nlist = 6, nprobe = 2, coarseIters = 1, m = 4,
      codebookSize = 8, iters = 1)
    val got = ivfpq.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // recall vs the unpruned PQ ranking: with 6 planted blobs and
    // nprobe=2, each query's own cell is probed, so the pruned scan must
    // recover (nearly) all of plain PQ's top-k — the loss budget is the
    // cell boundary, not the quantization
    val recall = got.intersect(pq).size.toDouble / pq.size
    assert(recall >= 0.8, s"IVFPQ recall vs PQ $recall < 0.8")
    // every neighbor still comes from the query's own blob (the PQ
    // guarantee survives the pruning)
    got.foreach { case (q, n) =>
      assert(n % 6 == q % 6, s"neighbor $n not in query $q's blob") }
  }

  test("ivfpqTopK probe is a broadcast equi-join, not a nested loop") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivfpqspec").toString
    (0 until 80).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/c")
    val corpus = spark.read.parquet(s"$dir/c")
    val queries = corpus.filter(col("vec_id") % 20 === 0)
    val plan = Similarity.ivfpqTopK(queries, corpus, "vec_id", "embedding",
      k = 3, nlist = 4, nprobe = 2, coarseIters = 1, m = 4,
      codebookSize = 8, iters = 1)
      .queryExecution.executedPlan.toString
    // plain PQ's scan is a BroadcastNestedLoopJoin by design; the IVFPQ
    // composition must replace it with a hash join on the cell id
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("centroid_distances agrees with nearest_centroids' argmin") {
    import spark.implicits._
    import graft.expressions.PipelineExpressions._
    val cents = (0 until 8).map(i => vec(500 + i).map(_.toDouble)).toArray
    val df = (0 until 50).map(i => (i.toLong, vec(i))).toDF("id", "embedding")
    val rows = df.select(col("id"),
      nearest_centroids(col("embedding"), cents, 1)(0).as("cid"),
      centroid_distances(col("embedding"), cents).as("dists"))
      .collect()
    rows.foreach { r =>
      val cid = r.getInt(1)
      val dists = r.getSeq[java.math.BigDecimal](2)
      // the argmin over the ADC table (ties → lower index) must be the
      // same centroid NearestCentroids picks — one decimal contract
      val best = dists.zipWithIndex.minBy { case (d, i) =>
        (d, i) }(Ordering.Tuple2(Ordering.ordered[java.math.BigDecimal](
          identity), Ordering.Int))._2
      assert(best == cid, s"row ${r.getLong(0)}: table argmin $best != $cid")
    }
  }

  test("ivfTopK candidate join is a broadcast equi-join on the list id") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivfspec").toString
    (0 until 80).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/c")
    val corpus = spark.read.parquet(s"$dir/c")
    val queries = corpus.filter(col("vec_id") % 20 === 0)
    val plan = Similarity.ivfTopK(queries, corpus, "vec_id", "embedding",
      k = 3, nlist = 4, nprobe = 2, iters = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("lshTopK plan has no interpreted HOF signature math") {
    import spark.implicits._
    // go through parquet: ConvertToLocalRelation would eagerly evaluate
    // projections over a LocalRelation and hide the expression from the plan
    val dir = java.nio.file.Files.createTempDirectory("simspec").toString
    (0 until 60).map(i => (i.toLong, vec(i))).toDF("id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/corpus")
    (0 until 5).map(i => (1000L + i, vec(i + 31))).toDF("id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/queries")
    val corpus = spark.read.parquet(s"$dir/corpus")
    val queries = spark.read.parquet(s"$dir/queries")
    val plan = Similarity.lshTopK(queries, corpus, "id", "embedding", k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("aggregate(zip_with"), plan.take(2000))
    assert(plan.contains("hyperplanesig") || plan.contains("HyperplaneSig"),
      plan.take(2000))
  }

  test("classCentroids: exact micro-unit means, flat layout, NULL drop") {
    import spark.implicits._
    val df = Seq(
      (0, Array(1.0f, -2.0f)), (0, Array(2.0f, 3.0f)),
      (1, Array(0.5f, 0.25f)),
      (1, null.asInstanceOf[Array[Float]])).toDF("label", "embedding")
    val out = graft.ops.Similarity.classCentroids(df, "label", "embedding")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // label 0: dim0 mean (1+2)/2 = 1.5; dim1 (−2+3)/2 = 0.5
    assert(out((0, 0)) == ((2L, 1.5)))
    assert(out((0, 1)) == ((2L, 0.5)))
    // label 1: single vector (NULL row dropped), exact quantized values
    assert(out((1, 0)) == ((1L, 0.5)))
    assert(out((1, 1)) == ((1L, 0.25)))
    assert(out.size == 4)
  }

  test("knnClassify: majority vote, vote ties break on smaller label") {
    import spark.implicits._
    // query 100 sits among three 1-labeled and two 0-labeled points
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f), 1), (2L, Array(0.99f, 0.01f), 1),
      (3L, Array(0.98f, 0.02f), 1), (4L, Array(0.97f, 0.03f), 0),
      (5L, Array(0.96f, 0.04f), 0), (6L, Array(-1.0f, 0.0f), 9),
      (100L, Array(1.0f, 0.001f), 0)).toDF("vec_id", "embedding", "label")
    val out = graft.ops.Similarity.knnClassify(
      corpus.filter($"vec_id" === 100L), corpus,
      "vec_id", "embedding", "label", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.toSeq == Seq((100L, 0, 1))) // 3-2 vote flips the label
  }

  test("centroidClassify: separable classes are diagonal, outlier crosses") {
    import spark.implicits._
    val df = Seq(
      // class 0 clusters near (0, 0); class 1 near (10, 10)
      (0, Array(0.0f, 0.1f)), (0, Array(0.1f, 0.0f)), (0, Array(-0.1f, 0.0f)),
      (1, Array(10.0f, 10.0f)), (1, Array(10.2f, 9.8f)),
      // a mislabeled point: tagged 0 but sitting on class 1
      (0, Array(10.1f, 10.1f))).toDF("label", "embedding")
    val out = graft.ops.Similarity.centroidClassify(df, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // the outlier drags class 0's centroid but stays closest to class 1
    assert(out((0, 1)) == 1L)
    assert(out((0, 0)) == 3L)
    assert(out((1, 1)) == 2L)
    assert(out.getOrElse((1, 0), 0L) == 0L)
  }

  test("hardNegatives: same-label neighbors excluded, rank by cosine") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),   // anchor
      (1L, Array(1.0f, 0.01f, 0.0f), 0),  // closest of all — same label
      (2L, Array(0.9f, 0.1f, 0.0f), 1),   // best negative
      (3L, Array(0.0f, 1.0f, 0.0f), 1),   // orthogonal negative
      (4L, Array(-1.0f, 0.0f, 0.0f), 2)   // opposite negative
    ).toDF("vec_id", "embedding", "label")
    val out = graft.ops.Similarity.hardNegatives(
      corpus.filter($"vec_id" === 0L), corpus,
      "vec_id", "embedding", "label", k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    // the same-label near twin (id 1) must NOT appear; negatives rank
    // by cosine desc: id 2 (≈0.994) then id 3 (0.0)
    assert(out.toSeq == Seq((2L, 1), (3L, 2)))
  }

  test("classSeparation: hand centroid distance, a<b pairs only") {
    import spark.implicits._
    // centroids: label 0 → (0, 0); label 1 → (3, 4); label 2 → (0, 0)
    val df = Seq(
      (0, Array(-1.0f, 0.0f)), (0, Array(1.0f, 0.0f)),
      (1, Array(3.0f, 4.0f)),
      (2, Array(0.0f, 0.0f))).toDF("label", "embedding")
    val out = graft.ops.Similarity.classSeparation(df, "label",
      "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    assert(out == Map((0, 1) -> 5.0, (0, 2) -> 0.0, (1, 2) -> 5.0))
  }

  test("rrfFuse: both-list items outrank single-list, id tie-break") {
    import spark.implicits._
    val a = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("q", "i", "rank")
    val b = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("q", "i", "rank")
    val out = graft.ops.Similarity.rrfFuse(a, b, "q", "i", "rank",
      kc = 60, topK = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    // 11 appears in both: 1/62 + 1/61; 10: 1/61; 12: 1/62
    val r11 = math.rint((1.0 / 62 + 1.0 / 61) * 1e6) / 1e6
    val r10 = math.rint(1.0 / 61 * 1e6) / 1e6
    val r12 = math.rint(1.0 / 62 * 1e6) / 1e6
    assert(out.toSeq == Seq((11L, r11, 1), (10L, r10, 2), (12L, r12, 3)))
  }

  test("recallAtK: overlap per query, missing approx query scores 0") {
    import spark.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L),
      (2L, 20L), (2L, 21L)).toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 11L), (1L, 13L), (1L, 99L))
      .toDF("query_id", "neighbor_id")
    val out = graft.ops.Similarity.recallAtK(approx, exact,
      "query_id", "neighbor_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // query 1: 11 and 13 hit, 99 is a miss outside the exact set;
    // query 2 has no approx rows — it scores 0, it does not vanish
    assert(out == Map(
      1L -> ((4L, 2L, 0.5)),
      2L -> ((2L, 0L, 0.0))))
  }

  test("hardNegatives: equal-cosine ties break on neighbor id") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (7L, Array(0.5f, 0.5f), 1),  // identical direction ⇒ tie
      (3L, Array(1.0f, 1.0f), 1),
      (9L, Array(0.0f, 1.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val out = graft.ops.Similarity.hardNegatives(
      corpus.filter($"vec_id" === 0L), corpus,
      "vec_id", "embedding", "label", k = 3)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.toSeq == Seq((3L, 1), (7L, 2), (9L, 3)))
  }
}
