package graft

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off PQ-vs-IVFPQ crossover demo (not part of the driver
  * contract). The sf0.1 embeddings table is 2,000 rows — both ANN ops
  * are job-latency-bound there, so IVFPQ's probe pruning (touch
  * nprobe/nlist of the codes instead of all of them) is invisible.
  * This main generates a deterministic id-arithmetic corpus big enough
  * (default 1M × dim 64) for scan cost to dominate, then times plain
  * PQ against IVFPQ at nlist=64 / nprobe=8 — the scale regime the
  * operator exists for. Vectors cluster on `id % 64` with small
  * deterministic noise, so the coarse quantizer has real structure to
  * find; both ops run twice (report both passes — first pass carries
  * codegen warmup) plus a top-k agreement check between the two
  * rankings. */
object BenchAnn {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nQueries = args.drop(1).headOption.map(_.toLong).getOrElse(100L)
    val dim = 64
    val queryMod = math.max(n / nQueries, 1L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      // PQ's (queries × corpus) candidate set must SORT inside the
      // top-k window's shuffle partitions: at 2.5k+ queries × 1M codes
      // that is >2.5e9 rows, and 32 partitions OOM a 24g heap — the
      // linear scan is a memory hazard as well as a time one
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_BENCH_PARTS", "128"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 64 latent clusters (id % 64), cluster-dependent base in [-14, 14]
    // per dim, id-dependent noise in [-1, 1] — deterministic, no parquet
    val corpus = spark.range(n).select(
      col("id").as("vec_id"),
      expr(s"""transform(sequence(0, ${dim - 1}), d ->
        CAST((pmod((id % 64) * (d + 13), 29) - 14)
           + (pmod(id * (d + 7), 11) - 5) / 5.0 AS FLOAT))""")
        .as("embedding")).cache()
    corpus.count()
    val queries = corpus.filter(col("vec_id") % queryMod === 0)
    println(s"[abench] corpus=$n dim=$dim queries=${queries.count()}")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[abench] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  ($rows rows)")
    }

    def pq() = Similarity.pqTopK(queries, corpus, "vec_id", "embedding",
      k = 5, m = 4, codebookSize = 16, iters = 1).count()
    def ivfpq() = Similarity.ivfpqTopK(queries, corpus, "vec_id",
      "embedding", k = 5, nlist = 64, nprobe = 8, coarseIters = 1,
      m = 4, codebookSize = 16, iters = 1, trainSampleMod = 16).count()

    val passes = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    for (pass <- 1 to passes) {
      time(s"pq     pass$pass")(pq())
      time(s"ivfpq  pass$pass")(ivfpq())
    }

    if (passes < 2) { spark.stop(); return }
    // how often the pruned ranking returns the same neighbors
    val a = Similarity.pqTopK(queries, corpus, "vec_id", "embedding",
      k = 5, m = 4, codebookSize = 16, iters = 1)
      .select("query_id", "neighbor_id")
    val b = Similarity.ivfpqTopK(queries, corpus, "vec_id", "embedding",
      k = 5, nlist = 64, nprobe = 8, coarseIters = 1, m = 4,
      codebookSize = 16, iters = 1, trainSampleMod = 16)
      .select("query_id", "neighbor_id")
    val inter = a.join(b, Seq("query_id", "neighbor_id")).count()
    val total = a.count()
    println(f"[abench] top-k agreement: $inter/$total " +
      f"(${inter * 100.0 / total}%.1f%%)")
    spark.stop()
  }
}
