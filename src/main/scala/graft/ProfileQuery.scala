package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE named query with a job listener and report where the
  * wall-clock goes — per-Spark-job durations (with call sites) vs the
  * driver-side gap (DDL, catalog, filesystem, planning). The write-path
  * engine queries run dozens of small jobs; this splits "the cluster is
  * slow" from "the driver is doing serial metadata work" (guide §7.3)
  * without a UI on this headless box.
  *
  * Usage: runMain graft.ProfileQuery <name> [reps]
  * Session mirrors graft.BenchWrite (same master/cores/shuffle settings).
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQuery <name> [reps]")
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    LogTuning.quietBenignWindowWarning()

    case class Job(id: Int, t0: Long, var t1: Long = 0L, site: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val p = Option(js.properties)
        def prop(k: String): Option[String] =
          p.flatMap(pp => Option(pp.getProperty(k))).filter(_.nonEmpty)
        val site = prop("spark.job.description")
          .orElse(prop("callSite.short"))
          .orElse(prop("spark.sql.execution.root.id").map("sqlRoot " + _))
          .orElse(prop("spark.sql.execution.id").map("sql " + _))
          .getOrElse("?")
        jobs.put(js.jobId, Job(js.jobId, System.nanoTime(), site = site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId)
        if (j != null) j.t1 = System.nanoTime()
      }
    })

    case class Act(fn: String, node: String, secs: Double)
    val acts = new java.util.concurrent.ConcurrentLinkedQueue[Act]()
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = {
          val top = qe.executedPlan.nodeName
          acts.add(Act(funcName, top, durationNs / 1e9)); ()
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })

    def exec(): Double = {
      jobs.clear(); acts.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      wall
    }

    exec() // warmup rep: JIT + codegen + catalog init off the books
    var rep = 0
    while (rep < reps) {
      val wall = exec()
      import scala.jdk.CollectionConverters._
      val done = jobs.values.asScala.filter(_.t1 > 0).toSeq
      val jobSecs = done.map(j => (j.t1 - j.t0) / 1e9)
      val bySite = done.groupBy(_.site).map { case (s, js) =>
        (s, js.map(j => (j.t1 - j.t0) / 1e9).sum, js.size) }
        .toSeq.sortBy(-_._2)
      println(f"[profile] $name wall=$wall%.2f s, jobs=${done.size} " +
        f"sum(job)=${jobSecs.sum}%.2f s, driver-gap=${wall - jobSecs.sum}%.2f s")
      bySite.take(25).foreach { case (s, t, n) =>
        println(f"[profile]   $t%7.3f s  x$n%-4d $s") }
      // individual slow jobs, in start order — shows whether a hot site
      // is one big job or many serial small ones
      done.sortBy(_.t0).filter(j => (j.t1 - j.t0) / 1e9 > 0.15)
        .foreach { j =>
          println(f"[profile]   job ${j.id}%-4d ${(j.t1 - j.t0) / 1e9}%6.3f s  ${j.site.takeRight(60)}")
        }
      import scala.jdk.CollectionConverters._
      val byAct = acts.asScala.toSeq.groupBy(a => (a.fn, a.node))
        .map { case ((fn, node), as) => (fn, node, as.map(_.secs).sum, as.size) }
        .toSeq.sortBy(-_._3)
      val actTotal = acts.asScala.map(_.secs).sum
      println(f"[profile] actions=${acts.size} sum(action)=$actTotal%.2f s")
      byAct.take(30).foreach { case (fn, node, t, n) =>
        println(f"[profile]   $t%7.3f s  x$n%-4d $fn @ $node") }
      rep += 1
    }
    spark.stop()
  }
}
