// Per-job time attribution for a single declared query (dev tooling):
// registers a SparkListener, runs the query once (same timed action as
// Bench: .count()), and prints every Spark job's wall duration with its
// call site — so multi-action queries (fixture builds, iterative loops,
// streaming harnesses) decompose into the jobs that actually cost time.
// Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ProfileJobs q97_corpus_pipeline [more...]"
package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

import scala.collection.mutable

object ProfileJobs {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileJobs <queryName> [more...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    Seq("org.apache.spark.sql.execution.streaming",
        "org.apache.spark.scheduler.DAGScheduler").foreach(l =>
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        l, org.apache.logging.log4j.Level.ERROR))
    // same warm-up as Bench so JIT/codegen startup isn't attributed
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    final case class JobRec(id: Int, start: Long, var end: Long = -1L,
        site: String = "", desc: String = "")
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val site = e.stageInfos.lastOption.map(_.name).getOrElse("")
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val nTasks = e.stageInfos.map(_.numTasks).sum
        jobs(e.jobId) = JobRec(e.jobId, e.time,
          site = s"stages=${e.stageInfos.size} tasks=$nTasks $site", desc = desc)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
    }
    args.foreach { name =>
      require(SparkEntry.queries.contains(name), s"unknown query: $name")
      // passes=2: pass 1 pays one-time memoized fixture builds; pass 2 is
      // the steady state the bench min-of-3 reports. Print both.
      for (pass <- 1 to 2) {
        jobs.synchronized(jobs.clear())
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the listener bus drain
        spark.sparkContext.removeSparkListener(listener)
        val recs = jobs.synchronized(jobs.values.toSeq)
        val done = recs.filter(_.end > 0)
        val sum = done.map(r => (r.end - r.start) / 1e3).sum
        println(f"===== $name pass=$pass wall=$wall%.2fs jobs=${recs.size} jobSum=$sum%.2fs =====")
        done.sortBy(r => -(r.end - r.start)).take(40).foreach { r =>
          val d = (r.end - r.start) / 1e3
          println(f"  $d%7.3fs  job=${r.id}%-4d ${r.site}  ${r.desc.take(80)}")
        }
      }
    }
    spark.stop()
  }
}
