package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch stage-by-stage profiler for q97 (corpus-prep capstone) — not
  * part of the library surface; run with
  * `SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileQ97`.
  * Times the EXACT stage plans the query runs
  * ([[graft.ops.LlmQueries.q97Stages]] — shared, so the profiler cannot
  * drift from the pipeline). Stage numbers are cumulative prefixes; the
  * deltas are the per-stage floors. */
object ProfileQ97 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    for (pass <- 1 to 3) {
      println(s"[prof] ---- pass $pass ----")
      val st = graft.ops.LlmQueries.q97Stages(spark, sfDir)
      time("clean (gates)")(st.clean.count())
      time("reps (exact dedup)")(st.reps.count())
      time("minhash pairs")(st.pairs.count())
      time("keepers (components)")(st.keepers.count())
      time("decontaminate")(st.decon.count())
      time("q97 end-to-end") {
        graft.SparkEntry.queries("q97_corpus_pipeline")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
