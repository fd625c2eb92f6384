package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for q107 — counts documents scans in the executed
  * plan and times the query, for the checkpoint-or-not decision. */
object ProfileQ107 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.ops.LlmQueries.q107RegexTokens(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("documents"))
    println(s"[prof] documents scans in plan: $scans")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.ops.LlmQueries.q107RegexTokens(spark, sfDir).count()
      println(f"[prof] pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
