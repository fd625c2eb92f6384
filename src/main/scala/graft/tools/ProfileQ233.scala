package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch q233 decision-flip profiler — not part of the library
  * surface; run with
  * `SPARK_GRAFT_SF_DIR=<events set> runMain graft.tools.ProfileQ233`.
  *
  * q233 decides plain-vs-salted from the CMS hot-key estimate. The
  * natural fixtures are unskewed (max key share 86 bp at sf0.01, 9 bp
  * at sf0.1), so the verified decision is `plain` at every decade; this
  * harness materializes the OTHER world — a hot-key twin of the events
  * table with 30 % of rows remapped to one user (`user_id % 10 < 3 →
  * 0`, the one-chatty-service shape) written as parquet — and runs the
  * SAME query against both directories. Expected output: the natural
  * set decides `plain` (skew_bp well under 500), the twin decides
  * `salted` (skew_bp ≈ 3000), and the per-run wall clocks sit beside
  * the decisions — the flip is data-driven, not a code path chosen by
  * the harness. */
object ProfileQ233 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val skewDir = graft.util.Fs.tempRoot("graft_q233_skewtwin").toString
    graft.ops.Tables.events(spark, sfDir)
      .withColumn("user_id",
        expr("CASE WHEN user_id % 10 < 3 THEN 0 ELSE user_id END"))
      .write.mode("overwrite").parquet(s"$skewDir/events.parquet")

    def run(label: String, dir: String): String = {
      val t0 = System.nanoTime()
      val rows = graft.ops.LlmQueries.q233SkewPlanner(spark, dir).collect()
      val sec = math.round((System.nanoTime() - t0) / 1e6) / 1000.0
      val r = rows.head
      s""""$label":{"decision":"${r.getAs[String]("decision")}",""" +
        s""""skew_bp":${r.getAs[Long]("skew_bp")},"sec":$sec}"""
    }
    val natural = run("natural", sfDir)
    val skewed = run("skewed_twin", skewDir)
    println(s"""{"sf":"$sfDir",$natural,$skewed}""")
    spark.stop()
  }
}
