package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q128 (substring-level dedup) — measures the
  * documented scale path for duplicated corpora: q128 is OUTPUT-DRIVEN
  * under exact duplication (every copy of a duplicated doc legitimately
  * carries its own span rows, the q56 class), so the composition is
  * exact dedup FIRST (q40/q101 — representatives per distinct content),
  * span detection over the representatives. Run with
  * `SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileQ128`. */
object ProfileQ128 {
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

    val docs = graft.ops.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    time("warmup count")(docs.count())
    val reps = docs.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("text"))
      .localCheckpoint()
    time("exact dedup (rep table)")(reps.count())
    time("q128 spans over reps") {
      graft.llm.Dedup.duplicateSpans(reps, "doc_id", "text",
        k = 8, minDocs = 2).count()
    }
    time("q128 spans raw (per-copy)") {
      graft.llm.Dedup.duplicateSpans(docs, "doc_id", "text",
        k = 8, minDocs = 2).count()
    }
    spark.stop()
  }
}
