package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch capped-vs-uncapped containment profiler — not part of the
  * library surface; run with
  * `SPARK_GRAFT_SF_DIR=<boilerplate set> runMain graft.tools.ProfileQ180
  * [capped|uncapped|both]`.
  * Times q180's machinery (exact-dedup keepers → containmentPairs) with
  * the default maxDocFreq=1000 cap vs effectively-uncapped on a corpus
  * where 30% of docs share one planted header (tools/gen_boilerplate.py)
  * — the hot-shingle class exact dedup cannot remove. */
object ProfileQ180 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mode = args.headOption.getOrElse("both")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = graft.ops.Tables.documents(spark, sfDir)
    val keep = docs.groupBy(md5($"text").as("fp"))
      .agg(min($"doc_id").as("doc_id"))
    val kept = docs.join(keep.select($"doc_id"), "doc_id").cache()
    println(s"[q180] keepers=${kept.count()} sf=$sfDir")

    def run(label: String, cap: Long): Unit = {
      val t0 = System.nanoTime()
      val n = graft.llm.Dedup.containmentPairs(kept, "doc_id", "text",
        k = 8, minContainBp = 8000L, maxDocFreq = cap).count()
      println(f"[q180] $label%-10s pairs=$n%8d " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    if (mode == "capped" || mode == "both") run("capped", 1000L)
    if (mode == "uncapped" || mode == "both") run("uncapped", Long.MaxValue)
    spark.stop()
  }
}
