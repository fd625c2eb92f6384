package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q106 (streaming near-dup dedup) — attributes its
  * cost between (a) the per-row band-bucket expression, (b) the
  * explode + state machinery. Run with
  * `SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileQ106`. */
object ProfileQ106 {
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
    time("bucket expr (batch)") {
      docs.select(posexplode(
        graft.llm.Dedup.bandBucketKeysSql(col("text")))).count()
    }
    time("full q106 (streaming)") {
      graft.ops.StreamQueries.q106StreamNearDup(spark, sfDir).count()
    }
    // the documented scale path for duplicated corpora: exact dedup
    // first (q101's job — its state is one bool per distinct content),
    // near-dup over the representatives. Emulated here with a batch
    // rep table so the q106 stage's distinct-bounded cost is measurable
    // on the stress sets.
    val dedupDir = java.nio.file.Files.createTempDirectory("graft_q106_reps")
    try {
      docs.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"), col("text"))
        .write.mode("overwrite")
        .parquet(dedupDir.resolve("documents.parquet").toString)
      time("q106 after exact dedup") {
        graft.ops.StreamQueries.q106StreamNearDup(spark,
          dedupDir.toString).count()
      }
    } finally graft.util.Fs.deleteRecursively(dedupDir)
    spark.stop()
  }
}
