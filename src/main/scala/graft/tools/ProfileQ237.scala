package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch q237 banding profiler — not part of the library surface;
  * run with
  * `SPARK_GRAFT_DIRS=<dir1>,<dir2>,... runMain graft.tools.ProfileQ237`.
  *
  * q237 prunes the quadratic corpus-pair space data-driven: only pairs
  * whose KMV minima collide are compared. This harness prints, per
  * directory, the source count, the quadratic all-pairs count, the
  * banded candidate count, and how many candidates carry real overlap
  * (jacc_est_bp > 0) — the claim under measurement is that candidate
  * count tracks TRUE overlap structure (the gen_stress replica
  * families), not corpus count. */
object ProfileQ237 {
  def main(args: Array[String]): Unit = {
    val dirs = sys.env.getOrElse("SPARK_GRAFT_DIRS",
      "/root/testdata/sf0.01,/root/testdata/sf0.1").split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val parts = dirs.map { dir =>
      val t0 = System.nanoTime()
      val out = graft.ops.LlmQueries.q237KmvBandedPairs(spark, dir)
        .localCheckpoint()
      val nCand = out.count()
      val nHot = out.filter($"jacc_est_bp" > 0).count()
      val sec = math.round((System.nanoTime() - t0) / 1e6) / 1000.0
      val nSrc = graft.ops.Tables.documents(spark, dir)
        .select($"source").distinct().count()
      s""""$dir":{"n_sources":$nSrc,""" +
        s""""all_pairs":${nSrc * (nSrc - 1) / 2},""" +
        s""""banded_pairs":$nCand,"est_gt0":$nHot,"sec":$sec}"""
    }
    println(s"{${parts.mkString(",")}}")
    spark.stop()
  }
}
