package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-by-stage profiler for q55 (IVF approximate kNN) — not
  * part of the library surface; run with
  * `SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileQ55`.
  * Splits the query into fitCentroids / buildIndex-assign / knn so the
  * 6.0 s BENCH_r05 number (vs q59's 1.6 s fit-only) can be attributed. */
object ProfileQ55 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // warm-up
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    for (pass <- 1 to 3) {
      println(s"[prof] ---- pass $pass ----")
      val e = graft.ops.Tables.embeddings(spark, sfDir)
      time("embeddings count")(e.count())
      val centroids = time("fitCentroids") {
        graft.llm.Ivf.fitCentroids(e, "vec_id", "embedding", nlist = 16)
      }
      time("centroids collect")(centroids.collect())
      // buildIndex is EAGER since the one-shuffle rewrite (seeds collect,
      // guard count, 3 Lloyd jobs run inside it); only the assign tag is
      // deferred to the count below
      val (index, cents) = time("buildIndex (fit, eager)") {
        graft.llm.Ivf.buildIndex(e, "vec_id", "embedding", nlist = 16)
      }
      time("index count")(index.count())
      val knn = time("knn (plan only)") {
        graft.llm.Ivf.knn(e.filter($"vec_id" < 10), index, cents,
          "vec_id", "embedding", k = 5, nprobe = 4)
      }
      time("knn count")(knn.count())
      time("q55 end-to-end") {
        graft.SparkEntry.queries("q55_knn_ivf")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
