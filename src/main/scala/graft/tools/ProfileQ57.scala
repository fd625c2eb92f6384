package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-by-stage profiler for q57 (dedup keeper assignment) —
  * not part of the library surface; run with
  * `SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileQ57`. */
object ProfileQ57 {
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
      val docs = graft.ops.Tables.documents(spark, sfDir)
      time("docs count")(docs.count())
      val pairs = graft.llm.Dedup
        .jaccardPairs(docs, "doc_id", "text", "source", 0.9)
        .select($"id_a", $"id_b")
      time("jaccardPairs count")(pairs.count())
      val (cc, rounds) = time("connectedComponents") {
        val r = graft.llm.Dedup.connectedComponentsWithRounds(pairs,
          allIds = Some(docs.select($"doc_id")))
        (r._1, r._2)
      }
      println(s"[prof]   rounds = $rounds")
      time("orderBy+collect")(cc.orderBy($"id").collect())
      time("q57 end-to-end") {
        graft.SparkEntry.queries("q57_dedup_components")(spark, sfDir).collect()
      }
    }
    spark.stop()
  }
}
