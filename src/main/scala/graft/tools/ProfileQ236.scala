package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch q236 join-order flip profiler — not part of the library
  * surface; run with
  * `SPARK_GRAFT_DIRS=<dir1>,<dir2>,... runMain graft.tools.ProfileQ236`.
  *
  * q236 picks the left-deep join order whose FIRST intermediate the CMS
  * inner products estimate smallest. On the organic fixtures
  * clicks⋈purchases is the small first cut; on the ×100 stress decade
  * (tools/gen_stress.py — facts replicated into disjoint user-id
  * spaces, the seed cohort user_id < 500 constant) both seed pairs
  * hold at sf0.1 mass while clicks⋈purchases grows 100×, so the SAME
  * query must flip to a seed-first order. This harness runs q236 over
  * each listed directory and prints the decision, the three estimates
  * and wall clock side by side — the flip is data-driven, not a code
  * path chosen by the harness. */
object ProfileQ236 {
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

    val parts = dirs.map { dir =>
      val t0 = System.nanoTime()
      val r = graft.ops.LlmQueries.q236JoinOrderPlanner(spark, dir)
        .collect().head
      val sec = math.round((System.nanoTime() - t0) / 1e6) / 1000.0
      s""""$dir":{"first_pair":"${r.getAs[String]("first_pair")}",""" +
        s""""est_cp":${r.getAs[Long]("est_clicks_purchases")},""" +
        s""""est_cs":${r.getAs[Long]("est_clicks_seed")},""" +
        s""""est_ps":${r.getAs[Long]("est_purchases_seed")},""" +
        s""""triple_exact":${r.getAs[Long]("triple_exact")},"sec":$sec}"""
    }
    println(s"{${parts.mkString(",")}}")
    spark.stop()
  }
}
