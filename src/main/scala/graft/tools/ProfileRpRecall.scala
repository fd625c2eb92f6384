package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch tuning sweep for the dimension-reduction family
  * (q193/q194/q195/q198/q199) — not part of the library surface; run
  * with `SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileRpRecall`.
  * Against the SAME exact fixed-point truth the shipped evals use
  * ([[graft.llm.SimSearch.knnBruteL2Fp]]): mean recall@5 of (a) brute
  * search in the RP space at outDim 8/16/32/48, and (b) the Matryoshka
  * prefix-rerank at prefixDims 8/16/32 × shortlist 25/50/100 — the
  * table BASELINE.md records so "how many dims survive reduction" is a
  * measured decision, not a guess. */
object ProfileRpRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val e = graft.ops.Tables.embeddings(spark, sfDir).cache()
    println(s"[rp] corpus=${e.count()} sf=$sfDir")
    val qs = e.filter($"vec_id" < 10)
    val exact = graft.llm.SimSearch.knnBruteL2Fp(qs, e, "vec_id",
      "vec_id", "embedding", k = 5).select($"qid", $"cid").cache()
    val nq = exact.select($"qid").distinct().count()

    def meanRecall(approx: org.apache.spark.sql.DataFrame): Double =
      exact.join(approx.select($"qid", $"cid"), Seq("qid", "cid"))
        .count().toDouble / (5.0 * nq)

    for (outDim <- Seq(8, 16, 32, 48)) {
      val t0 = System.nanoTime()
      val r = meanRecall(graft.llm.SimSearch.knnRp(qs, e, "vec_id",
        "vec_id", "embedding", k = 5, outDim = outDim))
      println(f"[rp] brute outDim=$outDim%2d recall@5=$r%.3f " +
        f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    for (pfx <- Seq(8, 16, 32); sl <- Seq(25, 50, 100)) {
      val t0 = System.nanoTime()
      val r = meanRecall(graft.llm.SimSearch.knnPrefixRerank(qs, e,
        "vec_id", "vec_id", "embedding", k = 5, prefixDims = pfx,
        shortlist = sl))
      println(f"[rp] prefix pfx=$pfx%2d shortlist=$sl%3d " +
        f"recall@5=$r%.3f (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    spark.stop()
  }
}
