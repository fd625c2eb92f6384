package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch m/ksub tuning sweep for the PQ family (q148/q149/q150,
  * evaluated by q189) — not part of the library surface; run with
  * `SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfilePqRecall`.
  * For each (m, ksub) grid point: fit codebooks on the same vec_id%10
  * sample q148 uses, encode, brute-ADC top-5 for queries vec_id<10,
  * and report mean recall@5 vs the exact float-L2 top-5 (plus the
  * rerank recall at shortlist=100) — the table BASELINE.md records so
  * the 2-bytes-per-vector tradeoff is a measured decision. */
object ProfilePqRecall {
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
    val n = e.count()
    val nSample = e.filter(pmod($"vec_id", lit(10)) === 0).count()
    println(s"[pq] corpus=$n sample=$nSample sf=$sfDir")
    val qs = e.filter($"vec_id" < 10)
    // SAME ground truth as the shipped q189 eval — shared definition
    val exact = graft.llm.SimSearch.knnBruteL2Fp(qs, e, "vec_id",
      "vec_id", "embedding", k = 5).select($"qid", $"cid").cache()
    val nq = exact.select($"qid").distinct().count()

    def meanRecall(approx: org.apache.spark.sql.DataFrame): Double = {
      val hit = exact.join(approx.select($"qid", $"cid"),
        Seq("qid", "cid")).count()
      hit.toDouble / (5.0 * nq)
    }

    for (m <- Seq(2, 4, 8, 16); ksub <- Seq(16, 32, 64)
         if nSample >= ksub) {
      val sample = e.filter(pmod($"vec_id", lit(10)) === 0)
      val t0 = System.nanoTime()
      val cbs = graft.llm.Pq.fitCodebooks(sample, "vec_id", "embedding",
        dim = 64, m = m, ksub = ksub)
      val codes = graft.llm.Pq.encode(e, "vec_id", "embedding", cbs)
        .cache()
      codes.count()
      val adc = meanRecall(graft.llm.Pq.adcSearch(qs, codes, "vec_id",
        "embedding", cbs, k = 5))
      val rr = meanRecall(graft.llm.Pq.adcRerank(qs, codes, e, "vec_id",
        "embedding", cbs, k = 5, shortlist = 100))
      val sec = (System.nanoTime() - t0) / 1e9
      val bytes = m * (if (ksub <= 16) 0.5 else 1.0)
      println(f"[pq] m=$m%2d ksub=$ksub%2d bytes/vec=$bytes%4.1f " +
        f"adc_recall@5=$adc%.3f rerank100_recall@5=$rr%.3f ($sec%.1f s)")
      codes.unpersist()
    }
    spark.stop()
  }
}
