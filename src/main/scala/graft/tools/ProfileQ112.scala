package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-by-stage profiler for q112 (IVF-SQ kNN) — not part of
  * the library surface; run with
  * `SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileQ112`.
  * Splits fit / assign / assign+quantize / full knn so the ×100 decade
  * can be attributed before optimizing. */
object ProfileQ112 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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

    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    for (pass <- 1 to 2) {
      println(s"[prof] ---- pass $pass ----")
      val e = graft.ops.Tables.embeddings(spark, sfDir)
      time("embeddings count")(e.count())
      val sample = e.filter(pmod($"vec_id", lit(10)) === 0)
      val cents = time("fitCentroids(sample)") {
        val c = graft.llm.Ivf.fitCentroids(sample, "vec_id", "embedding",
          nlist = 16)
        c.collect(); c
      }
      val idx0 = graft.llm.Ivf.assignIndex(e, "vec_id", "embedding", cents)
      time("assign only (count)")(idx0.count())
      val idx = graft.llm.Quantize.withInt8(idx0, "v")
      time("assign+quantize (count)")(idx.count())
      time("assign+quantize narrow agg") {
        idx.agg(sum($"qnorm"), sum($"list_id")).collect()
      }
      val knn = graft.llm.Ivf.knnQuantized(e.filter($"vec_id" < 10), idx,
        cents, "vec_id", "embedding", k = 5, nprobe = 4)
      time("full knnQuantized")(knn.count())
      val cand = idx.withColumnRenamed("id", "cid")
        .filter($"qnorm" > 0)
        .join(broadcast(
          graft.llm.Quantize.withInt8(
              e.filter($"vec_id" < 10).select($"vec_id".as("qid"),
                $"embedding".cast("array<double>").as("qv")),
              "qv", qCol = "qq", normCol = "qqn")
            .filter($"qqn" > 0)
            .crossJoin(broadcast(cents))
            .withColumn("cd", graft.ml.Distance.sqEuclidean($"qv", $"c"))
            .withColumn("pr", row_number().over(
              org.apache.spark.sql.expressions.Window.partitionBy($"qid")
                .orderBy($"cd", $"list_id")))
            .filter($"pr" <= 4)
            .select($"qid", $"qq", $"qqn", $"list_id")), "list_id")
        .filter($"cid" =!= $"qid")
      time("candidates only (count)")(cand.count())
      val probesDf = graft.llm.Quantize.withInt8(
          e.filter($"vec_id" < 10).select($"vec_id".as("qid"),
            $"embedding".cast("array<double>").as("qv")),
          "qv", qCol = "qq", normCol = "qqn")
        .filter($"qqn" > 0)
        .crossJoin(broadcast(cents))
        .withColumn("cd", graft.ml.Distance.sqEuclidean($"qv", $"c"))
        .withColumn("pr", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy($"qid")
            .orderBy($"cd", $"list_id")))
        .filter($"pr" <= 4)
        .select($"qid", $"qq", $"qqn", $"list_id")
      val narrow = idx.select($"id".as("cid"), $"list_id", $"qvec",
        $"qnorm")
      time("narrow index count")(narrow.count())
      val candN = narrow.filter($"qnorm" > 0)
        .join(broadcast(probesDf), "list_id")
        .filter($"cid" =!= $"qid")
      time("narrow candidates (count)")(candN.count())
      val ck = time("narrow localCheckpoint")(narrow.localCheckpoint())
      val candCk = ck.filter($"qnorm" > 0)
        .join(broadcast(probesDf), "list_id")
        .filter($"cid" =!= $"qid")
      time("checkpointed cand (count)")(candCk.count())
      time("candidates + dot (agg)") {
        cand.withColumn("dot_q",
            graft.functions.VectorExprs.dotLong($"qvec", $"qq"))
          .agg(sum($"dot_q")).collect()
      }
    }
    spark.stop()
  }
}
