package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the Ranks two-pass distributed rank — not part
  * of the library surface; run with
  * `SPARK_GRAFT_SF_DIR=/tmp/graft_x10 runMain graft.tools.ProfileRank`.
  * Times the q152 dsir pipeline stage by stage: the scored-audit frame
  * materialization, the quantile probe, the count pass, and the final
  * ranked sort — to attribute any decade regression to a stage. */
object ProfileRank {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_x10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[rank] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val tier = regexp_extract($"source", "src([0-9]+)", 1)
      .cast("long") % 4
    val lab = graft.ops.Tables.documents(spark, sfDir)
      .withColumn("is_target", tier === 3)
    val (rawDf, targetDf) = (lab.filter(!$"is_target"),
      lab.filter($"is_target"))

    // replicate dsirSelect's scoring stages
    def feats(df: org.apache.spark.sql.DataFrame) = df
      .select($"doc_id",
        explode(graft.llm.TextOps.adjacentBigrams(
          graft.llm.TextOps.tokens($"text"))).as("bigram"))
      .select($"doc_id",
        (conv(substring(md5($"bigram"), 1, 15), 16, 10).cast("long")
          % 4096).as("bucket"))
      .groupBy($"doc_id", $"bucket").agg(count(lit(1)).as("occ"))
    val raw = feats(rawDf)
    val rc = raw.groupBy($"bucket").agg(sum($"occ").as("rc"))
    val tc = feats(targetDf).groupBy($"bucket").agg(sum($"occ").as("tc"))
    val w = rc.join(tc, Seq("bucket"), "left")
      .select($"bucket",
        expr("(10000 * (coalesce(tc, 0) + 1)) DIV (rc + 1)").as("w_bp"))
    val scored = raw.join(broadcast(w), "bucket")
      .groupBy($"doc_id")
      .agg(sum($"occ").as("n_feats"), sum($"occ" * $"w_bp").as("score"))
    val audit = rawDf.select($"doc_id")
      .join(scored, Seq("doc_id"), "left")
      .withColumn("n_feats", coalesce($"n_feats", lit(0L)))
      .withColumn("score", coalesce($"score", lit(0L)))

    val keyed = time("audit materialize (localCheckpoint)") {
      audit.withColumn("__rk", (-$"score").cast("double")).localCheckpoint()
    }
    val splits = time("approxQuantile") {
      keyed.stat.approxQuantile("__rk",
        (1 until 64).map(_.toDouble / 64).toArray, 0.005)
    }
    println(s"[rank] distinct splits: ${splits.distinct.length}")
    val bucket = splits.distinct.sorted.foldLeft(lit(0)) { (acc, s) =>
      acc + when($"__rk" > lit(s), 1).otherwise(0)
    }
    time("range counts collect") {
      keyed.groupBy(bucket.as("__bkt")).agg(count(lit(1))).collect()
    }
    time("final rank + sort") {
      import org.apache.spark.sql.expressions.Window
      keyed.withColumn("__bkt", bucket)
        .withColumn("rank", row_number().over(
          Window.partitionBy($"__bkt")
            .orderBy($"score".desc, $"doc_id")))
        .orderBy($"doc_id").write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
