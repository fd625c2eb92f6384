package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{DenStream, Embed, Quality}
import graft.pipeline.Enrich

/** One-off calibration probe (kept as documentation of how epsilon /
  * semantic threshold were chosen for the hashing embedder — SURVEY.md
  * §7.4 risk 3). Ignored in normal runs; un-ignore to re-tune. */
class CalibrateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  ignore("epsilon sweep: homogeneity of DenStream clusters vs event_type") {
    import spark.implicits._
    val logs = Enrich.logView(spark, "/root/testdata/sf0.001")
      .filter($"level".isin("warning", "error"))
      .orderBy($"log_id").limit(1000)
      .withColumn("embed_text",
        concat($"message", lit(". Parsed: "), $"parsed_data"))
    val emb = Embed.withEmbedding(logs, "embed_text").cache()
    for (eps <- Seq(0.3, 0.5, 0.7, 0.8, 0.9, 1.0, 1.1, 1.2)) {
      val m = DenStream.fit(emb, "log_id", "embedding", eps)
      val pred = DenStream.withPredictions(emb, m, "embedding")
      val nClusters = m.clusters.length
      val h = Quality.homogeneityCompleteness(
        pred.filter($"cluster_id" >= 0), "event_type", "cluster_id")
        .collect()(0)
      println(f"eps=$eps%.2f clusters=$nClusters " +
        f"homog=${h.getDouble(0)}%.3f compl=${h.getDouble(1)}%.3f")
    }
  }
}
