package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.PipelineRunner

/** End-to-end entry-point coverage: the train → incremental CLI cycle
  * produces all reference-analog sink tables with committed batches.
  */
class RunnerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("train then two incremental batches fill all sink tables") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-run").toString
    PipelineRunner.train(spark, sf, s"$tmp/state", s"$tmp/out")
    PipelineRunner.incremental(spark, sf, s"$tmp/state", s"$tmp/out",
      400, 699)
    PipelineRunner.incremental(spark, sf, s"$tmp/state", s"$tmp/out",
      700, 999)

    val emb = spark.read.parquet(s"$tmp/out/log_embeddings")
    assert(emb.count() > 0)
    assert(emb.columns.contains("cluster_id") &&
      emb.columns.contains("semantic_group") &&
      emb.columns.contains("embedding"))

    val hist = spark.read.parquet(s"$tmp/out/cluster_volume_history")
    assert(hist.count() > 0)
    assert(hist.columns.sorted
      .sameElements(Array("batch_timestamp", "cluster_id", "log_count")))

    val order = spark.read.parquet(s"$tmp/out/batch_order")
    assert(order.count() == 2)
    assert(order.collect().forall(_.getAs[String]("status") == "COMPLETED"))

    // incidents table exists (may be empty when the guard trips)
    val inc = spark.read.parquet(s"$tmp/out/incidents")
    assert(inc.columns.contains("action") && inc.columns.contains("status"))
  }
}
