package graft.pipeline

import org.apache.spark.sql.{SparkSession, functions => F}

import graft.ml.{Centroids, DenStream, Embed}
import graft.state.ModelStore

/** CLI entry points mirroring the reference's scripts (SURVEY.md §3):
  *
  *   train       — run_training_batch.py: bounded ordered sample → fit →
  *                 persist state blue/green → write enriched embeddings
  *   incremental — run_incremental_batch.py: load state, score an id
  *                 range, write enriched rows + volume history + incidents
  *
  * Usage:
  *   runMain graft.pipeline.PipelineRunner train <sfDir> <stateDir> <outDir>
  *   runMain graft.pipeline.PipelineRunner incremental <sfDir> <stateDir>
  *     <outDir> <loId> <hiId>
  */
object PipelineRunner {

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try mode match {
      case "train" => train(spark, args(1), args(2), args(3))
      case "incremental" =>
        incremental(spark, args(1), args(2), args(3),
          args(4).toLong, args(5).toLong)
      case other => sys.error(s"unknown mode: $other")
    } finally spark.stop()
  }

  /** §3.2: train + blue/green publish + bulk enriched write (the
    * reference's CSV-staging-then-one-transaction, as a single parquet
    * write). */
  def train(spark: SparkSession, sfDir: String, stateDir: String,
      outDir: String): Unit = {
    val (enriched, model) = Enrich.trainingBatch(spark, sfDir)
    // persist model state (A12) with blue/green swap (A13); centroids fit
    // from the SAME cached embedded frame the model trained on — no
    // re-embedding, no drift between persisted state and fitted model
    ModelStore.save(DenStream.stateDF(spark, model), stateDir, "denstream")
    ModelStore.save(
      Centroids.fitCentroids(enriched, "log_id", "embedding",
        Enrich.DefaultSemThreshold),
      stateDir, "centroids")
    // log_embeddings-analog sink: one set-oriented write (A5 bulk form)
    enriched
      .withColumn("embedding", F.col("embedding").cast("array<float>"))
      .write.mode("overwrite").parquet(s"$outDir/log_embeddings")
    println(s"[train] micro-clusters=${model.clusters.length} " +
      s"rows=${enriched.count()}")
  }

  /** §3.1: inference-only scoring of [lo, hi] + volume history append +
    * incident merge + batch commit marker. */
  def incremental(spark: SparkSession, sfDir: String, stateDir: String,
      outDir: String, lo: Long, hi: Long): Unit = {
    // hyperparameters come from the persisted state itself — inference
    // can never drift from the trained epsilon (args are only fallback)
    val model = DenStream.fromStateDF(
      ModelStore.load(spark, stateDir, "denstream"))
    val centroids = ModelStore.load(spark, stateDir, "centroids").collect()
      .map(r => Centroids.Centroid(r.getString(0),
        r.getSeq[Float](1).toArray, r.getLong(2)))
    val enriched = Enrich.incrementalBatch(spark, sfDir, model, centroids,
      lo, hi)
    enriched.cache() // consumed by three actions: write, counts, count()
    enriched
      .withColumn("embedding", F.col("embedding").cast("array<float>"))
      .write.mode("overwrite").parquet(s"$outDir/log_embeddings_incr")

    // volume history append with ingest timestamp (A7)
    val counts = enriched.filter(F.col("cluster_id") >= 0)
      .groupBy("cluster_id")
      .agg(F.count(F.lit(1)).as("log_count"))
      .withColumn("batch_timestamp", F.current_timestamp())
    counts.write.mode("append").parquet(s"$outDir/cluster_volume_history")

    // incidents over the full history (E1 last-5 window feeds features)
    val history = spark.read.parquet(s"$outDir/cluster_volume_history")
      .withColumn("batch_ts", F.unix_micros(F.col("batch_timestamp")))
      .select("cluster_id", "batch_ts", "log_count")
    val feats = graft.ml.VolumeAnomaly.features(history)
    val flagged = graft.ml.VolumeAnomaly.rankAnomalies(feats)
    // absent table = no open incidents; any other read failure propagates
    // (a corrupt incidents table must not silently become "create all")
    val open =
      if (java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$outDir/incidents")))
        spark.read.parquet(s"$outDir/incidents")
          .filter(F.col("status").isin("NEW", "OPEN"))
          .select("cluster_id").distinct()
      else flagged.select("cluster_id").limit(0)
    val incidents = graft.ml.VolumeAnomaly.mergeIncidents(flagged, open)
      .withColumn("created_at", F.current_timestamp())
    incidents.write.mode("append").parquet(s"$outDir/incidents")

    // batch commit marker (A9/I1)
    spark.createDataFrame(Seq((lo, hi, "COMPLETED")))
      .toDF("start_id", "end_id", "status")
      .withColumn("last_processed_timestamp", F.current_timestamp())
      .write.mode("append").parquet(s"$outDir/batch_order")
    println(s"[incremental] range=[$lo,$hi] rows=${enriched.count()} " +
      s"incidents=${incidents.count()}")
    enriched.unpersist()
  }
}
