package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.{Centroids, DenStream, Embed, VolumeAnomaly}
import graft.ops.Tables

/** End-to-end enrichment pipelines — the engine's equivalents of the
  * reference entry points (`scripts/run_incremental_batch.py`,
  * `scripts/run_training_batch.py`; lifecycle in SURVEY.md §3).
  *
  * The `events` fixture stands in for the `logs` table via [[logView]]:
  * event_type maps onto `level`-like severity, `props` onto `parsed_data`,
  * and `message` is synthesized the way the reference synthesizes embedding
  * text (`f"{message}. Parsed: {parsed_data}"`,
  * run_incremental_batch.py:77).
  */
object Enrich {

  /** Calibrated defaults (CalibrateSpec; hashing-embedder space). */
  val DefaultLimit = 5000
  val DefaultEpsilon = 1.0
  val DefaultSemThreshold = 1.8

  /** Log-shaped view of events (SURVEY.md §7.2 step 3 recast). */
  def logView(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir).select(
      col("event_id").as("log_id"),
      col("ts"),
      when(col("event_type") === "error", "error")
        .when(col("event_type").isin("signup", "purchase"), "warning")
        .otherwise("info").as("level"),
      concat(lit("svc_"), pmod(col("user_id"), lit(5))).as("source"),
      concat(col("event_type"), lit(" user="), col("user_id")).as("message"),
      col("props").as("parsed_data"),
      col("event_type"))

  /** Embedding text exactly as the reference composes it (H2). */
  private def withText(logs: DataFrame): DataFrame =
    logs.withColumn("embed_text",
      concat(col("message"), lit(". Parsed: "), col("parsed_data")))

  /** Training batch (§3.2): bounded ordered sample → embed → semantic
    * grouping → DenStream fit → distributed predict; returns the enriched
    * frame plus the fitted model for state persistence. */
  def trainingBatch(spark: SparkSession, sfDir: String,
      limit: Int = DefaultLimit, epsilon: Double = DefaultEpsilon,
      semThreshold: Double = DefaultSemThreshold): (DataFrame, DenStream.Model) = {
    // epsilon/semThreshold are calibrated for the hashing-embedder space
    // (CalibrateSpec sweep: eps=1.0 → homogeneity .99 vs event_type); the
    // reference's 0.9 / 0.35 are MiniLM-space values (model.py:10-15,
    // run_incremental_batch.py:49) and do not transfer (SURVEY §7.4 r3).
    val logs = logView(spark, sfDir)
      .filter(col("level").isin("warning", "error"))
      .orderBy("log_id")
      .limit(limit)
    val embedded = Embed.withEmbedding(withText(logs), "embed_text")
    embedded.cache()
    val sem = Centroids.assign(embedded, "log_id", "embedding", semThreshold)
    val model = DenStream.fit(embedded, "log_id", "embedding", epsilon)
    val enriched = DenStream
      .withPredictions(embedded, model, "embedding")
      .join(sem, Seq("log_id"), "left")
    (enriched.drop("embed_text"), model)
  }

  /** Incremental batch (§3.1): score a [lo, hi] id range with a frozen
    * model — inference only (the incremental path never learns,
    * SURVEY.md §3.1 note). */
  def incrementalBatch(spark: SparkSession, sfDir: String,
      model: DenStream.Model, centroids: Array[Centroids.Centroid],
      lo: Long, hi: Long,
      semThreshold: Double = DefaultSemThreshold): DataFrame = {
    val logs = logView(spark, sfDir)
      .filter(col("log_id").between(lo, hi) &&
        col("level").isin("warning", "error"))
    val embedded = Embed.withEmbedding(withText(logs), "embed_text")
    val withSem = Centroids.scoreAgainst(embedded, centroids,
      "embedding", semThreshold)
    DenStream.withPredictions(withSem, model, "embedding")
      .drop("embed_text")
  }

  /** Incident detection over an enriched frame (§3.1 tail): per-cluster
    * hourly volume → features → batch-relative ranking → incident rows. */
  def detectIncidents(enriched: DataFrame,
      openIncidents: DataFrame): DataFrame = {
    val counts = enriched
      .filter(col("cluster_id") >= 0)
      .groupBy(col("cluster_id"),
        unix_micros(date_trunc("hour", col("ts"))).as("batch_ts"))
      .agg(count(lit(1)).as("log_count"))
    val feats = VolumeAnomaly.features(counts)
    val flagged = VolumeAnomaly.rankAnomalies(feats)
    VolumeAnomaly.mergeIncidents(flagged, openIncidents)
  }
}
