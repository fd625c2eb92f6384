package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-cluster volume time-series features + batch-relative anomaly
  * ranking (reference `src/ml/volume_analyzer.py`).
  *
  * Feature semantics (volume_analyzer.py:40-73, last-5 window per cluster):
  *   current   = last count
  *   velocity  = last − previous
  *   roll_mean = mean of visible window
  *   z_dev     = (last − roll_mean) / (roll_std + 1e-5)
  *
  * Scoring: the reference fits an IsolationForest and then *only* consumes
  * its scores through a batch-relative z-threshold (flag z < −1, cap 3,
  * skip if >30% flagged — volume_analyzer.py:125-156, incident_ops.py:87-97).
  * The engine's score is −|z_dev| (lower = more anomalous, same ordering
  * contract), which passes the identical gate without a driver-side forest
  * — a pure shuffle-once DataFrame plan (SURVEY.md §7.3 justification).
  */
object VolumeAnomaly {

  /** counts: (cluster_id, batch_ts, log_count) — one row per cluster per
    * batch. Returns latest-batch features per cluster. */
  def features(counts: DataFrame, windowSize: Int = 5): DataFrame = {
    val byCluster = Window.partitionBy("cluster_id").orderBy("batch_ts")
    val lastN = byCluster.rowsBetween(-(windowSize - 1), 0)
    counts
      .withColumn("velocity",
        col("log_count") - lag("log_count", 1).over(byCluster))
      .withColumn("roll_mean", avg("log_count").over(lastN))
      .withColumn("roll_std", stddev_pop("log_count").over(lastN))
      .withColumn("z_dev",
        (col("log_count") - col("roll_mean")) / (col("roll_std") + lit(1e-5)))
      .withColumn("rn",
        row_number().over(Window.partitionBy("cluster_id")
          .orderBy(col("batch_ts").desc)))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("batch_ts"), col("log_count"),
        coalesce(col("velocity"), lit(0L)).as("velocity"),
        col("roll_mean"), col("roll_std"), col("z_dev"))
  }

  /** All clusters with score = −|z_dev| and batch-relative score_z
    * (volume_analyzer.py:125-139 before thresholding). `zdevRound`
    * stabilizes the flag set for oracle-differential comparison. */
  def scoredFeatures(feats: DataFrame,
      zdevRound: Option[Int] = None): DataFrame = {
    val zdev = zdevRound.map(sc => round(col("z_dev"), sc))
      .getOrElse(col("z_dev"))
    // the batch stats aggregate AND the main side both consume `scored`
    // — lazy checkpoint so the window pipeline upstream materializes
    // once (per-cluster rows, tiny) instead of twice
    val scored = feats.withColumn("score", -abs(zdev)).localCheckpoint(false)
    val stats = scored.agg(
      avg("score").as("mu"), stddev_pop("score").as("sigma"),
      count(lit(1)).as("n_eval"))
    scored.crossJoin(stats)
      .withColumn("score_z",
        (col("score") - col("mu")) / (col("sigma") + lit(1e-5)))
  }

  /** Batch-relative ranking: flag score-z < zThresh; guard if
    * flagged/evaluated > maxRatio; keep worst `cap`. */
  def rankAnomalies(feats: DataFrame, zThresh: Double = -1.0,
      cap: Int = 3, maxRatio: Double = 0.3,
      zdevRound: Option[Int] = None): DataFrame = {
    val flagged = scoredFeatures(feats, zdevRound)
      .filter(col("score_z") < zThresh)
      .withColumn("n_flagged", count(lit(1)).over(Window.partitionBy()))
      // J6 sanity guard: >30% flagged ⇒ assume miscalibration, emit none
      .filter(col("n_flagged") <= col("n_eval") * maxRatio)
      .orderBy(col("score"), col("cluster_id"))
      .limit(cap)
    flagged.select("cluster_id", "batch_ts", "log_count", "score", "score_z")
  }

  /** [[rankAnomalies]] with the reference's actual model: an
    * IsolationForest (volume_analyzer.py:19-24 — 100 trees, contamination
    * 0.05, seed 42) fit on the per-cluster feature matrix, scores consumed
    * through the identical batch-relative z-gate. The fit input is at most
    * one row per cluster (driver-scale by construction — guarded), scoring
    * distributes via a broadcast model. Engine score = −IF score so lower
    * = more anomalous, matching [[scoredFeatures]]'s ordering contract. */
  def rankAnomaliesIF(feats: DataFrame, zThresh: Double = -1.0,
      cap: Int = 3, maxRatio: Double = 0.3, nTrees: Int = 100,
      seed: Long = 42L, contamination: Double = 0.05): DataFrame = {
    val spark = feats.sparkSession
    // the fit's collect AND the scoring pass both consume feats — lazy
    // checkpoint so the collect materializes it once and scoring reuses
    // the cached partitions instead of recomputing the window pipeline
    val f = feats.localCheckpoint(false)
    val collected = f.select(
      col("log_count").cast("double"), col("velocity").cast("double"),
      col("roll_mean"), col("z_dev")).collect()
    // empty input → empty ranking, matching rankAnomalies (fit would throw)
    if (collected.isEmpty)
      return f
        .withColumn("score", lit(0.0)).withColumn("score_z", lit(0.0))
        .select("cluster_id", "batch_ts", "log_count", "score", "score_z")
        .limit(0)
    // the reference trains on the latest-batch per-cluster matrix — tiny.
    // Fail loudly if a caller hands this a row-scale frame: the fit is
    // driver-side by design and must never see table-sized input.
    require(collected.length <= 100000,
      s"rankAnomaliesIF fit input has ${collected.length} rows — this is " +
        "a per-cluster (driver-scale) model; aggregate first")
    val data = collected.map(r =>
      Array(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val model = IsolationForest.fit(data, nTrees, seed,
      sampleSize = 256, contamination = contamination)
    val bc = spark.sparkContext.broadcast(model)
    val scoreUdf = udf((lc: Double, v: Double, rm: Double, zd: Double) =>
      -IsolationForest.score(bc.value, Array(lc, v, rm, zd)))
    val scored = f.withColumn("score",
      scoreUdf(col("log_count").cast("double"),
        col("velocity").cast("double"), col("roll_mean"), col("z_dev")))
    val stats = scored.agg(
      avg("score").as("mu"), stddev_pop("score").as("sigma"),
      count(lit(1)).as("n_eval"))
    scored.crossJoin(stats)
      .withColumn("score_z",
        (col("score") - col("mu")) / (col("sigma") + lit(1e-5)))
      .filter(col("score_z") < zThresh)
      .withColumn("n_flagged", count(lit(1)).over(Window.partitionBy()))
      .filter(col("n_flagged") <= col("n_eval") * maxRatio)
      .orderBy(col("score"), col("cluster_id"))
      .limit(cap)
      .select("cluster_id", "batch_ts", "log_count", "score", "score_z")
  }

  /** Incident merge (reference A8/C2, incident_ops.py:6-41): split flagged
    * clusters into refresh (already open) vs create (new), one set-oriented
    * pass replacing the per-key existence probes. */
  def mergeIncidents(flagged: DataFrame, openIncidents: DataFrame): DataFrame =
    // one pass: a semi/anti split would scan flagged's whole upstream
    // scoring pipeline twice; a left join with a presence marker computes
    // the same refresh-vs-create decision in a single scan
    flagged.join(
        openIncidents.select(col("cluster_id")).distinct()
          .withColumn("is_open", lit(true)),
        Seq("cluster_id"), "left")
      .select(col("cluster_id"),
        when(col("is_open"), lit("refresh")).otherwise(lit("create"))
          .as("action"),
        lit("NEW").as("status"), lit("SRE").as("assigned_role"))
}
