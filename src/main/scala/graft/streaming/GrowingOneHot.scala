package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.state.ModelStore

/** Growing-category one-hot encoding across micro-batches (reference D12:
  * river OneHotEncoder, `src/ml/pipeline.py:34-37` — the encoder's column
  * set grows as new categories arrive and already-assigned indexes never
  * move).
  *
  * The category dictionary is a state table `(cat, idx)` maintained by
  * foreachBatch union-distinct: each batch's unseen categories append with
  * the next free indexes (published via [[ModelStore]] blue/green, so a
  * crash mid-update cannot corrupt the dictionary), then the batch encodes
  * against the updated dictionary — vectors WIDEN over the stream's
  * lifetime while existing indexes stay stable. Within one batch, new
  * categories index in lexical order (micro-batch granularity is the
  * stream analog of river's per-row encounter order). The batch-query twin
  * with first-seen ordering is q75 (ops/Relational2).
  *
  * Scale: the dictionary is category-cardinality-sized (driver-safe by
  * definition of one-hot — a high-cardinality column must hash-encode
  * instead), and encoding broadcasts it; the data path stays fully
  * distributed with no extra shuffle.
  */
object GrowingOneHot {

  val dictName = "onehot_dict"

  /** Load dictionary state; empty on a fresh stream (no state published
    * yet) — any other read failure propagates. */
  def loadDict(spark: SparkSession, stateRoot: String): Map[String, Int] =
    if (!Files.exists(Paths.get(stateRoot, dictName)) &&
        !Files.exists(Paths.get(stateRoot, s"${dictName}_backup")))
      Map.empty
    else
      ModelStore.load(spark, stateRoot, dictName)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap

  /** Ceiling on dictionary size: one-hot is only meaningful for low-
    * cardinality columns (level/source-like); a message-like column must
    * hash-encode instead, and this guard makes that misuse fail loudly
    * instead of collecting an unbounded dictionary to the driver. */
  val defaultMaxCategories = 10000

  /** Union-distinct the batch's categories into the persisted dictionary;
    * returns the updated dictionary. Fails if the grown dictionary would
    * exceed `maxCategories` (the limit+1 fetch bounds the collect itself,
    * so even the failing path never pulls an unbounded set driver-side). */
  def updateDict(batch: DataFrame, catCol: String, stateRoot: String,
      maxCategories: Int = defaultMaxCategories): Map[String, Int] = {
    val spark = batch.sparkSession
    import spark.implicits._
    val existing = loadDict(spark, stateRoot)
    val seen = batch.select(col(catCol).cast("string")).distinct()
      .limit(maxCategories + 1)
      .collect().map(_.getString(0)).filter(_ != null)
    val fresh = seen.filterNot(existing.contains).sorted
    require(existing.size + fresh.length <= maxCategories,
      s"growing one-hot: column '$catCol' would exceed $maxCategories " +
        s"categories (${existing.size} existing + >=${fresh.length} new) — " +
        "one-hot is for low-cardinality columns; hash-encode instead")
    if (fresh.isEmpty) existing
    else {
      val updated = existing ++
        fresh.zipWithIndex.map { case (c, i) => c -> (existing.size + i) }
      ModelStore.save(updated.toSeq.toDF("cat", "idx"), stateRoot, dictName)
      updated
    }
  }

  /** Encode `catCol` against a dictionary: vector width = dict size,
    * position = the category's stable index. */
  def encode(df: DataFrame, catCol: String,
      dict: Map[String, Int]): DataFrame = {
    require(dict.nonEmpty, "growing one-hot: empty dictionary")
    val m = typedlit(dict)
    df.withColumn("onehot",
      transform(sequence(lit(0), lit(dict.size - 1)),
        i => when(i === element_at(m, col(catCol).cast("string")), 1)
          .otherwise(0)))
  }

  /** Stream runner: per micro-batch, grow the dictionary then write the
    * encoded rows (onehot serialized as JSON so sinks/oracles can compare
    * it without array-typed columns). Each batch writes to its own
    * `batch=<id>` partition with overwrite, so a replayed micro-batch
    * rewrites — not duplicates — its output (same idempotence class as
    * the dictionary's blue/green publish). With an all-null or empty
    * first batch the dictionary can still be empty — those rows are
    * emitted with a zero-width "[]" vector rather than silently dropped
    * (river: no categories seen yet means no columns). */
  def run(source: DataFrame, catCol: String, stateRoot: String,
      outPath: String): StreamingQuery =
    source.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val dict = updateDict(batch, catCol, stateRoot)
        val encoded =
          if (dict.nonEmpty)
            encode(batch, catCol, dict)
              .withColumn("onehot", to_json(col("onehot")))
          else batch.withColumn("onehot", lit("[]"))
        encoded.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
        ()
      }
      .start()
}
