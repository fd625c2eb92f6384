package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines (north-star
  * extension). Media payloads are opaque `binary` columns with a typed
  * metadata struct; decode/feature-extract/resize/frame-sample run as
  * partition-local transforms over the bytes.
  *
  * IMPORTANT — decode is STUBBED: no image/audio codecs exist in this
  * container, so `extractFeatures`/`resizeStub` apply a deterministic fake
  * transform (byte histogram / byte truncation) in place of a real decoder.
  * The Spark-side contract — schema, binary column handling, batch shape,
  * partition-local execution — is real and is what these tests exercise.
  * In PySpark the same seam would be `mapInPandas` batches; the JVM analog
  * used here is a codegen'd expression over BinaryType / an explode of
  * fixed-offset slices.
  */
object Multimodal {

  /** Synthesize a media table from `documents`: payload = utf-8 bytes of
    * the text, kind cycles image/audio/video, metadata struct typed. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = graft.ops.Tables.documents(spark, sfDir)
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").cast("binary").as("payload"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        // byte length of the PAYLOAD, not the character count — they
        // differ for any non-ASCII text
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
        col("source").as("origin")).as("meta"))
  }

  /** The one stubbed "decode": 16-bin byte-count histogram (high nibble).
    * Shared by the per-row and batched paths so the stub cannot diverge.
    * Counts, not normalized ratios, deliberately: integer-exact, so the
    * whole multimodal extract is DuckDB-oracle-checkable (q50) instead of
    * trusting float formatting parity. */
  private[llm] def byteHistogram(bytes: Array[Byte]): Array[Int] = {
    val h = new Array[Int](16)
    if (bytes != null) bytes.foreach(b => h((b & 0xFF) >> 4) += 1)
    h
  }

  /** STUB decode → byte histogram as the "feature vector". Real decoders
    * plug in at this exact seam (binary in, fixed-width array out,
    * partition-local). */
  def extractFeatures(df: DataFrame, payloadCol: String = "payload",
      out: String = "features"): DataFrame = {
    val f = udf((bytes: Array[Byte]) => byteHistogram(bytes))
    df.withColumn(out, f(col(payloadCol)))
  }

  /** Partition-batched variant of [[extractFeatures]]: rows flow through
    * `mapPartitions` in fixed-size chunks (64 — the reference's GPU batch
    * size, run_training_batch.py:57-61), the JVM analog of `mapInPandas`
    * batch shape. A real decoder would initialize once per partition
    * (before the iterator) and process each chunk as one batch call. */
  def extractFeaturesBatched(df: DataFrame, idCol: String = "media_id",
      payloadCol: String = "payload", batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // <- per-partition decoder init would go here (once, not per row)
        rows.grouped(batchSize).flatMap { batch =>
          // <- one batched "decode" call per chunk (STUB: byte histogram)
          batch.iterator.map { case (id, bytes) =>
            (id, byteHistogram(bytes))
          }
        }
      }
      .toDF(idCol, "features")
  }

  /** STUB resize: truncate/pad payload to `size` bytes (stands in for a
    * real resample; keeps the binary-in/binary-out contract). */
  def resizeStub(df: DataFrame, size: Int,
      payloadCol: String = "payload"): DataFrame = {
    val f = udf { (bytes: Array[Byte]) =>
      val out = new Array[Byte](size)
      if (bytes != null)
        System.arraycopy(bytes, 0, out, 0, math.min(bytes.length, size))
      out
    }
    df.withColumn("resized", f(col(payloadCol)))
  }

  /** Frame sampling: split the payload into `n` fixed-offset chunks and
    * explode to one row per frame — the row-multiplying shape a video
    * pipeline needs (frame_id ordering deterministic). */
  def frameSample(df: DataFrame, n: Int,
      payloadCol: String = "payload"): DataFrame = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null || bytes.isEmpty) Seq.empty[Array[Byte]]
      else {
        val step = math.max(1, bytes.length / n)
        (0 until math.min(n, bytes.length))
          .map(i => bytes.slice(i * step, math.min(i * step + step, bytes.length)))
      }
    }
    df.select(col("*"), posexplode(f(col(payloadCol))))
      .withColumnRenamed("pos", "frame_id")
      .withColumnRenamed("col", "frame_bytes")
      .withColumn("frame_hash", md5(col("frame_bytes")))
      .drop(payloadCol)
  }
}
