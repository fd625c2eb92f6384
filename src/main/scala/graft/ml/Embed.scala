package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** Deterministic feature-hashing text embedder.
  *
  * The reference embeds with `SentenceTransformer('all-MiniLM-L6-v2')`
  * (`src/ml/pipeline.py:4-9`; GPU-batched variant
  * `scripts/run_training_batch.py:41-73`). No pretrained transformer is
  * available offline/JVM, so this is the public-knowledge hashing trick
  * (Weinberger et al. 2009): tokens + token bigrams hashed into `dim`
  * buckets with a sign hash, then L2-normalized. Properties the pipeline
  * relies on — deterministic, order-insensitive at the bag level, similar
  * texts ⇒ nearby vectors — hold; absolute distances differ from MiniLM,
  * so thresholds are recalibrated against the embeddings fixture
  * (SURVEY.md §7.4 risk 3).
  */
object Embed {
  val DefaultDim = 64 // matches /root/testdata embeddings fixture width

  def tokenize(text: String): Array[String] =
    text.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)

  /** Hash a token stream (unigrams + bigrams) into a dense L2-normalized
    * vector. Pure function of the text — no global state, no RNG. */
  def embed(text: String, dim: Int = DefaultDim): Array[Float] = {
    val v = new Array[Float](dim)
    val toks = tokenize(text)
    var i = 0
    while (i < toks.length) {
      addFeature(v, toks(i), dim)
      if (i + 1 < toks.length) addFeature(v, toks(i) + " " + toks(i + 1), dim)
      i += 1
    }
    l2normalize(v)
  }

  /** Oracle-expressible feature-hashing embedder (q65): the same
    * Weinberger-style construction as [[embed]] — token (unigram) →
    * bucket + sign, bucket-summed, L2-normalized — but with the hashes
    * md5-derived so every step reproduces in DuckDB. Emitted as sparse
    * (id, pos, val) rows (absent buckets are zero). [[embed]]'s murmur
    * path (plus bigrams) stays the throughput embedder the pipeline
    * runs; this pins the hashing-embedder MATH in the oracle the way
    * q52/q53/q54/q59 pin the other signature ops. */
  def embedSqlRows(df: DataFrame, idCol: String, textCol: String,
      dim: Int = DefaultDim): DataFrame = {
    val sums = md5BucketSums(df, idCol, textCol, dim)
    val norms = sums.groupBy("id")
      .agg(sqrt(sum(col("s") * col("s"))).as("nrm"))
    sums.join(norms, "id")
      .select(col("id"), col("pos"),
        round(col("s") / greatest(col("nrm"), lit(1e-12)), 6).as("val"))
  }

  /** Sparse `(id, pos, s)` md5 bucket/sign sums — the shared first stage of
    * [[embedSqlRows]] and [[denseSqlVectors]]. `s` is an exact integer
    * (sum of ±1 per token). */
  private def md5BucketSums(df: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(split(lower(col(textCol)), graft.llm.Dedup.WsClass)).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("b",
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
    toks
      .select(col("id"), pmod(col("b"), lit(dim.toLong)).cast("int").as("pos"),
        when(shiftright(col("b"), 8).bitwiseAND(lit(1L)) === 1L, 1.0)
          .otherwise(-1.0).as("sgn"))
      .groupBy("id", "pos").agg(sum("sgn").as("s")) // exact ±1 integers
  }

  /** Dense UNNORMALIZED integer bucket-count vectors under the same
    * md5-derived bucket/sign hashes as [[embedSqlRows]]. Every coordinate
    * is an exact small integer, so squared-Euclidean distances between
    * these vectors are exact in both Spark and DuckDB — the property q68
    * uses to pin the order-dependent grouping fold
    * ([[graft.ml.Centroids.foldAssignWith]]) against a recursive-CTE
    * oracle. Rows with no tokens get the zero vector (as does the
    * oracle's dense CTE). */
  def denseSqlVectors(df: DataFrame, idCol: String, textCol: String,
      dim: Int): DataFrame = {
    val maps = md5BucketSums(df, idCol, textCol, dim)
      .groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("pos"), col("s"))))
        .as("m"))
    df.select(col(idCol).as("id")).join(maps, Seq("id"), "left")
      .select(col("id").as(idCol),
        transform(sequence(lit(0), lit(dim - 1)),
          p => coalesce(element_at(col("m"), p), lit(0.0))).as("vec"))
  }

  /** Per-ROW expression twin of [[denseSqlVectors]]: the same md5
    * bucket/sign geometry folded inside one scalar HOF chain, so a
    * STREAMING pass can embed each arriving document map-only (no
    * groupBy — Append mode stays legal). Equality with the batch
    * builder is exact, not approximate: every coordinate is a sum of
    * ±1.0 doubles (integers, exactly representable), so the fold order
    * here vs the hash-aggregate order there cannot diverge — EmbedSpec
    * pins the two columns equal row-for-row. Cost is one
    * `aggregate` over the token digests per coordinate request; the
    * accumulator is the dim-wide array updated positionally, so the
    * pass stays O(dim + tokens·dim-array-copy) per row — acceptable
    * for ingest (once per arriving doc), not meant for the relational
    * hot path where [[denseSqlVectors]]'s aggregate stays cheaper. */
  def denseSqlVecExpr(text: Column, dim: Int): Column = {
    // null text → zero vector, matching the batch builder's left join
    // (a bare HOF chain over a null array would emit null instead)
    val toks = filter(
      coalesce(split(lower(text), graft.llm.Dedup.WsClass), array(lit(""))),
      t => t =!= "")
    val bs = transform(toks,
      t => conv(substring(md5(t), 1, 15), 16, 10).cast("long"))
    aggregate(bs,
      array_repeat(lit(0.0), dim),
      (acc, b) => {
        val pos = pmod(b, lit(dim.toLong)).cast("int")
        val sgn = when(shiftright(b, 8).bitwiseAND(lit(1L)) === 1L, 1.0)
          .otherwise(-1.0)
        zip_with(acc, sequence(lit(0), lit(dim - 1)),
          (x, i) => when(i === pos, x + sgn).otherwise(x))
      })
  }

  private def addFeature(v: Array[Float], feat: String, dim: Int): Unit = {
    val h = MurmurHash3.stringHash(feat, 0x9747b28c)
    val idx = math.floorMod(h, dim)
    val sign = if (MurmurHash3.stringHash(feat, 0x85ebca6b) < 0) -1f else 1f
    v(idx) += sign
  }

  private def l2normalize(v: Array[Float]): Array[Float] = {
    var n = 0.0
    var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    if (n > 0) {
      val inv = (1.0 / math.sqrt(n)).toFloat
      i = 0
      while (i < v.length) { v(i) *= inv; i += 1 }
    }
    v
  }

  /** Column form. UDF (not codegen) — used once per ingest, off the
    * relational hot path; the per-partition closure initializes nothing,
    * so there is no per-row model-load cost to amortize (the reference
    * batches GPU encodes for that reason, run_training_batch.py:57-73). */
  def embedCol(text: Column, dim: Int = DefaultDim): Column = {
    val f = udf((s: String) => if (s == null) null else embed(s, dim))
    f(text)
  }

  /** Attach an `embedding` column built from `textCol`. */
  def withEmbedding(df: DataFrame, textCol: String,
      out: String = "embedding", dim: Int = DefaultDim): DataFrame =
    df.withColumn(out, embedCol(col(textCol), dim))
}
