package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search") — the OTHER standard ANN compression next
  * to the int8 scalar quantizer ([[Quantize]]): the vector is split
  * into `m` subspaces, each subspace gets its own small codebook
  * (ksub centroids from the same deterministic sample-Lloyd the IVF
  * coarse quantizer uses — [[Ivf.fitCentroids]]), and a vector is
  * stored as `m` small codes (m·log2(ksub) bits — at m=4, ksub=16
  * that is 2 BYTES per 64-dim vector vs 64 for int8 SQ, a further 32×).
  * Search is ADC (asymmetric distance computation): the query builds a
  * per-subspace distance table to every codebook entry ONCE, and each
  * candidate's distance is m table lookups summed — no per-candidate
  * float math at all.
  *
  * Design for determinism (the whole path hash-replays in DuckDB):
  *  - codebooks come from [[Ivf.fitCentroids]] — the q59-pinned Lloyd
  *    (decimal-sum means, first-k seeds), run once per subspace slice;
  *  - encoding is [[Ivf.assignExpr]] per subspace — the same argmin
  *    struct-ordering tie-break (smallest code wins);
  *  - the ADC tables are FIXED-POINT: each entry is
  *    `floor(sqEuclidean·1e6 + 0.5)` as a long, so a candidate's ADC
  *    score is an exact integer sum — order-free, which is also the
  *    production trick (FAISS quantizes LUTs to integers for SIMD).
  *
  * Scale shape: fitting is m bounded sample-Lloyds (driver-resident
  * codebooks, `maxFitRows`-guarded); encoding is ONE map-only
  * projection per corpus row (m unrolled argmins — no join, no
  * shuffle); serving broadcasts the tiny query-side table frame and
  * scans codes (2 bytes/vector of payload), shuffling nothing but the
  * final top-k. Composes with the IVF coarse stage exactly like SQ
  * (assign list_id first, store codes per list).
  */
object Pq {

  /** Fit per-subspace codebooks on `df` (pass a bounded sample — the
    * [[Ivf.FitMaxRowsKey]] guard applies per subspace fit). Returns
    * driver-resident codebooks: `result(mi)` is subspace mi's
    * (code, centroid) list. Codes are POSITIONS 0..size-1, re-numbered
    * after the fit: Lloyd clusters can collapse (duplicate seeds leave
    * a centroid memberless and it vanishes from the next iteration), so
    * the fitted list_ids may be non-contiguous and the per-subspace
    * codebook smaller than ksub — the relabeling keeps the LUT
    * flat-indexable while preserving the argmin tie-break order (sorted
    * by original list_id, so "smaller code wins" is the same
    * decision). `dim` must divide evenly into `m` subspaces. */
  def fitCodebooks(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, ksub: Int,
      iters: Int = 3): Seq[Seq[(Int, Seq[Double])]] = {
    require(m > 0 && dim % m == 0,
      s"dim $dim must split evenly into m=$m subspaces")
    require(ksub > 1, s"ksub must be > 1, got $ksub")
    val sub = dim / m
    (0 until m).map { mi =>
      val sliced = df.select(col(idCol).as("id"),
        slice(col(vecCol).cast("array<double>"), mi * sub + 1, sub)
          .as("v"))
      Ivf.fitCentroids(sliced, "id", "v", ksub, iters)
        .collect() // ksub×sub rows — codebook collect, the Ivf convention
        .map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
        .zipWithIndex.map { case ((_, c), pos) => (pos, c) }
    }
  }

  /** Encode every row as its `m` subspace codes (array<int>) — one
    * map-only projection, no join, no shuffle (the [[Ivf.assignIndex]]
    * argument, m times over). */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      codebooks: Seq[Seq[(Int, Seq[Double])]]): DataFrame = {
    graft.functions.VectorExprs.register(df.sparkSession)
    val sub = codebooks.head.head._2.size
    val v = col(vecCol).cast("array<double>")
    val codes = array(codebooks.zipWithIndex.map { case (cb, mi) =>
      Ivf.assignExpr(slice(v, mi * sub + 1, sub), cb)
    }: _*)
    df.select(col(idCol).as("id"), codes.as("codes"))
  }

  /** ADC top-k: per query build the fixed-point distance table (one
    * long per (subspace, code) — m·ksub entries), broadcast the tiny
    * query frame, and rank candidates by the exact integer sum of m
    * lookups, ties to the smaller id. Candidates equal to the query id
    * are excluded. Emits (qid, cid, adc_fp, rn ≤ k). */
  def adcSearch(queries: DataFrame, codes: DataFrame, idCol: String,
      vecCol: String, codebooks: Seq[Seq[(Int, Seq[Double])]],
      k: Int): DataFrame = {
    require(k > 0, s"top-k needs k > 0, got $k")
    graft.functions.VectorExprs.register(queries.sparkSession)
    // per-subspace offsets into the flattened LUT — codebook sizes can
    // differ when clusters collapsed during the fit
    val offsets = codebooks.map(_.size).scanLeft(0)(_ + _)
    val sub = codebooks.head.head._2.size
    val qv = col(vecCol).cast("array<double>")
    val dtab = array(codebooks.zipWithIndex.flatMap { case (cb, mi) =>
      cb.map { case (_, c) =>
        floor(graft.ml.Distance.sqEuclidean(
            slice(qv, mi * sub + 1, sub), typedLit(c))
          * lit(1e6) + lit(0.5)).cast("long")
      }
    }: _*)
    val q = queries.select(col(idCol).as("qid"), dtab.as("dtab"))
    // left-associated exact long sum of m 1-based lookups into the
    // flattened (subspace-major) table
    val adc = expr(codebooks.indices.map(mi =>
      s"element_at(dtab, ${offsets(mi)} + element_at(codes, ${mi + 1}) + 1)")
      .mkString(" + "))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adc_fp").asc, col("id").asc)
    codes.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .withColumn("adc_fp", adc)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("id").as("cid"), col("adc_fp"), col("rn"))
  }
}
