package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT global ranking — the two-pass replacement for an
  * unpartitioned `row_number()` window, which moves every input row
  * through ONE task (at corpus scale that is an executor OOM, not a
  * slowdown — the round-11 verdict's last single-partition wall,
  * q152/q157).
  *
  * Pass 1 samples split points of a numeric SURROGATE that is monotone
  * (non-strictly) in the target sort order — approximate quantiles,
  * which govern partition BALANCE only, never the result. Pass 2
  * counts rows per surrogate range (one map-side-combined aggregation,
  * range-count-sized), turns the counts into literal per-range offsets
  * on the driver (a bounded collect: ≤ `ranges` rows, the k-bounded
  * convention), and ranks WITHIN each range with a PARTITIONED window:
  *
  *   global rank = range offset + in-range row_number
  *
  * Exact for any input because ranges are contiguous in sort order and
  * equal surrogate values always land in the same range (the split
  * predicate is `surrogate > split`, so ties cannot straddle a
  * boundary; the full sort key orders them inside their range). The
  * residual skew bound is the multiplicity of a single surrogate
  * value — the fundamental floor for exact ranking, and the documented
  * contract: a caller whose surrogate is one constant gets the old
  * wall back, so pick a surrogate with spread (a score, a metric — not
  * a flag).
  *
  * The input is localCheckpointed once (it is consumed by the quantile
  * probe, the count pass and the final rank pass); the checkpoint is
  * also what makes the collected offsets consistent with the ranked
  * plan. Cost: one materialization + three scans of the checkpoint,
  * all distributed.
  */
object Ranks {

  private case class Ranges(keyed: DataFrame, bucket: Column,
      offsets: Array[Long], counts: Map[Int, Long], total: Long)

  /** Shared range machinery: checkpoint, sample splits, count per
    * range, cumulate offsets. `__rk` (the cast surrogate) is attached;
    * `bucket` is the range index expression over `__rk`. */
  private def rangesOf(df: DataFrame, surrogate: Column,
      nRanges: Int): Ranges = {
    require(nRanges >= 2 && nRanges <= 4096,
      s"nRanges must be in [2, 4096], got $nRanges")
    val keyed = df.withColumn("__rk", surrogate.cast("double"))
      .localCheckpoint()
    val probs = (1 until nRanges).map(_.toDouble / nRanges).toArray
    val splits = keyed.stat.approxQuantile("__rk", probs, 0.005)
      .distinct.sorted
    // range index = #(splits strictly below the value): equal values
    // share a range by construction, so ties never straddle a boundary
    val bucket = splits.foldLeft(lit(0)) { (acc, s) =>
      acc + when(col("__rk") > lit(s), 1).otherwise(0)
    }
    val counts = keyed.groupBy(bucket.as("__bkt"))
      .agg(count(lit(1)).as("__c"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = new Array[Long](splits.length + 1)
    var cum = 0L
    for (b <- offsets.indices) {
      offsets(b) = cum
      cum += counts.getOrElse(b, 0L)
    }
    Ranges(keyed, bucket, offsets, counts, cum)
  }

  /** Exact global `row_number()` over `sortCols` as column `outCol`,
    * plus the exact total row count. `surrogate` must be numeric and
    * monotone (non-strictly) in `sortCols` order — e.g. the first sort
    * key itself for an ascending rank, its negation for descending. */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column],
      surrogate: Column, outCol: String,
      nRanges: Int = 64): (DataFrame, Long) = {
    val r = rangesOf(df, surrogate, nRanges)
    val ranked = r.keyed
      .withColumn("__bkt", r.bucket)
      .withColumn(outCol,
        element_at(typedLit(r.offsets.toSeq), col("__bkt") + 1) +
          row_number().over(
            Window.partitionBy(col("__bkt")).orderBy(sortCols: _*)))
      .drop("__rk", "__bkt")
    (ranked, r.total)
  }

  /** The rows sitting at specific global ranks — the percentile-probe
    * shape: only the ranges CONTAINING a target rank are sorted at
    * all (≤ |targets| ranges; the rest of the corpus is counted,
    * never sorted). `targetsOf` receives the exact total row count and
    * returns the wanted ranks (1-based). Output carries `outCol` =
    * the exact global rank; returns the frame plus the total. */
  def rowsAtRanks(df: DataFrame, sortCols: Seq[Column],
      surrogate: Column, targetsOf: Long => Seq[Long], outCol: String,
      nRanges: Int = 64): (DataFrame, Long) = {
    val r = rangesOf(df, surrogate, nRanges)
    val targets = targetsOf(r.total)
    val wanted = r.offsets.indices.filter { b =>
      val lo = r.offsets(b)
      val hi = lo + r.counts.getOrElse(b, 0L)
      targets.exists(t => t > lo && t <= hi)
    }
    val picked = r.keyed
      .withColumn("__bkt", r.bucket)
      .filter(col("__bkt").isin(wanted: _*))
      .withColumn(outCol,
        element_at(typedLit(r.offsets.toSeq), col("__bkt") + 1) +
          row_number().over(
            Window.partitionBy(col("__bkt")).orderBy(sortCols: _*)))
      .filter(col(outCol).isin(targets: _*))
      .drop("__rk", "__bkt")
    (picked, r.total)
  }
}
