package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** k smallest DISTINCT longs as a PARTIAL aggregation — the KMV
  * (k-minimum-values) distinct-value sketch buffer (Bar-Yossef et al.
  * 2002; Beyer et al. 2007). Feeding it 60-bit md5 digests of a key
  * domain yields a fixed-size, order-independent summary from which
  * distinct cardinality (est ≈ (k−1)·D/θ_k over digest space D) and
  * set overlap (the q228 Jaccard estimator) read off without ever
  * materializing the domain.
  *
  * Scale shape — the same lever as [[TopKAgg]]: a window/sort
  * formulation of "k smallest per group" shuffles every distinct value
  * to its group's partition first; this Aggregator keeps a k-bounded
  * sorted buffer per partition (ObjectHashAggregate with a real
  * partial/final split), so the exchange carries at most k longs per
  * group per partition. The sketch is MERGEABLE by construction —
  * merge = k smallest of the union, the exact operation the partial/
  * final split and any streaming/batch union already perform — which
  * is what makes per-shard or per-batch sketches compose with no
  * rescan.
  *
  * Determinism: the buffer is a sorted distinct sequence and merge is
  * a two-pointer distinct merge — the result depends only on the SET
  * of inputs, never on partitioning or arrival order, so a SQL oracle
  * replays it as `row_number() OVER (ORDER BY v) <= k` on the distinct
  * domain. Inputs need not be pre-deduplicated (duplicates collapse in
  * the merge), but pre-collapsing avoids re-shipping repeats. */
object MinKAgg {

  /** Encoder-friendly buffer/result wrapper; `items` is sorted
    * ascending, distinct, and never exceeds k. */
  case class MinKList(items: Seq[Long])

  private[graft] class MinK(k: Int)
      extends Aggregator[Long, MinKList, MinKList] {
    require(k > 0, s"min-k needs k > 0, got $k")

    private def mergeSorted(a: Seq[Long], b: Seq[Long]): MinKList = {
      val out = Vector.newBuilder[Long]
      var (i, j, n) = (0, 0, 0)
      var last = Long.MinValue
      var first = true
      while (n < k && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) {
            val x = a(i); i += 1; x
          } else { val x = b(j); j += 1; x }
        if (first || v != last) { out += v; n += 1; last = v; first = false }
      }
      MinKList(out.result())
    }

    def zero: MinKList = MinKList(Vector.empty)
    def reduce(b: MinKList, x: Long): MinKList =
      mergeSorted(b.items, Vector(x))
    def merge(a: MinKList, b: MinKList): MinKList =
      mergeSorted(a.items, b.items)
    def finish(r: MinKList): MinKList = r
    def bufferEncoder: Encoder[MinKList] = Encoders.product[MinKList]
    def outputEncoder: Encoder[MinKList] = Encoders.product[MinKList]
  }

  /** Untyped column form: `agg(minK(128)(col("v")))` yields a struct
    * whose `items` field is the ascending distinct k-minimum array. */
  def minK(k: Int): UserDefinedFunction =
    udaf(new MinK(k), Encoders.scalaLong)

  /** Mutable k-minimum buffer for imperative map-side combines
    * (`mapPartitions` pre-aggregation ahead of a keyed-state shuffle —
    * [[graft.streaming.StreamOps.streamingKmvIngest]]): O(log k) per
    * row via binary search, and once full every value ≥ the current
    * k-th minimum is rejected without copying — the common case on a
    * warm buffer. Produces the same set as [[MinK]] by construction
    * (sorted, distinct, k smallest); PropertySpec pins the equality. */
  private[graft] final class MinKBuf(k: Int) {
    require(k > 0, s"min-k needs k > 0, got $k")
    private val arr = new Array[Long](k)
    private var n = 0
    def add(v: Long): Unit = {
      if (n == k && v >= arr(n - 1)) return
      var idx = java.util.Arrays.binarySearch(arr, 0, n, v)
      if (idx >= 0) return // duplicate
      idx = -idx - 1
      System.arraycopy(arr, idx, arr, idx + 1, math.min(n, k - 1) - idx)
      arr(idx) = v
      if (n < k) n += 1
    }
    def items: Vector[Long] = arr.take(n).toVector
  }
}
