package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass Gramian/mean accumulator for PCA (the MLlib
  * computeGramian pattern as a typed `Aggregator`): one map-side-combining
  * pass over the vector column accumulates [n, Σv (d), Σ v·vᵀ (d²)],
  * from which the driver derives means and covariance. Replaces the
  * explode-to-d²-rows formulation, whose shuffle input grows N·d² — this
  * buffer is d²+d+1 doubles per partition regardless of N.
  */
object GramianAgg {

  val aggregator: Aggregator[Seq[Double], Array[Double], Seq[Double]] =
    new Aggregator[Seq[Double], Array[Double], Seq[Double]] {
      // layout: [0]=n, [1..d]=sums, [1+d ..]=row-major outer-product sums;
      // zero is the empty array — the dimension is learned from the first
      // row (and a ragged column fails loudly)
      def zero: Array[Double] = Array.empty

      def reduce(b: Array[Double], v: Seq[Double]): Array[Double] = {
        val d = v.length
        val buf = if (b.isEmpty) new Array[Double](1 + d + d * d) else b
        require(buf.length == 1 + d + d * d,
          s"GramianAgg: ragged vector column (${v.length} vs fitted dim)")
        buf(0) += 1.0
        var i = 0
        while (i < d) {
          val vi = v(i)
          buf(1 + i) += vi
          val off = 1 + d + i * d
          var j = 0
          while (j < d) { buf(off + j) += vi * v(j); j += 1 }
          i += 1
        }
        buf
      }

      def merge(a: Array[Double], b: Array[Double]): Array[Double] =
        if (a.isEmpty) b
        else if (b.isEmpty) a
        else {
          require(a.length == b.length,
            "GramianAgg: merging buffers of different dimension")
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          a
        }

      def finish(b: Array[Double]): Seq[Double] = b.toSeq

      def bufferEncoder: Encoder[Array[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
      def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }

  def gramian: TypedColumn[Seq[Double], Seq[Double]] = aggregator.toColumn
}
