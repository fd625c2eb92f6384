package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Welford online mean/variance as a typed `Aggregator` — the engine's
  * incremental-standardization state (reference D11: river `StandardScaler`
  * updates running mean/std per row, src/ml/pipeline.py:32). The merge
  * step is Chan et al.'s parallel combination, so the same state machine
  * works per-partition + combine — exactly how a streaming scaler shards
  * at scale.
  */
object WelfordAgg {

  case class WelfordBuf(n: Long, mean: Double, m2: Double)

  case class MeanStd(mean: Double, std: Double)

  val aggregator: Aggregator[Double, WelfordBuf, MeanStd] =
    new Aggregator[Double, WelfordBuf, MeanStd] {
      def zero: WelfordBuf = WelfordBuf(0L, 0.0, 0.0)
      def reduce(b: WelfordBuf, x: Double): WelfordBuf = {
        val n = b.n + 1
        val d = x - b.mean
        val mean = b.mean + d / n
        WelfordBuf(n, mean, b.m2 + d * (x - mean))
      }
      def merge(a: WelfordBuf, b: WelfordBuf): WelfordBuf = {
        if (a.n == 0) b
        else if (b.n == 0) a
        else {
          val n = a.n + b.n
          val d = b.mean - a.mean
          WelfordBuf(n, a.mean + d * b.n / n,
            a.m2 + b.m2 + d * d * a.n * b.n / n)
        }
      }
      def finish(b: WelfordBuf): MeanStd =
        if (b.n == 0) MeanStd(0.0, 0.0)
        else MeanStd(b.mean, math.sqrt(b.m2 / b.n)) // population std
      def bufferEncoder: Encoder[WelfordBuf] = Encoders.product[WelfordBuf]
      def outputEncoder: Encoder[MeanStd] = Encoders.product[MeanStd]
    }

  /** Typed column for `ds.groupByKey(...).agg(...)` or untyped agg via
    * `.toColumn`. */
  def meanStd: TypedColumn[Double, MeanStd] = aggregator.toColumn
}
