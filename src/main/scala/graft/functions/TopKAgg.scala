package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a PARTIAL aggregation — the shuffle-volume lever for
  * query-batch similarity search. The window formulation
  * (`row_number() OVER (PARTITION BY qid ORDER BY score)`) must shuffle
  * EVERY candidate row to its query's partition before ranking: at
  * corpus scale that is |corpus|·nprobe/nlist rows per query on the
  * wire. An aggregate with a k-bounded buffer does the ranking
  * map-side — each partition ships at most k rows per query to the
  * final merge, so shuffle volume is k·|partitions touched| per query
  * regardless of corpus size. Spark has no built-in k-bounded aggregate
  * (`max_by` takes no k), so this is a typed [[Aggregator]] wrapped
  * with [[org.apache.spark.sql.functions.udaf]] — it plans as
  * ObjectHashAggregate with a genuine partial/final split (the
  * [[WelfordAgg]] convention: same state machine per-partition and at
  * merge).
  *
  * Ordering is (cos_q DESC, cid ASC) — a TOTAL order (cid is unique),
  * so the result is independent of partitioning and merge order and the
  * windowed formulation's oracle replays it exactly. The buffer is kept
  * sorted; reduce/merge are O(k) two-pointer merges.
  */
object TopKAgg {

  /** One scored candidate; `cos_q`/`dot_q` as in
    * [[graft.llm.Ivf.knnQuantized]]. */
  case class Cand(cid: Long, dot_q: Long, cos_q: Double)

  /** Encoder-friendly buffer/result wrapper (a bare Seq has no product
    * encoder); `items` is sorted best-first and never exceeds k. */
  case class TopKList(items: Seq[Cand])

  private def better(a: Cand, b: Cand): Boolean =
    a.cos_q > b.cos_q || (a.cos_q == b.cos_q && a.cid < b.cid)

  private[graft] class TopKByCos(k: Int)
      extends Aggregator[Cand, TopKList, TopKList] {
    require(k > 0, s"top-k needs k > 0, got $k")

    private def mergeSorted(a: Seq[Cand], b: Seq[Cand]): TopKList = {
      val out = Vector.newBuilder[Cand]
      var (i, j, n) = (0, 0, 0)
      while (n < k && (i < a.length || j < b.length)) {
        val takeA = j >= b.length ||
          (i < a.length && better(a(i), b(j)))
        if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
        n += 1
      }
      TopKList(out.result())
    }

    def zero: TopKList = TopKList(Vector.empty)
    def reduce(b: TopKList, x: Cand): TopKList =
      mergeSorted(b.items, Vector(x))
    def merge(a: TopKList, b: TopKList): TopKList =
      mergeSorted(a.items, b.items)
    def finish(r: TopKList): TopKList = r
    def bufferEncoder: Encoder[TopKList] = Encoders.product[TopKList]
    def outputEncoder: Encoder[TopKList] = Encoders.product[TopKList]
  }

  /** Untyped column form: `agg(topKByCos(5)(cid, dot_q, cos_q))` — the
    * product encoder flattens [[Cand]] into three parameters — yields a
    * struct whose `items` field is the sorted top-k array; posexplode it
    * for (rank, candidate) rows. */
  def topKByCos(k: Int): UserDefinedFunction =
    udaf(new TopKByCos(k), Encoders.product[Cand])
}
