package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WelfordAgg
import graft.ops.AsOfJoin

class Relational2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("asof join: most recent match at-or-before, null when none") {
    import spark.implicits._
    val left = Seq((1L, 10L, "e1"), (1L, 25L, "e2"), (2L, 5L, "e3"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, 10L, 100L), (1L, 20L, 200L), (2L, 50L, 300L))
      .toDF("k", "ts", "rid")
    val got = AsOfJoin.asofLeft(left, right, "k", "ts", Seq("rid"))
      .collect().map(r => r.getAs[String]("name") ->
        Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong)).toMap
    // e1 at ts=10: right at ts=10 matches inclusively -> 100
    // e2 at ts=25: most recent is ts=20 -> 200
    // e3 at ts=5: no right <= 5 -> null
    assert(got == Map("e1" -> Some(100L), "e2" -> Some(200L), "e3" -> None))
  }

  test("welford aggregator matches two-pass mean/std and merges shards") {
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 10.0)
    val b = xs.foldLeft(WelfordAgg.aggregator.zero)(
      WelfordAgg.aggregator.reduce)
    val out = WelfordAgg.aggregator.finish(b)
    val mean = xs.sum / xs.size
    val std = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / xs.size)
    assert(math.abs(out.mean - mean) < 1e-12)
    assert(math.abs(out.std - std) < 1e-12)
    // sharded merge gives the same result
    val (l, r) = xs.splitAt(2)
    val merged = WelfordAgg.aggregator.merge(
      l.foldLeft(WelfordAgg.aggregator.zero)(WelfordAgg.aggregator.reduce),
      r.foldLeft(WelfordAgg.aggregator.zero)(WelfordAgg.aggregator.reduce))
    val m = WelfordAgg.aggregator.finish(merged)
    assert(math.abs(m.mean - mean) < 1e-12 && math.abs(m.std - std) < 1e-12)
  }

  test("asof join plan has no nested-loop join (single shuffle, no pair blowup)") {
    import spark.implicits._
    val left = (1 to 100).map(i => (i % 5L, i.toLong, s"e$i"))
      .toDF("k", "ts", "name")
    val right = (1 to 100).map(i => (i % 5L, i.toLong, i * 10L))
      .toDF("k", "ts", "rid")
    val plan = AsOfJoin.asofLeft(left, right, "k", "ts", Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "asof join must not degenerate into a nested-loop join")
    assert(!plan.contains("CartesianProduct"))
  }
}
