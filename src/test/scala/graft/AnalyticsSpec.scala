package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-11 event-analytics operators (q213-q216): sketch
  * join-size estimation, gap-fill, funnel, retention. The DuckDB
  * oracle gates exact values; these tests pin the PROPERTIES — the
  * CMS one-sided guarantee and width monotonicity, grid density,
  * funnel monotonicity, and cohort-triangle conservation.
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q213: CMS join estimate never undercounts, and a wider sketch " +
      "is never worse") {
    val r = graft.ops.LlmQueries.q213JoinSizeEst(spark, sf).collect()
      .map(x => x.getAs[Int]("width") ->
        (x.getAs[Long]("est"), x.getAs[Long]("exact"))).toMap
    assert(r.size == 2)
    r.values.foreach { case (est, exact) =>
      assert(est >= exact, s"CMS undercounted: est $est < exact $exact")
    }
    assert(r(1024)._1 <= r(256)._1,
      s"wider sketch estimated worse: ${r(1024)._1} > ${r(256)._1}")
  }

  test("q214: the gap-filled grid is dense — types × full hour span, " +
      "zero-filled, and ffill carries the last observed count") {
    val df = graft.ops.StreamQueries.q214Gapfill(spark, sf)
    val rows = df.collect()
    val types = rows.map(_.getAs[String]("event_type")).distinct.length
    val hours = rows.map(_.getAs[Long]("hour_id")).distinct
    assert(rows.length == types * hours.length,
      s"${rows.length} rows != $types types x ${hours.length} hours")
    assert(hours.max - hours.min + 1 == hours.length, "hour axis has gaps")
    // conservation: grid counts sum back to the corpus
    val total = rows.map(_.getAs[Long]("cnt")).sum
    assert(total == graft.ops.Tables.events(spark, sf).count())
    // ffill: on a zero-filled hour, cnt_ffill repeats the last observed
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      var lastObserved = 0L
      rs.sortBy(_.getAs[Long]("hour_id")).foreach { x =>
        if (x.getAs[Long]("cnt") > 0) lastObserved = x.getAs[Long]("cnt")
        assert(x.getAs[Long]("cnt_ffill") == lastObserved, x.toString)
      }
    }
  }

  test("q215: funnel stages are monotone non-increasing and conv_bp " +
      "is anchored at stage 1") {
    val r = graft.ops.StreamQueries.q215Funnel(spark, sf).collect()
      .sortBy(_.getAs[String]("stage"))
    assert(r.length == 3)
    val ns = r.map(_.getAs[Long]("n_users"))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), ns.toSeq.toString)
    assert(r(0).getAs[Long]("conv_bp") == 10000L)
  }

  test("q217: streamed funnel stages are per-user monotone across " +
      "batches and the final batch reproduces q215's counts") {
    val rows = graft.ops.StreamQueries.q217StreamFunnel(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val stages = rs.sortBy(_.getAs[Int]("batch_id"))
        .map(_.getAs[Int]("stage"))
      stages.sliding(2).foreach {
        case Array(a, b) => assert(b >= a, stages.toSeq.toString)
        case _ => ()
      }
    }
    // a user's stage only moves when its events arrive, so the LAST
    // emission per user is its final funnel position — and the counts
    // must reproduce the batch q215 funnel exactly
    val finalStages = rows.groupBy(_.getAs[Long]("user_id")).map {
      case (_, rs) => rs.maxBy(_.getAs[Int]("batch_id")).getAs[Int]("stage")
    }.toSeq
    val batch = graft.ops.StreamQueries.q215Funnel(spark, sf).collect()
      .map(x => x.getAs[String]("stage") -> x.getAs[Long]("n_users"))
      .toMap
    assert(finalStages.count(_ >= 1) == batch("1_view"))
    assert(finalStages.count(_ >= 2) == batch("2_click"))
    assert(finalStages.count(_ >= 3) == batch("3_purchase"))
  }

  test("q218: horizons nest (dau <= wau <= mau) and stickiness is a " +
      "valid bp ratio over the full span") {
    val rows = graft.ops.StreamQueries.q218Stickiness(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { x =>
      val (dau, wau, mau) = (x.getAs[Long]("dau"), x.getAs[Long]("wau"),
        x.getAs[Long]("mau"))
      assert(dau <= wau && wau <= mau, x.toString)
      val bp = x.getAs[Long]("stickiness_bp")
      assert(bp >= 0 && bp <= 10000, x.toString)
    }
    val days = rows.map(_.getAs[Long]("day_id"))
    assert(days.max - days.min + 1 == days.length, "day axis has gaps")
  }

  test("q219: gap runs reconcile with the q214 grid's zero hours") {
    import spark.implicits._
    val out = graft.ops.StreamQueries.q219OutageDetector(spark, sf)
      .collect()
    assert(out.nonEmpty)
    val zeroByType = graft.ops.StreamQueries.q214Gapfill(spark, sf)
      .filter($"cnt" === 0).groupBy($"event_type")
      .agg(count(lit(1)).as("z")).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    out.foreach { x =>
      val t = x.getAs[String]("event_type")
      val (zeros, gaps, longest) = (x.getAs[Long]("n_zero_hours"),
        x.getAs[Long]("n_gaps"), x.getAs[Long]("longest_gap"))
      assert(zeros == zeroByType.getOrElse(t, 0L), x.toString)
      assert(gaps <= zeros && longest <= zeros, x.toString)
      assert((zeros == 0) == (gaps == 0), x.toString)
    }
  }

  test("q220: transition probabilities are valid conditional bp and " +
      "pair mass reconciles with session lengths") {
    import spark.implicits._
    val rows = graft.ops.LlmQueries.q220JourneyTransitions(spark, sf)
      .collect()
    assert(rows.length <= 15 && rows.nonEmpty)
    rows.foreach { x =>
      val bp = x.getAs[Long]("p_bp")
      assert(bp > 0 && bp <= 10000, x.toString)
      assert(x.getAs[Long]("n") >= 1, x.toString)
    }
    // total pair mass = Σ (session length − 1) over all sessions
    val pairMass = graft.ops.LlmQueries.q200SessionSequences(spark, sf)
      .agg(sum(greatest($"n_events" - 1, lit(0L)))).collect()
      .head.getLong(0)
    assert(pairMass > 0)
  }

  test("q221: streamed DAU grows monotonically per day and the final " +
      "emission equals the batch distinct count") {
    import spark.implicits._
    val rows = graft.ops.StreamQueries.q221StreamDau(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("day_id")).foreach { case (_, rs) =>
      val seq = rs.sortBy(_.getAs[Int]("batch_id"))
        .map(_.getAs[Long]("dau_seen"))
      seq.sliding(2).foreach {
        case Array(a, b) => assert(b >= a, seq.toSeq.toString)
        case _ => ()
      }
    }
    val finalDau = rows.groupBy(_.getAs[Long]("day_id")).map {
      case (d, rs) =>
        d -> rs.maxBy(_.getAs[Int]("batch_id")).getAs[Long]("dau_seen")
    }
    val batch = graft.ops.Tables.events(spark, sf)
      .select(expr("unix_micros(ts) DIV 86400000000").as("d"), $"user_id")
      .distinct().groupBy($"d").agg(count(lit(1)).as("n"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(finalDau == batch)
  }

  test("q216: every user appears at offset 0 of exactly one cohort") {
    import spark.implicits._
    val r = graft.ops.StreamQueries.q216Retention(spark, sf)
    val atZero = r.filter($"day_offset" === 0)
      .agg(sum($"n_users")).collect().head.getLong(0)
    val users = graft.ops.Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(atZero == users, s"offset-0 mass $atZero != $users users")
  }
}
