package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pipeline golden tests (SURVEY.md §5 plan item 4): the enrichment
  * pipeline is deterministic end to end (hash embedder, ordered folds,
  * fixed thresholds), so exact outputs on the fixed sf0.001 fixture are
  * pinned. A change to the embedder, fold order, or thresholds that
  * shifts clustering breaks these on purpose.
  */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("golden: DenStream cluster x event_type counts on sf0.001") {
    val got = SparkEntry.queries("q33_denstream")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .toList
    val expected = List(
      (0, "error", 201L), (0, "signup", 1L),
      (1, "purchase", 202L), (2, "signup", 198L))
    assert(got == expected)
  }

  test("golden: semantic group sizes on sf0.001") {
    val got = SparkEntry.queries("q32_semantic_groups")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toList
    val expected = List(
      ("sem_grp_0", 259L), ("sem_grp_188", 164L), ("sem_grp_2", 198L),
      ("sem_grp_5", 213L), ("sem_grp_84", 166L))
    assert(got == expected)
  }

  test("golden: anomaly ranking output on sf0.001") {
    // q27 over events hourly volume: deterministic single flagged cluster
    val got = SparkEntry.queries("q27_anomaly_rank")(spark, sf).collect()
    assert(got.length >= 1)
    // re-running gives bit-identical results (no RNG anywhere)
    val again = SparkEntry.queries("q27_anomaly_rank")(spark, sf).collect()
    assert(got.map(_.toString).sameElements(again.map(_.toString)))
  }
}
