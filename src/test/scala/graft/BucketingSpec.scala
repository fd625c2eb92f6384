package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing demonstration (scale posture: pre-shuffled co-located joins).
  * Writing both join sides bucketed by the join key lets the sort-merge
  * join read co-located buckets with NO exchange on either side — at
  * 100 TB this converts the dominant shuffle of a repeated fact-fact join
  * into a one-time layout cost.
  */
class BucketingSpec extends AnyFunSuite {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bucketing")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      .config("spark.sql.ui.enabled", "false")
      .getOrCreate()
    try {
      val sf = "/root/testdata/sf0.001"
      spark.read.parquet(s"$sf/lineitem.parquet")
        .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      spark.read.parquet(s"$sf/orders.parquet")
        .withColumnRenamed("o_orderkey", "l_orderkey")
        .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")

      // and it computes the same result as the plain join
      val plain = spark.read.parquet(s"$sf/lineitem.parquet")
        .join(spark.read.parquet(s"$sf/orders.parquet")
          .withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey")
      assert(joined.count() == plain.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      SparkSession.clearActiveSession()
    }
  }

  test("bucketed jaccard candidate join: no exchange, same pairs") {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bucketing")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ui.enabled", "false")
      .getOrCreate()
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force SMJ: at corpus scale neither side broadcasts, which is
    // exactly when the bucket layout earns its keep
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val sf = "/root/testdata/sf0.001"
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val bucketed = graft.llm.Dedup.jaccardPairsBucketed(
        docs, "doc_id", "text", "source", 0.9)
      // phase-1 candidate join over the bucketed narrow table must plan
      // with no shuffle on either side
      val candPlan = graft.llm.Dedup.sizeFilteredCandidates(
          spark.table("graft_jaccard_narrow"), 0.9)
        .queryExecution.executedPlan.toString
      assert(!candPlan.contains("Exchange"),
        s"bucketed candidate join still shuffles:\n$candPlan")
      // and the full bucketed variant returns exactly jaccardPairs' rows
      val plain = graft.llm.Dedup.jaccardPairs(
          docs, "doc_id", "text", "source", 0.9)
        .collect().map(_.toString).sorted
      val got = bucketed.collect().map(_.toString).sorted
      assert(got.sameElements(plain))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS graft_jaccard_narrow")
      SparkSession.clearActiveSession()
    }
  }
}
