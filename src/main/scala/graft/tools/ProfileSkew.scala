package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch salted-vs-plain skew-join profiler — not part of the library
  * surface; run with
  * `SPARK_GRAFT_SF_DIR=<events set> runMain graft.tools.ProfileSkew`.
  *
  * Times q224's join (fact with every tenth user remapped to user 0 —
  * ~10 % of rows on one key — against the per-user dim) three ways:
  * plain shuffle join, salted (salts = 8), and plain again with AQE's
  * skew handling ON. Broadcast joins are disabled throughout (the dim
  * fits in memory here, but the operator exists for dims that don't),
  * and AQE skew-join is OFF for the first two so the comparison
  * isolates the salt. The wall-clock gap IS the hot partition: a
  * shuffle join's slowest task holds 10 % of the fact side; salting
  * spreads it over 8. */
object ProfileSkew {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_x100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val skewUid =
      expr("CASE WHEN user_id % 10 = 0 THEN 0 ELSE user_id END")
    val ev = graft.ops.Tables.events(spark, sfDir)
    val fact = ev.select(skewUid.as("uid"), $"event_id", $"event_type")
    val dim = ev.select(skewUid.as("uid"),
        when($"event_type" === "purchase", 1L).otherwise(0L).as("p"))
      .groupBy($"uid").agg(sum($"p").as("n_purchase"))
      .localCheckpoint()

    def agg(j: org.apache.spark.sql.DataFrame) =
      j.groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum($"n_purchase").as("purchase_mass"))

    def time(label: String)(body: => Unit): (String, Double) = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      (label, math.round(s * 1000) / 1000.0)
    }

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val plain = time("plain") {
      agg(fact.join(dim, "uid")).collect()
    }
    val salted = time("salted") {
      agg(graft.ops.SkewJoin.saltedInnerJoin(fact, dim, "uid",
        salts = 8, saltCols = Seq("event_id"))).collect()
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val aqe = time("plain_aqe_skew") {
      agg(fact.join(dim, "uid")).collect()
    }
    println(Seq(plain, salted, aqe)
      .map { case (l, s) => s""""$l":$s""" }
      .mkString(s"""{"sf":"$sfDir",""", ",", "}"))
    spark.stop()
  }
}
