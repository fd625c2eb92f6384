package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-by-stage profiler for q97 (corpus-prep capstone) — not
  * part of the library surface; run with
  * `SPARK_GRAFT_SF_DIR=... runMain graft.tools.ProfileQ97`.
  * Times each pipeline stage in isolation (cumulative prefixes, so a
  * stage's number includes its inputs' cost — the deltas are the
  * per-stage floors). */
object ProfileQ97 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    import graft.llm.{Corpus, Dedup, TextOps}
    for (pass <- 1 to 3) {
      println(s"[prof] ---- pass $pass ----")
      val tier = regexp_extract($"source", "src([0-9]+)", 1).cast("long") % 4
      val lab = graft.ops.Tables.documents(spark, sfDir)
        .withColumn("tier", tier)
      val evalDocs = lab.filter($"tier" === 3)
      val train = lab.filter($"tier" =!= 3)
      val scored = TextOps.withQualityScore(
        TextOps.withLangId(train, "text"), "text")
      val clean = scored
        .filter($"lang_pred" =!= "und" && $"quality_score" >= 0.5)
      time("clean (gates)")(clean.count())
      val keepIds = clean.groupBy(md5($"text").as("h"))
        .agg(min($"doc_id").as("doc_id")).select($"doc_id")
      val reps = clean.join(keepIds, "doc_id")
        .select($"doc_id", $"text", $"source", $"tier")
        .localCheckpoint(false)
      time("reps (exact dedup)")(reps.count())
      val pairs = Dedup.minHashNearDupsSql(reps, "doc_id", "text", 0.3)
        .select($"id_a", $"id_b")
      time("minhash pairs")(pairs.count())
      val cc = Dedup.connectedComponents(pairs,
        allIds = Some(reps.select($"doc_id")))
      val keepers = reps.join(
        cc.filter($"id" === $"keep_id").select($"id".as("doc_id")), "doc_id")
      time("keepers (components)")(keepers.count())
      val contaminated = Corpus.decontaminate(keepers, evalDocs,
        "doc_id", "text", 8).select($"doc_id")
      val decon = keepers.join(contaminated, Seq("doc_id"), "left_anti")
      time("decontaminate")(decon.count())
      time("q97 end-to-end") {
        graft.SparkEntry.queries("q97_corpus_pipeline")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
