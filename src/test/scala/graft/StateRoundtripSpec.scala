package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{Centroids, DenStream, Embed}
import graft.pipeline.Enrich
import graft.state.ModelStore

/** §3 cross-run parity: the training batch persists model state through
  * ModelStore (the pickle/blue-green analog, A12/A13); a later incremental
  * batch loads it and must score identically to the in-memory model.
  */
class StateRoundtripSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("train -> persist -> load -> incremental scores identically") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-rt").toString

    // training run (§3.2): fit + persist
    val (enriched, model) = Enrich.trainingBatch(spark, sf, limit = 600)
    ModelStore.save(DenStream.stateDF(spark, model), root, "denstream")
    val logs = Enrich.logView(spark, sf)
      .filter($"level".isin("warning", "error"))
      .orderBy($"log_id").limit(600)
      .withColumn("embed_text",
        concat($"message", lit(". Parsed: "), $"parsed_data"))
    val emb = Embed.withEmbedding(logs, "embed_text")
    ModelStore.save(
      Centroids.fitCentroids(emb, "log_id", "embedding", 1.8),
      root, "centroids")

    // a fresh process would start here: load state from disk
    val model2 = DenStream.fromStateDF(
      ModelStore.load(spark, root, "denstream"))
    val centroids2 = ModelStore.load(spark, root, "centroids").collect()
      .map(r => Centroids.Centroid(r.getString(0),
        r.getSeq[Float](1).toArray, r.getLong(2)))

    // incremental batch (§3.1) over a later id range with loaded state
    val incr = Enrich.incrementalBatch(spark, sf, model2, centroids2,
      lo = 700, hi = 900)
    val got = incr.select($"log_id", $"cluster_id", $"semantic_group")
      .orderBy($"log_id").collect()
    assert(got.nonEmpty)

    // identical scoring with the original in-memory model
    val incrOrig = Enrich.incrementalBatch(spark, sf, model,
      centroids2, lo = 700, hi = 900)
      .select($"log_id", $"cluster_id", $"semantic_group")
      .orderBy($"log_id").collect()
    assert(got.map(_.toString).sameElements(incrOrig.map(_.toString)))
    assert(enriched.count() > 0)
  }

  test("partitioned sink: partition pruning reaches the scan (A7 at scale)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    graft.ops.Tables.events(spark, sf)
      .withColumn("ts", unix_micros($"ts")) // plain column for rewrite
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val read = spark.read.parquet(dir).filter($"event_type" === "error")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type"), s"no partition pruning:\n$plan")
    val expected = graft.ops.Tables.events(spark, sf)
      .filter($"event_type" === "error").count()
    assert(read.count() == expected)
  }

  test("IVF-SQ store: pair-atomic publish, backup fallback (A12/A13)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ivfrt").toString
    val e = graft.ops.Tables.embeddings(spark, sf)
    def build(df: org.apache.spark.sql.DataFrame) = {
      val cents = graft.llm.Ivf.fitCentroids(df, "vec_id", "embedding",
        nlist = 4)
      (graft.llm.Quantize.withInt8(
        graft.llm.Ivf.assignIndex(df, "vec_id", "embedding", cents), "v")
        .drop("v"), cents)
    }
    def snap(lists: org.apache.spark.sql.DataFrame) = lists
      .select($"id", $"list_id", $"qnorm").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    // v1 over the even half, v2 over everything: different content
    val (idx1, c1) = build(e.filter($"vec_id" % 2 === 0))
    graft.llm.Ivf.saveIndex(idx1, c1, root)
    val v1 = snap(graft.llm.Ivf.loadIndex(spark, root)._1)
    assert(v1 == snap(idx1))

    val (idx2, c2) = build(e)
    graft.llm.Ivf.saveIndex(idx2, c2, root)
    val (lists2, cents2) = graft.llm.Ivf.loadIndex(spark, root)
    assert(snap(lists2) == snap(idx2) && v1 != snap(lists2))
    assert(cents2.collect().map(_.getInt(0)).sorted.sameElements(0 until 4))

    // crash window: prod vanished mid-publish -> the PAIR falls back to
    // backup (v1) together; per-table fallback could tear the pair
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(root, "ivfsq"))
    val (listsB, centsB) = graft.llm.Ivf.loadIndex(spark, root)
    assert(snap(listsB) == v1)
    assert(centsB.count() == 4)
  }

  test("catalog pointer: a multi-artifact transaction is invisible " +
      "until the one pointer swap, and the catalog drives vacuum") {
    import spark.implicits._
    val root = graft.util.Fs.tempRoot("graft_cat_spec").toString
    def save(nm: String, v: Long): Unit = graft.state.ModelStore.save(
      Seq((1L, v)).toDF("k", "value"), root, nm)
    def readVia(cat: Map[String, String], art: String): Long =
      graft.state.ModelStore.load(spark, root, cat(art))
        .head.getLong(1)
    def catalog(): Map[String, String] =
      graft.state.ModelStore.load(spark, root, "catalog")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // v1 of both artifacts + pointer
    save("tab_v1", 10L); save("view_v1", 100L)
    graft.state.ModelStore.save(
      Seq(("table", "tab_v1"), ("view", "view_v1"))
        .toDF("artifact", "version"), root, "catalog")
    // the transaction publishes BOTH v2 artifacts — a reader resolving
    // the catalog still sees the v1 PAIR (nothing references v2 yet)
    save("tab_v2", 20L); save("view_v2", 200L)
    val before = catalog()
    assert(readVia(before, "table") == 10L &&
      readVia(before, "view") == 100L,
      "unswapped reader saw an unreferenced version")
    // ONE pointer swap makes both live together
    graft.state.ModelStore.save(
      Seq(("table", "tab_v2"), ("view", "view_v2"))
        .toDF("artifact", "version"), root, "catalog")
    val after = catalog()
    assert(readVia(after, "table") == 20L &&
      readVia(after, "view") == 200L)
    // retention composes: the catalog's entries ARE the keep-set
    val retired = graft.state.ModelStore.vacuum(root,
      keep = after.values.toSet + "catalog")
    assert(retired.sorted == Seq("tab_v1", "view_v1"), retired.toString)
    assert(readVia(catalog(), "table") == 20L &&
      readVia(catalog(), "view") == 200L,
      "vacuum broke a catalog-referenced artifact")
  }
}
