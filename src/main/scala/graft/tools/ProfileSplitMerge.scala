package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Layout

/** Measurement harness for the split-on-budget fan-out (r13 verdict
  * item 2 — "q242/q240 re-measured at ×100 with bytes-per-commit ∝
  * delta fan-out, not table size"). Runs the q240-style MERGE on the
  * FIXED 64-tile store and on the SPLIT store, for two delta shapes:
  *
  *  - the q240 fixture delta (every ~131st event) — DENSE in zkey
  *    space, so it touches ~every tile under ANY partitioning: the
  *    honest negative control (splitting fixes fan-out cost, not
  *    density — BASELINE §65's caveat restated precisely);
  *  - a LOCALIZED delta (the same mutation mix restricted to one zkey
  *    stripe — the late-arriving time-window/user-cohort shape real
  *    ingest repair ships) — where the fixed grid rounds the rewrite
  *    up to coarse 156k-row files and the split store rewrites only
  *    the right-sized tiles the stripe actually spans.
  *
  * Reports per commit: files touched / total, incumbent rows REWRITTEN
  * (the write-amplification bytes), and wall seconds.
  *
  * Usage: runMain graft.tools.ProfileSplitMerge <eventsDir> [budget]
  * (eventsDir e.g. a gen_stress.py ×100 decade of sf0.1)
  */
object ProfileSplitMerge {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sfx100")
    val budget = args.drop(1).headOption.map(_.toLong).getOrElse(20000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val laid = Layout.eventLayout(graft.ops.Tables.events(spark, d))
    val root = graft.util.Fs.tempRoot("graft_splitprof").toString
    Layout.saveLayout(laid, root)
    val (v1, _) = Layout.loadLayout(spark, root)
    val total = v1.count()
    println(s"""{"store_rows":$total,"budget":$budget}""")
    val off = 1000000000000L
    def mix(src: org.apache.spark.sql.DataFrame) =
      src.filter($"event_id" % 131 === 3)
        .withColumn("event_id", $"event_id" + off)
        .unionByName(src.filter($"event_id" % 131 === 5))
    val dense = mix(v1).localCheckpoint()
    // the localized shape: the same mix restricted to a SUB-TILE zkey
    // stripe (a late time-window sliver inside base tile 0) — the case
    // where the fixed grid rounds the rewrite up to a whole coarse
    // file and the split store rewrites only the right-sized child
    val local = mix(v1.filter($"zkey" < 100)).localCheckpoint()

    def upsert(store: String, delta: org.apache.spark.sql.DataFrame,
        newName: String, label: String): Unit = {
      val routed = Layout.routeToStore(spark, root, store, delta,
        "file_z").localCheckpoint()
      val t0 = System.nanoTime()
      val res = Layout.upsertRows(spark, root, store, "file_z", routed,
        newName)
      val sec = (System.nanoTime() - t0) / 1e9
      // write amplification: incumbent rows living in rewritten tiles
      val (v, _) = Layout.loadLayout(spark, root, store)
      val rewritten = v.filter(col("file_z").isin(res.touched: _*)).count()
      println(f"""{"commit":"$label","delta":${routed.count()},""" +
        f""""files_touched":${res.touched.size},""" +
        f""""files_total":${res.touched.size + res.untouched.size},""" +
        f""""incumbent_rows_rewritten":$rewritten,"sec":$sec%.1f}""")
    }

    upsert("events_z", dense, "fix_dense", "fixed64_dense")
    upsert("events_z", local, "fix_local", "fixed64_localized")
    val t0 = System.nanoTime()
    val sp = Layout.splitOnBudget(spark, root, "events_z", "file_z",
      budget, "events_z_sp")
    println(f"""{"commit":"split","files_split":${sp.split.size},""" +
      f""""files_after":${sp.filesAfter},""" +
      f""""sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")
    upsert("events_z_sp", dense, "sp_dense", "split_dense")
    upsert("events_z_sp", local, "sp_local", "split_localized")
    spark.stop()
  }
}
