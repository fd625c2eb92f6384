package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: exercise scan + shuffle + codegen once on the smallest SF
    // so JIT/codegen startup isn't charged to whichever query runs first
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // optional subset (comma-separated names) for scale-stress runs where
    // the deliberate O(N²) correctness baselines (q22/q30/q44) would
    // dominate; default = every query (the driver's surface)
    val subset = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    // a typo'd name would silently shrink (or empty) the run and its
    // total would masquerade as a fast pass — fail loudly instead
    subset.foreach { s =>
      val unknown = s -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_QUERIES names unknown queries: ${unknown.mkString(",")}")
    }
    val selected = subset
      .map(s => SparkEntry.queries.filter { case (k, _) => s(k) })
      .getOrElse(SparkEntry.queries)
    // a failed query records -1 — time-to-exception must never masquerade
    // as a (fast) success in the benchmark totals
    def timeAll(): Map[String, Double] =
      selected.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }
    // two timed passes, per-query min of the SUCCESSFUL runs: standard
    // warm-measurement practice (single-pass numbers carry scheduler
    // noise); -1 only if both passes failed
    val p1 = timeAll()
    val p2 = timeAll()
    val results = p1.map { case (k, v1) =>
      val v2 = p2(k)
      k -> ((v1 >= 0, v2 >= 0) match {
        case (true, true) => math.min(v1, v2)
        case (true, false) => v1
        case (false, true) => v2
        case _ => -1.0
      })
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
