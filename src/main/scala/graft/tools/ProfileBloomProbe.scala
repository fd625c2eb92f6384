package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the two Bloom-consult strategies
  * ([[graft.llm.Layout.consultBlooms]] — r13 verdict item 4): the
  * driver bit-test (collect the Bloom table, loop) vs the distributed
  * membership join (Bloom table stays a DataFrame, hashed probe
  * positions broadcast), at file counts far beyond any fixture store —
  * the 10⁵-file shape where the collected cache is a 50–500 MB driver
  * object and the probe loop a single-threaded scan.
  *
  * The Bloom table is synthesized directly (file_id × 64 words, three
  * deterministic hash-derived bits per word ≈ the ~5% word density a
  * few hundred keys per file produce) — membership truth is irrelevant
  * to the timing question; BOTH paths must and do return the identical
  * touched set over it, which the harness asserts. Usage:
  *
  *   runMain graft.tools.ProfileBloomProbe [nFiles] [nProbes]
  */
object ProfileBloomProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toLong).getOrElse(200000L)
    val nProbes = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val bpw = graft.llm.Sketch.BloomBitsPerWord
    val root = graft.util.Fs.tempRoot("graft_bloomprof").toString
    // synthesize <root>/events_big/bloom in the stored-layout schema
    spark.range(nFiles * graft.llm.Layout.BloomWords)
      .select(($"id" / graft.llm.Layout.BloomWords).cast("long")
          .as("file_id"),
        ($"id" % graft.llm.Layout.BloomWords).cast("long").as("word"),
        expr(s"shiftleft(1L, CAST(pmod(hash(id), $bpw) AS INT)) | " +
          s"shiftleft(1L, CAST(pmod(hash(id * 31 + 7), $bpw) AS INT)) | " +
          s"shiftleft(1L, CAST(pmod(hash(id * 131 + 13), $bpw) AS INT))")
          .as("bits"))
      .repartition(32)
      .write.parquet(s"$root/events_big/bloom")

    val probes = (0 until nProbes).map(i => (i * 7919L + 3L).toString)
    val key = graft.llm.Layout.BloomDriverMaxFilesKey
    def timed(path: String, conf: String): (Double, Int) = {
      spark.conf.set(key, conf)
      val t0 = System.nanoTime()
      val (all, touched) = graft.llm.Layout.consultBlooms(spark, root,
        "events_big", probes)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"path":"$path","n_files":${all.size},""" +
        f""""n_probes":$nProbes,"touched":${touched.size},""" +
        f""""sec":$sec%.3f}""")
      (sec, touched.size)
    }
    // optional path subset (3rd arg, comma-separated): at 10⁶ files the
    // DRIVER path is expected to OOM the 8g default heap (64M collected
    // rows) — which is itself the measurement; run "distributed" alone
    // to show the join path survives the same store
    val which = args.drop(2).headOption.getOrElse("driver,distributed")
      .split(",").map(_.trim).toSet
    // warm the selected code paths once on a tiny probe set
    if (which("driver")) {
      spark.conf.set(key, Long.MaxValue.toString)
      graft.llm.Layout.consultBlooms(spark, root, "events_big",
        probes.take(2))
    }
    if (which("distributed")) {
      spark.conf.set(key, "0")
      graft.llm.Layout.consultBlooms(spark, root, "events_big",
        probes.take(2))
    }
    val d = if (which("driver"))
      Some(timed("driver", Long.MaxValue.toString)) else None
    val j = if (which("distributed"))
      Some(timed("distributed", "0")) else None
    (d, j) match {
      case (Some((dSec, dT)), Some((jSec, jT))) =>
        require(dT == jT, s"paths diverged: driver=$dT distributed=$jT")
        println(f"""{"speedup_driver_over_join":${dSec / jSec}%.2f}""")
      case _ => ()
    }

    // the PER-KEY planner consult (q235/q257's read path — r14 verdict
    // item 3): same store, same probes, prediction pairs instead of
    // the union
    def timedPerKey(path: String, conf: String): (Double, Set[(String, Long)]) = {
      spark.conf.set(key, conf)
      val t0 = System.nanoTime()
      val (all, pairs) = graft.llm.Layout.consultBloomsPerKey(spark,
        root, "events_big", probes)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"path":"$path","per_key":true,"n_files":${all.size},""" +
        f""""n_probes":$nProbes,"pairs":${pairs.size},"sec":$sec%.3f}""")
      (sec, pairs.toSet)
    }
    val dp = if (which("driver"))
      Some(timedPerKey("driver", Long.MaxValue.toString)) else None
    val jp = if (which("distributed"))
      Some(timedPerKey("distributed", "0")) else None
    (dp, jp) match {
      case (Some((dSec, dP)), Some((jSec, jP))) =>
        require(dP == jP,
          s"per-key paths diverged: ${dP.size} vs ${jP.size} pairs")
        println(
          f"""{"per_key_speedup_driver_over_join":${dSec / jSec}%.2f}""")
      case _ => ()
    }
    spark.stop()
  }
}
