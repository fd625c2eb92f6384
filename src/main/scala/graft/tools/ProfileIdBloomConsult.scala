package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the two id-Bloom consult strategies of the
  * index-maintenance removal arm ([[graft.llm.Ivf.consultIdBlooms]] —
  * r14 verdict item 5): the driver bit-test (collect nlist × 64 longs,
  * loop ids × lists single-threaded) vs the distributed membership
  * join, at an nlist far beyond any real coarse-quantizer fan-out —
  * the synthetic 10⁵-list shape where the driver cache is ~50 MB and
  * the probe loop is the bottleneck. The idbloom table is synthesized
  * directly (same deterministic three-bits-per-word density as
  * [[ProfileBloomProbe]] — membership truth is irrelevant to the
  * timing question); both paths must and do return the identical
  * touched set, which the harness asserts. Usage:
  *
  *   runMain graft.tools.ProfileIdBloomConsult [nLists] [nIds]
  */
object ProfileIdBloomConsult {
  def main(args: Array[String]): Unit = {
    val nLists = args.headOption.map(_.toInt).getOrElse(100000)
    val nIds = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
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
    val words = graft.llm.Layout.BloomWords
    val root = graft.util.Fs.tempRoot("graft_idbloomprof").toString
    spark.range(nLists.toLong * words)
      .select(($"id" / words).cast("int").as("list_id"),
        ($"id" % words).cast("long").as("word"),
        expr(s"shiftleft(1L, CAST(pmod(hash(id), $bpw) AS INT)) | " +
          s"shiftleft(1L, CAST(pmod(hash(id * 31 + 7), $bpw) AS INT)) | " +
          s"shiftleft(1L, CAST(pmod(hash(id * 131 + 13), $bpw) AS INT))")
          .as("bits"))
      .repartition(32)
      .write.parquet(s"$root/ivfbig/idbloom")

    val allLists = (0 until nLists).toSeq
    val ids = (0 until nIds).map(i => i * 7919L + 3L)
    val key = graft.llm.Layout.BloomDriverMaxFilesKey
    def timed(path: String, conf: String): (Double, Seq[Int]) = {
      spark.conf.set(key, conf)
      val t0 = System.nanoTime()
      val touched = graft.llm.Ivf.consultIdBlooms(spark, root, "ivfbig",
        allLists, ids)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"path":"$path","n_lists":$nLists,"n_ids":$nIds,""" +
        f""""touched":${touched.size},"sec":$sec%.3f}""")
      (sec, touched)
    }
    // warm both code paths on a tiny id set
    spark.conf.set(key, Long.MaxValue.toString)
    graft.llm.Ivf.consultIdBlooms(spark, root, "ivfbig", allLists,
      ids.take(2))
    spark.conf.set(key, "0")
    graft.llm.Ivf.consultIdBlooms(spark, root, "ivfbig", allLists,
      ids.take(2))
    val (dSec, dT) = timed("driver", Long.MaxValue.toString)
    val (jSec, jT) = timed("distributed", "0")
    require(dT.sorted == jT.sorted,
      s"paths diverged: driver=${dT.size} distributed=${jT.size}")
    println(f"""{"speedup_driver_over_join":${dSec / jSec}%.2f}""")
    spark.stop()
  }
}
