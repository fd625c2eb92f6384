import org.apache.spark.sql.SparkSession
object PlanDiff {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq("q97_corpus_pipeline", "q121_split_capstone")) {
      val p = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      println(s"===== $n")
      p.linesIterator.filter(_.contains("Exchange")).foreach(l => println(l.trim.take(160)))
    }
    spark.stop()
  }
}
