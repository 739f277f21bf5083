package graft
/** Dev scratch: execute a query and print its FINAL adaptive plan. */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.builder("local[8]", 8, "graft-finalplan")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect()
      println(s"\n## $n FINAL\n")
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
