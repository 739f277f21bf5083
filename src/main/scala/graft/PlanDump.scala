package graft

/** Dev utility: print the formatted physical plan of registered queries.
  *
  * Usage: `sbt "runMain graft.PlanDump <sfDir> [queryName ...]"` — no
  * names = every query. Output feeds PLANS.md; the point is reviewing
  * exchanges, pushed filters, and codegen spans before calling an
  * operator done.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.builder("local[4]", 4, "graft-plandump")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n## $n\n")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
