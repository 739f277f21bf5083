package graft
// Ad-hoc single-query profiler: sbt "runMain graft.BenchOne q15_minhash_pairs /root/testdata/sf0.1 3"
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[$name run $i] ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
