import org.apache.spark.sql.functions._
object Prof270 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = graft.Tables.documents(spark, d)
      .filter(graft.ext.Dedup.affineHash(col("doc_id"), 7) % 1000 < 300)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[$name] ${(System.nanoTime()-t0)/1e9}%.2fs n=$n")
    }
    val k = 16
    val sigs = graft.ext.Dedup.minHashSignatures(docs, k)
    val uni = graft.ext.Dedup.minHashCandidatePairs(sigs, k, 4)
    val sa = sigs.select(col("doc_id").as("id_a") +: (0 until k).map(j => col(s"h$j").as(s"a$j")): _*)
    val sb = sigs.select(col("doc_id").as("id_b") +: (0 until k).map(j => col(s"h$j").as(s"b$j")): _*)
    val sharr = docs.select(col("doc_id"),
      graft.functions.ShingleFunctions.shingleCodes(col("text")).as("__sh"))
    val j1 = uni.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
    t("j_sigs")(j1.count())
    val j2 = j1.join(sharr.select(col("doc_id").as("id_a"), col("__sh").as("sha")), Seq("id_a"))
               .join(sharr.select(col("doc_id").as("id_b"), col("__sh").as("shb")), Seq("id_b"))
    t("j_arr")(j2.count())
    val j3 = j2.withColumn("inter", size(array_intersect(col("sha"), col("shb"))).cast("long"))
    t("intersect")(j3.filter(col("inter") >= 0).count())
    t("intersect2")(j3.filter(col("inter") >= 0).count())
    spark.stop()
  }
}
