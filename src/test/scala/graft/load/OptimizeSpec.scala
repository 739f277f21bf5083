package graft.load

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Layout

/** The audit→actuator contract: [[Sinks.optimize]] must (a) pick the
  * layout the audit's decision table says wins, (b) produce exactly one
  * file per bin, and (c) write files whose ACTUAL per-bin key envelopes
  * equal the manifest's prediction row-for-row — the property that lets a
  * scan planner trust the manifest without reading footers.
  */
class OptimizeSpec extends SparkSpec {

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("graft_opt").toString + "/tbl"
    // keys deliberately correlated with neither sort order in a trivial
    // way: ka cycles fast, kb is a bit-scrambled permutation — the shape
    // where a 2-D curve layout beats linear on A for dim-b probes
    spark.range(4096).toDF("id")
      .withColumn("ka", pmod(col("id") * 37, lit(256L)))
      .withColumn("kb", pmod(col("id") * 101 + 13, lit(256L)))
      .withColumn("payload", col("id") * 3)
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("optimize: winner chosen by min total files_hit, one file per bin, envelopes match manifest") {
    val dir = freshTable()
    val src = spark.read.parquet(dir)
    val audit = Layout.curveAudit(src, "ka", "kb", "id", nFiles = 16, bits = 8)
      .localCheckpoint(true)
    val expectedWinner = audit.collect()
      .groupBy(_.getAs[String]("layout"))
      .view.mapValues(_.map(_.getAs[Long]("files_hit")).sum)
      .toSeq.sortBy { case (l, h) => (h, l) }.head._1

    val manifest = Sinks.optimize(spark, dir, "ka", "kb", "id", audit,
      nFiles = 16, bits = 8)
    assert(manifest.select("layout").distinct().collect()
      .map(_.getString(0)).toSeq == Seq(expectedWinner))

    // one parquet file per bin directory, 16 bins
    val root = new java.io.File(dir)
    val binDirs = root.listFiles().filter(_.getName.startsWith("part_bin="))
    assert(binDirs.length == 16, s"expected 16 bin dirs, got ${binDirs.length}")
    binDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
    }

    // actual per-bin envelopes (masked keys) equal the manifest prediction
    val actual = spark.read.parquet(dir)
      .withColumn("mka", col("ka").cast("long") % 256)
      .withColumn("mkb", col("kb").cast("long") % 256)
      .groupBy("part_bin")
      .agg(count(lit(1)).as("n_rows"),
        min("mka").as("min_a"), max("mka").as("max_a"),
        min("mkb").as("min_b"), max("mkb").as("max_b"))
      .withColumn("layout", lit(expectedWinner))
      .select("layout", "part_bin", "n_rows", "min_a", "max_a", "min_b", "max_b")
    assertSameRows(manifest, actual)

    // the manifest is also persisted next to the table
    val persisted = spark.read.parquet(dir + "_manifest")
    assertSameRows(manifest, persisted)

    // row conservation through the rewrite
    assert(spark.read.parquet(dir).count() == 4096L)
  }

  test("optimize: rewritten table's scan with a bin-pruning predicate reads intact data") {
    val dir = freshTable()
    val src = spark.read.parquet(dir)
    val audit = Layout.skippingAudit(src, "ka", "kb", "id", nFiles = 8, bits = 8)
    Sinks.optimize(spark, dir, "ka", "kb", "id", audit, nFiles = 8, bits = 8)
    val back = spark.read.parquet(dir)
    // payload survives byte-exact under the swap
    assert(back.agg(sum("payload")).head().getLong(0)
      == (0L until 4096L).map(_ * 3).sum)
    // partition pruning on the manifest key works (dir-level pruning)
    assert(back.filter(col("part_bin") === 0).count() > 0)
  }
}
