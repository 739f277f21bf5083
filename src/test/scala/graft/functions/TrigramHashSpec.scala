package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Dedup

/** Pins the native `graft_trigram_hashes` expression to the composed
  * `split → codepoints → transform(mixHash(trigram))` formulation it
  * replaces in winnowing and content-defined chunking: bit-identical
  * arrays on every shape (empty, sub-trigram, repeated, BMP non-ASCII),
  * so the q180/q234 oracles transfer to the native form unchanged.
  */
class TrigramHashSpec extends SparkSpec {

  private def composed(textCol: org.apache.spark.sql.Column) = {
    val cps = transform(split(textCol, ""), c => ascii(c).cast("long"))
    when(size(cps) - 2 >= 1,
      transform(sequence(lit(1), greatest(size(cps) - 2, lit(1))),
        i => Dedup.mixHash(
          element_at(cps, i) * 65536L +
            element_at(cps, i + 1) * 256L +
            element_at(cps, i + 2), Dedup.WinnowJ)))
      .otherwise(array().cast("array<bigint>"))
  }

  test("native trigram hashes ≡ composed split/transform/mixHash form") {
    val texts = Seq("", "a", "ab", "abc", "abcd", "hello world, hello world",
      "aaaaaaaaaa", "Ünïcodé tèxt £€¥ mixed in", "tab\tand\nnewline",
      "the quick brown fox jumps over the lazy dog" * 4)
    val d = df("id BIGINT, text STRING",
      texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) })
    val out = d.select(col("id"),
        ShingleFunctions.trigramHashes(col("text"), Dedup.WinnowJ).as("native"),
        composed(col("text")).as("legacy"))
      .collect()
    out.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"mismatch for text #${r.getLong(0)}")
    }
    // non-degenerate fixture: the long texts must produce hashes
    assert(out.map(_.getSeq[Long](1).size).max > 100)
  }

  test("null text yields null (explode/filter semantics unchanged downstream)") {
    val d = df("id BIGINT, text STRING", Seq(Row(1L, null)))
    assert(d.select(ShingleFunctions.trigramHashes(col("text"), Dedup.WinnowJ))
      .collect().head.isNullAt(0))
  }

  test("expression stays inside whole-stage codegen") {
    // range-based input: a one-row LocalTableScan never enters codegen
    // regardless of the expression, which would vacuously fail the assert
    val d = spark.range(4).selectExpr("repeat('abc', CAST(id AS INT)) AS text")
    val plan = d.select(ShingleFunctions.trigramHashes(col("text"), Dedup.WinnowJ))
      .queryExecution.executedPlan.toString
    // the `*(n)` node prefix IS the codegen marker in the compact plan
    // string (the long spelling only appears in explain("formatted"))
    assert(plan.linesIterator.next().trim.startsWith("*("), plan)
  }
}
