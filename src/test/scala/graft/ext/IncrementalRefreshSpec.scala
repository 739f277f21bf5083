package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class IncrementalRefreshSpec extends SparkSpec {

  // day split: doc_id % 20 < 18 → day 1; ids 18, 19, 38, 39 are "day 2"
  private def corpus = {
    val texts: Long => String = {
      case 18L => "alpha beta gamma"            // exact dup of day-1 doc 1
      case 19L => "hello brand new crawl text"  // within-day-2 dup with 39
      case 39L => "hello brand new crawl text"
      case 38L => "completely novel document"   // novel unique
      case 1L  => "alpha beta gamma"
      case i   => s"day one doc $i with ${"w " * (i % 7).toInt}tokens"
    }
    df("doc_id BIGINT, text STRING",
      (1L to 40L).map(i => Row(i, texts(i))))
  }

  test("incrementalRefresh: dup/novelty accounting matches the planted corpus") {
    val out = Curation.incrementalRefresh(corpus).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("n_day1") == 36L && out("n_day2") == 4L)
    assert(out("day2_dup_vs_day1") == 1L, "doc 18 duplicates day-1 doc 1")
    assert(out("day2_redundant_within") == 1L, "39 repeats 19")
    assert(out("day2_novel_unique") == 2L, "fp(19/39) once + fp(38)")
  }

  test("incrementalRefresh: merged-sketch quantiles ≡ from-scratch sketch over the union") {
    // the oracle proves this cross-engine; this pins it in-engine — the
    // histogram merged from per-day sketches must answer ranks exactly
    // like one histogram built over all rows at once
    val all = corpus.select(
      lit("all").as("g"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("toks"))
    val scratch = Sketch.logHistQuantiles(
        Sketch.logHistogram(all, col("toks"), Seq("g")), Seq("g"))
      .select(concat(lit("p"), col("quantile"), lit("_tokens")).as("metric"),
        col("est").as("value"))
    val inc = Curation.incrementalRefresh(corpus)
      .filter(col("metric").startsWith("p"))
    assertSameRows(inc, scratch)
  }
}
