package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.TextAnalysis

class RepetitionSpec extends SparkSpec {

  private def signals(texts: (Long, String)*) = {
    import spark.implicits._
    TextAnalysis.repetitionSignals(texts.toDF("doc_id", "text"))
  }

  test("hand-computed signals on a repetitive document") {
    // "a b a b a": words a×3 b×2; bigrams ab,ba,ab,ba; trigrams aba,bab,aba
    val r = signals(1L -> "a b a b a").head()
    assert(r.getLong(1) == 5L)
    assert(r.getDouble(2) == 0.6)      // top word a: 3/5
    assert(r.getDouble(3) == 0.6)      // dup mass: (5-2)/5
    assert(r.getDouble(4) == 0.5)      // top bigram: 2/4
    assert(r.getDouble(5) == 0.666667) // top trigram: 2/3 rounded
  }

  test("all-distinct words: zero dup mass, fractions fall out of the window counts") {
    val r = signals(1L -> "x y z").head()
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == 0.333333)
    assert(r.getDouble(3) == 0.0)
    assert(r.getDouble(4) == 0.5) // both bigrams unique: 1/2
    assert(r.getDouble(5) == 1.0) // single trigram
  }

  test("degenerate sizes: empty text and single word have zero n-gram fractions") {
    val out = signals(1L -> "", 2L -> "hello").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out(1L) == ((0L, 0.0, 0.0, 0.0)))
    assert(out(2L) == ((1L, 1.0, 0.0, 0.0)))
  }

  test("repeated whitespace does not manufacture empty-word tokens") {
    val r = signals(1L -> "  a   a  ").head()
    assert(r.getLong(1) == 2L)
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 0.5)
  }

  test("stays inside whole-stage codegen (narrow, zero exchanges)") {
    // a parquet-backed frame: a literal local frame constant-folds to a
    // LocalTableScan (the whole expression evaluated at plan time)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = TextAnalysis.repetitionSignals(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    assert(plan.contains("*(1)"), s"expected whole-stage codegen in:\n$plan")
  }
}
