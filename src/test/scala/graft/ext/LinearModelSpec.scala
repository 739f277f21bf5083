package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LinearModelSpec extends SparkSpec {

  // stopword-dense "good" text vs stop-free junk — separable on f3
  private val good = "the cat and the dog sat on the mat with a hat for a while"
  private val junk = "zxqv wklm pqrs tuvw xyza bcde fghi jklm nopq rstu"

  private def corpus = {
    import spark.implicits._
    (0L until 60L).map(i => (i, if (i % 3 == 0) junk else good))
      .toDF("doc_id", "text")
  }

  test("separable labels: the trained model classifies the corpus perfectly") {
    val positive = col("text") === good
    val e = LinearModel.perceptronEval(corpus, positive, epochs = 8).head()
    val (tp, fp, tn, fn) = (e.getLong(0), e.getLong(1), e.getLong(2), e.getLong(3))
    assert(fp == 0L && fn == 0L, s"separable data must fit exactly: $e")
    assert(tp == 40L && tn == 20L)
  }

  test("learned direction: stopword-hit weight positive for the stopword-rich class") {
    val w = LinearModel.perceptronWeights(corpus, col("text") === good, epochs = 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(w(3) > 0, s"stop_hits must drive the positive class: $w")
  }

  test("training is repartition-invariant (commutative batch gradient)") {
    val positive = TextAnalysis.qualityScore(col("text")) >= 0.5
    val a = LinearModel.perceptronWeights(corpus, positive, epochs = 6)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b = LinearModel.perceptronWeights(corpus.repartition(7), positive, epochs = 6)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("pocket: never worse than the all-one-class baseline on the gate label") {
    // the q254/q255 shape: distill the composed quality gate
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val positive = TextAnalysis.qualityScore(col("text")) >= 0.66
    val e = LinearModel.perceptronEval(docs, positive, epochs = 8).head()
    val (tp, fp, tn, fn) = (e.getLong(0), e.getLong(1), e.getLong(2), e.getLong(3))
    val n = tp + fp + tn + fn
    val majority = math.max(tp + fn, tn + fp) // best constant predictor
    assert(tp + tn >= majority,
      s"pocket must beat the majority baseline: acc=${tp + tn}/$n maj=$majority")
  }

  test("calibrationCurve: bands partition the corpus and tie out to the confusion") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val positive = TextAnalysis.qualityScore(col("text")) >= 0.66
    val curve = LinearModel.calibrationCurve(docs, positive, epochs = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val e = LinearModel.perceptronEval(docs, positive, epochs = 8).head()
    val (tp, fp, tn, fn) = (e.getLong(0), e.getLong(1), e.getLong(2), e.getLong(3))
    assert(curve.map(_._2).sum == tp + fp + tn + fn, "bands must partition the corpus")
    assert(curve.map(_._3).sum == tp + fn, "gate positives must total across bands")
    // band sign IS the prediction (margin > 0 ⇔ band > 0), so the curve's
    // positive side must reproduce the confusion's predicted-positive cell
    assert(curve.filter(_._1 > 0).map(_._2).sum == tp + fp)
    assert(curve.filter(_._1 > 0).map(_._3).sum == tp)
    assert(curve.forall { case (_, n2, pos) => pos >= 0 && pos <= n2 })
  }

  test("marginScores: one row per doc; margin>0 rows tie out to the confusion; AUC readout consistent") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val positive = TextAnalysis.qualityScore(col("text")) >= 0.66
    val scored = LinearModel.marginScores(docs, positive, epochs = 8)
    val e = LinearModel.perceptronEval(docs, positive, epochs = 8).head()
    val (tp, fp, tn, fn) = (e.getLong(0), e.getLong(1), e.getLong(2), e.getLong(3))
    assert(scored.count() == tp + fp + tn + fn)
    assert(scored.filter(col("margin") > 0 && col("y") === 1).count() == tp)
    assert(scored.filter(col("margin") > 0 && col("y") === -1).count() == fp)
    // AUC over the margins is a proper effect size: within (0, 1e6] here,
    // and above chance for a gate the pocket model beats majority on
    val auc = RankStats.rankSumAuc(
      scored.select(col("y").cast("string").as("grp"), col("margin")),
      col("grp"), "1", col("margin")).head().getLong(3)
    assert(auc > 500000L && auc <= 1000000L, s"auc_ppm=$auc")
  }
}
