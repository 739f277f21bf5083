package graft.ext

import org.apache.spark.sql.Row
import graft.SparkSpec

class CurateCleanSpec extends SparkSpec {

  test("dedupCascadeReport: stages chain, attrition is monotone, removed adds up") {
    val sf = "/root/testdata/sf0.001"
    val out = graft.ext.Curation.dedupCascadeReport(
        graft.Tables.documents(spark, sf), graft.Tables.embeddings(spark, sf))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set("exact", "minhash", "semantic"))
    val (e, m, s) = (out("exact"), out("minhash"), out("semantic"))
    // each stage consumes the previous stage's survivors
    assert(e._2 == m._1 && m._2 == s._1)
    // attrition only shrinks, never grows; removed is the difference
    Seq(e, m, s).foreach { case (in, outN, rem) =>
      assert(outN <= in && rem == in - outN && outN >= 1)
    }
    // exact stage sees the whole corpus
    assert(e._1 == graft.Tables.documents(spark, sf).count())
  }

  private def docs(rows: (Long, String)*) =
    df("doc_id BIGINT, text STRING", rows.map { case (i, t) => Row(i, t) })

  test("boilerplate is stripped BEFORE the LM trains (clean text scored, not raw)") {
    // "nav bar junk" is in every doc → boilerplate at chunk width 3; the
    // surviving content differs per doc
    val d = docs(
      1L -> "nav bar junk alpha beta gamma",
      2L -> "nav bar junk alpha beta delta", // content differs — only the nav chunk is df >= 2
      3L -> "nav bar junk delta epsilon zeta")
    val out = Curation.curateClean(d, chunkWords = 3, minDf = 2, minLogprob = -100.0)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "alpha beta gamma" && out(3L) == "delta epsilon zeta")
  }

  test("docs stripped to nothing fall out with the gate (null score)") {
    val d = docs(
      1L -> "shared shared shared",
      2L -> "shared shared shared", // both docs are ONE boilerplate chunk
      3L -> "unique words here live")
    val out = Curation.curateClean(d, chunkWords = 3, minDf = 2, minLogprob = -100.0)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("the log-prob gate keeps only docs at or above the threshold") {
    // doc 3 reverses the corpus-typical transitions → lowest score
    val d = docs(
      1L -> "the cat sat the cat sat",
      2L -> "the cat sat the cat sat the cat sat",
      3L -> "sat cat the sat cat the")
    val all = Curation.curateClean(d, 16, 2, minLogprob = -100.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(all.size == 3 && all(3L) < all(2L) && all(2L) < all(1L))
    val gated = Curation.curateClean(d, 16, 2, minLogprob = all(2L))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gated == Set(1L, 2L))
  }

  test("filterAttribution: hand-built corpus — exclusive vs shared kills") {
    val good = "the quick brown fox jumps over the lazy dog and then it runs " +
      "far away into the quiet green field while birds sing overhead today"
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, good),                    // passes every gate
      Row(2L, good),                    // exact dup of 1 — ONLY the dup gate
      Row(3L, "tiny"),                  // short AND low-quality (shared kill)
      Row(4L, "spam spam spam spam spam spam spam spam spam spam spam is " +
        "here again and again and again with more spam spam spam spam")))
    val out = Curation.filterAttribution(d, minTokens = 10,
        minQuality = 0.5, maxTopWordFrac = 0.2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("exact_dup")._1 == 1L && out("exact_dup")._2 == 1L)
    assert(out("short") == (1L, 0L), "doc 3 is short but also low-quality")
    assert(out("repetitive")._1 >= 1L)
    assert(out.values.map(_._2).sum <= out.values.map(_._1).sum)
  }
}
