package graft.ext

import org.apache.spark.sql.Row
import graft.SparkSpec

class BpeSpec extends SparkSpec {

  private def docs(texts: String*) =
    df("doc_id BIGINT, text STRING",
      texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) })

  test("wordDict: lowercase whitespace tokens with counts") {
    val d = Bpe.wordDict(docs("Foo bar  foo", "bar"))
    assert(rowSet(d) == rows(Seq("bar", "2"), Seq("foo", "2")))
  }

  // hand-traced: dict = {aaab: 2, ab: 1}
  //   round 1 pairs: (a,a) -> 2 words' positions 1,2 x freq 2 = 4;
  //                  (a,b) -> aaab pos3 (2) + ab pos1 (1) = 3 -> top (a,a), 4
  //   greedy on aaab: matches {1,2} are one run -> take 1 only
  //     -> aaab = [aa, a, b]
  //   round 2 pairs: (aa,a)=2, (a,b)=3 -> top (a,b), 3 -> aaab=[aa,ab], ab=[ab]
  //   round 3 pairs: (aa,ab)=2 -> top (aa,ab), 2
  test("learnMerges: hand-traced greedy with overlapping doubled-symbol run") {
    val out = Bpe.learnMerges(docs("aaab aaab ab"), nMerges = 3)
    assert(rowSet(out) == rows(
      Seq("1", "a", "a", "4"),
      Seq("2", "a", "b", "3"),
      Seq("3", "aa", "ab", "2")))
  }

  test("learnMerges stops early when the dict runs out of pairs") {
    // single 2-char word: one merge possible, then no pairs remain
    val out = Bpe.learnMerges(docs("ab ab"), nMerges = 5)
    assert(rowSet(out) == rows(Seq("1", "a", "b", "2")))
  }

  test("tie-break is lexicographic on (pair_a, pair_b)") {
    // "xy" and "ab" both have count 1 -> (a,b) wins over (x,y)
    val out = Bpe.learnMerges(docs("xy ab"), nMerges = 1)
    assert(rowSet(out) == rows(Seq("1", "a", "b", "1")))
  }

  test("tokenCounts: per-doc counts shrink as merges apply") {
    // merges from {aaab:2, ab:1}: (a,a), (a,b), (aa,ab) — aaab → 1 token,
    // ab → [ab] → 1 token. doc0 = "aaab aaab ab" → 3; doc1 = "ab" → 1
    val out = Bpe.tokenCounts(docs("aaab aaab ab", "ab"), nMerges = 3)
    assert(rowSet(out) == rows(Seq("0", "3"), Seq("1", "1")))
  }
}
