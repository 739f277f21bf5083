package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SuffixDedupSpec extends SparkSpec {

  private def docs(texts: (Long, String)*): DataFrame =
    df("doc_id BIGINT, text STRING", texts.map { case (i, t) => Row(i, t) })

  /** Brute-force reference: maximal duplicated spans via direct window
    * counting in driver-side Scala — the O(n·L) spelling the distributed
    * doubling must agree with exactly.
    */
  private def bruteSpans(texts: Seq[(Long, String)], minLen: Int): Set[(Long, Long, Long)] = {
    val toks = texts.map { case (i, t) =>
      i -> t.trim.split("\\s+").filter(_.nonEmpty).toSeq
    }
    val counts = scala.collection.mutable.Map.empty[Seq[String], Int]
    for ((_, ws) <- toks; p <- 0 to ws.length - minLen)
      counts.updateWith(ws.slice(p, p + minLen))(c => Some(c.getOrElse(0) + 1))
    toks.flatMap { case (id, ws) =>
      val dupStarts = (0 to ws.length - minLen)
        .filter(p => counts(ws.slice(p, p + minLen)) >= 2)
      // islands over consecutive starts
      val spans = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
      var i = 0
      while (i < dupStarts.length) {
        var j = i
        while (j + 1 < dupStarts.length && dupStarts(j + 1) == dupStarts(j) + 1) j += 1
        spans += ((id, dupStarts(i) + 1L, (dupStarts(j) - dupStarts(i) + minLen).toLong))
        i = j + 1
      }
      spans
    }.toSet
  }

  private def spanSet(d: DataFrame): Set[(Long, Long, Long)] =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("windowClasses: active-position pruning keeps EXACTLY the duplicated-class members") {
    // The optimization-round invariant behind dupWindowPositions: the
    // class relation is pruned to members of ≥ 2-member classes, with
    // full membership — assert both directions against brute force on a
    // corpus with singleton, cross-doc, and same-doc-repeat windows.
    val corpus = Seq(
      1L -> "a b c d e u1 u2 u3 u4 u5 a b c d e",       // self-repeat
      2L -> "z1 a b c d e z2 z3 z4 z5 z6",              // cross-doc copy
      3L -> "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")           // all singleton
    val minLen = 5
    val got = SuffixDedup.dupWindowPositions(docs(corpus: _*), minLen,
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: every 1-based position whose minLen-window text occurs
    // ≥ 2 times anywhere in the corpus
    val toks = corpus.map { case (i, t) =>
      i -> t.trim.split("\\s+").filter(_.nonEmpty).toSeq }
    val counts = scala.collection.mutable.Map.empty[Seq[String], Int]
    for ((_, ws) <- toks; p <- 0 to ws.length - minLen)
      counts.updateWith(ws.slice(p, p + minLen))(c => Some(c.getOrElse(0) + 1))
    val expected = toks.flatMap { case (id, ws) =>
      (0 to ws.length - minLen)
        .filter(p => counts(ws.slice(p, p + minLen)) >= 2)
        .map(p => (id, p + 1L))
    }.toSet
    assert(got == expected)
    assert(expected.nonEmpty && !got.exists(_._1 == 3L)) // singletons pruned
  }

  test("dupSpans: hand corpus — shared 8-token block found, maximal, 1-based") {
    val shared = "a b c d e f g h"
    val corpus = Seq(
      1L -> s"x1 x2 $shared y1 y2",
      2L -> s"z1 $shared z2 z3 z4")
    val spans = spanSet(SuffixDedup.dupSpans(docs(corpus: _*), minLen = 8))
    assert(spans == Set((1L, 3L, 8L), (2L, 2L, 8L)))
  }

  test("dupSpans: longer shared block merges into one maximal span, not window-many") {
    // 10 shared tokens at L=8 → 3 consecutive dup starts → ONE span of 10
    val shared = "a b c d e f g h i j"
    val corpus = Seq(1L -> s"u1 u2 u3 $shared", 2L -> s"$shared v1")
    val spans = spanSet(SuffixDedup.dupSpans(docs(corpus: _*), minLen = 8))
    assert(spans == Set((1L, 4L, 10L), (2L, 1L, 10L)))
  }

  test("dupSpans: self-repetition within ONE doc is duplication (Lee et al. semantics)") {
    val block = "p q r s t u v w"
    val corpus = Seq(1L -> s"$block mid1 mid2 $block", 2L -> "unrelated words only here nothing shared at all")
    val spans = spanSet(SuffixDedup.dupSpans(docs(corpus: _*), minLen = 8))
    assert(spans == Set((1L, 1L, 8L), (1L, 11L, 8L)))
  }

  test("dupSpans: non-power-of-two minLen exercises the overlapped final combine") {
    // L = 6: doubling reaches 4, final shift = 2. A 6-token shared block
    // must be found; a 5-token shared block must NOT.
    val six = "a b c d e f"
    val five = "k l m n o"
    val corpus = Seq(
      1L -> s"$six x $five",
      2L -> s"y $six z $five w")
    val spans = spanSet(SuffixDedup.dupSpans(docs(corpus: _*), minLen = 6))
    assert(spans == Set((1L, 1L, 6L), (2L, 2L, 6L)))
  }

  test("dupSpans: matches brute force on a deterministic random corpus (both L=8 and L=6)") {
    val rnd = new scala.util.Random(42)
    // small vocab forces accidental repeats; planted block forces real ones
    val planted = (1 to 9).map(i => s"P$i").mkString(" ")
    val corpus = (1L to 12L).map { id =>
      val words = Seq.fill(30)(s"w${rnd.nextInt(12)}").mkString(" ")
      id -> (if (id % 3 == 0) s"$words $planted" else words)
    }
    for (l <- Seq(6, 8)) {
      val got = spanSet(SuffixDedup.dupSpans(docs(corpus: _*), minLen = l))
      assert(got == bruteSpans(corpus, l), s"mismatch at minLen=$l")
    }
  }

  test("dupSpans: editing a token OUTSIDE every dup span changes no verdict") {
    val shared = "a b c d e f g h"
    val base = Seq(1L -> s"x1 x2 $shared y1 y2", 2L -> s"z1 $shared z2 z3 z4")
    val before = spanSet(SuffixDedup.dupSpans(docs(base: _*), minLen = 8))
    // doc 1 span covers tokens 3..10; token 12 (y2) is off-span
    val edited = Seq(1L -> s"x1 x2 $shared y1 EDITED", 2L -> s"z1 $shared z2 z3 z4")
    val after = spanSet(SuffixDedup.dupSpans(docs(edited: _*), minLen = 8))
    assert(before == after)
  }

  test("dupSpanDocStats: every doc reported; coverage distinct-counts overlaps; ppm exact") {
    val shared = "a b c d e f g h i j" // 10 tokens, L=8 → 3 starts, 10 covered
    val corpus = Seq(
      1L -> s"u1 u2 $shared",          // 12 tokens, covered 10
      2L -> s"$shared v1 v2 v3",       // 13 tokens, covered 10
      3L -> "no duplication here at all just unique words")
    val r = SuffixDedup.dupSpanDocStats(docs(corpus: _*), minLen = 8)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5)))).toMap
    assert(r(1L) == ((12L, 1L, 3L, 10L, 10L * 1000000 / 12)))
    assert(r(2L) == ((13L, 1L, 3L, 10L, 10L * 1000000 / 13)))
    assert(r(3L) == ((8L, 0L, 0L, 0L, 0L)))
  }

  test("topRepeats: representative is min (doc,pos); support counted over positions") {
    val block = "a b c d e f g h"
    val corpus = Seq(
      3L -> s"$block t1",
      1L -> s"t2 $block",   // min rep: doc 1, start 2
      2L -> s"$block t3")
    val r = SuffixDedup.topRepeats(docs(corpus: _*), minLen = 8, topK = 10).collect()
    assert(r.length == 1)
    assert(r(0).getLong(0) == 1L && r(0).getLong(1) == 2L)
    assert(r(0).getString(2) == block)
    assert(r(0).getLong(3) == 3L && r(0).getLong(4) == 3L)
  }

  test("dupSpans: layout-invariant under repartition") {
    val rnd = new scala.util.Random(7)
    val planted = (1 to 7).map(i => s"B$i").mkString(" ")
    val corpus = (1L to 10L).map { id =>
      val words = Seq.fill(40)(s"t${rnd.nextInt(9)}").mkString(" ")
      id -> (if (id % 2 == 0) s"$words $planted" else words)
    }
    val d1 = docs(corpus: _*)
    val a = spanSet(SuffixDedup.dupSpans(d1.repartition(1), minLen = 6))
    val b = spanSet(SuffixDedup.dupSpans(d1.repartition(13), minLen = 6))
    assert(a == b && a.nonEmpty)
  }

  test("longestRepeat: exact max dup length, representative, support, text") {
    val ten = (1 to 10).map(i => s"L$i").mkString(" ")
    val seven = (1 to 7).map(i => s"S$i").mkString(" ")
    val corpus = Seq(
      2L -> s"pre1 $ten post1 $seven",
      1L -> s"$seven x1 x2",
      3L -> s"y1 $ten")
    val r = SuffixDedup.longestRepeat(docs(corpus: _*)).collect()
    assert(r.length == 1)
    val row = r(0)
    // λ* = 10; winner class rep = min (doc,pos) among dup positions at
    // depth 10 — doc 2 pos 2 (doc 1's seven-block is only depth 7)
    assert(row.getLong(0) == 10L)
    assert((row.getLong(1), row.getLong(2)) == ((2L, 2L)))
    assert(row.getLong(3) == 2L && row.getLong(4) == 2L)
    assert(row.getString(5) == ten)
  }

  test("longestRepeat: no duplication at all reads 0/NULLs; equal docs read full length") {
    val uniq = docs(1L -> "a b c", 2L -> "d e f")
    val r0 = SuffixDedup.longestRepeat(uniq).collect()(0)
    assert(r0.getLong(0) == 0L && r0.isNullAt(1) && r0.isNullAt(5))
    // two identical 9-token docs: λ* = 9 (power-of-two + combine path)
    val nine = (1 to 9).map(i => s"t$i").mkString(" ")
    val eq = docs(1L -> nine, 2L -> nine)
    val r9 = SuffixDedup.longestRepeat(eq).collect()(0)
    assert(r9.getLong(0) == 9L && r9.getLong(1) == 1L && r9.getLong(2) == 1L)
    assert(r9.getLong(3) == 2L && r9.getLong(4) == 2L)
  }

  test("longestRepeat: matches brute force on a deterministic random corpus") {
    val rnd = new scala.util.Random(11)
    val planted = (1 to 13).map(i => s"P$i").mkString(" ")
    val corpus = (1L to 10L).map { id =>
      val words = Seq.fill(25)(s"w${rnd.nextInt(6)}").mkString(" ")
      id -> (if (id % 4 == 0) s"$words $planted" else words)
    }
    val toks = corpus.map { case (_, t) => t.split(" ").toSeq }
    def dupAt(l: Int): Boolean = {
      val seen = scala.collection.mutable.Set.empty[Seq[String]]
      var dup = false
      for (ws <- toks; p <- 0 to ws.length - l if !dup)
        if (!seen.add(ws.slice(p, p + l))) dup = true
      dup
    }
    val expected = (1 to 30).filter(dupAt).maxOption.getOrElse(0)
    val got = SuffixDedup.longestRepeat(docs(corpus: _*)).collect()(0).getLong(0)
    assert(got == expected.toLong && expected >= 13)
  }

  test("longestRepeat: repeats past 256 tokens report exactly (default is a ceiling, not a cap)") {
    // two identical 300-token docs: the old default capLog2 = 8 saturated
    // at 256 while the unbounded oracle read 300 — the climb must keep
    // going until a level comes back clean, then binary-search 256..512
    // (this also exercises the probe-prefix memoization: successive
    // monotone probes share their most-significant combine prefixes)
    val long300 = (1 to 300).map(i => s"z$i").mkString(" ")
    val r = SuffixDedup.longestRepeat(docs(1L -> long300, 2L -> long300))
      .collect()(0)
    assert(r.getLong(0) == 300L)
    assert((r.getLong(1), r.getLong(2)) == ((1L, 1L)))
    assert(r.getLong(3) == 2L && r.getLong(4) == 2L)
  }

  test("crossLongestRepeat: cross span only — within-corpus repeats don't count") {
    val planted = (1 to 5).map(i => s"X$i").mkString(" ")
    val longA = (1 to 12).map(i => s"A$i").mkString(" ")
    // corpus A repeats a 12-token span INTERNALLY (docs 2 and 4) and
    // carries the 5-token planted span; corpus B carries only the
    // planted span — the cross answer must be 5, not 12
    val a = docs(
      2L -> s"$longA $planted",
      4L -> s"pre $longA post")
    val b = docs(
      1L -> s"q1 q2 $planted tail",
      3L -> "unrelated words only here")
    val r = SuffixDedup.crossLongestRepeat(a, b).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(0) == 5L)
    // winner: minimal (original id, pos) among members of the winning
    // class — doc 1 (corpus B) pos 3 beats doc 2 pos 13
    assert((row.getLong(1), row.getLong(2)) == ((1L, 3L)))
    assert(row.getLong(3) == 1L && row.getLong(4) == 1L)
    assert(row.getString(5) == planted)
  }

  test("crossLongestRepeat: no shared token reads 0/NULLs; identical docs read full length") {
    val a = docs(1L -> "a b c")
    val b = docs(2L -> "d e f")
    val r0 = SuffixDedup.crossLongestRepeat(a, b).collect()(0)
    assert(r0.getLong(0) == 0L && r0.isNullAt(1) && r0.isNullAt(5))
    val nine = (1 to 9).map(i => s"t$i").mkString(" ")
    val r9 = SuffixDedup
      .crossLongestRepeat(docs(5L -> nine), docs(6L -> nine)).collect()(0)
    assert(r9.getLong(0) == 9L)
    assert((r9.getLong(1), r9.getLong(2)) == ((5L, 1L)))
    assert(r9.getLong(3) == 1L && r9.getLong(4) == 1L)
  }

  test("crossLongestRepeat: negative doc ids keep their corpus tag (pmod, not %)") {
    val planted = (1 to 6).map(i => s"N$i").mkString(" ")
    // corpus B's doc id is NEGATIVE: with `%`-truncation its tagged id
    // (2·id+1) would read tag -1, dropping it from hasCross/n_occ_b and
    // reporting 0 despite the shared 6-token span
    val a = docs(3L -> s"pre $planted")
    val b = docs(-7L -> s"$planted tail")
    val r = SuffixDedup.crossLongestRepeat(a, b).collect()(0)
    assert(r.getLong(0) == 6L)
    // winner: minimal original id is -7 (corpus B), span starts at pos 1
    assert((r.getLong(1), r.getLong(2)) == ((-7L, 1L)))
    assert(r.getLong(3) == 1L && r.getLong(4) == 1L)
    assert(r.getString(5) == planted)
  }

  test("crossLongestRepeat: matches brute force on a deterministic random split") {
    val rnd = new scala.util.Random(23)
    val corpus = (1L to 12L).map { id =>
      id -> Seq.fill(30)(s"w${rnd.nextInt(5)}").mkString(" ")
    }
    val a = corpus.filter(_._1 % 3 != 0)
    val b = corpus.filter(_._1 % 3 == 0)
    def grams(c: Seq[(Long, String)], l: Int): Set[Seq[String]] =
      c.flatMap { case (_, t) =>
        val ws = t.split(" ").toSeq
        (0 to ws.length - l).map(p => ws.slice(p, p + l))
      }.toSet
    val expected = (1 to 30)
      .filter(l => (grams(a, l) & grams(b, l)).nonEmpty).maxOption.getOrElse(0)
    val got = SuffixDedup.crossLongestRepeat(docs(a: _*), docs(b: _*))
      .collect()(0).getLong(0)
    assert(got == expected.toLong && expected >= 1)
  }

  test("crossDupSpans: maximal eval spans sharing an 8-window with train; train repeats alone don't count") {
    val planted = (1 to 10).map(i => s"P$i").mkString(" ") // 10 tokens
    val trainOnly = (1 to 12).map(i => s"T$i").mkString(" ")
    val train = docs(
      1L -> s"lead $planted tail1 tail2",
      3L -> s"$trainOnly again $trainOnly") // internal train dup: irrelevant
    val eval = docs(
      2L -> s"e1 e2 $planted e3",
      4L -> s"$trainOnly x y z") // shares the 12-token train-only block
    val r = SuffixDedup.crossDupSpans(train, eval, minLen = 8)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    // doc 2: planted at positions 3..12 → starts 3..5, span = 5-3+8 = 10
    // doc 4: trainOnly at 1..12 → starts 1..5, span = 5-1+8 = 12
    assert(r == Set((2L, 3L, 10L), (4L, 1L, 12L)))
  }

  test("trimCrossDupSpans: shared windows removed from eval only, order kept, all eval docs out") {
    val planted = (1 to 8).map(i => s"Q$i").mkString(" ") // exactly one 8-window
    val train = docs(1L -> s"pre $planted post")
    val eval = docs(
      2L -> s"a $planted b",
      6L -> "untouched words here")
    val r = SuffixDedup.trimCrossDupSpans(train, eval, minLen = 8)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2))).toSet
    assert(r == Set((2L, "a b", 2L), (6L, "untouched words here", 3L)))
  }

  test("longestRepeat: cap saturation reports 2^capLog2 (documented behavior)") {
    val six = (1 to 6).map(i => s"c$i").mkString(" ")
    val r = SuffixDedup.longestRepeat(docs(1L -> six, 2L -> six), capLog2 = 2)
      .collect()(0)
    // true λ* = 6 exceeds the cap 4 → saturate at 4, winner still exact
    assert(r.getLong(0) == 4L)
    assert((r.getLong(1), r.getLong(2)) == ((1L, 1L)))
    assert(r.getString(5) == "c1 c2 c3 c4")
  }

  test("topRepeats: layout-invariant under repartition") {
    val block = (1 to 9).map(i => s"B$i").mkString(" ")
    val rnd = new scala.util.Random(3)
    val corpus = (1L to 12L).map { id =>
      val words = Seq.fill(20)(s"t${rnd.nextInt(8)}").mkString(" ")
      id -> (if (id % 3 == 0) s"$words $block" else words)
    }
    val d1 = docs(corpus: _*)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSeq
    val a = rows(SuffixDedup.topRepeats(d1.repartition(1), minLen = 6, topK = 20))
    val b = rows(SuffixDedup.topRepeats(d1.repartition(13), minLen = 6, topK = 20))
    assert(a == b && a.nonEmpty)
  }

  test("trimDupSpans: duplicated-window tokens removed, order preserved, all docs emitted") {
    val shared = "a b c d e f g h"
    val corpus = Seq(
      1L -> s"k1 k2 $shared k3",
      2L -> s"$shared k4 k5",
      3L -> "nothing shared in this doc at all here")
    val r = SuffixDedup.trimDupSpans(docs(corpus: _*), minLen = 8)
      .collect().map(x => x.getLong(0) -> ((x.getString(1), x.getLong(2)))).toMap
    assert(r(1L) == (("k1 k2 k3", 3L)))
    assert(r(2L) == (("k4 k5", 2L)))
    assert(r(3L) == (("nothing shared in this doc at all here", 8L)))
  }

  test("dupSpans: docs shorter than minLen and null text are silently excluded") {
    val corpus = Seq(1L -> "a b c", 2L -> "a b c d e f g h", 3L -> "a b c d e f g h")
    val withNull = docs(corpus: _*).unionByName(
      df("doc_id BIGINT, text STRING", Seq(Row(4L, null))))
    val spans = spanSet(SuffixDedup.dupSpans(withNull, minLen = 8))
    assert(spans == Set((2L, 1L, 8L), (3L, 1L, 8L)))
  }
}
