package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  private def one(text: String): org.apache.spark.sql.DataFrame =
    df("doc_id BIGINT, text STRING", Seq(Row(1L, text)))

  test("datasetCard: hand-checked counts, dup ppm, language head") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "the and of it"),   // en markers
      Row(2L, "THE  AND of it"),  // normalizes to the same fingerprint
      Row(3L, "zzz qqq")))        // und
    val card = TextAnalysis.datasetCard(d)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(card("n_docs") == "3")
    assert(card("n_tokens") == "10")
    assert(card("exact_dup_ppm") == "333333") // 3 docs, 2 unique fingerprints
    assert(card("top_lang") == "en" && card("top_lang_ppm") == "666666")
    assert(card("n_langs") == "2")
  }

  test("chunkDocuments: overlapping windows, short doc single chunk, empty doc no rows") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11"), // 11 tokens
      Row(2L, "a  b"),                                // 2 tokens, ragged spaces
      Row(3L, "   ")))                                // no tokens
    val out = TextAnalysis.chunkDocuments(d, size = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts 0,3,6,9: nc = 1 + ceil((11-4)/3) = 4; last chunk is 2 tokens
    assert(d1.map(_._3).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10 t11"))
    assert(d1.map(_._4).toSeq == Seq(4L, 4L, 4L, 2L))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, "a b", 2L)))
    assert(!out.exists(_._1 == 3L))
  }

  test("vocabularyDrift: hand-computed ppm shares and signed delta; one-sided tokens survive") {
    val a = df("doc_id BIGINT, text STRING", Seq(Row(1L, "a A b")))   // a:2 b:1, tot 3
    val b = df("doc_id BIGINT, text STRING", Seq(Row(2L, "a c")))     // a:1 c:1, tot 2
    val out = TextAnalysis.vocabularyDrift(a, b, minCount = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out("a") == ((2L, 1L, 666666L, 500000L, 166666L)))
    assert(out("b") == ((1L, 0L, 333333L, 0L, 333333L)))
    assert(out("c") == ((0L, 1L, 0L, 500000L, -500000L)))
  }

  test("vocabularyDrift: minCount gates the report on either side") {
    val a = df("doc_id BIGINT, text STRING", Seq(Row(1L, "x x y")))
    val b = df("doc_id BIGINT, text STRING", Seq(Row(2L, "y z")))
    val toks = TextAnalysis.vocabularyDrift(a, b, minCount = 2)
      .collect().map(_.getString(0)).toSet
    assert(toks == Set("x")) // y: 1+1 per side, z: 1 — both below the gate
  }

  test("chi2TokenDrift: chi2 kernel on the ppm shares; rare-token shift outranks common-token shift") {
    val a = df("doc_id BIGINT, text STRING", Seq(Row(1L, "a A b")))   // a:2 b:1, tot 3
    val b = df("doc_id BIGINT, text STRING", Seq(Row(2L, "a c")))     // a:1 c:1, tot 2
    val out = TextAnalysis.chi2TokenDrift(a, b, minCount = 1)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // a: ppm (666666, 500000) → 166666²·10⁶ div 1166666 = 23809485714
    assert(out("a") == 166666L * 166666L * 1000000L / 1166666L)
    // b: (333333, 0) → 333333²·10⁶ div 333333 = 333333·10⁶
    assert(out("b") == 333333000000L)
    assert(out("c") == 500000000000L)
    // the one-sided tokens (fully appearing/vanishing) outrank the
    // common token's larger absolute share
    assert(out("b") > out("a") && out("c") > out("a"))
  }

  test("tokenCount: whitespace runs, empty text → 0") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "a  b\tc"), Row(2L, ""), Row(3L, "   "), Row(4L, "single")))
    val out = d.select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 3, 2L -> 0, 3L -> 0, 4L -> 1))
  }

  test("subwordCount: alpha runs, digit runs, punct marks count separately") {
    val out = one("ab12 cd!").select(TextAnalysis.subwordCount(col("text")))
      .collect()(0).getInt(0)
    assert(out == 4) // "ab", "12", "cd", "!"
  }

  test("punctRatio and stopwordRatio bounded in [0,1]") {
    val d = one("the cat, the hat!!")
    val r = d.select(
      TextAnalysis.punctRatio(col("text")).as("p"),
      TextAnalysis.stopwordRatio(col("text")).as("s")).collect()(0)
    assert(r.getDouble(0) > 0 && r.getDouble(0) < 1)
    assert(r.getDouble(1) == 0.5) // 2 of 4 tokens are "the"
  }

  test("langId picks marker-richest language, 'und' when no markers") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "the cat and the dog is here"),
      Row(2L, "el gato es la casa de madrid"),
      Row(3L, "der hund und die katze das haus"),
      Row(4L, "xyz qqq zzz")))
    val out = d.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "und"))
  }

  test("fingerprint is whitespace/case-insensitive md5") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "Hello   World"), Row(2L, "  hello world")))
    val fps = d.select(TextAnalysis.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0).matches("[0-9a-f]{32}"))
  }

  test("qualityScore in [0,1]; richer docs score higher than empty") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "the quick brown fox jumps over the lazy dog and runs on for a while in the sun"),
      Row(2L, "")))
    val q = d.orderBy("doc_id").select(TextAnalysis.qualityScore(col("text")))
      .collect().map(_.getDouble(0))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0) > q(1))
  }

  test("stats frame has the full column contract") {
    val out = TextAnalysis.stats(one("the cat sat"))
    assert(out.columns.toSeq == Seq("doc_id", "n_chars", "n_tokens", "n_subwords",
      "punct_ratio", "stopword_ratio", "avg_token_len", "quality", "lang_pred",
      "fingerprint", "roll_fp"))
    assert(out.count() == 1)
  }

  test("rollingFingerprint is order- and multiplicity-sensitive; short docs → 0") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "abcdef"), Row(2L, "fedcba"), // same chars, different order
      Row(3L, "abcdef"),                    // dup of 1
      Row(4L, "ab")))                       // too short
    val fp = d.select(col("doc_id"), TextAnalysis.rollingFingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(3L))
    assert(fp(1L) != fp(2L))
    assert(fp(4L) == 0L)
  }

  test("topTokens: frequency-ranked vocab with doc frequency, token tie-break") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "The cat and the dog"),
      Row(2L, "the CAT sat"),
      Row(3L, "dog dog")))
    val out = TextAnalysis.topTokens(d, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // "the" 3x in 2 docs; "dog" 3x in 2 docs ("dog" > "the"? tie on n=3 → token asc: dog first)
    assert(out.toSeq == Seq(("dog", 3L, 2L), ("the", 3L, 2L), ("cat", 2L, 2L)))
  }

  test("lengthHistogram buckets by integer div and sums token mass per source") {
    val d = df("doc_id BIGINT, source STRING, text STRING", Seq(
      Row(1L, "a", "one two three"),     // 3 tokens → bucket 1 (div 2)
      Row(2L, "a", "one two"),           // 2 tokens → bucket 1
      Row(3L, "a", "one"),               // 1 token  → bucket 0
      Row(4L, "b", "")))                 // 0 tokens → bucket 0
    val out = TextAnalysis.lengthHistogram(d, bucketTokens = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set(("a", 1L, 2L, 5L), ("a", 0L, 1L, 1L), ("b", 0L, 1L, 0L)))
  }

  test("tokenCountQuantiles: exact ceiling thresholds on a known distribution") {
    // token counts: 1,1,1,1,2,2,3,4 (N=8). Quartiles (q=4): threshold_d =
    // smallest v with cum*4 >= (d+1)*8 → d0: cum>=2 → v=1 (cum 4);
    // d1: cum>=4 → v=1; d2: cum>=6 → v=2 (cum 6); d3: cum>=8 → v=3? cum(3)=7 <8 → v=4 (cum 8)
    val d = df("doc_id BIGINT, text STRING", (1 to 4).map(i => Row(i.toLong, "w")) ++ Seq(
      Row(5L, "w w"), Row(6L, "w w"), Row(7L, "w w w"), Row(8L, "w w w w")))
    val out = TextAnalysis.tokenCountQuantiles(d, q = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((0L, 1L, 4L), (1L, 1L, 4L), (2L, 2L, 6L), (3L, 4L, 8L)))
  }

  test("tokenCountQuantiles: every quantile gets a row and thresholds are monotone") {
    val d = df("doc_id BIGINT, text STRING",
      (1 to 100).map(i => Row(i.toLong, Seq.fill(i)("w").mkString(" "))))
    val out = TextAnalysis.tokenCountQuantiles(d, q = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L until 10L))
    assert(out.map(_._2).toSeq == (10L to 100L by 10L), s"got ${out.toSeq}")
  }

  test("tokenCountQuantilesBy: each group gets its own independent thresholds") {
    // group a: counts 1..10 → quartile thresholds 3, 5, 8, 10
    // group b: counts 10,20,30,40 → one count per quartile
    val d = df("doc_id BIGINT, source STRING, text STRING",
      (1 to 10).map(i => Row(i.toLong, "a", Seq.fill(i)("w").mkString(" "))) ++
        (1 to 4).map(i => Row((100 + i).toLong, "b", Seq.fill(10 * i)("w").mkString(" "))))
    val out = TextAnalysis.tokenCountQuantilesBy(d, "source", q = 4).collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(out == Map(
      ("a", 0L) -> 3L, ("a", 1L) -> 5L, ("a", 2L) -> 8L, ("a", 3L) -> 10L,
      ("b", 0L) -> 10L, ("b", 1L) -> 20L, ("b", 2L) -> 30L, ("b", 3L) -> 40L))
  }

  test("scrubPii: masks emails before digit runs, counts matches") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "write a.b+c@mail-host.org or call 1234567 x"),
      Row(2L, "two ids 111111 and 2222222 here"),
      Row(3L, "clean text, short 12345 stays"))) // 5 digits < {6,} threshold
    val out = TextAnalysis.scrubPii(d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ("write <EMAIL> or call <NUM> x", 1L, 1L))
    assert(out(2L) == ("two ids <NUM> and <NUM> here", 0L, 2L))
    assert(out(3L) == ("clean text, short 12345 stays", 0L, 0L))
  }

  test("collocations: hand-traced integer lift, tie broken on words, min count honored") {
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "a b a b"), Row(2L, "A b c")))
    // uni: a:3 b:3 c:1, N_uni=7; bi: (a,b):3 (b,a):1 (b,c):1, N_bi=5
    // lift(a,b) = 1e6·3·49/(5·9)  = 3266666;  lift(b,c) = 1e6·49/(5·3) = 3266666
    // lift(b,a) = 1e6·49/(5·9)    = 1088888
    val out = TextAnalysis.collocations(d, minCount = 1, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("a", "b", 3L, 3266666L), ("b", "c", 1L, 3266666L), ("b", "a", 1L, 1088888L)))
    // minCount prunes the singletons; k cuts deterministically
    val top = TextAnalysis.collocations(d, minCount = 2, k = 1).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(top.toSeq == Seq(("a", "b")))
  }

  test("normalizeText: NFC composition, control strip, whitespace squash, trim, null") {
    import org.apache.spark.sql.Row
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "Cafee\u0301  \u0001x"), // decomposed é, ws run, C0 ctrl
      Row(2L, "\t a\u000Bb \u007F c \r\n"), // VT is whitespace, DEL stripped
      Row(3L, ""), Row(4L, null)))
    val out = TextAnalysis.normalizeText(d).collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), Option(r.get(2)))).toMap
    assert(out(1L) == ((Some("Cafeé x"), Some(7L)))) // é is ONE char
    assert(out(2L) == ((Some("a b c"), Some(5L))))
    assert(out(3L) == ((Some(""), Some(0L))))
    assert(out(4L) == ((None, None)))
    // idempotent: a second pass changes nothing
    val once = TextAnalysis.normalizeText(d.filter(col("doc_id") < 3))
      .select(col("doc_id"), col("clean_text").as("text"))
    val twice = TextAnalysis.normalizeText(once)
    assertSameRows(TextAnalysis.normalizeText(d.filter(col("doc_id") < 3)), twice)
  }

  test("native graft_text_stats counters ≡ composed reference on edge + generated text") {
    import spark.implicits._
    val edges = Seq(
      "", " ", "\t\n", "the", "The THE the", "a b c", "is it of and",
      "el la de es", "der die das und", "le et de la",
      "punct!!! ... ??? (x)", "ab12cd34", "12 34 ab",
      "héllo wörld", "漢字 テスト mixed ascii", "emoji 🙂 here",
      "DE ES la", "und und und", "  spaced   out  ",
      "mark.down, lists; [brackets] {braces} <angle>")
    val rng = new scala.util.Random(13)
    val vocab = Seq("the", "and", "of", "is", "el", "la", "de", "der",
      "die", "das", "und", "le", "et", "THE", "De", "xyz", "ab12",
      "w!rd", "héllo", "漢字", "a.b", "42", "x9y")
    val gen = (1 to 300).map { _ =>
      (0 until rng.nextInt(12)).map(_ => vocab(rng.nextInt(vocab.size)))
        .mkString(Seq(" ", "\t", "  ", "\n")(rng.nextInt(4)))
    }
    val d = (edges ++ gen).toDF("text").selectExpr(
      "graft_text_stats(text) AS st",
      "length(text) AS c_chars",
      "size(filter(split(trim(text), '\\\\s+'), t -> length(t) > 0)) AS c_tokens",
      "regexp_count(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]') AS c_subwords",
      "length(text) - length(regexp_replace(text, '[\\\\p{Punct}]', '')) AS c_punct",
      s"size(filter(filter(split(trim(text), '\\\\s+'), t -> length(t) > 0)," +
        s" t -> t IN (${TextAnalysis.englishStopwords.map(w => s"'$w'").mkString(",")}))) AS c_stops",
      "aggregate(filter(split(trim(text), '\\\\s+'), t -> length(t) > 0), 0L, (a, t) -> a + length(t)) AS c_lensum")
    val lchecks = TextAnalysis.langMarkers.map { case (lang, ms) =>
      s"size(filter(filter(split(trim(lower(text)), '\\\\s+'), t -> length(t) > 0)," +
        s" t -> t IN (${ms.map(w => s"'$w'").mkString(",")}))) AS c_$lang"
    }
    val full = d.selectExpr(Seq("st.*", "c_chars", "c_tokens", "c_subwords",
      "c_punct", "c_stops", "c_lensum") ++ Nil: _*)
    // recompute lang checks on the original frame (needs text)
    val d2 = (edges ++ gen).toDF("text").selectExpr(
      Seq("graft_text_stats(text) AS st") ++ lchecks: _*)
    full.collect().foreach { r =>
      assert(r.getAs[Int]("n_chars") == r.getAs[Int]("c_chars"))
      assert(r.getAs[Int]("n_tokens") == r.getAs[Int]("c_tokens"))
      assert(r.getAs[Int]("n_subwords") == r.getAs[Int]("c_subwords"))
      assert(r.getAs[Int]("n_punct") == r.getAs[Int]("c_punct"))
      assert(r.getAs[Int]("stop_hits") == r.getAs[Int]("c_stops"))
      assert(r.getAs[Long]("tok_len_sum") == r.getAs[Long]("c_lensum"))
    }
    d2.selectExpr(Seq("st.hit_en AS n_en", "st.hit_es AS n_es",
      "st.hit_de AS n_de", "st.hit_fr AS n_fr",
      "c_en", "c_es", "c_de", "c_fr"): _*).collect().foreach { r =>
      for (l <- Seq("en", "es", "de", "fr"))
        assert(r.getAs[Int](s"n_$l") == r.getAs[Int](s"c_$l"), s"lang $l")
    }
  }

  test("native graft_collapse_ws ≡ regexp_replace('\\s+', ' ') incl. unicode") {
    import spark.implicits._
    val edges = Seq(
      "", " ", "  ", "\t", "\t\n\r ", "a", " a ", "a  b", "a\t\tb",
      "a \t\n b", "xy", "héllo  wörld", "漢字\t テスト",
      "emoji 🙂  ok", "no-ws-at-all", "\n\nlead", "trail\r\n")
    val rng = new scala.util.Random(23)
    val gen = (1 to 200).map { _ =>
      (0 until rng.nextInt(10)).map(_ =>
        Seq("w", "héllo", "漢字", "a.b", " ", "\t", "\n\n", "  ")(rng.nextInt(8)))
        .mkString
    }
    val d = (edges ++ gen).toDF("text").selectExpr(
      "graft_collapse_ws(text) AS native",
      "regexp_replace(text, '\\\\s+', ' ') AS composed")
    assert(d.filter(col("native") =!= col("composed")).count() == 0)
    // and the full fingerprint matches its composed spelling
    val f = (edges ++ gen).toDF("text").select(
      TextAnalysis.fingerprint(col("text")).as("native"),
      md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")).as("composed"))
    assert(f.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("native graft_token_count ≡ size(split) on every whitespace shape") {
    import spark.implicits._
    val edges = Seq(
      "", " ", "   ", "\t\n\r", "a", " a", "a ", "  a  b  ",
      "one two three", "tab\tsep\nnewline", "a\r\nb", "mixed \t \n x",
      "unicode héllo wörld", "cjk 漢字 テスト", "nbsp is one token",
      "emoji 🙂 ok", "trailing\t", "\nleading", "a b c d e f g h i j")
    val d = edges.toDF("text").selectExpr(
      "text",
      "graft_token_count(text) AS native",
      "size(filter(split(trim(text), '\\\\s+'), t -> length(t) > 0)) AS composed")
    d.collect().foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"mismatch on ${r.getString(0).replace("\n", "\\n")}: " +
          s"native=${r.getInt(1)} composed=${r.getInt(2)}")
    }
    // generated property sweep: random ws/word mixtures
    val rng = new scala.util.Random(7)
    val words = Seq("a", "bb", "ccc", "héllo", "漢字", "x1")
    val ws = Seq(" ", "  ", "\t", "\n", " \t ", "\r\n")
    val gen = (1 to 200).map { _ =>
      val n = rng.nextInt(8)
      (0 until n).map(_ => words(rng.nextInt(words.size)))
        .mkString(ws(rng.nextInt(ws.size)),
          ws(rng.nextInt(ws.size)), ws(rng.nextInt(ws.size)))
    }
    val g = gen.toDF("text").selectExpr(
      "graft_token_count(text) AS native",
      "size(filter(split(trim(text), '\\\\s+'), t -> length(t) > 0)) AS composed")
    assert(g.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("vocabGrowth: curves nest, the full-corpus row is exact, layout-invariant") {
    import spark.implicits._
    val docs = (0L until 300L)
      .map(i => (i, s"word${i % 40} word${i % 17} shared token"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.vocabGrowth(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // prefixes nest by construction → both counts non-decreasing
    assert(out.sliding(2).forall { case Array(a, b) => a._2 <= b._2 && a._3 <= b._3 })
    // the 1000‰ row is the whole corpus: 300 docs; word0..word39 (the
    // i%17 family is a subset of the i%40 one) + "shared" + "token" = 42
    assert(out.last == ((1000L, 300L, 42L)))
    val again = TextAnalysis.vocabGrowth(docs.repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(again.toSeq == out.toSeq)
  }

  test("tokenSpectrum: hand-built count-of-counts — octaves, exact ppm shares") {
    // counts: a×1 (octave 0), b×2, c×3 (octave 1), d×5 (octave 2); total 11
    val d = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "a b c d d"), Row(2L, "b c c d d d")))
    val out = TextAnalysis.tokenSpectrum(d).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out == Map(
      0 -> (1L, 1L, 90909L, 90909L),
      1 -> (2L, 5L, 454545L, 545454L),
      2 -> (1L, 5L, 454545L, 1000000L)))
    val again = TextAnalysis.tokenSpectrum(d.repartition(5)).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(again == out)
  }

  test("phraseScan: exact hits, overlapping matches, absent-token phrases, determinism") {
    val docs = df("doc_id BIGINT, text STRING", Seq(
      Row(1L, "a b c a b c a"),
      Row(2L, "x a b y a b"),
      Row(3L, "a a a a")))
    val phrases = df("phrase_id BIGINT, phrase STRING", Seq(
      Row(10L, "a b"),      // doc1 x2 (pos 1,4), doc2 x2 (pos 2,5)
      Row(11L, "a a"),      // doc3 x3 (overlapping: pos 1,2,3)
      Row(12L, "b c a"),    // doc1 x2 (pos 2,5)
      Row(13L, "a q")))     // q absent from corpus: zero candidates
    val got = TextAnalysis.phraseScan(docs, phrases).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == Map(
      (1L, 10L) -> (2L, 1L),
      (2L, 10L) -> (2L, 2L),
      (3L, 11L) -> (3L, 1L),
      (1L, 12L) -> (2L, 2L)))
    val again = TextAnalysis.phraseScan(docs.repartition(7), phrases.repartition(3))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(again == got)
  }

  test("phraseScan: single-token phrases and empty phrase set") {
    val docs = df("doc_id BIGINT, text STRING", Seq(Row(1L, "p q p")))
    val one = df("phrase_id BIGINT, phrase STRING", Seq(Row(5L, "p")))
    val got = TextAnalysis.phraseScan(docs, one).collect()
    assert(got.length == 1 && got(0).getLong(2) == 2L && got(0).getLong(3) == 1L)
    val none = df("phrase_id BIGINT, phrase STRING", Seq.empty[Row])
    assert(TextAnalysis.phraseScan(docs, none).isEmpty)
  }
}
