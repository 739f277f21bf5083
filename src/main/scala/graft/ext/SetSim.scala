package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join (AllPairs/PPJoin-style prefix filtering)
  * — every document pair whose token-SET Jaccard meets the threshold, with
  * no approximation and no all-pairs comparison.
  *
  * Complements the approximate family: MinHash/LSH ([[Dedup.lshPairs]])
  * trades recall for speed; the n-gram verifier ([[Dedup.ngramJaccard]])
  * is exact but only over an externally bounded candidate set. This
  * operator is exact AND self-bounding: a pair can reach Jaccard ≥ t only
  * if the two sets share a token inside their df-rarest PREFIX, so
  * candidate generation equi-joins on prefix tokens only.
  *
  * Prefix principle: order each set's tokens by ascending global document
  * frequency (ties by token text — a total order both engines reproduce);
  * a set of size n whose first `n − ⌈t·n⌉ + 1` tokens are all absent from
  * the other set can share at most `⌈t·n⌉ − 1` tokens, below threshold by
  * pigeonhole. Rarest-first ordering makes prefix tokens the LOW-df ones,
  * so the candidate equi-join's key distribution is anti-skewed by
  * construction — the corpus-frequent token ("the") that wrecks a naive
  * token self-join never appears in a long set's prefix.
  *
  * Exactness policy: the threshold is integer permille and the acceptance
  * test is cross-multiplied integer arithmetic
  * (`1000·|∩| ≥ t‰·(|a|+|b|−|∩|)`) — no float boundary for a pair to sit
  * on, so a SQL oracle reproduces the identical pair set. The reported
  * jaccard is rounded to 6 decimals for display only.
  *
  * Scale shape: tokenize (narrow) → df aggregate (token-key shuffle,
  * map-side combine) → per-doc rank window (doc-key shuffle) → prefix
  * equi-join on rare tokens → PPJoin positional filter on the pair
  * aggregate → count-common equi-join on (doc, token) → integer verify.
  * Nothing is quadratic in the corpus; candidate volume is
  * Σ_tok prefix-df(tok)², bounded because prefix membership caps df from
  * above for all but the shortest sets, and the positional bound prunes
  * the verification set further at zero extra shuffles (the pair
  * aggregate replaces the DISTINCT the candidates needed anyway).
  */
object SetSim {

  /** All pairs `(id_a < id_b)` with token-set Jaccard ≥ `tPermille/1000`,
    * as `(id_a, id_b, jaccard)` with jaccard rounded to 6 decimals.
    *
    * `tokens` maps the text column to its array of DISTINCT set elements —
    * word tokens by default; pass
    * [[graft.functions.ShingleFunctions.shingleStrings]] for character
    * 3-gram sets (the native generator already dedups).
    */
  def jaccardJoin(docs: DataFrame, tPermille: Int,
                  idCol: String = "doc_id",
                  textCol: String = "text",
                  tokens: Column => Column =
                    c => array_distinct(TextAnalysis.tokens(c))): DataFrame = {
    val (toks, _, sizes, prefix) =
      tokenPrefix(docs, tPermille, idCol, textCol, tokens)
    // PPJoin positional refinement: a meet at prefix positions (pa, pb)
    // bounds the overlap by 1 + min(n_a − pa, n_b − pb); the pair can
    // reach Jaccard ≥ t only if that bound clears the threshold's
    // overlap requirement o ≥ t·(n_a+n_b)/(1+t) — cross-multiplied in
    // integers. Taking min(pa), min(pb) over all meets relaxes the bound
    // (never drops a qualifying pair) and rides the same pair aggregate
    // that replaces the plain DISTINCT — fewer pairs verified, identical
    // result.
    val cands = prefix.select(col("id").as("id_a"), col("tok"),
        col("pos").as("pa"), col("n").as("na"))
      .join(prefix.select(col("id").as("id_b"), col("tok"),
        col("pos").as("pb"), col("n").as("nb")), "tok")
      .filter(col("id_a") < col("id_b"))
      // LENGTH filter (PPJoin §: J ≤ min(n_a,n_b)/max(n_a,n_b) when one
      // set is contained in the other, so J ≥ t needs 1000·min ≥ t·max)
      // applied AT THE JOIN, before the pair aggregate — prunes candidate
      // rows regardless of df skew (the anti-Zipfian corpus defeats
      // df-based prefix pruning by design, this bound does not care),
      // shrinking the aggregate's hash state and exchange. Never drops a
      // qualifying pair — pure integer pigeonhole.
      .filter(lit(1000L) * least(col("na"), col("nb")) >=
        lit(tPermille.toLong) * greatest(col("na"), col("nb")))
      .groupBy("id_a", "id_b")
      .agg(min(col("pa")).as("pa"), min(col("pb")).as("pb"),
        first(col("na")).as("na"), first(col("nb")).as("nb"))
      .filter((lit(1000L + tPermille) *
          (lit(1L) + least(col("na") - col("pa"), col("nb") - col("pb"))))
        >= lit(tPermille.toLong) * (col("na") + col("nb")))
      .select("id_a", "id_b")
    // exact intersection size: fan candidates out over a's full token set,
    // then equi-join on (id_b, tok) — cost |cands| · avg set size, never
    // corpus-quadratic
    val common = cands
      .join(toks.select(col("id").as("id_a"), col("tok")), "id_a")
      .join(toks.select(col("id").as("id_b"), col("tok")), Seq("id_b", "tok"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("c"))
    common
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), "id_b")
      .filter(lit(1000L) * col("c") >= lit(tPermille.toLong) * (col("na") + col("nb") - col("c")))
      .select(col("id_a"), col("id_b"),
        round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 6)
          .as("jaccard"))
  }

  /** The shared token/df/prefix derivation: (toks, tokDf, sizes, prefix).
    * Tokens are SET elements per doc; the prefix is rarest-first with the
    * (df, token) total order both engines reproduce.
    */
  private def tokenPrefix(docs: DataFrame, tPermille: Int, idCol: String,
                          textCol: String, tokens: Column => Column)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(tPermille >= 1 && tPermille <= 1000,
      s"tPermille out of [1, 1000]: $tPermille")
    // distinct tokens per doc — SET semantics, repeats collapse
    val toks = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
    val tokDf = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val sizes = toks.groupBy("id").agg(count(lit(1)).as("n"))
    // rank tokens inside each doc rarest-first; prefix length
    // n − ⌈t·n⌉ + 1 (integer ceiling: (t·n + 999) div 1000)
    val ranked = toks.join(tokDf, "tok")
      .withColumn("pos",
        row_number().over(Window.partitionBy("id").orderBy(col("df"), col("tok"))))
      .join(sizes, "id")
    val prefix = ranked
      .filter(col("pos") <= col("n") - expr(s"($tPermille * n + 999) div 1000") + 1)
      .select(col("id"), col("tok"), col("pos"), col("n"))
    (toks, tokDf, sizes, prefix)
  }

  /** Pre-flight pruning-effectiveness audit — the diagnostic a pipeline
    * runs BEFORE unleashing [[jaccardJoin]] on a corpus (motivated by a
    * measured blow-up: a synthetic anti-Zipfian corpus whose ~400-shingle
    * universe put every token in every prefix, driving candidate mass to
    * ~n², where Zipfian natural text prunes it to a vanishing fraction).
    * Reports, WITHOUT running any join:
    *
    *   - `naive_pairs`  = Σ_tok df·(df−1)/2 — the candidate mass of a
    *     plain token-keyed self-join (what a non-prefix-filtered plan
    *     would generate; multiplicity-counted, so it can exceed
    *     all_pairs many-fold);
    *   - `prefix_pairs` = the same mass restricted to PREFIX tokens —
    *     the candidate mass [[jaccardJoin]]'s equi-join actually feeds
    *     its pair aggregate;
    *   - `all_pairs`    = n_docs·(n_docs−1)/2, the quadratic floor;
    *   - the two ppm ratios vs all_pairs. prefix_ppm near or above 10⁶
    *     says "this corpus defeats prefix filtering — sample, shard, or
    *     LSH instead"; the Zipfian-corpus healthy range is ≪ 10⁶.
    *
    * Scale shape: the [[tokenPrefix]] derivation (token-df aggregate +
    * per-doc rank window) followed by THREE scalar aggregates — the
    * audit costs one pass over the token stream, never a pair.
    */
  def pruningAudit(docs: DataFrame, tPermille: Int,
                   idCol: String = "doc_id",
                   textCol: String = "text",
                   tokens: Column => Column =
                     c => array_distinct(TextAnalysis.tokens(c))): DataFrame = {
    val (_, tokDf, sizes, prefix) =
      tokenPrefix(docs, tPermille, idCol, textCol, tokens)
    val dAgg = tokDf.agg(count(lit(1)).as("n_tokens"),
      expr("coalesce(CAST(sum(CAST(df AS DECIMAL(38,0)) * (df - 1)) / 2" +
        " AS DECIMAL(38,0)), CAST(0 AS DECIMAL(38,0)))").as("naive_pairs"))
    val pAgg = prefix.groupBy("tok").agg(count(lit(1)).as("c"))
      .agg(expr("coalesce(CAST(sum(CAST(c AS DECIMAL(38,0)) * (c - 1)) / 2" +
        " AS DECIMAL(38,0)), CAST(0 AS DECIMAL(38,0)))").as("prefix_pairs"))
    val nAgg = sizes.agg(count(lit(1)).as("n_docs"))
    nAgg.crossJoin(broadcast(dAgg)).crossJoin(broadcast(pAgg))
      .select(col("n_docs"), col("n_tokens"),
        expr("CAST(naive_pairs AS BIGINT)").as("naive_pairs"),
        expr("CAST(prefix_pairs AS BIGINT)").as("prefix_pairs"),
        expr("CAST(CAST(n_docs AS DECIMAL(38,0)) * (n_docs - 1) div 2" +
          " AS BIGINT)").as("all_pairs"),
        // ×2·10⁶ over the un-halved n(n−1) keeps every divisor integral
        expr("CASE WHEN n_docs < 2 THEN NULL ELSE CAST(" +
          "naive_pairs * 2000000 div (CAST(n_docs AS DECIMAL(38,0))" +
          " * (n_docs - 1)) AS BIGINT) END").as("naive_ppm"),
        expr("CASE WHEN n_docs < 2 THEN NULL ELSE CAST(" +
          "prefix_pairs * 2000000 div (CAST(n_docs AS DECIMAL(38,0))" +
          " * (n_docs - 1)) AS BIGINT) END").as("prefix_ppm"))
  }
}
