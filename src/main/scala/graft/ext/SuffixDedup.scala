package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT substring (duplicated-span) detection via distributed suffix
  * indexing — the operator behind "ExactSubstr" deduplication (Lee et al.
  * 2022, "Deduplicating Training Data Makes Language Models Better";
  * public literature). Finds every maximal token span of length ≥ `minLen`
  * whose text occurs ≥ 2 times anywhere in the corpus (another document OR
  * another position of the same document — self-repetition is duplication
  * too, per the paper), with NO hashing anywhere: verdicts are exact
  * token-sequence equality, so there are no fingerprint collisions to
  * adjudicate, unlike the MinHash/SimHash/winnowing family
  * ([[Dedup.minHashCandidatePairs]], [[Dedup.winnowFingerprints]]) and
  * unlike the fixed-n inverted-gram pass ([[Dedup.dupNgramCoverage]]) this
  * complements (that one keys on materialized n-gram STRINGS; this one
  * never ships a window's text — only constant-width class ids).
  *
  * HOW, Spark-first — doubling over equivalence-class REPRESENTATIVES
  * (the [[Dedup.connectedComponents]] posture: O(log minLen) rounds of
  * map-combined groupBy + equi-join, per-round lineage cuts), never a
  * global suffix sort and never an all-pairs compare:
  *
  *   - rank_1(d,p) = representative of "same token": every position is
  *     keyed by the MINIMUM (doc,pos) holding the same token — one
  *     vocabulary-keyed aggregate + one join-back.
  *   - rank_2k(d,p) = representative of the pair (rank_k(d,p),
  *     rank_k(d,p+k)) — the classic prefix-doubling step (Manber & Myers
  *     1993; Larsson & Sadakane 2007; public literature), except classes
  *     carry an ARBITRARY injective id (their min member) instead of a
  *     sort rank: equality at depth 2k is all dedup needs, and dropping
  *     the order requirement is what removes the per-round global sort.
  *   - a final OVERLAPPED combine (rank_k(d,p), rank_k(d,p+minLen−k))
  *     with k = largest power of two ≤ minLen lands on depth EXACTLY
  *     minLen (valid for any shift ≤ k because the two k-windows cover
  *     the span; the standard suffix-array LCP trick).
  *
  * Suffixes are DOCUMENT-BOUNDED: a position only acquires a depth-m rank
  * while its m-token window fits inside its own document (the per-round
  * inner join against the shifted relation enforces this for free), so no
  * comparison ever crosses a document boundary and no separator sentinels
  * are needed.
  *
  * Scale shape (the reason this survives 100 TB where a monolithic suffix
  * array does not): state is always one row per surviving token position —
  * (doc, pos, repDoc, repPos), four BIGINTs — and every round is two
  * equi-shuffles + one map-combined aggregate on that relation.
  * Skew: a frequent token's depth-1 class is huge, but the aggregate that
  * touches it is a map-side-combined min(), and from depth 2 on the class
  * key is the PAIR of representatives, which splits frequent-token classes
  * combinatorially (the same reason PPJoin prefix-filtering works). Each
  * round ends in an eager localCheckpoint — O(1) lineage, the q55
  * connected-components discipline.
  */
object SuffixDedup {

  /** (d, p, rd, rp) for every position whose `minLen`-token window fits
    * its document: (rd, rp) is the class representative — the minimal
    * (doc, pos) whose window is token-for-token equal. Positions are
    * 1-based (the repo's gram-position convention).
    */
  private[ext] def windowClasses(docs: DataFrame, minLen: Int,
                                 idCol: String, textCol: String): DataFrame = {
    require(minLen >= 2, "minLen must be >= 2 (1 would class single tokens)")
    val base = docs
      .withColumn("__ws", TextAnalysis.tokens(col(textCol)))
      .select(col(idCol).cast("long").as("d"), col("__ws"),
        size(col("__ws")).cast("long").as("n"))
    val tokPos = base.filter(col("n") >= minLen)
      .select(col("d"), posexplode(col("__ws")).as(Seq("__p0", "tok")))
      .select(col("d"), (col("__p0") + 1).cast("long").as("p"), col("tok"))
    // depth 1: vocabulary-keyed representative assignment
    var r = tokPos
      .join(tokPos.groupBy("tok")
        .agg(min(struct(col("d"), col("p"))).as("__rep")), Seq("tok"))
      .select(col("d"), col("p"),
        col("__rep.d").as("rd"), col("__rep.p").as("rp"))
      .localCheckpoint(true)
    var k = 1
    while (k * 2 <= minLen) { r = refine(r, k); k *= 2 }
    if (k < minLen) r = refine(r, minLen - k) // overlapped final combine
    r
  }

  /** One doubling round: pair each position's class id with the class id
    * `shift` tokens ahead (shift ≤ current depth ⇒ the result resolves
    * exact equality at depth (current + shift)), re-representative by the
    * pair. Inner join drops positions whose extended window no longer
    * fits the document — exactly the doc-bounded-suffix rule.
    */
  private def refine(r: DataFrame, shift: Int): DataFrame = {
    val right = r.select(col("d"), (col("p") - shift).as("p"),
      col("rd").as("rd2"), col("rp").as("rp2"))
    val paired = r.join(right, Seq("d", "p"))
    val reps = paired.groupBy("rd", "rp", "rd2", "rp2")
      .agg(min(struct(col("d"), col("p"))).as("__rep"))
    paired.join(reps, Seq("rd", "rp", "rd2", "rp2"))
      .select(col("d"), col("p"),
        col("__rep.d").as("rd"), col("__rep.p").as("rp"))
      .localCheckpoint(true)
  }

  /** Positions (doc, p) whose `minLen`-window text occurs ≥ 2 times in
    * the corpus (any document, any position). One aggregate over the
    * class relation + a semi join back.
    */
  private[ext] def dupWindowPositions(docs: DataFrame, minLen: Int,
                                      idCol: String, textCol: String): DataFrame = {
    val r = windowClasses(docs, minLen, idCol, textCol)
    val dupClasses = r.groupBy("rd", "rp").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
    r.join(dupClasses.select("rd", "rp"), Seq("rd", "rp"))
      .select(col("d"), col("p"))
  }

  /** Maximal duplicated spans, the paper's output unit: one row per
    * maximal run of consecutive duplicated window starts — (doc_id,
    * start, span_tokens) where the span covers tokens [start,
    * start + span_tokens − 1]. Gaps-and-islands over each document's own
    * dup positions (window partitioned BY DOCUMENT — never global).
    */
  def dupSpans(docs: DataFrame, minLen: Int = 8, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val pos = dupWindowPositions(docs, minLen, idCol, textCol)
    val w = Window.partitionBy("d").orderBy("p")
    pos.withColumn("__g", col("p") - row_number().over(w))
      .groupBy("d", "__g")
      .agg(min("p").as("start"),
        (max("p") - min("p") + minLen).as("span_tokens"))
      .select(col("d").as(idCol), col("start"), col("span_tokens"))
  }

  /** Per-document rollup over EVERY doc (docs without duplication read
    * zeros): maximal-span count, duplicated-window-start count, distinct
    * token positions covered by any duplicated window, and the covered
    * ppm — the doc-level "how much of me is copied" signal that decides
    * trim-vs-drop. Coverage counts DISTINCT positions (overlapping spans
    * never double-count).
    */
  def dupSpanDocStats(docs: DataFrame, minLen: Int = 8,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val pos = dupWindowPositions(docs, minLen, idCol, textCol)
      .localCheckpoint(true) // consumed twice below: spans + coverage
    val w = Window.partitionBy("d").orderBy("p")
    val spans = pos.withColumn("__g", col("p") - row_number().over(w))
      .groupBy("d", "__g").agg(count(lit(1)).as("__starts"))
      .groupBy("d").agg(count(lit(1)).as("n_spans"),
        sum("__starts").as("dup_starts"))
    val covered = pos
      .select(col("d"), explode(sequence(col("p"),
        col("p") + (minLen - 1))).as("cp"))
      .groupBy("d").agg(count_distinct(col("cp")).as("covered_tokens"))
    docs.select(col(idCol).cast("long").as("d"),
        coalesce(size(TextAnalysis.tokens(col(textCol))), lit(0))
          .cast("long").as("n_tokens"))
      .join(spans, Seq("d"), "left")
      .join(covered, Seq("d"), "left")
      .select(col("d").as(idCol), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_starts"), lit(0L)).as("dup_starts"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        expr("coalesce(covered_tokens, 0) * 1000000" +
          " div (CASE WHEN n_tokens = 0 THEN 1 ELSE n_tokens END)")
          .as("dup_ppm"))
  }

  /** The `topK` most-repeated exact `minLen`-token windows: the window's
    * text (materialized ONLY for the surviving classes, by slicing the
    * representative document — window text never rides the doubling
    * rounds), total occurrence count, distinct-document count, and the
    * representative (doc, start). Deterministic total order: support
    * descending, then text (windows are distinct by construction, so text
    * is a unique tiebreak). TakeOrdered — no global sort materializes.
    */
  def topRepeats(docs: DataFrame, minLen: Int = 8, topK: Int = 50,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val r = windowClasses(docs, minLen, idCol, textCol)
    val classes = r.groupBy("rd", "rp")
      .agg(count(lit(1)).as("n_occ"), count_distinct(col("d")).as("n_docs"))
      .filter(col("n_occ") >= 2)
    val toks = docs.select(col(idCol).cast("long").as("rd"),
      TextAnalysis.tokens(col(textCol)).as("__ws"))
    classes.join(toks, Seq("rd"))
      .select(col("rd").as("rep_doc"), col("rp").as("rep_start"),
        array_join(slice(col("__ws"), col("rp").cast("int"), lit(minLen)), " ")
          .as("repeat_text"),
        col("n_occ"), col("n_docs"))
      .orderBy(col("n_occ").desc, col("repeat_text"))
      .limit(topK)
  }
}
