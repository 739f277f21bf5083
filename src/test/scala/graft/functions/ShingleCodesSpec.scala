package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Dedup

/** Pins graft_shingle_codes to the composed legacy formulation
  * (array_distinct ∘ transform(substr) then encodeShingle3) it replaced on
  * the MinHash hot path.
  */
class ShingleCodesSpec extends SparkSpec {

  private val nasty = Seq(
    "abcabcabc",                      // dense repeats
    "the quick brown fox",            // plain ASCII
    "ab",                             // below shingle width
    "",                               // empty
    "日本語のテキストです",            // CJK (3-byte UTF-8)
    "mix日本abc語",                    // mixed widths
    "emoji 😀😀 pair",                 // astral (4-byte UTF-8, surrogate pair)
    "aaa",                            // single shingle
    "ñañañá")                         // 2-byte UTF-8

  private def docs: DataFrame = {
    import spark.implicits._
    nasty.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  /** Legacy path: distinct substr-shingles, then the positional encode. */
  private def legacyCodes(d: DataFrame): DataFrame =
    d.select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("sh"))
      .withColumn("x", Dedup.encodeShingle3(col("sh")))

  test("exploded code SET equals the legacy substr+encode pipeline") {
    val now = Dedup.minHashSignatures(docs, k = 4) // exercises the native path
    val legacy = legacyCodes(docs)
      .groupBy("doc_id")
      .agg((0 until 4).map(j =>
        min((lit(Dedup.hashA(j)) * col("x") + lit(Dedup.hashB(j))) % Dedup.MinHashP).as(s"h$j")).head,
        (1 until 4).map(j =>
          min((lit(Dedup.hashA(j)) * col("x") + lit(Dedup.hashB(j))) % Dedup.MinHashP).as(s"h$j")): _*)
    assertSameRows(now, legacy)
  }

  test("per-doc distinct code sets match (unicode, repeats, short docs)") {
    val native = docs.select(col("doc_id"),
      ShingleFunctions.shingleCodes(col("text")).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val legacy = legacyCodes(docs).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap
    nasty.indices.foreach { i =>
      val id = i.toLong
      assert(native.getOrElse(id, Set.empty) == legacy.getOrElse(id, Set.empty),
        s"doc $i (${nasty(i)})")
    }
    // short/empty docs: present with an empty array, absent after explode
    assert(native(2L) == Set.empty && native(3L) == Set.empty)
  }

  test("null text yields null array; explode drops it like the legacy empty") {
    import spark.implicits._
    val d = Seq((0L, Option("abcd")), (1L, Option.empty[String]))
      .toDF("doc_id", "text")
    val ids = Dedup.minHashSignatures(d, k = 2).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L))
  }

  test("shingleStrings equals the legacy array_distinct(transform(substr)) exactly") {
    val native = docs.select(col("doc_id"),
      ShingleFunctions.shingleStrings(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val legacy = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    nasty.indices.foreach { i =>
      assert(native(i.toLong) == legacy(i.toLong), s"doc $i (${nasty(i)})") // order too
    }
  }

  test("first-occurrence order is preserved (array semantics, not set)") {
    import spark.implicits._
    val d = Seq((0L, "abab")).toDF("doc_id", "text") // shingles aba, bab
    val codes = d.select(ShingleFunctions.shingleCodes(col("text")))
      .head().getSeq[Long](0)
    val a = 'a'.toLong; val b = 'b'.toLong
    assert(codes == Seq(a * 65536 + b * 256 + a, b * 65536 + a * 256 + b))
  }

  test("rollingFp is bit-exact with the composed HOF formulation (unicode, repeats, short, null)") {
    import spark.implicits._
    val d = (nasty.zipWithIndex.map { case (t, i) => (i.toLong, Option(t)) }
      :+ (nasty.size.toLong, Option.empty[String])).toDF("doc_id", "text")
    val native = d.select(col("doc_id"),
      graft.ext.TextAnalysis.rollingFingerprint(col("text")).as("fp"))
    val composed = d.select(col("doc_id"),
      graft.ext.TextAnalysis.rollingFingerprintComposed(col("text")).as("fp"))
    assertSameRows(native, composed)
  }
}
