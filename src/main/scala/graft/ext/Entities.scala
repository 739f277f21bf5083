package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution (extension surface): group records whose names
  * are the same real-world entity up to typos — the classic
  * customer/vendor/product canonicalization step of a warehouse load, and
  * the metadata-dedup step of a crawl pipeline (same site, spelling
  * variants).
  *
  * Pipeline shape (each stage a proper shuffle key, nothing all-pairs):
  *   1. exact collapse — normalize and group identical names, electing the
  *      smallest id as the name representative. All fuzzy work then runs on
  *      DISTINCT names, which are vocabulary-bounded, not row-bounded: the
  *      row stream is never pairwise-compared.
  *   2. token blocking — candidate name pairs share ≥ 1 word. Tokens with
  *      document frequency above `maxTokenDf` are dropped before the
  *      self-join (the q17 hot-shingle guard): a stop-word block key would
  *      otherwise go quadratic on natural names.
  *   3. verify — candidates (deduped across blocks) pass iff
  *      levenshtein ≤ `maxEdit`. Integer edit distance: engine-portable.
  *   4. cluster — connected components over verified pairs (typo chains
  *      a~b~c merge even when a and c differ by > maxEdit, matching
  *      record-linkage semantics); entity id = smallest member id.
  *
  * Output: one row per input record — (idCol, name, entity_rep).
  */
object Entities {

  def resolveByName(rows: DataFrame, idCol: String, nameCol: String,
                    maxEdit: Int = 3, maxTokenDf: Int = 64): DataFrame = {
    val base = rows.select(col(idCol).as("__id"), trim(lower(col(nameCol))).as("name"))
    val names = base.groupBy("name").agg(min(col("__id")).as("__name_rep"))
    val toks = names
      .select(col("name"), col("__name_rep"), explode(TextAnalysis.tokens(col("name"))).as("__tok"))
      .distinct()
    val rareToks = toks.groupBy("__tok").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxTokenDf).select("__tok")
    val blocked = toks.join(rareToks, Seq("__tok"))
    val cand = blocked.as("a")
      .join(blocked.as("b"),
        col("a.__tok") === col("b.__tok") && col("a.__name_rep") < col("b.__name_rep"))
      .select(col("a.__name_rep").as("src"), col("b.__name_rep").as("dst"),
        col("a.name").as("__na"), col("b.name").as("__nb"))
      .distinct() // a pair sharing k tokens verifies once, not k times
    val edges = cand.filter(levenshtein(col("__na"), col("__nb")) <= maxEdit)
      .select("src", "dst")
    val comps = Dedup.connectedComponents(edges, names.select(col("__name_rep")),
      idCol = "__name_rep")
    base.join(names, Seq("name")).join(comps, Seq("__name_rep"))
      .select(col("__id").as(idCol), col("name"), col("component_rep").as("entity_rep"))
  }
}
