package graft.ext

import org.apache.spark.sql.Row
import graft.SparkSpec

class EntitiesSpec extends SparkSpec {

  private def recs(rows: (Long, String)*) =
    df("id BIGINT, name STRING", rows.map { case (i, n) => Row(i, n) })

  private def entities(d: org.apache.spark.sql.DataFrame,
                       maxEdit: Int = 3, maxTokenDf: Int = 64): Map[Long, Long] =
    Entities.resolveByName(d, "id", "name", maxEdit, maxTokenDf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("exact duplicates and case/space variants collapse without fuzzy edges") {
    val e = entities(recs(1L -> "Acme Corp", 2L -> "acme corp", 3L -> "  ACME CORP  ",
      4L -> "zeta llc"))
    assert(e == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  test("typo within maxEdit merges via a shared block token") {
    val e = entities(recs(1L -> "acme corp", 2L -> "acme c0rp", 3L -> "other name"))
    assert(e(1L) == 1L && e(2L) == 1L && e(3L) == 3L)
  }

  test("typo chains merge transitively (a~b, b~c, a!~c)") {
    val a = "acme corp"; val b = "acme corpxyz"; val c = "acme corpxyzqq"
    // lev(a,b)=3, lev(b,c)=2, lev(a,c)=5 > maxEdit — CC still unifies
    val e = entities(recs(1L -> a, 2L -> b, 3L -> c))
    assert(e == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("tokens above maxTokenDf are not block keys (hot-token guard)") {
    // "alpha" appears in every name; with the cap below its df no pair is
    // ever generated, so nothing merges even though edit distances are small
    val d = recs(1L -> "alpha one", 2L -> "alpha two", 3L -> "alpha ten")
    assert(entities(d, maxEdit = 3, maxTokenDf = 2) ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    // uncapped, "alpha two"~"alpha ten" (lev 2: w→e, o→n) merge;
    // "alpha one" stays (lev 3 to both others)
    val open = entities(d, maxEdit = 2, maxTokenDf = 64)
    assert(open == Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("every input row maps through its name to one entity") {
    val d = recs(1L -> "n one", 2L -> "n one", 3L -> "n one", 4L -> "m two")
    val out = Entities.resolveByName(d, "id", "name")
    assert(out.count() == 4)
    assert(out.select("entity_rep").distinct().count() <= 2)
  }
}
