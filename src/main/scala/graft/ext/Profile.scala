package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the "what did this load actually bring
  * in" sweep that gates a pipeline run: row count, non-null count, and
  * exact distinct cardinality per column, as data (one row per column) so
  * downstream checks can assert on it like any other table.
  */
object Profile {

  /** One row per profiled column: (col_name, n_rows, n_nonnull,
    * n_distinct). Distinct counts are EXACT (`count(distinct)`): Catalyst
    * plans the multi-distinct aggregate as one Expand pass (input
    * replicated once per distinct column) — the honest cost of exactness.
    * At 100 TB profile scope, either narrow `cols` or switch to the O(m)
    * mergeable [[Sketch.hllRegisters]] registers per column and accept
    * ±~13%; this operator is the exact gate, the sketch is the monitor.
    *
    * All counts are a single `agg` — one job, one result row — then a
    * literal explode to the per-column shape (driver-size data by
    * construction).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val unknown = cols.filterNot(df.columns.contains)
    require(unknown.isEmpty, s"unknown columns: ${unknown.mkString(", ")}")
    val aggs = count(lit(1)).as("__n") +:
      cols.flatMap(c => Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"),
        col(s"__nd_$c").as("n_distinct"))): _*)).as("p"))
      .select(col("p.col_name"), col("p.n_rows"), col("p.n_nonnull"), col("p.n_distinct"))
  }
}
