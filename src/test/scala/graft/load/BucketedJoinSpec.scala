package graft.load

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The co-located-join contract: two tables written by Sinks.bucketedTable
  * with the same bucket spec must equi-join on the bucket key with NO
  * Exchange in the physical plan — the shuffle was pre-paid at write time.
  * At 100 TB this is the difference between re-shuffling the fact table on
  * every join and never moving it again.
  */
class BucketedJoinSpec extends SparkSpec {

  test("same-spec bucketed tables join with no Exchange") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = spark.range(10000).toDF("id")
        .withColumn("k", pmod(col("id") * 7919, lit(997L)))
        .withColumn("v", col("id") * 2)
      val dims = spark.range(997).toDF("k")
        .withColumn("name", concat(lit("dim_"), col("k")))
      Sinks.bucketedTable(facts, "bj_facts", buckets = 4, key = "k")
      Sinks.bucketedTable(dims, "bj_dims", buckets = 4, key = "k")

      val joined = spark.table("bj_facts")
        .join(spark.table("bj_dims"), "k")
      // force the final adaptive plan, then inspect it
      assert(joined.count() == 10000)
      val executed = joined.queryExecution.executedPlan.toString
      assert(executed.contains("SortMergeJoin"),
        s"expected a sort-merge join:\n$executed")
      assert(!executed.contains("Exchange"),
        s"bucketed join must not shuffle:\n$executed")
      // a partition-local Sort remains: modern Spark ignores bucket-file
      // ordering on read (legacy outputOrdering flag), so SMJ re-sorts
      // within each bucket — cheap and shuffle-free, unlike an Exchange
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      spark.sql("DROP TABLE IF EXISTS bj_facts")
      spark.sql("DROP TABLE IF EXISTS bj_dims")
    }
  }

  test("groupBy on the bucket key aggregates with no Exchange") {
    val facts = spark.range(5000).toDF("id")
      .withColumn("k", pmod(col("id"), lit(64L)))
      .withColumn("v", col("id") * 3)
    try {
      Sinks.bucketedTable(facts, "bj_agg", buckets = 4, key = "k")
      val agg = spark.table("bj_agg").groupBy("k").agg(sum("v").as("sv"))
      assert(agg.count() == 64)
      val executed = agg.queryExecution.executedPlan.toString
      assert(!executed.contains("Exchange"),
        s"bucketed aggregation must not shuffle:\n$executed")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bj_agg")
    }
  }
}
