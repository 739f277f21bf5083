package graft

import org.apache.spark.sql.Row

/** The detector must catch a REAL bailout, not just parse log text: we
  * force one by dropping `spark.sql.codegen.hugeMethodLimit` to 1 —
  * every whole-stage-compiled method then exceeds the limit, and
  * WholeStageCodegenExec logs its fallback WARN and executes the child
  * interpreted — and assert the watch names it. The healthy direction is
  * asserted too: with default confs the same query drains clean.
  */
class CodegenWatchSpec extends SparkSpec {

  private def runSomething(): Unit = {
    val d = df("k INT, v BIGINT", Seq(Row(1, 10L), Row(2, 20L), Row(1, 5L)))
    d.groupBy("k").sum("v").collect()
  }

  test("forced hugeMethodLimit bailout is detected and named") {
    val _ = spark // session BEFORE install: Spark's logging init replaces
    // the log4j2 Configuration and would detach a pre-installed watch
    CodegenWatch.install()
    CodegenWatch.drain()
    val prev = spark.conf.get("spark.sql.codegen.hugeMethodLimit", "65535")
    try {
      spark.conf.set("spark.sql.codegen.hugeMethodLimit", "1")
      runSomething()
    } finally spark.conf.set("spark.sql.codegen.hugeMethodLimit", prev)
    val hits = CodegenWatch.drain()
    assert(hits.nonEmpty, "forced bailout was not detected")
    assert(hits.exists(m => m.contains("Found too long generated codes")
      || m.contains("Whole-stage codegen disabled")),
      s"unexpected messages: $hits")
  }

  test("a healthy compiled query drains clean") {
    CodegenWatch.install()
    CodegenWatch.drain()
    runSomething()
    assert(CodegenWatch.drain().isEmpty)
  }

  test("drain is consuming: a second drain after a bailout is empty") {
    CodegenWatch.install()
    CodegenWatch.drain()
    val prev = spark.conf.get("spark.sql.codegen.hugeMethodLimit", "65535")
    try {
      spark.conf.set("spark.sql.codegen.hugeMethodLimit", "1")
      runSomething()
    } finally spark.conf.set("spark.sql.codegen.hugeMethodLimit", prev)
    assert(CodegenWatch.drain().nonEmpty)
    assert(CodegenWatch.drain().isEmpty)
  }
}
