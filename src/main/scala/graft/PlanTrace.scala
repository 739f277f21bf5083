package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev utility: run registered queries and dump EVERY executed plan —
  * including the per-round jobs that eager pins (`localCheckpoint`) hide
  * from a plain `explain` on the query's return value (whose tree starts
  * at the last pinned `ExistingRDD` leaf). This is the honest plan
  * evidence for the iterative tier: each round's join strategy, exchange
  * count, and aggregate shape appear as their own `== job N ==` section
  * in execution order.
  *
  * Usage: `runMain graft.PlanTrace <sfDir> <outDir> <query> [query ...]`
  * — writes `<outDir>/<query>_trace.txt`. Single-threaded; plans are
  * appended in completion order (the bench's execution order).
  */
object PlanTrace {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanTrace <sfDir> <outDir> <query> [query ...]")
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    Files.createDirectories(outDir)
    val spark = GraftSession.builder("local[8]", 8, "graft-plantrace")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(2).foreach { name =>
      val out = outDir.resolve(s"${name}_trace.txt")
      Files.deleteIfExists(out)
      var n = 0
      val listener = new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit = synchronized {
          n += 1
          val txt = s"\n== job $n ($funcName, ${durationNs / 1000000} ms) ==\n" +
            qe.executedPlan.toString + "\n"
          Files.write(out, txt.getBytes(StandardCharsets.UTF_8),
            StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        }
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      Bench.probe(SparkEntry.queries(name)(spark, sfDir))
      // listener events post asynchronously; poll until the output file
      // size is stable for a full second (bounded at 30 s) instead of a
      // fixed sleep — a loaded box could outlast any constant grace and
      // silently truncate the trace (ADVICE r12). Single-query-at-a-time
      // by design: the listener is session-global, so a concurrent job in
      // this session would interleave into the current query's file.
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 10 && waited < 300) {
        Thread.sleep(100)
        waited += 1
        val sz = if (Files.exists(out)) Files.size(out) else 0L
        if (sz == last) stable += 1 else { stable = 0; last = sz }
      }
      spark.listenerManager.unregister(listener)
      println(s"$name: ${Files.size(out)} bytes -> $out")
    }
    spark.stop()
  }
}
