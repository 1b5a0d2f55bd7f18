package graft

import java.nio.file.{Files, Paths}

/** Optimization-round tooling: dump `.explain("formatted")` for declared
  * queries to files (the r16 `plans/` deliverable). Usage:
  *   tools/run.sh graft.PlanDump <sfDir> <outDir> [suffix] [names...]
  * With no names, dumps every SparkEntry query. `suffix` defaults to
  * "before" -> files land as <outDir>/<name>_<suffix>.txt. Building a
  * DataFrame may run eager model-fit jobs (q111 etc.) but nothing is
  * executed beyond what the query's own constructor runs. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = if (args.length > 2) args(2) else "before"
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.util.GraftSession
      .builder("graft-plandump", Some(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // ADVICE r16: a missing plan artifact (the round deliverable) must
    // not go unnoticed — count failures and exit non-zero.
    var failed = List.empty[String]
    names.foreach { name =>
      try {
        graft.operators.Dedup.clearCaches()
        val df = SparkEntry.queries(name)(spark, sfDir)
        // suffix "final": execute first, then dump the post-AQE final
        // plan (ReusedExchange / AQEShuffleRead visible) — the runtime
        // truth the static explain hides. Other suffixes: static plan.
        val plan = if (suffix.endsWith("final")) {
          df.queryExecution.executedPlan.execute().count(): Unit
          df.queryExecution.executedPlan.toString
        } else df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        println(s"[plandump] $name ok (${plan.length} chars)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
        failed ::= name
      }
    }
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(
        s"[plandump] FAILED ${failed.size}: ${failed.reverse.mkString(", ")}")
      sys.exit(1)
    }
  }
}
