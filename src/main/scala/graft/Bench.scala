package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Each query is forced end-to-end
  * through the `noop` sink so the full plan executes (count() alone can be
  * satisfied from partial plans / statistics).
  */
object Bench {
  /** Headline subset: one per operator family that matters at scale. */
  val headline: Seq[String] = Seq(
    "q01_agg", "q02_join_broadcast", "q03_join_multi", "q06_filter_pushdown",
    "q07_window_topn", "q09_topk", "q14_time_window", "q15_sessionize",
    "q16_json", "q30_tokens", "q34_exact_dedup", "q36_minhash_lsh",
    "q38_ann_brute")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.util.GraftSession.local("graft-bench")

    val names = headline.filter(SparkEntry.queries.contains)
    // One untimed warm-up pass amortizes codegen/classload so the timed
    // numbers reflect steady-state executor throughput.
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).write.format("noop")
        .mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // min of two timed passes: guards the report against transient JVM
    // states (JIT deopt storms measured earlier) without hiding real cost
    val results = names.map { name =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir).write.format("noop")
          .mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
