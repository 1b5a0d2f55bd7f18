package graft

import java.io.{BufferedReader, InputStreamReader}
import java.util.concurrent.TimeUnit
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.model.AprsSchema
import graft.transform.AprsLineProtocol

/** APRS transform throughput benchmark (BASELINE.md engine target:
  * ≥10,000 packets/s single node — ≥100× the real full-feed rate).
  * Replicates the 36 fixture packets to ~1.8M rows and pushes them through
  * the full serialization chain into the noop sink.
  *
  * Like [[Bench]], the parent measures nothing itself: it forks two
  * independent child JVMs with the recompilation-cutoff flags pinned and
  * reports the best child — a sticky JIT melt (see build.sbt javaOptions)
  * is random per-JVM, so two fresh JVMs bound its impact. */
object AprsBench {
  def main(args: Array[String]): Unit =
    if (args.headOption.contains("--child")) childMain(args.drop(1))
    else parentMain(args)

  private def childMain(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.GraftSession.local("graft-aprs-bench")

    val copies = args.headOption.map(_.toInt).getOrElse(50000)
    val fixtures = spark.read.schema(AprsSchema.schema)
      .json("src/test/resources/aprs_fixtures.jsonl")
    val big = fixtures.crossJoin(
      spark.range(copies).select(col("id").as("_copy")))
      .repartition(cpus.toInt)
      .persist()
    val n = big.count() // materialize input so we time the transform alone

    def run(): Double = {
      val t0 = System.nanoTime()
      AprsLineProtocol.lines(big).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm-up
    val sec = Seq(run(), run()).min
    val pps = n / sec
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // Locale.ROOT: the f interpolator's default-locale decimal separator
    // would emit "3,61" (invalid JSON) on non-dot-decimal JVMs
    println(String.format(java.util.Locale.ROOT,
      """{"metric":"aprs_packets_per_sec","value":%.0f,"unit":"rows/sec","rows":%d,"sec":%.2f,"loadavg":%.1f}""",
      Double.box(pps), Long.box(n), Double.box(sec), Double.box(load)))
    Console.flush()
    spark.stop()
  }

  private def parentMain(args: Array[String]): Unit = {
    val attempts = (1 to 2).flatMap { _ => runChild(args) }
    attempts.sortBy(-_._1).headOption match {
      case Some((_, line)) => println(line)
      case None => // both forks failed — measure inline as a last resort
        childMain(args)
    }
  }

  /** Fork one child; returns (pps, json line) if it produced one. A daemon
    * reader thread + absolute deadline (not a blocking readLine) so a
    * wedged/deadlocked child — the exact pathology this fork harness exists
    * to bound — is forcibly killed instead of hanging the parent forever. */
  private def runChild(args: Array[String]): Option[(Double, String)] =
    try {
      val cmd = graft.util.JvmFork.command("graft.AprsBench",
        "--child" +: args.toSeq)
      val pb = new ProcessBuilder(cmd.asJava)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val proc = pb.start()
      val lines = new java.util.concurrent.LinkedBlockingQueue[String]()
      val reader = new Thread(() => {
        val br = new BufferedReader(new InputStreamReader(proc.getInputStream))
        var l = br.readLine()
        while (l != null) { lines.put(l); l = br.readLine() }
        lines.put("GRAFTEOF")
      })
      reader.setDaemon(true); reader.start()

      val deadlineAt = System.nanoTime() + 600L * 1000000000L
      var result: Option[(Double, String)] = None
      var done = false
      while (!done) {
        val waitMs = (deadlineAt - System.nanoTime()) / 1000000L
        val l = if (waitMs <= 0) null
          else lines.poll(waitMs, TimeUnit.MILLISECONDS)
        if (l == null) {
          System.err.println("[aprs-bench] watchdog: child exceeded 600s, killed")
          done = true
        } else if (l == "GRAFTEOF") {
          done = true
        } else if (l.startsWith("""{"metric":"aprs_packets_per_sec"""")) {
          val pps = """"value":([0-9.]+)""".r.findFirstMatchIn(l)
            .map(_.group(1).toDouble).getOrElse(0.0)
          result = Some((pps, l))
        }
      }
      proc.destroyForcibly()
      result
    } catch {
      case e: Exception =>
        System.err.println(s"[aprs-bench] fork failed: ${e.getMessage}")
        None
    }
}
