package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.AprsSchema
import graft.transform.AprsLineProtocol

/** APRS transform throughput benchmark (BASELINE.md engine target:
  * ≥10,000 packets/s single node — ≥100× the real full-feed rate).
  * Replicates the 36 fixture packets to ~1.8M rows and pushes them through
  * the full serialization chain into the noop sink. */
object AprsBench {
  def main(args: Array[String]): Unit = {
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
    println(f"""{"metric":"aprs_packets_per_sec","value":$pps%.0f,"unit":"rows/sec","rows":$n,"sec":$sec%.2f}""")
    spark.stop()
  }
}
