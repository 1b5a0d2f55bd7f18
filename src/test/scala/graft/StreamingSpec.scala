package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.AprsSchema
import graft.streaming.TelemetryProcessor

/** End-to-end Structured Streaming smoke test: fixture packets arrive as a
  * file stream in two micro-batches (the telemetry-message calibration for
  * KB1LQD arrives in batch 1; later telemetry for that station arrives in
  * batch 2) → keyed state → line protocol → memory sink. Output must match
  * the same goldens as the batch path, proving state carries across
  * micro-batches exactly like the reference's long-lived dictionary. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  import spark.implicits._

  test("two-microbatch replay matches goldens, state crosses batches") {
    val fixtures = scala.io.Source
      .fromURL(getClass.getResource("/aprs_fixtures.jsonl")).getLines().toSeq
    val golden = scala.io.Source
      .fromURL(getClass.getResource("/aprs_golden.txt")).getLines()
      .map(l => if (l == "\\N") None else Some(l)).toSeq

    val dir = Files.createTempDirectory("aprs_stream")
    val outName = "aprs_stream_out"
    // batch 1: everything up to and including the first telemetry-message
    val (b1, b2) = fixtures.splitAt(15)
    Files.write(dir.resolve("batch1.json"), b1.mkString("\n").getBytes)

    val schema = AprsSchema.schema.add("_idx", "long")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(dir.toString)
    val lines = TelemetryProcessor.toLines(stream, "_idx")
      .select($"_idx", $"line")
    val q = lines.writeStream.format("memory").queryName(outName)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val afterB1 = spark.table(outName).count()
      assert(afterB1 == b1.size, "batch 1 rows all processed")

      Files.write(dir.resolve("batch2.json"), b2.mkString("\n").getBytes)
      q.processAllAvailable()

      val got = spark.table(outName).collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got.size == fixtures.size)
      golden.zipWithIndex.foreach { case (expected, i) =>
        assert(got(i.toLong) == expected,
          s"\nfixture #$i\n  expected: $expected\n  got: ${got(i.toLong)}")
      }
    } finally {
      q.stop()
      spark.catalog.dropTempView(outName)
    }
  }
}
