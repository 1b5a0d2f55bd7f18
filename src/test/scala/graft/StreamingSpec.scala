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

  test("transformWithState state op matches the FMGWS twin (streaming, RocksDB)") {
    val fixtures = scala.io.Source
      .fromURL(getClass.getResource("/aprs_fixtures.jsonl")).getLines().toSeq
    val dir = Files.createTempDirectory("aprs_tws")
    val (b1, b2) = fixtures.splitAt(15)
    Files.write(dir.resolve("batch1.json"), b1.mkString("\n").getBytes)
    val schema = AprsSchema.schema.add("_idx", "long")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(dir.toString)
    val cal = graft.streaming.TelemetryTWS.calibrations(stream, "_idx")
    val q = cal.writeStream.format("memory").queryName("aprs_tws_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      Files.write(dir.resolve("batch2.json"), b2.mkString("\n").getBytes)
      q.processAllAvailable()
      def calOf(r: org.apache.spark.sql.Row): Option[Seq[Seq[Double]]] =
        Option(r.getSeq[scala.collection.Seq[Double]](1))
          .map(_.map(_.toList).toList)
      val got = spark.table("aprs_tws_out").collect()
        .map(r => r.getLong(0) -> calOf(r)).toMap
      // reference result: the golden-proven FMGWS processor over the same
      // rows in one batch
      val batch = spark.read.schema(schema).json(
        getClass.getResource("/aprs_fixtures.jsonl").getPath)
      val expected = graft.streaming.TelemetryProcessor.attach(batch, "_idx")
        .select($"_idx", col(graft.transform.AprsCalibration.CalCol)).collect()
        .map(r => r.getLong(0) -> calOf(r)).toMap
      assert(got.size == expected.size)
      expected.foreach { case (idx, exp) =>
        assert(got(idx) == exp, s"fixture #$idx calibration via transformWithState")
      }
    } finally {
      q.stop()
      spark.catalog.dropTempView("aprs_tws_out")
    }
  }

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
