package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.AprsSchema
import graft.transform.AprsLineProtocol

/** Strict-escaping mode: the generic text loop goes through the escaper
  * (fixing the reference's injection hazard) while compat mode stays
  * byte-faithful — both from the same format specs. */
class StrictModeSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  import spark.implicits._

  private val quoteVia =
    """{"format":"uncompressed","from":"K1A","via":"W1\"X"}"""

  private def lineOf(strict: Boolean): String = {
    val df = spark.read.schema(AprsSchema.schema).json(Seq(quoteVia).toDS)
    AprsLineProtocol.toLines(df, strict = strict)
      .select("line").collect()(0).getString(0)
  }

  test("compat mode reproduces the unescaped-quote hazard") {
    assert(lineOf(strict = false).contains("""via="W1"X""""))
  }

  test("strict mode escapes generic text fields") {
    assert(lineOf(strict = true).contains("""via="W1\"X""""))
  }

  test("streaming windowed aggregation over events (batch q14's stream twin)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ev_stream")
    val events = graft.util.Tables(spark, "/root/testdata/sf0.001", "events")
    events.write.mode("overwrite").parquet(dir.toString + "/in")
    val stream = spark.readStream.schema(events.schema)
      .parquet(dir.toString + "/in")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream.format("memory").queryName("ev_win")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // append mode emits only windows the watermark has closed; the batch
      // twin (q14) counts all — closed-window counts must agree with it
      val streamed = spark.table("ev_win")
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
          col("event_type"), col("n"))
      val batch = graft.operators.Relational.q14TimeWindow(spark, "/root/testdata/sf0.001")
        .select(col("wstart").as("ws"), col("event_type"), col("n").as("bn"))
      val joined = streamed.join(batch, Seq("ws", "event_type"), "inner")
      val total = streamed.count()
      assert(total > 0, "watermark closed at least one window")
      assert(joined.filter(col("n") =!= col("bn")).count() == 0,
        "streamed closed-window counts match the batch twin")
    } finally {
      q.stop()
      spark.catalog.dropTempView("ev_win")
    }
  }
}
