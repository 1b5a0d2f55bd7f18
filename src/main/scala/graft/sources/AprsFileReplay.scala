package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.parse.AprsWireParser

/** Batch replay of recorded raw APRS-IS frame logs (one `SRC>DEST,PATH:
  * payload` frame per line — the format `tcpdump`-style feed captures and
  * aprsc log archives use). Frames parse on executors through the same
  * [[AprsWireParser]] the live source uses, so a recorded day of the full
  * feed replays through the identical transform pipeline — this is how
  * the engine backfills InfluxDB from archives, and how parser changes
  * are validated against history at scale.
  *
  * Server comment lines (`# ...`), blanks, and malformed frames drop
  * silently — the reference's error contract (__main__.py:84-89).
  * `mapPartitions` is deliberate here (the one justified case: a complex
  * imperative parser over a text scan); everything after it is ordinary
  * Catalyst territory.
  */
object AprsFileReplay {

  /** `_seq` = file order (monotonic per file via the text source's
    * per-partition order), matching the live source's arrival index so
    * the calibration state replays with reference-faithful ordering. */
  def read(spark: SparkSession, path: String,
      now: Long = System.currentTimeMillis() / 1000): DataFrame = {
    implicit val enc = Encoders.row(AprsIsSource.fullSchema)
    spark.read.textFile(path)
      .select(col("value"), monotonically_increasing_id().as("_seq"))
      .as(Encoders.row(new org.apache.spark.sql.types.StructType()
        .add("value", "string").add("_seq", "long")))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val line = r.getString(0)
          if (line.isEmpty || line.startsWith("#")) None
          else AprsWireParser.parse(line, now).map(p =>
            org.apache.spark.sql.Row.fromSeq(p.toSeq :+ r.getLong(1)))
        }
      }
  }
}
