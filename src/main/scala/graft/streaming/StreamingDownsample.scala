package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.util.OracleSafe._

/** Streaming (hour, tag) downsampling — the CONTINUOUS-QUERY role of the
  * time-series database the reference writes into (InfluxDB's CQ +
  * retention workflow: raw points downsample continuously into an
  * hourly rollup table; dashboards query the rollup with `fill()` —
  * which is exactly [[Relational.gapfillFromBuckets]], shared verbatim
  * with the batch q103).
  *
  * The "compose existing ops" preference: the native event-time
  * `window()` aggregation gives merging bucket state, watermark-driven
  * finalization and append emission for free. State holds OPEN hour
  * buckets only — a bucket emits once the watermark passes its hour and
  * frees its state, so state size tracks (active hours × tags), never
  * history; the emitted rollup table itself is time-range-sized, which
  * is the whole economics of downsampling. Late rows beyond the
  * watermark are dropped (the pinned q14 late-data semantics — the
  * streaming analog of a retention boundary). */
object StreamingDownsample {

  /** Finalized (h, event_type, n, sum_value, mean_value) rows, append
    * mode, schema-identical to [[Relational.hourBuckets]] so the shared
    * gap-fill consumes either. `events` needs (ts, event_type, value). */
  def buckets(events: DataFrame, watermark: String = "10 seconds"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
        davg(col("value")).as("mean_value"))
      .select(
        expr(s"unix_micros(window.start) div ${Relational.GapfillHourUs}L")
          .as("h"),
        col("event_type"), col("n"), col("sum_value"), col("mean_value"))
}
