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

  /** The LIVE downsample CASCADE (q148's streaming half): hourly AND
    * daily tiers in ONE streaming query — Spark's chained stateful
    * window aggregation (`window(window_time(window), '1 day')` over
    * the hourly tier's event-time column), so the daily state holds
    * OPEN (day × tag) cells fed by finalized hour cells, never raw
    * events — the InfluxDB CQ-cascade economics, live.
    *
    * Schema-identical to [[Relational.dailyFromHourly]] and
    * value-EXACT against it (spec-pinned): the value sum rides BOTH
    * tiers as the 1e4-scaled long and divides once per emitted daily
    * row — the same exact integer the batch tier re-derives from the
    * hourly doubles (the q140 slong round-trip), so live and batch
    * daily rows can never drift. A daily row emits once the watermark
    * passes its day end; a late hour beyond that is dropped — the
    * retention-boundary semantics the hourly tier already pins. */
  def dailyBuckets(events: DataFrame,
      watermark: String = "10 seconds"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(slong(col("value"))).as("sh"))
      .groupBy(window(window_time(col("window")), "1 day"),
        col("event_type"))
      .agg(sum(col("n")).as("n_day"), sum(col("sh")).as("sd"),
        count(lit(1)).as("active_hours"),
        max(col("n")).as("max_hour_n"), min(col("n")).as("min_hour_n"))
      .select(col("event_type"),
        tsStr(col("window.start")).as("dstart"),
        col("n_day"),
        (col("sd").cast("double") / lit(10000.0)).as("sum_value_day"),
        (col("sd").cast("double")
          / (lit(10000.0) * col("n_day").cast("double")))
          .as("mean_value_day"),
        col("active_hours"), col("max_hour_n"), col("min_hour_n"))
}
