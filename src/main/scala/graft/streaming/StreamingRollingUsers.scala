package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Streaming hourly DISTINCT-user buckets — the at-the-door arm of
  * q108's rolling-DAU. Raw `count(distinct)` is unsupported inside a
  * streaming aggregation, so the exact shape is the stateful-chain
  * idiom: `dropDuplicates` on the (user, hour) pair FIRST (keyed state
  * that expires with the watermark — each pair held only until its
  * hour finalizes), then an ordinary 1-hour window count over the
  * first-occurrence rows. State tracks (active users × open hours),
  * never history.
  *
  * The honest lambda split, third edition: the 24-hour ROLLING arm
  * stays batch (q108's cover-set replication over the rollup) — a
  * streaming 24×-replicated dedup would hold a day of per-user state
  * per window for a number the batch sweep recomputes exactly from
  * this rollup anyway. */
object StreamingRollingUsers {

  /** Finalized (h, n_users_1h) rows, append mode; `events` carries
    * (ts, user_id). */
  def hourlyDistinct(events: DataFrame,
      watermark: String = "10 seconds"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .withColumn("hts", date_trunc("hour", col("ts")))
      .dropDuplicates("user_id", "hts")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_users_1h"))
      .select(
        expr(s"unix_micros(window.start) div ${Relational.GapfillHourUs}L")
          .as("h"),
        col("n_users_1h"))
}
