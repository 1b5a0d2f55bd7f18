package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — q15's continuous twin via the engine's
  * NATIVE `session_window` aggregation. The batch q15 derives session
  * boundaries with a lag window over the full history; the streaming
  * path gets merging session state, watermark-driven finalization and
  * append-mode emission from the built-in operator — the "compose
  * existing ops" preference: no custom `mapGroupsWithState` where a
  * native operator already expresses the semantics (contrast
  * [[TelemetryProcessor]], whose last-write-wins calibration state has
  * no built-in equivalent and earns its custom state).
  *
  * Scale shape: state is partitioned by the grouping key and holds OPEN
  * sessions only — a closed session emits its row and frees its state
  * the moment the watermark passes its gap, so state size tracks
  * concurrently-active users, not history. */
object StreamingSessionize {

  /** Per-user sessions that close after `gap` of event-time inactivity.
    * `events` needs (user_id, ts); late rows beyond `watermark` are
    * dropped (the q14/watermark semantics pinned in StreamingSpec). */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 seconds"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
