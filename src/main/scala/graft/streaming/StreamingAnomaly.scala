package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Streaming anomaly alerting — q105's at-the-door half: each hour
  * bucket the [[StreamingDownsample]] finalizes is checked against the
  * STATIC per-type median/MAD thresholds learned from the historical
  * grid, and a breach emits one alert row. Stateless past the
  * downsample's own window state: the thresholds are a #types-row
  * broadcast, the check a stream-static join + filter, and append
  * semantics mean each bucket is checked exactly once.
  *
  * The honest lambda split: this arm catches SPIKES as they finalize,
  * but a silent-feed DROPOUT hour produces no rows and therefore no
  * alert — absence is not an event. The dropout half is
  * [[StreamingDropout]] (VERDICT r12 #4): a driver-side listener
  * re-checking the finalized rollup for expected types missing from
  * the newest closed hour — batch-over-rollup, not stream state. The
  * batch q105 sweep over the dense gap-filled grid remains the
  * exhaustive retrospective arm. */
object StreamingAnomaly {

  /** Per-type (med_n, mad_n) from a historical events frame — the
    * training side, computed with EXACTLY q105's statistic over the
    * dense grid (shared implementation). Cache it: the static side of
    * a stream-static join re-evaluates per micro-batch. */
  def thresholds(historyEvents: DataFrame): DataFrame = {
    val s = historyEvents.sparkSession
    import s.implicits._
    Relational.medianThresholds(
      Relational.gapfillFromBuckets(Relational.hourBuckets(historyEvents))
        .select($"wstart", $"event_type", $"n"))
      .cache()
  }

  /** One alert row per finalized bucket breaching its type's
    * [[Relational.AnomalyK3]]×MAD band; `stream` carries
    * (ts, event_type, value). */
  def alerts(stream: DataFrame, thresholds: DataFrame): DataFrame =
    StreamingDownsample.buckets(stream)
      .join(broadcast(thresholds), "event_type")
      .filter(abs(col("n") - col("med_n")) >
        lit(Relational.AnomalyK3) * col("mad_n"))
      .select(col("event_type"), col("h"), col("n"), col("med_n"),
        col("mad_n"))
}
