package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming DROPOUT alerting (VERDICT r12 #4) — the half of q105 the
  * spike arm cannot carry: absence is not an event, so a silenced type
  * produces no finalized bucket and [[StreamingAnomaly.alerts]] never
  * fires. The honest closure of that lambda split is NOT stream state
  * (state keyed by types that stop arriving is exactly the state that
  * never updates) but a driver-side check OVER THE ROLLUP the
  * downsample is already appending: each time new buckets finalize,
  * ask which expected types have no bucket at the newest CLOSED hour.
  *
  * Division of labor, documented: a type-level dropout is judged
  * relative to FEED progress (some type still closes hours — the
  * rollup's max hour advances and the silent type is missing from it).
  * A feed-level blackout (NO events at all) never advances the
  * watermark, so no hour closes and this alert stays silent — that is
  * ops-level liveness, already covered by [[OpsMetrics]]' per-batch
  * rows/s telemetry, not a per-type statistic.
  *
  * Scale shape: the rollup is time-range × #types-sized (the whole
  * economics of downsampling); the check filters it to ONE hour and
  * anti-joins a #types-row expected roster — driver-cheap, no stream
  * state, no extra scan of raw events. The expected roster is the SAME
  * thresholds frame the spike arm broadcasts, so the two alert arms
  * share one contract of which types the feed owes.
  */
object StreamingDropout {

  /** One (event_type, h) alert row per expected type with NO finalized
    * bucket at the newest closed hour of `rollup` (= max h over the
    * finalized (h, event_type, n, …) rows the downsample emitted).
    * `expectedTypes` is any frame with an `event_type` column — pass
    * [[StreamingAnomaly.thresholds]]' output. An empty rollup has no
    * closed hour yet: nothing is judgeable, the result is empty (the
    * feed-level-blackout case documented above).
    *
    * ONE definition with the batch q130 presence audit
    * ([[graft.operators.Relational.lastHourPresenceOf]], hash-checked
    * against DuckDB): the alert set is exactly its n_events = 0 rows —
    * the medianThresholds sharing convention, so door and batch can
    * never drift. */
  def dropouts(rollup: DataFrame, expectedTypes: DataFrame): DataFrame =
    graft.operators.Relational.lastHourPresenceOf(rollup, expectedTypes)
      .filter(col("n_events") === 0L)
      .select(col("event_type"), col("h"))

  /** The driver-side watcher: re-runs [[dropouts]] after every
    * micro-batch of the named downsample query that finalized new rows
    * (sink output > 0 — an idle trigger closes nothing, so re-checking
    * would re-read the rollup for the same answer), and fires `onAlert`
    * once per (type, closed hour). A type that STAYS silent re-alerts
    * at each newer closed hour — a standing outage should keep paging —
    * but never twice for the same hour (progress events between hour
    * closings are deduped by the monotone hour guard).
    *
    * Register with `spark.streams.addListener`; `rollup` re-reads the
    * downsample's sink (memory table, parquet dir) so the check always
    * sees the freshest finalized buckets. Listener callbacks run on the
    * listener bus thread — the volatile guard is the only shared state. */
  final class Watcher(queryName: String, rollup: () => DataFrame,
      expectedTypes: DataFrame, onAlert: (String, Long) => Unit)
      extends StreamingQueryListener {
    @volatile private var lastAlertedHour = Long.MinValue

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit =
      if (queryName == e.progress.name && e.progress.sink.numOutputRows > 0) {
        // #types-sized collect; all rows carry the same (max) hour
        val rows = dropouts(rollup(), expectedTypes).collect()
        rows.foreach { r =>
          val h = r.getLong(1)
          if (h > lastAlertedHour) onAlert(r.getString(0), h)
        }
        if (rows.nonEmpty)
          lastAlertedHour = math.max(lastAlertedHour, rows.head.getLong(1))
      }
  }
}
