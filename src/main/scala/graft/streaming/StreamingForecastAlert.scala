package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming FORECAST-DEVIATION alerting — q144's standing-query form,
  * completing the forecast family's lifecycle (q141/q143 predict, q144
  * backtests, this watches): each time the downsample finalizes new
  * hours, re-fit BOTH Holt linear and additive-seasonal Holt–Winters on
  * every closed hour but the newest, keep the model with the smaller
  * per-step in-sample MSE, 1-step forecast the newest hour, and page on
  * each type whose actual count deviates by more than
  * [[graft.operators.Relational.ForecastAlertK]] in-sample RMSEs. The
  * seasonal arm matters on the reference's real feed: APRS telemetry is
  * diurnal, and a linear-only watcher pages every peak hour of a
  * 24 h-periodic series (VERDICT r14 #1) — here the seasonal fit wins
  * the MSE argmin on such a feed and the cycle stops paging, while
  * spans too short for a seasonal estimate (< P+1 train hours) fall
  * back to the linear verdict verbatim. rmse = 0 (a perfectly-fit
  * training series) means ANY deviation alerts — the q105 MAD-0
  * convention, documented at the shared definition
  * ([[graft.operators.Relational.forecastModelSelectDetailed]]).
  * Complements [[StreamingAnomaly]] (a level shift INSIDE the
  * historical median/MAD band still breaks the trend forecast) and
  * [[StreamingDropout]] (absence), the three watchers sharing one
  * rollup and one driver-side listener shape.
  *
  * ONE definition with the batch q144
  * ([[graft.operators.Relational.forecastModelSelectFromBuckets]],
  * hash-checked against DuckDB): the alert set is exactly its
  * alert = true rows, so door and batch can never drift.
  *
  * Scale shape: the rollup is time-range × #types-sized (the whole
  * economics of downsampling); the re-fit is the q141/q143 grid-array
  * class and the newest-hour comparison a #types-row join —
  * driver-cheap, no stream state, no extra scan of raw events.
  * `minTrainHours` (default 12) keeps a cold feed from paging on a
  * 3-hour trend. */
object StreamingForecastAlert {

  /** One (event_type, wstart, actual, model, forecast, rmse, abs_err,
    * alert, h, train_hours) row per type breaching the deviation gate
    * at the newest closed hour of `rollup`, with train spans shorter
    * than `minTrainHours` filtered (q144 itself already refuses spans
    * < 3 via the NULL rmse). ONE plan, one read: the train-span gate is
    * the `train_hours` literal the detailed frame stamps from the SAME
    * denseGrid bounds the fit used, and the alert hour rides along as
    * `h` — no second rollup aggregation whose answer could move if an
    * hour finalizes mid-watch (ADVICE r14 #2). */
  def deviations(rollup: DataFrame, minTrainHours: Long = 12L): DataFrame =
    graft.operators.Relational.forecastModelSelectDetailed(rollup)
      .filter(col("train_hours") >= minTrainHours && col("alert"))

  /** The driver-side watcher, [[StreamingDropout.Watcher]]'s shape:
    * re-runs [[deviations]] after every micro-batch of the named
    * downsample query that finalized rows, firing `onAlert(type, hour,
    * actual, model, forecast, rmse)` once per (type, closed hour) —
    * monotone hour guard, so progress events between hour closings
    * never re-page, while a type that KEEPS deviating re-alerts at each
    * newer closed hour. The guard hour comes from the collected alert
    * rows themselves (each carries the newest-closed-hour `h` its own
    * fit saw), never from a second rollup read. */
  final class Watcher(queryName: String, rollup: () => DataFrame,
      onAlert: (String, Long, Long, String, Double, Double) => Unit,
      minTrainHours: Long = 12L)
      extends StreamingQueryListener {
    @volatile private var lastAlertedHour = Long.MinValue
    // resolved at the FIRST progress event (the query is running by
    // then, so the default session exists): listener-bus threads
    // predate the session and never inherit an active one, and every
    // physical plan the backtest constructs needs it
    private lazy val session = org.apache.spark.sql.SparkSession.active

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit =
      if (queryName == e.progress.name && e.progress.sink.numOutputRows > 0) {
        org.apache.spark.sql.SparkSession.setActiveSession(session)
        // #types-sized collect; every row carries the same (max) hour
        val rows = deviations(rollup(), minTrainHours)
          .select(col("event_type"), col("h"), col("actual"),
            col("model"), col("forecast"), col("rmse"))
          .collect()
        if (rows.nonEmpty) {
          val h = rows.head.getLong(1)
          if (h > lastAlertedHour) {
            rows.foreach(x => onAlert(x.getString(0), h, x.getLong(2),
              x.getString(3), x.getDouble(4), x.getDouble(5)))
            lastAlertedHour = h
          }
        }
      }
  }
}
