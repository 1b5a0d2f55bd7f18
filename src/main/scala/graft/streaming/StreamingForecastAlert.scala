package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming FORECAST-DEVIATION alerting — q142's standing-query form,
  * completing the forecast family's lifecycle (q141 predicts, q142
  * backtests, this watches): each time the downsample finalizes new
  * hours, re-fit Holt on every closed hour but the newest, 1-step
  * forecast the newest, and page on each type whose actual count
  * deviates by more than [[graft.operators.Relational.ForecastAlertK]]
  * in-sample RMSEs. Complements [[StreamingAnomaly]] (a level shift
  * INSIDE the historical median/MAD band still breaks the trend
  * forecast) and [[StreamingDropout]] (absence), the three watchers
  * sharing one rollup and one driver-side listener shape.
  *
  * ONE definition with the batch q142
  * ([[graft.operators.Relational.forecastBacktestFromBuckets]],
  * hash-checked against DuckDB): the alert set is exactly its
  * alert = true rows, so door and batch can never drift.
  *
  * Scale shape: the rollup is time-range × #types-sized (the whole
  * economics of downsampling); the re-fit is the q141 grid-array class
  * and the newest-hour comparison a #types-row join — driver-cheap, no
  * stream state, no extra scan of raw events. `minTrainHours` (default
  * 12) keeps a cold feed from paging on a 3-hour trend. */
object StreamingForecastAlert {

  /** One (event_type, h, actual, forecast, rmse) alert row per type
    * breaching the deviation gate at the newest closed hour of
    * `rollup`, with train spans shorter than `minTrainHours` filtered
    * (q142 itself already refuses spans < 3 via the NULL rmse). */
  def deviations(rollup: DataFrame, minTrainHours: Long = 12L): DataFrame = {
    val backtest = graft.operators.Relational
      .forecastBacktestFromBuckets(rollup)
    val trainHours = rollup.agg(
        max(col("h")) - min(col("h"))).collect()(0)
    val tn = if (trainHours.isNullAt(0)) 0L else trainHours.getLong(0)
    if (tn < minTrainHours) backtest.filter(lit(false))
    else backtest.filter(col("alert"))
  }

  /** The driver-side watcher, [[StreamingDropout.Watcher]]'s shape:
    * re-runs [[deviations]] after every micro-batch of the named
    * downsample query that finalized rows, firing `onAlert(type, hour,
    * actual, forecast, rmse)` once per (type, closed hour) — monotone
    * hour guard, so progress events between hour closings never
    * re-page, while a type that KEEPS deviating re-alerts at each newer
    * closed hour. */
  final class Watcher(queryName: String, rollup: () => DataFrame,
      onAlert: (String, Long, Long, Double, Double) => Unit,
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
        val r = rollup()
        // #types-sized collect; every row carries the same (max) hour
        val rows = deviations(r, minTrainHours)
          .select(col("event_type"), col("wstart"), col("actual"),
            col("forecast"), col("rmse"))
          .collect()
        if (rows.nonEmpty) {
          val h = r.agg(max(col("h"))).collect()(0).getLong(0)
          if (h > lastAlertedHour) {
            rows.foreach(x => onAlert(x.getString(0), h, x.getLong(2),
              x.getDouble(3), x.getDouble(4)))
            lastAlertedHour = h
          }
        }
      }
  }
}
