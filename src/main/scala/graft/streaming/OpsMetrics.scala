package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, StreamingQueryProgress}

/** Operational telemetry for the daemon — SURVEY §2.8's "streaming
  * metrics via StreamingQueryListener". The reference daemon's only
  * observability is its rotating log file (createLog,
  * /root/reference/aprs2influxdb/__main__.py:1124-1150); the Spark
  * operator additionally gets, per micro-batch: input rows and rows/sec,
  * per-FORMAT packet counts and rates, trigger duration, and keyed-state
  * size (rows + bytes of the calibration state).
  *
  * Per-format counts ride the engine's OBSERVE channel
  * ([[org.apache.spark.sql.Dataset.observe]]): map-side accumulator
  * aggregates collected WITH the batch — no extra job, no second scan,
  * delivered in the same QueryProgressEvent the engine already emits.
  * This is the Spark-native replacement for the reference's per-packet
  * `logging.debug` calls, at O(1) instead of O(rows) logging cost. */
object OpsMetrics {

  val ObservationName = "graft_ingest"

  /** The ten reference packet formats: the nine AprsLineProtocol format
    * tables plus the state-writing telemetry-message. */
  private[streaming] def formatNames: Seq[String] =
    graft.transform.AprsLineProtocol.formats.map(_.name) :+ "telemetry-message"

  /** Attach per-format observed metrics to the parsed-packet stream.
    * Placed on the raw parse output (before calibration state), so the
    * counts reflect INGESTED packets — including telemetry-messages that
    * update state but emit no line downstream. */
  def observed(df: DataFrame): DataFrame = {
    val perFormat = formatNames.map(f =>
      sum(when(col("format") === f, 1L).otherwise(0L)).as(s"n_$f"))
    df.observe(ObservationName, count(lit(1)).as("n_rows"), perFormat: _*)
  }

  private lazy val log =
    org.apache.logging.log4j.LogManager.getLogger(OpsMetrics.getClass)

  /** Default emit: daemon log (rotates with createLog parity) + stdout —
    * the operator watching the console sees the same line. */
  private def defaultEmit(s: String): Unit = { log.info(s); println(s) }

  /** One parseable `streaming-metrics ...` line per micro-batch progress
    * event. `emit` is injectable so DaemonSpec captures lines directly
    * instead of scraping stdout. */
  final class Listener(emit: String => Unit = defaultEmit)
      extends StreamingQueryListener {
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit =
      emit(line(e.progress))
  }

  /** Render one progress event. Format tokens are `name=count/rate` with
    * rate in rows/sec over the trigger duration; zero-count formats are
    * elided (a healthy feed carries a handful of formats per batch). */
  private[streaming] def line(p: StreamingQueryProgress): String = {
    val durMs = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue).getOrElse(0L)
    val durSec = math.max(durMs, 1L) / 1000.0
    val state = Option(p.stateOperators).getOrElse(Array.empty)
    val stateRows = state.map(_.numRowsTotal).sum
    val stateBytes = state.map(_.memoryUsedBytes).sum
    val formats = Option(p.observedMetrics)
      .flatMap(m => Option(m.get(ObservationName)))
      .map { row =>
        val toks = formatNames.flatMap { f =>
          val n = try row.getAs[Long](s"n_$f") catch { case _: Exception => 0L }
          if (n > 0) Some(f"$f=$n/${n / durSec}%.1f") else None
        }
        if (toks.isEmpty) " formats{}" else toks.mkString(" formats{", " ", "}")
      }
      .getOrElse("")
    val name = Option(p.name).getOrElse(p.id.toString)
    f"streaming-metrics query=$name batch=${p.batchId} " +
      f"rows=${p.numInputRows} rows_per_sec=${p.processedRowsPerSecond}%.1f " +
      s"batch_ms=$durMs state_rows=$stateRows state_bytes=$stateBytes" +
      formats
  }
}
