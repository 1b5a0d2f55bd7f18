package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The telemetry calibration "join" — the reference's only stateful
  * operator: a process-global map callsign → 5×{a,b,c}, written by
  * telemetry-message packets (__main__.py:979-993) and read by every
  * telemetry-bearing packet (__main__.py:114-125), last-write-wins in
  * arrival order, identity default on miss.
  *
  * Semantically: a stream-to-keyed-state left-outer equi-join on `from`
  * (SURVEY §2.4). Batch formulation: an ignore-nulls `last` window over
  * strictly-prior rows per callsign — one shuffle on `from`, no state kept
  * on the driver, scales to any number of stations because state is
  * per-key and partitioned. The streaming twin (flatMapGroupsWithState)
  * lives in graft.streaming.TelemetryProcessor.
  */
object AprsCalibration {

  val CalCol = "_cal"

  /** Adds a `_cal` column: the last tEQNS from a strictly-earlier
    * telemetry-message packet of the same callsign (arrival order given by
    * `orderCol`); null ⇒ identity calibration. */
  def withBatchCalibration(df: DataFrame, orderCol: Column): DataFrame = {
    val w = Window.partitionBy(col("from")).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(CalCol,
      last(when(col("format") === "telemetry-message", col("tEQNS")),
        ignoreNulls = true).over(w))
  }

  /** End-to-end batch replay: arrival order → calibration → line protocol.
    * Returns the input rows plus `_cal` and `line` columns. */
  def replay(df: DataFrame, orderCol: Column): DataFrame =
    AprsLineProtocol.toLines(withBatchCalibration(df, orderCol), col(CalCol))
}
