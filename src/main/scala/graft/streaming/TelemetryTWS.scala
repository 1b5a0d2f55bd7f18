package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

import graft.transform.{AprsCalibration, AprsLineProtocol}

/** Spark-4 `transformWithState` formulation of the telemetry calibration
  * state (SURVEY §2.4 names this API as the faithful mapping; the
  * flatMapGroupsWithState twin in [[TelemetryProcessor]] is the default —
  * identical semantics, proven by the shared golden test).
  *
  * Design note: the processor runs on a NARROW projection (from, format,
  * tEQNS, seq) and emits (seq, cal) joined back to the full packet — the
  * 39-column Row serializer exceeds what Janino will compile inside the
  * state-store path (fatal there, unlike the FMGWS fallback), and a narrow
  * state op + equi-join-back is also the better scale shape: state shuffle
  * carries 4 columns, not whole packets. Streaming runs need the RocksDB
  * state store provider.
  */
class TelemetryTWSProcessor(seqIdx: Int, fmtIdx: Int, eqIdx: Int,
    ttl: Option[java.time.Duration] = None)
    extends StatefulProcessor[String, Row, Row] {

  @transient private var cal: ValueState[Seq[Seq[Double]]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cal = getHandle.getValueState[Seq[Seq[Double]]]("cal",
      Encoders.kryo[Seq[Seq[Double]]], ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

  override def handleInputRows(key: String, rows: Iterator[Row],
      timerValues: TimerValues): Iterator[Row] = {
    val ordered = rows.toSeq.sortBy(_.getLong(seqIdx))
    var current: Seq[Seq[Double]] = if (cal.exists()) cal.get() else null
    val out = Seq.newBuilder[Row]
    ordered.foreach { r =>
      if (r.getString(fmtIdx) == "telemetry-message") {
        val eq = r.getAs[scala.collection.Seq[scala.collection.Seq[Double]]](eqIdx)
        if (eq != null) {
          current = eq.map(_.toSeq).toSeq
          cal.update(current)
        }
        out += Row(r.getLong(seqIdx), null)
      } else {
        out += Row(r.getLong(seqIdx), current)
      }
    }
    out.result().iterator
  }
}

object TelemetryTWS {
  /** The keyed-state op alone: (seqCol, _cal) per input packet. In batch
    * replay the caller equi-joins this back on seqCol; in streaming the
    * serialization belongs on the same branch (stream-stream join-back has
    * no watermarkable key here), which is why [[TelemetryProcessor]]
    * (FMGWS, full-row passthrough) stays the default pipeline.
    *
    * `ttl`: bounds the RocksDB store at 100× station cardinality — an idle
    * station's calibration expires instead of living forever (an upgrade
    * over the reference's never-evicted process dict, __main__.py:993;
    * divergence: the reference would still scale a reappearing station
    * with its years-old equations, we fall back to identity). TTL needs
    * TimeMode.ProcessingTime, which makes the query self-trigger no-data
    * batches to fire expirations — so callers (and tests) must poll the
    * sink rather than rely on processAllAvailable() returning, and the
    * reference-parity default stays TTL-less under TimeMode.None. */
  def calibrations(df: DataFrame, seqCol: String,
      ttl: Option[java.time.Duration] = None): DataFrame = {
    val narrow = df.select(col("from"), col("format"), col("tEQNS"), col(seqCol))
    val n = narrow.schema
    val outSchema = StructType(Seq(
      StructField(seqCol, LongType),
      StructField(AprsCalibration.CalCol, ArrayType(ArrayType(DoubleType)))))
    implicit val rowEnc = Encoders.row(outSchema)
    narrow
      .groupByKey(r => Option(r.getString(n.fieldIndex("from"))).getOrElse(""))(Encoders.STRING)
      .transformWithState(
        new TelemetryTWSProcessor(n.fieldIndex(seqCol),
          n.fieldIndex("format"), n.fieldIndex("tEQNS"), ttl),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append(), rowEnc)
  }
}
