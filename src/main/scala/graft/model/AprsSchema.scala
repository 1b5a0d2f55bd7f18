package graft.model

import org.apache.spark.sql.types._

/** Unified sparse APRS packet schema — the union of every key the
  * reference's ten parsers probe (FIXTURES.md §A.1; field lists at
  * /root/reference/aprs2influxdb/__main__.py:248-249, 351-352, 454-455,
  * 542-543, 642-643, 735, 803, 864-865, 938-939; nested structs at
  * :105-133, 150-160, 177-184).
  *
  * Absence semantics: the reference guards every access with `key in dict`
  * (never sees null) — here a missing key IS SQL null, and the
  * serialization layer treats null as absent (`concat_ws` drops nulls).
  *
  * Numeric types mirror what aprslib delivers per key (ints render without
  * a decimal point, floats with python-2 `str(float)` — golden-test
  * critical, SURVEY §7.4-1): lat/lon/alt/speed are computed floats;
  * course/posambiguity/gpsfixstatus/mbits/timestamp/bid/msgNo are ints.
  */
object AprsSchema {

  val telemetryType: StructType = StructType(Seq(
    StructField("seq", LongType),
    StructField("bits", StringType),
    StructField("vals", ArrayType(DoubleType))))

  /** Fixed key order of the weather emission loop (__main__.py:181). */
  val weatherKeys: Seq[String] = Seq(
    "humidity", "pressure", "rain_1h", "rain_24h", "rain_since_midnight",
    "temperature", "wind_direction", "wind_gust", "wind_speed")

  val weatherType: StructType =
    StructType(weatherKeys.map(k => StructField(k, DoubleType)))

  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("from", StringType),
    StructField("to", StringType),
    StructField("via", StringType),
    StructField("addresse", StringType), // aprslib's spelling (__main__.py:939)
    StructField("path", ArrayType(StringType)),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("altitude", DoubleType),
    StructField("speed", DoubleType),
    StructField("course", IntegerType),
    StructField("posambiguity", IntegerType),
    StructField("gpsfixstatus", IntegerType),
    StructField("mbits", IntegerType),
    StructField("timestamp", LongType),
    StructField("bid", LongType),
    StructField("msgNo", LongType),
    StructField("messagecapable", BooleanType),
    StructField("alive", BooleanType),
    StructField("phg", StringType),
    StructField("rng", StringType),
    StructField("daodatumbyte", StringType),
    StructField("mtype", StringType),
    StructField("object_format", StringType),
    StructField("object_name", StringType),
    StructField("comment", StringType),
    StructField("raw", StringType),
    StructField("symbol", StringType),
    StructField("symbol_table", StringType),
    StructField("status", StringType),
    StructField("text", StringType),
    StructField("message_text", StringType),
    StructField("identifier", StringType),
    StructField("response", StringType),
    StructField("raw_timestamp", StringType),
    StructField("wx_raw_timestamp", StringType),
    StructField("telemetry", telemetryType),
    StructField("weather", weatherType),
    StructField("tEQNS", ArrayType(ArrayType(DoubleType)))))
}
