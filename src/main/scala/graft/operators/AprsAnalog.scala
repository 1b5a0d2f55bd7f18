package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.util.Tables

/** The reference's two core computations — per-format dispatch +
  * line-protocol serialization with escaping, and the last-write-wins
  * keyed calibration join — re-expressed over the driver's `events` table
  * (TESTDATA.md: "the replay stand-in for the APRS stream shape") so BOTH
  * are exercised under the DuckDB oracle gate. The APRS-schema versions of
  * the same operators are golden-tested in AprsGoldenSpec (the driver
  * tables carry no APRS packets, so this is the oracle-checkable twin).
  */
object AprsAnalog {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  // ---------------------------------------------------------------- q20
  /** Dispatch + serialize: every event becomes one line-protocol string
    * `packet,format=<type> <fields>` — 'error' events are the unknown
    * format (dropped, like __main__.py:84); `props` goes through the
    * reference's backslash-first escape chain (__main__.py:1010-1012).
    * The numeric field renders via exact scaled-long arithmetic so both
    * engines print identical decimals. */
  def q20LineProtocol(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // integer-exact 2-decimal rendering (raw double→string rendering
    // differs between engines; scaled-long arithmetic does not)
    val valueStr = concat(
      expr("(cast(floor(value * 10000.0 + 0.5) as long) div 100) div 100").cast("string"),
      lit("."),
      lpad(expr("(cast(floor(value * 10000.0 + 0.5) as long) div 100) % 100").cast("string"), 2, "0"))
    val esc = regexp_replace(
      regexp_replace(
        regexp_replace($"props", "\\\\", "\\\\\\\\"),
        "'", "\\\\'"),
      "\"", "\\\\\"")
    ev(s, dir)
      .withColumn("line",
        when($"event_type" === "error", lit(null)) // unknown format → drop
          .otherwise(concat(
            lit("packet,format="), $"event_type",
            lit(" event_id="), $"event_id".cast("string"),
            lit(",user_id="), $"user_id".cast("string"),
            lit(",value="), valueStr,
            lit(",props=\""), esc, lit("\""))))
      .filter($"line".isNotNull)
      .select($"event_id", $"line")
      .orderBy($"event_id")
  }

  // ---------------------------------------------------------------- q21
  /** The calibration join's relational twin: 'signup' events write the
    * per-user scaling state (b = 1 + (k%3)·0.5, c = k%7 from the JSON
    * payload); every 'purchase' is scaled by the latest strictly-prior
    * state, identity (b=1,c=0) on miss — exactly the reference's
    * last-write-wins / identity-default semantics (__main__.py:114-125,
    * 979-993) as an ignore-nulls last window. */
  def q21CalibrationTwin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    ev(s, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .withColumn("b_set", when($"event_type" === "signup",
        lit(1.0) + ($"k" % 3).cast("double") * 0.5))
      .withColumn("c_set", when($"event_type" === "signup",
        ($"k" % 7).cast("double")))
      .withColumn("b", coalesce(last($"b_set", ignoreNulls = true).over(w), lit(1.0)))
      .withColumn("c", coalesce(last($"c_set", ignoreNulls = true).over(w), lit(0.0)))
      .filter($"event_type" === "purchase")
      .withColumn("scaled", $"b" * $"value" + $"c")
      .select($"event_id", $"user_id", $"b", $"c", $"scaled")
      .orderBy($"event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_lineprotocol" -> (q20LineProtocol _),
    "q21_calibration_twin" -> (q21CalibrationTwin _),
  )

  val oracle: Map[String, String] = Map(
    "q20_lineprotocol" ->
      """SELECT event_id,
        |  'packet,format=' || event_type ||
        |  ' event_id=' || CAST(event_id AS VARCHAR) ||
        |  ',user_id=' || CAST(user_id AS VARCHAR) ||
        |  ',value=' || CAST((CAST(floor(value * 10000.0 + 0.5) AS BIGINT) // 100) // 100 AS VARCHAR)
        |    || '.' || lpad(CAST((CAST(floor(value * 10000.0 + 0.5) AS BIGINT) // 100) % 100 AS VARCHAR), 2, '0') ||
        |  ',props="' ||
        |  replace(replace(replace(props, '\', '\\'), chr(39), '\' || chr(39)),
        |          '"', '\"') || '"' AS line
        |FROM events
        |WHERE event_type <> 'error'
        |ORDER BY event_id""".stripMargin,
    "q21_calibration_twin" ->
      """SELECT event_id, user_id, b, c, b * value + c AS scaled
        |FROM (SELECT event_id, user_id, event_type, value,
        |        coalesce(LAST_VALUE(CASE WHEN event_type = 'signup'
        |            THEN 1.0 + CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 3 AS DOUBLE) * 0.5 END IGNORE NULLS)
        |          OVER w, 1.0) AS b,
        |        coalesce(LAST_VALUE(CASE WHEN event_type = 'signup'
        |            THEN CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS DOUBLE) END IGNORE NULLS)
        |          OVER w, 0.0) AS c
        |      FROM events
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) x
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
  )
}
