package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated test tables (TESTDATA.md layout:
  * `<dir>/<name>.parquet`, one file per table).
  *
  * At 100 TB these reads become distributed parquet scans; everything
  * downstream must rely on Catalyst pushing filters/projections into the
  * scan rather than materializing full tables.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Current events.parquet is timestamp[us] without isAdjustedToUTC; with
    // inferTimestampNTZ=false (GraftSession) it reads directly as the UTC
    // session TIMESTAMP and no conversion is needed. The LongType branch
    // survives only for legacy TIMESTAMP(NANOS)-generated data, where
    // nanosAsLong yields a long that must be truncated ns→us (matching
    // DuckDB's epoch_us) and restored to TimestampType.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view, so pure-SQL users run the
    * engine through `spark.sql(...)` — combined with
    * [[graft.GraftFunctions.register]] this makes the whole surface
    * (tables + custom functions) reachable without the DataFrame API. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
