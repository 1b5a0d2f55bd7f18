package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Relational

/** Streaming NEW-SERIES detection — the live arm of the q155
  * cardinality lifecycle (`SeriesAuditCli cardinality freeze|audit` is
  * the batch cron; this is the at-the-door alert). Series cardinality
  * is the resource an InfluxDB instance dies of, and the failure mode
  * is always the same: a runaway tag value starts minting series and
  * nobody notices until memory does. The door-side detector emits ONE
  * row per series the first time the feed ever mentions it, so an ops
  * stack can page on minting RATE instead of discovering the explosion
  * at the next nightly audit.
  *
  * Mechanism: `flatMapGroupsWithState` keyed by the composite tag-set
  * key ([[Relational.withSeriesKey]] — ONE definition with q154/q155).
  * The state is a single long per series — the engine's replica of
  * exactly the structure InfluxDB itself keeps in memory (the series
  * index), which is why NoTimeout unbounded state is the honest choice
  * here: the state CANNOT outgrow the thing it exists to measure, and
  * evicting it would re-announce old series as new. Emission is
  * deterministic — the first batch that carries a key emits the MIN
  * event hour in that batch (not an arbitrary first row, which would
  * vary with partitioning), so a chronological replay emits exactly
  * the batch inventory's first_seen hour (spec-pinned live ≡ q155).
  *
  * Scale shape: one shuffle on the series key per micro-batch; state
  * rows = #series (RocksDB-compatible — a few longs per series); the
  * emitted stream is new-series-sized, i.e. almost always empty. */
object StreamingNewSeries {

  /** The keyed micro-batch row; must stay codegen-visible (a `private`
    * member fails the generated deserializer's compile). */
  case class KeyedHour(skey: String, h: Long)

  /** Append-mode (event_type, ubucket, first_seen_h) rows: one per
    * series, emitted by the first micro-batch that mentions it.
    * `events` carries (ts, user_id, event_type). */
  def firstSeen(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val keyed = Relational.withSeriesKey(events)
      .select(col("event_type").as("skey"),
        expr(s"unix_micros(ts) div ${Relational.GapfillHourUs}L").as("h"))
      .as[KeyedHour]
    keyed.groupByKey(_.skey)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[KeyedHour], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else {
            val h0 = it.map(_.h).min
            state.update(h0)
            Iterator.single((key, h0))
          })(Encoders.scalaLong, Encoders.product[(String, Long)])
      .toDF("skey", "first_seen_h")
      .select(substring_index($"skey", "|u", 1).as("event_type"),
        substring_index($"skey", "|u", -1).cast("long").as("ubucket"),
        $"first_seen_h")
  }
}
