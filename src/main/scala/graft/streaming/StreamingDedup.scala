package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.{col, md5}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication: keep the FIRST document per content hash
  * across micro-batches — the ingestion-time dedup step of a training-data
  * pipeline (the batch twin is Dedup.q34ExactDedup's hash-groupBy).
  *
  * Keyed state is one boolean per content hash, sharded across executors
  * by the groupByKey shuffle — state volume scales with DISTINCT content,
  * not stream length, and checkpoints with the query. Within a micro-batch
  * "first" is the lowest `orderCol` (arrival sequence), so the keep-set is
  * deterministic under replay; across batches the state bit wins. Works
  * identically over a batch DataFrame (each group processed once) — the
  * same dual contract as TelemetryProcessor.
  */
object StreamingDedup {

  private val HashCol = "_h"

  def firstPerContent(df: DataFrame, textCol: String, orderCol: String): DataFrame = {
    val withHash = df.withColumn(HashCol, md5(col(textCol).cast("binary")))
    val schema = withHash.schema
    val seqIdx = schema.fieldIndex(orderCol)
    val hashIdx = schema.fieldIndex(HashCol)

    def process(key: String, rows: Iterator[Row],
        state: GroupState[Boolean]): Iterator[Row] = {
      if (state.exists) Iterator.empty // content already emitted earlier
      else {
        val first = rows.minBy(_.getLong(seqIdx))
        state.update(true)
        Iterator.single(first)
      }
    }

    withHash
      .groupByKey((r: Row) => r.getString(hashIdx))(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(process)(
        Encoders.scalaBoolean, Encoders.row(schema))
      .drop(HashCol)
  }
}
