package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming referential-integrity monitor — q92's continuous twin: every
  * micro-batch of incoming child rows is checked against a STATIC
  * parent-key frame, and rows whose foreign key has no parent are flagged
  * the moment they arrive — at ingestion, before a bad load propagates
  * into downstream joins.
  *
  * Shape: a stream-static LEFT join on the key (stateless — the static
  * side is the distinct parent-key frame, orders of magnitude smaller
  * than the stream, broadcast by AQE); the orphan filter is `pk IS NULL`,
  * exactly q92's anti-join semantics, so a NULL child key flags too. The
  * only stateful operator is the once-per-key alert dedup, whose state
  * grows with the number of distinct ORPHAN keys — the quantity the
  * monitor exists to keep near zero — never with stream volume. (Where
  * orphan keys are plentiful and old ones can be forgotten, compose with
  * a watermark + `dropDuplicatesWithinWatermark` instead.)
  */
object StreamingFkAudit {

  /** Static side: the distinct parent-key frame. Cached — the static side
    * of a stream-static join re-evaluates every micro-batch, and this one
    * is provably identical across the query's lifetime. */
  def parentKeys(parent: DataFrame, pk: String): DataFrame =
    parent.select(col(pk).as("pk")).distinct().cache()

  /** Per-ROW orphan stream: every incoming child row whose `fk` has no
    * parent (including NULL keys), payload columns preserved. */
  def orphans(stream: DataFrame, fk: String, keys: DataFrame): DataFrame =
    stream.join(keys, stream(fk) === keys("pk"), "left")
      .filter(col("pk").isNull)
      .drop("pk")

  /** Once-ever alert per distinct orphan KEY (NULL keys carry no key to
    * alert on and are left to the per-row stream). */
  def orphanKeyAlerts(stream: DataFrame, fk: String, keys: DataFrame): DataFrame =
    orphans(stream, fk, keys)
      .filter(col(fk).isNotNull)
      .select(col(fk).as("orphan_key"))
      .dropDuplicates("orphan_key")
}
