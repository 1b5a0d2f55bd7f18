package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming heavy-hitter CANDIDATE maintenance — q81's continuous twin.
  *
  * q81's batch shape is two-pass (Misra-Gries candidates, then one exact
  * verify scan); a stream cannot re-scan, so the streaming operator
  * maintains the candidate state incrementally and leaves verification
  * to the batch side (run q81's verify pass over the archived corpus
  * when an exact answer is needed — the standard lambda split).
  *
  * State shape: the token space is hash-partitioned into `buckets`
  * key groups, each holding ONE Misra-Gries summary of `k` counters —
  * state is bounded at buckets × k counters FOREVER, regardless of
  * vocabulary growth. The superset guarantee strengthens under this
  * split: a token lives in exactly one bucket (hash-determined), so its
  * full global count concentrates there, and count > n/k ⇒
  * count > n_bucket/k (n_bucket ≤ n) ⇒ it survives that bucket's
  * summary. Counts carried in the emission are the MG lower bounds.
  *
  * Emission (Update mode): after each micro-batch, a bucket that saw
  * data re-emits its full current candidate set tagged with its
  * generation (batches processed), so a consumer keeps the latest
  * generation per bucket and unions across buckets. */
object StreamingHeavyHitters {

  val outSchema: StructType = StructType(Seq(
    StructField("bucket", IntegerType),
    StructField("gen", LongType),
    StructField("tok", StringType),
    StructField("est", LongType)))

  /** `tokens` is a streaming frame with a `tok` string column. */
  def candidates(tokens: DataFrame, k: Int = 200, buckets: Int = 64): DataFrame = {
    val withBucket = tokens
      .withColumn("bucket", pmod(hash(col("tok")), lit(buckets)).cast("int"))
      .select(col("bucket"), col("tok"))

    // state: (generation, MG counters). Kryo-serialized; ≤ k entries.
    type S = (Long, Map[String, Long])
    def process(bucket: Int, rows: Iterator[Row],
        state: GroupState[S]): Iterator[Row] = {
      val (gen0, m0) = state.getOption.getOrElse((0L, Map.empty[String, Long]))
      val m = scala.collection.mutable.HashMap[String, Long](m0.toSeq: _*)
      rows.foreach { r =>
        val t = r.getString(1)
        m.get(t) match {
          case Some(c) => m.update(t, c + 1)
          case None if m.size < k => m.update(t, 1L)
          case None => // MG decrement-all; drop exhausted counters
            val dead = scala.collection.mutable.ArrayBuffer.empty[String]
            m.foreach { case (key, c) =>
              if (c == 1L) dead += key else m.update(key, c - 1) }
            dead.foreach(m.remove)
        }
      }
      val gen = gen0 + 1
      state.update((gen, m.toMap))
      m.iterator.map { case (t, c) => Row(bucket, gen, t, c) }
    }

    withBucket
      .groupByKey((r: Row) => r.getInt(0))(Encoders.scalaInt)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        process)(Encoders.kryo[S], Encoders.row(outSchema))
  }
}
