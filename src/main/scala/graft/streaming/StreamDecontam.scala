package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming decontamination monitor — q60's continuous twin: every
  * micro-batch of incoming documents is checked against a STATIC set of
  * eval/benchmark n-grams, and each contaminated document raises exactly
  * one alert, ever.
  *
  * Shape: the per-doc shingling is the same stateless codegen explode as
  * the batch path; the check is a stream-static equi-join on the shingle
  * (stateless — the static side is the small one by construction: it is
  * the benchmark suite, not the crawl); the only stateful operator is the
  * final `dropDuplicates(idCol)`, whose state grows with the number of
  * CONTAMINATED documents — the quantity the alert stream exists to keep
  * near zero — never with corpus size. (For a deployment where alerts are
  * plentiful and old ids can be forgotten, compose with a watermark +
  * `dropDuplicatesWithinWatermark` instead.)
  */
object StreamDecontam {

  /** Static side: the distinct DecontamWidth-gram set of an eval corpus
    * (`(doc_id, text)` rows). Cached — the static side of a stream-static
    * join is re-evaluated every micro-batch, and this one is provably
    * identical across the query's lifetime. */
  def evalShingles(evalDocs: DataFrame): DataFrame =
    Dedup.shingleRowsOf(evalDocs, distinct = false, width = Dedup.DecontamWidth)
      .select(col("s")).distinct().cache()

  /** One alert row (doc_id, offending-shingle evidence) per contaminated
    * incoming document; `stream` carries `(doc_id, text)`. */
  def alerts(stream: DataFrame, evalSh: DataFrame): DataFrame =
    Dedup.shingleRowsOf(stream, distinct = false, width = Dedup.DecontamWidth)
      .join(evalSh, "s") // stream-static equi-join: stateless
      .select(col("doc_id"), col("s").as("evidence"))
      .dropDuplicates("doc_id")

  /** Driver-built Bloom sketch of the eval shingle set, for
    * [[alertsBloom]]. Built ONCE at query-construction time (the eval
    * suite is static for the query's lifetime, same contract as
    * [[evalShingles]]' cache) — a few MB literal compiled into the
    * stream's codegen, not re-evaluated per micro-batch. Right-sized
    * from the HLL distinct estimate exactly like the batch arm
    * (`Dedup.bloomDecontamOf`): a fixed fallback capacity would
    * silently degrade the fpp — and alertsBloom's join-shrink
    * guarantee — on an eval suite larger than it (review finding). */
  def bloomSketch(evalSh: DataFrame): Array[Byte] = {
    val est = math.max(1024L,
      evalSh.agg(org.apache.spark.sql.functions
        .approx_count_distinct(col("s"))).head.getLong(0))
    Dedup.bloomOf(evalSh, "s", 2 * est)
  }

  /** q101's map-side shrink applied at the stream door: every incoming
    * shingle is gated by the codegen `might_contain` literal BEFORE the
    * stream-static join, so each micro-batch joins only (true hits +
    * a hash-sized trickle of false positives) against the eval set
    * instead of its whole shingle volume. No false negatives — alert
    * output is bit-identical to [[alerts]]; at scale this is what keeps
    * the per-batch join probe proportional to contamination, not to
    * ingest rate × document length. */
  def alertsBloom(stream: DataFrame, evalSh: DataFrame,
      bloom: Array[Byte]): DataFrame =
    Dedup.shingleRowsOf(stream, distinct = false, width = Dedup.DecontamWidth)
      .filter(Dedup.bloomGate(bloom, col("s")))
      .join(evalSh, "s") // exact check on the survivors only
      .select(col("doc_id"), col("s").as("evidence"))
      .dropDuplicates("doc_id")
}
