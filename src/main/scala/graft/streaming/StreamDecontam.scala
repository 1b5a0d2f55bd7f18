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
}
