package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.util.Buckets

/** Streaming data selection — q102's at-the-door half: every incoming
  * document is scored against a STATIC DSIR ratio model (learned once
  * from a historical corpus via [[TextOps.dsirRatios]]) so a router can
  * keep, downsample or tag it the moment it arrives.
  *
  * Shape: the 256-long ratio table compiles into the stream's codegen
  * as an array literal, and the score is ONE per-row `aggregate` over
  * the token array — no explode, no shuffle, no state: a pure
  * projection at ingest rate. (The batch q102 needs the (doc, bucket)
  * shuffle only because it also LEARNS the table; serving doesn't.)
  * The token bucket inside the lambda is the same single-definition
  * md5 idiom as the batch path ([[Buckets.sqlModN]]), so a document
  * scores IDENTICALLY at the door and in the warehouse. */
object StreamingSelect {

  /** (doc_id, lang, n_tokens, dsir_score) per incoming document;
    * `stream` carries (doc_id, lang, text), `r` is the
    * [[TextOps.dsirRatios]] model. */
  def scores(stream: DataFrame, r: Array[Long]): DataFrame = {
    require(r.length == TextOps.DsirBuckets,
      s"ratio model must have ${TextOps.DsirBuckets} buckets, got ${r.length}")
    val rLit = r.map(v => s"${v}L").mkString("array(", ", ", ")")
    stream
      .withColumn("toks", split(lower(col("text")), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("dsir_score", expr(
        s"""aggregate(toks, 0L, (acc, t) -> acc +
           | element_at($rLit, cast(${Buckets.sqlModN("t", r.length)} as int) + 1))"""
          .stripMargin))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("dsir_score"))
  }
}
