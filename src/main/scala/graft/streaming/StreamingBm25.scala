package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** BM25 retrieval SERVING — q122's loaded-index twin, completing the
  * text-retrieval lifecycle the way `saveGramIndex`/`loadGramIndex` does
  * for span-stripping and the saved IVF/PQ index does for vectors: the
  * corpus-wide posting lists are built ONCE per corpus version (the full
  * token explode + aggregate that q122 pays inline every run), persisted
  * as a term-bucketed sorted table, and a serving restart pays only a
  * table load. Queries then run STATELESS against the static postings —
  * a stream-static broadcast join per micro-batch, per-batch top-k via
  * the SHARED [[TextOps.bm25Rank]] — so served rankings are bit-identical
  * to the batch arm by construction, not by parallel implementation.
  *
  * Scale shape: the postings build is one token-volume shuffle
  * (doc-collapsed map-side) + vocab- and doc-sized joins, all paid at
  * index time; the serving join's static side is the bucketed postings
  * table (no exchange on restart-read), the stream side is the
  * query-batch (broadcast by construction). df and dl ride denormalized
  * on the posting row so serving does ZERO corpus-side joins.
  */
object StreamingBm25 {

  /** Build + persist the postings index for `d` (`doc_id`, `text`):
    * `<table>` holds one row per (term, doc_id) with tf, dl, df —
    * bucketed and sorted by term so a term-keyed lookup never shuffles
    * the postings — and `<table>_stats` the 1-row (n_docs, avgdl) frame.
    * One token-volume aggregate; dl/df derive from the already-collapsed
    * (doc, term) frame, not from re-scanned text. */
  def saveBm25Index(d: DataFrame, table: String, buckets: Int = 32): Unit = {
    val s = d.sparkSession
    import s.implicits._
    val tf = d
      .select($"doc_id", explode(split(lower($"text"), " ")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dl = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
    val dfT = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("n_toks"))
      .withColumn("avgdl", expr("n_toks div n_docs"))
      .select($"n_docs", $"avgdl")
      .write.mode("overwrite").format("parquet")
      .saveAsTable(table + "_stats")
    tf.join(dl, "doc_id")
      .join(dfT, "term")
      .select($"term", $"doc_id", $"tf", $"dl", $"df")
      .write.mode("overwrite")
      .bucketBy(buckets, "term").sortBy("term")
      .format("parquet").saveAsTable(table)
  }

  def loadPostings(s: SparkSession, table: String): DataFrame = s.table(table)

  def loadStats(s: SparkSession, table: String): DataFrame =
    s.table(table + "_stats")

  /** Serve one micro-batch of (qid, term) query rows against the loaded
    * postings — plain batch semantics inside foreachBatch, zero streaming
    * state. The postings are pre-filtered to the batch's distinct terms
    * (a broadcast semi-join — the lookup shape; a resident server would
    * push the terms as literals into the bucketed scan), then ranked by
    * the SHARED [[TextOps.bm25Rank]]. */
  def topKBatch(queryBatch: DataFrame, postings: DataFrame,
      stats: DataFrame, k: Int = TextOps.Bm25TopK): DataFrame = {
    val matched = postings.join(
      broadcast(queryBatch.select(col("term")).distinct()), Seq("term"),
      "left_semi")
    TextOps.bm25Rank(matched, stats, queryBatch, k)
  }
}
