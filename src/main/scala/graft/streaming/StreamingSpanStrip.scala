package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Ingestion-time duplicated-span stripping — q99's continuous twin: every
  * incoming document is rewritten with the tokens of any span already
  * present in the REFERENCE corpus removed (an incoming occurrence of an
  * existing gram is by definition non-first, so under q99's
  * keep-the-first rule it strips entirely). The batch q99 remains the
  * authority for within-corpus and within-batch duplication; this is the
  * at-the-door filter that stops already-known text from ever entering
  * the working set — the continuous complement, exactly as
  * StreamingDedup is to q34 and StreamDecontam to q60.
  *
  * Shape: per-doc gram explode is the same stateless map-side md5 as the
  * batch path; the membership check is a stream-static equi-join on the
  * 32-byte gram hash (stateless); the per-doc start collection and the
  * rebuild run INSIDE each micro-batch via [[strippedBatch]] (foreachBatch
  * — a document is contained in one batch, so no cross-batch state is
  * needed and a restart re-derives everything from the source offsets).
  * State: none. The static gram frame is the big side at 100 TB — it is
  * a broadcast-unfriendly but shuffle-joinable distinct-gram table, and
  * the stream side of each micro-batch is small, so the planner's
  * stream-static hash join puts the batch on the build side.
  */
object StreamingSpanStrip {

  /** Static side: the DISTINCT gram-hash set of the reference corpus
    * (`(doc_id, text)` rows). Cached — the static side of a stream-static
    * join re-evaluates every micro-batch, and this one is provably
    * identical across the query's lifetime. */
  def corpusGrams(corpusDocs: DataFrame): DataFrame =
    Dedup.gramOccurrences(Dedup.spanBase(corpusDocs))
      .select(col("h")).distinct().cache()

  /** Build-once/query-many (the IVF-persistence story for text): deriving
    * the gram set is a FULL corpus decode + explode + distinct — at
    * 100 TB that must happen once per corpus version, not once per
    * serving restart. Persist it h-bucketed + sorted, so every later
    * membership join reads buckets in place (the CorpusPublisher
    * contract) and a restarted stripper pays only a table load. */
  def saveGramIndex(corpusDocs: DataFrame, table: String,
      buckets: Int = 32): Unit =
    Dedup.gramOccurrences(Dedup.spanBase(corpusDocs))
      .select(col("h")).distinct()
      .write.mode("overwrite")
      .bucketBy(buckets, "h").sortBy("h")
      .format("parquet").saveAsTable(table)

  /** The loaded index IS the `grams` frame [[strippedBatch]] consumes —
    * spec-proven to strip identically to the inline [[corpusGrams]]. */
  def loadGramIndex(s: org.apache.spark.sql.SparkSession, table: String): DataFrame =
    s.table(table)

  /** Strip one micro-batch (`(doc_id, text)` rows) against the corpus
    * gram set: plain batch semantics inside foreachBatch. Output one row
    * per incoming doc: (doc_id, n_tok, n_removed, stripped_md5) —
    * identical strip arithmetic to q99 (shared [[Dedup.stripByStarts]]),
    * so a doc whose every span is known strips to the empty string and
    * a gram-free doc passes through untouched. */
  def strippedBatch(batchDocs: DataFrame, grams: DataFrame): DataFrame = {
    val base = Dedup.spanBase(batchDocs.select(col("doc_id"), col("text")))
    val starts = Dedup.gramOccurrences(base)
      .join(grams, "h") // stream-static: stateless
      .groupBy(col("doc_id")).agg(sort_array(collect_list(col("pos"))).as("sts"))
    Dedup.stripByStarts(base, starts)
      .select(col("doc_id"), col("n").as("n_tok"),
        (col("n") - col("n_kept")).as("n_removed"), col("stripped_md5"))
  }

  /** The q116 rule at the door: corpus-known coverage merged into
    * maximal intervals per incoming doc, and only blocks of at least
    * `minLen` tokens stripped — a quoted phrase passes, a wholesale
    * re-send of corpus text is removed. Same stateless shape as
    * [[strippedBatch]] (the interval merge is per-row expression work on
    * the already-grouped starts), same shared batch arithmetic
    * ([[Dedup.maxSpanIntervals]]/[[Dedup.stripByIntervals]]). */
  def longStrippedBatch(batchDocs: DataFrame, grams: DataFrame,
      minLen: Long = Dedup.MinStripSpan): DataFrame = {
    val base = Dedup.spanBase(batchDocs.select(col("doc_id"), col("text")))
    val starts = Dedup.gramOccurrences(base)
      .join(grams, "h")
      .groupBy(col("doc_id")).agg(sort_array(collect_list(col("pos"))).as("sts"))
    val ivs = Dedup.maxSpanIntervals(starts)
      .withColumn("iv", expr(s"filter(iv, v -> v.b - v.a >= ${minLen}L)"))
      .filter(size(col("iv")) > 0)
      .select(col("doc_id"), col("iv"))
    Dedup.stripByIntervals(base, ivs)
      .select(col("doc_id"), col("n").as("n_tok"),
        (col("n") - col("n_kept")).as("n_removed"), col("stripped_md5"))
  }
}
