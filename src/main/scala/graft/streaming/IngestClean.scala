package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ShingleStats

/** The q54 cleaning cascade as a STREAMING ingestion transform: exact
  * dedup (keep first copy per content hash, keyed state), then the
  * stateless repetition / quality / deterministic-sampling stages — one
  * composable pipeline a continuously-ingesting deployment runs on each
  * micro-batch. Batch twin: TextOps.q54CleanCorpus (whose dup stage keeps
  * min doc_id instead of first arrival — the only semantic difference, and
  * exactly the difference between a corpus snapshot and a stream).
  *
  * Everything after the dedup state op is map-side: [[ShingleStats]] (one
  * codegen pass per doc) replaces the batch path's explode/groupBy
  * repetition signal — a per-doc aggregate needs no shuffle when the doc
  * is a single row.
  */
object IngestClean {

  /** Keeps documents that survive all four stages; adds the signal
    * columns (`rep_frac`, `quality`, `bucket`) for observability. */
  def apply(df: DataFrame, textCol: String, orderCol: String,
      idCol: String = "doc_id", maxRepFrac: Double = 0.05,
      minQuality: Double = 0.52, keepPerMille: Int = 500): DataFrame =
    withRates(df, textCol, orderCol, idCol, maxRepFrac, minQuality,
      lit(keepPerMille))

  /** [[apply]] with a COLUMN sampling rate — the batch pipeline samples
    * per language (`TextOps.stagedDocs`: en 500‰, else 200‰), and the
    * composed curate door ([[CurateDoor]]) must admit exactly that set,
    * so the door passes the same per-lang rate expression here. */
  def withRates(df: DataFrame, textCol: String, orderCol: String,
      idCol: String, maxRepFrac: Double, minQuality: Double,
      ratePerMille: org.apache.spark.sql.Column): DataFrame = {
    val deduped = StreamingDedup.firstPerContent(df, textCol, orderCol)
    deduped
      .withColumn("_ss", ShingleStats(col(textCol)))
      .withColumn("rep_frac",
        when(col("_ss.n_shingles") > 0,
          (col("_ss.n_shingles") - col("_ss.n_distinct")).cast("double") /
            col("_ss.n_shingles").cast("double")).otherwise(lit(0.0)))
      .withColumn("quality", graft.operators.TextOps.qualityExpr(col(textCol)))
      .withColumn("bucket", graft.util.Buckets.mod1000(idCol))
      .filter(col("rep_frac") <= maxRepFrac &&
        col("quality") >= minQuality && col("bucket") < ratePerMille)
      .drop("_ss")
  }
}
