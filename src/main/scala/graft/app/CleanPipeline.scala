package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.sinks.CorpusPublisher
import graft.util.Tables

/** The end-to-end batch cleaning pipeline a training-data user runs:
  * stage every document (exact-dup canonicalization → repetition filter →
  * quality filter → deterministic sampling, q54's primitive), publish the
  * survivors as a lang-partitioned + doc_id-bucketed table
  * ([[CorpusPublisher]]), and report per-language accounting of where
  * every document went. One distributed plan to stage + one bucketed
  * write; the accounting aggregate is vocabulary-sized.
  *
  * Usage: graft.app.CleanPipeline <sfDir> <tableName> [buckets]
  */
object CleanPipeline {

  /** Returns the per-(lang, stage) accounting AFTER publishing the kept
    * documents to `table`. The staged frame is persisted across its two
    * consumers (the publish write and the accounting aggregate) so the
    * cascade — the expensive plan here — runs once, and the tiny
    * accounting result is materialized before the unpersist. */
  def run(spark: SparkSession, inDir: String, table: String,
      buckets: Int = 32): DataFrame = {
    val staged = TextOps.stagedDocs(Tables(spark, inDir, "documents")).persist()
    try {
      val kept = staged.filter(col("stage") === "kept")
        .select("doc_id", "text", "source", "n_chars", "lang")
      CorpusPublisher.publish(kept, table, buckets)
      val acct = staged.groupBy(col("lang"), col("stage"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"), col("stage"))
      val rows = acct.collect() // |langs|×|stages| rows — driver-sized
      spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), acct.schema)
    } finally staged.unpersist()
  }

  def main(args: Array[String]): Unit = {
    val inDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val table = args.lift(1).getOrElse("clean_corpus")
    val buckets = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = graft.util.GraftSession.local("graft-clean-pipeline")
    run(spark, inDir, table, buckets).show(100, truncate = false)
    spark.stop()
  }
}
