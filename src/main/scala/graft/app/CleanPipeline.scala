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

  /** The near-dup-aware variant: after the q54 stages, members of a q36
    * near-dup component that are NOT the component's q65-chosen keeper
    * (longest member, tie → min id) fall out as stage `neardup`. The
    * keeper choice is cluster-wide and independent of the other stages —
    * a cluster's keeper can itself be dropped by quality/sampling, which
    * is the honest composition (choosing keepers only among survivors
    * would make the keep-set depend on stage order). One extra join
    * against the drop list; everything else identical to [[run]]. */
  def runWithNearDup(spark: SparkSession, inDir: String, table: String,
      buckets: Int = 32): DataFrame = {
    import graft.operators.Dedup
    val docs = Tables(spark, inDir, "documents")
    // q65's keep decision per cluster
    val drops = Dedup.queries("q65_keep_best")(spark, inDir)
      .select(col("cluster_rep").as("lbl"), col("keep_id"))
    val dropList = Dedup.memberComponentsOf(docs)
      .join(drops, "lbl")
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id")).withColumn("neardup", lit(1))
    val staged = TextOps.stagedDocs(docs)
      .join(dropList, Seq("doc_id"), "left")
      .withColumn("stage",
        when(col("stage") === "kept" && col("neardup") === 1, "neardup")
          .otherwise(col("stage")))
      .persist()
    try {
      val kept = staged.filter(col("stage") === "kept")
        .select("doc_id", "text", "source", "n_chars", "lang")
      CorpusPublisher.publish(kept, table, buckets)
      val acct = staged.groupBy(col("lang"), col("stage"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"), col("stage"))
      val rows = acct.collect()
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), acct.schema)
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
