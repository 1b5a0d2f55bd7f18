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
    // q65's keep decision per cluster, membership from the same memoized
    // label pass (review finding r9)
    val dropList = Dedup.nearDupDrops(spark, inDir)
      .withColumn("neardup", lit(1))
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

  /** VERDICT r8 #7: the FULL published curation pipeline as one
    * spark-submit entry — every stage this engine implements, in the
    * order a training-data team runs them:
    *
    *   clean (q54 cascade: exact-dup → repetition → quality → sample)
    *   → near-dup drop (q36 components, q65 keeper)
    *   → decontam drop (the q60 machinery aimed at THIS pipeline's own
    *     published val/test splits: a train-split doc sharing a
    *     DecontamWidth-shingle with any val/test doc is dropped)
    *   → LM-quality tail drop (q118 CCNet-style bigram-LM terciles;
    *     `--lm-tail-filter` — off by default, CCNet keeps head+middle)
    *   → span strip (q116, the published ExactSubstr convention of Lee
    *     et al. 2022: only MAXIMAL duplicated blocks of ≥ `minStripSpan`
    *     tokens are removed, short incidental matches are kept; applied
    *     WITHIN the surviving corpus — the version being published is
    *     what must not self-duplicate. `minStripSpan` ≤ the gram width
    *     degenerates to the q99 every-dup-gram rule, spec-pinned)
    *   → PII redact (q114 chain, the published text)
    *   → split ([[splitCol]]: a salted 98/1/1 hash, independent of the
    *     sample stage's bucket)
    *   → pack (q58 distributed prefix-sum offsets, 8192-token packs)
    *   → publish (lang-partitioned, doc_id-bucketed table).
    *
    * Returns (per-(lang, stage) accounting, per-lang transform summary);
    * both are driver-materialized before the staged frame unpersists.
    * One corpus decode feeds the stage cascade; the strip/redact chain
    * touches only kept documents; every drop stage joins a doc-id-sized
    * list — the expensive frames are the q36 banding and the q60/q99
    * shingle shuffles, each already shaped for scale by its operator. */
  /** The published train/val/test assignment: an INDEPENDENT salted
    * hash. The q54 sample stage consumed the plain doc_id bucket (every
    * kept doc has bucket < its language rate), so a split derived from
    * the same bucket would label the whole published corpus `train` —
    * val/test buckets 980+ can never survive sampling (review finding
    * r9). Salting re-randomizes: each published doc lands in 98/1/1
    * independently of how it was sampled, deterministically per id. */
  private[graft] def splitBucket =
    graft.util.Buckets.modN("concat(cast(doc_id as string), '#split')", 1000)

  private[graft] def splitCol =
    when(splitBucket < 980, "train")
      .when(splitBucket < 990, "val").otherwise("test")

  def runFull(spark: SparkSession, inDir: String, table: String,
      buckets: Int = 32,
      minStripSpan: Long = graft.operators.Dedup.MinStripSpan,
      lmTailFilter: Boolean = false)
      : (DataFrame, DataFrame) = {
    import graft.operators.Dedup
    val docsAll = Tables(spark, inDir, "documents")
    val dropList = Dedup.nearDupDrops(spark, inDir)
      .withColumn("neardup", lit(1))
    // q118 stage knob (VERDICT r9 #4): CCNet's convention — drop the
    // per-language tail tercile of the bigram-LM quality score. Like
    // every drop stage here, the decision is computed on the FULL corpus
    // (stage decisions are independent of stage order — the
    // runWithNearDup composition rule) and joined as a doc-id-sized list
    val lmTail =
      if (!lmTailFilter) None
      else Some(TextOps.lmTailDrops(docsAll).withColumn("lm_tail", lit(1)))
    // decontamination protects the pipeline's OWN published eval splits
    // (review finding r9: dropping against q60's bucket<100 eval set —
    // which this pipeline publishes into train — protects nothing it
    // ships): a train-split doc sharing a shingle with any val/test doc
    // is dropped; val/test docs are never dropped by this stage
    val contam = Dedup.contaminatedDocsBy(docsAll, splitBucket >= 980)
      .withColumn("contaminated", lit(1))
    val preStaged = TextOps.stagedDocs(docsAll)
      .join(dropList, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .withColumn("stage",
        when(col("stage") === "kept" && col("neardup") === 1, "neardup")
          .when(col("stage") === "kept" && col("contaminated") === 1,
            "contaminated")
          .otherwise(col("stage")))
    val staged = lmTail.fold(preStaged) { tl =>
      preStaged.join(tl, Seq("doc_id"), "left")
        .withColumn("stage",
          when(col("stage") === "kept" && col("lm_tail") === 1, "lm_tail")
            .otherwise(col("stage")))
    }.persist()
    try {
      val kept = staged.filter(col("stage") === "kept")
        .select("doc_id", "text", "source", "lang")
      // q116 threshold strip within the published corpus (VERDICT r9 #1:
      // the q99 every-dup-gram rule over-strips short incidental matches
      // the ExactSubstr convention exists to keep): derive the maximal
      // dup intervals once, strip only blocks ≥ minStripSpan, and account
      // per doc for the duplicated tokens the threshold KEPT — the delta
      // an operator reads to see what the rule spared vs q99
      val base = Dedup.spanBase(kept.select(col("doc_id"), col("text")))
      val ivs = Dedup.maxSpanIntervals(Dedup.dupStartsOf(base))
        .withColumn("n_dup_kept", expr(
          s"""aggregate(filter(iv, v -> v.b - v.a < ${minStripSpan}L),
             |  0L, (acc, v) -> acc + (v.b - v.a))""".stripMargin))
        .withColumn("iv",
          expr(s"filter(iv, v -> v.b - v.a >= ${minStripSpan}L)"))
        .select(col("doc_id"), col("iv"), col("n_dup_kept"))
      val stripped = Dedup.stripByIntervals(base, ivs)
        .withColumn("n_dup_kept", coalesce(col("n_dup_kept"), lit(0L)))
        .select(col("doc_id"), col("stripped_text"),
          col("n").as("n_tok"), col("n_kept"), col("n_dup_kept"))
      // q114 chain over the stripped text — the bytes being published
      val redacted = TextOps.piiRewriteOf(
          stripped.withColumnRenamed("stripped_text", "text"))
        .select(col("doc_id"), col("redacted").as("text"),
          (col("n_emails") + col("n_ipv4") + col("n_phones")).as("n_pii"),
          col("n_tok"), col("n_kept"), col("n_dup_kept"))
      val fin = kept.drop("text").join(redacted, "doc_id")
        .withColumn("split", splitCol)
      val packed = TextOps.packAssignments(
          fin.withColumn("tok", col("n_kept")))
        .withColumn("n_chars", length(col("text")))
        .drop("tok")
      CorpusPublisher.publish(packed, table, buckets)
      val acct = staged.groupBy(col("lang"), col("stage"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang"), col("stage"))
      // per-lang transform summary read back from the PUBLISHED table —
      // accounting covers what was actually written
      val pub = spark.table(table)
      val summary = pub.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_published"),
          sum(col("n_tok")).as("tok_in"),
          sum(col("n_kept")).as("tok_kept"),
          sum(col("n_tok") - col("n_kept")).as("tok_stripped"),
          // duplicated-span tokens the q116 threshold SPARED (q99 would
          // have stripped them) — tok_stripped + tok_dup_kept is the
          // full dup coverage, so the two columns together price the rule
          sum(col("n_dup_kept")).as("tok_dup_kept"),
          sum(col("n_pii")).as("n_pii_redacted"),
          (max(col("pack_id")) + 1L).as("n_packs"))
        .orderBy(col("lang"))
      def materialize(df: DataFrame): DataFrame = {
        val rows = df.collect() // |langs|×|stages| rows — driver-sized
        spark.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
      }
      (materialize(acct), materialize(summary))
    } finally staged.unpersist()
  }

  def main(args: Array[String]): Unit = {
    val full = args.contains("--full")
    val lmTail = args.contains("--lm-tail-filter")
    val mi = args.indexOf("--min-strip-span")
    val minSpan = if (mi >= 0) args(mi + 1).toLong
      else graft.operators.Dedup.MinStripSpan
    val pos = args.zipWithIndex.collect {
      case (a, i) if a != "--full" && a != "--lm-tail-filter" &&
        (mi < 0 || (i != mi && i != mi + 1)) => a
    }
    val inDir = pos.headOption.getOrElse("/root/testdata/sf0.01")
    val table = pos.lift(1).getOrElse("clean_corpus")
    val buckets = pos.lift(2).map(_.toInt).getOrElse(32)
    val spark = graft.util.GraftSession.local("graft-clean-pipeline")
    if (full) {
      val (acct, summary) =
        runFull(spark, inDir, table, buckets, minSpan, lmTail)
      acct.show(100, truncate = false)
      summary.show(100, truncate = false)
    } else run(spark, inDir, table, buckets).show(100, truncate = false)
    spark.stop()
  }
}
