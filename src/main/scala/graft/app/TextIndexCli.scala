package graft.app
import graft.util.Mat.Ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.streaming.{StreamingBm25, StreamingLmGate, StreamingQualityGate}

/** The TEXT serving lifecycle as one spark-submit entry — PqIndexCli's
  * sibling for the text stack, wired to the spec-proven library calls:
  *
  *   build  <sfDir> <name>             build the BM25 postings index
  *                                     (`<name>_bm25{,_df,_stats}`,
  *                                     [[StreamingBm25.saveBm25Index]])
  *                                     the frozen LM gate model
  *                                     (`<name>_lm_{cells,ctx,cuts}`,
  *                                     [[StreamingLmGate.saveLmModel]])
  *                                     and the frozen trained quality
  *                                     classifier (`<name>_q_{w,theta,
  *                                     rates}`, [[StreamingQualityGate
  *                                     .saveQualityModel]])
  *   append <name> <docsParquet>       append a (doc_id, text) batch to
  *                                     the postings at batch cost
  *                                     ([[StreamingBm25.appendBm25Index]]);
  *                                     the LM model stays FROZEN — it
  *                                     re-freezes at the next build,
  *                                     exactly like the PQ models under
  *                                     appendPqIndex
  *   serve  <name> [--terms a,b,c]     BM25 top-k for the standing query
  *                                     batch (or one ad-hoc term list as
  *                                     qid 0) against the saved postings
  *   serve  <name> --hybrid <pqIndex> <sfDir> [--recall-target t]
  *                                     HYBRID top-k: the saved postings
  *                                     fused with the saved IVF/PQ index
  *                                     by reciprocal rank fusion
  *                                     ([[StreamingBm25.hybridServe]]) —
  *                                     q124 without a corpus scan in
  *                                     either arm; <sfDir> supplies the
  *                                     query vectors + re-rank fetches;
  *                                     --recall-target picks the vector
  *                                     arm's knobs from the persisted
  *                                     measured curve (PqIndexCli's
  *                                     serve knob, composed)
  *   gate   <name> <docsParquet>       LM-gate a (doc_id, lang, text)
  *                                     batch against the frozen cuts —
  *                                     per-doc score, cut and verdict
  *   gate   <name> <docsParquet> --quality
  *                                     gate the batch with the FROZEN
  *                                     trained classifier instead
  *                                     ([[StreamingQualityGate
  *                                     .gatedBatch]] — q131's weights +
  *                                     calibrated θ, frozen at build)
  *   audit  <name> <docsParquet> [--fail-over <permille>]
  *                                     STALENESS report for the frozen
  *                                     artifacts (pqIndexDistortion's
  *                                     role for the text stack): index
  *                                     stats drift vs the freeze-time
  *                                     snapshot ([[StreamingBm25
  *                                     .bm25IndexDrift]]) + the batch's
  *                                     LM admit-rate drift vs the frozen
  *                                     tercile ([[StreamingLmGate
  *                                     .lmGateDrift]]) — the numbers
  *                                     that say "re-freeze".
  *                                     + the classifier admit-rate
  *                                     drift vs the freeze-time census
  *                                     ([[StreamingQualityGate
  *                                     .qualityGateDrift]]).
  *                                     `--fail-over p` additionally
  *                                     GATES: exit 3 when ANY signal —
  *                                     avgdl drift, df total-variation,
  *                                     the worst per-language LM admit
  *                                     drift, or the worst classifier
  *                                     admit drift — exceeds p‰, so a
  *                                     cron can branch on the verdict
  *
  * Exit codes (VERDICT r12 #5, shared with PqIndexCli): 0 = ok / drift
  * within threshold; 2 = usage error; 3 = drift over `--fail-over`;
  * refusals (missing snapshot/rates, un-frozen batch language — the
  * "cannot judge" paths) keep their own channel: an
  * IllegalArgumentException that exits the JVM at 1.
  *
  * The nightly shape: `build` once per refresh decision, `append` per
  * arriving partition, `serve`/`gate` continuously, `audit --fail-over`
  * per append (rebuild on exit 3).
  */
object TextIndexCli {

  def main(args: Array[String]): Unit = {
    val spark = graft.util.GraftSession.local("graft-text-index")
    val code = try run(spark, args.toSeq) finally spark.stop()
    if (code != 0) sys.exit(code)
  }

  private def docsOf(spark: SparkSession, sfDir: String) =
    graft.util.Tables(spark, sfDir, "documents")

  private[graft] def run(spark: SparkSession, args: Seq[String]): Int =
    args match {
      case Seq("build", sfDir, name) =>
        val d = docsOf(spark, sfDir)
        StreamingBm25.saveBm25Index(
          d.select(col("doc_id"), col("text")), s"${name}_bm25")
        StreamingLmGate.saveLmModel(
          d.select(col("doc_id"), col("lang"), col("text")), s"${name}_lm")
        StreamingQualityGate.saveQualityModel(
          d.select(col("doc_id"), col("lang"), col("text")), s"${name}_q")
        val n = spark.table(s"${name}_bm25").count()
        val v = spark.table(s"${name}_bm25_df").count()
        println(s"built $name: $n posting rows, $v terms, LM gate + " +
          "quality classifier frozen")
        0
      case Seq("append", name, docsParquet) =>
        StreamingBm25.appendBm25Index(
          spark.read.parquet(docsParquet).select("doc_id", "text"),
          s"${name}_bm25")
        val n = spark.table(s"${name}_bm25").count()
        println(s"appended $docsParquet: postings now $n rows " +
          "(LM gate model unchanged — rebuild to re-freeze)")
        0
      case Seq("serve", name, "--hybrid", pqIndex, sfDir, rest @ _*) =>
        import spark.implicits._
        // optional --recall-target t: pick the vector arm's (nprobe,
        // shortlist) from the index's persisted measured curve — the
        // PqIndexCli knob, composed into the hybrid (refusal semantics
        // inherited from chooseServeKnobs: missing curve / unreachable
        // target throw)
        val (np, sl) = rest match {
          case Seq("--recall-target", t) =>
            val (np0, sl0, scanned) = graft.operators.Similarity
              .chooseServeKnobs(spark, pqIndex, t.toDouble)
            println(s"hybrid vector arm: nprobe=$np0 shortlist=$sl0 " +
              s"(~$scanned ADC rows) for recall >= $t")
            (np0, sl0)
          case Seq() =>
            (graft.operators.Similarity.MultiprobeNprobe,
              graft.operators.Similarity.PqShortlist)
          case other =>
            System.err.println(s"unknown hybrid arguments: ${other.mkString(" ")}")
            sys.exit(2)
        }
        StreamingBm25.hybridServe(spark, sfDir, s"${name}_bm25", pqIndex,
            graft.operators.TextOps.Bm25Queries.toDF("qid", "term"),
            nprobe = np, shortlist = sl)
          .show(numRows = 100, truncate = false)
        0
      case Seq("serve", name, rest @ _*) =>
        import spark.implicits._
        val queries = rest match {
          case Seq("--terms", ts) =>
            ts.split(",").toSeq.map(t => (0L, t.trim)).toDF("qid", "term")
          case Seq() =>
            graft.operators.TextOps.Bm25Queries.toDF("qid", "term")
          case other =>
            System.err.println(s"unknown serve arguments: ${other.mkString(" ")}")
            sys.exit(2)
        }
        StreamingBm25.topKBatch(queries,
            StreamingBm25.loadPostings(spark, s"${name}_bm25"),
            StreamingBm25.loadDf(spark, s"${name}_bm25"),
            StreamingBm25.loadStats(spark, s"${name}_bm25"))
          .show(numRows = 100, truncate = false)
        0
      case Seq("gate", name, docsParquet) =>
        val (cells, ctx, cuts) = StreamingLmGate.loadModel(spark, s"${name}_lm")
        StreamingLmGate.gatedBatch(
            spark.read.parquet(docsParquet).select("doc_id", "lang", "text"),
            cells, ctx, cuts)
          .show(numRows = 100, truncate = false)
        0
      case Seq("gate", name, docsParquet, "--quality") =>
        val (w, theta) = StreamingQualityGate.loadModel(spark, s"${name}_q")
        StreamingQualityGate.gatedBatch(
            spark.read.parquet(docsParquet).select("doc_id", "lang", "text"),
            w, theta)
          .show(numRows = 100, truncate = false)
        0
      case Seq("audit", name, docsParquet, rest @ _*) =>
        // flags validate BEFORE the audit work: a typo'd flag is a
        // usage error (2), not a full audit run
        val threshold = rest match {
          case Seq() => Some(None)
          case Seq("--fail-over", p) => Some(Some(p.toLong))
          case other =>
            System.err.println(s"unknown audit arguments: ${other.mkString(" ")}")
            None
        }
        if (threshold.isEmpty) 2
        else {
          val bm = StreamingBm25.bm25IndexDrift(spark, s"${name}_bm25")
            .materialize() // 1 row — feeds show + the gate once
          bm.show(truncate = false)
          // the same refusal shape as the BM25 side: a model frozen before
          // the rates table existed has no admit-rate baseline — name the
          // fix instead of dying on TABLE_OR_VIEW_NOT_FOUND mid-audit
          require(spark.catalog.tableExists(s"${name}_lm_rates"),
            s"drift gate refused: ${name}_lm has no freeze-time admit-rate " +
              "baseline (_rates) — rebuild with `build` (saveLmModel) so " +
              "there is a reference to measure gate drift against")
          val (cells, ctx, cuts) =
            StreamingLmGate.loadModel(spark, s"${name}_lm")
          val lm = StreamingLmGate.lmGateDrift(
              spark.read.parquet(docsParquet).select("doc_id", "lang", "text"),
              cells, ctx, cuts, spark.table(s"${name}_lm_rates"))
            .materialize() // #langs rows
          lm.show(numRows = 100, truncate = false)
          // the trained classifier's admit drift — same refusal shape
          require(spark.catalog.tableExists(s"${name}_q_rates"),
            s"drift gate refused: ${name}_q has no freeze-time admit-rate " +
              "baseline (_rates) — rebuild with `build` (saveQualityModel) " +
              "so there is a reference to measure gate drift against")
          val (qw, qTheta) = StreamingQualityGate.loadModel(spark, s"${name}_q")
          val qd = StreamingQualityGate.qualityGateDrift(
              spark.read.parquet(docsParquet).select("doc_id", "lang", "text"),
              qw, qTheta, spark.table(s"${name}_q_rates"))
            .materialize() // #langs rows
          qd.show(numRows = 100, truncate = false)
          def worst(df: org.apache.spark.sql.DataFrame): Long =
            df.agg(org.apache.spark.sql.functions.coalesce(
              org.apache.spark.sql.functions.max(
                org.apache.spark.sql.functions.col("drift_permille")),
              org.apache.spark.sql.functions.lit(0L))).head().getLong(0)
          threshold.get match {
            case Some(t) =>
              val bmRow = bm.head
              val signals = Seq(
                "avgdl_drift_permille" ->
                  bmRow.getLong(bmRow.fieldIndex("avgdl_drift_permille")),
                "df_tv_permille" ->
                  bmRow.getLong(bmRow.fieldIndex("df_tv_permille")),
                "lm_admit_drift_permille" -> worst(lm),
                "q_admit_drift_permille" -> worst(qd))
              val over = signals.filter(_._2 > t)
              if (over.nonEmpty) {
                System.err.println(s"[audit] FAIL: drift over the $t‰ " +
                  s"threshold: ${over.map { case (k, v) => s"$k=$v" }
                    .mkString(", ")} — re-freeze (rebuild) the index")
                3
              } else {
                println(s"[audit] all drift signals within the $t‰ " +
                  s"threshold: ${signals.map { case (k, v) => s"$k=$v" }
                    .mkString(", ")}")
                0
              }
            case None => 0
          }
        }
      case other =>
        System.err.println(
          s"""unknown arguments: ${other.mkString(" ")}
             |usage: TextIndexCli build  <sfDir> <name>
             |       TextIndexCli append <name> <docsParquet>
             |       TextIndexCli serve  <name> [--terms a,b,c]
             |       TextIndexCli serve  <name> --hybrid <pqIndex> <sfDir>
             |       TextIndexCli gate   <name> <docsParquet> [--quality]
             |       TextIndexCli audit  <name> <docsParquet> [--fail-over <permille>]""".stripMargin)
        2
    }
}



