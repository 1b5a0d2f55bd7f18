package graft.app
import graft.util.Mat.Ops

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** The compressed-ANN index lifecycle as one spark-submit entry — the
  * four operations an index operator actually runs, wired to the
  * spec-proven library calls:
  *
  *   build  <sfDir> <indexPath>            fit coarse + PQ models on the
  *                                         corpus and encode it
  *                                         ([[Similarity.savePqIndex]])
  *   append <indexPath> <vecParquet>       encode a new (vec_id,
  *                                         embedding) batch against the
  *                                         FROZEN models and union it in
  *                                         ([[Similarity.appendPqIndex]])
  *   audit  <sfDir> <indexPath> [--fail-over <permille>]
  *                                         stored-code distortion per
  *                                         subspace — the drift gate an
  *                                         append is judged by; refuses
  *                                         if sfDir does not cover the
  *                                         index ([[Similarity.pqIndexDistortion]]).
  *                                         `--fail-over p` additionally
  *                                         GATES: exit 3 when the worst
  *                                         per-subspace mse drift vs the
  *                                         fit-time baseline exceeds p‰
  *                                         ([[Similarity.pqDistortionDrift]])
  *                                         — the cron hook that turns the
  *                                         report into a re-freeze signal
  *   serve  <sfDir> <indexPath> [nprobe] [shortlist]
  *                                         top-5 ANN for the query
  *                                         vectors against the saved
  *                                         index ([[Similarity.pqServeQuery]];
  *                                         knob defaults = the q111 arms,
  *                                         tune from the q115 curve)
  *
  * Exit codes (VERDICT r12 #5 — distinct, so a cron can branch):
  * 0 = ok / drift within threshold; 2 = usage error; 3 = drift over
  * `--fail-over`; refusals (missing baseline, uncovered corpus — the
  * "cannot judge" paths) keep their own channel: an
  * IllegalArgumentException that exits the JVM at 1.
  *
  * The nightly shape: `build` once per re-fit decision, `append` per
  * arriving partition, `audit --fail-over` after each append (re-fit
  * on exit 3), `serve` continuously.
  */
object PqIndexCli {

  def main(args: Array[String]): Unit = {
    val spark = graft.util.GraftSession.local("graft-pq-index")
    val code = try run(spark, args.toSeq) finally spark.stop()
    if (code != 0) sys.exit(code)
  }

  private[graft] def run(spark: SparkSession, args: Seq[String]): Int =
    args match {
      case Seq("build", sfDir, indexPath) =>
        Similarity.savePqIndex(spark, sfDir, indexPath)
        // measure + persist the recall/cost curve with the index
        // (VERDICT r9 #3) — serve --recall-target reads it
        Similarity.savePqIndexCurve(spark, sfDir, indexPath)
        // freeze the fit-time distortion as the audit's drift baseline
        // (VERDICT r12 #5) — audit --fail-over gates against it
        Similarity.savePqDistortionBaseline(spark, sfDir, indexPath)
        val n = spark.read.parquet(s"$indexPath/enc").count()
        println(s"built $indexPath: $n vectors encoded, recall/cost " +
          "curve + distortion baseline persisted")
        0
      case Seq("append", indexPath, vecParquet) =>
        val batch = spark.read.parquet(vecParquet)
          .select("vec_id", "embedding")
        Similarity.appendPqIndex(spark, indexPath, batch)
        val n = spark.read.parquet(s"$indexPath/enc").count()
        println(s"appended $vecParquet: index now $n vectors")
        0
      case Seq("audit", sfDir, indexPath, rest @ _*) =>
        // flags validate BEFORE the corpus-sized audit work: a typo'd
        // flag is a usage error (2), not a full audit run
        val threshold = rest match {
          case Seq() => Some(None)
          case Seq("--fail-over", p) => Some(Some(p.toLong))
          case other =>
            System.err.println(s"unknown audit arguments: ${other.mkString(" ")}")
            None
        }
        if (threshold.isEmpty) 2
        else {
          val now = Similarity.pqIndexDistortion(spark, sfDir, indexPath)
            .materialize() // 8 rows — feeds show + the gate once
          now.show(numRows = 16, truncate = false)
          // the distortion gate passed (it throws on partial coverage) —
          // refresh the persisted curve so it prices the index INCLUDING
          // every audited append, and --recall-target serves current truth
          Similarity.savePqIndexCurve(spark, sfDir, indexPath)
          println(s"recall/cost curve refreshed at $indexPath/curve")
          threshold.get match {
            case Some(t) =>
              val drift = Similarity.pqDistortionDrift(spark, indexPath, now)
              if (drift > t) {
                System.err.println(s"[audit] FAIL: worst per-subspace mse " +
                  s"drift $drift‰ exceeds the $t‰ threshold — re-freeze " +
                  "(rebuild) the index")
                3
              } else {
                println(s"[audit] drift $drift‰ within the $t‰ threshold")
                0
              }
            case None => 0
          }
        }
      case Seq("serve", sfDir, indexPath, "--recall-target", t) =>
        val (nprobe, shortlist, nScanned) =
          Similarity.chooseServeKnobs(spark, indexPath, t.toDouble)
        System.err.println(s"[serve] recall target $t → cheapest measured " +
          s"cell (nprobe=$nprobe, shortlist=$shortlist), $nScanned ADC rows")
        Similarity.pqServeQuery(spark, sfDir, indexPath,
            nprobe = nprobe, shortlist = shortlist)
          .show(numRows = 100, truncate = false)
        0
      case Seq("serve", sfDir, indexPath, rest @ _*) =>
        val nprobe = rest.headOption.map(_.toInt)
          .getOrElse(Similarity.MultiprobeNprobe)
        val shortlist = rest.lift(1).map(_.toInt)
          .getOrElse(Similarity.PqShortlist)
        Similarity.pqServeQuery(spark, sfDir, indexPath,
            nprobe = nprobe, shortlist = shortlist)
          .show(numRows = 100, truncate = false)
        0
      case other =>
        System.err.println(
          s"""unknown arguments: ${other.mkString(" ")}
             |usage: PqIndexCli build  <sfDir> <indexPath>
             |       PqIndexCli append <indexPath> <vecParquet>
             |       PqIndexCli audit  <sfDir> <indexPath> [--fail-over <permille>]
             |       PqIndexCli serve  <sfDir> <indexPath> [nprobe] [shortlist]
             |       PqIndexCli serve  <sfDir> <indexPath> --recall-target <r>""".stripMargin)
        2
    }
}
