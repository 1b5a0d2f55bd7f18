package graft.app

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
  *   audit  <sfDir> <indexPath>            stored-code distortion per
  *                                         subspace — the drift gate an
  *                                         append is judged by; refuses
  *                                         if sfDir does not cover the
  *                                         index ([[Similarity.pqIndexDistortion]])
  *   serve  <sfDir> <indexPath> [nprobe] [shortlist]
  *                                         top-5 ANN for the query
  *                                         vectors against the saved
  *                                         index ([[Similarity.pqServeQuery]];
  *                                         knob defaults = the q111 arms,
  *                                         tune from the q115 curve)
  *
  * The nightly shape: `build` once per re-fit decision, `append` per
  * arriving partition, `audit` after each append (re-fit when mse
  * drifts), `serve` continuously.
  */
object PqIndexCli {

  def main(args: Array[String]): Unit = {
    val spark = graft.util.GraftSession.local("graft-pq-index")
    try run(spark, args.toSeq)
    finally spark.stop()
  }

  private[graft] def run(spark: SparkSession, args: Seq[String]): Unit =
    args match {
      case Seq("build", sfDir, indexPath) =>
        Similarity.savePqIndex(spark, sfDir, indexPath)
        // measure + persist the recall/cost curve with the index
        // (VERDICT r9 #3) — serve --recall-target reads it
        Similarity.savePqIndexCurve(spark, sfDir, indexPath)
        val n = spark.read.parquet(s"$indexPath/enc").count()
        println(s"built $indexPath: $n vectors encoded, recall/cost curve persisted")
      case Seq("append", indexPath, vecParquet) =>
        val batch = spark.read.parquet(vecParquet)
          .select("vec_id", "embedding")
        Similarity.appendPqIndex(spark, indexPath, batch)
        val n = spark.read.parquet(s"$indexPath/enc").count()
        println(s"appended $vecParquet: index now $n vectors")
      case Seq("audit", sfDir, indexPath) =>
        Similarity.pqIndexDistortion(spark, sfDir, indexPath)
          .show(numRows = 16, truncate = false)
        // the distortion gate passed (it throws on partial coverage) —
        // refresh the persisted curve so it prices the index INCLUDING
        // every audited append, and --recall-target serves current truth
        Similarity.savePqIndexCurve(spark, sfDir, indexPath)
        println(s"recall/cost curve refreshed at $indexPath/curve")
      case Seq("serve", sfDir, indexPath, "--recall-target", t) =>
        val (nprobe, shortlist, nScanned) =
          Similarity.chooseServeKnobs(spark, indexPath, t.toDouble)
        System.err.println(s"[serve] recall target $t → cheapest measured " +
          s"cell (nprobe=$nprobe, shortlist=$shortlist), $nScanned ADC rows")
        Similarity.pqServeQuery(spark, sfDir, indexPath,
            nprobe = nprobe, shortlist = shortlist)
          .show(numRows = 100, truncate = false)
      case Seq("serve", sfDir, indexPath, rest @ _*) =>
        val nprobe = rest.headOption.map(_.toInt)
          .getOrElse(Similarity.MultiprobeNprobe)
        val shortlist = rest.lift(1).map(_.toInt)
          .getOrElse(Similarity.PqShortlist)
        Similarity.pqServeQuery(spark, sfDir, indexPath,
            nprobe = nprobe, shortlist = shortlist)
          .show(numRows = 100, truncate = false)
      case other =>
        System.err.println(
          s"""unknown arguments: ${other.mkString(" ")}
             |usage: PqIndexCli build  <sfDir> <indexPath>
             |       PqIndexCli append <indexPath> <vecParquet>
             |       PqIndexCli audit  <sfDir> <indexPath>
             |       PqIndexCli serve  <sfDir> <indexPath> [nprobe] [shortlist]
             |       PqIndexCli serve  <sfDir> <indexPath> --recall-target <r>""".stripMargin)
        sys.exit(2)
    }
}
