package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.classic.ClassicConversions.castToImpl

import graft.operators.Classifier

/** The trained quality classifier (q131/q132): a planted corpus whose
  * whole training run is hand-computable (batch mean-update perceptron,
  * threshold calibration, tie-corrected AUC), the convergence fixed
  * point, the co-partitioning plan contract, and real-corpus learning
  * invariants. Oracle exactness itself is the driver gate's job — these
  * specs pin the SEMANTICS the oracle twin replays. */
class ClassifierSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  /** doc_ids 0..199 split by the shared md5 bucket (db < 100 = eval). */
  private lazy val (evalIds, trainIds) = {
    import spark.implicits._
    val rows = spark.range(200)
      .select($"id", graft.util.Buckets.mod1000("id").as("db"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    (rows.filter(_._2 < 100).map(_._1), rows.filter(_._2 >= 100).map(_._1))
  }

  private def fb(tok: String): Long = {
    import spark.implicits._
    spark.range(1).select(lit(tok).as("tok"))
      .select(graft.util.Buckets.modN("tok", Classifier.PerceptronBuckets))
      .head().getLong(0)
  }

  /** The planted corpus: training separates pure-stopword docs (+1,
    * density 1000‰) from pure-content docs (−1, density 0‰); eval adds
    * a score TIE at 0 — a mixed pos doc ("the data", both trained cells
    * cancel) against an unseen-token neg doc ("big", untrained cell). */
  private lazy val planted = {
    import spark.implicits._
    require(trainIds.length >= 4 && evalIds.length >= 4)
    val t = trainIds; val e = evalIds
    Seq(
      (t(0), "en", "the"), (t(1), "en", "the"),
      (t(2), "en", "data"), (t(3), "en", "data"),
      (e(0), "en", "the"), (e(1), "en", "data"),
      (e(2), "en", "the data"), (e(3), "en", "big"),
    ).toDF("doc_id", "lang", "text")
  }

  test("planted: buckets used by the spec do not collide") {
    val bs = Seq(fb("the"), fb("data"), fb("big"))
    assert(bs.distinct.length == 3, bs)
    assert(!bs.contains(Classifier.BiasBucket))
  }

  test("planted: training converges to the hand-computed weights") {
    // epoch 1 (w = 0): every train doc misclassified (margin 0), m = 4;
    // update[the] = ⌊(+1000 +1000)/4⌋ = +500, update[data] = −500,
    // bias Σy = 0. epoch 2: margins ±500000 all correct → fixed point;
    // epoch 3 no-op.
    val perDoc = Classifier.perceptronPerDoc(planted).localCheckpoint(true)
    val w = Classifier.trainPerceptron(perDoc)
    assert(w(fb("the").toInt) == 500L)
    assert(w(fb("data").toInt) == -500L)
    assert(w(Classifier.BiasBucket.toInt) == 0L)
    assert(w.count(_ != 0L) == 2, w.zipWithIndex.filter(_._1 != 0L).toSeq)
  }

  test("planted: threshold calibrates to the max-train-accuracy ROC point") {
    // train scores {+500000 ×2 pos, −500000 ×2 neg}: rule (s > t) at
    // t = −500000 classifies all 4 correctly (ok = 4) and beats both
    // the sentinel (all-positive, ok = 2) and t = +500000 (ok = 2)
    import spark.implicits._
    val perDoc = Classifier.perceptronPerDoc(planted).localCheckpoint(true)
    val w = Classifier.trainPerceptron(perDoc)
    val theta = Classifier.calibrateTheta(
      Classifier.scoresOf(perDoc, w).filter($"db" >= 100))
    assert(theta == -500000L)
  }

  test("planted: q131 rollup matches the hand computation") {
    // eval: "the" +500000 pred+ ✓, "data" −500000 pred− ✓, "the data"
    // 0 > θ pred+ ✓ (y = +1: density 500‰ ≥ 64‰), "big" 0 pred+ ✗
    // (y = −1, untrained cell scores 0) → 3/4 correct
    val out = Classifier.classifierAuditOf(planted).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.toSeq == Seq(
      ("en", "eval", 4L, 2L, 3L, 3L, 750L),
      ("en", "train", 4L, 2L, 2L, 4L, 1000L)))
  }

  test("planted: q132 AUC is the exact tie-corrected rank statistic") {
    // eval score groups asc: −500000 (0 pos, 1 neg), 0 (1, 1 — the
    // planted tie), +500000 (1, 0): 2U = 1·(2·1+1) + 1·(2·2+0) = 7,
    // P = N = 2 → auc = ⌊10⁶·7/8⌋ = 875000
    val r = Classifier.classifierAucOf(planted).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 2L, 7L, 875000L)))
  }

  test("epoch margin pass: one doc-partial exchange over the checkpoint") {
    // the per-epoch scale contract: the margin/score pass reads the
    // checkpointed bounded frame (no FileScan, no text), the weights
    // enter as an array literal (no join), and its ONE exchange sits
    // ABOVE a partial HashAggregate — it ships ~one row per (doc, y)
    // per task, never the feature frame
    val perDoc = Classifier.perceptronPerDoc(planted).localCheckpoint(true)
    val w = Array.fill(Classifier.PerceptronBuckets + 1)(0L)
    val p = castToImpl(Classifier.scoresOf(perDoc, w))
      .queryExecution.executedPlan.toString
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1, p.take(1200))
    assert(p.contains("partial_sum"), p.take(1200))
    assert(p.contains("ExistingRDD") && !p.contains("FileScan"), p.take(1200))
    assert(!p.contains("Join"), p.take(1200))
  }

  test("q131/q132 final plans: checkpoint-fed, no text, no file scan, no join") {
    // training + scoring happen against the checkpointed bounded frame;
    // the returned plan must not re-touch the corpus (a FileScan or a
    // text:string column here means a second decode slipped in), and
    // model access is an array literal, never a join
    for (q <- Seq("q131_quality_classifier", "q132_classifier_auc")) {
      val p = castToImpl(SparkEntry.queries(q)(spark, dir))
        .queryExecution.executedPlan.toString
      assert(!p.contains("FileScan"), s"$q: ${p.take(800)}")
      assert(!p.contains("text:string"), s"$q: ${p.take(800)}")
      assert(!p.contains("Join"), s"$q: ${p.take(800)}")
    }
  }

  private def cleanTable(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new java.io.File(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath, t)
    if (loc.exists()) graft.util.Fs.rmTree(loc)
  }

  test("quality gate: freeze, replay-exact serve, zero-drift audit, refusal") {
    import spark.implicits._
    val t = "qgate_spec_model"
    Seq("_w", "_theta", "_rates").foreach(sfx => cleanTable(t + sfx))
    val d = graft.util.Tables(spark, dir, "documents")
    graft.streaming.StreamingQualityGate.saveQualityModel(
      d.select($"doc_id", $"lang", $"text"), t)
    val (w, theta) = graft.streaming.StreamingQualityGate.loadModel(spark, t)
    assert(w.length == Classifier.PerceptronBuckets + 1)
    // frozen-corpus replay: the door's admit set IS q131's
    // predicted-positive set — same weights, same θ, shared scoring
    val gated = graft.streaming.StreamingQualityGate
      .gatedBatch(d.select($"doc_id", $"lang", $"text"), w, theta)
      .groupBy($"lang")
      .agg(sum($"admitted".cast("long")).as("n_admit"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val audit = SparkEntry.queries("q131_quality_classifier")(spark, dir)
      .groupBy($"lang").agg(sum($"n_pred_pos").as("n_pred_pos"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gated == audit, s"door admits ≠ q131 predictions\n$gated\n$audit")
    // frozen-corpus replay audits at exactly zero drift, every language
    val rates = spark.table(t + "_rates")
    val replay = graft.streaming.StreamingQualityGate.qualityGateDrift(
        d.select($"doc_id", $"lang", $"text"), w, theta, rates)
      .collect()
    assert(replay.nonEmpty)
    replay.foreach(r => assert(r.getLong(4) == 0L,
      s"frozen-corpus replay must read zero drift: $r"))
    // planted drift: the rejected tail resubmitted alone — admit rate 0
    // per language, so drift = the frozen rate (deterministic, no text
    // surgery), and at least one language sits far from zero
    val tail = graft.streaming.StreamingQualityGate
      .gatedBatch(d.select($"doc_id", $"lang", $"text"), w, theta)
      .filter(!$"admitted").select($"doc_id", $"lang")
      .join(d, Seq("doc_id", "lang")).select($"doc_id", $"lang", $"text")
    val drifted = graft.streaming.StreamingQualityGate.qualityGateDrift(
        tail, w, theta, rates)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    drifted.foreach { case (lang, (admit, frozen, drift)) =>
      assert(admit == 0L && drift == frozen,
        s"$lang: resubmitted tail must read drift = frozen rate")
    }
    assert(drifted.values.map(_._3).max >= 300L,
      s"tail resubmission must register as real drift: $drifted")
    // a language with no freeze-time baseline refuses, naming the remedy
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamingQualityGate.qualityGateDrift(
        d.limit(5).select($"doc_id", lit("xx").as("lang"), $"text"),
        w, theta, rates).collect()
    }
    assert(e.getMessage.contains("no freeze-time admit-rate baseline"),
      e.getMessage)
  }

  test("real corpus: the classifier genuinely learns the quality signal") {
    // deterministic (fixed data, integer training): held-out AUC and
    // accuracy far above chance — the bar that failed the lang-label
    // design (AUC 0.509) and the uncalibrated threshold (acc ~0.52)
    import spark.implicits._
    val auc = SparkEntry.queries("q132_classifier_auc")(spark, dir)
      .head().getLong(3)
    assert(auc > 750000L, s"eval AUC $auc ≤ 0.75")
    val evalRows = SparkEntry.queries("q131_quality_classifier")(spark, dir)
      .filter($"split" === "eval")
      .agg(sum($"n_correct"), sum($"n_docs")).head()
    val acc = 1000L * evalRows.getLong(0) / evalRows.getLong(1)
    assert(acc > 700L, s"eval accuracy ${acc}‰ ≤ 700‰")
    // and the decision is non-degenerate: both classes get predictions
    val preds = SparkEntry.queries("q131_quality_classifier")(spark, dir)
      .agg(sum($"n_pred_pos"), sum($"n_docs")).head()
    assert(preds.getLong(0) > 0L && preds.getLong(0) < preds.getLong(1))
  }
}
