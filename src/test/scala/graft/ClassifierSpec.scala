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

  /** VERDICT r13 #1: the calibration/AUC cumulative pass must not run
    * as an unpartitioned window. The two-pass prefix sum must (a)
    * reproduce the naive single-window cumulative EXACTLY on a skewed
    * score frame and (b) hash-partition the heavy window on rbucket —
    * the q58/q125 pin, applied at the score-group level. */
  test("cumByScore matches the single window; partitions on rbucket") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 1000 distinct scores with gaps and negative values, skewed counts
    val gt = (0L until 1000L)
      .map(i => (i * 7 - 3000L, i % 5, i % 3))
      .toDF("score", "ps", "ns")
      .select($"score", $"ps".cast("long").as("ps"),
        $"ns".cast("long").as("ns"))
    val got = Classifier.cumByScore(gt)
      .select("score", "cp", "cn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val w = Window.orderBy($"score".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = gt
      .withColumn("cp", sum($"ps").over(w))
      .withColumn("cn", sum($"ns").over(w))
      .select("score", "cp", "cn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.sameElements(want))
    // keyed arm: per-lang cumulative equals the per-lang window
    val gtl = (0L until 400L)
      .map(i => (if (i % 4 == 0) "xx" else "en", i * 3 - 500L, 1L, i % 2))
      .toDF("lang", "score", "ps", "ns")
      .select($"lang", $"score", $"ps", $"ns".cast("long").as("ns"))
    val gotL = Classifier.cumByScore(gtl, Seq("lang"))
      .select("lang", "score", "cp", "cn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted
    val wl = Window.partitionBy($"lang").orderBy($"score".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wantL = gtl
      .withColumn("cp", sum($"ps").over(wl))
      .withColumn("cn", sum($"ns").over(wl))
      .select("lang", "score", "cp", "cn").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted
    assert(gotL.sameElements(wantL))
    // the heavy window exchanges on rbucket — never an unpartitioned sort
    val plan = castToImpl(Classifier.cumByScore(gt))
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*hashpartitioning\\([^)]*rbucket.*"), plan)
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

  test("planted: evidence reads back the trained separation") {
    // the converged planted model has exactly two nonzero cells; the
    // evidence must list them, |w|-ranked with the fb tiebreak, each
    // carrying its own token
    val got = Classifier.classifierEvidenceOf(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val (fThe, fData) = (fb("the"), fb("data"))
    val want =
      if (fThe < fData) Seq((1L, fThe, 500L, "the"), (2L, fData, -500L, "data"))
      else Seq((1L, fData, -500L, "data"), (2L, fThe, 500L, "the"))
    assert(got.toSeq == want, got.toSeq)
  }

  test("real corpus: the top evidence cell is stopword mass") {
    // the label is stopword density, so the heaviest positive cell must
    // actually CONTAIN a stopword — the interpretability the audit
    // exists to provide (and collisions stay visible in the token list)
    val top = SparkEntry.queries("q134_classifier_evidence")(spark, dir)
      .orderBy(col("rank")).head()
    assert(top.getLong(2) > 0L, s"rank-1 evidence not positive: $top")
    assert(Classifier.StopWords.exists(
      top.getString(3).split(",").contains(_)),
      s"rank-1 cell carries no stopword: $top")
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
    Seq("_w", "_theta", "_ltheta", "_rates").foreach(sfx => cleanTable(t + sfx))
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

  /** r13, the gate's pipeline composition: the frozen classifier is the
    * one quality stage whose decision is per-doc ABSOLUTE (frozen
    * weights + θ), so — unlike the corpus-relative LM/Gopher knobs,
    * which runIncremental refuses — it may ride ALL THREE arms, and the
    * pipeline equivalences must survive it: base-published ∪
    * incrementally-appended ≡ full recurate ROW FOR ROW (incl. split
    * and pack offsets), and door-admitted ≡ incrementally-appended for
    * the same batch. Real corpus, batch ids strictly above base ids
    * (the pack-continuation precondition the PublishSpec contract
    * documents). */
  test("frozen quality gate: append ≡ recurate ≡ door with the knob on") {
    import spark.implicits._
    import org.apache.spark.sql.functions.md5
    val tmp = java.nio.file.Files.createTempDirectory("qpipe").toString
    val model = "qpipe_model"
    Seq("_w", "_theta", "_ltheta", "_rates").foreach(sfx => cleanTable(model + sfx))
    Seq("qpipe_base", "qpipe_recur").foreach(cleanTable)
    // the documented incremental-contract precondition (PublishSpec):
    // an append cannot unpublish, so a batch near-dup that would OUTRANK
    // a base keeper diverges by design — exclude the near-dup components
    // spanning the id-400 boundary (the real corpus has one: a longer
    // batch-side twin of a base doc) and prove the equivalence on the
    // rest
    val dAll = graft.util.Tables(spark, dir, "documents")
    val comp = graft.operators.Dedup.memberComponentsOf(dAll)
    val crossLbl = comp.groupBy($"lbl")
      .agg(min($"doc_id").as("lo"), max($"doc_id").as("hi"))
      .filter($"lo" < 400 && $"hi" >= 400).select($"lbl")
    val excluded = comp.join(crossLbl, "lbl").select($"doc_id")
    val d = dAll.join(excluded, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val prev = d.filter($"doc_id" < 400)
    val added = d.filter($"doc_id" >= 400)
    prev.write.mode("overwrite").parquet(s"$tmp/prev/documents.parquet")
    d.write.mode("overwrite").parquet(s"$tmp/full/documents.parquet")
    for (side <- Seq("prev", "full"))
      spark.read.parquet(s"$dir/embeddings.parquet")
        .write.mode("overwrite").parquet(s"$tmp/$side/embeddings.parquet")
    // freeze the model on the BASE corpus — the artifact every arm gates
    // against (the symmetric-contract precondition)
    graft.streaming.StreamingQualityGate.saveQualityModel(
      prev.select($"doc_id", $"lang", $"text"), model)
    // base publish WITH the gate
    val (acctB, _) = graft.app.CleanPipeline.runFull(spark, s"$tmp/prev",
      "qpipe_base", buckets = 4, statePath = Some(s"$tmp/state"),
      qualityModel = Some(model))
    val rejB = acctB.filter($"stage" === "q_reject")
      .agg(coalesce(sum($"n_docs"), lit(0L))).head().getLong(0)
    assert(rejB > 0L, "the gate never fired on the base corpus")
    // door replay of the added docs (state still pristine) WITH the gate
    added.select($"doc_id", $"lang", $"source", $"text")
      .write.mode("overwrite").parquet(s"$tmp/in")
    val stream = spark.readStream
      .schema("doc_id LONG, lang STRING, source STRING, text STRING")
      .parquet(s"$tmp/in")
    val q = graft.streaming.CurateDoor.open(stream, s"$tmp/state",
      s"$tmp/out", s"$tmp/ckpt",
      isEval = graft.app.CleanPipeline.splitBucket >= 980,
      qualityModel = Some(model))
    try q.processAllAvailable() finally q.stop()
    // incremental append WITH the gate (mutates state after the door)
    val (acctI, _) = graft.app.CleanPipeline.runIncremental(spark,
      s"$tmp/prev", s"$tmp/full", "qpipe_base", s"$tmp/state",
      buckets = 4, qualityModel = Some(model))
    val rejI = acctI.filter($"stage" === "q_reject")
      .agg(coalesce(sum($"n_docs"), lit(0L))).head().getLong(0)
    assert(rejI > 0L, "the gate never fired on the appended batch")
    // door-admitted ≡ incrementally-appended, column for column
    val acm = Seq(col("doc_id"), col("lang"), col("source"),
      md5(col("text").cast("binary")).as("m"), col("n_pii"),
      col("n_tok"), col("n_kept"), col("n_dup_kept"))
    val doorRows = spark.read.parquet(s"$tmp/out").select(acm: _*)
      .collect().map(_.toString).sorted.toSeq
    val incRows = spark.table("qpipe_base").filter($"doc_id" >= 400)
      .select(acm: _*).collect().map(_.toString).sorted.toSeq
    assert(doorRows.nonEmpty && doorRows == incRows,
      s"door ≠ incremental with the gate on:\n${doorRows.take(3)}\n${incRows.take(3)}")
    // append ≡ recurate with the gate on both runs
    graft.app.CleanPipeline.runFull(spark, s"$tmp/full", "qpipe_recur",
      buckets = 4, statePath = Some(s"$tmp/state2"),
      qualityModel = Some(model))
    val cols = Seq("doc_id", "lang", "source", "text", "n_pii", "n_tok",
      "n_kept", "n_dup_kept", "split", "start_off", "pack_id", "n_chars")
    def rowsOf(t: String) = spark.table(t).select(cols.map(col): _*)
      .collect().map(_.toString).sorted.toSeq
    assert(rowsOf("qpipe_base") == rowsOf("qpipe_recur"),
      "gated incremental append diverges from the gated full recurate")
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

  /** VERDICT r13 #4's demonstration case: a minority language whose
    * score distribution sits entirely BELOW the majority's operating
    * point. The global θ lands where the majority is separable and
    * writes the minority off; the per-language θ calibrates each
    * language on its own ROC. All hand-computed. */
  test("planted minority language: global θ misclassifies it, per-lang θ fixes it") {
    import spark.implicits._
    // en: pos +100 / neg −100 (8+8 train, 2+2 eval);
    // xx: pos −300 / neg −500 (2+2 train, 1+1 eval) — all xx scores
    // below en's separating point
    def rows(lang: String, db: Long, y: Long, score: Long, n: Int,
        base: Long) =
      (0 until n).map(i => (base + i, lang, db, y, score))
    val scores = (
      rows("en", 500L, 1L, 100L, 8, 0L) ++
      rows("en", 500L, -1L, -100L, 8, 100L) ++
      rows("en", 50L, 1L, 100L, 2, 200L) ++
      rows("en", 50L, -1L, -100L, 2, 300L) ++
      rows("xx", 500L, 1L, -300L, 2, 400L) ++
      rows("xx", 500L, -1L, -500L, 2, 500L) ++
      rows("xx", 50L, 1L, -300L, 1, 600L) ++
      rows("xx", 50L, -1L, -500L, 1, 700L)
    ).toDF("doc_id", "lang", "db", "y", "score")
    // global θ: candidates {−500, −300, −100, +100} on the train split;
    // ok(−100) = P − cp + cn = 10 − 2 + 10 = 18 beats every other point
    // (−500: 12, −300: 10, +100: 10, sentinel: 10) → θ = −100, which
    // predicts every xx doc negative: xx positives are all wrong
    val thetaG = Classifier.calibrateTheta(scores.filter($"db" >= 100L))
    assert(thetaG == -100L)
    val xxWrongGlobal = scores.filter($"lang" === "xx")
      .filter(($"y" === 1L) =!= ($"score" > thetaG)).count()
    assert(xxWrongGlobal == 3L, s"global θ should miss all 3 xx positives")
    // per-lang: θ_en = −100 (unchanged), θ_xx = −500 (its own ROC:
    // ok(−500) = 2 − 0 + 2 = 4, all four xx train docs correct)
    val audit = Classifier.perLangAuditFromScores(scores).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(6), r.getLong(7)))).toMap
    assert(audit(("xx", "train")) == ((-500L, 4L, 4L, 1000L)))
    assert(audit(("xx", "eval")) == ((-500L, 2L, 2L, 1000L)))
    assert(audit(("en", "train")) == ((-100L, 16L, 16L, 1000L)))
    assert(audit(("en", "eval")) == ((-100L, 4L, 4L, 1000L)))
  }

  /** VERDICT r13 #2's done bar: the distilled student genuinely ranks
    * the held-out teacher verdict (measured per-lang eval AUC well
    * above chance), imitates it on the train split, and the teacher's
    * train-side freeze keeps the eval labels NON-DEGENERATE (the
    * q118-reference-slice design was measured degenerate: an LM that
    * memorized the eval split labels every eval doc positive and the
    * held-out AUC reads the one-class 0). */
  test("real corpus: distillation learns the LM-tercile teacher") {
    import spark.implicits._
    val out = SparkEntry.queries("q137_distilled_classifier")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(6), r.getLong(7)))).toMap
    // eval labels carry both classes for the biggest language (the
    // non-degeneracy the train-side teacher freeze buys)
    val (enN, enPos, _, enAuc) = out(("en", "eval"))
    assert(enPos > 0L && enPos < enN,
      s"en eval teacher labels degenerate: $enPos of $enN positive")
    // student ranks the held-out teacher verdict far above chance
    assert(enAuc > 700000L, s"en eval AUC $enAuc ≤ 0.70")
    // and imitates the teacher on every language's train split
    out.collect { case ((l, "train"), (_, _, agree, _)) =>
      assert(agree >= 700L, s"$l train agreement ${agree}‰ < 700‰")
    }
    // train rows never report an AUC (it would be training-set flattery)
    out.collect { case ((_, "train"), (_, _, _, auc)) =>
      assert(auc == 0L)
    }
  }

  /** The per-language gate option (VERDICT r13 #4): the frozen _ltheta
    * table replays q136's per-language predictions exactly at the door,
    * and an unseen language falls back to the global θ. */
  test("per-lang quality gate: replay matches q136; unseen lang uses global θ") {
    import spark.implicits._
    val t = "qgate_perlang_model"
    Seq("_w", "_theta", "_ltheta", "_rates").foreach(sfx =>
      cleanTable(t + sfx))
    val d = graft.util.Tables(spark, dir, "documents")
      .select($"doc_id", $"lang", $"text")
    graft.streaming.StreamingQualityGate.saveQualityModel(d, t)
    val (w, theta) = graft.streaming.StreamingQualityGate.loadModel(spark, t)
    val lthetas = graft.streaming.StreamingQualityGate
      .loadPerLangThetas(spark, t)
    assert(lthetas.nonEmpty)
    val gated = graft.streaming.StreamingQualityGate
      .gatedBatchPerLang(d, w, lthetas, theta)
      .groupBy($"lang").agg(sum($"admitted".cast("long")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val audit = SparkEntry.queries("q136_perlang_theta")(spark, dir)
      .groupBy($"lang").agg(sum($"n_pred_pos").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gated == audit,
      s"per-lang door admits ≠ q136 predictions\n$gated\n$audit")
    // an unseen language has no per-lang θ: it gates at the global θ
    val unseen = graft.streaming.StreamingQualityGate
      .gatedBatchPerLang(d.limit(20)
        .select($"doc_id", lit("xx").as("lang"), $"text"), w, lthetas, theta)
    val viaGlobal = graft.streaming.StreamingQualityGate
      .gatedBatch(d.limit(20)
        .select($"doc_id", lit("xx").as("lang"), $"text"), w, theta)
    assert(unseen.select("doc_id", "admitted").collect().map(_.toString)
        .sorted.toSeq ==
      viaGlobal.select("doc_id", "admitted").collect().map(_.toString)
        .sorted.toSeq)
  }
}
