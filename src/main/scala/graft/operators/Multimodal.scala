package graft.operators
import graft.util.Mat.Ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata +
  * decode/feature-extract/frame-sample stages, as a 100 TB training-data
  * pipeline would run them.
  *
  * The decode stage dispatches on payload magic bytes: PNG/JPEG payloads
  * go through a REAL pixel decode ([[ImageDecoder]], javax.imageio),
  * RIFF/WAVE payloads through a REAL PCM sample decode ([[WavDecoder]],
  * javax.sound.sampled), and animated GIF / MJPEG-AVI payloads through a
  * REAL multi-frame video decode ([[VideoDecoder]], RIFF chunk walk +
  * ImageIO per frame) — all JDK-only, no external dependency; only
  * codec-compressed video (H.264/VP9, no JDK decoder exists) falls back
  * to the clearly marked deterministic stub ([[DecoderStub]]).
  * Everything Spark-side —
  * schema, binary column handling, partition-wise batch decode via
  * mapPartitions, frame explosion, metadata pushdown — is real and
  * oracle-tested. Payloads are derived from `documents.text` bytes
  * (the driver's table; no synthetic inputs).
  */
object Multimodal {

  /** Length of the REAL decoders' descriptors (image/wav/video): 8
    * semantic statistics, each in [0, 1]. The stub's byte histogram has
    * its own length ([[DecoderStub.featureDim]]) — descriptor length is
    * a per-decoder-family property, and q117 only ever compares
    * descriptors within one family. */
  val DescriptorDim = 8

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** documents → opaque binary payload + typed metadata, as a real
    * multimodal table would look (payload is the text's UTF-8 bytes). */
  def assets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .withColumn("payload", $"text".cast("binary"))
      .withColumn("n_bytes", octet_length($"payload").cast("long"))
      .withColumn("mime", lit("application/octet-stream"))
      .withColumn("n_frames",
        least(greatest(expr("n_bytes div 100"), lit(1L)), lit(8L)))
      .select($"doc_id", $"payload", $"n_bytes", $"mime", $"n_frames")
  }

  // ---------------------------------------------------------------- q40
  /** Frame sampling: explode each asset into per-frame rows with a
    * deterministic per-frame content hash — the shape of a video/audio
    * frame-extraction stage (metadata travels, payload stays opaque). */
  def q40FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir)
      .filter($"doc_id" < 50)
      .withColumn("frame_idx", explode(expr("sequence(0, n_frames - 1)")))
      .withColumn("frame_hash",
        md5(concat($"payload", lit(":".getBytes("UTF-8")), $"frame_idx".cast("string").cast("binary"))))
      .select($"doc_id", $"n_bytes", $"n_frames", $"frame_idx", $"frame_hash")
      .orderBy($"doc_id", $"frame_idx")
  }

  // ---------------------------------------------------------------- q55
  /** Frame-level dedup accounting: duplicate payloads yield identical
    * per-frame content hashes, so distinct-vs-total frame counts give the
    * content-addressable-storage savings a multimodal pipeline plans
    * around. One explode + two partial aggregates, grouped by asset size
    * class (n_frames). */
  def q55FrameDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir)
      .withColumn("frame_idx", explode(expr("sequence(0, n_frames - 1)")))
      .withColumn("frame_hash",
        md5(concat($"payload", lit(":".getBytes("UTF-8")), $"frame_idx".cast("string").cast("binary"))))
      .groupBy($"n_frames")
      .agg(countDistinct($"doc_id").as("n_assets"),
        count(lit(1)).as("total_frames"),
        countDistinct($"frame_hash").as("distinct_frames"))
      .withColumn("dup_ratio",
        ($"total_frames" - $"distinct_frames").cast("double") /
          $"total_frames".cast("double"))
      .orderBy($"n_frames")
  }

  // --------------------------------------------------------------- q117
  /** Cosine floor for calling two decoded assets perceptual near-dups.
    * Calibrated on the synthetic corpus (measured via the oracle's own
    * arithmetic at all three SFs): CENTERED byte-histogram correlations
    * of unrelated same-generator documents read median ≈ 0.966 / p99 ≈
    * 0.991, while content-sharing payload pairs sit in a separated tail
    * ≥ 0.999 (21 pairs at sf0.001/sf0.01, 199 at sf0.1). Perceptual
    * thresholds are tight by convention (SemDeDup uses 1−ε): a loose
    * cut on a profile descriptor collapses same-language corpora into
    * one component. */
  val PerceptualDupThreshold = 0.999

  /** Decode descriptors → the PACKED exact-integer form the q117 pair
    * scan joins on. Real-decoder features are [0, 1] ratios → the
    * standard 1e6 quantization ([[graft.functions.QuantizeVec]]) —
    * their components (mean color, RMS, motion) are informative in
    * absolute position, so raw cosine is the right metric. Stub
    * features are exact integer byte-VALUE counts, and same-language
    * payloads all share one dominant histogram direction, so the stub
    * arm compares CENTERED vectors z := D·c − t·1 (t = Σc; the ×D keeps
    * z integer — cosine is scale-invariant), i.e. the Pearson
    * correlation of histograms, which decorrelates unrelated documents.
    * z itself is never built: [[perceptualPairsOf]] derives its dots
    * from the packed counts by identity. Zero-byte payloads get the
    * zero vector (cosine 0 by [[Similarity]]'s zero-vector convention —
    * below every threshold, no ANSI division abort). */
  private[graft] def quantizedDescriptors(decoded: DataFrame): DataFrame = {
    val dim = DecoderStub.featureDim.toLong
    decoded
      // raw integer vector: exact counts (stub) / 1e6 fixed point (real)
      .withColumn("cl", when(col("decoder") === "stub",
          expr("transform(features, f -> CAST(f AS BIGINT))"))
        .otherwise(graft.functions.QuantizeVec(col("features"))))
      .withColumn("t", expr("aggregate(cl, 0L, (a, x) -> a + x)"))
      // 2-per-long packing (both arms are nonnegative < 2³²): the pair
      // join shuffles/materializes HALF the bytes, and the centered
      // arithmetic never needs the expanded z vector — see the q117
      // dot identity below
      .withColumn("p", graft.functions.Pack32(col("cl")))
      .withColumn("ssq", graft.functions.DotPacked32(col("p"), col("p")))
      // ‖z‖² = D²·Σc² − D·t² for the centered stub arm (z := D·c − t·1);
      // the real arm's norm is the plain quantized norm
      .withColumn("nrm", when(col("decoder") === "stub",
          sqrt((lit(dim * dim) * col("ssq") - lit(dim) * col("t") * col("t"))
            .cast("double")))
        .otherwise(sqrt(col("ssq").cast("double"))))
      // cl rides along for the index fit ([[savePerceptualIndex]]'s
      // variance pass); the pair scans never carry it (gridPairs /
      // blockKeys select their own slim column sets, so Catalyst prunes
      // it before any exchange)
      .select(col("doc_id"), col("decoder"), col("cl"), col("p"),
        col("t"), col("nrm"))
  }

  /** The q117 pair scan over an arbitrary assets frame (factored so the
    * planted re-encode spec drives the exact production path): decode →
    * packed descriptors → the q45 grid shape → per-family cosine ≥
    * [[PerceptualDupThreshold]].
    *
    * The stub arm's centered cosine never materializes the centered
    * vector: with z := D·c − t·1 and Σc = t,
    *   dot(z_a, z_b) = D²·dot(c_a, c_b) − D·t_a·t_b
    *   ‖z‖²         = D²·Σc²           − D·t²
    * so the join carries only the PACKED count vector + one scalar —
    * half of q45's per-pair bytes despite 4× the dimensions — and every
    * quantity is the exact integer the DuckDB twin computes from the
    * expanded z. Exactness bound: D²·t_a·t_b < 2⁵³ ⇔ payloads ≲ 370 KB
    * keep the double cast lossless (the synthetic corpus is ≤ 1 KB/doc;
    * beyond it the LONG arithmetic is still exact to 2⁶³ ⇔ ~11 MB). */
  private[graft] def perceptualPairsOf(assetsDf: DataFrame): DataFrame = {
    val s = assetsDf.sparkSession
    val qd = quantizedDescriptors(decodeFeatures(s, assetsDf))
    gridVerifiedPairs(qd)
  }

  /** The complete sheared all-pairs sweep over a descriptor frame
    * (doc_id, decoder, p, t, nrm): q117's join shape + exact verify —
    * shared by the inline arm (fresh decode) and the saved-index arm's
    * concentrated-corpus degradation (loaded descriptors, no decode).
    * Descriptors are CARRIED through the one grid join; a slim-pairs +
    * re-join formulation was measured 5× slower here (the re-join
    * shuffles the pair volume twice). */
  private def gridVerifiedPairs(qd: DataFrame): DataFrame = {
    val s = qd.sparkSession
    import s.implicits._
    Similarity.gridPairs(qd.withColumnRenamed("doc_id", "vec_id"),
        Seq("decoder"), Seq("p", "t", "nrm"))
      .withColumn("cosine", pairCosine)
      .filter($"cosine" >= PerceptualDupThreshold)
      .select($"decoder", least($"ia", $"jb").as("i"),
        greatest($"ia", $"jb").as("j"), $"cosine")
  }

  /** q117 (VERDICT r9 #2): PERCEPTUAL multimodal near-dup — the real
    * decode descriptors ([[decodeFeatures]]: pixel/sample statistics for
    * image/audio/video, the byte-histogram stub otherwise) routed
    * through the q45 grid-blocked cosine. Where q55 (the exact arm)
    * hashes payload BYTES — and so misses every re-encoded, resized or
    * metadata-touched duplicate — q117 compares what the payloads
    * DECODE to: a re-encoded image with identical pixels flags at
    * cosine ≈ 1.0 while its md5 differs (FunctionsSpec plants exactly
    * that). Pairs are emitted only within one decoder family
    * (descriptors from different decoders are not comparable), with
    * keep-one accounting: i < j, j is the removed side, and
    * `first_removal` marks the first pair that removes j — summing it
    * yields n_removed without a second query.
    *
    * Scale shape: decode is the per-partition mapPartitions batch (one
    * decoder init per partition); descriptors are ≤ 256 longs/row — the
    * grid join shuffles O(n·G) descriptor rows, never payloads; cells
    * are bounded; no broadcast limit, no BNLJ (the q45 audit). */
  def q117PerceptualDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val pairs = perceptualPairsOf(assets(s, dir))
    val w = Window.partitionBy($"decoder", $"j").orderBy($"i")
    pairs
      .withColumn("first_removal", row_number().over(w) === 1)
      .select($"decoder", $"i", $"j", $"cosine", $"first_removal")
      .orderBy($"decoder", $"i", $"j")
  }

  // ------------------------------------- perceptual descriptor index
  /** Value-grid multiprobe blocking over NORMALIZED descriptor
    * components — the saved-index path for asset near-dup at corpus
    * scale (VERDICT r11 #5). The PQ machinery is 64-dim-embedding
    * geometry; descriptors are 8-float (real decoders) / 256-bin (stub)
    * per family, and the near-dup threshold is extreme (cos ≥ 0.999),
    * which gives a STRONGER tool than an approximate index: a provable
    * candidate guarantee.
    *
    * Guarantee: cos(a, b) ≥ τ ⇒ ‖â − b̂‖₂ = √(2(1−τ)) ≤ 0.0448 at
    * τ = 0.999, so every blocking component differs by < w/2 = 0.0625.
    * Each row emits, per offset combo o ∈ {0, w/2}^k over k =
    * [[PerceptualGridDims]] components, the key (⌊(y_d + o_d)/w⌋)_d —
    * the two shifted grids' boundaries interleave every w/2, so an
    * interval shorter than w/2 avoids the boundaries of one grid per
    * dim: every qualifying pair shares at least one combo's key.
    * Candidates ⊇ true pairs BY CONSTRUCTION (not measured recall);
    * survivors are exact-verified with the q117 arithmetic, so the
    * index sweep returns exactly the inline q117 pairs (spec-pinned).
    *
    * Blocking components are the [[PerceptualGridDims]] highest-variance
    * normalized dimensions per decoder family, fitted at save time from
    * exact integer sums (order-independent ⇒ the index is bit-stable
    * under any partitioning) and persisted with the index. Fan-out is
    * 2^k keys/row; a fat value-cell (mass concentrated in one bucket —
    * a fact of same-generator corpora) is never dropped: its pairs are
    * routed through the sheared [[Similarity.gridPairs]] join so the
    * guarantee holds with no quadratic hot partition (see
    * [[candidatePairs]]). */
  val PerceptualGridW = 0.125
  val PerceptualGridDims = 3
  /** Per-(combo, cells) bucket cap — the q36 MaxBandBucket discipline
    * at descriptor granularity. */
  val PerceptualCellCap = 200L

  private def dimOf: Column =
    when(col("decoder") === "stub", lit(DecoderStub.featureDim.toLong))
      .otherwise(lit(DescriptorDim.toLong))

  /** Build + persist the descriptor index for an assets frame: ONE
    * decode pass (the expensive step a saved index amortizes — payload
    * reads + decoder work), descriptors to `$path/desc` (doc_id,
    * decoder, p, t, nrm — the packed exact-integer form, payload-free),
    * blocking meta to `$path/meta` (decoder, dims). */
  def savePerceptualIndex(s: SparkSession, assetsDf: DataFrame,
      indexPath: String): Unit = {
    import s.implicits._
    val qd = quantizedDescriptors(decodeFeatures(s, assetsDf))
      .materialize()
    // variance fit per (decoder, dim) over the SCALED normalized
    // component ys = ⌊10⁴·z_d/‖z‖ + ½⌋: per-row IEEE on exact inputs,
    // then exact integer sums — deterministic under any partitioning.
    // Scale 10⁴ (not 10⁶ — review finding r12): |ys| ≤ 10⁴ keeps
    // Σys² < 2⁶³ out to ~9·10¹⁰ descriptor rows per family (an ANSI
    // overflow would abort the whole build at ~10⁷ rows under 10⁶),
    // and 4 digits of y is ample resolution for RANKING variances
    val fit = qd.filter($"nrm" > 0.0)
      .select($"decoder", dimOf.as("dimn"), $"t", $"nrm",
        posexplode($"cl").as(Seq("d", "c")))
      .withColumn("z", when($"decoder" === "stub",
        $"dimn" * $"c" - $"t").otherwise($"c"))
      .withColumn("ys",
        floor($"z".cast("double") / $"nrm" * 10000.0 + 0.5).cast("long"))
      .groupBy($"decoder", $"d")
      .agg(count(lit(1)).as("n"), sum($"ys").as("sy"),
        sum($"ys" * $"ys").as("sy2"))
      // v in double FROM the exact sums (deterministic); ranked per
      // family, ties to the lowest dim
      .withColumn("v", $"sy2".cast("double") / $"n" -
        ($"sy".cast("double") / $"n") * ($"sy".cast("double") / $"n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"decoder").orderBy($"v".desc, $"d".asc)
    fit.withColumn("rk", row_number().over(w))
      .filter($"rk" <= PerceptualGridDims)
      .groupBy($"decoder")
      .agg(sort_array(collect_list(struct($"rk", $"d"))).as("s"))
      .select($"decoder", expr("transform(s, x -> x.d)").as("dims"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$indexPath/meta")
    val desc = qd.select($"doc_id", $"decoder", $"p", $"t", $"nrm")
    desc.write.mode("overwrite").parquet(s"$indexPath/desc")
    // the blocking keys are a pure function of desc + meta: persist them
    // ONCE (review finding r12) so serving never re-pays the index-sized
    // explode per query batch — probes equi-join $path/keys directly
    blockKeys(desc, loadPerceptualMeta(s, indexPath))
      .select($"decoder" +: $"combo" +:
        ((0 until PerceptualGridDims).map(i => col(s"k$i")) :+ $"doc_id"): _*)
      .write.mode("overwrite").parquet(s"$indexPath/keys")
  }

  /** decoder → blocking dims, driver-sized. */
  def loadPerceptualMeta(s: SparkSession,
      indexPath: String): Map[String, Seq[Int]] =
    s.read.parquet(s"$indexPath/meta").collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1).toSeq).toMap

  /** Unpack component `d` (0-based) of the packed descriptor column
    * `p` — two counts per long, hi first (the Pack32 layout). */
  private def clComp(d: Int): Column =
    if (d % 2 == 0)
      expr(s"shiftrightunsigned(element_at(p, ${d / 2 + 1}), 32)")
    else expr(s"element_at(p, ${d / 2 + 1}) & 4294967295")

  /** Explode a descriptor frame to its 2^k multiprobe keys:
    * (decoder, combo, k0..k(k−1)) + the carried descriptor columns.
    * Zero-norm rows (failed decode → zero vector) emit nothing — their
    * cosine is 0 by convention, below every threshold. */
  private[graft] def blockKeys(desc: DataFrame,
      meta: Map[String, Seq[Int]]): DataFrame = {
    val k = PerceptualGridDims
    val wCell = PerceptualGridW
    if (meta.isEmpty) // empty corpus at save time: nothing to key
      return desc.filter(lit(false))
        .select(Seq(col("decoder"), lit(0).as("combo")) ++
          (0 until k).map(i => lit(0).as(s"k$i")) ++
          Seq(col("doc_id"), col("p"), col("t"), col("nrm")): _*)
    // deterministic family order (Map iteration order is not)
    val fams = meta.toSeq.sortBy(_._1)
    val combos = (0 until (1 << k)).map { cb =>
      val cells = (0 until k).map { i =>
        val dimsByFam = fams.map { case (fam, dims) =>
          (fam, dims.lift(i).getOrElse(0)) }
        // per-family blocking dim i: a CASE over the (few) families
        val comp = dimsByFam.tail.foldLeft(
            when(col("decoder") === dimsByFam.head._1,
              clComp(dimsByFam.head._2))) { case (acc, (fam, d)) =>
          acc.when(col("decoder") === fam, clComp(d))
        }.otherwise(lit(0L))
        val z = when(col("decoder") === "stub",
          dimOf * comp - col("t")).otherwise(comp)
        val off = if ((cb & (1 << i)) == 0) 0.0 else wCell / 2.0
        floor((z.cast("double") / col("nrm") + off) / wCell)
          .cast("int").as(s"k$i")
      }
      struct(lit(cb).as("combo") +: cells: _*)
    }
    desc.filter(col("nrm") > 0.0)
      .withColumn("x", explode(array(combos: _*)))
      .select(Seq(col("decoder"), col("x.combo").as("combo")) ++
        (0 until k).map(i => col(s"x.k$i").as(s"k$i")) ++
        Seq(col("doc_id"), col("p"), col("t"), col("nrm")): _*)
  }

  /** Slim (decoder, i, j) candidate pairs of a keyed frame, or None
    * when blocking cannot pay. The cells under [[PerceptualCellCap]]
    * self-join directly (the common case: small buckets, one narrow
    * exchange); cells OVER the cap are routed through
    * [[Similarity.gridPairs]] WITH the cell as the group key — still
    * every within-cell pair (the superset guarantee stays
    * unconditional, nothing is dropped; a cap that DROPPED fat cells
    * was measured at 0.67 recall at sf0.1), but an m-row cell shears
    * into G² balanced tasks instead of one quadratic hot partition.
    *
    * None (degrade) when over-cap cells hold most key rows: on a
    * concentrated same-generator corpus the bucket join generates
    * nearly every pair 2^k times over — costlier than the complete
    * grid it was meant to avoid. The caller then runs
    * [[gridVerifiedPairs]] over the saved descriptors: the index's
    * unconditional win (decode amortization) is kept, the blocking's
    * conditional win is forfeited honestly and loudly. */
  private def candidatePairs(keyed: DataFrame): Option[DataFrame] = {
    val s = keyed.sparkSession
    import s.implicits._
    val k = PerceptualGridDims
    val keyCols = Seq("decoder", "combo") ++ (0 until k).map(i => s"k$i")
    val keyedCk = keyed.materialize() // feeds sizes + both joins
    val sizes = keyedCk.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("bsz"))
      .materialize()
    val fat = sizes.filter($"bsz" > PerceptualCellCap)
      .select(keyCols.map(col): _*)
    val Seq(total, fatMass) = {
      val m = sizes.agg(
        sum($"bsz").as("tot"),
        sum(when($"bsz" > PerceptualCellCap, $"bsz").otherwise(0L)).as("fm"))
        .head()
      Seq(if (m.isNullAt(0)) 0L else m.getLong(0),
        if (m.isNullAt(1)) 0L else m.getLong(1))
    }
    if (total > 0 && fatMass * 2 > total) {
      System.err.println(
        s"[graft] perceptual index: $fatMass/$total key rows in over-cap " +
          "value-cells — concentrated corpus, degrading to the complete " +
          "sheared grid (decode stays amortized)")
      return None
    }
    val nFat = fat.count()
    if (nFat > 0) System.err.println(
      s"[graft] perceptual index: $nFat value-cells over " +
        s"$PerceptualCellCap rows routed through the sheared grid join")
    val ok = keyedCk.join(fat, keyCols, "left_anti")
    val a = ok.withColumnRenamed("doc_id", "i")
    val b = ok.withColumnRenamed("doc_id", "j")
    val okPairs = a.join(b, keyCols).filter($"i" < $"j")
      .select($"decoder", $"i", $"j")
    val fatRows = keyedCk.join(fat, keyCols, "left_semi")
      .withColumnRenamed("doc_id", "vec_id")
    val fatPairs = Similarity.gridPairs(fatRows, keyCols, Nil)
      .select($"decoder", least($"ia", $"jb").as("i"),
        greatest($"ia", $"jb").as("j"))
    Some(okPairs.union(fatPairs).distinct()) // pairs collide ≤ 2^k times
  }

  /** Exact q117 pair cosine from carried packed-descriptor columns
    * (suffix `a`/`b`) — ONE definition shared by the inline grid scan
    * and both index paths. */
  private def pairCosine: Column = {
    val dim = DecoderStub.featureDim.toLong
    val pdot = graft.functions.DotPacked32(col("p_a"), col("p_b"))
    val dotz = when(col("decoder") === "stub",
        lit(dim * dim) * pdot - lit(dim) * col("t_a") * col("t_b"))
      .otherwise(pdot)
    Similarity.safeCos(dotz, col("nrm_a") * col("nrm_b"))
  }

  /** Exact-verify a slim (decoder, i, j) candidate frame: re-join the
    * descriptor columns from `descA`/`descB` (doc-keyed, narrow joins)
    * and keep pairs at ≥ [[PerceptualDupThreshold]]. Candidates arrive
    * WITHOUT carried descriptors on purpose — a pair colliding in up to
    * 2^k combos would otherwise push its ~2 KB packed vectors through
    * the dedup shuffle once per collision; slim pairs dedup at 24
    * bytes/row, then fetch each side's descriptor exactly once. */
  private def verifyPairs(cands: DataFrame, descA: DataFrame,
      descB: DataFrame): DataFrame = {
    val s = cands.sparkSession
    import s.implicits._
    cands
      .join(descA.select($"decoder", $"doc_id".as("i"), $"p".as("p_a"),
        $"t".as("t_a"), $"nrm".as("nrm_a")), Seq("decoder", "i"))
      .join(descB.select($"decoder", $"doc_id".as("j"), $"p".as("p_b"),
        $"t".as("t_b"), $"nrm".as("nrm_b")), Seq("decoder", "j"))
      .withColumn("cosine", pairCosine)
      .filter($"cosine" >= PerceptualDupThreshold)
      .select($"decoder", $"i", $"j", $"cosine")
  }

  /** The corpus near-dup sweep FROM the saved index — q117 without
    * payloads or decoding: candidates from the multiprobe value-grid
    * (superset of all ≥-threshold pairs by the blocking guarantee),
    * exact-verified with the shared arithmetic. Output rows equal the
    * inline [[q117PerceptualDedup]]'s pairs exactly (spec-pinned). */
  def perceptualPairsFromIndex(s: SparkSession,
      indexPath: String): DataFrame = {
    import s.implicits._
    // the desc/keys parquet is BYTE-small (packed descriptors) but
    // ROW-heavy work: one 10 MB split would make the pair join a single
    // streamed task under a BroadcastHashJoin (measured 7× the inline
    // grid's wall clock) — spread across the session's parallelism
    val desc = s.read.parquet(s"$indexPath/desc")
      .repartition(s.sparkContext.defaultParallelism)
    val keyed = s.read.parquet(s"$indexPath/keys")
      .repartition(s.sparkContext.defaultParallelism)
    candidatePairs(keyed) match {
      case Some(cands) => verifyPairs(cands, desc, desc)
      case None => gridVerifiedPairs(desc)
    }
  }

  /** SERVE asset near-dup candidates for an incoming batch against the
    * saved index: decode the BATCH only, key it with the saved blocking
    * meta, probe the PERSISTED index keys by equi-join, exact-verify.
    * Batch-sized work against a corpus-sized index — the index-side
    * explode was paid once at save time. Output: (decoder, qid [batch],
    * nid [index], cosine) for verified near-dups. Batch and index id
    * spaces are independent: a batch doc whose id equals an index doc's
    * id is matched like any other (re-serving an indexed asset reports
    * its own indexed copy at cosine 1 — the honest answer to "is this
    * asset already in the corpus?"). */
  def servePerceptualMatches(s: SparkSession, indexPath: String,
      batchAssets: DataFrame): DataFrame = {
    import s.implicits._
    val meta = loadPerceptualMeta(s, indexPath)
    val keyCols = Seq("decoder", "combo") ++
      (0 until PerceptualGridDims).map(i => s"k$i")
    val batchDesc = quantizedDescriptors(decodeFeatures(s, batchAssets))
      .select($"doc_id", $"decoder", $"p", $"t", $"nrm")
      .materialize() // decode once: keys AND verification read it
    val desc = s.read.parquet(s"$indexPath/desc")
      .repartition(s.sparkContext.defaultParallelism) // see pairs path
    val batchKeys = blockKeys(batchDesc, meta)
      .select(keyCols.map(col) :+ $"doc_id".as("i"): _*)
    // no repartition here (unlike the pairs path): the serve join's
    // output is candidate-sized, not corpus-pair-sized — the slim keys
    // scan needs no task fan-out, and an exchange would only add cost
    val idxKeys = s.read.parquet(s"$indexPath/keys")
      .withColumnRenamed("doc_id", "j")
    val cands = batchKeys.join(idxKeys, keyCols)
      .select($"decoder", $"i", $"j").distinct()
    verifyPairs(cands, batchDesc, desc)
      .select($"decoder", $"i".as("qid"), $"j".as("nid"), $"cosine")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_frame_sample" -> (q40FrameSample _),
    "q55_frame_dedup" -> (q55FrameDedup _),
    "q117_perceptual_dedup" -> (q117PerceptualDedup _),
    "q139_decoder_audit" -> (q139DecoderAudit _),
  )

  val oracle: Map[String, String] = Map(
    // equal-length unnests in one SELECT are zipped positionally in DuckDB
    "q40_frame_sample" ->
      """SELECT * FROM (
        |  SELECT doc_id, n_bytes, n_frames,
        |    unnest(range(n_frames)) AS frame_idx,
        |    md5(text || ':' || CAST(unnest(range(n_frames)) AS VARCHAR)) AS frame_hash
        |  FROM (SELECT doc_id, text,
        |          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |          least(greatest(CAST(octet_length(encode(text)) AS BIGINT) // 100, 1), 8) AS n_frames
        |        FROM documents WHERE doc_id < 50) a) b
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q55_frame_dedup" ->
      """WITH f AS (
        |  SELECT doc_id, n_frames,
        |    md5(text || ':' || CAST(unnest(range(n_frames)) AS VARCHAR)) AS frame_hash
        |  FROM (SELECT doc_id, text,
        |          least(greatest(CAST(octet_length(encode(text)) AS BIGINT) // 100, 1), 8) AS n_frames
        |        FROM documents) a)
        |SELECT n_frames,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_assets,
        |  CAST(COUNT(*) AS BIGINT) AS total_frames,
        |  CAST(COUNT(DISTINCT frame_hash) AS BIGINT) AS distinct_frames,
        |  CAST(COUNT(*) - COUNT(DISTINCT frame_hash) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS dup_ratio
        |FROM f GROUP BY n_frames ORDER BY n_frames""".stripMargin,
    // q117 twin: every corpus payload is text bytes → the stub arm; the
    // oracle replays the byte-value histogram from hex(encode(text)),
    // the integer L1 quantization, and the exact-arithmetic cosine. The
    // real-decoder arms (image/wav/video) are FunctionsSpec-planted —
    // no synthetic-corpus row reaches them.
    "q117_perceptual_dedup" ->
      s"""WITH d AS (SELECT doc_id, hex(encode(text)) AS h,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents),
        |u AS (SELECT doc_id, h, unnest(range(n)) AS i FROM d),
        |byt AS (SELECT doc_id,
        |    (strpos('0123456789ABCDEF', substr(h, CAST(2*i+1 AS INT), 1)) - 1) * 16 +
        |    (strpos('0123456789ABCDEF', substr(h, CAST(2*i+2 AS INT), 1)) - 1) AS b
        |  FROM u),
        |hist AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM byt GROUP BY 1, 2),
        |dense AS (SELECT dd.doc_id, g.b, COALESCE(hist.c, CAST(0 AS BIGINT)) AS c
        |  FROM (SELECT DISTINCT doc_id FROM documents) dd
        |  CROSS JOIN (SELECT unnest(range(${DecoderStub.featureDim})) AS b) g
        |  LEFT JOIN hist ON hist.doc_id = dd.doc_id AND hist.b = g.b),
        |tot AS (SELECT doc_id, SUM(c) AS t FROM dense GROUP BY 1),
        |qd AS (SELECT dense.doc_id,
        |    list(CAST(${DecoderStub.featureDim} * c - t AS DOUBLE) ORDER BY b) AS e
        |  FROM dense JOIN tot USING (doc_id) GROUP BY dense.doc_id, t),
        |nq AS (SELECT doc_id, e, sqrt(list_inner_product(e, e)) AS nrm FROM qd),
        |pr AS (SELECT a.doc_id AS i, b.doc_id AS j,
        |    CASE WHEN a.nrm * b.nrm = 0 THEN 0.0
        |         ELSE list_inner_product(a.e, b.e) / (a.nrm * b.nrm) END AS cosine
        |  FROM nq a JOIN nq b ON a.doc_id < b.doc_id)
        |SELECT 'stub' AS decoder, i, j, cosine,
        |  (ROW_NUMBER() OVER (PARTITION BY j ORDER BY i) = 1) AS first_removal
        |FROM pr WHERE cosine >= $PerceptualDupThreshold
        |ORDER BY i, j""".stripMargin,
    // q139 twin: replays the magic sniff (hex-prefix checks, SAME probe
    // order + length guards as dispatch) in SQL. The decode OUTCOME is
    // SQL-replayable only for the opaque family (→ stub by definition);
    // a sniffed family whose decode would fail (corrupt body) can't be
    // re-decoded by DuckDB — on this corpus no payload sniffs as a real
    // family (all text bytes; hash-exactness at three SFs pins that),
    // and the failure-degradation arm is FunctionsSpec-planted.
    "q139_decoder_audit" ->
      """WITH a AS (SELECT doc_id, hex(encode(text)) AS h,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n FROM documents),
        |f AS (SELECT doc_id, n,
        |    CASE
        |      WHEN (n >= 8 AND substr(h, 1, 8) = '89504E47')
        |        OR (n >= 3 AND substr(h, 1, 6) = 'FFD8FF') THEN 'image'
        |      WHEN n >= 12 AND substr(h, 1, 8) = '52494646'
        |        AND substr(h, 17, 8) = '57415645' THEN 'wav'
        |      WHEN (n >= 6 AND substr(h, 1, 8) = '47494638')
        |        OR (n >= 12 AND substr(h, 1, 8) = '52494646'
        |          AND substr(h, 17, 8) = '41564920') THEN 'video'
        |      ELSE 'opaque' END AS family
        |  FROM a),
        |g AS (SELECT family, n,
        |    CASE WHEN family = 'opaque' THEN 'stub' ELSE family END AS decoder
        |  FROM f)
        |SELECT COALESCE(family, 'ALL') AS family,
        |  CAST(COUNT(*) AS BIGINT) AS n_assets,
        |  CAST(SUM(CASE WHEN decoder = 'stub' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_stub,
        |  CAST(SUM(n) AS BIGINT) AS n_bytes,
        |  (1000 * CAST(SUM(CASE WHEN decoder = 'stub' THEN 1 ELSE 0 END) AS BIGINT))
        |    // CAST(COUNT(*) AS BIGINT) AS stub_permille
        |FROM g GROUP BY ROLLUP (family) ORDER BY 1""".stripMargin,
  )

  // ------------------------------------------------------------ decode
  /** Real image decode: PNG/JPEG bytes → pixels (javax.imageio) → a
    * deterministic [[DescriptorDim]]-float descriptor:
    * [mean R, mean G, mean B, mean luminance, 2×2 luminance grid], all
    * normalized to [0, 1]. Integer pixel sums (getRGB is exact for the
    * lossless formats) divided once at the end, so the vector is
    * bit-stable across runs and partitionings. Luminance uses the
    * BT.601 integer weights (299/587/114 per mille). */
  object ImageDecoder {
    def isPng(p: Array[Byte]): Boolean =
      p.length >= 8 && p(0) == 0x89.toByte && p(1) == 'P'.toByte &&
        p(2) == 'N'.toByte && p(3) == 'G'.toByte
    def isJpeg(p: Array[Byte]): Boolean =
      p.length >= 3 && p(0) == 0xff.toByte && p(1) == 0xd8.toByte &&
        p(2) == 0xff.toByte
    def isImage(p: Array[Byte]): Boolean = isPng(p) || isJpeg(p)

    def decodeOne(payload: Array[Byte]): Array[Float] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null,
        "payload carries an image signature but no installed reader decodes it")
      val (w, h) = (img.getWidth, img.getHeight)
      var (rs, gs, bs) = (0L, 0L, 0L)
      val lumSum = new Array[Long](4) // quadrant index qy*2 + qx
      val lumCnt = new Array[Long](4)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          rs += r; gs += g; bs += b
          val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
          lumSum(q) += 299L * r + 587L * g + 114L * b
          lumCnt(q) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val out = new Array[Float](DescriptorDim)
      out(0) = (rs / (n * 255.0)).toFloat
      out(1) = (gs / (n * 255.0)).toFloat
      out(2) = (bs / (n * 255.0)).toFloat
      out(3) = (lumSum.sum / (n * 255000.0)).toFloat
      var q = 0
      while (q < 4) {
        out(4 + q) = if (lumCnt(q) == 0) 0.0f
          else (lumSum(q) / (lumCnt(q) * 255000.0)).toFloat
        q += 1
      }
      out
    }
  }

  /** Real audio decode: RIFF/WAVE PCM bytes → samples
    * (javax.sound.sampled — in the JDK, no external dependency) → a
    * deterministic [[DescriptorDim]]-float descriptor:
    * [mean |amplitude|, RMS, zero-crossing rate, peak, 4 quarter-segment
    * mean |amplitude|s], all normalized to [0, 1]. Integer sample sums
    * (|s|, s², crossings) divided once at the end — like ImageDecoder,
    * bit-stable across runs and partitionings (sums stay < 2⁶³: s² ≤
    * 2³⁰ per 16-bit sample). Zero crossings are counted per channel
    * (interleaved neighbors belong to different channels). */
  object WavDecoder {
    def isWav(p: Array[Byte]): Boolean =
      p.length >= 12 && p(0) == 'R'.toByte && p(1) == 'I'.toByte &&
        p(2) == 'F'.toByte && p(3) == 'F'.toByte && p(8) == 'W'.toByte &&
        p(9) == 'A'.toByte && p(10) == 'V'.toByte && p(11) == 'E'.toByte

    def decodeOne(payload: Array[Byte]): Array[Float] = {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        val unsigned8 =
          fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED && bits == 8
        require(unsigned8 ||
          (fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
            (bits == 16 || bits == 8)),
          s"unsupported WAV encoding ${fmt.getEncoding}/$bits-bit " +
            "(PCM 8/16-bit only)")
        val bytes = in.readAllBytes()
        val ch = fmt.getChannels
        val n = bytes.length / (bits / 8)
        val nFrames = n / ch
        require(nFrames > 0, "empty WAV payload")
        val maxAmp = if (bits == 16) 32768.0 else 128.0
        def sample(i: Int): Int =
          if (bits == 16) {
            val o = i * 2
            if (fmt.isBigEndian) (bytes(o).toInt << 8) | (bytes(o + 1) & 0xff)
            else (bytes(o + 1).toInt << 8) | (bytes(o) & 0xff)
          } else if (unsigned8) (bytes(i) & 0xff) - 128
          else bytes(i).toInt
        var absSum = 0L; var sqSum = 0L; var peak = 0L; var crossings = 0L
        val segSum = new Array[Long](4)
        val segCnt = new Array[Long](4)
        var i = 0
        while (i < n) {
          val s = sample(i)
          val a = math.abs(s.toLong)
          absSum += a; sqSum += s.toLong * s
          if (a > peak) peak = a
          val frame = i / ch
          val seg = math.min(frame * 4L / nFrames, 3L).toInt
          segSum(seg) += a; segCnt(seg) += 1
          // previous sample of the SAME channel is ch positions back
          if (frame > 0 && ((sample(i - ch) >= 0) != (s >= 0))) crossings += 1
          i += 1
        }
        val out = new Array[Float](DescriptorDim)
        out(0) = (absSum / (n * maxAmp)).toFloat
        out(1) = (math.sqrt(sqSum.toDouble / n) / maxAmp).toFloat
        val crossDen = (nFrames - 1).toLong * ch
        out(2) = if (crossDen == 0) 0f else (crossings.toDouble / crossDen).toFloat
        out(3) = (peak / maxAmp).toFloat
        var q = 0
        while (q < 4) {
          out(4 + q) = if (segCnt(q) == 0) 0f
            else (segSum(q) / (segCnt(q) * maxAmp)).toFloat
          q += 1
        }
        out
      } finally in.close()
    }
  }

  /** Real video decode for the two container formats the JDK can fully
    * handle with no external codec: animated GIF (multi-frame via the
    * built-in ImageIO GIF reader) and MJPEG-in-AVI (RIFF chunk walk —
    * pure byte arithmetic — yielding per-frame JPEG payloads that
    * [[ImageDecoder]]-style pixel sums turn into luminance statistics).
    * Descriptor ([[DescriptorDim]] floats, all in [0, 1]):
    * [overall mean luminance, first-frame lum, last-frame lum, motion
    * (mean |Δ frame lum|), 4 temporal-quarter mean luminances]. Per-frame
    * luminance uses the same BT.601 integer weights (299/587/114 per
    * mille) and exact long sums as [[ImageDecoder]]; each mean is one
    * correctly-rounded division, so the vector is bit-stable across
    * runs and partitionings. GIF frames are decoded as stored (patch
    * rasters, no disposal compositing) — deterministic and sufficient
    * for a content descriptor. Codec-compressed containers (H.264 MP4,
    * VP9 WebM, …) have no JDK decoder and fall through to the stub. */
  object VideoDecoder {
    def isGif(p: Array[Byte]): Boolean =
      p.length >= 6 && p(0) == 'G'.toByte && p(1) == 'I'.toByte &&
        p(2) == 'F'.toByte && p(3) == '8'.toByte
    def isAvi(p: Array[Byte]): Boolean =
      p.length >= 12 && p(0) == 'R'.toByte && p(1) == 'I'.toByte &&
        p(2) == 'F'.toByte && p(3) == 'F'.toByte && p(8) == 'A'.toByte &&
        p(9) == 'V'.toByte && p(10) == 'I'.toByte && p(11) == ' '.toByte
    def isVideo(p: Array[Byte]): Boolean = isGif(p) || isAvi(p)

    private def le32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL)) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

    /** Walk the RIFF chunk tree and collect video-stream chunks
      * (`##dc`/`##db`) whose payload starts with a JPEG SOI marker. */
    private[graft] def aviJpegFrames(p: Array[Byte]): Seq[Array[Byte]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      def walk(start: Int, end: Int): Unit = {
        var o = start
        while (o + 8 <= end) {
          // A corrupt 32-bit size can exceed the enclosing region (or,
          // truncated to Int, go negative and stall the walk at a fixed
          // offset — an executor spinning forever on one bad payload).
          // Clamp to the region and insist on strictly forward progress.
          val size = math.min(le32(p, o + 4), (end - (o + 8)).toLong)
          val dataStart = o + 8
          val dataEnd = dataStart + size.toInt
          val isList = (p(o) == 'R'.toByte && p(o + 1) == 'I'.toByte &&
            p(o + 2) == 'F'.toByte && p(o + 3) == 'F'.toByte) ||
            (p(o) == 'L'.toByte && p(o + 1) == 'I'.toByte &&
              p(o + 2) == 'S'.toByte && p(o + 3) == 'T'.toByte)
          if (isList) {
            if (dataStart + 4 <= dataEnd) walk(dataStart + 4, dataEnd)
          } else if (p(o + 2) == 'd'.toByte &&
              (p(o + 3) == 'c'.toByte || p(o + 3) == 'b'.toByte) &&
              dataEnd - dataStart >= 3 &&
              p(dataStart) == 0xff.toByte && p(dataStart + 1) == 0xd8.toByte) {
            out += java.util.Arrays.copyOfRange(p, dataStart, dataEnd)
          }
          val next = dataStart + (size + (size & 1L)).toInt // even-padded
          if (next <= o) return // malformed size: stop, keep frames so far
          o = next
        }
      }
      walk(12, p.length)
      out.toSeq
    }

    private def gifFrames(p: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
      val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
      require(readers.hasNext, "no GIF reader installed")
      val reader = readers.next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(p))
      try {
        reader.setInput(iis, false, true)
        val n = reader.getNumImages(true)
        (0 until n).map(reader.read)
      } finally { reader.dispose(); iis.close() }
    }

    /** (BT.601 per-mille luminance sum, pixel count) for one frame. */
    private def lumOf(img: java.awt.image.BufferedImage): (Long, Long) = {
      val (w, h) = (img.getWidth, img.getHeight)
      var lum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          lum += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
            114L * (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      (lum, w.toLong * h)
    }

    def decodeOne(payload: Array[Byte]): Array[Float] = {
      val frames: Seq[java.awt.image.BufferedImage] =
        if (isGif(payload)) gifFrames(payload)
        else aviJpegFrames(payload).map { j =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(j))
          require(img != null, "AVI carries a JPEG frame no installed reader decodes")
          img
        }
      require(frames.nonEmpty, "video payload with no decodable frames")
      val lums = frames.map(lumOf)
      val nF = frames.length
      val means = lums.map { case (s, n) => s / (n * 255000.0) }
      val out = new Array[Float](DescriptorDim)
      out(0) = (lums.map(_._1).sum / (lums.map(_._2).sum * 255000.0)).toFloat
      out(1) = means.head.toFloat
      out(2) = means.last.toFloat
      out(3) = if (nF < 2) 0f
        else (means.sliding(2).map(p => math.abs(p(1) - p(0))).sum / (nF - 1)).toFloat
      val segNum = new Array[Long](4); val segDen = new Array[Long](4)
      lums.zipWithIndex.foreach { case ((s, n), i) =>
        val seg = math.min(i * 4L / nF, 3L).toInt
        segNum(seg) += s; segDen(seg) += n
      }
      var q = 0
      while (q < 4) {
        out(4 + q) = if (segDen(q) == 0) 0f
          else (segNum(q) / (segDen(q) * 255000.0)).toFloat
        q += 1
      }
      out
    }
  }

  /** STUBBED decode for payloads no JDK codec covers (codec-compressed
    * video such as H.264/VP9 — PNG/JPEG, WAV/PCM, GIF and MJPEG-AVI all
    * decode for real above).
    * Produces deterministic fake features so the distributed plumbing
    * (partition-wise batching, schema, memory shape) is fully testable;
    * swap `decodeOne` for a real codec in production, exactly as
    * [[ImageDecoder]] / [[WavDecoder]] / [[VideoDecoder]] do. */
  object DecoderStub {
    /** One bin per byte value. Coarser binnings were measured and
      * rejected: at 8 or 64 bins, unrelated same-generator documents
      * already read centered-cosine ≥ 0.999 (the bins average out the
      * per-document signal), while at 256 bins the background sits at
      * p99 ≈ 0.991 with the content-sharing tail cleanly ≥ 0.999. */
    val featureDim = 256
    /** >>> STUB <<< — replace with a real decoder. A byte-VALUE histogram
      * (one bin per byte value): the opaque-payload analogue of a color
      * histogram — a content profile that survives re-encoding-free
      * edits, feeding the q117 perceptual near-dup arm. Counts are exact
      * integers (< 2²⁴ for payloads under 16 MB, so the Float carries
      * them exactly), which lets the DuckDB oracle replay the descriptor
      * byte for byte — the discipline the real decoders follow with
      * their integer pixel/sample sums. */
    def decodeOne(payload: Array[Byte]): Array[Float] = {
      val counts = new Array[Long](featureDim)
      var i = 0
      while (i < payload.length) {
        counts(payload(i) & 0xff) += 1
        i += 1
      }
      val out = new Array[Float](featureDim)
      i = 0
      while (i < featureDim) { out(i) = counts(i).toFloat; i += 1 }
      out
    }
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("features", ArrayType(FloatType)),
    // which decoder actually produced the features: "image" | "wav" |
    // "video" | "stub". Codec-compressed payloads (H.264/VP9 — no JDK
    // decoder, permanently out of this build's pinned-dependency scope)
    // and per-payload decode failures are marked "stub" so downstream
    // consumers can filter or route them without re-sniffing bytes.
    StructField("decoder", StringType)))

  /** Partition-wise batch decode: one decoder init per partition (the
    * pattern a heavyweight codec needs), constant memory per batch.
    * Dispatches on payload magic: real image decode for PNG/JPEG, the
    * stub for everything else. The magic sniff is far wider than what the
    * real decoders accept (float-PCM WAV, truncated GIF, AVI with no
    * JPEG frames all pass the sniff but fail the decode), so each decode
    * is caught per payload and degraded to the deterministic stub — one
    * bad row must never kill a 100 TB job. The throwing `decodeOne`s stay
    * as-is for unit tests, which assert the exact failure modes. */
  def decodeFeatures(s: SparkSession, assetsDf: DataFrame): DataFrame = {
    val rdd = assetsDf.select("doc_id", "payload").rdd.mapPartitions { it =>
      // per-partition decoder init: never spill ImageIO scratch to an
      // executor temp file — decode stays in-memory per batch
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val (f, d) = dispatch(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), f.toSeq, d)
      }
    }
    s.createDataFrame(rdd, decodedSchema)
  }

  /** THE decode dispatch, shared by [[decodeFeatures]] and
    * [[decodeAudit]]: magic sniff → real decoder, anything unsniffable
    * or failing its decode degrades to the deterministic stub (one bad
    * row must never kill a 100 TB job). */
  private[operators] def dispatch(p: Array[Byte]): (Array[Float], String) =
    try {
      if (ImageDecoder.isImage(p)) (ImageDecoder.decodeOne(p), "image")
      else if (WavDecoder.isWav(p)) (WavDecoder.decodeOne(p), "wav")
      else if (VideoDecoder.isVideo(p)) (VideoDecoder.decodeOne(p), "video")
      else (DecoderStub.decodeOne(p), "stub")
    } catch {
      case scala.util.control.NonFatal(_) => (DecoderStub.decodeOne(p), "stub")
    }

  /** What the payload's magic CLAIMS it is, in [[dispatch]]'s own probe
    * order — "opaque" when no real decoder's sniff matches (text, codec
    * video, anything else). Family ≠ outcome: a sniffed family whose
    * decode fails (corrupt body, unsupported sub-format, H.264 inside a
    * sniffable container) still lands on the stub, and that gap is
    * exactly what [[q139DecoderAudit]] measures. */
  def sniffFamily(p: Array[Byte]): String =
    if (ImageDecoder.isImage(p)) "image"
    else if (WavDecoder.isWav(p)) "wav"
    else if (VideoDecoder.isVideo(p)) "video"
    else "opaque"

  val auditSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("family", StringType),
    StructField("decoder", StringType),
    StructField("n_bytes", LongType)))

  /** Per-asset decode accounting: (sniffed family, actual decoder
    * outcome, payload size). Runs the REAL [[dispatch]] — the outcome
    * column is what [[decodeFeatures]] would mark, not a re-derivation —
    * so a production pipeline piggybacks this on the decode stage for
    * free (the descriptor is computed anyway; here it is dropped). */
  def decodeAudit(s: SparkSession, assetsDf: DataFrame): DataFrame = {
    val rdd = assetsDf.select("doc_id", "payload", "n_bytes").rdd
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          val p = r.getAs[Array[Byte]](1)
          Row(r.getLong(0), sniffFamily(p), dispatch(p)._2, r.getLong(2))
        }
      }
    s.createDataFrame(rdd, auditSchema)
  }

  // --------------------------------------------------------------- q139
  /** Stub-decoder fraction audit (VERDICT r13 #7): per sniffed family —
    * what fraction of a corpus's assets ended up with the stub's opaque
    * byte-histogram descriptor instead of a real decode? Codec video is
    * a permanent, documented stub; this query makes the resulting
    * unusable-descriptor volume OPERATIONAL per corpus, so a mixed-asset
    * ingest can't silently carry stub-graded descriptors into q117 / the
    * perceptual index. One decode pass + one map-side-combined rollup;
    * permille is integer floor-div (exact, oracle-replayable). The "ALL"
    * row is the corpus-level headline a dashboard alerts on. */
  def q139DecoderAudit(s: SparkSession, dir: String): DataFrame =
    decoderAuditOf(s, assets(s, dir))

  /** [[q139DecoderAudit]] over an explicit assets frame (doc_id, payload,
    * n_bytes) — the spec-facing seam for planted mixed corpora. */
  def decoderAuditOf(s: SparkSession, assetsDf: DataFrame): DataFrame = {
    import s.implicits._
    decodeAudit(s, assetsDf)
      .rollup($"family")
      .agg(count(lit(1)).as("n_assets"),
        sum(when($"decoder" === "stub", 1L).otherwise(0L)).as("n_stub"),
        sum($"n_bytes").as("n_bytes"))
      .withColumn("stub_permille", expr("(1000 * n_stub) div n_assets"))
      .select(coalesce($"family", lit("ALL")).as("family"),
        $"n_assets", $"n_stub", $"n_bytes", $"stub_permille")
      .orderBy($"family")
  }
}
