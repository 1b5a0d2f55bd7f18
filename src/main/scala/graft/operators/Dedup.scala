package graft.operators
import graft.util.Mat.Ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Deduplication family over `documents`: exact (hash-groupBy), n-gram
  * Jaccard, MinHash+LSH (shingle→minhash→band→bucket-join), SimHash.
  *
  * Scale design: shingling and minhash signatures are computed **map-side
  * with array higher-order functions** (zero shuffles until the band
  * bucket join); candidate generation shuffles only (band, bucket-key)
  * pairs, never full documents; verification joins shingle sets back by
  * doc id. The md5-based hash family is engine-portable, so even the LSH
  * pipeline is DuckDB-oracle-checked end to end.
  */
object Dedup {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** One row per (doc_id, 3-gram shingle), built with codegen'd
    * expressions only (explode of an index sequence + element_at +
    * concat_ws) — no per-doc array, no interpreted higher-order lambda.
    * `distinct = false` keeps duplicate shingles (harmless under MIN
    * aggregation, saves a shuffle); `true` adds the per-doc dedup the
    * set-semantics consumers (df counts, candidate joins, majority
    * votes) require. */
  def shingleRows(s: SparkSession, dir: String,
      distinct: Boolean): DataFrame =
    shingleRowsOf(docs(s, dir), distinct)

  /** Same, over an explicit `(doc_id, text)` corpus — lets q36 shingle
    * only the exact-dup representatives instead of every copy. `width`
    * selects the n-gram size (3 for the near-dup family, wider for
    * decontamination, where longer exact n-grams are the standard
    * overlap unit). */
  def shingleRowsOf(d: DataFrame, distinct: Boolean,
      width: Int = 3): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    val parts = (1 to width).map(k => s"element_at(toks, i+$k)").mkString(", ")
    val ex = d
      .withColumn("toks", split(lower($"text"), " "))
      .filter(size($"toks") >= width)
      .select($"doc_id", $"toks",
        explode(expr(s"sequence(0, size(toks) - $width)")).as("i"))
      .select($"doc_id", expr(s"concat_ws(' ', $parts)").as("s"))
    if (distinct) ex.distinct() else ex
  }

  // ---------------------------------------------------------------- q34
  /** Exact dedup under re-ingestion: the corpus unioned with a shifted
    * copy of itself collapses back to one row per content hash (keep
    * min doc_id). Hash-groupBy — one shuffle on the 128-bit key. */
  def q34ExactDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // ONE corpus scan: the re-ingested twin differs only in doc_id, so
    // each source row fans out to its two ids via a per-row explode —
    // the text column is decoded (and hashed) once, not once per union
    // branch. Same fix class as q60/q85 (VERDICT r5 #1).
    val all = docs(s, dir).select($"doc_id", $"lang", $"text")
      .withColumn("h", md5($"text".cast("binary")))
      .select($"lang", $"h",
        explode(array($"doc_id", $"doc_id" + 1000000L)).as("doc_id"))
    all.groupBy($"h")
      .agg(min($"doc_id").as("canonical_id"), count(lit(1)).as("n_copies"),
        min($"lang").as("lang"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_unique"), sum($"n_copies").as("n_rows"))
      .orderBy($"lang")
  }

  // ---------------------------------------------------------------- q85
  /** Bag-of-words (order-invariant) dedup: the signature is the hash of
    * the SORTED token multiset, so token-order perturbations — shuffled
    * boilerplate, re-serialized scrapes, list-reordered templates — that
    * byte-exact dedup misses collapse to one key. Demonstrated under
    * re-ingestion like q34: odd doc_ids come back byte-identical (exact
    * dedup catches them), even doc_ids come back token-REVERSED (only
    * the BoW signature catches them). Per-lang accounting shows the
    * hierarchy exact ⊂ bag-of-words. Same scale shape as q34: one
    * map-side signature per doc, one shuffle on the group-by — the
    * array_sort is per-row, codegen'd, never a shuffle key explosion.
    * ONE corpus scan (VERDICT r5 #1): the original and its re-ingested
    * variant are produced by a per-row 2-element explode over the same
    * decoded text value, not by unioning two scans of the parquet —
    * at 100 TB the double decode was the whole cost of this audit. The
    * re-ingested doc_id shift never reaches the output (the group-by is
    * per-lang), so only the text variant fans out. */
  def q85BowDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir).select($"doc_id", $"lang", $"text")
      .select($"lang", explode(array(
        $"text",
        when($"doc_id" % 2 === 0,
          concat_ws(" ", reverse(split($"text", " ")))).otherwise($"text")
      )).as("text"))
      .withColumn("h", md5($"text".cast("binary")))
      .withColumn("bow_sig",
        md5(concat_ws(" ", array_sort(split($"text", " "))).cast("binary")))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct($"h").as("n_exact_unique"),
        countDistinct($"bow_sig").as("n_bow_unique"))
      .withColumn("bow_only_catch", $"n_exact_unique" - $"n_bow_unique")
      .orderBy($"lang")
  }

  // ---------------------------------------------------------------- q35
  /** Max document frequency for a shingle to participate in the q35
    * pair join. A shingle shared by more than this many documents
    * contributes df² join rows on one shuffle key (the classic
    * "of the and" hot key) — the cap bounds every key's fan-out at
    * df ≤ 50 regardless of corpus size, which is what makes the join
    * viable at 100 TB. `shared` is counted within the capped shingle
    * sub-space: a conservative lower bound on the true intersection
    * whenever true stopword shingles exist (a pair is under-counted
    * only for overlap that is corpus-wide boilerplate — standard
    * prefix-filtering practice), and exactly the full Jaccard on both
    * test corpora, where no shingle reaches the cap (measured max df:
    * 25 at sf0.1). The DuckDB oracle computes the identical capped
    * formula, so the check stays hash-exact either way. */
  val MaxShingleDf = 50L

  /** Exact Jaccard verification of candidate (i,j) pairs, computed
    * entirely from exploded distinct-shingle rows: `shared` = |A∩B| is a
    * count over an equi-join on (pair, shingle); |A| and |B| are per-doc
    * counts. Pure codegen'd joins + partial aggregates — no per-doc
    * arrays, no set-intersection evaluation. A candidate pair sharing no
    * shingle drops out of the inner join, identical to its Jaccard-0
    * rejection. */
  private def verifyJaccard(eD: DataFrame, cand: DataFrame): DataFrame = {
    val s = eD.sparkSession
    import s.implicits._
    val nDoc = eD.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    cand
      .join(eD.select($"doc_id".as("i"), $"s"), "i")
      .join(eD.select($"doc_id".as("j"), $"s"), Seq("j", "s"))
      .groupBy($"i", $"j").agg(count(lit(1)).as("shared"))
      .join(nDoc.select($"doc_id".as("i"), $"n".as("na")), "i")
      .join(nDoc.select($"doc_id".as("j"), $"n".as("nb")), "j")
      // na+nb-shared ≥ max(na,nb) > 0 for distinct docs; it reaches 0
      // only when a doc_id appears on BOTH sides of eD (an id re-sent
      // against state that already holds it — the door's re-send case).
      // ANSI division would abort the whole job on that one row; clamp
      // to 1 (the degenerate pair is identical ⇒ jaccard ≥ threshold
      // either way) — one bad row must never kill a 100 TB job.
      .withColumn("jaccard",
        $"shared".cast("double") /
          greatest(lit(1L), $"na" + $"nb" - $"shared"))
      .filter($"jaccard" >= 0.5)
      .select($"i", $"j", $"shared", $"na", $"nb", $"jaccard")
  }

  /** n-gram Jaccard near-dup pairs (threshold 0.5) via the standard
    * shared-shingle join over df-capped shingles: one equi-join on the
    * shingle, `shared` counted directly in the following groupBy — the
    * minimal-shuffle shape for a primitive whose candidate mass is
    * intrinsic to the corpus (here 5000 docs share a 27k-shingle
    * vocabulary → ~1.1M sharing pairs at sf0.1; anything that touches
    * candidates again multiplies that).
    *
    * Output column is named `jaccard_lb` (ADVICE r2): `shared` is counted
    * in the df≤cap shingle sub-space while na/nb are full distinct counts,
    * so the value is a LOWER BOUND on the true Jaccard — tight whenever no
    * shared shingle is corpus-wide boilerplate (exactly equal on both test
    * corpora, max df 25), and conservative (never over-reports) beyond.
    * The ≥0.5 filter therefore under-selects, never over-selects; q36
    * keeps the exact uncapped `jaccard` on its (bucket-capped) candidates. */
  def q35NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // same scan barrier as q89: `e` feeds nDoc, the df cap and both join
    // sides — checkpointed once so the text decode + shingle explode +
    // distinct never re-plan per consumer
    val e = shingleRows(s, dir, distinct = true).materialize()
    val nDoc = e.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val rare = e.groupBy($"s")
      .agg(count(lit(1)).as("df"))
      .filter($"df" <= MaxShingleDf)
      .select($"s")
    val eRare = e.join(rare, "s")
    eRare.as("a").join(eRare.as("b"),
        $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("i"), $"b.doc_id".as("j"))
      .agg(count(lit(1)).as("shared"))
      .join(nDoc.select($"doc_id".as("i"), $"n".as("na")), "i")
      .join(nDoc.select($"doc_id".as("j"), $"n".as("nb")), "j")
      .withColumn("jaccard_lb",
        $"shared".cast("double") / ($"na" + $"nb" - $"shared"))
      .filter($"jaccard_lb" >= 0.5)
      .select($"i", $"j", $"shared", $"na", $"nb", $"jaccard_lb")
      .orderBy($"i", $"j")
  }

  // ---------------------------------------------------------------- q89
  /** ASYMMETRIC near-dup detection: containment = |A∩B| / min(|A|, |B|).
    * A short document quoted verbatim inside a much longer one scores
    * Jaccard |A|/|B| ≪ 0.5 — q35 never sees it — but containment 1.0:
    * the quote-expansion / wrapper-page dup class every crawl corpus
    * carries. Same df-capped shared-shingle join as q35 (same 100 TB
    * viability argument, `shared` is the same capped-sub-space lower
    * bound), one extra column pair naming which side is the contained
    * doc. min(|A|,|B|) ≥ 1 whenever a pair exists, so the division
    * cannot hit ANSI 0/0. */
  def q89Containment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // localCheckpoint = the scan barrier (decontamOf's pattern): `e` feeds
    // nDoc, the df filter AND both join sides; without it each consumer
    // re-plans the text decode + shingle explode + distinct, multiplying
    // the corpus scan. Checkpointed once, every consumer reads the
    // materialized shingle rows.
    val e = shingleRows(s, dir, distinct = true).materialize()
    val nDoc = e.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val rare = e.groupBy($"s")
      .agg(count(lit(1)).as("df"))
      .filter($"df" <= MaxShingleDf)
      .select($"s")
    val eRare = e.join(rare, "s")
    eRare.as("a").join(eRare.as("b"),
        $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("i"), $"b.doc_id".as("j"))
      .agg(count(lit(1)).as("shared"))
      .join(nDoc.select($"doc_id".as("i"), $"n".as("na")), "i")
      .join(nDoc.select($"doc_id".as("j"), $"n".as("nb")), "j")
      .withColumn("containment_lb",
        $"shared".cast("double") / least($"na", $"nb").cast("double"))
      .filter($"containment_lb" >= 0.9)
      .withColumn("contained", when($"na" <= $"nb", $"i").otherwise($"j"))
      .withColumn("container", when($"na" <= $"nb", $"j").otherwise($"i"))
      .select($"i", $"j", $"shared", $"na", $"nb", $"containment_lb",
        $"contained", $"container")
      .orderBy($"i", $"j")
  }

  // --------------------------------------------------------------- q121
  /** Winnowing gram width / window (Schleimer–Wilkerson–Aiken, SIGMOD'03
    * — the MOSS fingerprinting algorithm). With K = 5 and W = 4 the
    * winnowing guarantee threshold is t = W + K - 1 = 8: any run of ≥ 8
    * identical consecutive tokens shared by two documents puts at least
    * one COMMON fingerprint in both sets, while the expected selected
    * density is only 2/(W+1) ≈ 40% of the grams — the pair join moves a
    * fraction of the rows the exact-gram join (q89) moves for the same
    * long-run detection job, and the fraction improves as W grows. */
  val WinnowK = 5
  val WinnowW = 4

  /** Minimum shared fingerprints for a reported pair: a single shared
    * fingerprint is one ≥8-token run (or one unlucky rare gram); two
    * selected fingerprints is the smallest evidence of REPEATED overlap
    * worth a row in the pair report. */
  val WinnowMinShared = 2L

  /** q121: winnowing-fingerprint near-dup pairs — the MOSS selection rule
    * as a corpus-scale operator. Each document keeps, for every window of
    * [[WinnowW]] consecutive [[WinnowK]]-gram hashes, the window's MINIMUM
    * hash; the distinct kept hashes are its fingerprint set (robust
    * winnowing's position tie-break is irrelevant at set granularity —
    * equal-min windows contribute the same VALUE). Pairs sharing ≥
    * [[WinnowMinShared]] fingerprints are reported with a fingerprint-set
    * similarity permille. The q35/q89 gram joins detect the same overlap
    * at full gram density; this is the published SELECTION that keeps the
    * guarantee (every shared run ≥ 8 tokens is caught) while shrinking
    * the joined row count ~2.5× — the knob a 100 TB near-dup sweep turns
    * first (raise W → smaller index, weaker short-run sensitivity).
    *
    * Scale shape: ONE corpus scan explodes gram hashes (codegen
    * element_at/concat_ws — no array HOFs); each gram row fans out
    * map-side to the ≤ W windows covering it, and the (doc_id, window)
    * min is a partial aggregate — a document's rows sit in the SAME input
    * partition, so the W-fold fan-out collapses back to one 16-byte row
    * per window BEFORE the exchange. Fingerprint distinct, df-cap, and
    * the pair join then follow q89's discipline exactly (the cap bounds
    * any bucket's pair mass; `shared` is a capped-sub-space lower bound,
    * exact on both test corpora). */
  def q121Winnowing(s: SparkSession, dir: String): DataFrame =
    winnowingPairsOf(docs(s, dir))

  /** One row per (doc_id, distinct winnowing fingerprint). Documents
    * shorter than [[WinnowK]] tokens have no grams and no fingerprints;
    * documents with fewer than [[WinnowW]] grams winnow to ONE window
    * covering all their grams (the short-doc convention both engines
    * replay). */
  private[graft] def fingerprintRowsOf(d: DataFrame): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    val parts = (1 to WinnowK).map(k => s"element_at(toks, i+$k)").mkString(", ")
    d.withColumn("toks", split(lower($"text"), " "))
      .filter(size($"toks") >= WinnowK)
      .select($"doc_id", $"toks",
        (size($"toks") - (WinnowK - 1)).as("ng"),
        explode(expr(s"sequence(0, size(toks) - $WinnowK)")).as("i"))
      .select($"doc_id", $"ng", $"i",
        md5(expr(s"concat_ws(' ', $parts)").cast("binary")).as("h"))
      // gram i belongs to windows max(0, i-W+1) .. min(i, nWindows-1),
      // nWindows = max(ng-W+1, 1) — degenerate short docs land on window 0
      .select($"doc_id", $"h",
        explode(expr(s"sequence(greatest(0, i - ${WinnowW - 1}), " +
          s"least(i, greatest(ng - $WinnowW, 0)))")).as("win"))
      .groupBy($"doc_id", $"win")
      .agg(min($"h").as("fp"))
      .select($"doc_id", $"fp")
      .distinct()
  }

  private[graft] def winnowingPairsOf(d: DataFrame): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    // the q89 scan barrier: `f` feeds the per-doc counts, the df cap and
    // both pair-join sides — materialized once
    val f = fingerprintRowsOf(d.select($"doc_id", $"text")).materialize()
    val nDoc = f.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val rare = f.groupBy($"fp")
      .agg(count(lit(1)).as("df"))
      .filter($"df" <= MaxShingleDf)
      .select($"fp")
    val fRare = f.join(rare, "fp")
    fRare.as("a").join(fRare.as("b"),
        $"a.fp" === $"b.fp" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("i"), $"b.doc_id".as("j"))
      .agg(count(lit(1)).as("shared"))
      .filter($"shared" >= WinnowMinShared)
      .join(nDoc.select($"doc_id".as("i"), $"n".as("na")), "i")
      .join(nDoc.select($"doc_id".as("j"), $"n".as("nb")), "j")
      // exact integer permille of the fingerprint-set Jaccard lower
      // bound; na+nb-shared ≥ shared ≥ 2 > 0, no ANSI 0/0 possible
      .withColumn("sim_pm", expr("1000L * shared div (na + nb - shared)"))
      .select($"i", $"j", $"shared", $"na", $"nb", $"sim_pm")
      .orderBy($"i", $"j")
  }

  // ---------------------------------------------------------------- q36
  /** MinHash+LSH near-dup pairs: 16 md5-family minhashes per doc computed
    * map-side, 4 bands × 4 rows, bucket-join on band keys, exact-Jaccard
    * verification of candidates. Same output schema as q35; LSH may miss
    * borderline pairs (theory: P ≈ 1-(1-J⁴)⁴) — identically in both
    * engines, so the oracle still matches exactly. */
  /** Kirsch-Mitzenmacher double hashing: one md5 per shingle, split into
    * two 48-bit halves, sig_i = min over shingles of (h1 + i·h2) mod p.
    * Computed on EXPLODED shingles so the hashing is whole-stage-codegen'd
    * (array higher-order functions are interpreted in Spark) and the 16
    * signature mins are plain partial aggregates in one groupBy. */
  // canonical definition lives with the per-row expression twin so the
  // exploded and streaming pipelines can never drift
  val MinHashP: Long = graft.functions.HashOps.MinHashP

  /** Band-bucket membership cap (MaxShingleDf's twin for the LSH join): a
    * (band, bkey) bucket with k members contributes k²/2 candidate pairs on
    * ONE shuffle key, so an uncapped bucket is a quadratic hot key — the
    * round-2 verdict's remaining LSH hazard. Two defenses compose here:
    * exact duplicates are collapsed to one representative BEFORE banding
    * (identical texts always share every bucket — the most likely
    * mega-cluster is gone before it can form), and any surviving bucket
    * larger than the cap is dropped from candidate generation. Measured max
    * bucket size after collapse: 3 (sf0.01) / 4 (sf0.1), so 50 never drops
    * on the oracle corpora and the check stays hash-exact. A dropped bucket
    * loses recall only for 50+ near-identical-but-unequal docs — a cluster
    * that pair enumeration is the wrong tool for anyway (q47's component
    * view is the scale answer there). */
  val MaxBandBucket = 50L

  def q36MinHashLsh(s: SparkSession, dir: String): DataFrame =
    minHashLshPairs(docs(s, dir))

  /** The full LSH pipeline over an explicit `(doc_id, text)` corpus:
    * collapse exact dups → minhash/band representatives → bucket-capped
    * candidate join → exact-Jaccard verification → membership expansion.
    * Expansion restores every pair the uncollapsed pipeline would emit
    * (identical texts ⇒ identical signatures AND identical shingle sets, so
    * group-internal pairs are jaccard-1 and cross pairs inherit the
    * representatives' verified counts verbatim) — output-sized work, plain
    * equi-joins, no hot key. */
  /** Exact-dup collapse (q34's primitive): one representative per distinct
    * text. Returns (members (doc_id, rep), repDocs).
    *
    * Both outputs are consumed by SEVERAL downstream subtrees (signatures,
    * verification shingles, membership expansion — up to four occurrences
    * in one plan), so the two frames that cost a raw-text scan are
    * materialized once: `g` (doc_id, gid — two columns, no text) and
    * `repDocs` (the collapsed corpus). At 100 TB this is the standard
    * persist-the-reused-working-set trade (the collapsed corpus is read
    * 2–3× per pipeline run; re-scanning the raw table each time costs
    * more than materializing the dedup'd one — and the exchange-reuse
    * optimizer cannot help across separate actions). */
  private def collapseExact(d: DataFrame,
      materialize: Boolean = true): (DataFrame, DataFrame) = {
    val s = d.sparkSession
    import s.implicits._
    def cp(df: DataFrame): DataFrame =
      if (materialize) df.materialize() else df
    // materialize=true: 2 raw scans total, every later pass reads the
    // checkpoints (the multi-action component path). false: fully lazy —
    // a SINGLE-action consumer (q36/q37) plans one job and exchange
    // reuse dedupes the repeated subtrees, so materializing would only
    // add job barriers.
    val g = cp(d.select($"doc_id", md5($"text".cast("binary")).as("gid")))
    val reps = g.groupBy($"gid").agg(min($"doc_id").as("rep"))
    val members = g.join(reps, "gid").select($"doc_id", $"rep")
    val repDocs = cp(d.join(reps.select($"rep".as("doc_id")), "doc_id"))
    (members, repDocs)
  }

  /** 16 Kirsch-Mitzenmacher minhash components (s0..s15) per doc, via
    * the per-ROW codegen [[graft.functions.MinHashSig]] expression (r7):
    * one doc's shingle multiset is per-row data, so the signature needs
    * no explode, no shingle-volume shuffle and no 16 min-aggregates —
    * the r6 shape's (doc, shingle) exchange was the largest shuffle in
    * the whole q36 pipeline. Bit-identical to the exploded Md5Pair
    * formulation (parity spec) and to the hex/conv SQL the oracle runs;
    * <3-token docs have a null signature and drop, exactly the rows the
    * exploded groupBy never produced. */
  private[graft] def minhashSignatures(d: DataFrame): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    val cols = $"doc_id" +: (0 until 16).map(i =>
      element_at($"_sig", i + 1).as(s"s$i"))
    d.withColumn("_sig", graft.functions.MinHashSig($"text"))
      .filter($"_sig".isNotNull)
      .select(cols: _*)
  }

  /** (doc_id, band, bkey) rows: band key b = md5("s_{4b},..,s_{4b+3}"). */
  private[graft] def bandedOf(sig: DataFrame): DataFrame = {
    val s = sig.sparkSession
    import s.implicits._
    val bandStructs = (0 until 4).map { b =>
      val parts = (0 until 4).map(r => s"cast(s${b * 4 + r} as string)").mkString(", ")
      s"struct($b as band, md5(cast(concat_ws(',', $parts) as binary)) as bkey)"
    }.mkString(", ")
    sig.select($"doc_id", explode(expr(s"array($bandStructs)")).as("x"))
      .select($"doc_id", $"x.band".as("band"), $"x.bkey".as("bkey"))
  }

  /** Number of band buckets the cap would drop — the silent-recall-loss
    * detector ADVICE r3 asked for: a dropped bucket costs q36 one pair but
    * can split/merge an entire q62/q65 component, so the condition must be
    * loudly diagnosable, not discovered via an oracle hash mismatch. */
  private[graft] def cappedBucketCount(sig: DataFrame, bucketCap: Long): Long = {
    val s = sig.sparkSession
    import s.implicits._
    bandedOf(sig).groupBy($"band", $"bkey")
      .agg(count(lit(1)).as("bsz"))
      .filter($"bsz" > bucketCap)
      .count()
  }

  /** Bucket-capped banded candidate pairs (i, j) from signature rows:
    * buckets larger than the cap anti-joined away before the pair join. */
  private[graft] def lshCandidates(sig: DataFrame, bucketCap: Long): DataFrame = {
    val s = sig.sparkSession
    import s.implicits._
    val banded = bandedOf(sig)
    val fat = banded.groupBy($"band", $"bkey")
      .agg(count(lit(1)).as("bsz"))
      .filter($"bsz" > bucketCap)
      .select($"band", $"bkey")
    val bandedOk = banded.join(fat, Seq("band", "bkey"), "left_anti")
    bandedOk.as("a").join(bandedOk.as("b"),
        $"a.band" === $"b.band" && $"a.bkey" === $"b.bkey" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("i"), $"b.doc_id".as("j")).distinct()
  }

  /** The LSH pipeline up to verified REPRESENTATIVE pairs (pre-expansion):
    * (members (doc_id, rep), distinct shingle rows of the reps, verified
    * pairs between reps, checkpointed signature frame — one row per
    * shingle-bearing rep, the cheap source for the rep-id set). The
    * component-level consumers
    * (q62, q65) build on THIS — propagating labels over rep pairs and
    * expanding LABELS to members afterwards is linear in membership,
    * where propagating over the expanded pair list would be quadratic in
    * duplicate-group size (exactly the mega-cluster blowup the collapse
    * exists to prevent). */
  private[graft] def lshRepGraph(d: DataFrame, bucketCap: Long =
      MaxBandBucket,
      detect: Boolean = false): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val s = d.sparkSession
    import s.implicits._
    // r16 (guide §2.4/§7.2): ALWAYS checkpoint the scan-bearing frames
    // and the signature frame. The previous single-action shape
    // (detect=false) stayed fully lazy on the claim that exchange reuse
    // dedupes the repeated subtrees — measured against the POST-execution
    // adaptive plan, it does not: q36's final plan carried 33 separate
    // text-bearing parquet scans (only 9 ReusedExchange fired; the
    // membership-expansion self-joins re-expand collapseExact per
    // reference, and map-side subtrees below different exchange shapes
    // never canonicalize equal). With the checkpoints the raw corpus is
    // scanned twice (gid pass + repDocs join) and every later subtree
    // reads materialized frames — measured at sf0.1: wall parity (2.1 →
    // 2.1–2.3 s single-fork band; the barriers cost what the re-scans
    // cost at this tiny SF) but the final-plan text-bearing scan count
    // drops 33 → 2, which is the 100 TB number that matters.
    // detect=true additionally runs the cap detector job (strict-mode
    // abort semantics unchanged — q36/q37 keep warn-only caps).
    val (members, repDocs) = collapseExact(d, materialize = true)
    val sig = minhashSignatures(repDocs).materialize()
    if (detect) {
      // ADVICE r3: a cap-dropped bucket silently changes whole components
      // downstream (q62/q65), so count and report instead of staying
      // quiet. One tiny job over the checkpointed signatures.
      val nCapped = cappedBucketCount(sig, bucketCap)
      if (nCapped > 0) {
        val msg = s"lsh: $nCapped band bucket(s) exceed cap=$bucketCap and " +
          "were dropped from candidate generation — component-level " +
          "consumers (q62/q65) may diverge from a capless oracle; raise " +
          "the cap or inspect the hot texts"
        // ADVICE r4: in strict mode (oracle-verification runs — Verify
        // sets the property) a fired cap fails FAST instead of surfacing
        // later as an opaque hash mismatch buried under a log warning;
        // production-scale paths stay warn-only.
        if (strictCap) throw new IllegalStateException(msg)
        else log.warn(msg)
      }
    }
    val cand = lshCandidates(sig, bucketCap)
    val eD = shingleRowsOf(repDocs, distinct = true)
    (members, eD, verifyJaccard(eD, cand), sig)
  }

  def minHashLshPairs(d: DataFrame, bucketCap: Long = MaxBandBucket): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    val (members, eD, verified, _) = lshRepGraph(d, bucketCap)

    // membership expansion back to all doc pairs
    val nRep = eD.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val intra = members.select($"rep", $"doc_id".as("i"))
      .join(members.select($"rep", $"doc_id".as("j")), "rep")
      .filter($"i" < $"j") // shingle-less (<3 token) groups emit nothing:
      .join(nRep.withColumnRenamed("doc_id", "rep"), "rep") // inner join
      .select($"i", $"j", $"n".as("shared"), $"n".as("na"), $"n".as("nb"),
        lit(1.0).as("jaccard"))
    val cross = verified
      .join(members.select($"rep".as("i"), $"doc_id".as("mi")), "i")
      .join(members.select($"rep".as("j"), $"doc_id".as("mj")), "j")
      .select(least($"mi", $"mj").as("i"), greatest($"mi", $"mj").as("j"),
        $"shared",
        when($"mi" < $"mj", $"na").otherwise($"nb").as("na"),
        when($"mi" < $"mj", $"nb").otherwise($"na").as("nb"),
        $"jaccard")
    cross.union(intra).orderBy($"i", $"j")
  }

  // ---------------------------------------------------------------- q37
  /** SimHash near-dup pairs. 60-bit simhash over the *shingle* set
    * (unigram simhash cannot separate same-vocabulary documents); near =
    * hamming ≤ 10; candidates via 4×15-bit band join (exact for hamming
    * ≤ 3, high-probability beyond). Every step is deterministic md5 bit
    * arithmetic, so a DuckDB oracle mirrors it exactly (hash-exact check,
    * unlike the legitimately-approximate q19/q39/q44). */
  def q37SimHash(s: SparkSession, dir: String): DataFrame =
    simHashPairs(docs(s, dir))

  /** SimHash pipeline with the same mega-cluster defenses as q36
    * (identical texts ⇒ identical simhash ⇒ identical buckets, so the
    * band join has the same quadratic hot-key hazard): exact-dup collapse
    * before banding, bucket cap, membership expansion afterwards — intra
    * pairs are hamming 0, cross pairs inherit the representatives'
    * hamming verbatim, so output matches the uncollapsed formula the
    * oracle runs. */
  def simHashPairs(d: DataFrame, bucketCap: Long = MaxBandBucket): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    // r16: materialize + checkpoint (the q36 lshRepGraph finding — the
    // lazy shape re-expanded collapseExact per membership-expansion
    // reference: 18 text-bearing scans in the final adaptive plan)
    val (members, repDocs) = collapseExact(d, materialize = true)
    // per-ROW 60-bit SimHash (r7): one doc's distinct shingle set and its
    // 60 majority votes are per-row data, so the signature is one codegen
    // expression — no shingle explode, no (doc, shingle) shuffle, no 60
    // bit-count aggregates. Bit-identical to the exploded hex/conv
    // formulation (parity spec) — which is still what the oracle runs.
    val withSim = repDocs
      .withColumn("simhash", graft.functions.SimHashSig($"text"))
      .filter($"simhash".isNotNull)
      .select($"doc_id", $"simhash")
      .materialize()
    val bandStructs = (0 until 4).map(b =>
      s"struct($b as band, shiftright(simhash, ${b * 15}) & 32767 as bkey)")
      .mkString(", ")
    val banded = withSim.select($"doc_id", $"simhash",
      explode(expr(s"array($bandStructs)")).as("bd"))
      .select($"doc_id", $"simhash", $"bd.band", $"bd.bkey")
    val fat = banded.groupBy($"band", $"bkey")
      .agg(count(lit(1)).as("bsz"))
      .filter($"bsz" > bucketCap)
      .select($"band", $"bkey")
    val bandedOk = banded.join(fat, Seq("band", "bkey"), "left_anti")
    val repPairs = bandedOk.as("a").join(bandedOk.as("b"),
        $"a.band" === $"b.band" && $"a.bkey" === $"b.bkey" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("i"), $"b.doc_id".as("j"),
        $"a.simhash".as("ha"), $"b.simhash".as("hb")).distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter($"hamming" <= 10)
      .select($"i", $"j", $"hamming")
    // membership expansion: shingle-less groups have no simhash and emit
    // nothing (inner join against withSim's keys)
    val intra = members.select($"rep", $"doc_id".as("i"))
      .join(members.select($"rep", $"doc_id".as("j")), "rep")
      .filter($"i" < $"j")
      .join(withSim.select($"doc_id".as("rep")), "rep")
      .select($"i", $"j", lit(0).cast("int").as("hamming"))
    val cross = repPairs
      .join(members.select($"rep".as("i"), $"doc_id".as("mi")), "i")
      .join(members.select($"rep".as("j"), $"doc_id".as("mj")), "j")
      .select(least($"mi", $"mj").as("i"), greatest($"mi", $"mj").as("j"),
        $"hamming")
    cross.union(intra).orderBy($"i", $"j")
  }

  // ---------------------------------------------------------------- q49
  /** Sketch-only similarity estimation: for each LSH candidate pair,
    * estimate Jaccard as the fraction of agreeing minhash components — NO
    * shingle re-join. This is the 100 TB shape when exact verification
    * (q36) is too expensive: per-pair cost is comparing 16 longs instead
    * of intersecting shingle sets. Deterministic md5 arithmetic end to
    * end → hash-exact DuckDB oracle. Pairs are between exact-dup
    * representatives (members share identical signatures; q34's group
    * table recovers them). */
  def q49MinhashEstimate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // r16: materialize + checkpoint (the q36 finding — sig feeds the
    // banding, the cap census and both pair-join sides: 12 scans lazy)
    val (_, repDocs) = collapseExact(docs(s, dir), materialize = true)
    val sig = minhashSignatures(repDocs).materialize()
    val cand = lshCandidates(sig, MaxBandBucket)
    val a = sig.select($"doc_id".as("i") +:
      (0 until 16).map(k => col(s"s$k").as(s"a$k")): _*)
    val b = sig.select($"doc_id".as("j") +:
      (0 until 16).map(k => col(s"s$k").as(s"b$k")): _*)
    val matches = (0 until 16)
      .map(k => when(col(s"a$k") === col(s"b$k"), 1L).otherwise(0L))
      .reduce(_ + _)
    cand.join(a, "i").join(b, "j")
      .withColumn("n_match", matches)
      .withColumn("est_jaccard", $"n_match".cast("double") / 16.0)
      .select($"i", $"j", $"n_match", $"est_jaccard")
      .orderBy($"i", $"j")
  }

  // ---------------------------------------------------------------- q56
  /** Incremental (append-time) dedup: classify an incoming batch against
    * the existing canonical corpus — `dup_existing` (content already in
    * the corpus), `dup_batch` (an earlier row of the same batch has it),
    * `novel`. This is the decision an append-safe ingestion pipeline makes
    * per batch without ever rescanning old content bytes: the existing
    * side joins as (distinct) content hashes only. Batch boundary replayed
    * here as doc_id < 250. One hash semi-structure join + one min-per-hash
    * partial agg. */
  def q56IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir)
      .withColumn("h", md5($"text".cast("binary")))
    val existing = d.filter($"doc_id" < 250)
      .select($"h").distinct().withColumn("in_existing", lit(1L))
    val incoming = d.filter($"doc_id" >= 250)
    val firstInBatch = incoming.groupBy($"h").agg(min($"doc_id").as("first_id"))
    incoming
      .join(existing, Seq("h"), "left")
      .join(firstInBatch, "h")
      .withColumn("class",
        when($"in_existing" === 1L, "dup_existing")
          .when($"doc_id" =!= $"first_id", "dup_batch")
          .otherwise("novel"))
      .groupBy($"lang", $"class")
      .agg(count(lit(1)).as("n"))
      .orderBy($"lang", $"class")
  }

  // ---------------------------------------------------------------- q60
  /** Width of the exact-overlap n-gram used for decontamination. Longer
    * than the near-dup 3-gram on purpose: a decontamination hit should
    * mean a *verbatim run* crossed the split, not shared vocabulary
    * (practice uses 10-13; 5 is scaled to this corpus's ~40-token docs). */
  val DecontamWidth = 5

  /** Train/eval decontamination — the overlap check a training-data
    * pipeline runs before the eval split is trusted: a train document is
    * contaminated if it shares at least one exact `DecontamWidth`-gram
    * with ANY eval document. The 10% eval holdout here (bucket < 100 of
    * 1000) uses the same deterministic bucket FUNCTION as q46/q57
    * ([[graft.util.Buckets]]) but is its own split — against a real
    * benchmark suite the eval side would be the benchmark corpus itself.
    *
    * Scale shape: eval-side shingles collapse to a DISTINCT shingle set
    * (the eval corpus is the small side by construction — benchmarks, not
    * the crawl), train shingles equi-join against it and collapse to
    * distinct contaminated doc ids before the per-language count. No
    * per-pair work, no fan-out beyond the shingle join, and the final agg
    * is over (lang) — at 100 TB this is one shuffle on the shingle plus
    * one on doc_id. Scan accounting (VERDICT r3 #7): the text column is
    * decoded EXACTLY ONCE — split membership is a pure function of
    * doc_id, so one shingle pass serves both sides via filters; the only
    * other read is a text-free (doc_id, lang) columnar scan for the
    * final counts, which must include shingle-less (<width-token) train
    * documents. PlanSpec pins the single text-bearing scan. */
  def q60Decontam(s: SparkSession, dir: String): DataFrame =
    decontamOf(docs(s, dir))

  /** The decontamination pipeline over an explicit `(doc_id, lang, text)`
    * corpus (spec-testable with planted verbatim copies). */
  /** The (doc_id) hit list behind q60's accounting: TRAIN-side docs
    * (bucket ≥ 100) sharing a [[DecontamWidth]]-shingle with the eval
    * split (bucket < 100). Factored out so the curate CLI can DROP the
    * hits, not just count them. */
  def contaminatedTrainDocs(d: DataFrame): DataFrame =
    contaminatedDocsBy(d, graft.util.Buckets.mod1000("doc_id") < 100)

  /** The generalized hit list: non-eval docs sharing a
    * [[DecontamWidth]]-shingle with any doc satisfying `isEval` — which
    * must be computable from doc_id alone (it is evaluated MAP-SIDE on
    * the shingle frame). q60's convention is `bucket < 100`; the curate
    * CLI protects its OWN published val/test splits instead (review
    * finding r9: dropping against q60's eval buckets while publishing a
    * differently-derived split protects nothing the pipeline ships). */
  private[graft] def contaminatedDocsBy(d: DataFrame,
      isEval: org.apache.spark.sql.Column): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    // ONE text decode: shingle the whole corpus (per-doc dedup — needed
    // by the train side, absorbed by the global distinct on the eval
    // side), then split by the doc_id-derived predicate AFTER shingling.
    // The checkpoint is the scan barrier: without it Catalyst pushes the
    // two filters below the distinct and plans two text scans
    // (filter pushdown is per-branch; only exchanges are reused). The
    // shingle frame is a few rows per token — the persist-vs-rescan
    // trade the round-3 advice asked for in the same-corpus shape.
    val sh = shingleRowsOf(d.select($"doc_id", $"text"),
        distinct = true, width = DecontamWidth)
      .withColumn("ev", isEval)
      .materialize()
    val evalSh = sh.filter($"ev").select($"s").distinct()
    val trainSh = sh.filter(!$"ev").select($"doc_id", $"s")
    trainSh.join(evalSh, "s")
      .select($"doc_id").distinct()
  }

  def decontamOf(d: DataFrame): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    val hits = contaminatedTrainDocs(d).withColumn("cont", lit(1L))
    // text-free scan: every train doc counts, shingled or not
    d.select($"doc_id", $"lang")
      .withColumn("bucket", graft.util.Buckets.mod1000("doc_id"))
      .filter($"bucket" >= 100)
      .select($"doc_id", $"lang")
      .join(hits, Seq("doc_id"), "left")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_train"),
        sum(coalesce($"cont", lit(0L))).as("n_contaminated"))
      .withColumn("contam_frac",
        $"n_contaminated".cast("double") / $"n_train")
      .orderBy($"lang")
  }

  // --------------------------------------------------------------- q120
  /** Graded eval-side contamination — the per-example overlap grading of
    * the GPT-3 appendix-C / PaLM eval-integrity methodology: for every
    * EVAL-split document, the fraction of its distinct
    * [[DecontamWidth]]-grams that appear anywhere in the train split.
    * q60 answers "which train docs must be dropped"; this answers "how
    * dirty is each eval item if they are NOT" — the per-benchmark-item
    * number an eval-integrity report quotes, graded (a 2-gram brush
    * differs from a verbatim copy) rather than q60's boolean. Severity
    * is exact integer permille (floor division on both sides — zero
    * floating point anywhere).
    *
    * Scale shape: ONE text-bearing scan shingles the corpus (the q60
    * checkpoint barrier serves both split sides); grams are md5'd
    * MAP-SIDE so the join shuffles 128-bit keys, never 5-token strings
    * (the q97 discipline); the train side collapses to a distinct gram
    * set; eval gram rows — the SMALL side by construction (benchmarks,
    * not the crawl) — left-join it for per-gram hit marks and roll up
    * per doc. The final frame is eval-doc-sized. */
  def q120EvalOverlap(s: SparkSession, dir: String): DataFrame =
    evalOverlapOf(docs(s, dir))

  private[graft] def evalOverlapOf(d: DataFrame): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    val sh = shingleRowsOf(d.select($"doc_id", $"text"),
        distinct = true, width = DecontamWidth)
      .select($"doc_id", md5($"s".cast("binary")).as("h"),
        (graft.util.Buckets.mod1000("doc_id") < 100).as("ev"))
      .materialize()
    val trainG = sh.filter(!$"ev").select($"h").distinct()
      .withColumn("hit", lit(1L))
    val perDoc = sh.filter($"ev").select($"doc_id", $"h")
      .join(trainG, Seq("h"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce($"hit", lit(0L))).as("n_overlap"))
    // text-free scan: every eval doc reports, shingled or not
    d.select($"doc_id", $"lang")
      .filter(graft.util.Buckets.mod1000("doc_id") < 100)
      .join(perDoc, Seq("doc_id"), "left")
      .select($"doc_id", $"lang",
        coalesce($"n_grams", lit(0L)).as("n_grams"),
        coalesce($"n_overlap", lit(0L)).as("n_overlap"))
      .withColumn("overlap_pm",
        when($"n_grams" === 0L, 0L)
          .otherwise(expr("1000L * n_overlap div n_grams")))
      .orderBy($"doc_id")
  }

  // --------------------------------------------------------------- q127
  /** q127: NORMALIZED decontamination — the published recipe (GPT-3
    * appendix C, PaLM, Llama eval-integrity): overlap n-grams are
    * matched AFTER text normalization — lowercase, punctuation →
    * whitespace, whitespace collapsed — because real contamination
    * rarely survives a crawl byte-exactly (casing drifts, quotes get
    * smart-quoted, markdown adds punctuation). q60 matches raw grams and
    * MISSES every such perturbed copy; this runs both arms from ONE scan
    * and reports, per language: train docs, raw hits (q60's number —
    * cross-checked by spec), normalized hits, and `n_norm_only` — the
    * contamination only normalization catches, the number that justifies
    * the normalization pass to a pipeline owner.
    *
    * Exactness: normalization is two regexp_replace + trim (identical
    * regex semantics in Spark and DuckDB for these byte-class patterns);
    * punctuation maps to a SPACE, never the empty string, so tokens
    * cannot merge across a stripped character and gram windows stay
    * aligned with the token stream both engines see.
    *
    * Scale shape: q60's discipline with a 2-arm stack — ONE text-bearing
    * scan explodes (arm, toks) pairs, grams are md5'd MAP-SIDE (the q97
    * rule), the checkpointed (doc, bucket, arm, h) frame serves both
    * split sides, eval grams collapse to the distinct small side, and
    * the final rollup joins two doc-id hit lists onto a text-free
    * columnar scan. */
  def q127NormalizedDecontam(s: SparkSession, dir: String): DataFrame =
    normalizedDecontamOf(docs(s, dir))

  /** The normalization — ONE definition, used by the engine arm and
    * interpolated (same patterns) into the DuckDB twin. UNICODE-aware
    * classes (review finding r12): `[^a-z0-9 ]` would delete every
    * non-ASCII letter, silently blinding the normalized arm on
    * non-Latin-script languages — the opposite of the published recipe;
    * \p{L}\p{N} keep letters/digits of any script in both Java regex
    * and DuckDB's RE2. */
  private[graft] def normTextCol(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(regexp_replace(lower(c), "[^\\p{L}\\p{N} ]", " "),
      " +", " "))

  private[graft] def normalizedDecontamOf(d: DataFrame): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    val W = DecontamWidth
    val parts = (1 to W).map(k => s"element_at(toks, i+$k)").mkString(", ")
    val sh = d.select($"doc_id", $"text")
      .withColumn("bucket", graft.util.Buckets.mod1000("doc_id"))
      .select($"doc_id", $"bucket", explode(array(
        struct(lit(0L).as("arm"), split(lower($"text"), " ").as("toks")),
        struct(lit(1L).as("arm"), split(normTextCol($"text"), " ")
          .as("toks")))).as("x"))
      .select($"doc_id", $"bucket", $"x.arm".as("arm"), $"x.toks".as("toks"))
      .filter(size($"toks") >= W)
      .select($"doc_id", $"bucket", $"arm",
        explode(expr(s"sequence(0, size(toks) - $W)")).as("i"), $"toks")
      .select($"doc_id", $"bucket", $"arm",
        md5(expr(s"concat_ws(' ', $parts)").cast("binary")).as("h"))
      .distinct()
      .materialize() // the q60 scan barrier: both sides read it
    val evalG = sh.filter($"bucket" < 100).select($"arm", $"h").distinct()
    val hits = sh.filter($"bucket" >= 100)
      .join(evalG, Seq("arm", "h"), "left_semi")
      .select($"arm", $"doc_id").distinct()
      .materialize() // two arm filters below — one computation
    val raw = hits.filter($"arm" === 0L).select($"doc_id")
      .withColumn("craw", lit(1L))
    val nrm = hits.filter($"arm" === 1L).select($"doc_id")
      .withColumn("cnorm", lit(1L))
    // text-free scan: every train doc counts, gram-bearing or not
    d.select($"doc_id", $"lang")
      .withColumn("bucket", graft.util.Buckets.mod1000("doc_id"))
      .filter($"bucket" >= 100)
      .select($"doc_id", $"lang")
      .join(raw, Seq("doc_id"), "left")
      .join(nrm, Seq("doc_id"), "left")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_train"),
        sum(coalesce($"craw", lit(0L))).as("n_contam_raw"),
        sum(coalesce($"cnorm", lit(0L))).as("n_contam_norm"),
        sum(when($"cnorm" === 1L && $"craw".isNull, 1L).otherwise(0L))
          .as("n_norm_only"))
      .orderBy($"lang")
  }

  // --------------------------------------------------------------- q101
  /** q101: Bloom-filter decontamination — the broadcast-sketch SCALE arm
    * of q60, same split (doc_id buckets < 100 = eval, ≥ 100 = train) and
    * the SAME exact answer.
    *
    * q60's shape shuffles every train shingle into the equi-join against
    * the eval set. At 100 TB that shuffle carries the whole training
    * corpus's shingle volume. This arm instead:
    *
    *  1. builds ONE Bloom sketch of the distinct eval shingles with the
    *     engine's own `BloomFilterAggregate` (distributed partial
    *     sketches OR-merged; xxhash64 keys) — a driver-sized binary
    *     (MBs, fpp ≪ 1% at the sized capacity) fetched once;
    *  2. pre-filters the train shingles MAP-SIDE with the codegen
    *     `might_contain` literal — no false negatives, so every truly
    *     contaminated shingle survives;
    *  3. runs q60's exact equi-join on the SURVIVORS ONLY — the shuffle
    *     now carries (true hits + a hash-sized trickle of false
    *     positives) instead of the corpus.
    *
    * The output is q60's per-language exact accounting (hash-exact vs
    * the same DuckDB twin — the sketch can only shrink the join INPUT,
    * never the result) plus `bloom_fp_le_5pct`, a Spark-computed
    * invariant over the sketch's false-positive doc rate that the twin
    * predicts literally (q19/q83 pattern: the bloom bitset is
    * engine-internal, its guarantee is not — and Spark's bloom is
    * seed-fixed, so the flag is deterministic). */
  def q101BloomDecontam(s: SparkSession, dir: String): DataFrame =
    bloomDecontamOf(docs(s, dir))

  /** Fallback sketch capacity when no estimate is available (the
    * streaming arm's default). [[bloomDecontamOf]] right-sizes instead:
    * a fixed generous capacity costs a multi-MB literal broadcast into
    * every probe stage's task binary regardless of data (measured 3.6 MB
    * and ~3 s of pure serialization overhead at sf0.1 with 4M). */
  val BloomCapacity = 400000L

  /** Bits per expected item for right-sized sketches: at 2× capacity
    * headroom this lands ~14 hash functions and a per-item fpp near
    * 4e-8, so even a 1000-shingle document's any-shingle FP probability
    * stays far under the 5% flag bound. */
  val BloomBitsPerItem = 20L

  /** Hard ceiling on sketch capacity: past this the bitset literal
    * (bits/8 bytes, shipped in every probe stage's task binary) stops
    * being broadcast-practical (~250 MB at 100M items × 20 bits). An
    * eval/benchmark suite this large should be decontaminated in
    * partitions, not one sketch — fail loudly rather than degrade
    * silently. */
  val BloomMaxItems = 100000000L

  /** Driver-fetched Bloom sketch of a DataFrame's `colName` string
    * column, built with the engine's own distributed
    * `BloomFilterAggregate` (partial sketches OR-merged; xxhash64 keys).
    * Null when the frame is empty — see [[bloomGate]]. Shared by q101
    * and [[graft.streaming.StreamDecontam]]'s bloom arm.
    *
    * Spark 4 silently CLAMPS the aggregate's numItems/numBits to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems`/`maxNumBits`
    * (defaults 4M / 67.1M — `Math.min` in the lazy vals, no error), so
    * past ~1.7M items at 20 bits/item the documented fpp — and q101's
    * oracle-predicted fp invariant — would quietly degrade. Raise the
    * session confs to fit the request before building, and refuse
    * outright past [[BloomMaxItems]]. */
  /** Serializes [[bloomOf]]'s raise-then-restore of the session-global
    * bloom clamp confs: two overlapping builds on the same session could
    * otherwise each snapshot the other's raised value as "prior" and
    * restore a stale state (ADVICE r8). The lock is per-JVM, matching
    * the confs' scope; the aggregate job itself still runs distributed. */
  private val bloomConfLock = new Object

  def bloomOf(d: DataFrame, colName: String,
      capacity: Long = BloomCapacity): Array[Byte] = bloomConfLock.synchronized {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    require(capacity <= BloomMaxItems,
      s"bloom capacity $capacity exceeds BloomMaxItems=$BloomMaxItems — " +
        "partition the eval set instead of one sketch")
    val bits = capacity * BloomBitsPerItem
    val conf = d.sparkSession.conf
    // raise the clamp against the EFFECTIVE value (conf.get falls back
    // to the engine default — comparing only an explicitly-set value
    // could WRITE a value below the 4M/67.1M defaults and shrink the
    // clamp for Spark's own injected runtime blooms), never lower it,
    // and restore the prior state after the build so the session-global
    // conf carries no trace of this sketch (review finding)
    val raised = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> capacity,
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> bits)
      .flatMap { case (key, needed) =>
        val prior = conf.getOption(key)
        val effective =
          try conf.get(key).toLong
          catch { case _: NumberFormatException => Long.MinValue }
        if (effective < needed) { conf.set(key, needed.toString); Some(key -> prior) }
        else None
      }
    try d.agg(graft.util.Cols.column(
        new BloomFilterAggregate(
          new XxHash64(Seq(graft.util.Cols.expression(d(colName)))),
          Literal(capacity), Literal(bits))
          .toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]](0)
    finally raised.foreach { case (key, prior) =>
      // a prior value that came in unvalidated (spark-submit --conf can
      // store a non-numeric string; runtime set cannot) fails typed
      // re-validation here — in that case the raised NUMERIC value
      // stays, which is strictly saner than restoring a broken string.
      // Only the two re-validation shapes are swallowed (ADVICE r8): any
      // other failure is a real bug and must surface
      try prior.fold(conf.unset(key))(v => conf.set(key, v))
      catch {
        case _: IllegalArgumentException | _: NumberFormatException => ()
      }
    }
  }

  /** The codegen `might_contain(sketch-literal, xxhash64(c))` gate for a
    * sketch built by [[bloomOf]]; a null sketch (empty build side) means
    * nothing can match. No false negatives ever — the gate may only
    * SHRINK a downstream exact join's input, never change its result. */
  def bloomGate(bloomBin: Array[Byte], c: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.types.BinaryType
    if (bloomBin == null) lit(false)
    else graft.util.Cols.column(new BloomFilterMightContain(
      Literal(bloomBin, BinaryType),
      new XxHash64(Seq(graft.util.Cols.expression(c)))))
  }

  def bloomDecontamOf(d: DataFrame): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    // one text decode, one shingle frame, split after (the q60 barrier)
    val sh = shingleRowsOf(d.select($"doc_id", $"text"),
        distinct = true, width = DecontamWidth)
      .withColumn("bucket", graft.util.Buckets.mod1000("doc_id"))
      .materialize()
    // the distinct eval set is materialized ONCE — the sketch build and
    // the exact join both consume it (benchmark-suite-sized by the
    // split's construction, so the barrier is cheap)
    val evalSh = sh.filter($"bucket" < 100).select($"s").distinct()
      .materialize()
    val trainSh = sh.filter($"bucket" >= 100).select($"doc_id", $"s")
    // right-size the sketch from the HLL estimate (deterministic:
    // merged HLL registers are max-per-register, order-independent) —
    // the literal's size tracks the eval set instead of a fixed
    // worst-case capacity
    val est = math.max(1024L,
      evalSh.agg(approx_count_distinct($"s")).head.getLong(0))
    // empty eval split → null sketch → nothing can be contaminated
    val mightContain: Column = bloomGate(bloomOf(evalSh, "s", 2 * est), $"s")
    // ONE pass over the bloom survivors: candidacy (cand) and the exact
    // check (cont) fall out of the same LEFT join + per-doc aggregate —
    // no false negatives, so cont is exactly q60's join result
    val flagged = trainSh.filter(mightContain)
      .join(evalSh.withColumn("hit", lit(1L)), Seq("s"), "left")
      .groupBy($"doc_id")
      .agg(max(coalesce($"hit", lit(0L))).as("cont"))
      .withColumn("cand", lit(1L))
    d.select($"doc_id", $"lang")
      .withColumn("bucket", graft.util.Buckets.mod1000("doc_id"))
      .filter($"bucket" >= 100)
      .select($"doc_id", $"lang")
      .join(flagged, Seq("doc_id"), "left")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_train"),
        sum(coalesce($"cont", lit(0L))).as("n_contaminated"),
        sum(coalesce($"cand", lit(0L))).as("n_cand"))
      .withColumn("contam_frac",
        $"n_contaminated".cast("double") / $"n_train")
      // fp docs = bloom-flagged but not contaminated; rate over the
      // CLEAN population (0/0-guarded: all-contaminated → zero fps)
      .withColumn("bloom_fp_le_5pct",
        when($"n_train" === $"n_contaminated", lit(true))
          .otherwise(($"n_cand" - $"n_contaminated").cast("double") /
            ($"n_train" - $"n_contaminated") <= 0.05))
      .select($"lang", $"n_train", $"n_contaminated", $"contam_frac",
        $"bloom_fp_le_5pct")
      .orderBy($"lang")
  }

  // ---------------------------------------------------------------- q62
  /** Per-document component labels for the q36 near-dup graph, computed
    * the scale-safe way: label propagation runs over REPRESENTATIVE
    * pairs only, then labels expand to members through the exact-dup
    * group table — linear in membership. Propagating over q36's
    * EXPANDED pair list would re-introduce the k²/2 intra-group edges
    * the collapse removed (a 1000-identical-doc cluster = 499,500
    * edges), melting the components query on exactly the input dedup
    * exists for. Output = (doc_id, lbl) for every doc with ≥1 near-dup:
    * reps connected by verified pairs, plus pair-less multi-member
    * exact-dup groups (their members ARE near-dups — jaccard 1).
    * Labels are component-min doc ids: reps are group-min by
    * construction, and propagation takes the min rep. */
  /** Session-scoped memo of the member-label frame (VERDICT r3 #3): q62
    * and q65 are two reports over the SAME component structure, so when
    * both run in a session they share one LSH + propagation pass. Keyed
    * by (session, dir) — the corpus dirs are immutable inputs; the cached
    * frame is a localCheckpoint, so no lineage escapes. Bench clears this
    * before every measured pass so timings stay honest. */
  private val componentCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Drop memoized frames (benchmark hygiene — a timed pass must pay the
    * full cost it claims to measure; verification hygiene — a rewritten
    * corpus dir must not serve stale labels). Unpersists the evicted
    * checkpoints so their blocks free immediately instead of at GC.
    * Also drains the [[graft.util.Mat]] registry (ADVICE r16): every
    * ad-hoc materialized intermediate of the previous pass/query frees
    * here instead of accumulating across a 148-query session. */
  def clearCaches(): Unit = {
    componentCache.values.forEach { df =>
      try df.unpersist(false) catch { case _: Exception => () }
    }
    componentCache.clear()
    graft.util.Mat.clear()
  }

  /** Fail fast on a fired LSH bucket cap (vs warn-only): set by Verify
    * for oracle runs, or via SPARK_GRAFT_LSH_STRICT=1. */
  private def strictCap: Boolean =
    sys.props.get("graft.lsh.strict").contains("true") ||
      sys.env.get("SPARK_GRAFT_LSH_STRICT").contains("1")

  private def memberComponents(s: SparkSession, dir: String): DataFrame =
    componentCache.computeIfAbsent((s, dir),
      _ => memberComponentsOf(docs(s, dir)).materialize())

  private[graft] def memberComponentsOf(d: DataFrame): DataFrame = {
    val (members, _, verified, sig) = lshRepGraph(d, detect = true)
    componentsFrom(members, verified, sig)
  }

  /** The label-expansion tail of [[memberComponentsOf]], split out so a
    * caller that already paid [[lshRepGraph]] (q128's divergence audit
    * shares one pipeline between its two arms) never pays it twice. */
  private def componentsFrom(members: DataFrame, verified: DataFrame,
      sig: DataFrame): DataFrame = {
    val s = members.sparkSession
    import s.implicits._
    val repPairs = verified.select($"i", $"j")
    val labels = Similarity.labelPropagate(repPairs)._1 // (id=rep, lbl)
    // shingle-less (<3-token) groups never enter the pair graph (q36
    // emits nothing for them) — the rep-id join keeps the semantics
    // aligned. The signature frame has exactly one (checkpointed) row per
    // shingle-bearing rep, so it IS that id set — no second shingle pass
    val multi = members.groupBy($"rep").agg(count(lit(1)).as("n"))
      .filter($"n" >= 2)
      .join(sig.select($"doc_id".as("rep")), "rep")
      .select($"rep")
    val pairless = multi.join(labels, multi("rep") === labels("id"), "left_anti")
      .select($"rep".as("id"), $"rep".as("lbl"))
    val compOfRep = labels.union(pairless)
    members.join(compOfRep, members("rep") === compOfRep("id"))
      .select($"doc_id", $"lbl")
  }

  /** Near-dup cluster-size histogram: connected components over the q36
    * near-dup graph (rep-level propagation, see [[memberComponents]]),
    * then cluster_size → how many clusters / documents. The shape-of-the-
    * duplication report that decides whether dedup should enumerate
    * pairs (small clusters) or collapse components (mega-clusters).
    * Singleton documents have no near-dup and are intentionally absent. */
  // ---------------------------------------------------------------- q77
  /** Train/val/test LEAKAGE through near-duplicates: a cluster whose
    * members land in different q57 splits leaks eval content into
    * training in near-verbatim form — exact-hash splitting can't see it,
    * only the component view can (the reason dedup must run BEFORE
    * split assignment). Reports the cluster histogram by number of
    * splits spanned; splits_spanned ≥ 2 is the leak. Reuses the
    * memoized component labels (one LSH + propagation with q62/q65)
    * plus a label-cardinality aggregate — nothing scans text again. */
  def q77SplitLeakage(s: SparkSession, dir: String): DataFrame =
    splitLeakageOf(memberComponents(s, dir))

  private[graft] def splitLeakageOf(labels: DataFrame): DataFrame = {
    val s = labels.sparkSession
    import s.implicits._
    labels
      .withColumn("bucket", graft.util.Buckets.mod1000("doc_id"))
      .withColumn("split",
        when($"bucket" < 980, "train").when($"bucket" < 990, "val")
          .otherwise("test"))
      .groupBy($"lbl")
      .agg(countDistinct($"split").as("splits_spanned"),
        count(lit(1)).as("sz"))
      .groupBy($"splits_spanned")
      .agg(count(lit(1)).as("n_clusters"), sum($"sz").as("n_docs"))
      .orderBy($"splits_spanned")
  }

  def q62ClusterSizes(s: SparkSession, dir: String): DataFrame =
    sizeHistogramOf(memberComponents(s, dir))

  private[graft] def q62ClusterSizesOf(d: DataFrame): DataFrame =
    sizeHistogramOf(memberComponentsOf(d))

  private def sizeHistogramOf(labels: DataFrame): DataFrame = {
    val s = labels.sparkSession
    import s.implicits._
    labels
      .groupBy($"lbl").agg(count(lit(1)).as("cluster_size"))
      .groupBy($"cluster_size")
      .agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", $"cluster_size" * $"n_clusters")
      .orderBy($"cluster_size")
  }

  // ---------------------------------------------------------------- q65
  /** The keep/drop decision per near-dup cluster: within each q36
    * component keep the longest member (max n_chars, tie → min doc_id) —
    * the "best representative" rule a cleaning pipeline applies before
    * writing the deduplicated corpus. cluster_rep is the component's min
    * doc_id. One window top-1 per cluster over rows already keyed by
    * cluster — the same partial per-group top-k shape as q07
    * (WindowGroupLimit), no extra shuffle beyond the label join. */
  def q65KeepBest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val labels = memberComponents(s, dir)
    val d = docs(s, dir).select($"doc_id", $"n_chars")
    val m = labels.join(d, "doc_id")
      .select($"lbl", $"doc_id".as("id"), $"n_chars")
    val w = Window.partitionBy($"lbl").orderBy($"n_chars".desc, $"id".asc)
    val wsz = Window.partitionBy($"lbl")
    m.withColumn("rk", row_number().over(w))
      .withColumn("cluster_size", count(lit(1)).over(wsz))
      .filter($"rk" === 1)
      .select($"lbl".as("cluster_rep"), $"cluster_size",
        $"id".as("keep_id"), $"n_chars".as("keep_n_chars"),
        ($"cluster_size" - 1L).as("n_dropped"))
      .orderBy($"cluster_rep")
  }

  // --------------------------------------------------------------- q128
  /** DOOR-vs-BATCH keeper divergence (VERDICT r12 #7): the
    * [[graft.streaming.CurateDoor]]'s near-dup stage is CANDIDATE-grade
    * first-wins (a band collision drops the later arrival, owner = first
    * toucher of the bucket), while the batch refresh verifies exact
    * Jaccard and keeps the LONGEST component member (q65). The door
    * cannot adopt the batch keeper without buffering future arrivals —
    * but it can be ACCOUNTED: this audit replays BOTH decision rules
    * over one corpus (arrival order = doc_id, the door's orderCol
    * default) and counts the docs whose kept-state differs.
    *
    *   door arm:  exact-canonical (min doc_id per content — the
    *              IngestClean first-content-wins) survivors banded;
    *              bucket owner = min doc_id; a doc collides if ANY of
    *              its bands has an earlier owner (exactly
    *              [[graft.streaming.CurateDoor.collide]]'s rule —
    *              including its transitive quirk: a bucket owned by an
    *              already-dropped doc still collides later arrivals)
    *   batch arm: the q65 keeper — verified-Jaccard components, keep
    *              max n_chars (tie min doc_id)
    *
    * Output, one row: n_docs, each arm's drop count, the agreement
    * split, and divergence_permille = the number a door deployment
    * quotes for "how far is my streamed corpus from the batch refresh".
    * n_door_only are the door's false drops (candidate-grade collisions
    * the batch would keep — recall lost at the door); n_batch_only are
    * the door's leaks (kept at the door, dropped at the next refresh).
    *
    * Scale shape: reuses the capped LSH machinery (collapse → rep
    * signatures → bands) and the memoized component labels; the door
    * arm adds ONE (band, bkey) partial-agg min + an equi-join — no new
    * corpus scan, no new hot key. Exact-dup members never diverge (both
    * arms drop non-canonicals), so the interesting counts are rep-level. */
  def q128DoorDivergence(s: SparkSession, dir: String): DataFrame =
    doorKeeperDivergence(docs(s, dir))

  def doorKeeperDivergence(d: DataFrame): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val dt = d.select($"doc_id", $"text")
    // ONE collapse + signature + verified-pair pipeline feeds BOTH arms
    // (the checkpointed frames of lshRepGraph): the door arm re-bands
    // the 16-long signature rows (cheap), the batch arm propagates
    // labels over the verified pairs — the corpus is scanned once
    val (members, _, verified, sig) = lshRepGraph(dt, detect = true)
    // door arm: first-wins bucket ownership over the exact survivors
    val banded = bandedOf(sig)
      .materialize() // feeds owners + the collide join
    val owners = banded.groupBy($"band", $"bkey")
      .agg(min($"doc_id").as("owner"))
    val doorCollide = banded.join(owners, Seq("band", "bkey"))
      .filter($"doc_id" =!= $"owner")
      .select($"doc_id").distinct()
    val exactDrop = members.filter($"doc_id" =!= $"rep").select($"doc_id")
    val doorDrop = exactDrop.union(doorCollide).distinct()
    // batch arm: q65's keeper over the component labels — identical
    // texts tie on n_chars so the canonical (min id) wins, hence every
    // keeper is an exact-canonical and the non-rep clause covers exact
    // members in both arms symmetrically
    val labels = componentsFrom(members, verified, sig)
    val wk = Window.partitionBy($"lbl").orderBy($"n_chars".desc, $"doc_id".asc)
    val batchCompDrop = labels
      .join(d.select($"doc_id", $"n_chars"), "doc_id")
      .withColumn("rk", row_number().over(wk))
      .filter($"rk" =!= 1).select($"doc_id")
    val batchDrop = exactDrop.union(batchCompDrop).distinct()
    dt.select($"doc_id")
      .join(doorDrop.withColumn("dd", lit(1L)), Seq("doc_id"), "left")
      .join(batchDrop.withColumn("bd", lit(1L)), Seq("doc_id"), "left")
      .select(coalesce($"dd", lit(0L)).as("dd"),
        coalesce($"bd", lit(0L)).as("bd"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum($"dd"), lit(0L)).as("n_door_dropped"),
        coalesce(sum($"bd"), lit(0L)).as("n_batch_dropped"),
        coalesce(sum($"dd" * $"bd"), lit(0L)).as("n_both_dropped"),
        coalesce(sum($"dd" * (lit(1L) - $"bd")), lit(0L)).as("n_door_only"),
        coalesce(sum((lit(1L) - $"dd") * $"bd"), lit(0L)).as("n_batch_only"))
      // empty-corpus convention (EmptyCorpusSpec): one all-zero row, not
      // nulls — and the division is guarded, mirrored in the twin
      .withColumn("divergence_permille",
        when($"n_docs" === 0L, lit(0L))
          .otherwise(expr("1000L * (n_door_only + n_batch_only) div n_docs")))
  }

  /** Non-keeper members of every q36 near-dup component — the drop list
    * the cleaning pipelines join against. ONE memoized label pass
    * ([[memberComponents]]) serves both the q65 keeper choice and the
    * membership expansion here (review finding r9: the previous callers
    * re-derived the component labeling — the pipeline's costliest
    * shuffle — a second, unmemoized time). */
  def nearDupDrops(s: SparkSession, dir: String): DataFrame = {
    val keepers = q65KeepBest(s, dir)
      .select(col("cluster_rep").as("lbl"), col("keep_id"))
    memberComponents(s, dir)
      .join(keepers, "lbl")
      .filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"))
  }

  // ------------------------------------------------ incremental curate
  /** Persisted base-corpus curation state (VERDICT r9 #5) — the index
    * artifacts that make [[graft.app.CleanPipeline.runIncremental]]
    * BATCH-sized instead of O(corpus): every base-side decision input a
    * batch append needs, derived once at publish time (when the corpus
    * is already being scanned) and probed later by slim equi-joins.
    *
    *   hashes/     distinct content hashes of ALL input docs (q56 gate)
    *   sig/        16-component minhash signatures of the exact-collapse
    *               REPRESENTATIVES (band candidates vs base)
    *   shingles/   distinct 3-gram shingle rows of the representatives
    *               (exact-Jaccard verification of those candidates —
    *               restricted to candidate docs at use, so the probe
    *               reads candidate-sized data)
    *   evalgrams/  distinct DecontamWidth-gram strings of the EVAL-side
    *               docs (the published val/test splits — q60 gate)
    *   stripgrams/ distinct [[DupSpanWidth]]-gram hashes of the KEPT
    *               docs' original text (the q116 first-occurrence gate:
    *               base occurrences always precede batch occurrences)
    *
    * Sizes: hashes/sig are docs-sized (32 B / 17 longs per doc);
    * shingles/evalgrams/stripgrams are token-volume HASHES — the
    * standard dedup-index trade (a large-scale pipeline keeps them next
    * to the corpus; they are an order of magnitude smaller than text). */
  def saveCurateState(docsAll: DataFrame, keptDocs: DataFrame,
      statePath: String, isEval: org.apache.spark.sql.Column): Unit = {
    val dt = docsAll.select(col("doc_id"), col("text"))
    dt.select(md5(col("text").cast("binary")).as("h")).distinct()
      .write.mode("overwrite").parquet(s"$statePath/hashes")
    val (_, repDocs) = collapseExact(dt, materialize = true)
    minhashSignatures(repDocs)
      .write.mode("overwrite").parquet(s"$statePath/sig")
    shingleRowsOf(repDocs, distinct = true)
      .write.mode("overwrite").parquet(s"$statePath/shingles")
    shingleRowsOf(docsAll.filter(isEval).select(col("doc_id"), col("text")),
        distinct = true, width = DecontamWidth)
      .select(col("s")).distinct()
      .write.mode("overwrite").parquet(s"$statePath/evalgrams")
    gramOccurrences(spanBase(keptDocs.select(col("doc_id"), col("text"))))
      .select(col("h")).distinct()
      .write.mode("overwrite").parquet(s"$statePath/stripgrams")
  }

  /** The shared per-batch artifacts of the incremental stages — the
    * exact-collapse members/reps, rep signatures and rep shingles are
    * consumed by BOTH the near-dup decision and the state append, so
    * one [[incBatchArtifacts]] call materializes them once (at small SF
    * the batch pipeline's cost is job count, not data volume; at scale
    * it is one batch text scan instead of three). */
  private[graft] final case class IncBatch(members: DataFrame,
      repDocs: DataFrame, sig: DataFrame, shingles: DataFrame)

  private[graft] def incBatchArtifacts(batchDocs: DataFrame): IncBatch = {
    val dt = batchDocs.select(col("doc_id"), col("text"))
    val (members, repDocs) = collapseExact(dt, materialize = true)
    val sig = minhashSignatures(repDocs).materialize()
    val shingles = shingleRowsOf(repDocs, distinct = true)
      .materialize()
    IncBatch(members, repDocs, sig, shingles)
  }

  /** Append a processed batch's contribution to the curate state, so the
    * NEXT increment sees base ∪ batch. Same artifact shapes, parquet
    * append — each artifact derives from the batch alone (the collapse/
    * signature/shingle frames are the near-dup decision's, reused). */
  def appendCurateState(batchDocs: DataFrame, ib: IncBatch,
      batchKept: DataFrame, statePath: String,
      isEval: org.apache.spark.sql.Column): Unit = {
    batchDocs.select(md5(col("text").cast("binary")).as("h")).distinct()
      .write.mode("append").parquet(s"$statePath/hashes")
    ib.sig.write.mode("append").parquet(s"$statePath/sig")
    ib.shingles.write.mode("append").parquet(s"$statePath/shingles")
    shingleRowsOf(batchDocs.filter(isEval).select(col("doc_id"), col("text")),
        distinct = true, width = DecontamWidth)
      .select(col("s")).distinct()
      .write.mode("append").parquet(s"$statePath/evalgrams")
    gramOccurrences(spanBase(batchKept.select(col("doc_id"), col("text"))))
      .select(col("h")).distinct()
      .write.mode("append").parquet(s"$statePath/stripgrams")
  }

  /** q56 against the persisted state: batch docs whose content hash the
    * base corpus already holds. Batch ids are strictly greater than base
    * ids, so the base copy is always the q34 canonical keeper — the drop
    * direction can never flip. */
  def incrementalDupExisting(batchDocs: DataFrame,
      statePath: String): DataFrame = {
    val s = batchDocs.sparkSession
    batchDocs
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
      .join(s.read.parquet(s"$statePath/hashes"), Seq("h"), "left_semi")
      .select(col("doc_id"))
  }

  /** Near-dup drop list of a batch against base-state + itself — the
    * q36/q65 decision restricted to pairs involving the batch:
    *
    *  1. batch-internal components ([[memberComponentsOf]], the exact
    *     batch machinery) with the q65 keeper (longest, tie min id);
    *  2. batch representatives band-colliding with base representatives
    *     ([[bandedOf]] both sides), verified by exact Jaccard ≥ 0.5
    *     against the persisted shingle rows (restricted to candidate
    *     base docs — the probe is candidate-sized);
    *  3. a batch component containing ANY base-linked member drops ALL
    *     its members (the base side is immutable, so the base component
    *     keeps its published keeper).
    *
    * Divergence from a full recurate of the union, by design and
    * documented: when a batch member is LONGER than every base member of
    * its component, the full recurate would crown it keeper and drop the
    * base copy; append-only curation cannot retract published docs, so
    * the batch member is dropped instead (the "keeper tie" class). All
    * other decisions are identical. */
  /** Step 2 of [[incrementalNearDupDrops]], factored for reuse by the
    * streaming curate door ([[graft.streaming.CurateDoor]]): batch docs
    * VERIFIED near-dup of some base doc — band collision against the
    * persisted rep signatures, exact Jaccard ≥ 0.5 against the persisted
    * shingle rows (probe restricted to candidate base docs), expanded
    * from linked representatives to their exact-collapse members. */
  def vsBaseLinkedDocs(ib: IncBatch, statePath: String): DataFrame = {
    val s = ib.sig.sparkSession
    import s.implicits._
    val sigBase = s.read.parquet(s"$statePath/sig")
    // per-side bucket caps mirror lshCandidates' defense (a fat bucket
    // on either side is the same quadratic hot key)
    def capped(banded: DataFrame): DataFrame = {
      val fat = banded.groupBy($"band", $"bkey")
        .agg(count(lit(1)).as("bsz"))
        .filter($"bsz" > MaxBandBucket)
        .select($"band", $"bkey")
      banded.join(fat, Seq("band", "bkey"), "left_anti")
    }
    // i =!= j: a batch id already present in the state (a re-send the
    // caller chose not to pre-drop) must not pair with ITSELF — the
    // self-pair is the dup-existing gate's case, not a near-dup
    val cand = capped(bandedOf(ib.sig)).as("a")
      .join(capped(bandedOf(sigBase)).as("b"), Seq("band", "bkey"))
      .filter($"a.doc_id" =!= $"b.doc_id")
      .select($"a.doc_id".as("i"), $"b.doc_id".as("j")).distinct()
      .materialize()
    val eBase = s.read.parquet(s"$statePath/shingles")
      .join(cand.select($"j".as("doc_id")).distinct(), Seq("doc_id"),
        "left_semi")
    val linkedReps = verifyJaccard(ib.shingles.union(eBase), cand)
      .select($"i".as("rep")).distinct()
    ib.members.join(linkedReps, "rep")
      .select($"doc_id").materialize()
  }

  def incrementalNearDupDrops(batchDocs: DataFrame, ib: IncBatch,
      statePath: String): DataFrame = {
    val s = batchDocs.sparkSession
    import s.implicits._
    val linkedDocs = vsBaseLinkedDocs(ib, statePath)
    // batch-internal components from the SAME artifacts
    // (memberComponentsOf's logic minus its private re-collapse — one
    // batch text scan serves the whole decision), then the q65 keeper
    // among components not linked to base
    import org.apache.spark.sql.expressions.Window
    val candB = lshCandidates(ib.sig, MaxBandBucket)
    val labels0 = Similarity.labelPropagate(
      verifyJaccard(ib.shingles, candB).select($"i", $"j"))._1
    val multi = ib.members.groupBy($"rep").agg(count(lit(1)).as("nm"))
      .filter($"nm" >= 2)
      .join(ib.sig.select($"doc_id".as("rep")), "rep")
      .select($"rep")
    val pairless = multi.join(labels0, multi("rep") === labels0("id"),
        "left_anti")
      .select($"rep".as("id"), $"rep".as("lbl"))
    val compOfRep = labels0.union(pairless)
    val labels = ib.members.join(compOfRep, ib.members("rep") === compOfRep("id"))
      .select($"doc_id", $"lbl")
    val linkedLbls = labels.join(linkedDocs, Seq("doc_id"), "left_semi")
      .select($"lbl").distinct()
    val linkedCompDocs = labels.join(linkedLbls, "lbl").select($"doc_id")
    val unlinked = labels.join(linkedLbls, Seq("lbl"), "left_anti")
      .join(batchDocs.select($"doc_id", $"n_chars"), "doc_id")
    val w = Window.partitionBy($"lbl").orderBy($"n_chars".desc, $"doc_id".asc)
    val unlinkedNonKeepers = unlinked
      .withColumn("rk", row_number().over(w))
      .filter($"rk" =!= 1).select($"doc_id")
    linkedDocs.union(linkedCompDocs).union(unlinkedNonKeepers).distinct()
  }

  /** q60 against the union eval set: batch TRAIN docs sharing a
    * DecontamWidth-gram with any base eval doc (persisted gram set) or
    * any batch eval doc. Batch eval docs are never dropped (the runFull
    * rule). A NEW eval doc contaminating a base train doc is the
    * append-only divergence class: the full recurate would drop the base
    * doc, an append cannot retract it — documented, not silent. */
  def incrementalContaminated(batchDocs: DataFrame, statePath: String,
      isEval: org.apache.spark.sql.Column): DataFrame = {
    val s = batchDocs.sparkSession
    import s.implicits._
    val sh = shingleRowsOf(batchDocs.select($"doc_id", $"text"),
        distinct = true, width = DecontamWidth)
      .join(batchDocs.select($"doc_id", isEval.as("ev")), "doc_id")
      .materialize()
    val evalS = sh.filter($"ev").select($"s")
      .union(s.read.parquet(s"$statePath/evalgrams")).distinct()
    sh.filter(!$"ev").select($"doc_id", $"s")
      .join(evalS, "s")
      .select($"doc_id").distinct()
  }

  /** [[dupStartsOf]] against the union corpus: a batch gram occurrence
    * is non-first if its gram exists in the base KEPT corpus (base ids
    * all precede batch ids, so a base occurrence always wins the q99
    * first-key rule) or if an earlier batch occurrence exists. Feeding
    * these starts through the q116 threshold machinery strips the batch
    * EXACTLY as a full recurate of the union would — base documents'
    * strips are unaffected by construction (their occurrences stay
    * first). */
  def incrementalDupStarts(base: DataFrame, statePath: String): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    val occ = gramOccurrences(base)
      .withColumn("k", $"doc_id" * lit(1000000000L) + $"pos")
      .materialize()
    val firstKey = occ.groupBy($"h").agg(min($"k").as("fk"))
    val inBase = s.read.parquet(s"$statePath/stripgrams")
      .withColumn("in_base", lit(1))
    occ.join(firstKey, "h")
      .join(inBase, Seq("h"), "left")
      .filter($"in_base" === 1 || $"k" =!= $"fk")
      .groupBy($"doc_id").agg(sort_array(collect_list($"pos")).as("sts"))
  }

  /** The state-aware q116 strip + q114 redact chain over a batch's KEPT
    * docs — the transform half of the incremental curate, shared
    * verbatim by [[graft.app.CleanPipeline.runIncremental]] and the
    * streaming door ([[graft.streaming.CurateDoor]]) so door-admitted
    * bytes ≡ incrementally-published bytes by construction, not by
    * parallel implementation. Input `(doc_id, text)`; output one row per
    * doc: `(doc_id, text [stripped+redacted], n_pii, n_tok, n_kept,
    * n_dup_kept)` — n_dup_kept counts duplicated tokens the threshold
    * SPARED (spans < `minStripSpan`), the runFull accounting column. */
  def stripRedactAgainstState(kept: DataFrame, statePath: String,
      minStripSpan: Long): DataFrame = {
    val base = spanBase(kept.select(col("doc_id"), col("text")))
    val ivs = maxSpanIntervals(incrementalDupStarts(base, statePath))
      .withColumn("n_dup_kept", expr(
        s"""aggregate(filter(iv, v -> v.b - v.a < ${minStripSpan}L),
           |  0L, (acc, v) -> acc + (v.b - v.a))""".stripMargin))
      .withColumn("iv",
        expr(s"filter(iv, v -> v.b - v.a >= ${minStripSpan}L)"))
      .select(col("doc_id"), col("iv"), col("n_dup_kept"))
    val stripped = stripByIntervals(base, ivs)
      .withColumn("n_dup_kept", coalesce(col("n_dup_kept"), lit(0L)))
      .select(col("doc_id"), col("stripped_text"),
        col("n").as("n_tok"), col("n_kept"), col("n_dup_kept"))
    TextOps.piiRewriteOf(stripped.withColumnRenamed("stripped_text", "text"))
      .select(col("doc_id"), col("redacted").as("text"),
        (col("n_emails") + col("n_ipv4") + col("n_phones")).as("n_pii"),
        col("n_tok"), col("n_kept"), col("n_dup_kept"))
  }

  // ---------------------------------------------------------------- q97
  /** Width of a duplication SPAN: the q97 n-gram size, chosen long enough
    * that a match is copied text, not coincidence (the substring-dedup
    * convention of training-data curation — tens of tokens). */
  val DupSpanWidth = 20

  /** Cross-document duplicated-span coverage — the SUBSTRING-level dedup
    * signal the doc-level family (q34/q35/q36/q89) cannot see: a span is
    * an exact [[DupSpanWidth]]-token n-gram occurrence, and it counts as
    * DUPLICATED when its gram occurs ≥ 2 times corpus-wide (in another
    * document or again in the same one — both are copied text). Per
    * language: docs, docs long enough to carry spans, span occurrences,
    * duplicated occurrences, and the corpus duplication fraction — the
    * "how much of this corpus is copied text" number that decides
    * whether span-level dedup is worth running before training.
    *
    * Scale shape: grams are md5'd MAP-SIDE before any shuffle, so every
    * exchange carries a fixed 32-byte key instead of a ~20-token string;
    * the (doc, gram) count is one shuffle over occurrence volume, and
    * everything after it is distinct-gram- or doc-sized. The occurrence
    * frame feeds two consumers (the global gram count and the per-doc
    * dup rollup), so it is localCheckpoint'd — the q60/q86/q89 barrier —
    * and the dup join matches each (doc, gram) row against at most one
    * gram row: no fan-out, no df cap needed. Per-doc span totals are a
    * map-side expression on the lang scan, never a second text decode. */
  def q97DupSpans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = docs(s, dir)
    val occ = shingleRowsOf(d.select($"doc_id", $"text"), distinct = false,
        width = DupSpanWidth)
      .select($"doc_id", md5($"s".cast("binary")).as("h"))
      .groupBy($"doc_id", $"h").agg(count(lit(1)).as("k"))
      .materialize()
    val dupGrams = occ.groupBy($"h").agg(sum($"k").as("c"))
      .filter($"c" >= 2).select($"h")
    val dupPerDoc = occ.join(dupGrams, "h")
      .groupBy($"doc_id").agg(sum($"k").as("nd"))
    // per-doc span totals come from the SAME checkpointed occurrence
    // frame (a doc's gram count is Σk), so the final lang join scans only
    // (doc_id, lang) — text is decoded exactly once, inside the barrier
    val perDoc = occ.groupBy($"doc_id").agg(sum($"k").as("g"))
    d.select($"doc_id", $"lang")
      .join(perDoc, Seq("doc_id"), "left")
      .join(dupPerDoc, Seq("doc_id"), "left")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"g".isNotNull, 1L).otherwise(0L)).as("n_spanned_docs"),
        sum(coalesce($"g", lit(0L))).as("n_grams"),
        sum(coalesce($"nd", lit(0L))).as("n_dup"))
      .withColumn("dup_frac",
        when($"n_grams" === 0, lit(0.0))
          .otherwise($"n_dup".cast("double") / $"n_grams".cast("double")))
      .orderBy($"lang")
  }

  // ---------------------------------------------------------------- q99
  /** Duplicated-span STRIPPING — the ACTIVE transform behind q97's
    * accounting (the "deduplicating training data" substring rewrite):
    * every occurrence of a duplicated [[DupSpanWidth]]-token n-gram
    * EXCEPT the corpus-wide first keeps nothing — tokens covered by any
    * non-first occurrence are removed, and the document is rebuilt from
    * the surviving tokens. "First" is the globally deterministic
    * (doc_id, position) minimum per gram, encoded as ONE integer key
    * doc_id·10⁹+pos so the winner is a plain MIN aggregate (no window
    * over the gram group). Output per document: token counts before and
    * after, and the md5 of the rebuilt text — the transform is verified
    * byte-exactly without shipping the text.
    *
    * Scale shape: gram occurrences are md5'd map-side (32-byte keys on
    * every exchange, never 20-token strings); the occurrence frame feeds
    * the first-key MIN and the mark-back join, so it is localCheckpoint'd
    * (the q97 barrier); the join matches each occurrence against exactly
    * one gram row — no fan-out. Duplicate start positions collapse to a
    * per-doc sorted array (bounded by doc length), and the rebuild is a
    * single array projection on a second pruned corpus scan — coverage
    * testing is O(|doc| · #dup-starts) per row, bounded because document
    * length is bounded, never a corpus-sized blowup. */
  /** `(doc_id, …, toks, n)` span-strip base: every column of `d` except
    * `text`, plus the whitespace token array and its length. Shared by
    * the batch strip (q99) and the ingestion-time twin
    * ([[graft.streaming.StreamingSpanStrip]]). */
  private[graft] def spanBase(d: DataFrame): DataFrame =
    d.withColumn("toks", split(trim(col("text")), "\\s+"))
      .withColumn("n", size(col("toks")).cast("long"))
      .drop("text")

  /** `(doc_id, pos, h)` — one row per [[DupSpanWidth]]-gram occurrence of
    * a [[spanBase]] frame, gram md5'd map-side so no exchange ever
    * carries a 20-token string. */
  private[graft] def gramOccurrences(base: DataFrame): DataFrame = {
    val W = DupSpanWidth
    base.filter(col("n") >= W)
      .select(col("doc_id"), col("toks"),
        explode(expr(s"sequence(0, size(toks) - $W)")).as("i"))
      .select(col("doc_id"), col("i").cast("long").as("pos"),
        md5(expr(s"concat_ws(' ', slice(toks, i + 1, $W))").cast("binary")).as("h"))
  }

  /** Rebuild each document of `base` minus the tokens covered by its
    * `starts` dup-start array (`(doc_id, sts)`; docs absent from `starts`
    * keep everything). Adds `n_kept` and `stripped_md5`, drops the token
    * array. Coverage testing is O(|doc| · #dup-starts) per row — bounded
    * because document length is bounded, never corpus-sized. */
  private[graft] def stripByStarts(base: DataFrame, starts: DataFrame): DataFrame = {
    val W = DupSpanWidth
    base.join(starts, Seq("doc_id"), "left")
      .withColumn("sts", coalesce(col("sts"), expr("array()")))
      .withColumn("keep", expr(
        s"filter(sequence(0L, n - 1L), p -> NOT exists(sts, st -> p >= st AND p < st + $W))"))
      .withColumn("n_kept", size(col("keep")).cast("long"))
      // the rebuilt text rides along for transform consumers (the curate
      // CLI publishes it); md5-only consumers (q99, the streaming strip)
      // just don't select it
      .withColumn("stripped_text", expr(
        "concat_ws(' ', transform(keep, p -> element_at(toks, cast(p + 1 as int))))"))
      .withColumn("stripped_md5", md5(col("stripped_text").cast("binary")))
      .drop("toks", "sts", "keep")
  }

  /** `(doc_id, sts)` — per document, the SORTED start positions of every
    * non-first duplicated-gram occurrence of a [[spanBase]] frame (the
    * q99 rule: corpus-wide first by encoded (doc_id, pos) key survives).
    * Shared by the strip (q99) and the maximal-span report (q113).
    *
    * The encoded first-occurrence key is valid while doc_id < 2^63/10^9
    * ≈ 9.2e9 and doc length < 10^9 tokens; a corpus beyond ~10^10
    * documents widens this to min(struct(doc_id, pos)) (Spark orders
    * structs lexicographically) at the cost of a fatter shuffle key. */
  private[graft] def dupStartsOf(base: DataFrame): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    val occ = gramOccurrences(base)
      .withColumn("k", $"doc_id" * lit(1000000000L) + $"pos")
      .materialize()
    val firstKey = occ.groupBy($"h").agg(min($"k").as("fk"))
    occ.join(firstKey, "h")
      .filter($"k" =!= $"fk")
      .groupBy($"doc_id").agg(sort_array(collect_list($"pos")).as("sts"))
  }

  def q99SpanStrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = spanBase(docs(s, dir).select($"doc_id", $"lang", $"text"))
    val starts = dupStartsOf(base)
    stripByStarts(base, starts)
      .select($"doc_id", $"lang", $"n".as("n_tok"),
        ($"n" - $"n_kept").as("n_removed"),
        ($"n_kept".cast("double") / $"n".cast("double")).as("kept_frac"),
        $"stripped_md5")
      .orderBy($"doc_id")
  }

  // ---------------------------------------------------------------- q113
  /** Merge a [[dupStartsOf]] frame's per-doc sorted start array into
    * MAXIMAL duplicated intervals: each start covers
    * [p, p + [[DupSpanWidth]]); two covered regions merge when they
    * overlap or touch, which for sorted starts is exactly "next start ≤
    * current merged end". The merge is a single `aggregate` fold over
    * the per-doc array — pure codegen'd expression work on rows already
    * grouped by q99's one shuffle, no window, no second exchange; the
    * fold is O(#starts) per doc with last-element patching, bounded by
    * document length. Adds `iv: array<struct<a,b>>` (half-open token
    * intervals). */
  private[graft] def maxSpanIntervals(starts: DataFrame): DataFrame = {
    val W = DupSpanWidth
    starts.withColumn("iv", expr(
      s"""aggregate(
         |  slice(sts, 2, size(sts) - 1),
         |  array(named_struct('a', element_at(sts, 1),
         |                     'b', element_at(sts, 1) + ${W}L)),
         |  (acc, p) -> CASE WHEN p <= element_at(acc, -1).b
         |    THEN concat(slice(acc, 1, size(acc) - 1),
         |                array(named_struct('a', element_at(acc, -1).a,
         |                                   'b', p + ${W}L)))
         |    ELSE concat(acc, array(named_struct('a', p, 'b', p + ${W}L)))
         |  END)""".stripMargin))
  }

  /** q113: maximal-duplicated-span length histogram — the honest answer
    * to "HOW LONG are the copied blocks" that fixed-width grams (q97)
    * cannot give: a 400-token duplicated block is 381 overlapping
    * 20-gram hits but ONE maximal span of length 400 here (the
    * ExactSubstr curation convention of Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better" — remove maximal
    * duplicated substrings ≥ a threshold). Spans are q99's non-first
    * occurrence coverage chained by [[maxSpanIntervals]]; by
    * construction the union of the merged intervals IS q99's covered
    * token set, so stripping by these spans is byte-identical to q99
    * (pinned in DedupSpec). Per (lang, span_len): span count, documents
    * carrying one, and covered tokens — the histogram an operator reads
    * to pick the strip threshold.
    *
    * Scale shape: everything through `sts` is q99's plan (md5 map-side,
    * one occurrence shuffle, checkpointed barrier); the merge is
    * map-side expression work; the histogram is one partial agg over
    * span rows (≤ #dup-starts, ≪ corpus tokens). The lang join scans
    * only (doc_id, lang) — text is never re-decoded. */
  def q113MaxSpans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = spanBase(docs(s, dir).select($"doc_id", $"text"))
    val spans = maxSpanIntervals(dupStartsOf(base))
      .select($"doc_id", explode($"iv").as("v"))
      .select($"doc_id", ($"v.b" - $"v.a").as("span_len"))
    spans.join(docs(s, dir).select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang", $"span_len")
      .agg(count(lit(1)).as("n_spans"),
        countDistinct($"doc_id").as("n_docs"),
        sum($"span_len").as("covered_tokens"))
      .orderBy($"lang", $"span_len")
  }

  /** Rebuild each document of `base` minus the tokens covered by its
    * merged-interval array (`(doc_id, iv)`; absent docs keep
    * everything) — the maximal-span twin of [[stripByStarts]], used by
    * the q113 ≡ q99 equality spec (same covered set, exactly one
    * containment test per (token, interval) instead of per (token,
    * start)). */
  private[graft] def stripByIntervals(base: DataFrame, ivs: DataFrame): DataFrame =
    base.join(ivs, Seq("doc_id"), "left")
      .withColumn("iv", coalesce(col("iv"),
        expr("CAST(array() AS ARRAY<STRUCT<a: BIGINT, b: BIGINT>>)")))
      .withColumn("keep", expr(
        "filter(sequence(0L, n - 1L), p -> NOT exists(iv, v -> p >= v.a AND p < v.b))"))
      .withColumn("n_kept", size(col("keep")).cast("long"))
      // rebuilt text rides along for transform consumers (the curate CLI
      // publishes it) — mirror of [[stripByStarts]]'s contract; md5-only
      // consumers (q116, the streaming strip) just don't select it
      .withColumn("stripped_text", expr(
        "concat_ws(' ', transform(keep, p -> element_at(toks, cast(p + 1 as int))))"))
      .withColumn("stripped_md5", md5(col("stripped_text").cast("binary")))
      .drop("toks", "iv", "keep")

  // ---------------------------------------------------------------- q116
  /** The q116 strip threshold: only maximal duplicated spans of at least
    * this many tokens are removed — the ExactSubstr convention (Lee et
    * al. 2022 strip duplicated substrings ≥ 50 tokens): a block this
    * long is copied text with near-certainty, while an isolated
    * [[DupSpanWidth]]-gram can be a boilerplate phrase worth keeping. */
  val MinStripSpan = 50L

  /** Threshold-strip a `(doc_id, …, text)` frame: q99's dup-start
    * derivation → q113's maximal-interval merge → drop intervals shorter
    * than `minLen` → strip the survivors' coverage. At `minLen` ≤
    * [[DupSpanWidth]] every interval qualifies and this IS q99's strip
    * (spec-pinned); at the q116 default only long copied blocks go. */
  private[graft] def longSpanStripOf(d: DataFrame, minLen: Long): DataFrame = {
    val base = spanBase(d)
    val ivs = maxSpanIntervals(dupStartsOf(base))
      .withColumn("iv", expr(s"filter(iv, v -> v.b - v.a >= ${minLen}L)"))
      .filter(size(col("iv")) > 0)
      .select(col("doc_id"), col("iv"))
    stripByIntervals(base, ivs)
  }

  /** q116: threshold span strip — the ACTIVE rewrite behind q113's
    * histogram and the published ExactSubstr curation rule: remove only
    * maximal duplicated blocks of ≥ [[MinStripSpan]] tokens, keeping
    * short incidental matches. Same output contract as q99 (before/after
    * token counts + rebuilt-text md5). Scale shape = q99 + a per-doc
    * fold; the interval filter is map-side expression work. */
  def q116LongSpanStrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    longSpanStripOf(docs(s, dir).select($"doc_id", $"lang", $"text"),
        MinStripSpan)
      .select($"doc_id", $"lang", $"n".as("n_tok"),
        ($"n" - $"n_kept").as("n_removed"),
        ($"n_kept".cast("double") / $"n".cast("double")).as("kept_frac"),
        $"stripped_md5")
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_exact_dedup" -> (q34ExactDedup _),
    "q85_bow_dedup" -> (q85BowDedup _),
    "q35_ngram_jaccard" -> (q35NgramJaccard _),
    "q89_containment" -> (q89Containment _),
    "q36_minhash_lsh" -> (q36MinHashLsh _),
    "q37_simhash" -> (q37SimHash _),
    "q49_minhash_estimate" -> (q49MinhashEstimate _),
    "q56_incremental_dedup" -> (q56IncrementalDedup _),
    "q60_decontam" -> (q60Decontam _),
    "q101_bloom_decontam" -> (q101BloomDecontam _),
    "q120_eval_overlap" -> (q120EvalOverlap _),
    "q127_norm_decontam" -> (q127NormalizedDecontam _),
    "q121_winnowing" -> (q121Winnowing _),
    "q62_cluster_sizes" -> (q62ClusterSizes _),
    "q65_keep_best" -> (q65KeepBest _),
    "q128_door_divergence" -> (q128DoorDivergence _),
    "q77_split_leakage" -> (q77SplitLeakage _),
    "q97_dup_spans" -> (q97DupSpans _),
    "q99_span_strip" -> (q99SpanStrip _),
    "q113_max_spans" -> (q113MaxSpans _),
    "q116_long_span_strip" -> (q116LongSpanStrip _),
  )

  /** The q99 twin's CTE chain through `dup (doc_id, pos)` — tokenize,
    * per-position md5'd 20-grams, encoded first-occurrence key, non-first
    * occurrences — shared by the q99 strip twin and the q113 maximal-span
    * twin (which chains `dup` into gaps-and-islands intervals). */
  private val spanDupCtes = {
    val W = DupSpanWidth
    val gram = (1 to W).map(k => s"t[CAST(i AS INTEGER)+$k]").mkString(" || ' ' || ")
    s"""WITH tk AS (SELECT doc_id, lang,
      |              regexp_split_to_array(trim(text), '\\s+') t FROM documents),
      |b AS (SELECT doc_id, lang, t, CAST(len(t) AS BIGINT) n FROM tk),
      |d2 AS (SELECT doc_id, list_transform(range(len(t) - ${W - 1}),
      |         i -> md5($gram)) sh
      |       FROM tk WHERE len(t) >= $W),
      |e AS (SELECT doc_id, CAST(unnest(range(len(sh))) AS BIGINT) pos,
      |        unnest(sh) h FROM d2),
      |ok AS (SELECT doc_id, pos, h, doc_id * 1000000000 + pos AS k FROM e),
      |fo AS (SELECT h, MIN(k) AS fk FROM ok GROUP BY h),
      |dup AS (SELECT o.doc_id, o.pos FROM ok o JOIN fo f USING (h)
      |        WHERE o.k <> f.fk)""".stripMargin
  }

  /** Gaps-and-islands over the shared `dup` frame, ending in
    * `sp (doc_id, island, a, b)` — a new island starts when the
    * sorted-start gap exceeds the gram width, identical to the engine's
    * fold (merged end = last start + W for sorted starts, so "p ≤ merged
    * end" ⟺ "p − prev ≤ W"). Shared by the q113 histogram twin and the
    * q116 threshold-strip twin. */
  private val spanIslandCtes = {
    val W = DupSpanWidth
    s"""lg AS (SELECT doc_id, pos,
      |         lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) pp
      |       FROM dup),
      |isl AS (SELECT doc_id, pos,
      |          SUM(CASE WHEN pp IS NULL OR pos - pp > $W THEN 1 ELSE 0 END)
      |            OVER (PARTITION BY doc_id ORDER BY pos
      |                  ROWS UNBOUNDED PRECEDING) island
      |        FROM lg),
      |sp AS (SELECT doc_id, island, MIN(pos) a, MAX(pos) + $W b
      |       FROM isl GROUP BY 1, 2)""".stripMargin
  }

  private val shingleCte =
    """WITH toks AS (SELECT doc_id, lang, text, string_split(lower(text), ' ') t FROM documents),
      |d AS (SELECT doc_id,
      |        list_distinct(list_transform(range(len(t)-2),
      |          i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) sh
      |      FROM toks WHERE len(t) >= 3)""".stripMargin

  /** The q36 pipeline's CTE chain up to `v` (verified candidate pairs
    * with i, j, shared, na, nb) — shared by the q36 oracle itself and the
    * component-level consumers (q62, q65) that build a recursive closure
    * on top of the same pair list. */
  private val q36JaccardCond =
    "CAST(shared AS DOUBLE) / (na + nb - shared) >= 0.5"

  /** DuckDB twin of [[graft.util.Buckets.mod1000]] over an id column:
    * first 8 hex chars of md5(id-as-string) as an integer, mod 1000. */
  private def sqlBucket(c: String) =
    s"list_reduce(list_transform(range(8), ii -> CAST(strpos('0123456789abcdef', substr(md5(CAST($c AS VARCHAR)), CAST(ii AS INTEGER)+1, 1)) AS BIGINT) - 1), (a,b) -> a*16 + b) % 1000"

  private val q36OracleCtes = {
    val hexInt = (off: Int) =>
      s"list_reduce(list_transform(range(12), ii -> CAST(strpos('0123456789abcdef', substr(m, CAST(ii AS INTEGER)+$off, 1)) AS BIGINT) - 1), (a,b) -> a*16 + b)"
    val sigCols = (0 until 16)
      .map(i => s"min((h1 + $i * h2) % $MinHashP) s$i").mkString(", ")
    val bandRows = (0 until 4).map { b =>
      val parts = (0 until 4).map(r => s"CAST(s${b * 4 + r} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, md5($parts) bkey FROM sig"
    }.mkString(" UNION ALL ")
    s"""$shingleCte,
      |e AS (SELECT doc_id, md5(unnest(sh)) m FROM d),
      |h AS (SELECT doc_id, ${hexInt(1)} h1, ${hexInt(13)} h2 FROM e),
      |sig AS (SELECT doc_id, $sigCols FROM h GROUP BY doc_id),
      |bands AS ($bandRows),
      |cand AS (SELECT DISTINCT a.doc_id i, b.doc_id j
      |         FROM bands a JOIN bands b
      |         ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
      |v AS (SELECT c.i, c.j,
      |        CAST(len(list_intersect(da.sh, db.sh)) AS BIGINT) shared,
      |        CAST(len(da.sh) AS BIGINT) na, CAST(len(db.sh) AS BIGINT) nb
      |      FROM cand c
      |      JOIN d da ON da.doc_id = c.i
      |      JOIN d db ON db.doc_id = c.j)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q34_exact_dedup" ->
      """WITH all_rows AS (
        |  SELECT doc_id, lang, md5(text) h FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, lang, md5(text) FROM documents),
        |per_hash AS (
        |  SELECT h, min(doc_id) canonical_id, COUNT(*) n_copies, min(lang) lang
        |  FROM all_rows GROUP BY h)
        |SELECT lang, COUNT(*) AS n_unique, CAST(SUM(n_copies) AS BIGINT) AS n_rows
        |FROM per_hash GROUP BY lang ORDER BY lang""".stripMargin,
    "q85_bow_dedup" ->
      """WITH a AS (
        |  SELECT doc_id, lang, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, lang,
        |    CASE WHEN doc_id % 2 = 0
        |      THEN array_to_string(list_reverse(string_split(text, ' ')), ' ')
        |      ELSE text END
        |  FROM documents)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_exact_unique,
        |  CAST(COUNT(DISTINCT md5(array_to_string(
        |    list_sort(string_split(text, ' ')), ' '))) AS BIGINT) AS n_bow_unique,
        |  CAST(COUNT(DISTINCT md5(text)) - COUNT(DISTINCT md5(array_to_string(
        |    list_sort(string_split(text, ' ')), ' '))) AS BIGINT) AS bow_only_catch
        |FROM a GROUP BY lang ORDER BY lang""".stripMargin,
    "q35_ngram_jaccard" ->
      s"""$shingleCte,
        |e AS (SELECT doc_id, unnest(sh) s FROM d),
        |n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) n FROM e GROUP BY doc_id),
        |rare AS (SELECT s FROM e GROUP BY s HAVING COUNT(*) <= $MaxShingleDf),
        |er AS (SELECT e.doc_id, e.s FROM e JOIN rare USING (s)),
        |p AS (SELECT a.doc_id i, b.doc_id j, COUNT(*) shared
        |      FROM er a JOIN er b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT i, j, CAST(shared AS BIGINT) AS shared, na.n AS na, nb.n AS nb,
        |  CAST(shared AS DOUBLE) / (na.n + nb.n - shared) AS jaccard_lb
        |FROM p JOIN n na ON na.doc_id = p.i JOIN n nb ON nb.doc_id = p.j
        |WHERE CAST(shared AS DOUBLE) / (na.n + nb.n - shared) >= 0.5
        |ORDER BY i, j""".stripMargin,
    "q89_containment" ->
      s"""$shingleCte,
        |e AS (SELECT doc_id, unnest(sh) s FROM d),
        |n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) n FROM e GROUP BY doc_id),
        |rare AS (SELECT s FROM e GROUP BY s HAVING COUNT(*) <= $MaxShingleDf),
        |er AS (SELECT e.doc_id, e.s FROM e JOIN rare USING (s)),
        |p AS (SELECT a.doc_id i, b.doc_id j, COUNT(*) shared
        |      FROM er a JOIN er b ON a.s = b.s AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2)
        |SELECT i, j, CAST(shared AS BIGINT) AS shared, na.n AS na, nb.n AS nb,
        |  CAST(shared AS DOUBLE) / least(na.n, nb.n) AS containment_lb,
        |  CASE WHEN na.n <= nb.n THEN i ELSE j END AS contained,
        |  CASE WHEN na.n <= nb.n THEN j ELSE i END AS container
        |FROM p JOIN n na ON na.doc_id = p.i JOIN n nb ON nb.doc_id = p.j
        |WHERE CAST(shared AS DOUBLE) / least(na.n, nb.n) >= 0.9
        |ORDER BY i, j""".stripMargin,
    "q36_minhash_lsh" ->
      s"""$q36OracleCtes
        |SELECT i, j, shared, na, nb,
        |  CAST(shared AS DOUBLE) / (na + nb - shared) AS jaccard
        |FROM v
        |WHERE $q36JaccardCond
        |ORDER BY i, j""".stripMargin,
    "q60_decontam" -> {
      val sh = (1 to DecontamWidth).map(k => s"t[i+$k]").mkString(" || ' ' || ")
      s"""WITH b AS (SELECT doc_id, lang, text, ${sqlBucket("doc_id")} AS bucket FROM documents),
        |toks AS (SELECT doc_id, lang, bucket, string_split(lower(text), ' ') t FROM b),
        |d AS (SELECT doc_id, lang, bucket,
        |        list_distinct(list_transform(range(len(t)-${DecontamWidth - 1}),
        |          i -> $sh)) sh
        |      FROM toks WHERE len(t) >= $DecontamWidth),
        |e AS (SELECT doc_id, lang, bucket, unnest(sh) s FROM d),
        |evs AS (SELECT DISTINCT s FROM e WHERE bucket < 100),
        |hits AS (SELECT DISTINCT e.doc_id FROM e JOIN evs USING (s)
        |         WHERE bucket >= 100)
        |SELECT lang, COUNT(*) AS n_train,
        |  CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_contaminated,
        |  CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS contam_frac
        |FROM b LEFT JOIN hits h ON h.doc_id = b.doc_id
        |WHERE b.bucket >= 100
        |GROUP BY lang ORDER BY lang""".stripMargin
    },
    "q101_bloom_decontam" -> {
      // q60's exact twin (the sketch only shrinks the join INPUT) plus
      // the literal bloom invariant the q19/q83 pattern predicts
      val sh = (1 to DecontamWidth).map(k => s"t[i+$k]").mkString(" || ' ' || ")
      s"""WITH b AS (SELECT doc_id, lang, text, ${sqlBucket("doc_id")} AS bucket FROM documents),
        |toks AS (SELECT doc_id, lang, bucket, string_split(lower(text), ' ') t FROM b),
        |d AS (SELECT doc_id, lang, bucket,
        |        list_distinct(list_transform(range(len(t)-${DecontamWidth - 1}),
        |          i -> $sh)) sh
        |      FROM toks WHERE len(t) >= $DecontamWidth),
        |e AS (SELECT doc_id, lang, bucket, unnest(sh) s FROM d),
        |evs AS (SELECT DISTINCT s FROM e WHERE bucket < 100),
        |hits AS (SELECT DISTINCT e.doc_id FROM e JOIN evs USING (s)
        |         WHERE bucket >= 100)
        |SELECT lang, COUNT(*) AS n_train,
        |  CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_contaminated,
        |  CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*) AS contam_frac,
        |  TRUE AS bloom_fp_le_5pct
        |FROM b LEFT JOIN hits h ON h.doc_id = b.doc_id
        |WHERE b.bucket >= 100
        |GROUP BY lang ORDER BY lang""".stripMargin
    },
    "q127_norm_decontam" -> {
      // both arms replayed with md5'd grams (the q120 convention); the
      // normalization chain is the SAME two regex patterns the engine
      // applies — punctuation to SPACE (tokens never merge), collapse,
      // trim
      val W = DecontamWidth
      val sh = (1 to W).map(k => s"t[i+$k]").mkString(" || ' ' || ")
      val norm = "trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^\\p{L}\\p{N} ]', ' ', 'g'), ' +', ' ', 'g'))"
      s"""WITH b AS (SELECT doc_id, lang, text, ${sqlBucket("doc_id")} AS bucket FROM documents),
        |nt AS (SELECT doc_id, bucket, 0 AS arm,
        |         string_split(lower(text), ' ') t FROM b
        |       UNION ALL
        |       SELECT doc_id, bucket, 1 AS arm,
        |         string_split($norm, ' ') t FROM b),
        |d AS (SELECT doc_id, bucket, arm,
        |        list_distinct(list_transform(range(len(t)-${W - 1}),
        |          i -> md5($sh))) sh
        |      FROM nt WHERE len(t) >= $W),
        |e AS (SELECT doc_id, bucket, arm, unnest(sh) h FROM d),
        |evs AS (SELECT DISTINCT arm, h FROM e WHERE bucket < 100),
        |hits AS (SELECT DISTINCT arm, e.doc_id FROM e
        |         JOIN evs USING (arm, h) WHERE bucket >= 100),
        |hr AS (SELECT doc_id FROM hits WHERE arm = 0),
        |hn AS (SELECT doc_id FROM hits WHERE arm = 1)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_train,
        |  CAST(SUM(CASE WHEN hr.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_contam_raw,
        |  CAST(SUM(CASE WHEN hn.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_contam_norm,
        |  CAST(SUM(CASE WHEN hn.doc_id IS NOT NULL AND hr.doc_id IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_norm_only
        |FROM b LEFT JOIN hr ON hr.doc_id = b.doc_id
        |  LEFT JOIN hn ON hn.doc_id = b.doc_id
        |WHERE b.bucket >= 100
        |GROUP BY lang ORDER BY lang""".stripMargin
    },
    "q120_eval_overlap" -> {
      // replays md5-hashed grams (not raw strings) so a hash collision —
      // however unlikely — would be shared, not a silent divergence
      val sh = (1 to DecontamWidth).map(k => s"t[i+$k]").mkString(" || ' ' || ")
      s"""WITH b AS (SELECT doc_id, lang, text, ${sqlBucket("doc_id")} AS bucket FROM documents),
        |toks AS (SELECT doc_id, bucket, string_split(lower(text), ' ') t FROM b),
        |d AS (SELECT doc_id, bucket,
        |        list_distinct(list_transform(range(len(t)-${DecontamWidth - 1}),
        |          i -> md5($sh))) sh
        |      FROM toks WHERE len(t) >= $DecontamWidth),
        |e AS (SELECT doc_id, bucket, unnest(sh) h FROM d),
        |tr AS (SELECT DISTINCT h FROM e WHERE bucket >= 100),
        |per AS (SELECT e.doc_id,
        |          CAST(COUNT(*) AS BIGINT) AS n_grams,
        |          CAST(SUM(CASE WHEN tr.h IS NOT NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_overlap
        |        FROM e LEFT JOIN tr USING (h)
        |        WHERE e.bucket < 100 GROUP BY e.doc_id)
        |SELECT b.doc_id, b.lang,
        |  COALESCE(per.n_grams, 0) AS n_grams,
        |  COALESCE(per.n_overlap, 0) AS n_overlap,
        |  CASE WHEN COALESCE(per.n_grams, 0) = 0 THEN 0
        |    ELSE (1000 * per.n_overlap) // per.n_grams END AS overlap_pm
        |FROM b LEFT JOIN per USING (doc_id)
        |WHERE b.bucket < 100
        |ORDER BY doc_id""".stripMargin
    },
    "q121_winnowing" -> {
      // replays the winnowing selection over the SAME md5 gram hashes:
      // per doc, min hash of each W-wide window over the gram sequence
      // (one window covering everything when a doc has < W grams), set
      // semantics, then q89's df-capped pair join
      val sh = (1 to WinnowK).map(k => s"t[i+$k]").mkString(" || ' ' || ")
      s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') t FROM documents),
        |g AS (SELECT doc_id,
        |        list_transform(range(len(t) - ${WinnowK - 1}), i -> md5($sh)) gh
        |      FROM toks WHERE len(t) >= $WinnowK),
        |f AS (SELECT doc_id,
        |        list_distinct(CASE WHEN len(gh) < $WinnowW THEN [list_min(gh)]
        |          ELSE list_transform(range(len(gh) - ${WinnowW - 1}),
        |            i -> list_min(gh[i+1:i+$WinnowW])) END) fps
        |      FROM g),
        |e AS (SELECT doc_id, unnest(fps) fp FROM f),
        |nd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) n FROM e GROUP BY doc_id),
        |rare AS (SELECT fp FROM e GROUP BY fp HAVING COUNT(*) <= $MaxShingleDf),
        |er AS (SELECT e.doc_id, e.fp FROM e JOIN rare USING (fp)),
        |p AS (SELECT a.doc_id i, b.doc_id j, CAST(COUNT(*) AS BIGINT) shared
        |      FROM er a JOIN er b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |      GROUP BY 1, 2 HAVING COUNT(*) >= $WinnowMinShared)
        |SELECT p.i, p.j, p.shared, na.n AS na, nb.n AS nb,
        |  (1000 * p.shared) // (na.n + nb.n - p.shared) AS sim_pm
        |FROM p JOIN nd na ON na.doc_id = p.i JOIN nd nb ON nb.doc_id = p.j
        |ORDER BY i, j""".stripMargin
    },
    "q62_cluster_sizes" ->
      s"""$q36OracleCtes,
        |p AS (SELECT i, j FROM v WHERE $q36JaccardCond),
        |ed AS (SELECT i, j FROM p UNION ALL SELECT j, i FROM p),
        |reach AS (
        |  WITH RECURSIVE r(id, lbl) AS (
        |    SELECT DISTINCT i, i FROM ed
        |    UNION
        |    SELECT ed.i, r.lbl FROM ed JOIN r ON r.id = ed.j)
        |  SELECT id, MIN(lbl) lbl FROM r GROUP BY id),
        |cs AS (SELECT lbl, COUNT(*) cluster_size FROM reach GROUP BY lbl)
        |SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
        |  COUNT(*) AS n_clusters,
        |  CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
        |FROM cs GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,
    "q77_split_leakage" ->
      s"""$q36OracleCtes,
        |p AS (SELECT i, j FROM v WHERE $q36JaccardCond),
        |ed AS (SELECT i, j FROM p UNION ALL SELECT j, i FROM p),
        |reach AS (
        |  WITH RECURSIVE r(id, lbl) AS (
        |    SELECT DISTINCT i, i FROM ed
        |    UNION
        |    SELECT ed.i, r.lbl FROM ed JOIN r ON r.id = ed.j)
        |  SELECT id, MIN(lbl) lbl FROM r GROUP BY id),
        |sp AS (SELECT lbl, CASE WHEN ${sqlBucket("id")} < 980 THEN 'train'
        |                        WHEN ${sqlBucket("id")} < 990 THEN 'val'
        |                        ELSE 'test' END split
        |       FROM reach),
        |cl AS (SELECT lbl, COUNT(DISTINCT split) splits_spanned, COUNT(*) sz
        |       FROM sp GROUP BY lbl)
        |SELECT CAST(splits_spanned AS BIGINT) AS splits_spanned,
        |  COUNT(*) AS n_clusters, CAST(SUM(sz) AS BIGINT) AS n_docs
        |FROM cl GROUP BY 1 ORDER BY 1""".stripMargin,
    "q65_keep_best" ->
      s"""$q36OracleCtes,
        |p AS (SELECT i, j FROM v WHERE $q36JaccardCond),
        |ed AS (SELECT i, j FROM p UNION ALL SELECT j, i FROM p),
        |reach AS (
        |  WITH RECURSIVE r(id, lbl) AS (
        |    SELECT DISTINCT i, i FROM ed
        |    UNION
        |    SELECT ed.i, r.lbl FROM ed JOIN r ON r.id = ed.j)
        |  SELECT id, MIN(lbl) lbl FROM r GROUP BY id),
        |m AS (SELECT reach.lbl, reach.id, dd.n_chars,
        |        ROW_NUMBER() OVER (PARTITION BY reach.lbl
        |          ORDER BY dd.n_chars DESC, reach.id ASC) rk,
        |        COUNT(*) OVER (PARTITION BY reach.lbl) sz
        |      FROM reach JOIN documents dd ON dd.doc_id = reach.id)
        |SELECT lbl AS cluster_rep, CAST(sz AS BIGINT) AS cluster_size,
        |  id AS keep_id, n_chars AS keep_n_chars,
        |  CAST(sz - 1 AS BIGINT) AS n_dropped
        |FROM m WHERE rk = 1 ORDER BY cluster_rep""".stripMargin,
    "q128_door_divergence" ->
      // both decision rules over the uncollapsed corpus — equivalent to
      // the engine's staged (collapse-first) formulation because an
      // exact twin shares every bucket with its canonical (identical
      // signature) and never out-ranks it in the keeper window
      // (identical n_chars, larger id), so bucket owners and component
      // keepers are canonicals in both formulations
      s"""$q36OracleCtes,
        |reps AS (SELECT md5(text) th, MIN(doc_id) rep FROM documents GROUP BY 1),
        |rp AS (SELECT doc_id, rep FROM documents dd
        |       JOIN reps ON md5(dd.text) = th),
        |own AS (SELECT band, bkey, MIN(doc_id) ownr FROM bands GROUP BY 1, 2),
        |dc AS (SELECT DISTINCT b.doc_id FROM bands b
        |       JOIN own USING (band, bkey) WHERE b.doc_id <> ownr),
        |door_drop AS (SELECT doc_id FROM rp WHERE doc_id <> rep
        |              UNION SELECT doc_id FROM dc),
        |p AS (SELECT i, j FROM v WHERE $q36JaccardCond),
        |ed AS (SELECT i, j FROM p UNION ALL SELECT j, i FROM p),
        |reach AS (
        |  WITH RECURSIVE r(id, lbl) AS (
        |    SELECT DISTINCT i, i FROM ed
        |    UNION
        |    SELECT ed.i, r.lbl FROM ed JOIN r ON r.id = ed.j)
        |  SELECT id, MIN(lbl) lbl FROM r GROUP BY id),
        |m AS (SELECT reach.id, ROW_NUMBER() OVER (PARTITION BY reach.lbl
        |        ORDER BY dd.n_chars DESC, reach.id ASC) rk
        |      FROM reach JOIN documents dd ON dd.doc_id = reach.id),
        |batch_drop AS (SELECT doc_id FROM rp WHERE doc_id <> rep
        |               UNION SELECT id FROM m WHERE rk <> 1),
        |fl AS (SELECT d.doc_id,
        |         CASE WHEN dd.doc_id IS NOT NULL THEN 1 ELSE 0 END door,
        |         CASE WHEN bd.doc_id IS NOT NULL THEN 1 ELSE 0 END batch
        |       FROM documents d
        |       LEFT JOIN door_drop dd ON dd.doc_id = d.doc_id
        |       LEFT JOIN batch_drop bd ON bd.doc_id = d.doc_id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COALESCE(SUM(door), 0) AS BIGINT) AS n_door_dropped,
        |  CAST(COALESCE(SUM(batch), 0) AS BIGINT) AS n_batch_dropped,
        |  CAST(COALESCE(SUM(door * batch), 0) AS BIGINT) AS n_both_dropped,
        |  CAST(COALESCE(SUM(door * (1 - batch)), 0) AS BIGINT) AS n_door_only,
        |  CAST(COALESCE(SUM((1 - door) * batch), 0) AS BIGINT) AS n_batch_only,
        |  CASE WHEN COUNT(*) = 0 THEN CAST(0 AS BIGINT)
        |    ELSE CAST(1000 * (COALESCE(SUM(door * (1 - batch)), 0)
        |      + COALESCE(SUM((1 - door) * batch), 0))
        |      AS BIGINT) // COUNT(*) END AS divergence_permille
        |FROM fl""".stripMargin,
    "q56_incremental_dedup" ->
      """WITH d AS (SELECT doc_id, lang, md5(text) h FROM documents),
        |existing AS (SELECT DISTINCT h FROM d WHERE doc_id < 250),
        |incoming AS (SELECT * FROM d WHERE doc_id >= 250),
        |fb AS (SELECT h, min(doc_id) first_id FROM incoming GROUP BY h)
        |SELECT i.lang,
        |  CASE WHEN e.h IS NOT NULL THEN 'dup_existing'
        |       WHEN i.doc_id <> fb.first_id THEN 'dup_batch'
        |       ELSE 'novel' END AS class,
        |  COUNT(*) AS n
        |FROM incoming i
        |LEFT JOIN existing e ON e.h = i.h
        |JOIN fb ON fb.h = i.h
        |GROUP BY 1, 2 ORDER BY lang, class""".stripMargin,
    "q49_minhash_estimate" -> {
      val hexInt = (off: Int) =>
        s"list_reduce(list_transform(range(12), ii -> CAST(strpos('0123456789abcdef', substr(m, CAST(ii AS INTEGER)+$off, 1)) AS BIGINT) - 1), (a,b) -> a*16 + b)"
      val sigCols = (0 until 16)
        .map(i => s"min((h1 + $i * h2) % $MinHashP) s$i").mkString(", ")
      val bandRows = (0 until 4).map { b =>
        val parts = (0 until 4).map(r => s"CAST(s${b * 4 + r} AS VARCHAR)")
          .mkString(" || ',' || ")
        s"SELECT doc_id, $b AS band, md5($parts) bkey FROM sig"
      }.mkString(" UNION ALL ")
      val nMatch = (0 until 16)
        .map(k => s"(CASE WHEN sa.s$k = sb.s$k THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH reps AS (SELECT min(doc_id) doc_id, text
        |              FROM documents GROUP BY md5(text), text),
        |toks AS (SELECT doc_id, string_split(lower(text), ' ') t FROM reps),
        |d AS (SELECT doc_id,
        |        list_distinct(list_transform(range(len(t)-2),
        |          i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])) sh
        |      FROM toks WHERE len(t) >= 3),
        |e AS (SELECT doc_id, md5(unnest(sh)) m FROM d),
        |h AS (SELECT doc_id, ${hexInt(1)} h1, ${hexInt(13)} h2 FROM e),
        |sig AS (SELECT doc_id, $sigCols FROM h GROUP BY doc_id),
        |bands AS ($bandRows),
        |cand AS (SELECT DISTINCT a.doc_id i, b.doc_id j
        |         FROM bands a JOIN bands b
        |         ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
        |SELECT c.i, c.j, CAST($nMatch AS BIGINT) AS n_match,
        |  CAST($nMatch AS DOUBLE) / 16.0 AS est_jaccard
        |FROM cand c JOIN sig sa ON sa.doc_id = c.i JOIN sig sb ON sb.doc_id = c.j
        |ORDER BY i, j""".stripMargin
    },
    "q37_simhash" -> {
      // 60-bit per-shingle hash = first 15 hex md5 chars (the conv()
      // twin of the Spark side); majority bit-votes via a 60-row lateral
      // range join; identical banding/hamming arithmetic — fully
      // deterministic, so the check is hash-exact like q36's
      val hexInt15 =
        "list_reduce(list_transform(range(15), ii -> CAST(strpos('0123456789abcdef', substr(m, CAST(ii AS INTEGER)+1, 1)) AS BIGINT) - 1), (a,b) -> a*16 + b)"
      val bandRows = (0 until 4).map(b =>
        s"SELECT doc_id, $b AS band, (simhash >> ${b * 15}) & 32767 AS bkey, simhash FROM sim")
        .mkString(" UNION ALL ")
      s"""$shingleCte,
        |e AS (SELECT doc_id, md5(unnest(sh)) m FROM d),
        |h AS (SELECT doc_id, $hexInt15 h FROM e),
        |bits AS (SELECT doc_id, r.b, SUM((h >> CAST(r.b AS INTEGER)) & 1) cb,
        |           COUNT(*) cnt
        |         FROM h, range(60) AS r(b) GROUP BY doc_id, r.b),
        |sim AS (SELECT doc_id,
        |          CAST(SUM(CASE WHEN cb * 2 > cnt
        |            THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END)
        |            AS BIGINT) simhash
        |        FROM bits GROUP BY doc_id),
        |bands AS ($bandRows),
        |p AS (SELECT DISTINCT a.doc_id i, b.doc_id j, a.simhash ha, b.simhash hb
        |      FROM bands a JOIN bands b
        |      ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
        |SELECT i, j, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
        |FROM p WHERE bit_count(xor(ha, hb)) <= 10
        |ORDER BY i, j""".stripMargin
    },
    "q97_dup_spans" -> {
      val gram = (1 to DupSpanWidth).map(k => s"t[i+$k]").mkString(" || ' ' || ")
      s"""WITH toks AS (SELECT doc_id, lang, string_split(lower(text), ' ') t FROM documents),
        |base AS (SELECT doc_id, lang,
        |           greatest(len(t) - ${DupSpanWidth - 1}, 0) g FROM toks),
        |d2 AS (SELECT doc_id, list_transform(range(len(t) - ${DupSpanWidth - 1}),
        |         i -> md5($gram)) sh
        |       FROM toks WHERE len(t) >= $DupSpanWidth),
        |e AS (SELECT doc_id, unnest(sh) h FROM d2),
        |occ AS (SELECT doc_id, h, COUNT(*) k FROM e GROUP BY 1, 2),
        |dup AS (SELECT h FROM occ GROUP BY h HAVING CAST(SUM(k) AS BIGINT) >= 2),
        |dpd AS (SELECT occ.doc_id, CAST(SUM(k) AS BIGINT) nd
        |        FROM occ JOIN dup USING (h) GROUP BY occ.doc_id),
        |agg AS (SELECT lang, COUNT(*) n_docs,
        |          CAST(SUM(CASE WHEN g > 0 THEN 1 ELSE 0 END) AS BIGINT) n_spanned_docs,
        |          CAST(SUM(g) AS BIGINT) n_grams,
        |          CAST(SUM(COALESCE(nd, 0)) AS BIGINT) n_dup
        |        FROM base LEFT JOIN dpd USING (doc_id) GROUP BY lang)
        |SELECT lang, n_docs, n_spanned_docs, n_grams, n_dup,
        |  CASE WHEN n_grams = 0 THEN 0.0
        |       ELSE CAST(n_dup AS DOUBLE) / CAST(n_grams AS DOUBLE) END AS dup_frac
        |FROM agg ORDER BY lang""".stripMargin
    },
    "q99_span_strip" -> {
      val W = DupSpanWidth
      s"""$spanDupCtes,
        |st AS (SELECT doc_id, list_sort(list(pos)) AS sts FROM dup GROUP BY doc_id),
        |j AS (SELECT b.doc_id, b.lang, b.t, b.n,
        |        COALESCE(s.sts, CAST([] AS BIGINT[])) AS sts
        |      FROM b LEFT JOIN st s USING (doc_id)),
        |k2 AS (SELECT doc_id, lang, n, t,
        |        list_filter(range(n),
        |          p -> len(list_filter(sts, q -> p >= q AND p < q + $W)) = 0) AS keep
        |       FROM j)
        |SELECT doc_id, lang, n AS n_tok,
        |  CAST(n - len(keep) AS BIGINT) AS n_removed,
        |  CAST(len(keep) AS DOUBLE) / CAST(n AS DOUBLE) AS kept_frac,
        |  md5(COALESCE(array_to_string(list_transform(keep,
        |    p -> t[CAST(p AS INTEGER) + 1]), ' '), '')) AS stripped_md5
        |FROM k2 ORDER BY doc_id""".stripMargin
    },
    "q113_max_spans" ->
      s"""$spanDupCtes,
        |$spanIslandCtes,
        |sl AS (SELECT doc_id, b - a AS span_len FROM sp)
        |SELECT tk.lang, sl.span_len, COUNT(*) AS n_spans,
        |  COUNT(DISTINCT sl.doc_id) AS n_docs,
        |  CAST(SUM(sl.span_len) AS BIGINT) AS covered_tokens
        |FROM sl JOIN tk USING (doc_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q116_long_span_strip" ->
      // the q113 islands filtered to length ≥ MinStripSpan, then the q99
      // rebuild driven by interval containment instead of start coverage
      s"""$spanDupCtes,
        |$spanIslandCtes,
        |lsp AS (SELECT doc_id, a, b FROM sp WHERE b - a >= $MinStripSpan),
        |ivs AS (SELECT doc_id, list_sort(list({'a': a, 'b': b})) AS iv
        |        FROM lsp GROUP BY doc_id),
        |j AS (SELECT b.doc_id, b.lang, b.t, b.n,
        |        COALESCE(s.iv, CAST([] AS STRUCT(a BIGINT, b BIGINT)[])) AS iv
        |      FROM b LEFT JOIN ivs s USING (doc_id)),
        |k2 AS (SELECT doc_id, lang, n, t,
        |        list_filter(range(n),
        |          p -> len(list_filter(iv, v -> p >= v.a AND p < v.b)) = 0) AS keep
        |       FROM j)
        |SELECT doc_id, lang, n AS n_tok,
        |  CAST(n - len(keep) AS BIGINT) AS n_removed,
        |  CAST(len(keep) AS DOUBLE) / CAST(n AS DOUBLE) AS kept_frac,
        |  md5(COALESCE(array_to_string(list_transform(keep,
        |    p -> t[CAST(p AS INTEGER) + 1]), ' '), '')) AS stripped_md5
        |FROM k2 ORDER BY doc_id""".stripMargin,
  )
}
