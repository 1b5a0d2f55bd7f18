package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** Cross-checks between the dedup family members — relationships the
  * per-query oracles cannot express (they compare one query at a time). */
class DedupSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  test("q36 (MinHash LSH) finds a subset of q35 (exact Jaccard) pairs") {
    val exact = Dedup.q35NgramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val lsh = Dedup.q36MinHashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(lsh.nonEmpty, "LSH found no pairs at all")
    lsh.foreach { p =>
      assert(exact.contains(p), s"LSH pair $p not in exact pairs")
    }
  }

  test("q45 (grid-blocked) equals q43 (brute force) exactly") {
    val brute = Similarity.q43EmbeddingDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val blocked = Similarity.q45EmbeddingDedupBlocked(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(blocked == brute,
      s"blocked=${blocked.take(5)}... brute=${brute.take(5)}...")
  }

  /** Round-2 verdict #2: a mega-cluster of identical docs (the thing dedup
    * exists to find) must not turn one LSH band bucket into a k²/2-pair hot
    * key. The collapse-before-banding + membership-expansion design keeps
    * the candidate join at ONE representative while still emitting every
    * one of the C(1000,2) output pairs. */
  test("q36 survives a planted 1000-identical-doc cluster in bounded time") {
    import spark.implicits._
    val cluster = (1L to 1000L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val others = Seq((2000L, a), (2001L, a), (3000L, a + " omega"))
    val df = (cluster ++ others).toDF("doc_id", "text")
    val rows = Dedup.minHashLshPairs(df).collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    // intra-cluster: all C(1000,2) pairs, jaccard exactly 1.0
    assert(pairs.count(p => p._1 <= 1000 && p._2 <= 1000) == 499500)
    rows.filter(r => r.getLong(1) <= 1000).foreach { r =>
      assert(r.getLong(2) == r.getLong(3) && r.getLong(3) == r.getLong(4))
      assert(r.getDouble(5) == 1.0)
    }
    // cross pairs inherit the representative pair's verified counts:
    // (2000,3000) and (2001,3000) must agree with each other
    val cross = rows.filter(r => r.getLong(0) >= 2000 && r.getLong(1) == 3000)
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(cross.length == 2 && cross.distinct.length == 1, cross.toSeq)
    assert(pairs.contains((2000L, 2001L))) // intra pair of the small group

    // q37 has the same hazard and the same defense: the cluster's pairs
    // all come back hamming-0 via expansion, not a quadratic band bucket
    val sim = Dedup.simHashPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(sim.count(p => p._1 <= 1000 && p._2 <= 1000 && p._3 == 0) == 499500)
  }

  test("q36 bucket cap drops fat buckets but never exact-dup groups") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq((1L, a), (2L, a), (3L, a + " extra")).toDF("doc_id", "text")
    val uncapped = Dedup.minHashLshPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // cap 0 drops every bucket: near-dup (distinct-text) pairs are lost,
    // exact-dup pairs survive via the collapse path, cap-independent
    val capped = Dedup.minHashLshPairs(df, bucketCap = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)))
  }

  /** ADVICE r2: a component with diameter > maxRounds used to silently
    * split. Pointer jumping must converge a 100-node chain in O(log n)
    * rounds, and a genuine non-convergence must throw, not mislabel. */
  test("q47 label propagation: 100-node chain converges in < 10 rounds") {
    import spark.implicits._
    val chain = (0L until 99L).map(i => (i, i + 1)).toDF("i", "j")
    // VERDICT r3 #8: capture the per-round telemetry lines the default
    // hook sends to the logger — rounds-to-converge must be visible from
    // the log, not discovered post-mortem
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    // driverMaxEdges = 0 forces the distributed path (a 99-edge graph
    // takes the driver union-find short-circuit by default)
    val (labels, rounds) = Similarity.labelPropagate(chain,
      onRound = (r, m, e) => lines += Similarity.renderRound(r, m, e),
      driverMaxEdges = 0L)
    assert(rounds < 10, s"took $rounds rounds")
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 100)
    got.foreach { case (id, lbl) => assert(lbl == 0L, s"node $id -> $lbl") }
    // the default (driver union-find) path must produce IDENTICAL labels
    val (dLabels, dRounds) = Similarity.labelPropagate(chain)
    assert(dRounds == 0, "small graph should short-circuit to the driver")
    val dGot = dLabels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dGot.sorted.sameElements(got.sorted))
    assert(lines.size == rounds)
    assert(lines.head == s"labelPropagate round=1 moved=99 edges=198",
      lines.head) // every non-min node moves in round 1; 99 pairs doubled
    assert(lines.last.endsWith("moved=0 edges=198"), lines.last)
    // moved counts are non-increasing on a chain under pointer jumping
    val moved: Seq[Long] =
      lines.toSeq.map(_.split(" ")(2).stripPrefix("moved=").toLong)
    moved.sliding(2).foreach { w => assert(w(1) <= w(0), lines) }
    // a cap too small to converge must throw, never emit split components
    intercept[IllegalStateException] {
      Similarity.labelPropagate(chain, maxRounds = 2, driverMaxEdges = 0L)
    }
  }

  /** The sketch estimate must track the exact verification on the same
    * candidates: every q36-verified pair appears among q49's estimates,
    * and a 16-component minhash estimate stays within 0.25 of the exact
    * Jaccard (measured max deviation on these corpora: 0.0875). */
  test("q49 estimates track q36 exact jaccard on shared candidates") {
    val exact = Dedup.q36MinHashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    val est = Dedup.q49MinhashEstimate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(exact.nonEmpty)
    exact.foreach { case (pair, j) =>
      assert(est.contains(pair), s"verified pair $pair missing from estimates")
      assert(math.abs(est(pair) - j) <= 0.25,
        s"$pair: est ${est(pair)} vs exact $j")
    }
  }

  /** The stateless per-row shingle stats (streaming cleaning path) must
    * agree exactly with the exploded/aggregated formulation (batch q48). */
  test("ShingleStats expression matches the exploded q48 signal") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val exploded = Dedup.shingleRows(spark, dir, distinct = false)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("t"), countDistinct($"s").as("d")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val viaFn = graft.util.Tables(spark, dir, "documents")
      .select($"doc_id", graft.functions.ShingleStats($"text").as("ss"))
      .select($"doc_id", $"ss.n_shingles", $"ss.n_distinct").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(exploded.nonEmpty && viaFn.size >= exploded.size)
    exploded.foreach { case (id, v) => assert(viaFn(id) == v, s"doc $id") }
    // docs the exploded path skips (<3 tokens) must report (0, 0)
    viaFn.filterNot(kv => exploded.contains(kv._1))
      .foreach { case (id, v) => assert(v == ((0L, 0L)), s"doc $id: $v") }
  }

  test("q128 door-vs-batch divergence counts the planted keeper flips") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // docs 1/2: near-dups where the arms DISAGREE by construction — the
    // door keeps the FIRST arrival (1), the batch keeps the LONGEST (2)
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val rows = Seq(
      (1L, base),
      (2L, base + " extra trailing tokens"),
      (3L, "identical twin text payload here"), // exact pair: both drop 4
      (4L, "identical twin text payload here"),
      (5L, "a completely unrelated singleton document body"),
      (6L, "two tokens")) // <3 shingles: no signature, passes both arms
    val d = rows.toDF("doc_id", "text")
      .withColumn("n_chars", length($"text"))
    // precondition: the near-dup pair really is one (verified Jaccard
    // >= 0.5 and a shared band — else the spec tests nothing)
    val pairs = Dedup.minHashLshPairs(d.select($"doc_id", $"text"))
      .select($"i", $"j").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L), (3L, 4L)), pairs.toSeq.toString)
    val got = Dedup.doorKeeperDivergence(d).collect()(0)
    assert(got.getLong(0) == 6L, s"n_docs: $got")
    assert(got.getLong(1) == 2L, s"door drops 2 (collided) + 4 (exact): $got")
    assert(got.getLong(2) == 2L, s"batch drops 1 (short) + 4 (exact): $got")
    assert(got.getLong(3) == 1L, s"both drop only the exact twin 4: $got")
    assert(got.getLong(4) == 1L && got.getLong(5) == 1L,
      s"one false door drop (2), one door leak (1): $got")
    assert(got.getLong(6) == 1000L * 2 / 6, s"divergence permille: $got")
  }

  test("q37 (SimHash) pairs respect the hamming bound and ordering") {
    val rows = Dedup.q37SimHash(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(2) <= 10) // bit_count yields int
    }
  }

  /** md5-bucket twin of the q46/q57/q60 split function, computed in plain
    * JVM code so tests can PLANT documents on a chosen side of the split. */
  private def bucketOf(docId: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(docId.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % 1000
  }

  /** q60: a verbatim 5-gram run copied from an eval doc into a train doc
    * must flag that train doc — and only it. */
  test("q60 flags planted eval-verbatim train docs, nothing else") {
    import spark.implicits._
    val ids = (0L until 200L)
    val evalId = ids.find(bucketOf(_) < 100).get
    val trainIds = ids.filter(bucketOf(_) >= 100).take(3)
    val evalText = "one two three four five six seven eight"
    val rows = Seq(
      (evalId, "en", evalText), // eval side
      (trainIds(0), "en", "prefix words then " + evalText), // contaminated
      (trainIds(1), "en", "alpha beta gamma delta epsilon zeta eta"),
      (trainIds(2), "en", "red green blue cyan magenta yellow black"))
    val out = Dedup.decontamOf(rows.toDF("doc_id", "lang", "text")).collect()
    assert(out.length == 1 && out(0).getString(0) == "en")
    assert(out(0).getLong(1) == 3, "n_train")
    assert(out(0).getLong(2) == 1, "n_contaminated")
  }

  /** q127: the published normalized-decontam recipe must catch the
    * contamination raw matching misses — a punctuation/caps-perturbed
    * copy of an eval phrase — grade a verbatim copy under BOTH arms,
    * leave clean docs alone, and report n_contam_raw ≡ q60's count (the
    * raw arm IS q60's matching, cross-checked on the same corpus). */
  test("q127 catches punctuation/caps-perturbed copies raw matching misses") {
    import spark.implicits._
    val ids = (0L until 300L)
    val evalIds = ids.filter(bucketOf(_) < 100).take(2)
    val trainIds = ids.filter(bucketOf(_) >= 100).take(5)
    val evalText = "one two three four five six seven eight"
    // non-Latin script (review finding r12): the normalization must
    // PRESERVE unicode letters — an ASCII-only class would blind the
    // normalized arm on this pair entirely
    val evalZh = "数据 清洗 管道 质量 过滤 去重 污染 检测"
    val rows = Seq(
      (evalIds(0), "en", evalText), // eval side
      (evalIds(1), "zh", evalZh),   // eval side, CJK
      // verbatim copy: both arms flag it
      (trainIds(0), "en", "prefix words then " + evalText),
      // PERTURBED copy: caps + punctuation — zero shared RAW 5-grams,
      // identical normalized token stream
      (trainIds(1), "en", "lead in tokens One, Two! Three four FIVE: six (seven) eight."),
      (trainIds(2), "en", "alpha beta gamma delta epsilon zeta eta"),
      (trainIds(3), "en", "red green blue cyan magenta yellow black"),
      // punctuation-perturbed CJK copy: raw grams miss it ("数据," ≠
      // "数据"), the normalized arm must catch it
      (trainIds(4), "zh", "前缀 词 数据, 清洗! 管道 质量 过滤: 去重 (污染) 检测。"))
    val df = rows.toDF("doc_id", "lang", "text")
    val out = Dedup.normalizedDecontamOf(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 2)
    val en = out("en")
    assert(en.getLong(1) == 4L, s"n_train: $en")
    assert(en.getLong(2) == 1L, s"n_contam_raw: $en")     // verbatim only
    assert(en.getLong(3) == 2L, s"n_contam_norm: $en")    // + perturbed
    assert(en.getLong(4) == 1L, s"n_norm_only: $en")      // the delta
    val zh = out("zh")
    assert(zh.getLong(1) == 1L && zh.getLong(2) == 0L &&
      zh.getLong(3) == 1L && zh.getLong(4) == 1L,
      s"CJK perturbed copy must be caught by the normalized arm only: $zh")
    // raw arm ≡ q60 on the same corpus, lang for lang
    val q60 = Dedup.decontamOf(df).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(q60 == out.map { case (l, r) => l -> r.getLong(2) })
    // and on the real sf0.001 corpus, lang for lang
    val real = Dedup.normalizedDecontamOf(
        graft.util.Tables(spark, dir, "documents")
          .select($"doc_id", $"lang", $"text"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val real60 = Dedup.decontamOf(
        graft.util.Tables(spark, dir, "documents")
          .select($"doc_id", $"lang", $"text"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(real == real60, s"raw arm diverges from q60: $real vs $real60")
  }

  /** An eval phrase copied into a THOUSAND train docs is the decontam
    * hot-key case (one shingle shared by 1000 train rows). The distinct
    * eval side keeps the join linear — every copy flags, in bounded time. */
  test("q60 flags a 1000-doc verbatim cluster linearly") {
    import spark.implicits._
    val ids = (0L until 3000L)
    val evalId = ids.find(bucketOf(_) < 100).get
    val trainIds = ids.filter(bucketOf(_) >= 100).take(1000)
    val leak = "zero one two three four five six"
    val rows = (evalId, "en", leak) +:
      trainIds.map(id => (id, "en", s"doc $id says " + leak))
    val out = Dedup.decontamOf(rows.toDF("doc_id", "lang", "text")).collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 1000 && out(0).getLong(2) == 1000,
      out(0).toString)
  }

  /** q101 must be q60 EXACTLY (the bloom can only shrink the join
    * input, never the result) with the fp invariant standing — on the
    * planted corpus and on the real sf0.001 tables. */
  test("q101 bloom arm equals q60 exactly, fp invariant true") {
    import spark.implicits._
    val ids = (0L until 200L)
    val evalId = ids.find(bucketOf(_) < 100).get
    val trainIds = ids.filter(bucketOf(_) >= 100).take(3)
    val evalText = "one two three four five six seven eight"
    val rows = Seq(
      (evalId, "en", evalText),
      (trainIds(0), "en", "prefix words then " + evalText),
      (trainIds(1), "en", "alpha beta gamma delta epsilon zeta eta"),
      (trainIds(2), "en", "red green blue cyan magenta yellow black"))
    val df = rows.toDF("doc_id", "lang", "text")
    val exact = Dedup.decontamOf(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val bloom = Dedup.bloomDecontamOf(df).collect()
    assert(bloom.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSeq == exact.toSeq)
    bloom.foreach(r => assert(r.getBoolean(4), r.toString))

    val dir = "/root/testdata/sf0.001"
    val q60 = Dedup.q60Decontam(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val q101 = Dedup.q101BloomDecontam(spark, dir).collect()
    assert(q101.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSeq == q60.toSeq)
    q101.foreach(r => assert(r.getBoolean(4), r.toString))
  }

  /** q120: the graded complement of q60 — per EVAL doc, the fraction of
    * its DISTINCT 5-grams present anywhere in train, exact permille.
    * Plants one fully-copied doc (pm 1000), one quarter-overlap (pm 250),
    * one clean (pm 0), one sub-width doc (0 grams — the text-free arm),
    * and one with a repeated gram (distinctness: 6 occurrences, 5
    * distinct). Only eval docs report, ordered by doc_id. */
  test("q120 grades planted eval docs by exact train-overlap permille") {
    import spark.implicits._
    val ids = (0L until 400L)
    val evalIds = ids.filter(bucketOf(_) < 100).take(5)
    val trainIds = ids.filter(bucketOf(_) >= 100).take(2)
    val full = "one two three four five six seven eight" // 4 grams, all hit
    val part = "one two three four five apple banana cherry" // 1 of 4 hits
    val clean = "red orange purple pink brown teal" // 2 grams, no hits
    val tiny = "tiny wee doc" // < width: 0 grams
    val rep = "pq rs tu vw xy pq rs tu vw xy" // 6 occurrences, 5 distinct
    val rows = Seq(
      (evalIds(0), "en", full), (evalIds(1), "en", part),
      (evalIds(2), "en", clean), (evalIds(3), "en", tiny),
      (evalIds(4), "en", rep),
      (trainIds(0), "en", "prefix words then " + full),
      (trainIds(1), "en", "alpha beta gamma delta epsilon zeta eta"))
    val out = Dedup.evalOverlapOf(rows.toDF("doc_id", "lang", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.keySet == evalIds.toSet, s"eval docs only: ${out.keySet}")
    assert(out(evalIds(0)) == ((4L, 4L, 1000L)), out(evalIds(0)).toString)
    assert(out(evalIds(1)) == ((4L, 1L, 250L)), out(evalIds(1)).toString)
    assert(out(evalIds(2)) == ((2L, 0L, 0L)), out(evalIds(2)).toString)
    assert(out(evalIds(3)) == ((0L, 0L, 0L)), out(evalIds(3)).toString)
    assert(out(evalIds(4))._1 == 5L, out(evalIds(4)).toString)
  }

  /** q121: the winnowing selection (Schleimer–Wilkerson–Aiken / MOSS).
    * Pins: (a) the fingerprint set of hand-sized docs matches a
    * driver-side replay of the K=5/W=4 window-min rule bit-for-bit;
    * (b) a doc with fewer grams than W winnows to the single min over
    * all its grams; (c) sub-K docs have no fingerprints; (d) the
    * t = W+K-1 = 8 guarantee — two docs sharing an 8-token run share at
    * least one fingerprint; (e) the pair report finds a one-token-edit
    * near-dup with exactly the driver-computed (shared, sim_pm). */
  test("q121 winnowing selection, guarantee, and pair report") {
    import spark.implicits._
    def m(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def fpsRef(text: String): Set[String] = {
      val t = text.toLowerCase.split(" ").toVector
      if (t.length < Dedup.WinnowK) Set.empty
      else {
        val gh = t.sliding(Dedup.WinnowK).map(g => m(g.mkString(" "))).toVector
        if (gh.length < Dedup.WinnowW) Set(gh.min)
        else gh.sliding(Dedup.WinnowW).map(_.min).toSet
      }
    }
    val w = (0 until 40).map(i => s"w$i")
    val docA = w.take(20).mkString(" ") // 20 toks, 16 grams, 13 windows
    // shares exactly the 8-token run w0..w7 with docA, nothing else
    val docB = (w.slice(20, 26) ++ w.take(8) ++ w.slice(26, 32)).mkString(" ")
    val docC = w.take(19).mkString(" ") + " zz" // one-token edit of docA
    val docD = "a b c d e f" // 2 grams < W: one window over all grams
    val docE = "x y z"       // sub-K: no grams, no fingerprints
    val rows = Seq((1L, docA), (2L, docB), (3L, docC), (4L, docD), (5L, docE))
      .toDF("doc_id", "text")
    val fps = Dedup.fingerprintRowsOf(rows).collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getString(1)).toSet }
    assert(!fps.contains(5L), fps.toString)
    assert(fps(4L).size == 1 && fps(4L) == fpsRef(docD), fps(4L).toString)
    assert(fps(1L) == fpsRef(docA) && fps(2L) == fpsRef(docB) &&
      fps(3L) == fpsRef(docC))
    // the winnowing guarantee: one shared >= 8-token run => >= 1 common fp
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "8-token shared run produced no common fingerprint")
    val shared13 = (fps(1L) intersect fps(3L)).size.toLong
    assert(shared13 >= Dedup.WinnowMinShared, s"edit-dup shares only $shared13")
    val sim13 = 1000L * shared13 / (fps(1L).size + fps(3L).size - shared13)
    val pairs = Dedup.winnowingPairsOf(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(5))))
      .toMap
    assert(pairs.get((1L, 3L)).contains((shared13, sim13)), pairs.toString)
  }

  /** Spark clamps BloomFilterAggregate at maxNumItems=4M /
    * maxNumBits=67.1M with a silent Math.min — bloomOf must raise the
    * session confs so a >4M-capacity request actually gets its bits
    * (serialized sketch larger than the default ceiling's 8.4 MB
    * bitset), and must refuse past the broadcast-practical hard cap. */
  test("bloomOf lifts Spark's silent sketch clamp; refuses past the cap") {
    import spark.implicits._
    val d = Seq("x").toDF("s")
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val bin = Dedup.bloomOf(d, "s", capacity = 5000000L)
    assert(bin != null && bin.length > 67108864 / 8,
      s"sketch ${bin.length} B — the 67.1M-bit default clamp was not lifted")
    // ADVICE r7: the raise is scoped to the build — after it, the
    // session's effective clamp is back at the engine default, not the
    // 5M the sketch needed (no residue widening Spark's own injected
    // runtime blooms)
    assert(spark.conf.get(itemsKey).toLong == 4000000L &&
      spark.conf.get(bitsKey).toLong == 67108864L,
      "bloomOf left the session bloom-clamp confs raised")
    // a small capacity must never write a value below the engine
    // default (the old getOption comparison did exactly that)
    Dedup.bloomOf(d, "s", capacity = 1000L)
    assert(spark.conf.get(itemsKey).toLong >= 4000000L,
      "small sketch shrank the engine's default bloom clamp")
    intercept[IllegalArgumentException] {
      Dedup.bloomOf(d, "s", capacity = Dedup.BloomMaxItems + 1)
    }
  }

  /** q101 property: on seeded random corpora (small shared vocabulary →
    * heavy cross-split shingle overlap, exercising dense bloom hits)
    * the sketch arm's accounting must equal the exact arm's, every
    * trial, with the fp invariant standing. */
  test("q101 property: bloom arm equals q60 on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(77L)
    for (trial <- 1 to 3) {
      val vocab = Vector("ash", "birch", "cedar", "elm", "fir", "gum",
        "hazel", "ivy", "juniper", "kapok")
      val docs = (0 until 60).map { i =>
        val n = 5 + rnd.nextInt(15)
        (trial * 1000L + i,
          if (rnd.nextBoolean()) "en" else "es",
          Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "lang", "text")
      val exact = Dedup.decontamOf(df).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq
      val bloom = Dedup.bloomDecontamOf(df).collect()
      assert(bloom.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq == exact, s"trial $trial")
      bloom.foreach(r => assert(r.getBoolean(4), s"trial $trial: $r"))
    }
  }

  /** An EMPTY eval split means a null sketch — nothing may flag, and
    * the query must not NPE (the r3 degenerate-input rule). */
  test("q101 with an empty eval split: null sketch, zero contamination") {
    import spark.implicits._
    val trainIds = (0L until 200L).filter(bucketOf(_) >= 100).take(3)
    val rows = trainIds.map(id =>
      (id, "en", s"doc $id alpha beta gamma delta epsilon"))
    val out = Dedup.bloomDecontamOf(rows.toDF("doc_id", "lang", "text"))
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 3 && out(0).getLong(2) == 0, out(0))
    assert(out(0).getBoolean(4), out(0))
  }

  /** The component queries must survive the mega-cluster too: label
    * propagation runs over REPRESENTATIVE pairs (1 rep here), never the
    * 499,500 expanded intra pairs — O(members) label expansion, not
    * O(members²) edges. */
  test("q62-style components survive a planted 1000-identical-doc cluster") {
    import spark.implicits._
    val cluster = (1L to 1000L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog"))
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = (cluster ++ Seq((2000L, a), (2001L, a + " x"))).toDF("doc_id", "text")
    val (members, eD, verified, _) = Dedup.lshRepGraph(df)
    // the rep graph carries at most ONE pair for the small group, never
    // the cluster's half-million intra edges
    assert(verified.count() <= 2)
    val labels = graft.operators.Similarity.labelPropagate(
      verified.select("i", "j"))._1.collect().map(r => (r.getLong(0), r.getLong(1)))
    // membership expansion recovers the full 1000-doc component linearly
    val multi = members.groupBy("rep").count().filter("count >= 2")
      .join(eD.select(org.apache.spark.sql.functions.col("doc_id").as("rep")).distinct(), "rep")
    val clusterRep = multi.collect().map(_.getLong(0))
    assert(clusterRep.contains(1L), s"cluster rep missing: ${clusterRep.toSeq}")
    val full = Dedup.q62ClusterSizesOf(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(full(1000L) == 1L, s"histogram $full") // one 1000-doc cluster
    assert(full(2L) == 1L, s"histogram $full") // plus the near-dup pair
    assert(labels.nonEmpty || clusterRep.nonEmpty)
  }

  /** q62/q65 must agree with a driver-side union-find over the SAME q36
    * pair list — an independent recomputation of the component structure
    * (the oracle checks each query alone; this pins their consistency). */
  test("q62/q65 agree with a union-find over the q36 pairs") {
    val pairs = Dedup.q36MinHashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (i, j) =>
      val (ri, rj) = (find(i), find(j))
      if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
    }
    val clusters = parent.keys.toSeq.groupBy(find).map {
      case (_, ms) => ms.min -> ms.toSet
    }
    // q62: histogram of those cluster sizes
    val hist = clusters.values.groupBy(_.size).map {
      case (sz, cs) => (sz.toLong, cs.size.toLong, (sz * cs.size).toLong)
    }.toSet
    val gotHist = Dedup.q62ClusterSizes(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotHist == hist, s"got $gotHist want $hist")
    // q65: representative = min id; keep = max n_chars then min id
    val nChars = graft.util.Tables(spark, dir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = clusters.map { case (rep, ms) =>
      val keep = ms.toSeq.sortBy(id => (-nChars(id), id)).head
      (rep, ms.size.toLong, keep, nChars(keep), ms.size.toLong - 1)
    }.toSet
    val got = Dedup.q65KeepBest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want, s"got $got want $want")
  }

  /** q77: a cluster whose members land in different q57 splits is a
    * leak. Planted label frame with ids of KNOWN buckets (the md5 bucket
    * function is deterministic, so the choice is stable forever). */
  test("q77 split-leakage histogram flags clusters spanning splits") {
    import spark.implicits._
    val buckets = (0L until 2000L).toDF("doc_id")
      .withColumn("bucket", graft.util.Buckets.mod1000("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val train = buckets.filter(_._2 < 980).keys.toSeq.sorted
    val test_ = buckets.filter(_._2 >= 990).keys.toSeq.sorted
    assert(train.size >= 3 && test_.nonEmpty, "bucket universe too small")
    val labels = Seq(
      (train(0), 100L), (test_(0), 100L), // train+test members: leak
      (train(1), 200L), (train(2), 200L)) // both train: clean
      .toDF("doc_id", "lbl")
    val got = Dedup.splitLeakageOf(labels).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((1L, 2L)), got) // one clean 2-doc cluster
    assert(got(2L) == ((1L, 2L)), got) // one leaking 2-doc cluster
  }

  /** ADVICE r3: a cap-dropped band bucket silently changes whole q62/q65
    * components, so the rep-graph path counts (and warns about) dropped
    * buckets instead of staying quiet. */
  test("lsh cap detector counts dropped band buckets") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // two near-identical DISTINCT texts: survive the exact-dup collapse
    // and share at least one band bucket (pinned by the q36 cap test)
    val df = Seq((1L, a), (2L, a + " extra")).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(df)
    assert(Dedup.cappedBucketCount(sig, bucketCap = 1L) >= 1L)
    // the production cap never fires on this corpus
    assert(Dedup.cappedBucketCount(sig, Dedup.MaxBandBucket) == 0L)
  }

  /** q85: the BoW signature is order-INVARIANT ("c b a" ≡ "a b c") but
    * multiset-SENSITIVE ("a a b" ≢ "a b b") — the two properties that
    * make it catch shuffled dups without over-merging. Planted corpus:
    * even doc_ids re-ingest reversed (only BoW collapses them), odd
    * ones byte-identical (both signatures collapse them). */
  test("q85 planted: order-invariant, multiset-sensitive accounting") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("bowdup").toString
    Seq(
      (0L, "a b c", "en", "s1", 5L),  // even → reversed copy "c b a"
      (1L, "x y z", "en", "s1", 5L),  // odd  → byte-identical copy
      (2L, "a a b", "en", "s1", 5L),  // even → reversed "b a a", same bag
      (3L, "a b b", "en", "s1", 5L))  // odd  → byte-identical copy
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = Dedup.q85BowDedup(spark, tmp).collect()
    assert(r.length == 1)
    val (nRows, nExact, nBow, catchExtra) =
      (r(0).getLong(1), r(0).getLong(2), r(0).getLong(3), r(0).getLong(4))
    // 8 rows; exact texts: abc, cba, xyz, aab, baa, abb = 6;
    // bags: {a,b,c}, {x,y,z}, {a,a,b}, {a,b,b} = 4 — aab ≠ abb survives
    assert((nRows, nExact, nBow, catchExtra) == ((8L, 6L, 4L, 2L)), r(0))
  }

  /** q89: a 5-token doc quoted verbatim inside a 25-token doc scores
    * containment 1.0 but Jaccard 3/23 ≈ 0.13 — the asymmetric detector
    * must flag exactly this pair (naming the short side as contained)
    * while symmetric q35 stays silent on it. */
  test("q89 planted: full containment flagged where Jaccard misses it") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("containment").toString
    val quote = "alpha beta gamma delta epsilon"
    val wrapper = "w01 w02 w03 w04 w05 w06 w07 w08 w09 w10 " + quote +
      " w11 w12 w13 w14 w15 w16 w17 w18 w19 w20"
    Seq(
      (1L, quote, "en", "s1", quote.length.toLong),
      (2L, wrapper, "en", "s1", wrapper.length.toLong),
      (3L, "unrelated tokens only here nothing shared", "en", "s1", 41L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.q89Containment(spark, tmp).collect()
    assert(got.length == 1, got.mkString("; "))
    val r = got(0)
    assert((r.getLong(0), r.getLong(1)) == ((1L, 2L)))
    assert(r.getDouble(5) == 1.0, s"containment ${r.getDouble(5)}")
    assert((r.getLong(6), r.getLong(7)) == ((1L, 2L)), "contained/container")
    // and the symmetric Jaccard detector does NOT see this pair
    val j = Dedup.q35NgramJaccard(spark, tmp).collect()
    assert(!j.exists(x => x.getLong(0) == 1L && x.getLong(1) == 2L),
      "q35 unexpectedly flagged the containment pair")
  }

  /** The per-row MinHashSig expression must be BIT-identical to the
    * exploded batch pipeline (Md5Pair per shingle + 16 min-aggregates) —
    * the property that lets the streaming near-dup detector share q36's
    * signature space. <3-token docs: null signature ↔ absent row. */
  test("MinHashSig equals the exploded minhash signatures bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely different text with other tokens entirely here"),
      (4L, "UPPER Case MiXeD tokens should lowercase identically"),
      (5L, "two tokens"), // <3 toks: no shingles
      (6L, "")).toDF("doc_id", "text")
    // independent reference: the ORIGINAL exploded formulation (Md5Pair
    // per shingle + 16 min-aggregates), built inline here since
    // minhashSignatures itself now routes through MinHashSig
    val sigAggs = (0 until 16).map(i =>
      min(expr(s"(h1 + $i * h2) % ${Dedup.MinHashP}")).as(s"s$i"))
    val exploded = Dedup.shingleRowsOf(docs, distinct = false)
      .withColumn("hp", graft.functions.Md5Pair($"s"))
      .withColumn("h1", element_at($"hp", 1))
      .withColumn("h2", element_at($"hp", 2))
      .groupBy($"doc_id").agg(sigAggs.head, sigAggs.tail: _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toSeq).toMap
    val perRow = docs
      .select($"doc_id", graft.functions.MinHashSig($"text").as("sig"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1).toSeq)).toMap
    assert(perRow(5L) == null && perRow(6L) == null,
      "sub-width docs must have null signatures")
    assert(exploded.keySet == Set(1L, 2L, 3L, 4L))
    exploded.foreach { case (id, sig) =>
      assert(perRow(id) == sig, s"doc $id signature diverges")
    }
  }

  /** SimHashSig parity: the per-row expression must equal the exploded
    * hex/conv + majority-bit-vote formulation (the one the q37 oracle
    * still replays) bit-for-bit, including the distinct-shingle-set vote
    * base and the null-for-sub-width convention. */
  test("SimHashSig equals the exploded simhash bit-for-bit") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "one two three one two three one two three"), // repeated shingles
      (3L, "MiXeD Case TOKENS must lowercase before hashing here"),
      (4L, "too short")).toDF("doc_id", "text")
    val hashed = Dedup.shingleRowsOf(docs, distinct = true)
      .withColumnRenamed("s", "t")
      .withColumn("h", expr(
        "cast(conv(substring(md5(cast(t as binary)), 1, 15), 16, 10) as long)"))
    val bitSums = (0 until 60).map(b =>
      sum(expr(s"shiftright(h, $b) & 1")).as(s"c$b"))
    val simhashSum = (0 until 60).map(b =>
      s"if(c$b * 2 > cnt, shiftleft(cast(1 as long), $b), cast(0 as long))")
      .mkString(" + ")
    val exploded = hashed.groupBy($"doc_id")
      .agg(count(lit(1)).as("cnt"), bitSums: _*)
      .withColumn("simhash", expr(simhashSum))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("simhash")).toMap
    val perRow = docs
      .select($"doc_id", graft.functions.SimHashSig($"text").as("sh"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1)))).toMap
    assert(perRow(4L) == null, "sub-width doc must have a null simhash")
    assert(exploded.keySet == Set(1L, 2L, 3L))
    exploded.foreach { case (id, sim) =>
      assert(perRow(id) == java.lang.Long.valueOf(sim), s"doc $id simhash diverges")
    }
  }

  /** q97 planted: a 20-token span quoted verbatim in another document and
    * a span repeated WITHIN one document both count as duplicated
    * occurrences; unique grams and sub-width docs contribute none. */
  test("q97 planted: cross-doc quote and within-doc repeat both count") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("q97").toString
    def toks(p: String, n: Int) = (1 to n).map(i => f"$p$i%02d").mkString(" ")
    val span = toks("a", 20)                     // doc 1 tokens 1-20
    val doc1 = span + " " + toks("x", 5)         // 25 toks -> 6 grams, 1 dup
    val doc2 = toks("w", 10) + " " + span + " " + toks("v", 10)
                                                 // 40 toks -> 21 grams, 1 dup
    val doc3 = toks("r", 20) + " " + toks("r", 20)
                                                 // 40 toks -> 21 grams, 2 dup
    val doc4 = toks("s", 5)                      // sub-width: 0 grams
    Seq((1L, doc1), (2L, doc2), (3L, doc3), (4L, doc4))
      .map { case (id, t) => (id, t, "en", "s1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.q97DupSpans(spark, tmp).collect()
    assert(got.length == 1, got.mkString("; "))
    val r = got(0)
    assert(r.getString(0) == "en")
    assert(r.getLong(1) == 4L, s"n_docs ${r.getLong(1)}")
    assert(r.getLong(2) == 3L, s"n_spanned_docs ${r.getLong(2)}")
    assert(r.getLong(3) == 48L, s"n_grams ${r.getLong(3)}")
    assert(r.getLong(4) == 4L, s"n_dup ${r.getLong(4)}")
    assert(r.getDouble(5) == 4.0 / 48.0, s"dup_frac ${r.getDouble(5)}")
  }

  /** q99: the strip keeps the corpus-wide FIRST occurrence of every
    * duplicated span and removes the tokens of every other occurrence —
    * checked byte-exactly via md5 of the rebuilt text against
    * driver-computed expectations, including full-document removal and
    * within-document period-20 repetition. */
  test("q99 planted: non-first span occurrences stripped, first kept") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("q99").toString
    def toks(p: String, n: Int) = (1 to n).map(i => f"$p$i%02d").mkString(" ")
    val span = toks("a", 20)
    val doc1 = span + " " + toks("x", 5)               // first owner of span
    val doc2 = toks("w", 10) + " " + span + " " + toks("v", 10) // quote at pos 10
    val doc3 = toks("r", 20) + " " + toks("r", 20)     // self-repeat at pos 20
    val doc4 = toks("s", 5)                            // sub-width: untouched
    val doc5 = span                                    // verbatim gram-only doc
    Seq((1L, doc1), (2L, doc2), (3L, doc3), (4L, doc4), (5L, doc5))
      .map { case (id, t) => (id, t, "en", "s1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def m(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val want = Map( // doc_id -> (n_tok, n_removed, stripped_md5)
      1L -> ((25L, 0L, m(doc1))),
      2L -> ((40L, 20L, m(toks("w", 10) + " " + toks("v", 10)))),
      3L -> ((40L, 20L, m(toks("r", 20)))),
      4L -> ((5L, 0L, m(doc4))),
      5L -> ((20L, 20L, m(""))))
    val got = Dedup.q99SpanStrip(spark, tmp).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(5)))).toMap
    assert(got == want,
      s"strip mismatch:\n got=$got\n want=$want")
    val fracs = Dedup.q99SpanStrip(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(fracs(5L) == 0.0 && fracs(1L) == 1.0 && fracs(2L) == 0.5)
  }

  /** q99 property: on seeded-random corpora built from a shared phrase
    * pool (so cross- and within-doc span duplication arises naturally),
    * the distributed strip must match a 20-line brute-force driver model
    * of the same rule — first occurrence by (doc_id, pos) kept, covered
    * tokens removed — md5-for-md5 on every document. */
  test("q99 property: random corpora match the brute-force model") {
    import spark.implicits._
    val W = Dedup.DupSpanWidth
    val rnd = new scala.util.Random(20260814L)
    def m(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    for (trial <- 1 to 4) {
      // phrase pool: 6 phrases of 8-30 tokens over a tiny vocab
      val pool = (1 to 6).map(pi =>
        (1 to (8 + rnd.nextInt(23))).map(_ => s"t${rnd.nextInt(9)}p$pi"))
      val docs = (0 until 25).map { id =>
        val phrases = (1 to (1 + rnd.nextInt(3)))
          .flatMap(_ => pool(rnd.nextInt(pool.length)))
        val unique = (1 to rnd.nextInt(6)).map(_ => s"u${id}x${rnd.nextInt(100)}")
        (id.toLong, (phrases ++ unique).mkString(" "))
      }
      // brute-force model of the q99 rule
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val occ = docs.flatMap { case (id, _) =>
        val tk = toks(id)
        (0 to tk.length - W).map(p => (tk.slice(p, p + W).mkString(" "), id, p))
      }
      val firstOf = occ.groupBy(_._1).map { case (g, os) =>
        g -> os.map(o => (o._2, o._3)).min
      }
      val want = docs.map { case (id, _) =>
        val tk = toks(id)
        val dupStarts = (0 to tk.length - W)
          .filter(p => firstOf(tk.slice(p, p + W).mkString(" ")) != ((id, p)))
        val covered = dupStarts.flatMap(p => p until p + W).toSet
        val kept = tk.zipWithIndex.collect { case (t, i) if !covered(i) => t }
        id -> ((tk.length.toLong, (tk.length - kept.length).toLong,
          m(kept.mkString(" "))))
      }.toMap
      val tmp = java.nio.file.Files.createTempDirectory(s"q99prop$trial").toString
      docs.map { case (id, t) => (id, t, "en", "s1", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val got = Dedup.q99SpanStrip(spark, tmp).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(2), r.getLong(3), r.getString(5)))).toMap
      assert(got == want, s"trial $trial mismatch: " +
        (got.keySet ++ want.keySet).filter(k => got.get(k) != want.get(k))
          .map(k => s"$k: got=${got.get(k)} want=${want.get(k)}").mkString("; "))
    }
  }

  /** q113 planted (VERDICT r8 #1): a 400-token block duplicated verbatim
    * is 381 overlapping 20-gram hits but must report as ONE maximal span
    * of length 400 — the number fixed-width accounting (q97) cannot
    * produce; two quotes separated by more than a gram width stay two
    * spans. */
  test("q113 planted: a 400-token duplicated block is ONE span of length 400") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("q113").toString
    def toks(p: String, n: Int) = (1 to n).map(i => f"$p$i%03d").mkString(" ")
    val block = toks("blk", 400)
    val quote = toks("qte", 20)
    val doc1 = block + " " + quote + " " + toks("x", 10)   // first owner of both
    val doc2 = toks("w", 7) + " " + block + " " + toks("v", 9)
    // two copies of the 20-token quote, 30 unique tokens apart: the
    // covered regions [7,27) and [57,77) must NOT merge
    val doc3 = toks("u", 7) + " " + quote + " " + toks("z", 30) + " " + quote
    Seq((1L, doc1), (2L, doc2), (3L, doc3))
      .map { case (id, t) => (id, t, "en", "s1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.q113MaxSpans(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // doc 2: one 400-token span; doc 3: two 20-token spans
    assert(got == Set(("en", 400L, 1L, 1L, 400L), ("en", 20L, 2L, 1L, 40L)),
      s"histogram mismatch: $got")
  }

  /** The fold itself, pinned on hand arrays: overlapping and exactly-
    * adjacent (gap == width) coverage merges; a gap of width+1 splits. */
  test("q113 interval merge: overlap and adjacency merge, larger gaps split") {
    import spark.implicits._
    val got = Dedup.maxSpanIntervals(
        Seq((1L, Seq(0L, 5L, 30L, 50L)), (2L, Seq(10L)), (3L, Seq(0L, 21L)))
          .toDF("doc_id", "sts"))
      .select($"doc_id",
        org.apache.spark.sql.functions.expr("transform(iv, v -> array(v.a, v.b))"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[scala.collection.Seq[Long]](1).map(x => (x(0), x(1))).toSeq)
      .toMap
    assert(got(1L) == Seq((0L, 25L), (30L, 70L)), s"doc1 ${got(1L)}")
    assert(got(2L) == Seq((10L, 30L)), s"doc2 ${got(2L)}")
    assert(got(3L) == Seq((0L, 20L), (21L, 41L)), s"doc3 ${got(3L)}")
  }

  /** q116: the ExactSubstr threshold rule — only maximal duplicated
    * blocks ≥ MinStripSpan tokens are removed; an isolated 20-token
    * quote (a legitimate boilerplate phrase) survives, while the
    * 400-token copied block goes. At minLen ≤ the gram width the
    * threshold is vacuous and the strip IS q99's, md5-for-md5. */
  test("q116 planted: long blocks stripped, short quotes kept, minLen=W ≡ q99") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("q116").toString
    def toks(p: String, n: Int) = (1 to n).map(i => f"$p$i%03d").mkString(" ")
    def m(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val block = toks("blk", 400)
    val quote = toks("qte", 20)
    val doc1 = block + " " + quote + " " + toks("x", 10) // first owner
    val doc2 = toks("w", 7) + " " + block + " " + toks("v", 9)
    val doc3 = toks("u", 7) + " " + quote + " " + toks("z", 30)
    Seq((1L, doc1), (2L, doc2), (3L, doc3))
      .map { case (id, t) => (id, t, "en", "s1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.q116LongSpanStrip(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getString(5))))
      .toMap
    // doc 2 loses ONLY the 400-token block; doc 3's 20-token quote is
    // below the 50-token threshold and survives — the q99 strip would
    // have removed it (q99 strips doc3 to u+z)
    assert(got(1L) == ((430L, 0L, m(doc1))), s"doc1 ${got(1L)}")
    assert(got(2L) == ((416L, 400L, m(toks("w", 7) + " " + toks("v", 9)))),
      s"doc2 ${got(2L)}")
    assert(got(3L) == ((57L, 0L, m(doc3))), s"doc3 ${got(3L)}")
    val q99got = Dedup.q99SpanStrip(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(q99got(3L) == 20L, s"q99 must strip doc3's quote: $q99got")
    // vacuous threshold: minLen = gram width ⇒ identical to q99
    val d = Seq((1L, doc1), (2L, doc2), (3L, doc3)).toDF("doc_id", "text")
    val viaThreshold = Dedup.longSpanStripOf(d, Dedup.DupSpanWidth.toLong)
      .select($"doc_id", $"n_kept", $"stripped_md5").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val viaQ99 = Dedup.stripByStarts(
        Dedup.spanBase(d), Dedup.dupStartsOf(Dedup.spanBase(d)))
      .select($"doc_id", $"n_kept", $"stripped_md5").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(viaThreshold == viaQ99, s"minLen=W must reproduce q99:\n $viaThreshold\n $viaQ99")
  }

  /** q113 ≡ q99 (VERDICT r8 #1's equivalence leg): the union of the
    * merged maximal intervals IS q99's covered-token set, so stripping
    * by intervals must rebuild byte-identical documents (md5-for-md5) on
    * random corpora with natural overlapping/adjacent duplication. */
  test("q113 strip-by-intervals equals the q99 strip md5-for-md5") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 2) {
      val pool = (1 to 6).map(pi =>
        (1 to (8 + rnd.nextInt(23))).map(_ => s"t${rnd.nextInt(9)}p$pi"))
      val docsRows = (0 until 25).map { id =>
        val phrases = (1 to (1 + rnd.nextInt(3)))
          .flatMap(_ => pool(rnd.nextInt(pool.length)))
        val unique = (1 to rnd.nextInt(6)).map(_ => s"u${id}x${rnd.nextInt(100)}")
        (id.toLong, (phrases ++ unique).mkString(" "))
      }
      val d = docsRows.map { case (id, t) => (id, "en", t) }
        .toDF("doc_id", "lang", "text")
      val base = Dedup.spanBase(d).localCheckpoint(true)
      val starts = Dedup.dupStartsOf(base).localCheckpoint(true)
      def res(df: org.apache.spark.sql.DataFrame) = df
        .select($"doc_id", $"n_kept", $"stripped_md5").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      val byStarts = res(Dedup.stripByStarts(base, starts))
      val byIvs = res(Dedup.stripByIntervals(base,
        Dedup.maxSpanIntervals(starts).select($"doc_id", $"iv")))
      assert(byStarts == byIvs, s"trial $trial: " +
        (byStarts.keySet ++ byIvs.keySet)
          .filter(k => byStarts.get(k) != byIvs.get(k))
          .map(k => s"$k: starts=${byStarts.get(k)} ivs=${byIvs.get(k)}")
          .mkString("; "))
    }
  }
}
