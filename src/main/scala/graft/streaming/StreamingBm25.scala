package graft.streaming
import graft.util.Mat.Ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** BM25 retrieval SERVING — q122's loaded-index twin, completing the
  * text-retrieval lifecycle the way `saveGramIndex`/`loadGramIndex` does
  * for span-stripping and the saved IVF/PQ index does for vectors: the
  * corpus-wide posting lists are built ONCE per corpus version (the full
  * token explode + aggregate that q122 pays inline every run), persisted
  * as a term-bucketed sorted table, and a serving restart pays only a
  * table load. Queries then run STATELESS against the static postings —
  * a stream-static broadcast join per micro-batch, per-batch top-k via
  * the SHARED [[TextOps.bm25Rank]] — so served rankings are bit-identical
  * to the batch arm by construction, not by parallel implementation.
  *
  * Layout is NORMALIZED for append: a posting row carries (term, doc_id,
  * tf, dl) — per-document facts that never change — while df lives in its
  * own vocab-sized `_df` table and (n_docs, n_toks, avgdl) in the 1-row
  * `_stats` table. df changes CORPUS-WIDE on every append (each batch
  * occurrence bumps its term's count), so denormalizing it onto posting
  * rows would force a full-index rewrite per refresh; normalized,
  * [[appendBm25Index]] appends batch-sized posting rows under the same
  * bucket spec and rewrites only the vocab-sized df table and the stats
  * row — the q56/appendPqIndex batch-cost-refresh discipline.
  */
object StreamingBm25 {

  /** Build + persist the postings index for `d` (`doc_id`, `text`):
    * `<table>` holds one row per (term, doc_id) with tf and dl — bucketed
    * and sorted by term so a term-keyed lookup never shuffles the
    * postings — `<table>_df` the (term, df) vocabulary, and
    * `<table>_stats` the 1-row (n_docs, n_toks, avgdl) frame. One
    * token-volume aggregate; dl/df derive from the already-collapsed
    * (doc, term) frame, not from re-scanned text. */
  def saveBm25Index(d: DataFrame, table: String, buckets: Int = 32): Unit = {
    val s = d.sparkSession
    import s.implicits._
    val tf = termFrequencies(d)
    val dl = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
    tf.groupBy($"term").agg(count(lit(1)).as("df"))
      .write.mode("overwrite")
      .bucketBy(buckets, "term").sortBy("term")
      .format("parquet").saveAsTable(table + "_df")
    dl.agg(count(lit(1)).as("n_docs"), sum($"dl").as("n_toks"))
      .withColumn("avgdl", expr("n_toks div n_docs"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(table + "_stats")
    tf.join(dl, "doc_id")
      .select($"term", $"doc_id", $"tf", $"dl")
      .write.mode("overwrite")
      .bucketBy(buckets, "term").sortBy("term")
      .format("parquet").saveAsTable(table)
    // FREEZE-TIME snapshot (VERDICT r11 #4): appends rewrite _df/_stats
    // in place, so without a frozen copy there is no reference to
    // measure corpus drift against. _frozen_stats is 1 row; _frozen_df
    // is vocab-sized — the [[bm25IndexDrift]] audit's baseline.
    s.table(table + "_stats").write.mode("overwrite").format("parquet")
      .saveAsTable(table + "_frozen_stats")
    s.table(table + "_df").write.mode("overwrite").format("parquet")
      .saveAsTable(table + "_frozen_df")
  }

  /** One row per (doc_id, term) with its in-document count — the
    * collapsed frame every index artifact derives from. Checkpointed:
    * at save time it feeds dl, df AND the postings write; at append
    * time the batch twin feeds postings, the df delta and the stats
    * delta — one text decode either way. */
  private def termFrequencies(d: DataFrame): DataFrame = {
    val s = d.sparkSession
    import s.implicits._
    d.select($"doc_id", explode(split(lower($"text"), " ")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .materialize()
  }

  /** Append `batchDocs` (doc_ids DISJOINT from the indexed corpus — the
    * same contract as appendPqIndex/appendCurateState) to a saved index:
    * batch posting rows append under the SAME bucket spec (downstream
    * term lookups keep holding), the vocab-sized df table is rewritten
    * with the batch's per-term increments folded in (full outer — a
    * batch can introduce new vocabulary), and the stats row absorbs the
    * batch's doc/token counts. Every step is batch-sized except the
    * df rewrite, which is vocabulary-sized — never corpus-sized.
    *
    * Crash ordering (ADVICE r11): posting rows append FIRST, df/stats
    * rewrite LAST. A crash between the two leaves df/stats UNDER-counting
    * the batch — served idf/avgdl are merely stale for the batch's terms
    * (conservative: new postings rank slightly high) and a re-run of the
    * df/stats fold repairs it. The reverse order would leave df/stats
    * counting documents whose postings never landed — silently wrong
    * rankings with no error to detect. */
  def appendBm25Index(batchDocs: DataFrame, table: String,
      buckets: Int = 32): Unit = {
    val s = batchDocs.sparkSession
    import s.implicits._
    val tf = termFrequencies(batchDocs)
    val dl = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
    // df/stats read-modify-overwrite: materialize BEFORE the overwrite
    // drops the table being read (the snapshotDiff lesson)
    val dfNew = s.table(table + "_df")
      .join(tf.groupBy($"term").agg(count(lit(1)).as("df_add")),
        Seq("term"), "full_outer")
      .select($"term",
        (coalesce($"df", lit(0L)) + coalesce($"df_add", lit(0L))).as("df"))
      .materialize()
    val batchStats = dl
      .agg(count(lit(1)).as("b_docs"), sum($"dl").as("b_toks"))
    val statsNew = s.table(table + "_stats")
      .crossJoin(broadcast(batchStats))
      .select(($"n_docs" + $"b_docs").as("n_docs"),
        ($"n_toks" + $"b_toks").as("n_toks"))
      .withColumn("avgdl", expr("n_toks div n_docs"))
      .materialize()
    // postings first (see the crash-ordering contract above): both
    // rewrites are checkpointed snapshots, so nothing here still reads
    // the tables being replaced
    tf.join(dl, "doc_id")
      .select($"term", $"doc_id", $"tf", $"dl")
      .write.mode("append")
      .bucketBy(buckets, "term").sortBy("term")
      .format("parquet").saveAsTable(table)
    dfNew.write.mode("overwrite")
      .bucketBy(buckets, "term").sortBy("term")
      .format("parquet").saveAsTable(table + "_df")
    statsNew.write.mode("overwrite").format("parquet")
      .saveAsTable(table + "_stats")
  }

  /** STALENESS GATE for the text index (VERDICT r11 #4 — the
    * `pqIndexDistortion` analog): how far the LIVE index statistics have
    * drifted from the freeze-time snapshot after k appends. One row:
    *
    *   n_docs_frozen/now, avgdl_frozen/now,
    *   avgdl_drift_permille = |avgdl_now − avgdl_frozen|·1000/avgdl_frozen,
    *   df_tv_permille      = ½·Σ_t |df_now(t)/Σdf_now − df_frozen(t)/Σdf_frozen|·1000
    *   n_new_terms         = vocabulary the appends introduced.
    *
    * df_tv is the total-variation distance between the normalized
    * document-frequency distributions — it rises when appended traffic
    * speaks a different vocabulary (the thing that silently skews idf
    * weighting), not merely when the corpus grows: appending more of the
    * SAME distribution leaves it near 0. Cost: a vocab-sized full-outer
    * join + one aggregate — never corpus-sized.
    *
    * Refusal (the pqIndexDistortion coverage rule): an index built
    * before the snapshot existed has no baseline — refuse rather than
    * report a vacuous zero. */
  def bm25IndexDrift(s: SparkSession, table: String): DataFrame = {
    import s.implicits._
    require(s.catalog.tableExists(table + "_frozen_stats") &&
        s.catalog.tableExists(table + "_frozen_df"),
      s"drift gate refused: $table has no freeze-time snapshot " +
        "(_frozen_stats/_frozen_df) — rebuild with saveBm25Index so " +
        "there is a baseline to measure appends against")
    // Degenerate-baseline refusals (ADVICE r12): a frozen index whose
    // avgdl is zero/null (zero docs, or a sum that never saw a token)
    // has no relative-drift denominator — under ANSI mode the division
    // below would abort the whole audit — and an empty frozen
    // vocabulary makes df_tv a null row; both would read as "clean" on
    // exactly the baseline the audit cannot judge. Refuse, naming the
    // cause. Driver cost: one 1-row read + one emptiness probe.
    val fzAvg = s.table(table + "_frozen_stats").select($"avgdl").head()
    require(!fzAvg.isNullAt(0) && fzAvg.getLong(0) > 0L,
      s"drift gate refused: $table's freeze-time avgdl is " +
        s"${if (fzAvg.isNullAt(0)) "null" else "0"} — the frozen " +
        "baseline is degenerate (empty corpus at save time); rebuild " +
        "with saveBm25Index over a real corpus")
    require(!s.table(table + "_frozen_df").isEmpty,
      s"drift gate refused: $table's freeze-time vocabulary is empty — " +
        "df drift against an empty baseline is undefined; rebuild with " +
        "saveBm25Index over a real corpus")
    val fz = s.table(table + "_frozen_stats")
      .select($"n_docs".as("n_docs_frozen"), $"avgdl".as("avgdl_frozen"))
    val now = s.table(table + "_stats")
      .select($"n_docs".as("n_docs_now"), $"avgdl".as("avgdl_now"))
    // one vocab-sized full-outer join feeds the masses AND the TV sum
    // (checkpointed — the q60/q89 barrier discipline)
    val dfs = s.table(table + "_frozen_df")
      .select($"term", $"df".as("df_frozen"))
      .join(s.table(table + "_df").select($"term", $"df".as("df_now")),
        Seq("term"), "full_outer")
      .select(coalesce($"df_frozen", lit(0L)).as("df_frozen"),
        coalesce($"df_now", lit(0L)).as("df_now"))
      .materialize()
    val masses = dfs.agg(
      greatest(sum($"df_frozen"), lit(1L)).as("m_frozen"),
      greatest(sum($"df_now"), lit(1L)).as("m_now"),
      sum(when($"df_frozen" === 0L, 1L).otherwise(0L)).as("n_new_terms"))
    val tv = dfs.crossJoin(broadcast(masses))
      .agg(sum(abs($"df_now".cast("double") / $"m_now".cast("double") -
        $"df_frozen".cast("double") / $"m_frozen".cast("double"))).as("l1"),
        max($"n_new_terms").as("n_new_terms"))
      .select(floor($"l1" * 500.0).cast("long").as("df_tv_permille"),
        $"n_new_terms")
    fz.crossJoin(now).crossJoin(broadcast(tv))
      .withColumn("avgdl_drift_permille",
        expr("abs(avgdl_now - avgdl_frozen) * 1000L div avgdl_frozen"))
      .select($"n_docs_frozen", $"n_docs_now", $"avgdl_frozen",
        $"avgdl_now", $"avgdl_drift_permille", $"df_tv_permille",
        $"n_new_terms")
  }

  def loadPostings(s: SparkSession, table: String): DataFrame = s.table(table)

  def loadDf(s: SparkSession, table: String): DataFrame =
    s.table(table + "_df")

  def loadStats(s: SparkSession, table: String): DataFrame =
    s.table(table + "_stats").select(col("n_docs"), col("avgdl"))

  /** Serve one micro-batch of (qid, term) query rows against the loaded
    * postings — plain batch semantics inside foreachBatch, zero streaming
    * state. Postings and df are pre-filtered to the batch's distinct
    * terms (broadcast semi-joins — the lookup shape; a resident server
    * would push the terms as literals into the bucketed scans), then
    * ranked by the SHARED [[TextOps.bm25Rank]]. */
  def topKBatch(queryBatch: DataFrame, postings: DataFrame, dfT: DataFrame,
      stats: DataFrame, k: Int = TextOps.Bm25TopK): DataFrame = {
    val terms = broadcast(queryBatch.select(col("term")).distinct())
    val matched = postings
      .join(terms, Seq("term"), "left_semi")
      .join(broadcast(dfT.join(terms, Seq("term"), "left_semi")), "term")
    TextOps.bm25Rank(matched, stats, queryBatch, k)
  }

  /** HYBRID serving from SAVED indexes — q124's loaded twin (VERDICT r11
    * #2): fuse the persisted BM25 postings (text arm, [[topKBatch]])
    * with the saved IVF/PQ index (vector arm,
    * [[graft.operators.Similarity.pqServeQuery]] — ADC shortlist over
    * the 64×-compressed codes, exact re-rank of the shortlist only)
    * through the SHARED [[TextOps.rrfFuse]], so the fused ranking is the
    * RRF of the two served arms BY CONSTRUCTION — the spec additionally
    * replays the fusion driver-side and measures overlap against the
    * brute q124.
    *
    * `queryBatch` carries (qid, term) text queries; qid ≡ vec_id (the
    * q90/q124 alignment), and each qid's query VECTOR comes from `dir`'s
    * embeddings. At real query volume this is the substitution the q124
    * docstring names: neither arm scans the corpus — the text arm probes
    * term-bucketed postings, the vector arm scans codes (not vectors)
    * and fetches true vectors for the shortlist alone. */
  def hybridServe(s: SparkSession, dir: String, bm25Table: String,
      pqIndexPath: String, queryBatch: DataFrame,
      k: Int = TextOps.Bm25TopK,
      nprobe: Int = graft.operators.Similarity.MultiprobeNprobe,
      shortlist: Int = graft.operators.Similarity.PqShortlist): DataFrame = {
    import s.implicits._
    val text = topKBatch(queryBatch, loadPostings(s, bm25Table),
        loadDf(s, bm25Table), loadStats(s, bm25Table), k)
      .select($"qid", $"doc_id", $"rk".as("text_rk"))
    // the vector arm serves ONLY the batch's qids (VERDICT r12 #2):
    // the restriction is threaded INTO candidate generation — the ADC
    // scan probes and ranks nothing for standing queries the batch
    // didn't ask for — not applied as a post-filter on a full serve.
    // The qid list is batch-sized (it broadcasts in the text arm too).
    val qids = queryBatch.select($"qid").distinct()
      .collect().map(_.getLong(0)).toSeq
    val vec = graft.operators.Similarity
      .pqServeQuery(s, dir, pqIndexPath, k, nprobe, shortlist,
        qids = Some(qids))
      .select($"qid", $"nid".as("doc_id"), $"rk".as("vec_rk"))
    TextOps.rrfFuse(text, vec, k)
  }
}
