package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{DotLongs, QuantizeVec}
import graft.operators.Similarity

/** Streaming COMPRESSED ANN serving — q111's continuous twin, the
  * IVF-PQ complement of [[StreamingAnnServe]]: a stream of query
  * vectors is answered against the SAVED compressed index
  * ([[Similarity.loadPqIndex]] + the persisted encoded corpus), each
  * micro-batch producing the same exact top-k rows the batch
  * [[Similarity.pqServeQuery]] path computes for those queries.
  *
  * Shape: the candidate stage is STATELESS streaming — quantization,
  * multiprobe cell ranking (shared [[Similarity.explodeProbeCells]])
  * and the stream-static equi-join on the cell id all run against the
  * cached ENCODED frame (8 int codes + reconstruction norm — the
  * 64×-compressed scan), with the approximate cosine computed by
  * codegen reconstruction dots (q·cent_cell + Σᵤ q_u·ĉ_u against
  * literal model constants — the SAME exact integers as the batch
  * arm's per-query lookup tables, which are a driver-side CPU
  * optimization, not a semantic one, and apply per-batch at scale).
  * The ADC shortlist + exact re-rank are per-query rankings with no
  * cross-batch state, so they run per micro-batch via `foreachBatch`
  * + [[serveBatch]] (window ranking is unsupported inside a streaming
  * plan; per-batch it is exactly the batch pipeline, shared code).
  * Checkpoint-restart is offset-log-only, like StreamingAnnServe.
  */
object StreamingPqServe {

  /** Static side: the persisted encoded corpus, cached — Spark
    * re-evaluates static join sides per micro-batch, and this one is
    * immutable for the query's lifetime. */
  def encodedCorpus(s: org.apache.spark.sql.SparkSession,
      indexPath: String): DataFrame =
    s.read.parquet(s"$indexPath/enc").cache()

  /** Stateless ADC candidate stream: `queries` carries (qid, embedding
    * array<float>). Output rows carry (qid, qe, qn, vec_id, asim) —
    * [[serveBatch]] shortlists and re-ranks them. */
  def adcCandidates(queries: DataFrame, enc: DataFrame,
      cents: Seq[(Seq[Long], Double)], books: Seq[Seq[Seq[Long]]],
      nprobe: Int = Similarity.MultiprobeNprobe): DataFrame = {
    val q = queries
      .withColumn("e", QuantizeVec(col("embedding")))
      .withColumn("nrm", sqrt(DotLongs(col("e"), col("e")).cast("double")))
      .select(col("qid"), col("e"), col("nrm"))
    val probed = Similarity.explodeProbeCells(q, cents, nprobe)
      .select(col("qid"), col("e").as("qe"), col("nrm").as("qn"),
        col("qcell"))
    val joined = probed.join(enc,
      col("cell") === col("qcell") && col("vec_id") =!= col("qid"))
    // approx dot = q·cent_cell + Σᵤ q_u·ĉ_u — exact integers identical
    // to the batch LUT expansion, evaluated as codegen dots against
    // literal centroid/codebook constants
    val adot = DotLongs(col("qe"),
        element_at(typedLit(cents.map(_._1)), col("cell") + 1)) +
      (0 until Similarity.PqSubspaces).map { u =>
        DotLongs(
          slice(col("qe"), u * Similarity.PqSubDim + 1, Similarity.PqSubDim),
          element_at(typedLit(books(u)), element_at(col("codes"), u + 1) + 1))
      }.reduce(_ + _)
    joined.withColumn("asim",
        Similarity.safeCos(adot, col("qn") * col("rnrm")))
      .select(col("qid"), col("qe"), col("qn"), col("vec_id"), col("asim"))
  }

  /** Per-batch shortlist + exact re-rank: top-`shortlist` by
    * (asim DESC, vec_id ASC) per query, then the shared `cosineTopK`
    * over the shortlist's TRUE vectors (`base` = the scaled corpus) —
    * byte-for-byte the batch q111 serving arithmetic. */
  def serveBatch(candBatch: DataFrame, base: DataFrame, k: Int = 5,
      shortlist: Int = Similarity.PqShortlist): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
      .orderBy(col("asim").desc, col("vec_id").asc)
    val sl = candBatch
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= shortlist)
      .select(col("qid"), col("qe"), col("qn"), col("vec_id"))
    Similarity.cosineTopK(sl.join(base, "vec_id"), k)
  }

  /** DIVERSIFIED per-batch serve — q129's continuous twin, completing
    * the serving symmetry (every other serving path has a streaming
    * twin): the batch's top-[[Similarity.MmrPool]] from [[serveBatch]]
    * fed through the SHARED greedy [[Similarity.mmrDiversify]], so a
    * streamed query diversifies to exactly the rows the batch
    * [[Similarity.mmrServeQuery]] computes for it. Per-qid greedy ⇒
    * batches compose; zero cross-batch state, restart is offset-log
    * only. */
  def serveBatchDiversified(candBatch: DataFrame, base: DataFrame,
      k: Int = Similarity.MmrK, pool: Int = Similarity.MmrPool,
      shortlist: Int = Similarity.PqShortlist): DataFrame =
    Similarity.mmrDiversify(
      serveBatch(candBatch, base, pool, shortlist), base, k)
}
