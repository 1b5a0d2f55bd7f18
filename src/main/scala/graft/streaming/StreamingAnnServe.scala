package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{DotLongs, QuantizeVec}
import graft.operators.Similarity

/** Streaming ANN serving — q96's continuous twin, closing the serve-path
  * story the IVF persistence work started: a stream of query vectors is
  * answered against a LOADED IVF index ([[Similarity.loadIvfIndex]]) and
  * the cell-assigned static corpus, each micro-batch producing the same
  * exact top-k rows the batch `ivfQuery` path computes for those queries.
  *
  * Shape: everything up to ranking is STATELESS streaming —
  * quantization + norm are per-row codegen expressions, the multiprobe
  * cell ranking ([[Similarity.explodeProbeCells]]) is p·k codegen'd
  * argmax expressions against literal broadcast centroids, and candidate
  * generation is a stream-static equi-join on the cell id (the static
  * side is cached: Spark re-evaluates static sides per micro-batch, and
  * the assignment is provably identical across the query's lifetime).
  * The per-query top-k is a ranking WITHIN one query's candidate set, so
  * it needs no cross-batch state at all — a serving path answers each
  * query from the index when the query arrives. It runs per micro-batch
  * via `foreachBatch` + [[topK]] (window ranking is unsupported inside a
  * streaming plan; per-batch it is the exact batch ranking, shared with
  * q38/q44/q96 through `cosineTopK`). Checkpoint-restart is therefore
  * trivially safe — the only state is the source offset log — and the
  * spec proves a bounced query re-serves exactly the unserved queries.
  *
  * At 100 TB the static side is the partitioned assigned-corpus table
  * (cell-bucketed so each probe reads only its cells) and the centroids
  * stay a k×64 broadcast — the stream side never grows past one
  * micro-batch of queries.
  */
object StreamingAnnServe {

  /** Static side: the cell-assigned corpus, cached — (vec_id, e, nrm,
    * cell). One assignment pass, reused by every micro-batch. */
  def assignedCorpus(s: org.apache.spark.sql.SparkSession, dir: String,
      cents: Seq[(Seq[Long], Double)]): DataFrame =
    Similarity.assignedCorpus(s, dir, cents).cache()

  /** Stateless candidate stream: `queries` carries (qid, embedding
    * array<float>). Quantize, rank the nprobe nearest cells per query,
    * then stream-static join against the assigned corpus on the cell id.
    * Output rows: (qid, qe, qn, vec_id, e, nrm) — `topK` ranks them. */
  def candidates(queries: DataFrame, corpus: DataFrame,
      cents: Seq[(Seq[Long], Double)],
      nprobe: Int = Similarity.MultiprobeNprobe): DataFrame = {
    val q = queries
      .withColumn("e", QuantizeVec(col("embedding")))
      .withColumn("nrm", sqrt(DotLongs(col("e"), col("e")).cast("double")))
      .select(col("qid"), col("e"), col("nrm"))
    val probed = Similarity.explodeProbeCells(q, cents, nprobe)
      .select(col("qid"), col("e").as("qe"), col("nrm").as("qn"), col("qcell"))
    probed.join(corpus,
      col("cell") === col("qcell") && col("vec_id") =!= col("qid"))
  }

  /** Exact per-query top-k over one micro-batch of candidate rows — the
    * SAME ranking definition as every batch arm (cosineTopK): cosine
    * desc, vec_id asc, k rows per qid. Call from `foreachBatch`. */
  def topK(candidateBatch: DataFrame, k: Int = 5): DataFrame =
    Similarity.cosineTopK(candidateBatch, k)
}
