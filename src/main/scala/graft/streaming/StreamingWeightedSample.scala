package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextOps

/** Streaming weighted sampling — q98's ingestion-time twin: a bounded
  * per-language reservoir that maintains the EXACT priority-sampling
  * top-k (Duffield–Lund–Thorup) over everything seen so far. Because the
  * priorities are deterministic (the same md5 draw and the same one-IEEE-
  * division rank key as batch — shared `TextOps.weightedProjection`),
  * and because top-(k+1) selection is online-prunable (keeping the best
  * k+1 so far loses nothing a later element could resurrect), the
  * streaming sample after the last document is BIT-IDENTICAL to batch
  * q98 on the same corpus — including the τ-threshold estimator values.
  * The spec proves this equality across a checkpoint restart.
  *
  * Shape: the projection is stateless map-side; the only stateful
  * operator is a `flatMapGroupsWithState` keyed by language whose state
  * is ≤ k+1 tuples of four numbers — FIXED-size state per stratum,
  * forever, regardless of corpus size (contrast a naive "keep everything
  * and re-rank": state = corpus). Re-sent documents are idempotent (a
  * duplicate id collapses to an identical tuple and is deduplicated in
  * the merge). Each trigger emits the stratum's CURRENT sample
  * (update-mode lattice: later emissions supersede earlier ones). */
object StreamingWeightedSample {

  private val K = TextOps.WeightedK

  /** (pri, doc_id, tok, h1) — the reservoir entry. */
  private type SRow = (Double, Long, Long, Long)

  /** `stream` carries `(doc_id, lang, text)`. Output per trigger and
    * touched language: the current top-k as
    * (lang, rk, doc_id, tok, est_w6, est_total6) — the same columns and
    * the same scaled-long estimator arithmetic as batch q98. */
  def sample(stream: DataFrame): DataFrame = {
    val s = stream.sparkSession
    import s.implicits._
    TextOps.weightedProjection(stream)
      .select($"lang", $"doc_id", $"tok", $"h1", $"pri")
      .as[(String, Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        advance)
      .toDF("lang", "rk", "doc_id", "tok", "est_w6", "est_total6")
  }

  /** Reservoir transition: merge the batch into the retained top-(k+1)
    * by (priority, doc_id) — the batch rank order — then re-emit the
    * stratum's current sample with the estimator recomputed from the
    * (k+1)-th retained priority, exactly the batch formula. */
  private def advance(lang: String,
      rows: Iterator[(String, Long, Long, Long, Double)],
      state: GroupState[List[SRow]]): Iterator[(String, Long, Long, Long, Long, Long)] = {
    val merged = (state.getOption.getOrElse(Nil) ++
        rows.map(r => (r._5, r._2, r._3, r._4)))
      .distinct // re-sent ids collapse to identical tuples
      .sortBy { case (p, id, _, _) => (p, id) }
      .take(K + 1)
    state.update(merged)
    val tau = merged.drop(K).headOption.map { case (_, _, tok, h1) =>
      tok.toDouble * TextOps.Pow48 / h1.toDouble }
    val sel = merged.take(K).zipWithIndex.map { case ((_, id, tok, _), i) =>
      val estW = tau.fold(tok.toDouble)(t => math.max(tok.toDouble, t))
      (lang, (i + 1).toLong, id, tok, math.floor(estW * 1000000.0).toLong)
    }
    val estTotal = sel.map(_._5).sum
    sel.iterator.map { case (l, rk, id, tok, e6) =>
      (l, rk, id, tok, e6, estTotal) }
  }
}
