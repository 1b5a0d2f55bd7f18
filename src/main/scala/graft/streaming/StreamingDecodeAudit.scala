package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Multimodal

/** Streaming decode-audit — q139's ingestion-time twin, closing the
  * stub-accounting lifecycle (VERDICT r13 #7): the batch audit tells a
  * pipeline owner how much of a FROZEN corpus is stub-graded; this gate
  * tells them the moment an INGEST starts carrying payloads the real
  * decoders can't handle (a crawler picking up an H.264-heavy site, an
  * upstream re-encoding change), before those opaque descriptors pollute
  * q117 / the perceptual index.
  *
  * Division of labor, the [[StreamingQualityGate]] convention: the
  * BASELINE is frozen batch-side (q139's own per-family stub share over
  * the reference corpus — ONE definition, [[Multimodal.decoderAuditOf]],
  * hash-checked against DuckDB); the stream replays the SAME audit per
  * micro-batch and alerts when a family's batch stub share exceeds its
  * frozen share by more than `marginPermille`. A family the baseline has
  * never seen is judged against share 0 — new families are exactly what
  * the alert exists for.
  *
  * Shape: decode is a mapPartitions stage (the justified RDD drop-down,
  * [[Multimodal.decodeFeatures]]'s own), so the stream runs it per batch
  * under foreachBatch — the CurateDoor pattern for batch-operator reuse.
  * The per-batch census is family-sized (≤ 5 rows), so the driver
  * collect, the sink append and the alert check are all model-sized; the
  * decode pass itself is the only data-sized work and the pipeline pays
  * it anyway to get descriptors.
  */
object StreamingDecodeAudit {

  /** q139's per-family stub share over a reference corpus, as the frozen
    * baseline map (family -> stub_permille; the ALL rollup row dropped —
    * alerts are judged per family, the corpus headline is the batch
    * audit's job). Family-sized collect. */
  def baseline(assetsDf: DataFrame): Map[String, Long] =
    Multimodal.decoderAuditOf(assetsDf.sparkSession, assetsDf).collect()
      .collect { case r if r.getString(0) != "ALL" =>
        r.getString(0) -> r.getLong(4)
      }.toMap

  /** One alert per (family, batch) whose stub share breached the frozen
    * baseline: (batch_id, family, stub_permille, baseline_permille). */
  final case class Alert(batchId: Long, family: String,
      stubPermille: Long, baselinePermille: Long)

  /** Start the audit over a stream of (doc_id, payload) assets: per
    * micro-batch, run THE q139 audit ([[Multimodal.decoderAuditOf]] —
    * never a re-derivation), append the per-family census rows
    * (batch_id, family, n_assets, n_stub, n_bytes, stub_permille) to
    * `sink`, and fire `onAlert` for each family breaching
    * baseline + margin. Payload bytes never cross the shuffle — the
    * audit aggregates map-side inside the decode pass. */
  def start(stream: DataFrame, checkpoint: String, sink: String,
      base: Map[String, Long], marginPermille: Long,
      onAlert: Alert => Unit): StreamingQuery = {
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val withBytes =
          if (batch.columns.contains("n_bytes")) batch
          else batch.withColumn("n_bytes",
            org.apache.spark.sql.functions
              .octet_length(batch("payload")).cast("long"))
        val census = Multimodal.decoderAuditOf(s, withBytes).collect()
        val families = census.filter(_.getString(0) != "ALL")
        families.foreach { r =>
          val (family, permille) = (r.getString(0), r.getLong(4))
          val b = base.getOrElse(family, 0L)
          if (permille > b + marginPermille)
            onAlert(Alert(batchId, family, permille, b))
        }
        // family-sized append — the rollup a dashboard trends
        import s.implicits._
        census.map(r => (batchId, r.getString(0), r.getLong(1),
            r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
          .toDF("batch_id", "family", "n_assets", "n_stub", "n_bytes",
            "stub_permille")
          .write.mode("append").parquet(sink)
        (): Unit
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
