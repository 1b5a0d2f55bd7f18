package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Ingestion-time PII redaction — q114's continuous twin: every incoming
  * document is rewritten with the SAME ordered (pattern, token) chain
  * ([[TextOps.PiiRedactions]]) before it ever enters the working set —
  * the at-the-door scrub, exactly as StreamingSpanStrip is to q99. The
  * batch q114 remains the authority for corpus-wide accounting; this
  * guarantees no un-redacted text is ever persisted downstream.
  *
  * Shape: completely STATELESS — the chain is per-row codegen'd regexp
  * expression work, so it composes with any source and any downstream
  * sink with no state store, no watermark, and trivially exact restart
  * semantics (a replayed row redacts to the same bytes). One shared
  * pattern set means batch ≡ stream byte-for-byte, pinned by the
  * StreamingSpec equality test.
  */
object StreamingRedact {

  /** Redact a (streaming or batch) frame with a `text` column: same
    * output contract as q114 plus the rewritten text itself, which a
    * downstream stage (publish, pack) consumes. */
  def redacted(stream: DataFrame): DataFrame =
    TextOps.piiRewriteOf(stream)
      .select(col("doc_id"), col("n_emails"), col("n_ipv4"), col("n_phones"),
        col("changed"), col("redacted_md5"), col("redacted"))
}
