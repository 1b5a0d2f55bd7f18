package graft.model

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.util.Tables

/** Typed row models for the corpus tables, for the places where
  * compile-time safety beats the dynamic DataFrame surface (user code
  * mapping over documents, tests, examples). The operators themselves
  * stay DataFrame-based on purpose: their schemas are projection-heavy
  * and Catalyst prunes columns best when nothing forces a full-row
  * Encoder materialization.
  */
final case class Document(doc_id: Long, text: String, lang: String,
    source: String, n_chars: Long)

final case class Embedding(vec_id: Long, embedding: Array[Float],
    label: Int)

object Corpus {

  /** Typed view of the documents table. Column order in the parquet is
    * (doc_id, text, lang, source, n_chars) — `as[T]` maps by NAME, so
    * the case class tracks names, not positions. */
  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables(spark, dir, "documents").as[Document]
  }

  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] = {
    import spark.implicits._
    Tables(spark, dir, "embeddings").as[Embedding]
  }
}
