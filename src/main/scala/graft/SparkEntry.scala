package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Relational, TextOps, Dedup, Similarity, Multimodal, AprsAnalog, CustomFns, Classifier}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-module query/oracle maps. Every operator family
  * contributes (name -> plan builder) plus, where the semantics are
  * ANSI-SQL-expressible, a DuckDB oracle twin.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way star join + broadcast dims + exact-decimal aggregation. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q03JoinMulti(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextOps.queries ++ Dedup.queries ++
      Similarity.queries ++ Multimodal.queries ++ AprsAnalog.queries ++
      CustomFns.queries ++ Classifier.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ TextOps.oracle ++ Dedup.oracle ++
      Similarity.oracle ++ Multimodal.oracle ++ AprsAnalog.oracle ++
      CustomFns.oracle ++ Classifier.oracle
}
