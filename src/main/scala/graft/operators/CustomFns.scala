package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{RollingMinHashExpr, Sum128}
import graft.util.Tables
import graft.util.OracleSafe.slong

/** Queries exercising the engine's custom Catalyst expressions under the
  * DuckDB oracle — proof that the codegen'd extensions compute exactly
  * what their portable SQL definitions say. */
object CustomFns {

  // ---------------------------------------------------------------- q41
  /** Winnowing-style fingerprint: min polynomial hash over all 8-char
    * windows — O(n) rolling custom Expression vs the oracle's O(n·k)
    * direct per-window fold (same modular values). */
  def q41RollingFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .filter($"doc_id" < 200)
      .withColumn("fp", RollingMinHashExpr($"text", 8))
      .select($"doc_id", $"fp")
      .orderBy($"doc_id")
  }

  // ---------------------------------------------------------------- q42
  /** Revenue via the exact int128 aggregate — the overflow-proof scale
    * path for fixed-point sums; oracle is DuckDB's native HUGEINT sum. */
  def q42Sum128Revenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg((Sum128(slong($"l_extendedprice") * (lit(10000L) - slong($"l_discount")))
        / lit(1.0e8)).as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_rolling_fingerprint" -> (q41RollingFingerprint _),
    "q42_sum128_revenue" -> (q42Sum128Revenue _),
  )

  val oracle: Map[String, String] = Map(
    "q41_rolling_fingerprint" ->
      """SELECT doc_id,
        |  list_min(list_transform(range(length(text) - 7), i ->
        |    list_reduce(
        |      list_prepend(0, list_transform(range(8), j ->
        |        CAST(ascii(substr(text, CAST(i + j AS INTEGER) + 1, 1)) AS BIGINT))),
        |      (a, b) -> (a * 31 + b) % 1000000007))) AS fp
        |FROM documents
        |WHERE doc_id < 200
        |ORDER BY doc_id""".stripMargin,
    "q42_sum128_revenue" ->
      s"""SELECT l_returnflag,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice*10000 + 0.5) AS BIGINT)
        |         * (10000 - CAST(FLOOR(l_discount*10000 + 0.5) AS BIGINT))) AS DOUBLE)
        |    / 100000000.0 AS revenue,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
  )
}
