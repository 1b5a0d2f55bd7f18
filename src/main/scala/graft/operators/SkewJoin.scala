package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual skew defense for the case AQE's runtime
  * skew-join splitting does not cover (it only kicks in for sort-merge
  * joins after a shuffle; a logical hot key still lands every probe row
  * for that key in ONE task's stream side first).
  *
  * Shape: the skewed (large) side gets a salt in [0, saltFactor) derived
  * from the ROW CONTENT (xxhash64 over every column) — rows of the SAME
  * hot key spread across saltFactor shuffle keys; the modest side is
  * replicated saltFactor× by an explode, and the join runs on
  * (key, salt). A content hash, not a partition-ordinal id: an ordinal
  * (monotonically_increasing_id / rand) changes when a lost map task is
  * recomputed in a different row order, and a row whose salt changes
  * between two fetches of the same shuffle lands in the wrong (or two)
  * reduce partitions — the SPARK-23207 class of silent corruption.
  * Content-derived salt is identical on every attempt. The one caveat:
  * fully duplicate rows share a salt, so a hot key whose rows are all
  * byte-identical does not spread (collapse such duplicates to a count
  * first — q34's primitive).
  *
  * Cost model: replication multiplies the small side's shuffle volume by
  * saltFactor, and divides the hot key's per-task row count by the same
  * factor — worth it exactly when the hot key dominates a task (the
  * planted-skew spec shows the per-shuffle-key maximum dropping by the
  * factor). This complements the engine's other skew defenses: q35's
  * df-cap and q36/q37's bucket caps bound SELF-join fan-out; salting
  * rebalances a plain two-table join with a hot foreign key.
  */
object SkewJoin {

  def salted(skewed: DataFrame, modest: DataFrame, key: String,
      saltFactor: Int = 16): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    require(!skewed.columns.contains("_salt") && !modest.columns.contains("_salt"),
      "inputs must not carry a _salt column (reserved by SkewJoin.salted)")
    val ls = skewed.withColumn("_salt",
      pmod(xxhash64(skewed.columns.toIndexedSeq.map(col): _*),
        lit(saltFactor.toLong)))
    val rs = modest.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    ls.join(rs, Seq(key, "_salt")).drop("_salt")
  }
}
