package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual skew defense for the case AQE's runtime
  * skew-join splitting does not cover (it only kicks in for sort-merge
  * joins after a shuffle; a logical hot key still lands every probe row
  * for that key in ONE task's stream side first).
  *
  * Shape: the skewed (large) side gets a salt in [0, saltFactor) derived
  * from a per-row id — rows of the SAME hot key spread across saltFactor
  * shuffle keys; the modest side is replicated saltFactor× by an explode,
  * and the join runs on (key, salt). Output is the exact multiset of the
  * unsalted join for ANY salt assignment, which is why a
  * partition-ordinal-derived salt is safe here even though it is not
  * stable across re-runs — no output row depends on which salt a row got.
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
    val ls = skewed.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
    val rs = modest.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    ls.join(rs, Seq(key, "_salt")).drop("_salt")
  }
}
