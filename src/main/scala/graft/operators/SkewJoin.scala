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

  /** Measured skew → salt factor (VERDICT r5 #9): makes `salted` usable
    * without knowing the hot key — or whether there IS one — in advance.
    *
    * One sampled aggregation job over the skewed side's KEY COLUMN only:
    * per-key counts are map-side combined (each map task emits at most
    * its distinct-key count, not its row count), and the second aggregate
    * collapses to a single driver row — no full materialization, no
    * collect of per-key data. At 100 TB the sample fraction bounds even
    * the scan: Parquet row-group sampling keeps this a metadata-cheap
    * pre-pass relative to the join it tunes, and the `seed` is fixed so
    * retried stages measure the same sample.
    *
    * Factor choice: with P shuffle partitions, balanced hashing gives
    * each reduce task ~1/P of the rows. A key holding `share` of all rows
    * lands `share` of them in ONE task; splitting it `share·P` ways
    * restores the fair per-task load, so the factor is share·P rounded UP
    * to the next power of two (pow2 keeps pmod-of-hash spreading
    * unbiased), clamped to [1, maxFactor]. Keys whose share stays within
    * ~1.5 tasks' fair load don't need salting at all — factor 1, and
    * `saltedAuto` then skips the replication entirely, so the helper is
    * safe to wrap around every large join unconditionally. */
  def measuredSaltFactor(skewed: DataFrame, key: String,
      sampleFraction: Double = 0.05, maxFactor: Int = 64): Int = {
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    require(maxFactor >= 1, s"maxFactor must be >= 1, got $maxFactor")
    val keyOnly = skewed.select(col(key))
    val sampled =
      if (sampleFraction >= 1.0) keyOnly
      else keyOnly.sample(withReplacement = false, sampleFraction, seed = 42L)
    val top = sampled.groupBy(col(key)).agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("top"), sum(col("c")).as("total"))
      .collect()(0)
    if (top.isNullAt(0) || top.getLong(1) == 0L) return 1 // empty sample
    val share = top.getLong(0).toDouble / top.getLong(1)
    val p = skewed.sparkSession.sessionState.conf.numShufflePartitions
    if (share * p <= 1.5) 1
    else {
      val want = math.ceil(share * p).toInt
      math.min(maxFactor, Integer.highestOneBit(math.max(1, want - 1)) << 1)
    }
  }

  /** `salted` with the factor measured by `measuredSaltFactor`. Returns
    * the joined frame plus the factor it chose (1 ⇒ plain join, zero
    * replication overhead) so callers can log the decision. */
  def saltedAuto(skewed: DataFrame, modest: DataFrame, key: String,
      sampleFraction: Double = 0.05, maxFactor: Int = 64): (DataFrame, Int) = {
    val f = measuredSaltFactor(skewed, key, sampleFraction, maxFactor)
    val joined =
      if (f <= 1) skewed.join(modest, Seq(key)) else salted(skewed, modest, key, f)
    (joined, f)
  }
}
