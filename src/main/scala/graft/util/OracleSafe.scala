package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Helpers that make aggregate results bit-identical between Spark and the
  * DuckDB oracle regardless of partitioning / evaluation order.
  *
  * Summing doubles is order-dependent, and a distributed partial+final agg
  * will not add in the same order as a single-threaded oracle. The fix is
  * fixed-point arithmetic: scale each value to an integer number of 1e-4
  * units with `floor(x*1e4 + 0.5)` (pure IEEE double ops — bit-identical in
  * any engine), aggregate the integers exactly, and divide back once at the
  * end (deterministic double ops again).
  *
  * Why not DECIMAL casts: Spark's double→Decimal cast goes through
  * `BigDecimal.valueOf(double)` → `Double.toString` per row — an allocation
  * + string-format hot path (and a JVM ThreadLocal pathology under long
  * executor uptimes). Scaled longs stay inside whole-stage codegen as plain
  * arithmetic. The exact sums use decimal-from-**long** accumulation
  * (no string path) so they cannot overflow at any scale factor.
  */
object OracleSafe {

  /** x → round-half-up(x * 1e4) as a long. All inputs in the test tables
    * carry ≤2 decimal digits, so this is exact. DuckDB twin:
    * `CAST(floor(x*10000 + 0.5) AS BIGINT)`. */
  def slong(c: Column): Column =
    floor(c * lit(10000.0) + lit(0.5)).cast(LongType)

  // The accumulators are plain LongType sums: whole-stage-codegen'd long
  // adds, no object allocation. (A DecimalType(38,_) accumulator would be
  // stored as BigInteger binary in the agg hash map — per-row BigDecimal
  // get/add/set, ~10-50x slower and JIT-deopt-prone, measured via JFR.)
  // Overflow ceilings are per *group*: ≥9.2e14 in value units for plain
  // sums (≈2e10 rows/group at TPC-H magnitudes) and ≈9.2e18 in 1e-8 units
  // for product sums (≈1e6 rows/group worst-case, ≈1e9 typical). The
  // tested scale factors sit orders of magnitude below both; the 100 TB
  // path swaps in an int128 aggregate (same oracle — DuckDB's SUM(BIGINT)
  // is already exact HUGEINT).

  /** Exact sum of a double column, as double.
    * DuckDB: `CAST(SUM(CAST(floor(x*10000+0.5) AS BIGINT)) AS DOUBLE)/10000.0` */
  def dsum(c: Column): Column =
    (sum(slong(c)).cast("double") / lit(10000.0))

  /** Exact mean, as double. DuckDB: dsum-twin `/ COUNT(x)`. */
  def davg(c: Column): Column =
    (sum(slong(c)).cast("double") / lit(10000.0) / count(c))

  /** Exact `sum(price * (1 - disc))` (TPC-H revenue), as double. The
    * per-row product of two scaled longs fits a long (≤1e13). DuckDB:
    * `CAST(SUM(pl*(10000-dl)) AS DOUBLE)/100000000.0` with pl/dl scaled. */
  def revenue(price: Column, disc: Column): Column =
    (sum(slong(price) * (lit(10000L) - slong(disc))).cast("double") / lit(1.0e8))

  /** Exact `sum(a * b)` of two ≤2-decimal columns, as double. */
  def prodSum(a: Column, b: Column): Column =
    (sum(slong(a) * slong(b)).cast("double") / lit(1.0e8))

  /** Timestamps leave the engine as strings: parquet timestamp *units*
    * (ns vs us) differ between Spark and DuckDB outputs, strings do not. */
  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}
