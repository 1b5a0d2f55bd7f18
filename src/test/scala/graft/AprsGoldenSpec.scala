package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.AprsSchema
import graft.transform.AprsCalibration

/** Byte-exact golden tests: fixtures → transform → compare against lines
  * produced by EXECUTING the reference's own code (tools/golden_gen.py).
  * Covers all ten formats, optional-field subsets, escaping quirks,
  * unicode folding, empty-string suppression, empty-path emission, the
  * stateful calibration sequence (identity → tEQNS → recalibration), the
  * short-vals error-drop, and unknown-format drops. */
class AprsGoldenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  private lazy val fixtures = spark.read
    .schema(AprsSchema.schema.add("_idx", "long"))
    .json(getClass.getResource("/aprs_fixtures.jsonl").getPath)

  private lazy val golden: Seq[Option[String]] =
    scala.io.Source.fromURL(getClass.getResource("/aprs_golden.txt"))
      .getLines().map(l => if (l == "\\N") None else Some(l)).toSeq

  test("all fixtures match the reference's own output byte-for-byte") {
    val got = AprsCalibration.replay(fixtures, col("_idx"))
      .select($"_idx", $"line")
      .collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)))
      .toMap
    assert(got.size == golden.size)
    golden.zipWithIndex.foreach { case (expected, i) =>
      assert(got(i.toLong) == expected,
        s"\nfixture #$i\n  expected: $expected\n  got:      ${got(i.toLong)}")
    }
  }

  test("drops: telemetry-message, unknown formats, malformed telemetry emit nothing") {
    val n = golden.count(_.isEmpty)
    val dropped = AprsCalibration.replay(fixtures, col("_idx"))
      .filter($"line".isNull).count()
    assert(dropped == n)
  }
}
