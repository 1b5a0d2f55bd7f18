package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The custom expressions are reachable from plain SQL. (The
  * GraftExtensions class covers spark-submit's spark.sql.extensions;
  * in-JVM tests share one session, so the post-hoc registrar is used.) */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkTest.session
    GraftFunctions.register(s)
    s
  }

  test("custom functions callable from SQL") {
    val r = spark.sql(
      """SELECT py_float_str(250.0d) AS f,
        |       lp_escape('a\\b"c') AS e,
        |       rolling_min_hash('abcdefghijklmno', 8) AS h""".stripMargin)
      .collect()(0)
    assert(r.getString(0) == "250.0")
    assert(r.getString(1) == """a\\b\"c""")
    assert(r.getLong(2) > 0)
  }

  test("pure-SQL surface: registered table views + custom functions") {
    graft.util.Tables.registerAll(spark, "/root/testdata/sf0.001")
    // a join over the views plus a custom function, no DataFrame API
    val r = spark.sql(
      """SELECT o.o_orderstatus, sum128(CAST(l.l_quantity AS BIGINT)) q
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(r.length == 3 && r.forall(_.getDouble(1) > 0))
    // the events view carries the restored ns->us timestamp column
    val ts = spark.sql("SELECT MIN(ts) FROM events").collect()(0)
    assert(ts.getTimestamp(0) != null)
  }

  test("sum128 aggregate callable from SQL") {
    spark.range(1000).createOrReplaceTempView("ext_nums")
    val s = spark.sql("SELECT sum128(id) AS s FROM ext_nums").collect()(0).getDouble(0)
    assert(s == 499500.0)
  }

  test("vector/hash kernels callable from SQL") {
    val r = spark.sql(
      """SELECT dot_longs(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d,
        |       quantize_vec(array(CAST(1.5 AS FLOAT), CAST(-0.25 AS FLOAT))) AS q,
        |       md5_pair('abc') AS m""".stripMargin).collect()(0)
    assert(r.getLong(0) == 32L) // 4 + 10 + 18
    assert(r.getSeq[Long](1) == Seq(1500000L, -250000L)) // floor(x*1e6+0.5)
    // md5("abc") = 900150983cd24fb0d6963f7d28e17f72
    assert(r.getSeq[Long](2) == Seq(0x900150983cd2L, 0x4fb0d6963f7dL))
  }

  test("shingle_stats callable from SQL") {
    val r = spark.sql(
      "SELECT shingle_stats('a b a b a b').n_shingles AS t, " +
        "shingle_stats('a b a b a b').n_distinct AS d").collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L) // (a b a),(b a b) x2
  }

  test("minhash_sig / simhash_sig callable from SQL, null for sub-width") {
    val r = spark.sql(
      "SELECT size(minhash_sig('a b c d e')) AS n, " +
        "minhash_sig('a b') AS nm, " +
        "simhash_sig('a b c d e') AS sh, " +
        "simhash_sig('a b') AS ns").collect()(0)
    assert(r.getInt(0) == 16)
    assert(r.isNullAt(1), "sub-width minhash must be null")
    assert(!r.isNullAt(2) && r.getLong(2) >= 0L && r.getLong(2) < (1L << 60))
    assert(r.isNullAt(3), "sub-width simhash must be null")
  }

  test("kernels reject wrong-width arrays at analysis time (ADVICE r2)") {
    // array<int> into dot_longs / array<double> into quantize_vec used to
    // read mismatched UnsafeArrayData widths and return garbage silently
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dot_longs(array(1, 2), array(3, 4))").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT quantize_vec(array(1.5, 2.5))").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT md5_pair(42)").collect()
    }
  }
}
