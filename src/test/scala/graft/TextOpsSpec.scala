package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Internal-consistency checks for the text-analysis operators the
  * per-query oracles can't express (relationships across columns/queries). */
class TextOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  test("q61: three ranked terms per doc, scores consistent and descending") {
    val rows = TextOps.q61Tfidf(spark, dir).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (doc, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L), s"doc $doc")
      // ranking is by (score desc, tok asc); score recomputes from tf, df
      val sorted = rs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach { case Array(a, b) =>
        val better = a.getDouble(5) > b.getDouble(5) ||
          (a.getDouble(5) == b.getDouble(5) &&
            a.getString(2) < b.getString(2))
        assert(better, s"doc $doc rank order broken")
      }
    }
  }

  test("q63: median df sits inside [min_df, max_df]; token counts match") {
    import org.apache.spark.sql.functions._
    val rows = TextOps.q63Rarity(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(3) && r.getLong(2) <= r.getLong(4),
        s"doc ${r.getLong(0)}: med outside [min, max]")
    }
    val nTok = graft.util.Tables(spark, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), size(split(lower(col("text")), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) == nTok(r.getLong(0)),
      s"doc ${r.getLong(0)} token count"))
  }

  test("q64: posting length equals df and ids are sorted ascending") {
    val rows = TextOps.q64InvertedIndex(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ids = r.getString(2).split(",").map(_.toLong).toSeq
      assert(ids.length == r.getLong(1), s"shingle '${r.getString(0)}'")
      assert(ids == ids.sorted, s"shingle '${r.getString(0)}' unsorted")
      assert(ids.distinct == ids, s"shingle '${r.getString(0)}' dup ids")
    }
  }
}
