package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** Cross-checks between the dedup family members — relationships the
  * per-query oracles cannot express (they compare one query at a time). */
class DedupSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  test("q36 (MinHash LSH) finds a subset of q35 (exact Jaccard) pairs") {
    val exact = Dedup.q35NgramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val lsh = Dedup.q36MinHashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(lsh.nonEmpty, "LSH found no pairs at all")
    lsh.foreach { p =>
      assert(exact.contains(p), s"LSH pair $p not in exact pairs")
    }
  }

  test("q45 (grid-blocked) equals q43 (brute force) exactly") {
    val brute = Similarity.q43EmbeddingDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val blocked = Similarity.q45EmbeddingDedupBlocked(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(blocked == brute,
      s"blocked=${blocked.take(5)}... brute=${brute.take(5)}...")
  }

  test("q37 (SimHash) pairs respect the hamming bound and ordering") {
    val rows = Dedup.q37SimHash(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(2) <= 10) // bit_count yields int
    }
  }
}
