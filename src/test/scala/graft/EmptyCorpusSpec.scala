package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.classic.ClassicConversions.castToImpl

/** Degenerate-input robustness at the extreme: EVERY registered query
  * must survive a fully EMPTY (zero-row, schema-correct) corpus — the
  * state of a brand-new deployment, a fully-filtered partition, or a
  * botched load. Spark 4's ANSI mode turns unguarded divisions and
  * empty-literal constructions into query ABORTS, so this sweep is what
  * keeps "no rows yet" from reading as "pipeline down". (Found and fixed
  * the q44 IVF empty-fit crash: zero seed vectors made `assignCell` an
  * unresolvable empty argmax; the fit now short-circuits to an empty
  * model and both query arms return empty frames with the right schema.)
  */
class EmptyCorpusSpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  /** Spark-written empty twins of every table — written with the SAME
    * reader stack as the real tables so physical types (the events
    * TIMESTAMP_NS-as-long column especially) round-trip identically. */
  private lazy val emptyDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_empty").toString
    graft.util.Tables.names.foreach { n =>
      spark.read.parquet(s"/root/testdata/sf0.001/$n.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$tmp/$n.parquet")
    }
    tmp
  }

  test("every registered query plans against a fully empty corpus") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, build) =>
        try {
          castToImpl(build(spark, emptyDir)).queryExecution.executedPlan
          None
        } catch {
          case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} " +
            String.valueOf(e.getMessage).replaceAll("\\s+", " ").take(140))
        }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }

  test("representative families execute end-to-end on the empty corpus") {
    // one per historically fragile family: model fit (q44), event
    // timestamps (q15), mapPartitions sketch (q81), ANSI division
    // guards (q31), LSH (q36), iterative graph (q88), FK audit (q92 —
    // emits its 7 constraint rows with zero counts), census scalars (q93)
    val expectRows = Map("q92_fk_audit" -> 7L, "q93_triangle_census" -> 1L,
      "q128_door_divergence" -> 1L) // one all-zero audit row, guarded div
    Seq("q44_ann_ivf_recall", "q15_sessionize", "q81_heavy_hitters",
      "q31_quality", "q36_minhash_lsh", "q88_textrank", "q92_fk_audit",
      "q93_triangle_census", "q128_door_divergence").foreach { n =>
      val c = SparkEntry.queries(n)(spark, emptyDir).count()
      assert(c == expectRows.getOrElse(n, 0L), s"$n returned $c rows")
    }
  }
}
