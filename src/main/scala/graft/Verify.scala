package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated name prefixes — run (and emit
    // oracle SQL for) only matching queries, for fast local iteration.
    // The driver always calls with exactly two args.
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, None)
      case Array(a, b, c) => (a, b, Some(c.split(",").toSet))
    }
    def keep(name: String): Boolean =
      only.forall(_.exists(name.startsWith))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Oracle runs are strict: a fired LSH bucket cap aborts loudly here
    // instead of surfacing as an opaque DuckDB hash mismatch (ADVICE r4),
    // and no memoized component labels can leak in from earlier state.
    sys.props("graft.lsh.strict") = "true"
    graft.operators.Dedup.clearCaches()
    val spark = graft.util.GraftSession
      .builder("graft-verify", Some(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ADVICE r7: the time-series DuckDB twins (q103/q105/q106/q109/q110)
    // use DuckDB's TRUNCATING `//` for the hour bucket where Spark uses
    // flooring `div` — identical only for non-negative epochs. Enforce
    // the assumption here so a future pre-1970 dataset fails loudly at
    // the gate instead of surfacing as an opaque hash mismatch.
    val minTs = graft.util.Tables(spark, sfDir, "events")
      .agg(org.apache.spark.sql.functions.min(
        org.apache.spark.sql.functions.expr("unix_micros(ts)"))).head
    require(minTs.isNullAt(0) || minTs.getLong(0) >= 0L,
      s"events.ts has pre-1970 timestamps (min ${minTs.getLong(0)} µs): " +
        "the oracle twins' // truncation diverges from Spark's div there")
    // ADVICE r14 #1: the q139 DuckDB twin derives the decode outcome
    // purely from the magic sniff (family != opaque => real decode
    // assumed to succeed), while the engine degrades failed decodes to
    // the stub. That is sound on the oracle corpora only because no
    // document text happens to START with a sniffable magic ('GIF8',
    // 'RIFF..WAVE', ... as plain ASCII would sniff non-opaque and then
    // fail to decode). Enforce the assumption at the gate so a future
    // data-generator change fails loudly here instead of as an opaque
    // q139 hash mismatch.
    val nonOpaque = graft.operators.Multimodal.assets(spark, sfDir)
      .select("payload").rdd
      .map(r => graft.operators.Multimodal
        .sniffFamily(r.getAs[Array[Byte]](0)))
      .filter(_ != "opaque").count()
    require(nonOpaque == 0L,
      s"$nonOpaque document payloads sniff as a real decoder family: " +
        "the q139 oracle twin assumes text corpora sniff opaque — " +
        "plant and document the expected divergence before re-running")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => keep(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
