package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Determinism strategy: embeddings are quantized to 1e-6 fixed-point
  * longs once per row; dot products and squared norms are then **integer**
  * sums (≤2^46 — exactly representable even as doubles), so the cosine is
  * bit-identical in any engine and any partitioning/accumulation order.
  *
  * Scale design: the query set is tiny → broadcast; the corpus side
  * streams map-side (brute force = one pass, no shuffle except the final
  * per-query top-k). The LSH variant buckets by random-hyperplane signs so
  * each query probes one bucket (candidates ≪ corpus); recall@k against
  * the exact top-k is reported as part of the query output.
  */
object Similarity {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")

  /** vec_id, e (scaled longs), nrm (double sqrt of exact integer ssq). */
  private def scaled(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    emb(s, dir)
      .withColumn("e", expr(
        // explicit double cast: a float32*literal product must not round
        // in single precision (DuckDB would — its 1e6 literal is DECIMAL)
        "transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0 + 0.5) as long))"))
      .withColumn("ssq", expr(
        "aggregate(e, cast(0 as long), (acc, x) -> acc + x * x)"))
      .withColumn("nrm", sqrt($"ssq".cast("double")))
      .select($"vec_id", $"e", $"nrm")
  }

  // ---------------------------------------------------------------- q38
  /** Brute-force cosine top-5 for the first 10 vectors as queries. */
  def q38AnnBrute(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val base = scaled(s, dir)
    val q = base.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"e".as("qe"), $"nrm".as("qn"))
    val joined = base.join(broadcast(q), $"vec_id" =!= $"qid")
      .withColumn("dot", expr(
        "aggregate(zip_with(qe, e, (x, y) -> x * y), cast(0 as long), (acc, x) -> acc + x)"))
      .withColumn("sim", $"dot".cast("double") / ($"qn" * $"nrm"))
    val w = Window.partitionBy($"qid").orderBy($"sim".desc, $"vec_id".asc)
    joined.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .select($"qid", $"vec_id".as("nid"), $"rk".cast("long").as("rk"), $"sim")
      .orderBy($"qid", $"rk")
  }

  // ---------------------------------------------------------------- q39
  /** Sign-LSH bucketed ANN + self-reported recall@5 vs the exact top-5.
    * Two hash tables of 4 hyperplanes each (md5-derived ±1 components →
    * 16 buckets/table); a query's candidates are vectors sharing a bucket
    * in EITHER table — the standard multi-table LSH recall/candidate
    * trade-off. Output: per-query candidate count and recall@5. */
  def q39AnnLshRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val base = scaled(s, dir)
    // deterministic Rademacher hyperplanes, computed once on the driver —
    // a broadcast constant at scale, not per-row hash work.
    val signs: Seq[Seq[Long]] = (0 until 8).map { p =>
      (1 to 64).map { d =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p,$d".getBytes("UTF-8"))
        if ((h(0) & 0x80) == 0) 1L else -1L
      }
    }
    def bucketExpr(lo: Int, hi: Int) = expr(
      s"aggregate(sequence($lo, $hi), cast(0 as long), (acc, p) -> acc + " +
        "if(aggregate(sequence(1, 64), cast(0 as long), " +
        "     (a2, dd) -> a2 + element_at(element_at(signs, p+1), dd) * element_at(e, dd)" +
        ") >= 0, shiftleft(cast(1 as long), p), cast(0 as long)))")
    val bucketed = base
      .withColumn("signs", typedLit(signs))
      .withColumn("b1", bucketExpr(0, 3))
      .withColumn("b2", bucketExpr(4, 7))
      .drop("signs")
    val tabs = bucketed.select($"vec_id",
        explode(expr("array(struct(1 as tb, b1 as bk), struct(2 as tb, b2 as bk))")).as("x"))
      .select($"vec_id", $"x.tb".as("tb"), $"x.bk".as("bk"))
    val qtabs = tabs.filter($"vec_id" < 10).withColumnRenamed("vec_id", "qid")
    val candIds = tabs.join(broadcast(qtabs), Seq("tb", "bk"))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id").distinct()
    val q = base.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"e".as("qe"), $"nrm".as("qn"))
    def topk(joined: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id").asc)
      joined.withColumn("dot", expr(
          "aggregate(zip_with(qe, e, (x, y) -> x * y), cast(0 as long), (acc, x) -> acc + x)"))
        .withColumn("sim", col("dot").cast("double") / (col("qn") * col("nrm")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("qid"), col("vec_id").as("nid"))
    }
    val exact = topk(base.join(broadcast(q), $"vec_id" =!= $"qid"))
    val ann = topk(candIds.join(base, "vec_id").join(broadcast(q), "qid"))
    val nCand = candIds.groupBy($"qid").agg(count(lit(1)).as("n_candidates"))
    val hits = exact.as("x").join(ann.as("a"), Seq("qid", "nid"), "left_semi")
      .groupBy($"qid").agg(count(lit(1)).as("n_hit"))
    q.select($"qid").join(nCand, Seq("qid"), "left")
      .join(hits, Seq("qid"), "left")
      .na.fill(0L, Seq("n_candidates", "n_hit"))
      .withColumn("recall", $"n_hit".cast("double") / 5.0)
      .select($"qid", $"n_candidates", $"n_hit", $"recall")
      .orderBy($"qid")
  }

  // ---------------------------------------------------------------- q43
  /** Embedding-cosine near-duplicate detection (the dedup family's vector
    * variant): all pairs with cosine ≥ 0.45 — fixed-point-exact like q38,
    * so the full pairwise pipeline is oracle-checked. At scale the
    * all-pairs stage is replaced by the q39 bucketing; threshold + exact
    * arithmetic stay identical. */
  def q43EmbeddingDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = scaled(s, dir)
    val a = base.select($"vec_id".as("i"), $"e".as("ea"), $"nrm".as("na"))
    val b = base.select($"vec_id".as("j"), $"e".as("eb"), $"nrm".as("nb"))
    a.join(b, $"i" < $"j")
      .withColumn("dot", expr(
        "aggregate(zip_with(ea, eb, (x, y) -> x * y), cast(0 as long), (acc, x) -> acc + x)"))
      .withColumn("cosine", $"dot".cast("double") / ($"na" * $"nb"))
      .filter($"cosine" >= 0.45)
      .select($"i", $"j", $"cosine")
      .orderBy($"i", $"j")
  }

  // ---------------------------------------------------------------- q44
  /** IVF-style ANN: corpus assigned to nearest of 16 deterministic
    * centroids (the first 16 vectors — a stand-in for k-means at this
    * scale); each query probes only its own cell. Self-reported recall@5
    * like q39. Rows-only check (the IVF assignment is Spark-side). */
  def q44AnnIvfRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val base = scaled(s, dir)
    val cents = base.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"e".as("ce"), $"nrm".as("cn"))
    val wAssign = Window.partitionBy($"vec_id")
      .orderBy($"csim".desc, $"cid".asc)
    val assigned = base.join(broadcast(cents), lit(true))
      .withColumn("cdot", expr(
        "aggregate(zip_with(e, ce, (x, y) -> x * y), cast(0 as long), (acc, x) -> acc + x)"))
      .withColumn("csim", $"cdot".cast("double") / ($"nrm" * $"cn"))
      .withColumn("crk", row_number().over(wAssign))
      .filter($"crk" === 1)
      .select($"vec_id", $"e", $"nrm", $"cid".as("cell"))
    val q = assigned.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"e".as("qe"), $"nrm".as("qn"), $"cell".as("qcell"))
    def topk(joined: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id").asc)
      joined.withColumn("dot", expr(
          "aggregate(zip_with(qe, e, (x, y) -> x * y), cast(0 as long), (acc, x) -> acc + x)"))
        .withColumn("sim", col("dot").cast("double") / (col("qn") * col("nrm")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("qid"), col("vec_id").as("nid"))
    }
    val exact = topk(assigned.join(broadcast(q), $"vec_id" =!= $"qid"))
    val annCand = assigned.join(broadcast(q),
      $"vec_id" =!= $"qid" && $"cell" === $"qcell")
    val ann = topk(annCand)
    val nCand = annCand.groupBy($"qid").agg(count(lit(1)).as("n_candidates"))
    val hits = exact.as("x").join(ann.as("a"), Seq("qid", "nid"), "left_semi")
      .groupBy($"qid").agg(count(lit(1)).as("n_hit"))
    q.select($"qid").join(nCand, Seq("qid"), "left")
      .join(hits, Seq("qid"), "left")
      .na.fill(0L, Seq("n_candidates", "n_hit"))
      .withColumn("recall", $"n_hit".cast("double") / 5.0)
      .select($"qid", $"n_candidates", $"n_hit", $"recall")
      .orderBy($"qid")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_ann_brute" -> (q38AnnBrute _),
    "q39_ann_lsh_recall" -> (q39AnnLshRecall _),
    "q43_embedding_dedup" -> (q43EmbeddingDedup _),
    "q44_ann_ivf_recall" -> (q44AnnIvfRecall _),
  )

  private val scaledCte =
    """WITH s AS (SELECT vec_id,
      |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) e
      |  FROM embeddings),
      |n AS (SELECT vec_id, e,
      |  sqrt(CAST(list_inner_product(list_transform(e, x -> CAST(x AS DOUBLE)),
      |                               list_transform(e, x -> CAST(x AS DOUBLE))) AS DOUBLE)) nrm
      |  FROM s)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q38_ann_brute" ->
      s"""$scaledCte,
        |p AS (SELECT q.vec_id qid, c.vec_id nid,
        |        list_inner_product(list_transform(q.e, x -> CAST(x AS DOUBLE)),
        |                           list_transform(c.e, x -> CAST(x AS DOUBLE)))
        |          / (q.nrm * c.nrm) sim
        |      FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |r AS (SELECT qid, nid, sim,
        |        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) rk
        |      FROM p)
        |SELECT qid, nid, CAST(rk AS BIGINT) AS rk, sim FROM r
        |WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,
    "q43_embedding_dedup" ->
      s"""$scaledCte
        |SELECT a.vec_id i, b.vec_id j,
        |  list_inner_product(list_transform(a.e, x -> CAST(x AS DOUBLE)),
        |                     list_transform(b.e, x -> CAST(x AS DOUBLE)))
        |    / (a.nrm * b.nrm) AS cosine
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE list_inner_product(list_transform(a.e, x -> CAST(x AS DOUBLE)),
        |                         list_transform(b.e, x -> CAST(x AS DOUBLE)))
        |    / (a.nrm * b.nrm) >= 0.45
        |ORDER BY i, j""".stripMargin,
  )
}
