package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata +
  * decode/feature-extract/frame-sample stages, as a 100 TB training-data
  * pipeline would run them.
  *
  * The decode stage dispatches on payload magic bytes: PNG/JPEG payloads
  * go through a REAL pixel decode ([[ImageDecoder]], javax.imageio — in
  * the JDK, no external dependency); other modalities (audio PCM, video
  * containers — no codec in this container) fall back to the clearly
  * marked deterministic stub ([[DecoderStub]]). Everything Spark-side —
  * schema, binary column handling, partition-wise batch decode via
  * mapPartitions, frame explosion, metadata pushdown — is real and
  * oracle-tested. Payloads are derived from `documents.text` bytes
  * (the driver's table; no synthetic inputs).
  */
object Multimodal {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** documents → opaque binary payload + typed metadata, as a real
    * multimodal table would look (payload is the text's UTF-8 bytes). */
  def assets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .withColumn("payload", $"text".cast("binary"))
      .withColumn("n_bytes", octet_length($"payload").cast("long"))
      .withColumn("mime", lit("application/octet-stream"))
      .withColumn("n_frames",
        least(greatest(expr("n_bytes div 100"), lit(1L)), lit(8L)))
      .select($"doc_id", $"payload", $"n_bytes", $"mime", $"n_frames")
  }

  // ---------------------------------------------------------------- q40
  /** Frame sampling: explode each asset into per-frame rows with a
    * deterministic per-frame content hash — the shape of a video/audio
    * frame-extraction stage (metadata travels, payload stays opaque). */
  def q40FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir)
      .filter($"doc_id" < 50)
      .withColumn("frame_idx", explode(expr("sequence(0, n_frames - 1)")))
      .withColumn("frame_hash",
        md5(concat($"payload", lit(":".getBytes("UTF-8")), $"frame_idx".cast("string").cast("binary"))))
      .select($"doc_id", $"n_bytes", $"n_frames", $"frame_idx", $"frame_hash")
      .orderBy($"doc_id", $"frame_idx")
  }

  // ---------------------------------------------------------------- q55
  /** Frame-level dedup accounting: duplicate payloads yield identical
    * per-frame content hashes, so distinct-vs-total frame counts give the
    * content-addressable-storage savings a multimodal pipeline plans
    * around. One explode + two partial aggregates, grouped by asset size
    * class (n_frames). */
  def q55FrameDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    assets(s, dir)
      .withColumn("frame_idx", explode(expr("sequence(0, n_frames - 1)")))
      .withColumn("frame_hash",
        md5(concat($"payload", lit(":".getBytes("UTF-8")), $"frame_idx".cast("string").cast("binary"))))
      .groupBy($"n_frames")
      .agg(countDistinct($"doc_id").as("n_assets"),
        count(lit(1)).as("total_frames"),
        countDistinct($"frame_hash").as("distinct_frames"))
      .withColumn("dup_ratio",
        ($"total_frames" - $"distinct_frames").cast("double") /
          $"total_frames".cast("double"))
      .orderBy($"n_frames")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_frame_sample" -> (q40FrameSample _),
    "q55_frame_dedup" -> (q55FrameDedup _),
  )

  val oracle: Map[String, String] = Map(
    // equal-length unnests in one SELECT are zipped positionally in DuckDB
    "q40_frame_sample" ->
      """SELECT * FROM (
        |  SELECT doc_id, n_bytes, n_frames,
        |    unnest(range(n_frames)) AS frame_idx,
        |    md5(text || ':' || CAST(unnest(range(n_frames)) AS VARCHAR)) AS frame_hash
        |  FROM (SELECT doc_id, text,
        |          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |          least(greatest(CAST(octet_length(encode(text)) AS BIGINT) // 100, 1), 8) AS n_frames
        |        FROM documents WHERE doc_id < 50) a) b
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q55_frame_dedup" ->
      """WITH f AS (
        |  SELECT doc_id, n_frames,
        |    md5(text || ':' || CAST(unnest(range(n_frames)) AS VARCHAR)) AS frame_hash
        |  FROM (SELECT doc_id, text,
        |          least(greatest(CAST(octet_length(encode(text)) AS BIGINT) // 100, 1), 8) AS n_frames
        |        FROM documents) a)
        |SELECT n_frames,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_assets,
        |  CAST(COUNT(*) AS BIGINT) AS total_frames,
        |  CAST(COUNT(DISTINCT frame_hash) AS BIGINT) AS distinct_frames,
        |  CAST(COUNT(*) - COUNT(DISTINCT frame_hash) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS dup_ratio
        |FROM f GROUP BY n_frames ORDER BY n_frames""".stripMargin,
  )

  // ------------------------------------------------------------ decode
  /** Real image decode: PNG/JPEG bytes → pixels (javax.imageio) → a
    * deterministic [[DecoderStub.featureDim]]-float descriptor:
    * [mean R, mean G, mean B, mean luminance, 2×2 luminance grid], all
    * normalized to [0, 1]. Integer pixel sums (getRGB is exact for the
    * lossless formats) divided once at the end, so the vector is
    * bit-stable across runs and partitionings. Luminance uses the
    * BT.601 integer weights (299/587/114 per mille). */
  object ImageDecoder {
    def isPng(p: Array[Byte]): Boolean =
      p.length >= 8 && p(0) == 0x89.toByte && p(1) == 'P'.toByte &&
        p(2) == 'N'.toByte && p(3) == 'G'.toByte
    def isJpeg(p: Array[Byte]): Boolean =
      p.length >= 3 && p(0) == 0xff.toByte && p(1) == 0xd8.toByte &&
        p(2) == 0xff.toByte
    def isImage(p: Array[Byte]): Boolean = isPng(p) || isJpeg(p)

    def decodeOne(payload: Array[Byte]): Array[Float] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null,
        "payload carries an image signature but no installed reader decodes it")
      val (w, h) = (img.getWidth, img.getHeight)
      var (rs, gs, bs) = (0L, 0L, 0L)
      val lumSum = new Array[Long](4) // quadrant index qy*2 + qx
      val lumCnt = new Array[Long](4)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          rs += r; gs += g; bs += b
          val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
          lumSum(q) += 299L * r + 587L * g + 114L * b
          lumCnt(q) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val out = new Array[Float](DecoderStub.featureDim)
      out(0) = (rs / (n * 255.0)).toFloat
      out(1) = (gs / (n * 255.0)).toFloat
      out(2) = (bs / (n * 255.0)).toFloat
      out(3) = (lumSum.sum / (n * 255000.0)).toFloat
      var q = 0
      while (q < 4) {
        out(4 + q) = if (lumCnt(q) == 0) 0.0f
          else (lumSum(q) / (lumCnt(q) * 255000.0)).toFloat
        q += 1
      }
      out
    }
  }

  /** STUBBED decode for the modalities this container has no codec for
    * (audio PCM, video containers). Produces deterministic fake features
    * so the distributed plumbing (partition-wise batching, schema, memory
    * shape) is fully testable; swap `decodeOne` for a real codec in
    * production, exactly as [[ImageDecoder]] does for PNG/JPEG. */
  object DecoderStub {
    val featureDim = 8
    /** >>> STUB <<< — replace with a real decoder. Derives featureDim
      * floats from the payload bytes deterministically. */
    def decodeOne(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](featureDim)
      var i = 0
      while (i < payload.length) {
        out(i % featureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("features", ArrayType(FloatType))))

  /** Partition-wise batch decode: one decoder init per partition (the
    * pattern a heavyweight codec needs), constant memory per batch.
    * Dispatches on payload magic: real image decode for PNG/JPEG, the
    * stub for everything else. */
  def decodeFeatures(s: SparkSession, assetsDf: DataFrame): DataFrame = {
    val rdd = assetsDf.select("doc_id", "payload").rdd.mapPartitions { it =>
      // per-partition decoder init: never spill ImageIO scratch to an
      // executor temp file — decode stays in-memory per batch
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val p = r.getAs[Array[Byte]](1)
        val f = if (ImageDecoder.isImage(p)) ImageDecoder.decodeOne(p)
          else DecoderStub.decodeOne(p)
        Row(r.getLong(0), f.toSeq)
      }
    }
    s.createDataFrame(rdd, decodedSchema)
  }
}
