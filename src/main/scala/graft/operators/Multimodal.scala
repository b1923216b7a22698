package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic fake ([[fakeDecode]]); everything Spark-
  * side — schema, batch iteration, partition-preserving mapPartitions,
  * metadata struct construction — is real and is what matters at 100 TB:
  * payload bytes stay inside the executor partition, only fixed-width
  * features come back out, and nothing is collected to the driver.
  */
object Multimodal {

  /** Feature row produced per asset by the decode/extract stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false),
    StructField("n_frames_sampled", IntegerType, nullable = false)))

  /** Deterministic stand-in for an image/audio decoder. A real deployment
    * swaps this for a codec call (e.g. a JNI/FFI decode) with the same
    * byte-in, fixed-features-out contract; nothing in the surrounding plan
    * changes. Derives pseudo-dimensions/luma from the payload bytes.
    */
  def fakeDecode(assetId: Long, mediaType: String, payload: Array[Byte]): Row = {
    val n = payload.length
    val sum = payload.foldLeft(0L)((a, b) => a + (b & 0xFF))
    val width = 64 + (math.abs(assetId) % 16).toInt * 32
    val height = 64 + (sum % 16).toInt * 32
    val meanLuma = if (n == 0) 0.0 else math.floor(sum.toDouble / n * 1e4 + 0.5) / 1e4
    val frames = if (mediaType == "video") 1 + (n % 8) else 1
    Row(assetId, mediaType, n, width, height, meanLuma, frames)
  }

  /** Build the multimodal asset table from the documents table: payload =
    * utf-8 text bytes standing in for media bytes, media_type derived
    * deterministically, metadata as a typed struct column. (The driver's
    * testdata ships no binary media; the binary column type and plumbing
    * are the point.)
    */
  def assets(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(
        col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "utf-8").as("payload"),
        struct(
          col("source").as("origin"),
          col("n_chars").cast("long").as("payload_len"),
          col("lang").as("tag")).as("meta"))

  /** q30: decode + feature-extract over binary payloads via mapPartitions —
    * batch-shaped (one decoder init per partition, amortized across the
    * partition's rows), partition-preserving, and returning only
    * fixed-width features.
    */
  def q30Multimodal(s: SparkSession, dir: String): DataFrame = {
    val src = assets(s, dir)
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    src.select("asset_id", "media_type", "payload")
      .mapPartitions { rows =>
        // per-partition decoder init would go here (codec handles, buffers)
        rows.map { r =>
          fakeDecode(r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2))
        }
      }(enc)
      .orderBy("asset_id")
  }

  /** Oracle for q30: the fake decode is pure arithmetic over the payload
    * bytes, and the payloads are ASCII text — so DuckDB can replay it
    * (byte sum via per-char ascii()).
    */
  val q30Sql: String =
    """WITH t AS (
      |  SELECT doc_id AS asset_id,
      |    (['image', 'audio', 'video'])[CAST(doc_id % 3 + 1 AS INT)] AS media_type,
      |    text, len(text) AS n
      |  FROM documents),
      |expanded AS (
      |  SELECT asset_id, media_type, text, n,
      |    unnest(generate_series(1, n)) AS i
      |  FROM t),
      |summed AS (
      |  SELECT asset_id, media_type, n, SUM(ascii(substr(text, i, 1))) AS byte_sum
      |  FROM expanded GROUP BY 1, 2, 3)
      |SELECT asset_id, media_type,
      |  CAST(n AS INT) AS payload_bytes,
      |  CAST(64 + (asset_id % 16) * 32 AS INT) AS width,
      |  CAST(64 + (byte_sum % 16) * 32 AS INT) AS height,
      |  FLOOR(CAST(byte_sum AS DOUBLE) / n * 1e4 + 0.5) / 1e4 AS mean_luma,
      |  CAST(CASE WHEN media_type = 'video' THEN 1 + n % 8 ELSE 1 END AS INT) AS n_frames_sampled
      |FROM summed
      |ORDER BY asset_id""".stripMargin

  // --------------------------------------------------------------- q120

  /** Frame geometry for [[q120FrameSample]]: fixed-width pseudo-frames,
    * every `FrameStride`-th sampled — the strided-decode discipline of
    * a video pipeline (decode ONLY the sampled frames; a 2 fps sample
    * of a 30 fps asset touches 1/15th of the payload).
    */
  val FrameBytes = 64
  val FrameStride = 2

  /** Per-sampled-frame row produced by the frame kernel. */
  val frameSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_offset", IntegerType, nullable = false),
    StructField("frame_len", IntegerType, nullable = false),
    StructField("frame_md5", StringType, nullable = false),
    StructField("frame_luma", DoubleType, nullable = false)))

  /** q120: strided frame sampling over video payloads — the OTHER half
    * of the multimodal decode story (q30 extracts one feature row per
    * asset; training pipelines for vision-language models sample
    * FRAMES): each `video` asset's binary payload is treated as
    * consecutive [[FrameBytes]]-byte frames, every [[FrameStride]]-th
    * frame is materialized with its offset, length (the tail frame may
    * be short), content fingerprint, and a luma feature. The kernel is
    * a partition-local flatMap — payload bytes never leave the
    * executor, rows out ∝ frames SAMPLED (not payload size), and the
    * per-frame md5 is the dedup/caching key a frame store would use
    * (re-encode detection at the frame grain). The byte→feature step
    * is the same clearly-marked deterministic stand-in as q30's
    * [[fakeDecode]]; the slicing, striding, and fingerprint plumbing
    * are the real thing.
    */
  def q120FrameSample(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(frameSchema)
    assets(s, dir)
      .filter(col("media_type") === "video")
      .select("asset_id", "payload")
      .mapPartitions { rows =>
        // per-partition codec/digest init, amortized across the batch
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val nFrames = (payload.length + FrameBytes - 1) / FrameBytes
          (0 until nFrames by FrameStride).iterator.map { idx =>
            val off = idx * FrameBytes
            val len = math.min(FrameBytes, payload.length - off)
            val frame = java.util.Arrays.copyOfRange(payload, off, off + len)
            md.reset()
            val hex = md.digest(frame).map("%02x".format(_)).mkString
            val sum = frame.foldLeft(0L)((a, b) => a + (b & 0xFF))
            val luma = math.floor(sum.toDouble / len * 1e4 + 0.5) / 1e4
            Row(id, idx, off, len, hex, luma)
          }
        }
      }(enc)
      .orderBy("asset_id", "frame_idx")
  }

  /** Oracle for q120: payloads are ASCII text bytes, so DuckDB replays
    * the slicing with substr and the fingerprint with md5 (UTF-8 of
    * ASCII = the same bytes).
    */
  val q120Sql: String =
    s"""WITH v AS (
       |  SELECT doc_id AS asset_id, text, len(text) AS n
       |  FROM documents WHERE doc_id % 3 = 2),
       |f AS (
       |  SELECT asset_id, text, n,
       |    unnest(generate_series(0, CAST((n + $FrameBytes - 1) // $FrameBytes AS INT) - 1)) AS frame_idx
       |  FROM v),
       |sampled AS (
       |  SELECT asset_id, CAST(frame_idx AS INT) AS frame_idx,
       |    CAST(frame_idx * $FrameBytes AS INT) AS frame_offset,
       |    CAST(LEAST($FrameBytes, n - frame_idx * $FrameBytes) AS INT) AS frame_len,
       |    substr(text, CAST(frame_idx * $FrameBytes + 1 AS INT), $FrameBytes) AS frame
       |  FROM f WHERE frame_idx % $FrameStride = 0),
       |luma AS (
       |  SELECT asset_id, frame_idx, frame_offset, frame_len, frame,
       |    list_sum(list_transform(generate_series(1, frame_len),
       |      i -> ascii(substr(frame, i, 1)))) AS byte_sum
       |  FROM sampled)
       |SELECT asset_id, frame_idx, frame_offset, frame_len,
       |  md5(frame) AS frame_md5,
       |  FLOOR(CAST(byte_sum AS DOUBLE) / frame_len * 1e4 + 0.5) / 1e4 AS frame_luma
       |FROM luma
       |ORDER BY asset_id, frame_idx""".stripMargin
}
