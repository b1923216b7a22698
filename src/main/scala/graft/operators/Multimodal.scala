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
}
