package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing — schemas, partition-batched iteration, column
  * contracts — is real and tested. Image HEADER decode is also real:
  * [[ImageCodecs]] parses PNG/BMP/GIF/JPEG dimensions from raw bytes
  * (pure JVM, no library). What remains deterministic stand-ins (this
  * container has no ML/media libraries): `extractFeatures`' model
  * forward pass and `sampleFrames`' container seeking — each one
  * function swap away from a real implementation; the dataflow around
  * them does not change.
  *
  * Scale notes: per-row work runs in `mapPartitions` so a real decoder
  * amortizes init per partition (the moral equivalent of a batched
  * Pandas UDF); binary payloads never enter a shuffle key; metadata-only
  * transforms (`resizeMeta`) are pure column algebra that never touches
  * the bytes.
  */
object Multimodal {

  final case class MediaMeta(
      width: Int, height: Int, durationMs: Long, sampleRate: Int, format: String)

  final case class MediaAsset(
      asset_id: Long, kind: String, bytes: Array[Byte], meta: MediaMeta)

  final case class DecodedFrame(
      asset_id: Long, frame_index: Int, offset_ms: Long, frame_bytes: Array[Byte])

  final case class MediaFeatures(
      asset_id: Long, n_bytes: Long, byte_entropy_q: Long, features: Seq[Float])

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("durationMs", LongType, nullable = false),
      StructField("sampleRate", IntegerType, nullable = false),
      StructField("format", StringType, nullable = false))), nullable = false)
  ))

  /** Raw-dims fallback for synthetic/headerless payloads: (width,
    * height) as the first 8 bytes big-endian. Real containers are
    * handled by [[ImageCodecs]] first. */
  def decodeHeaderStub(bytes: Array[Byte]): Option[(Int, Int)] =
    if (bytes == null || bytes.length < 8) None
    else {
      def i32(o: Int) = ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
      val (w, h) = (i32(0), i32(4))
      if (w <= 0 || h <= 0) None else Some((w, h))
    }

  /** Decode pass: fill meta.width/height/format from the payload header
    * — REAL codecs for PNG/BMP/GIF/JPEG containers
    * ([[ImageCodecs.decodeHeader]], pure JVM, no library), the raw-dims
    * fallback for headerless synthetic payloads. Undecodable assets
    * dead-letter (dropped from the typed output); partition-batched so
    * per-codec setup amortizes like a batched Pandas UDF. */
  def decodeImages(assets: Dataset[MediaAsset])(implicit spark: SparkSession): Dataset[MediaAsset] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        ImageCodecs.decodeHeader(a.bytes)
          .map(d => a.copy(meta =
            a.meta.copy(width = d.width, height = d.height, format = d.format)))
          .orElse(decodeHeaderStub(a.bytes).map { case (w, h) =>
            a.copy(meta = a.meta.copy(width = w, height = h))
          })
      }
    }
  }

  /** Feature extraction: deterministic per-asset feature vector (STUB —
    * a real extractor would run the model forward pass per batch). */
  def extractFeatures(assets: Dataset[MediaAsset], dim: Int = 8)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        var h = 1469598103934665603L
        var i = 0
        var histNonZero = 0L
        val seen = new Array[Boolean](256)
        while (i < a.bytes.length) {
          h = (h ^ (a.bytes(i) & 0xffL)) * 1099511628211L
          if (!seen(a.bytes(i) & 0xff)) { seen(a.bytes(i) & 0xff) = true; histNonZero += 1 }
          i += 1
        }
        val feats = (0 until dim).map { d =>
          val x = h * (d * 2 + 1)
          (x.toDouble / Long.MaxValue).toFloat
        }
        MediaFeatures(a.asset_id, a.bytes.length.toLong, histNonZero, feats)
      }
    }
  }

  /** Metadata-only resize: pure column algebra, never touches payload
    * bytes — at 100 TB this is the difference between a metadata sweep
    * and a full-corpus rewrite. */
  def resizeMeta(assets: DataFrame, maxDim: Int): DataFrame = {
    val w = col("meta.width")
    val h = col("meta.height")
    val scale = when(greatest(w, h) > maxDim,
      lit(maxDim).cast("double") / greatest(w, h)).otherwise(lit(1.0))
    assets
      .withColumn("target_width", floor(w * scale).cast("int"))
      .withColumn("target_height", floor(h * scale).cast("int"))
      .withColumn("needs_resize", scale < 1.0)
  }

  /** Frame sampling for video-kind assets: one output row per sampled
    * frame at `everyMs` intervals (STUB slices payload bytes; a real
    * implementation seeks the container). Explode happens row-wise in
    * mapPartitions — no array materialization of all frames in memory. */
  def sampleFrames(assets: Dataset[MediaAsset], everyMs: Long)(
      implicit spark: SparkSession): Dataset[DecodedFrame] = {
    import spark.implicits._
    assets.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { a =>
        val n = math.max(1L, a.meta.durationMs / everyMs).toInt
        (0 until n).iterator.map { f =>
          val off = f.toLong * everyMs
          val sliceStart = if (a.bytes.length == 0) 0
            else ((off.toDouble / math.max(1L, a.meta.durationMs)) * a.bytes.length).toInt
          val slice = java.util.Arrays.copyOfRange(
            a.bytes, math.min(sliceStart, a.bytes.length),
            math.min(sliceStart + 16, a.bytes.length))
          DecodedFrame(a.asset_id, f, off, slice)
        }
      }
    }
  }
}
