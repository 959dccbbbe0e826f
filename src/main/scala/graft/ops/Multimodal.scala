package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing — schemas, partition-batched iteration, column
  * contracts — is real and tested, and so are the codecs (pure JVM, no
  * library): [[ImageCodecs]] parses PNG/BMP/GIF/JPEG dimensions,
  * [[RiffCodecs]] demuxes AVI frames and reads WAV format/duration,
  * and [[extractFeatures]] computes folded byte histograms + exact
  * Shannon entropy — the classical content features for binary
  * near-dup and corruption triage. Only headerless synthetic payloads
  * fall back to deterministic stand-ins (raw-dims header, proportional
  * byte slices), keeping the dataflow exercised without a media
  * library.
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

  /** Feature extraction: REAL classical content features from the
    * payload bytes — no stand-ins.
    *
    *   - `features`: the byte histogram folded into `dim` equal bucket
    *     ranges and L1-normalized (each entry = fraction of bytes whose
    *     value falls in that range). The standard cheap content signal
    *     for binary near-dup, format clustering, and corruption triage;
    *     directly consumable by [[SimilaritySearch]] cosine operators.
    *   - `byte_entropy_q`: exact Shannon entropy of the byte
    *     distribution, quantized to milli-bits (0 for a constant
    *     payload, 8000 for uniform bytes) — the classic
    *     compressibility / encrypted-vs-text discriminator.
    *
    * A learned embedding would replace the per-asset computation with a
    * batched model forward pass; the mapPartitions dataflow (batch the
    * partition, amortize setup, never shuffle the bytes) is unchanged. */
  def extractFeatures(assets: Dataset[MediaAsset], dim: Int = 8)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    require(dim > 0 && 256 % dim == 0, s"dim must divide 256, got $dim")
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val hist = new Array[Long](256)
        var i = 0
        while (i < a.bytes.length) { hist(a.bytes(i) & 0xff) += 1; i += 1 }
        val n = a.bytes.length.toDouble
        var entropyBits = 0.0
        if (n > 0) {
          var b = 0
          while (b < 256) {
            if (hist(b) > 0) {
              val p = hist(b) / n
              entropyBits -= p * (math.log(p) / math.log(2.0))
            }
            b += 1
          }
        }
        val span = 256 / dim
        val feats = (0 until dim).map { d =>
          var s = 0L
          var b = d * span
          while (b < (d + 1) * span) { s += hist(b); b += 1 }
          if (n == 0) 0f else (s / n).toFloat
        }
        MediaFeatures(a.asset_id, a.bytes.length.toLong,
          math.round(entropyBits * 1000.0), feats)
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

  /** Full-field audio header decode, one row per decodable asset. */
  final case class AudioInfo(
      asset_id: Long, fmt: String, channels: Int, sample_rate: Int,
      n_units: Long, duration_ms: Long, n_bytes: Long)

  /** Container dispatch by magic — WAV (`RIFF`), FLAC (`fLaC`), OGG
    * (`OggS`, resolving to `vorbis`/`opus` by the first packet's id
    * header), ADTS-AAC (0xFFF sync with layer bits '00' — tested
    * BEFORE MP3, whose Layer III sync shares 0xFFF but carries layer
    * '01'), MP3 (ID3v2 tag or immediate frame sync; magic-gated so a
    * PCM body's stray 0xFF can never be misparsed as MP3), and M4A
    * (ISO-BMFF `ftyp` at offset 4 — resolved to audio only when a
    * `soun` trak with an `mp4a` sample entry exists, so a video MP4
    * still dead-letters here). Header-only walks, all pure JVM
    * ([[RiffCodecs.decodeWav]], [[RiffCodecs.decodeM4a]],
    * [[AudioCodecs]]). */
  private def decodeAnyAudio(b: Array[Byte]): Option[AudioInfo] = {
    if (b == null || b.length < 4) return None
    def u(i: Int) = b(i) & 0xff
    if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')
      RiffCodecs.decodeWav(b).map(w => AudioInfo(0L, "wav", w.channels,
        w.sampleRate, w.samplesPerChannel, w.durationMs,
        b.length.toLong))
    else if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')
      AudioCodecs.decodeFlac(b).map(f => AudioInfo(0L, "flac", f.channels,
        f.sampleRate, f.totalSamples, f.durationMs, b.length.toLong))
    else if (b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S')
      AudioCodecs.decodeOgg(b).map(o => AudioInfo(0L, o.codec, o.channels,
        o.sampleRate, o.totalGranules, o.durationMs, b.length.toLong))
    else if (u(0) == 0xff && (u(1) & 0xf6) == 0xf0)
      // ADTS-AAC shares the 0xFFF sync with MPEG audio; its layer bits
      // are '00' where Layer III's are '01', so this branch must test
      // the tighter mask BEFORE the MP3 one
      AudioCodecs.decodeAdts(b).map(a => AudioInfo(0L, "aac", a.channels,
        a.sampleRate, a.totalSamples, a.durationMs, b.length.toLong))
    else if ((b(0) == 'I' && b(1) == 'D' && b(2) == '3') ||
        (u(0) == 0xff && (u(1) & 0xe0) == 0xe0))
      AudioCodecs.decodeMp3(b).map(m => AudioInfo(0L, "mp3", m.channels,
        m.sampleRate, m.frames.toLong, m.durationMs, b.length.toLong))
    else if (b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y'
        && b(7) == 'p')
      RiffCodecs.decodeM4a(b).map(m => AudioInfo(0L, "m4a", m.channels,
        m.sampleRate, m.totalSamples, m.durationMs, b.length.toLong))
    else if (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M')
      // AIFF/AIFF-C (round 17) — the big-endian IFF mirror of RIFF;
      // seven audio families now dispatch
      AudioCodecs.decodeAiff(b).map(a => AudioInfo(0L, "aiff", a.channels,
        a.sampleRate, a.sampleFrames, a.durationMs, b.length.toLong))
    else None
  }

  /** Audio decode pass: fill meta.sampleRate/durationMs/format from
    * the container header — WAV, MP3 or FLAC ([[decodeAnyAudio]]).
    * Undecodable audio dead-letters, mirroring [[decodeImages]]. */
  def decodeAudio(assets: Dataset[MediaAsset])(implicit spark: SparkSession): Dataset[MediaAsset] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        decodeAnyAudio(a.bytes).map(i => a.copy(meta = a.meta.copy(
          durationMs = i.duration_ms, sampleRate = i.sample_rate,
          format = i.fmt)))
      }
    }
  }

  /** The audio-kind analog of [[decodeVideo]]: every header field the
    * container carries, one row per decodable asset — `n_units` is
    * frames for MP3, total samples for FLAC, per-channel samples for
    * WAV. Undecodable audio dead-letters. */
  def decodeAudioInfo(assets: Dataset[MediaAsset])(implicit spark: SparkSession): Dataset[AudioInfo] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.flatMap(a => decodeAnyAudio(a.bytes).map(_.copy(asset_id = a.asset_id)))
    }
  }

  /** Windowed PCM feature extraction for audio-kind assets
    * ([[RiffCodecs.wavPcmWindows]]): one row per analysis window with
    * integer-exact energy / peak / zero-crossing statistics — the
    * classic VAD/energy front-end, computed straight off the `data`
    * chunk bytes (no float sample materialization, no audio library).
    * Non-PCM or undecodable assets contribute zero rows (dead-letter
    * contract). Same scale shape as [[sampleFrames]]: the explode is
    * row-wise inside mapPartitions, bytes never enter a shuffle key. */
  def audioWindows(
      assets: Dataset[MediaAsset], windowSamples: Int = 1024,
      hop: Int = 1024)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    assets.filter(_.kind == "audio").mapPartitions { it =>
      it.flatMap { a =>
        RiffCodecs.wavPcmWindows(a.bytes, windowSamples, hop).map(w =>
          (a.asset_id, w.start, w.n, w.sumAbs, w.peak, w.zeroCross))
      }
    }.toDF("asset_id", "start_sample", "n_samples",
      "sum_abs", "peak", "zero_crossings")
  }

  /** Video metadata pass: AVI fills dims + frame-clock duration
    * ([[RiffCodecs.decodeAvi]]); MP4/ISO-BMFF fills duration + brand
    * ([[RiffCodecs.decodeMp4]]; its stbl frame index feeds
    * [[sampleFrames]]); MKV/WebM fills duration + doc type + dims
    * ([[RiffCodecs.decodeMkv]] — EBML walk; its Cluster/SimpleBlock
    * demux feeds [[sampleFrames]] too). Undecodable video
    * dead-letters. */
  def decodeVideo(assets: Dataset[MediaAsset])(implicit spark: SparkSession): Dataset[MediaAsset] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        RiffCodecs.decodeAvi(a.bytes).map(v => a.copy(meta = a.meta.copy(
            width = v.width, height = v.height,
            durationMs = v.durationMs, format = "avi")))
          .orElse(RiffCodecs.decodeMp4(a.bytes).map(m => a.copy(meta =
            a.meta.copy(durationMs = m.durationMs, format = m.brand.trim))))
          .orElse(RiffCodecs.decodeMkv(a.bytes).map(m => a.copy(meta =
            a.meta.copy(width = m.width, height = m.height,
              durationMs = m.durationMs, format = m.docType))))
      }
    }
  }

  /** Frame sampling for video-kind assets: one output row per sampled
    * frame at `everyMs` intervals.
    *
    * REAL for all three container formats: AVI ([[RiffCodecs.decodeAvi]]
    * — one header walk indexes every `##dc`/`##db` frame chunk with the
    * `avih` µs-per-frame clock), MP4 ([[RiffCodecs.decodeMp4]] —
    * the video trak's stsz/stco/stsc sample tables resolve to frame
    * slices, with the frame clock derived from the mvhd duration over
    * the frame count), and MKV/WebM ([[RiffCodecs.decodeMkv]] —
    * Cluster/SimpleBlock traversal with all four lacing modes, video
    * tracks selected by TrackEntry number, clock from the Info
    * duration). Each sampled offset maps to its frame index and
    * the payload slice is the actual frame bytes (for MJPEG, a
    * complete JPEG). Undemuxable payloads (headerless synthetic
    * fixtures) keep the proportional byte-slice stand-in so the
    * dataflow stays exercised end-to-end regardless of container.
    *
    * Explode happens row-wise in mapPartitions — no materialized
    * all-frames array; at 100 TB the demux reads each asset's bytes
    * once and emits only sampled frames into the downstream plan. */
  def sampleFrames(assets: Dataset[MediaAsset], everyMs: Long)(
      implicit spark: SparkSession): Dataset[DecodedFrame] = {
    import spark.implicits._
    assets.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap { a =>
        // (durationMs, usPerFrame, frame slices) from whichever
        // container demuxes; MP4 carries no per-frame clock, so derive
        // it from duration/frames (40 ms/frame when mvhd is absent)
        val demux: Option[(Long, Long, Vector[(Int, Int)])] =
          RiffCodecs.decodeAvi(a.bytes) match {
            case Some(avi) =>
              Some((math.max(1L, avi.durationMs), avi.usPerFrame, avi.frames))
            case None => RiffCodecs.decodeMp4(a.bytes) match {
              case Some(m) if m.frames.nonEmpty =>
                val durMs = math.max(1L,
                  if (m.durationMs > 0) m.durationMs else 40L * m.frames.size)
                Some((durMs, math.max(1L, durMs * 1000L / m.frames.size), m.frames))
              case _ => RiffCodecs.decodeMkv(a.bytes) match {
                // MKV: Cluster/SimpleBlock demux (all four lacings);
                // frames arrive timestamp-ordered, clock derived from
                // the Info duration like the MP4 path
                case Some(m) if m.frames.nonEmpty =>
                  val durMs = math.max(1L,
                    if (m.durationMs > 0) m.durationMs else 40L * m.frames.size)
                  Some((durMs, math.max(1L, durMs * 1000L / m.frames.size), m.frames))
                case _ => None
              }
            }
          }
        demux match {
          case Some((durMs, usPerFrame, frames)) =>
            val n = math.max(1L, durMs / everyMs).toInt
            // sampling faster than the frame clock maps several offsets
            // to one container frame: emit each frame ONCE (first
            // offset wins) so (asset_id, frame_index) stays a key
            var lastIdx = -1
            (0 until n).iterator.flatMap { f =>
              val off = f.toLong * everyMs
              val idx = (off * 1000L / usPerFrame).toInt
              if (idx >= frames.size || idx == lastIdx) Iterator.empty
              else {
                lastIdx = idx
                val (fo, fl) = frames(idx)
                Iterator.single(DecodedFrame(a.asset_id, idx, off,
                  java.util.Arrays.copyOfRange(a.bytes, fo, fo + fl)))
              }
            }
          case None =>
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
}
