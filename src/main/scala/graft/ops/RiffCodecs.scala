package graft.ops

/** Real pure-JVM RIFF container codecs for the multimodal pipeline —
  * AVI video demux and WAV audio metadata, no media library.
  *
  * RIFF is a length-prefixed chunk tree: `'RIFF' size formType` then
  * chunks of `fourcc size payload` (payloads padded to even length);
  * `'LIST' size listType` chunks nest. Everything the pipeline needs
  * sits in well-known chunks:
  *
  *   - AVI ('AVI ' form): the `hdrl` LIST's `avih` chunk carries
  *     µs-per-frame / total-frames / width / height (OpenDML spec,
  *     AVIMAINHEADER); the `movi` LIST's `##dc`/`##db` chunks are the
  *     video frames themselves — for MJPEG each payload is a complete
  *     JPEG, decodable by [[ImageCodecs.decodeJpeg]].
  *   - WAV ('WAVE' form): the `fmt ` chunk carries channels / sample
  *     rate / byte rate / bits-per-sample (WAVEFORMATEX); `data`'s size
  *     over the byte rate is the duration.
  *
  * These parsers power [[Multimodal.sampleFrames]] (real frame seeking:
  * header walk + offset slices, never a full-payload scan per frame)
  * and the audio leg of the decode pass. A truncated or lying size
  * field stops the walk cleanly — undecodable assets dead-letter
  * upstream, they do not throw.
  */
object RiffCodecs {

  /** One demuxed video stream: frame timing from `avih`, every video
    * frame as an (offset, length) slice into the original bytes. */
  final case class AviInfo(
      width: Int, height: Int, usPerFrame: Long, totalFrames: Int,
      frames: Vector[(Int, Int)]) {
    def durationMs: Long = usPerFrame * frames.size / 1000L
  }

  final case class WavInfo(
      channels: Int, sampleRate: Int, bitsPerSample: Int, durationMs: Long)

  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xff
  private def le16(b: Array[Byte], o: Int): Int = (u8(b, o + 1) << 8) | u8(b, o)
  private def le32(b: Array[Byte], o: Int): Int =
    (u8(b, o + 3) << 24) | (u8(b, o + 2) << 16) | (u8(b, o + 1) << 8) | u8(b, o)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def isRiff(b: Array[Byte], form: String): Boolean =
    b != null && b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == form

  /** Container nesting bound. Real AVI/MP4 trees are <10 deep; a crafted
    * file can nest a 12-byte LIST/moov header per level (~10k levels in
    * ~120 KB, every size field valid), and an unbounded recursive walk
    * would StackOverflowError — an Error, not an Exception, so it would
    * escape the Option dead-letter path and kill the task. Deeper
    * subtrees are skipped, the walk continues at the sibling. */
  private val MaxNestDepth = 64

  /** Demux an AVI: frame index + timing, one linear header walk. */
  def decodeAvi(b: Array[Byte]): Option[AviInfo] = {
    if (!isRiff(b, "AVI ")) return None
    var usPerFrame = 0L
    var total = 0
    var w = 0
    var h = 0
    val frames = Vector.newBuilder[(Int, Int)]
    var sawAvih = false

    def isFrameId(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.endsWith("dc") || id.endsWith("db"))

    def walk(start: Int, end: Int, depth: Int): Unit = {
      var o = start
      var ok = true
      while (ok && o + 8 <= end) {
        val id = fourcc(b, o)
        // UNSIGNED size in LONG arithmetic: a 32-bit size near 2^31
        // must trip the truncation guard, not wrap the offsets negative
        val size = le32(b, o + 4).toLong & 0xffffffffL
        if (o + 8L + size > end) ok = false // lying/truncated size
        else {
          val sz = size.toInt
          if (id == "LIST" && sz >= 4 && depth < MaxNestDepth)
            walk(o + 12, o + 8 + sz, depth + 1)
          else if (id == "avih" && sz >= 40) {
            sawAvih = true
            usPerFrame = le32(b, o + 8) & 0xffffffffL
            total = le32(b, o + 8 + 16)
            w = le32(b, o + 8 + 32)
            h = le32(b, o + 8 + 36)
          } else if (isFrameId(id)) frames += ((o + 8, sz))
          o += 8 + sz + (sz & 1) // chunks pad to even offsets
        }
      }
    }

    walk(12, b.length, 0)
    val fs = frames.result()
    if (!sawAvih || usPerFrame <= 0 || fs.isEmpty) None
    else Some(AviInfo(w, h, usPerFrame, if (total > 0) total else fs.size, fs))
  }

  /** MP4 / ISO-BMFF metadata: brand from `ftyp`, duration from `mvhd`.
    *
    * ISO-BMFF is a box tree: `size(be32) type(4cc) payload`, `moov`
    * nests `mvhd` whose version-0 layout carries timescale/duration as
    * be32 at payload offsets 12/16 (version-1: be32 timescale at 20,
    * be64 duration at 24). Frame DEMUX for MP4 needs the full
    * stbl/stsc/stco sample tables — out of scope here (AVI covers real
    * frame seeking); this parser covers the metadata sweep: kind
    * detection, duration, brand. A size-0 ("to end of file") or
    * truncated box stops the walk cleanly. */
  final case class Mp4Info(brand: String, durationMs: Long)

  def decodeMp4(b: Array[Byte]): Option[Mp4Info] = {
    if (b == null || b.length < 12) return None
    def be32(o: Int): Long =
      ((u8(b, o).toLong << 24) | (u8(b, o + 1) << 16) | (u8(b, o + 2) << 8) | u8(b, o + 3)) & 0xffffffffL
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    if (fourcc(b, 4) != "ftyp") return None
    var brand = ""
    var timescale = 0L
    var duration = -1L

    def walk(start: Int, end: Int, depth: Int): Unit = {
      var o = start
      var ok = true
      while (ok && o + 8 <= end) {
        val size = be32(o) // unsigned in a Long — bounds math must not wrap
        val tpe = fourcc(b, o + 4)
        val boxEndL: Long = if (size == 0) end.toLong else o.toLong + size
        if (size == 1 || boxEndL > end || (size != 0 && size < 8)) ok = false // 64-bit/lying sizes: stop
        else {
          val boxEnd = boxEndL.toInt
          if (tpe == "ftyp" && boxEnd >= o + 12) brand = fourcc(b, o + 8)
          else if (tpe == "moov" && depth < MaxNestDepth) walk(o + 8, boxEnd, depth + 1)
          else if (tpe == "mvhd" && boxEnd >= o + 8 + 4) {
            val version = u8(b, o + 8)
            if (version == 0 && boxEnd >= o + 8 + 20) {
              timescale = be32(o + 8 + 12)
              duration = be32(o + 8 + 16)
            } else if (version == 1 && boxEnd >= o + 8 + 32) {
              timescale = be32(o + 8 + 20)
              duration = be64(o + 8 + 24)
            }
          }
          if (size == 0) ok = false else o = boxEnd
        }
      }
    }

    walk(0, b.length, 0)
    if (brand.isEmpty) None
    else Some(Mp4Info(brand,
      if (timescale > 0 && duration >= 0) duration * 1000L / timescale else 0L))
  }

  /** WAV metadata: format chunk + duration from the data chunk size. */
  def decodeWav(b: Array[Byte]): Option[WavInfo] = {
    if (!isRiff(b, "WAVE")) return None
    var channels = 0
    var rate = 0
    var byteRate = 0
    var bits = 0
    var dataLen = -1L
    var o = 12
    var ok = true
    while (ok && o + 8 <= b.length) {
      val id = fourcc(b, o)
      val size = le32(b, o + 4).toLong & 0xffffffffL // unsigned, no wrap
      if (o + 8L + size > b.length) ok = false
      else {
        val sz = size.toInt
        if (id == "fmt " && sz >= 16) {
          channels = le16(b, o + 8 + 2)
          rate = le32(b, o + 8 + 4)
          byteRate = le32(b, o + 8 + 8)
          bits = le16(b, o + 8 + 14)
        } else if (id == "data") dataLen = size
        o += 8 + sz + (sz & 1)
      }
    }
    if (rate <= 0 || byteRate <= 0 || dataLen < 0) None
    else Some(WavInfo(channels, rate, bits, dataLen * 1000L / byteRate))
  }
}
