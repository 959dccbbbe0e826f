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

    def walk(start: Int, end: Int): Unit = {
      var o = start
      var ok = true
      while (ok && o + 8 <= end) {
        val id = fourcc(b, o)
        val size = le32(b, o + 4)
        if (size < 0 || o + 8 + size > end) ok = false // lying/truncated size
        else {
          if (id == "LIST" && size >= 4) walk(o + 12, o + 8 + size)
          else if (id == "avih" && size >= 40) {
            sawAvih = true
            usPerFrame = le32(b, o + 8) & 0xffffffffL
            total = le32(b, o + 8 + 16)
            w = le32(b, o + 8 + 32)
            h = le32(b, o + 8 + 36)
          } else if (isFrameId(id)) frames += ((o + 8, size))
          o += 8 + size + (size & 1) // chunks pad to even offsets
        }
      }
    }

    walk(12, b.length)
    val fs = frames.result()
    if (!sawAvih || usPerFrame <= 0 || fs.isEmpty) None
    else Some(AviInfo(w, h, usPerFrame, if (total > 0) total else fs.size, fs))
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
      val size = le32(b, o + 4)
      if (size < 0 || o + 8 + size > b.length) ok = false
      else {
        if (id == "fmt " && size >= 16) {
          channels = le16(b, o + 8 + 2)
          rate = le32(b, o + 8 + 4)
          byteRate = le32(b, o + 8 + 8)
          bits = le16(b, o + 8 + 14)
        } else if (id == "data") dataLen = size.toLong
        o += 8 + size + (size & 1)
      }
    }
    if (rate <= 0 || byteRate <= 0 || dataLen < 0) None
    else Some(WavInfo(channels, rate, bits, dataLen * 1000L / byteRate))
  }
}
