package graft.ops

/** Pure-JVM header parsers for the audio containers a crawl corpus
  * actually carries beside WAV: MPEG-1 Layer III (frame-header sync
  * walk over the published bitrate/samplerate tables, ID3v2 skip),
  * FLAC (METADATA_BLOCK walk to STREAMINFO's packed bit fields), and
  * OGG (page walk to the first packet's Vorbis/Opus identification
  * header, last-page granule for duration). Like every codec in this
  * module ([[ImageCodecs]], [[RiffCodecs]]) these read HEADERS ONLY —
  * no sample decode, no audio library — so the per-asset cost is
  * O(frames) table lookups for MP3, O(blocks) for FLAC, O(pages) for
  * OGG, and the walk is bounds-checked at every step (garbage bytes
  * return None, the dead-letter contract).
  *
  * Format sources: the MPEG-1 audio frame header layout and Layer III
  * bitrate/samplerate tables (ISO/IEC 11172-3), the ID3v2.3 tag header
  * with syncsafe sizes, the FLAC format spec (RFC 9639) STREAMINFO
  * packing (20-bit sample rate, 3-bit channels-1, 5-bit bps-1, 36-bit
  * total samples), the OGG page layout (RFC 3533 §6: capture pattern,
  * 64-bit granule position, segment lacing table), the Vorbis I
  * identification header (§4.2.2: version/channels/rate/bitrates/
  * blocksizes/framing) and the OpusHead layout (RFC 7845 §5.1:
  * version/channels/pre-skip/input rate/gain/mapping family, with the
  * 48 kHz granule clock and pre-skip subtraction for duration).
  *
  * reference analog: none (engine-side training-data surface). */
object AudioCodecs {

  /** One parsed MP3 stream: header fields of the walked frames plus
    * the Layer III duration estimate (1152 samples per MPEG-1 frame). */
  final case class Mp3Info(
      channels: Int, sampleRate: Int, bitrateKbps: Int, frames: Int,
      durationMs: Long)

  /** STREAMINFO contents; duration derives exactly from
    * totalSamples/sampleRate. */
  final case class FlacInfo(
      channels: Int, sampleRate: Int, bitsPerSample: Int, totalSamples: Long,
      durationMs: Long)

  /** MPEG-1 Layer III bitrate table (kbps), index 1..14 (0 = free,
    * 15 = invalid). */
  private[ops] val Mp3Bitrates: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sample rates, index 0..2 (3 = reserved). */
  private[ops] val Mp3SampleRates: Array[Int] = Array(44100, 48000, 32000)

  /** Layer III samples per frame (MPEG-1). */
  private[ops] val Mp3SamplesPerFrame = 1152

  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xff

  /** ID3v2 syncsafe 28-bit size (7 bits per byte). */
  private def syncsafe(b: Array[Byte], o: Int): Int =
    ((b(o) & 0x7f) << 21) | ((b(o + 1) & 0x7f) << 14) |
      ((b(o + 2) & 0x7f) << 7) | (b(o + 3) & 0x7f)

  /** Walk an MPEG-1 Layer III stream: optional ID3v2 skip, sync scan,
    * then header-to-header hops via the frame-length formula
    * `144 · bitrate / sampleRate + padding`. Stops cleanly at a
    * truncated tail; None when no complete frame parses. */
  def decodeMp3(b: Array[Byte]): Option[Mp3Info] = {
    if (b == null || b.length < 4) return None
    var o = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3')
      o = 10 + syncsafe(b, 6)
    // scan to the first frame sync (11 set bits)
    while (o + 4 <= b.length &&
      !(u8(b, o) == 0xff && (u8(b, o + 1) & 0xe0) == 0xe0)) o += 1
    var frames = 0
    var sr = 0
    var kbps = 0
    var channels = 0
    var ok = true
    while (ok && o + 4 <= b.length &&
        u8(b, o) == 0xff && (u8(b, o + 1) & 0xe0) == 0xe0) {
      val version = (u8(b, o + 1) >> 3) & 3 // 3 = MPEG-1
      val layer = (u8(b, o + 1) >> 1) & 3 // 1 = Layer III
      val brIdx = (u8(b, o + 2) >> 4) & 15
      val srIdx = (u8(b, o + 2) >> 2) & 3
      val pad = (u8(b, o + 2) >> 1) & 1
      if (version != 3 || layer != 1 || brIdx == 0 || brIdx == 15 || srIdx == 3)
        ok = false
      else {
        sr = Mp3SampleRates(srIdx)
        kbps = Mp3Bitrates(brIdx)
        channels = if (((u8(b, o + 3) >> 6) & 3) == 3) 1 else 2
        val flen = 144 * kbps * 1000 / sr + pad
        if (flen < 4 || o + flen > b.length) ok = false
        else { frames += 1; o += flen }
      }
    }
    if (frames == 0) None
    else Some(Mp3Info(channels, sr, kbps, frames,
      frames.toLong * Mp3SamplesPerFrame * 1000L / sr))
  }

  /** One parsed OGG stream: the embedded codec's identification-header
    * fields plus the last page's granule position. For Vorbis the
    * granule IS the PCM sample count at `sampleRate`; for Opus it
    * ticks a 48 kHz clock and playback drops `preSkip` samples, so
    * `durationMs = (granule − preSkip) / 48`. `sampleRate` is the
    * Vorbis rate / the informational Opus input rate. */
  final case class OggInfo(
      codec: String, channels: Int, sampleRate: Int, preSkip: Int,
      totalGranules: Long, durationMs: Long)

  private def le16(b: Array[Byte], o: Int): Int = u8(b, o) | (u8(b, o + 1) << 8)

  private def le32(b: Array[Byte], o: Int): Int =
    u8(b, o) | (u8(b, o + 1) << 8) | (u8(b, o + 2) << 16) | (u8(b, o + 3) << 24)

  private def le64(b: Array[Byte], o: Int): Long = {
    var v = 0L; var i = 7
    while (i >= 0) { v = (v << 8) | u8(b, o + i); i -= 1 }
    v
  }

  private def hasMagic(b: Array[Byte], o: Int, magic: String): Boolean =
    o + magic.length <= b.length &&
      magic.indices.forall(i => b(o + i) == magic.charAt(i).toByte)

  /** Walk an OGG stream (RFC 3533): dispatch on the FIRST packet of the
    * first page — the Vorbis identification header (0x01"vorbis") or
    * OpusHead — then hop page headers (27 + lacing table + summed
    * lacing values) to the last page's granule position. A granule of
    * −1 ("no packet finishes on this page") never overwrites the
    * running value. Truncated tails stop cleanly at the last complete
    * page; garbage returns None.
    *
    * The identification-header reassembly crosses page boundaries
    * (round 17): a first packet whose page-1 lacing table ends on a
    * 255 value legally CONTINUES on page 2 (RFC 3533 §5–6, header-type
    * flag 0x01) — never emitted by mainstream encoders, whose id
    * headers fit one page, but recoverable and present in real crawl
    * audio. The walk honors the continuation-flag discipline both ways
    * (page 1 must not be flagged continued; a continuation page must
    * be) and caps the assembled packet at 64 KiB so a crafted all-255
    * stream dead-letters instead of buffering without bound. */
  def decodeOgg(b: Array[Byte]): Option[OggInfo] = {
    if (b == null || b.length < 28 || !hasMagic(b, 0, "OggS") || b(4) != 0)
      return None
    // ---- packet-1 reassembly across pages: collect (offset, length)
    // slices until a lacing value < 255 terminates the packet
    var pageOff = 0
    var plen = 0
    var complete = false
    var valid = true
    var firstPage = true
    var slices = List.empty[(Int, Int)]
    while (!complete && valid) {
      if (pageOff + 27 > b.length || !hasMagic(b, pageOff, "OggS") ||
          b(pageOff + 4) != 0) valid = false
      else {
        val continued = (u8(b, pageOff + 5) & 1) != 0
        // the continuation flag must MATCH the walk state — a flagged
        // first page or an unflagged follow-up is a torn stream
        if (continued == firstPage) valid = false
        else {
          val nseg = u8(b, pageOff + 26)
          if (nseg == 0 || pageOff + 27 + nseg > b.length) valid = false
          else {
            var i = 0
            var part = 0
            while (i < nseg && !complete) {
              val l = u8(b, pageOff + 27 + i); part += l
              if (l < 255) complete = true
              i += 1
            }
            // full page length (all segments) to hop to the next page
            var dlen = part
            var j = i
            while (j < nseg) { dlen += u8(b, pageOff + 27 + j); j += 1 }
            val dstart = pageOff + 27 + nseg
            if (dstart + dlen > b.length || plen + part > 65536) valid = false
            else {
              slices = slices :+ ((dstart, part))
              plen += part
              pageOff = dstart + dlen
              firstPage = false
            }
          }
        }
      }
    }
    if (!valid || !complete) return None
    val pkt = new Array[Byte](plen)
    var w = 0
    slices.foreach { case (off, l) =>
      System.arraycopy(b, off, pkt, w, l); w += l
    }
    val head: Option[(String, Int, Int, Int)] = // codec, channels, rate, preSkip
      if (plen >= 30 && pkt(0) == 0x01 && hasMagic(pkt, 1, "vorbis")) {
        val version = le32(pkt, 7)
        val ch = u8(pkt, 11)
        val sr = le32(pkt, 12)
        if (version != 0 || ch == 0 || sr <= 0) None
        else Some(("vorbis", ch, sr, 0))
      } else if (plen >= 19 && hasMagic(pkt, 0, "OpusHead")) {
        val version = u8(pkt, 8)
        val ch = u8(pkt, 9)
        val preSkip = le16(pkt, 10)
        val inputSr = le32(pkt, 12)
        if ((version >> 4) != 0 || ch == 0) None // major version must be 0
        else Some(("opus", ch, inputSr, preSkip))
      } else None
    head.map { case (codec, ch, sr, preSkip) =>
      // page walk: last complete page's granule = the stream total
      var o = 0
      var granule = 0L
      var ok = true
      while (ok && o + 27 <= b.length && hasMagic(b, o, "OggS")) {
        val nseg = u8(b, o + 26)
        if (o + 27 + nseg > b.length) ok = false
        else {
          var dlen = 0; var j = 0
          while (j < nseg) { dlen += u8(b, o + 27 + j); j += 1 }
          if (o + 27 + nseg + dlen > b.length) ok = false
          else {
            val g = le64(b, o + 6)
            if (g != -1L) granule = g
            o += 27 + nseg + dlen
          }
        }
      }
      val durMs =
        if (codec == "opus") math.max(0L, granule - preSkip) * 1000L / 48000L
        else if (sr > 0) granule * 1000L / sr
        else 0L
      OggInfo(codec, ch, sr, preSkip, granule, durMs)
    }
  }

  /** One parsed ADTS-AAC stream: header fields plus the raw-data-block
    * count. Each raw data block decodes to 1024 PCM samples, so
    * `totalSamples = rawDataBlocks · 1024` and `durationMs` derives
    * exactly from the sampling-frequency-index table rate. */
  final case class AdtsInfo(
      channels: Int, sampleRate: Int, aacObjectType: Int, frames: Int,
      totalSamples: Long, durationMs: Long)

  /** AAC sampling-frequency-index table (ISO/IEC 14496-3 §1.6.3.4),
    * index 0..12 (13/14 reserved, 15 forbidden escape). Shared with
    * the ISO-BMFF `esds` AudioSpecificConfig ([[RiffCodecs]]) and the
    * [[MediaSynth]] writers. */
  private[ops] val AacSampleRates: Array[Int] = Array(
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050, 16000,
    12000, 11025, 8000, 7350)

  /** PCM samples per AAC raw data block. */
  private[ops] val AacSamplesPerBlock = 1024

  /** Walk an ADTS transport stream (ISO/IEC 14496-3 §1.A.2): fixed
    * header sync 0xFFF with layer '00' (which is also what separates
    * ADTS from an MPEG-1 Layer III sync, whose layer bits are '01'),
    * then header-to-header hops via the 13-bit aac_frame_length field
    * (which INCLUDES the 7-byte header, 9 with the optional CRC).
    * Every frame re-reads profile/sfi/channel-config — a mid-stream
    * parameter change or a corrupt header stops the walk cleanly at
    * the last consistent frame; no complete first frame returns None.
    * `number_of_raw_data_blocks_in_frame` is honored: a frame carries
    * (n+1) blocks of 1024 samples each. */
  def decodeAdts(b: Array[Byte]): Option[AdtsInfo] = {
    if (b == null || b.length < 7) return None
    var o = 0
    var frames = 0
    var blocks = 0L
    var sr = 0
    var cfg = 0
    var channels = 0
    var objectType = 0
    var ok = true
    while (ok && o + 7 <= b.length &&
        u8(b, o) == 0xff && (u8(b, o + 1) & 0xf6) == 0xf0) {
      val protAbsent = u8(b, o + 1) & 1
      val profile = (u8(b, o + 2) >> 6) & 3 // audioObjectType - 1
      val sfi = (u8(b, o + 2) >> 2) & 0xf
      val chCfg = ((u8(b, o + 2) & 1) << 2) | ((u8(b, o + 3) >> 6) & 3)
      val frameLen = ((u8(b, o + 3) & 3) << 11) | (u8(b, o + 4) << 3) |
        ((u8(b, o + 5) >> 5) & 7)
      val nBlocks = (u8(b, o + 6) & 3) + 1
      val headerLen = if (protAbsent == 1) 7 else 9
      val thisSr = if (sfi < AacSampleRates.length) AacSampleRates(sfi) else 0
      // consistency: rate table index valid, a channel configuration
      // present (0 = PCE-carried, which a header-only walk can't
      // resolve), the length covers at least its own header, and the
      // stream doesn't switch parameters mid-walk
      if (thisSr == 0 || chCfg == 0 || frameLen < headerLen ||
          o + frameLen > b.length ||
          (frames > 0 && (thisSr != sr || chCfg != cfg ||
            profile + 1 != objectType)))
        ok = false
      else {
        sr = thisSr
        cfg = chCfg
        // channel_configuration → channel COUNT (ISO/IEC 14496-3
        // table 1.19): configs 1–6 map to themselves; config 7 is the
        // 7.1 layout = 8 channels
        channels = if (chCfg == 7) 8 else chCfg
        objectType = profile + 1
        frames += 1
        blocks += nBlocks
        o += frameLen
      }
    }
    if (frames == 0) None
    else {
      val total = blocks * AacSamplesPerBlock
      Some(AdtsInfo(channels, sr, objectType, frames, total,
        total * 1000L / sr))
    }
  }

  private def be24(b: Array[Byte], o: Int): Int =
    (u8(b, o) << 16) | (u8(b, o + 1) << 8) | u8(b, o + 2)

  private def be64(b: Array[Byte], o: Int): Long = {
    var v = 0L; var i = 0
    while (i < 8) { v = (v << 8) | u8(b, o + i); i += 1 }
    v
  }

  /** Walk the FLAC metadata blocks to STREAMINFO (type 0; the spec
    * requires it first, the walk tolerates any position) and unpack
    * its bit fields. */
  def decodeFlac(b: Array[Byte]): Option[FlacInfo] = {
    if (b == null || b.length < 8 ||
      b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return None
    var o = 4
    var last = false
    var info: Option[FlacInfo] = None
    while (!last && o + 4 <= b.length) {
      val h = u8(b, o)
      last = (h & 0x80) != 0
      val tpe = h & 0x7f
      val blen = be24(b, o + 1)
      if (o + 4 + blen > b.length) return info
      if (tpe == 0 && blen >= 34 && info.isEmpty) {
        // after 10 bytes of block/frame size bounds: the packed 64
        val packed = be64(b, o + 4 + 10)
        val sr = (packed >>> 44).toInt
        val ch = ((packed >> 41) & 7).toInt + 1
        val bps = ((packed >> 36) & 31).toInt + 1
        val total = packed & ((1L << 36) - 1)
        if (sr > 0)
          info = Some(FlacInfo(ch, sr, bps, total, total * 1000L / sr))
      }
      o += 4 + blen
    }
    info
  }

  /** One parsed AIFF/AIFF-C file: COMM-chunk fields plus the duration
    * derived from the sample-frame count at the 80-bit extended-float
    * sample rate. `compression` is "NONE" for plain AIFF; for AIFF-C
    * it is the COMM compressionType fourcc (header fields stay
    * meaningful for compressed payloads — this is a header walk). */
  final case class AiffInfo(
      channels: Int, sampleRate: Int, bitsPerSample: Int,
      sampleFrames: Long, durationMs: Long, compression: String)

  private def be16(b: Array[Byte], o: Int): Int = (u8(b, o) << 8) | u8(b, o + 1)
  private def be32u(b: Array[Byte], o: Int): Long =
    ((u8(b, o).toLong << 24) | (u8(b, o + 1) << 16) | (u8(b, o + 2) << 8) |
      u8(b, o + 3)) & 0xffffffffL

  /** IEEE 754 80-bit extended float, big-endian (the AIFF COMM sample
    * rate — Apple's "Audio Interchange File Format 1.3" spec): 1 sign
    * + 15 exponent (bias 16383) + 64 mantissa bits with an EXPLICIT
    * integer bit. value = sign * mantissa * 2^(exp - 16383 - 63). */
  private def ext80(b: Array[Byte], o: Int): Double = {
    val se = be16(b, o)
    val sign = if ((se & 0x8000) != 0) -1.0 else 1.0
    val exp = se & 0x7fff
    val mant = be32u(b, o + 2).toDouble * 4294967296.0 + be32u(b, o + 6).toDouble
    if (exp == 0 && mant == 0.0) 0.0
    else sign * mant * math.pow(2.0, exp - 16383 - 63)
  }

  /** Walk an AIFF / AIFF-C file (EA IFF 85 chunks, all big-endian —
    * the byte-order mirror of RIFF/WAV): `FORM` + form type `AIFF` /
    * `AIFC`, then id+size chunks padded to even, to the `COMM` chunk
    * (channels s16, sampleFrames u32, sampleSize s16, sampleRate
    * 80-bit extended; AIFC appends a compressionType fourcc).
    * Duration uses the WAV integer idiom: frames * 1000 / rate.
    * Truncated or garbage input returns None (dead-letter). */
  def decodeAiff(b: Array[Byte]): Option[AiffInfo] = {
    if (b == null || b.length < 12) return None
    if (!hasMagic(b, 0, "FORM")) return None
    val aifc = hasMagic(b, 8, "AIFC")
    if (!aifc && !hasMagic(b, 8, "AIFF")) return None
    var o = 12
    while (o + 8 <= b.length) {
      val size = be32u(b, o + 4)
      if (hasMagic(b, o, "COMM")) {
        val need = if (aifc) 22L else 18L
        if (size < need || o + 8 + need > b.length) return None
        val d = o + 8
        val ch = be16(b, d)
        val frames = be32u(b, d + 2)
        val bits = be16(b, d + 6)
        val rate = ext80(b, d + 8)
        if (ch <= 0 || bits <= 0 || !(rate > 0.0) || rate > 1e7) return None
        val sr = math.round(rate).toInt
        val comp = if (aifc) new String(b, d + 18, 4, "ISO-8859-1") else "NONE"
        return Some(AiffInfo(ch, sr, bits, frames,
          frames * 1000L / sr, comp))
      }
      // chunks pad to even length (EA IFF 85)
      val adv = size + (size & 1L)
      if (adv > Int.MaxValue - 8 - o) return None
      o += 8 + adv.toInt
    }
    None
  }
}
