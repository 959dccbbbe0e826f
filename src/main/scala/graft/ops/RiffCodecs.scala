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
      channels: Int, sampleRate: Int, bitsPerSample: Int, durationMs: Long,
      samplesPerChannel: Long)

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

  /** MP4 / ISO-BMFF metadata + video-frame demux: brand from `ftyp`,
    * duration from `mvhd`, and the first VIDEO track's sample table
    * (`trak` → `mdia` → `minf` → `stbl`) resolved into per-frame
    * (offset, length) slices — the MP4 analog of [[decodeAvi]]'s frame
    * index, powering [[Multimodal.sampleFrames]] for the second
    * container format.
    *
    * ISO-BMFF is a box tree: `size(be32) type(4cc) payload`, `moov`
    * nests `mvhd` whose version-0 layout carries timescale/duration as
    * be32 at payload offsets 12/16 (version-1: be32 timescale at 20,
    * be64 duration at 24). A video trak is identified by its `hdlr`
    * handler type `vide`; its samples come from the standard table
    * triple: `stsz` (per-sample sizes, or one uniform size), `stco` /
    * `co64` (chunk offsets), `stsc` (run-length samples-per-chunk map).
    * Samples within a chunk are laid out back-to-back from the chunk
    * offset — exactly the layout the tables encode.
    *
    * Defensive like the RIFF walkers: a size-0 ("to end of file"),
    * 64-bit, or lying box size stops the walk cleanly; a sample table
    * whose declared entry count exceeds its box payload is ignored
    * (crafted counts must not drive allocation); sample slices falling
    * outside the file are dropped. Undecodable assets dead-letter
    * upstream, they do not throw. */
  final case class Mp4Info(
      brand: String, durationMs: Long,
      frames: Vector[(Int, Int)] = Vector.empty)

  def decodeMp4(b: Array[Byte]): Option[Mp4Info] = {
    if (b == null || b.length < 12) return None
    def be32(o: Int): Long =
      ((u8(b, o).toLong << 24) | (u8(b, o + 1) << 16) | (u8(b, o + 2) << 8) | u8(b, o + 3)) & 0xffffffffL
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    if (fourcc(b, 4) != "ftyp") return None
    var brand = ""
    var timescale = 0L
    var duration = -1L

    // per-trak sample-table accumulator; only the FIRST complete video
    // trak's frames are kept (multi-track files: video is what the
    // frame sampler wants)
    final class Trak {
      var isVideo = false
      var uniformSize = 0L
      var sizes: Array[Long] = null
      var chunkOffsets: Array[Long] = null
      var stsc: Array[(Long, Long)] = null // (first_chunk, samples_per_chunk)
    }
    var videoFrames: Vector[(Int, Int)] = Vector.empty

    // bounded table read: never allocate past what the box payload can
    // actually hold — a crafted entry count dies here
    def readTable(count: Long, tableStart: Int, boxEnd: Int, width: Int): Option[Int] =
      if (count < 0 || count > (boxEnd - tableStart).max(0) / width) None
      else Some(count.toInt)

    def walk(start: Int, end: Int, depth: Int, trak: Trak): Unit = {
      var o = start
      var ok = true
      while (ok && o + 8 <= end) {
        val size = be32(o) // unsigned in a Long — bounds math must not wrap
        val tpe = fourcc(b, o + 4)
        val boxEndL: Long = if (size == 0) end.toLong else o.toLong + size
        if (size == 1 || boxEndL > end || (size != 0 && size < 8)) ok = false // 64-bit/lying sizes: stop
        else {
          val boxEnd = boxEndL.toInt
          val p = o + 8 // payload start
          if (tpe == "ftyp" && boxEnd >= o + 12) brand = fourcc(b, p)
          else if (tpe == "moov" && depth < MaxNestDepth) walk(p, boxEnd, depth + 1, null)
          else if (tpe == "trak" && depth < MaxNestDepth) {
            val t = new Trak
            walk(p, boxEnd, depth + 1, t)
            if (videoFrames.isEmpty && t.isVideo) videoFrames = resolveFrames(t)
          } else if ((tpe == "mdia" || tpe == "minf" || tpe == "stbl") && depth < MaxNestDepth)
            walk(p, boxEnd, depth + 1, trak)
          else if (tpe == "mvhd" && boxEnd >= p + 4) {
            val version = u8(b, p)
            if (version == 0 && boxEnd >= p + 20) {
              timescale = be32(p + 12)
              duration = be32(p + 16)
            } else if (version == 1 && boxEnd >= p + 32) {
              timescale = be32(p + 20)
              duration = be64(p + 24)
            }
          } else if (trak != null && tpe == "hdlr" && boxEnd >= p + 12) {
            // version/flags(4) pre_defined(4) handler_type(4)
            if (fourcc(b, p + 8) == "vide") trak.isVideo = true
          } else if (trak != null && tpe == "stsz" && boxEnd >= p + 12) {
            trak.uniformSize = be32(p + 4)
            val count = be32(p + 8)
            if (trak.uniformSize > 0) {
              // uniform size: no table follows, so the box cannot bound
              // the count — cap the synthesized array at 2^22 frames
              // (a day of 48fps video; crafted counts must not drive
              // gigabyte allocations)
              trak.sizes = Array.fill(math.min(count, 1L << 22).toInt)(trak.uniformSize)
            } else readTable(count, p + 12, boxEnd, 4).foreach { n =>
              trak.sizes = Array.tabulate(n)(i => be32(p + 12 + 4 * i))
            }
          } else if (trak != null && tpe == "stco" && boxEnd >= p + 8) {
            readTable(be32(p + 4), p + 8, boxEnd, 4).foreach { n =>
              trak.chunkOffsets = Array.tabulate(n)(i => be32(p + 8 + 4 * i))
            }
          } else if (trak != null && tpe == "co64" && boxEnd >= p + 8) {
            readTable(be32(p + 4), p + 8, boxEnd, 8).foreach { n =>
              trak.chunkOffsets = Array.tabulate(n)(i => be64(p + 8 + 8 * i))
            }
          } else if (trak != null && tpe == "stsc" && boxEnd >= p + 8) {
            readTable(be32(p + 4), p + 8, boxEnd, 12).foreach { n =>
              trak.stsc = Array.tabulate(n)(i =>
                (be32(p + 8 + 12 * i), be32(p + 8 + 12 * i + 4)))
            }
          }
          if (size == 0) ok = false else o = boxEnd
        }
      }
    }

    // chunk-walk the table triple into (offset, length) frame slices;
    // out-of-file slices are dropped (lying offsets), order preserved
    def resolveFrames(t: Trak): Vector[(Int, Int)] = {
      if (t.sizes == null || t.chunkOffsets == null || t.stsc == null ||
        t.stsc.isEmpty) return Vector.empty
      val out = Vector.newBuilder[(Int, Int)]
      var sample = 0
      var stscIdx = 0
      var chunk = 1L // 1-based per spec
      while (chunk <= t.chunkOffsets.length && sample < t.sizes.length) {
        // advance the stsc run: entry i applies from its first_chunk
        // until the next entry's first_chunk (exclusive)
        while (stscIdx + 1 < t.stsc.length && chunk >= t.stsc(stscIdx + 1)._1)
          stscIdx += 1
        val perChunk = t.stsc(stscIdx)._2
        var off = t.chunkOffsets((chunk - 1).toInt)
        var i = 0L
        while (i < perChunk && sample < t.sizes.length) {
          val len = t.sizes(sample)
          // overflow-safe bounds: a crafted co64 offset near
          // Long.MaxValue would wrap `off + len` negative and pass the
          // naive check, sending garbage toInt slices to copyOfRange
          // (a throw, violating the dead-letter-never-throw contract)
          if (off >= 0 && len > 0 && len <= b.length && off <= b.length - len)
            out += ((off.toInt, len.toInt))
          off += len
          sample += 1
          i += 1
        }
        chunk += 1
      }
      out.result()
    }

    walk(0, b.length, 0, null)
    if (brand.isEmpty) None
    else Some(Mp4Info(brand,
      if (timescale > 0 && duration >= 0) duration * 1000L / timescale else 0L,
      videoFrames))
  }

  /** WAV metadata: format chunk + duration from the data chunk size. */
  def decodeWav(b: Array[Byte]): Option[WavInfo] = {
    if (!isRiff(b, "WAVE")) return None
    var channels = 0
    var rate = 0
    var byteRate = 0
    var blockAlign = 0
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
          blockAlign = le16(b, o + 8 + 12)
          bits = le16(b, o + 8 + 14)
        } else if (id == "data") dataLen = size
        o += 8 + sz + (sz & 1)
      }
    }
    if (rate <= 0 || byteRate <= 0 || dataLen < 0) None
    // exact per-channel sample count from the data chunk: blockAlign is
    // bytes per sample frame, so dataLen/blockAlign is exact where a
    // durationMs·rate/1000 reconstruction double-floors (500 samples at
    // 8 kHz would report 496)
    else Some(WavInfo(channels, rate, bits, dataLen * 1000L / byteRate,
      if (blockAlign > 0) dataLen / blockAlign
      else if (channels > 0 && bits >= 8) dataLen / (channels.toLong * (bits / 8))
      else 0L))
  }

  /** One analysis window of channel-0 PCM: integer-exact energy /
    * peak / zero-crossing features — the classic VAD/energy front-end
    * statistics, computed without ever materializing float samples. */
  final case class WavWindow(
      start: Long, n: Int, sumAbs: Long, peak: Int, zeroCross: Int)

  /** Windowed PCM feature extraction from a WAV's `data` chunk
    * (PCM format 1, 8- or 16-bit; channel 0 of interleaved frames).
    * Returns per-window (start sample, count, Σ|s|, max|s|,
    * zero crossings) — integer-exact, so the fixture gate is
    * byte-for-byte. Undecodable/compressed input → empty (the
    * dead-letter-never-throw contract shared by every codec here).
    *
    * Scale note: windows are bounded by the asset, and the caller
    * explodes (asset × window) rows — same shape as the video frame
    * demux; raw bytes never enter a shuffle key. */
  def wavPcmWindows(
      b: Array[Byte], windowSamples: Int = 1024,
      hop: Int = 1024): Seq[WavWindow] = {
    if (!isRiff(b, "WAVE") || windowSamples <= 0 || hop <= 0) return Nil
    var channels = 0; var bits = 0; var fmt = -1
    var dataOff = -1; var dataLen = 0
    var o = 12
    var ok = true
    while (ok && o + 8 <= b.length) {
      val id = fourcc(b, o)
      val size = le32(b, o + 4).toLong & 0xffffffffL
      if (o + 8L + size > b.length) ok = false
      else {
        val sz = size.toInt
        if (id == "fmt " && sz >= 16) {
          fmt = le16(b, o + 8)
          channels = le16(b, o + 8 + 2)
          bits = le16(b, o + 8 + 14)
        } else if (id == "data") { dataOff = o + 8; dataLen = sz }
        o += 8 + sz + (sz & 1)
      }
    }
    if (fmt != 1 || channels <= 0 || dataOff < 0 ||
      (bits != 8 && bits != 16)) return Nil
    val bytesPerSample = bits / 8
    val frame = bytesPerSample * channels
    val nSamples = dataLen / frame
    def sample(i: Int): Int = {
      val p = dataOff + i * frame // channel 0 of frame i
      if (bits == 16) (((b(p + 1) & 0xff) << 8) | (b(p) & 0xff)).toShort.toInt
      else (b(p) & 0xff) - 128 // 8-bit WAV is unsigned, midpoint 128
    }
    val out = Seq.newBuilder[WavWindow]
    var s = 0
    while (s < nSamples) {
      val n = math.min(windowSamples, nSamples - s)
      var sumAbs = 0L; var peak = 0; var zc = 0
      var prevNeg = false
      var i = 0
      while (i < n) {
        val v = sample(s + i)
        val a = math.abs(v)
        sumAbs += a
        if (a > peak) peak = a
        val neg = v < 0
        if (i > 0 && neg != prevNeg) zc += 1
        prevNeg = neg
        i += 1
      }
      out += WavWindow(s.toLong, n, sumAbs, peak, zc)
      s += hop
    }
    out.result()
  }

  /** MKV/WebM metadata + video-frame demux from the EBML element tree:
    * frame slices are (offset, length) into the original bytes, in
    * (timestamp, offset) order — the Matroska analog of [[Mp4Info]]'s
    * sample-table frames. */
  final case class MkvInfo(
      docType: String, durationMs: Long, videoTracks: Int, audioTracks: Int,
      width: Int = 0, height: Int = 0,
      frames: Vector[(Int, Int)] = Vector.empty)

  /** Decode Matroska/WebM metadata AND demux video frames: one EBML
    * walk over the well-known masters (EBML header → DocType; Segment →
    * Info's TimestampScale + Duration, Tracks → per-TrackEntry
    * TrackNumber/TrackType/Video dims, Clusters → SimpleBlock /
    * BlockGroup>Block frame payloads). EBML is a vint-length-prefixed
    * element tree (RFC 8794): element IDs keep their length-marker bit,
    * sizes strip it, and an all-ones size means "extends to the end"
    * (streamed files) — honored by clamping to the enclosing bound.
    *
    * Block demux is REAL (no stand-in left): each SimpleBlock/Block
    * leads with a size-style vint track number, a signed be16 relative
    * timestamp against the Cluster's Timestamp, and a flags byte whose
    * bits 0x06 select the lacing — 00 none (one frame), 01 Xiph
    * (255-run sizes, last implicit), 10 fixed-size (equal split), 11
    * EBML (first size a vint, then signed-vint deltas, last implicit).
    * All four are handled; frames from video-numbered tracks are kept
    * (track list is filtered after the walk, so Tracks-after-Clusters
    * ordering is safe). A lace whose sizes overrun the block is
    * dropped whole, like an MP4 sample slice outside the file.
    *
    * Same dead-letter contract as the other containers: malformed
    * vints, lying sizes, or over-deep nesting stop the walk cleanly,
    * never throw. */
  def decodeMkv(b: Array[Byte]): Option[MkvInfo] = {
    if (b == null || b.length < 8) return None
    def vintWidth(first: Int): Int = {
      var m = 0x80; var w = 1
      while (w <= 8 && (first & m) == 0) { m >>= 1; w += 1 }
      w
    }
    // element ID: marker bit kept (class ID as written), ≤ 4 bytes
    def readId(o: Long): Option[(Long, Int)] = {
      if (o < 0 || o >= b.length) return None
      val first = b(o.toInt) & 0xff
      if (first == 0) return None
      val w = vintWidth(first)
      if (w > 4 || o + w > b.length) return None
      var v = 0L; var i = 0
      while (i < w) { v = (v << 8) | (b((o + i).toInt) & 0xff); i += 1 }
      Some((v, w))
    }
    // element size: marker bit stripped; all-ones payload = unknown (-1)
    def readSize(o: Long): Option[(Long, Int)] = {
      if (o < 0 || o >= b.length) return None
      val first = b(o.toInt) & 0xff
      if (first == 0) return None
      val w = vintWidth(first)
      if (w > 8 || o + w > b.length) return None
      var v = (first & (0xff >>> w)).toLong
      var i = 1
      while (i < w) { v = (v << 8) | (b((o + i).toInt) & 0xff); i += 1 }
      val unknown = v == (1L << (7 * w)) - 1
      Some((if (unknown) -1L else v, w))
    }
    def uintAt(o: Long, len: Long): Long = {
      var v = 0L; var i = 0L
      while (i < len) { v = (v << 8) | (b((o + i).toInt) & 0xff); i += 1 }
      v
    }
    def floatAt(o: Long, len: Long): Double =
      if (len == 4) java.lang.Float.intBitsToFloat(uintAt(o, 4).toInt).toDouble
      else if (len == 8) java.lang.Double.longBitsToDouble(uintAt(o, 8))
      else 0.0

    var docType = ""
    var tsScaleNs = 1000000L // EBML default: 1 ms per timestamp tick
    var durTicks = 0.0
    var video = 0
    var audio = 0
    var width = 0
    var height = 0

    // per-TrackEntry accumulator (TrackNumber/TrackType/dims arrive in
    // any order within the entry; committed when the entry closes)
    var teNum = -1L; var teType = -1L; var teW = 0; var teH = 0
    val videoTrackNums = scala.collection.mutable.Set.empty[Long]
    // (trackNum, absTimestampTicks, offset, length) for every laced-out
    // frame; filtered to video tracks AFTER the walk so Cluster-before-
    // Tracks ordering (legal in Matroska) still demuxes
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Int)]
    var clusterTs = 0L

    // SimpleBlock/Block payload → frame slices (Matroska block layout:
    // vint track number, signed be16 relative timestamp, flags byte,
    // then the lace selected by flags bits 0x06)
    def parseBlock(start: Long, end: Long): Unit = {
      for ((tn, tw) <- readSize(start) if tn >= 0) {
        var p = start + tw
        if (p + 3 <= end) {
          val relTs = (((b(p.toInt) & 0xff) << 8) | (b((p + 1).toInt) & 0xff)).toShort.toLong
          val lacing = (b((p + 2).toInt) & 0x06) >> 1
          p += 3
          val ts = clusterTs + relTs
          def emit(sizes: Array[Long], from: Long): Unit = {
            var sum = 0L
            sizes.foreach(s => sum += s)
            // a lace whose sizes overrun the block (or go negative via
            // crafted EBML deltas) is dropped whole, like an MP4 sample
            // slice outside the file
            if (sizes.forall(_ >= 0) && from + sum <= end) {
              var off = from
              sizes.foreach { s =>
                if (s > 0) blocks += ((tn, ts, off.toInt, s.toInt))
                off += s
              }
            }
          }
          lacing match {
            case 0 => // no lacing: the rest of the block is one frame
              if (end > p) emit(Array(end - p), p)
            case 2 => // fixed-size: equal split of the remainder
              if (p < end) {
                val nf = (b(p.toInt) & 0xff) + 1
                p += 1
                val total = end - p
                if (total % nf == 0) emit(Array.fill(nf)(total / nf), p)
              }
            case 1 => // Xiph: 255-run sizes for all but the last frame
              if (p < end) {
                val nf = (b(p.toInt) & 0xff) + 1
                p += 1
                val sizes = new Array[Long](nf)
                var i = 0
                var okL = true
                while (okL && i < nf - 1) {
                  var s = 0L
                  var cont = true
                  while (cont && p < end) {
                    val v = b(p.toInt) & 0xff
                    s += v; p += 1
                    cont = v == 255
                  }
                  if (cont) okL = false else { sizes(i) = s; i += 1 }
                }
                if (okL) {
                  sizes(nf - 1) = (end - p) - sizes.view.take(nf - 1).sum
                  emit(sizes, p)
                }
              }
            case _ => // 3 = EBML: first size a vint, then signed-vint deltas
              if (p < end) {
                val nf = (b(p.toInt) & 0xff) + 1
                p += 1
                val sizes = new Array[Long](nf)
                var okL = true
                if (nf >= 2) {
                  readSize(p) match {
                    case Some((s0, w0)) if s0 >= 0 =>
                      sizes(0) = s0; p += w0
                      var i = 1
                      while (okL && i < nf - 1) {
                        readSize(p) match {
                          case Some((d, dw)) if d >= 0 =>
                            // signed vint: raw minus the width's bias
                            sizes(i) = sizes(i - 1) + (d - ((1L << (7 * dw - 1)) - 1))
                            p += dw; i += 1
                          case _ => okL = false
                        }
                      }
                    case _ => okL = false
                  }
                }
                if (okL) {
                  sizes(nf - 1) = (end - p) - sizes.view.take(nf - 1).sum
                  emit(sizes, p)
                }
              }
          }
        }
      }
    }

    // masters we descend into; everything else is skipped by size
    val Ebml = 0x1A45DFA3L; val Segment = 0x18538067L
    val Info = 0x1549A966L; val Tracks = 0x1654AE6BL; val TrackEntry = 0xAEL
    val Cluster = 0x1F43B675L; val BlockGroup = 0xA0L; val VideoEl = 0xE0L
    def walk(start: Long, end: Long, parent: Long, depth: Int): Unit = {
      if (depth > MaxNestDepth) return
      var o = start
      var ok = true
      while (ok && o < end) {
        (for { (id, iw) <- readId(o); (sz0, sw) <- readSize(o + iw) } yield {
          val body = o + iw + sw
          // unknown size clamps to the enclosing end (streamed files);
          // a LYING size stops the walk like the other containers
          val sz = if (sz0 < 0) end - body else sz0
          if (sz < 0 || body + sz > end) ok = false
          else {
            id match {
              case Ebml | Segment | Info | Tracks | BlockGroup | VideoEl =>
                walk(body, body + sz, id, depth + 1)
              case TrackEntry =>
                teNum = -1L; teType = -1L; teW = 0; teH = 0
                walk(body, body + sz, id, depth + 1)
                if (teType == 1) {
                  video += 1
                  if (teNum > 0) videoTrackNums += teNum
                  if (width == 0) { width = teW; height = teH }
                } else if (teType == 2) audio += 1
              case Cluster =>
                clusterTs = 0L
                walk(body, body + sz, id, depth + 1)
              case 0x4282 if parent == Ebml => // DocType
                docType = new String(b, body.toInt, sz.toInt,
                  java.nio.charset.StandardCharsets.US_ASCII).takeWhile(_ != '\u0000')
              case 0x2AD7B1 if parent == Info && sz >= 1 && sz <= 8 =>
                tsScaleNs = uintAt(body, sz)
              case 0x4489 if parent == Info => // Duration (float ticks)
                durTicks = floatAt(body, sz)
              case 0x83 if parent == TrackEntry && sz >= 1 && sz <= 8 =>
                teType = uintAt(body, sz)
              case 0xD7 if parent == TrackEntry && sz >= 1 && sz <= 8 =>
                teNum = uintAt(body, sz)
              case 0xB0 if parent == VideoEl && sz >= 1 && sz <= 8 =>
                teW = uintAt(body, sz).toInt
              case 0xBA if parent == VideoEl && sz >= 1 && sz <= 8 =>
                teH = uintAt(body, sz).toInt
              case 0xE7 if parent == Cluster && sz >= 1 && sz <= 8 =>
                clusterTs = uintAt(body, sz)
              case 0xA3 if parent == Cluster => // SimpleBlock
                parseBlock(body, body + sz)
              case 0xA1 if parent == BlockGroup => // Block
                parseBlock(body, body + sz)
              case _ => ()
            }
            o = body + sz
          }
        }).getOrElse { ok = false }
      }
    }

    // the file must LEAD with the EBML header element
    readId(0L) match {
      case Some((Ebml, _)) => walk(0L, b.length.toLong, 0L, 0)
      case _ => return None
    }
    if (docType != "matroska" && docType != "webm") None
    else {
      val vFrames = blocks.filter(t => videoTrackNums.contains(t._1))
        .sortBy(t => (t._2, t._3))
        .map(t => (t._3, t._4)).toVector
      Some(MkvInfo(docType,
        if (tsScaleNs > 0) (durTicks * tsScaleNs / 1e6).toLong else 0L,
        video, audio, width, height, vFrames))
    }
  }

  /** M4A / ISO-BMFF AAC audio header (round 16) — the audio analog of
    * [[decodeMp4]]'s video walk, the fifth audio container family. An
    * audio trak is identified by its `hdlr` handler `soun`; the
    * `stsd`'s first `mp4a` AudioSampleEntry (ISO 14496-12 §12.2.3)
    * carries channelcount / samplesize / samplerate (16.16 fixed), and
    * its nested `esds` box (MPEG-4 ES descriptor, ISO 14496-1 §7.2.6
    * expandable-length tag chain 0x03→0x04→0x05) carries the
    * objectTypeIndication (0x40 = MPEG-4 Audio) and the 2-byte
    * AudioSpecificConfig (ISO 14496-3 §1.6) packing
    * audioObjectType(5) / samplingFrequencyIndex(4) /
    * channelConfiguration(4) — AAC-LC is objectType 2. Duration comes
    * from the trak's `mdhd` (the media timescale IS the sample clock
    * for audio, so `duration` is total samples). Same defensive
    * contract as the other walks: lying/64-bit/zero box sizes stop
    * cleanly, a video-only MP4 (no `soun` trak) returns None and
    * dead-letters upstream. */
  final case class M4aInfo(
      channels: Int, sampleRate: Int, bitsPerSample: Int,
      objectTypeIndication: Int, aacObjectType: Int,
      totalSamples: Long, durationMs: Long)

  def decodeM4a(b: Array[Byte]): Option[M4aInfo] = {
    if (b == null || b.length < 12 || fourcc(b, 4) != "ftyp") return None
    def be16i(o: Int): Int = (u8(b, o) << 8) | u8(b, o + 1)
    def be32(o: Int): Long =
      ((u8(b, o).toLong << 24) | (u8(b, o + 1) << 16) |
        (u8(b, o + 2) << 8) | u8(b, o + 3)) & 0xffffffffL
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)

    final class A {
      var isAudio = false
      var channels = 0; var sampleRate = 0; var bits = 0
      var oti = -1; var aot = -1
      var timescale = 0L; var duration = -1L
    }
    var found: Option[M4aInfo] = None

    // ISO 14496-1 expandable-length descriptor chain inside esds
    def parseEsds(p0: Int, end: Int, t: A): Unit = {
      var o = p0 + 4 // skip version/flags
      def readLen(): Int = {
        var len = 0; var more = true; var n = 0
        while (more && n < 4 && o < end) {
          val c = u8(b, o); o += 1; n += 1
          len = (len << 7) | (c & 0x7f)
          more = (c & 0x80) != 0
        }
        len
      }
      if (o < end && u8(b, o) == 0x03) { // ES_Descriptor
        o += 1; readLen()
        o += 2 // ES_ID
        if (o < end) {
          val flags = u8(b, o); o += 1
          if ((flags & 0x80) != 0) o += 2 // dependsOn_ES_ID
          if ((flags & 0x40) != 0 && o < end) { val ul = u8(b, o); o += 1 + ul }
          if ((flags & 0x20) != 0) o += 2 // OCR ES id
        }
      }
      if (o < end && u8(b, o) == 0x04) { // DecoderConfigDescriptor
        o += 1; readLen()
        if (o < end) t.oti = u8(b, o)
        o += 13 // oti(1) streamType(1) bufferSizeDB(3) maxBitrate(4) avgBitrate(4)
        if (o < end && u8(b, o) == 0x05) { // DecoderSpecificInfo = ASC
          o += 1
          val l5 = readLen()
          if (l5 >= 2 && o + 1 < end)
            t.aot = (((u8(b, o) << 8) | u8(b, o + 1)) >>> 11) & 0x1f
        }
      }
    }

    def walk(start: Int, end: Int, depth: Int, t: A): Unit = {
      var o = start
      var ok = true
      while (ok && o + 8 <= end) {
        val size = be32(o)
        val tpe = fourcc(b, o + 4)
        val boxEndL: Long = if (size == 0) end.toLong else o.toLong + size
        if (size == 1 || boxEndL > end || (size != 0 && size < 8)) ok = false
        else {
          val boxEnd = boxEndL.toInt
          val p = o + 8
          if (tpe == "moov" && depth < MaxNestDepth) walk(p, boxEnd, depth + 1, null)
          else if (tpe == "trak" && depth < MaxNestDepth) {
            val t2 = new A
            walk(p, boxEnd, depth + 1, t2)
            if (found.isEmpty && t2.isAudio && t2.channels > 0 && t2.sampleRate > 0) {
              val durMs =
                if (t2.timescale > 0 && t2.duration >= 0)
                  t2.duration * 1000L / t2.timescale
                else 0L
              found = Some(M4aInfo(t2.channels, t2.sampleRate, t2.bits,
                t2.oti, t2.aot, math.max(0L, t2.duration), durMs))
            }
          } else if ((tpe == "mdia" || tpe == "minf" || tpe == "stbl")
              && depth < MaxNestDepth) walk(p, boxEnd, depth + 1, t)
          else if (t != null && tpe == "mdhd" && boxEnd >= p + 4) {
            val v = u8(b, p)
            if (v == 0 && boxEnd >= p + 20) {
              t.timescale = be32(p + 12); t.duration = be32(p + 16)
            } else if (v == 1 && boxEnd >= p + 32) {
              t.timescale = be32(p + 20); t.duration = be64(p + 24)
            }
          } else if (t != null && tpe == "hdlr" && boxEnd >= p + 12) {
            if (fourcc(b, p + 8) == "soun") t.isAudio = true
          } else if (t != null && tpe == "stsd" && boxEnd >= p + 16) {
            val e = p + 8 // first sample entry (version/flags + count skipped)
            if (e + 36 <= boxEnd && fourcc(b, e + 4) == "mp4a") {
              t.channels = be16i(e + 24)
              t.bits = be16i(e + 26)
              t.sampleRate = (be32(e + 32) >>> 16).toInt
              // children of the sample entry (esds); bounded by BOTH the
              // entry's declared size and the stsd box
              val entEnd = math.min(boxEnd.toLong, e.toLong + be32(e)).toInt
              var c = e + 36
              var okc = true
              while (okc && c + 8 <= entEnd) {
                val cs = be32(c)
                val ceL = c.toLong + cs
                if (cs < 8 || ceL > entEnd) okc = false
                else {
                  if (fourcc(b, c + 4) == "esds") parseEsds(c + 8, ceL.toInt, t)
                  c = ceL.toInt
                }
              }
            }
          }
          o = if (size == 0) end else boxEnd
        }
      }
    }
    walk(0, b.length, 0, null)
    found
  }
}
