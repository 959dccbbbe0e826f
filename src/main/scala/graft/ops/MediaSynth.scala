package graft.ops

import graft.ops.Multimodal.{MediaAsset, MediaMeta}

/** Deterministic multimodal payload synthesis — REAL container bytes
  * (BMP / RIFF-WAVE PCM / RIFF-AVI MJPEG-shaped) derived purely from a
  * document id, so the decode → metadata round-trip is arithmetic of
  * the id and therefore expressible as a DuckDB oracle (q98). This is
  * how the multimodal plumbing earns a HASH gate without binary
  * columns in the testdata: the bytes are built here, the metadata is
  * recovered exclusively by the real codec walks
  * ([[ImageCodecs.decodeBmp]], [[RiffCodecs.decodeWav]] /
  * [[RiffCodecs.wavPcmWindows]], [[RiffCodecs.decodeAvi]] +
  * [[Multimodal.sampleFrames]] demux slices), and any drift between
  * writer and walker breaks the hash.
  *
  * Layout constants the oracle mirrors (all chunk sizes even, so RIFF
  * pad bytes never enter the arithmetic):
  *   - BMP: 14-byte file header + 40-byte info header + w·h pixel
  *     bytes → n_bytes = 54 + w·h.
  *   - WAV: RIFF(12) + fmt(8+16) + data(8 + 2·n) → n_bytes = 44 + 2n;
  *     PCM16 mono at 8 kHz, samples alternate ±M → Σ|s| = n·M.
  *   - AVI: RIFF(12) + LIST hdrl(12 + avih(8+56)) + LIST movi(12 +
  *     nf·(8+L)) → n_bytes = 100 + nf·(8+L), frame clock 40 ms.
  *
  * reference analog: none (engine-side training-data surface); the
  * synthesized-bytes idea is the standard codec-conformance fixture
  * pattern (a writer the reader must invert).
  */
object MediaSynth {

  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >> 8).toByte)
  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def chunk(id: String, payload: Array[Byte]): Array[Byte] =
    cc(id) ++ le32(payload.length) ++ payload
  private def list(listType: String, payload: Array[Byte]): Array[Byte] =
    chunk("LIST", cc(listType) ++ payload)
  private def riff(form: String, payload: Array[Byte]): Array[Byte] =
    cc("RIFF") ++ le32(4 + payload.length) ++ cc(form) ++ payload

  /** Minimal BITMAPINFOHEADER BMP: dims in the real header fields,
    * pixel bytes deterministic from the id. */
  def bmp(id: Long, w: Int, h: Int): Array[Byte] = {
    val pixels = Array.tabulate(w * h)(j => ((id + j) % 256).toByte)
    cc("BM") ++ le32(54 + pixels.length) ++ le32(0) ++ le32(54) ++ // file header
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(8) ++      // info header
      le32(0) ++ le32(pixels.length) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++
      pixels
  }

  /** PCM16 mono WAV at `rate`: n samples alternating +mag/−mag (so the
    * window features are closed-form: Σ|s| = n·mag). */
  def wavPcm16(rate: Int, n: Int, mag: Int): Array[Byte] = {
    val data = Array.tabulate(n)(i => if (i % 2 == 0) mag else -mag)
      .flatMap(v => le16(v & 0xffff))
    riff("WAVE",
      chunk("fmt ", le16(1) ++ le16(1) ++ le32(rate) ++ le32(rate * 2) ++
        le16(2) ++ le16(16)) ++
      chunk("data", data))
  }

  /** Minimal AVI: avih (frame clock, count, dims) + movi with nf `00dc`
    * frame chunks of `frameLen` bytes each (frameLen must be even —
    * keeps RIFF padding out of the size arithmetic). */
  def avi(id: Long, usPerFrame: Int, nf: Int, w: Int, h: Int,
      frameLen: Int): Array[Byte] = {
    require(frameLen % 2 == 0, "frameLen must be even (RIFF pad-free)")
    val avih = le32(usPerFrame) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(nf) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val movi = (0 until nf).map { f =>
      chunk("00dc", Array.tabulate(frameLen)(j => ((id + f + j) % 256).toByte))
    }.reduce(_ ++ _)
    riff("AVI ", list("hdrl", chunk("avih", avih)) ++ list("movi", movi))
  }

  /** The q98 asset for one document id — kind by id mod 3, every
    * parameter a small modulus of the id (the oracle restates these
    * same formulas in SQL):
    *   - id≡0: BMP, w = 1+id%31, h = 1+id%17;
    *   - id≡1: WAV, 8 kHz PCM16 mono, n = 8+id%33 samples of
    *     magnitude 50+id%50;
    *   - id≡2: AVI, 40 ms/frame, nf = 1+id%5 frames of
    *     64+2·(id%32) bytes, w = 16+id%9, h = 9+id%7. */
  def assetFor(id: Long): MediaAsset = {
    val empty = MediaMeta(0, 0, 0L, 0, "?")
    (id % 3).toInt match {
      case 0 => MediaAsset(id, "image",
        bmp(id, 1 + (id % 31).toInt, 1 + (id % 17).toInt), empty)
      case 1 => MediaAsset(id, "audio",
        wavPcm16(8000, 8 + (id % 33).toInt, 50 + (id % 50).toInt), empty)
      case _ => MediaAsset(id, "video",
        avi(id, 40000, 1 + (id % 5).toInt, 16 + (id % 9).toInt,
          9 + (id % 7).toInt, 64 + 2 * (id % 32).toInt), empty)
    }
  }

  // ==== the q99 containers: JPEG / ISO-BMFF MP4 / Matroska-EBML ====
  // Same contract as the q98 trio: REAL container layouts whose every
  // decodable field is arithmetic of the id, so the codec walks
  // ([[ImageCodecs.decodeJpeg]], [[RiffCodecs.decodeMp4]]'s
  // stsz/stco/stsc resolution, [[RiffCodecs.decodeMkv]]'s
  // SimpleBlock-lacing demux) sit inside a DuckDB hash gate.
  // Closed-form byte lengths (asserted writer-side in Round13OpsSpec):
  //   - JPEG: SOI(2) + JFIF-APP0(18) + SOF0(13) + SOS(10) + n + EOI(2)
  //     → n_bytes = 45 + n.
  //   - MP4:  ftyp(16) + moov(172 + 4·nf) + mdat(8 + Σ) with frame f
  //     sized L+2f (a REAL non-uniform stsz table), two stco chunks
  //     split ceil/floor by stsc → n_bytes = 196 + 4·nf + Σ,
  //     Σ = nf·L + nf·(nf−1); mvhd timescale 1000, duration 40·nf.
  //   - MKV:  EBML(16) + Segment(6 + Info 19 + Tracks 21 +
  //     Cluster(16 + nf + Σ)) with ONE Xiph-laced SimpleBlock carrying
  //     all nf frames → n_bytes = 78 + nf + Σ; Duration float ticks
  //     40·nf at the default 1 ms TimestampScale.

  private def be16(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)
  private def be32(v: Int): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)

  /** Baseline JFIF JPEG: SOI, APP0, a real SOF0 frame header carrying
    * (h, w), a one-component SOS, `entropyLen` deterministic entropy
    * bytes, EOI. Dimension recovery must walk the marker segments. */
  def jpeg(id: Long, w: Int, h: Int, entropyLen: Int): Array[Byte] = {
    val m = (a: Int, b: Int) => Array(a.toByte, b.toByte)
    val app0 = m(0xff, 0xe0) ++ be16(16) ++ cc("JFIF") ++
      Array[Byte](0, 1, 1, 0) ++ be16(1) ++ be16(1) ++ Array[Byte](0, 0)
    val sof0 = m(0xff, 0xc0) ++ be16(11) ++ Array[Byte](8) ++
      be16(h) ++ be16(w) ++ Array[Byte](1, 1, 0x11, 0)
    val sos = m(0xff, 0xda) ++ be16(8) ++ Array[Byte](1, 1, 0, 0, 63, 0)
    val entropy = Array.tabulate(entropyLen)(j => ((id + j) % 256).toByte)
    m(0xff, 0xd8) ++ app0 ++ sof0 ++ sos ++ entropy ++ m(0xff, 0xd9)
  }

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] =
    be32(8 + payload.length) ++ cc(tpe) ++ payload

  /** Minimal ISO-BMFF MP4 with a REAL video sample table: nf frames of
    * NON-uniform size L+2f in the mdat, indexed by an explicit stsz
    * size table, two stco chunk offsets, and an stsc run split
    * ceil(nf/2)/rest — [[RiffCodecs.decodeMp4]] must chunk-walk all
    * three tables to recover the slices. mvhd: timescale 1000,
    * duration 40·nf. */
  def mp4(id: Long, nf: Int, frameLen: Int): Array[Byte] = {
    require(frameLen % 2 == 0, "frameLen must be even")
    val sizes = Array.tabulate(nf)(f => frameLen + 2 * f)
    val c1 = (nf + 1) / 2 // samples in chunk 1 (stsc first run)
    val moovLen = 172 + 4 * nf // fixed layout below; asserted in spec
    val dataStart = 16 + moovLen + 8
    val o1 = dataStart
    val o2 = dataStart + sizes.take(c1).sum
    val ftyp = box("ftyp", cc("isom") ++ be32(0))
    val mvhd = box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(1000) ++ be32(40 * nf))
    val hdlr = box("hdlr", be32(0) ++ be32(0) ++ cc("vide"))
    val stsz = box("stsz",
      be32(0) ++ be32(0) ++ be32(nf) ++ sizes.flatMap(be32))
    val stco = box("stco", be32(0) ++ be32(2) ++ be32(o1) ++ be32(o2))
    val stsc = box("stsc", be32(0) ++ be32(2) ++
      be32(1) ++ be32(c1) ++ be32(1) ++
      be32(2) ++ be32(nf - c1) ++ be32(1))
    val stbl = box("stbl", stsz ++ stco ++ stsc)
    val minf = box("minf", stbl)
    val mdia = box("mdia", hdlr ++ minf)
    val trak = box("trak", mdia)
    val moov = box("moov", mvhd ++ trak)
    require(moov.length == moovLen,
      s"moov layout drifted: ${moov.length} != $moovLen")
    val frames = sizes.zipWithIndex.flatMap { case (len, f) =>
      Array.tabulate(len)(j => ((id + f + j) % 256).toByte)
    }
    ftyp ++ moov ++ box("mdat", frames)
  }

  // EBML building blocks: element = id bytes ++ size vint ++ payload.
  // Leaves/small masters use 1-byte size vints; Segment/Cluster/
  // SimpleBlock are FORCED to 2-byte vints so the oracle's length
  // arithmetic never crosses a vint-width band.
  private def eb(ids: Int*): Array[Byte] = ids.map(_.toByte).toArray
  private def el1(id: Array[Byte], payload: Array[Byte]): Array[Byte] = {
    require(payload.length < 0x7f, s"el1 payload too big: ${payload.length}")
    id ++ Array((0x80 | payload.length).toByte) ++ payload
  }
  private def el2(id: Array[Byte], payload: Array[Byte]): Array[Byte] = {
    require(payload.length < 0x3fff, s"el2 payload too big: ${payload.length}")
    id ++ Array((0x40 | (payload.length >> 8)).toByte,
      payload.length.toByte) ++ payload
  }

  /** Minimal Matroska: EBML header (DocType), Segment with Info
    * (TimestampScale 1 ms, float Duration 40·nf ticks), one video
    * TrackEntry (number 1, dims), and one Cluster whose single
    * SimpleBlock carries ALL nf frames XIPH-LACED (sizes L+2f, each
    * < 255 so every lace code is one byte; the last frame's size is
    * implicit) — [[RiffCodecs.decodeMkv]] must run the real lacing
    * walk to slice them. */
  def mkv(id: Long, w: Int, h: Int, nf: Int, frameLen: Int): Array[Byte] = {
    require(w < 256 && h < 256, "q99 dims are single-byte EBML uints")
    val sizes = Array.tabulate(nf)(f => frameLen + 2 * f)
    require(sizes.forall(_ < 255), "Xiph lace codes must be single-byte")
    val header = el1(eb(0x1a, 0x45, 0xdf, 0xa3),
      el1(eb(0x42, 0x82), cc("matroska")))
    val info = el1(eb(0x15, 0x49, 0xa9, 0x66),
      el1(eb(0x2a, 0xd7, 0xb1), eb(0x0f, 0x42, 0x40)) ++ // 1_000_000 ns
        el1(eb(0x44, 0x89),
          be32(java.lang.Float.floatToIntBits(40f * nf))))
    val tracks = el1(eb(0x16, 0x54, 0xae, 0x6b),
      el1(eb(0xae),
        el1(eb(0xd7), eb(1)) ++ el1(eb(0x83), eb(1)) ++
          el1(eb(0xe0), el1(eb(0xb0), eb(w)) ++ el1(eb(0xba), eb(h)))))
    val frames = sizes.zipWithIndex.flatMap { case (len, f) =>
      Array.tabulate(len)(j => ((id + f + j) % 256).toByte)
    }
    val blockPayload = eb(0x81) ++ be16(0) ++ eb(0x02) ++ // track 1, ts 0, Xiph
      eb(nf - 1) ++ sizes.take(nf - 1).map(_.toByte) ++ frames
    val cluster = el2(eb(0x1f, 0x43, 0xb6, 0x75),
      el1(eb(0xe7), eb(0)) ++ el2(eb(0xa3), blockPayload))
    header ++ el2(eb(0x18, 0x53, 0x80, 0x67), info ++ tracks ++ cluster)
  }

  // ==== the q100 containers: PNG / GIF / WebP-VP8L ====
  // Closes the LAST spec-only decoders in [[ImageCodecs]]. Closed-form
  // byte lengths (asserted in Round13OpsSpec):
  //   - PNG: sig(8) + IHDR(25, real CRC32) + IDAT(12+n, real CRC32) +
  //     IEND(12) → n_bytes = 57 + n.
  //   - GIF: "GIF89a"(6) + logical screen descriptor(7) + comment
  //     extension(4 + n, one sub-block) + trailer(1) → n_bytes = 18+n.
  //   - WebP: RIFF(12) + VP8L chunk(8) + 0x2F signature + the packed
  //     14-bit (w−1, h−1) le32 + n filler bytes → n_bytes = 25 + n
  //     (n odd keeps the chunk even, so RIFF padding never applies).

  private def crc32(b: Array[Byte]): Array[Byte] = {
    val c = new java.util.zip.CRC32(); c.update(b)
    be32(c.getValue.toInt)
  }
  private def pngChunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val body = cc(tpe) ++ data
    be32(data.length) ++ body ++ crc32(body)
  }

  /** Real PNG structure (signature, IHDR with true CRC32s, one IDAT of
    * deterministic bytes, IEND) — dims only recoverable through the
    * IHDR walk. The IDAT is not a valid zlib stream (dimensions
    * metadata never inflates it), exactly like q98's MJPEG-shaped AVI
    * frames. */
  def png(id: Long, w: Int, h: Int, idatLen: Int): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = pngChunk("IHDR",
      be32(w) ++ be32(h) ++ Array[Byte](8, 0, 0, 0, 0))
    val idat = pngChunk("IDAT",
      Array.tabulate(idatLen)(j => ((id + j) % 256).toByte))
    sig ++ ihdr ++ idat ++ pngChunk("IEND", Array.emptyByteArray)
  }

  /** GIF89a with the logical screen descriptor carrying the dims and a
    * single-sub-block comment extension as the deterministic payload. */
  def gif(id: Long, w: Int, h: Int, commentLen: Int): Array[Byte] = {
    require(commentLen > 0 && commentLen < 256, "one GIF sub-block")
    cc("GIF89a") ++ le16(w) ++ le16(h) ++ Array[Byte](0, 0, 0) ++
      Array(0x21, 0xfe, commentLen).map(_.toByte) ++
      Array.tabulate(commentLen)(j => ((id + j) % 256).toByte) ++
      Array[Byte](0, 0x3b)
  }

  /** WebP lossless (VP8L): the 0x2F signature byte then width−1 /
    * height−1 as consecutive 14-bit fields of one le32 (RFC 9649),
    * padded with `fillerLen` deterministic bytes. */
  def webp(id: Long, w: Int, h: Int, fillerLen: Int): Array[Byte] = {
    require(fillerLen % 2 == 1, "odd filler keeps the VP8L chunk even")
    require(w <= 0x4000 && h <= 0x4000, "14-bit dims")
    val v = (w - 1) | ((h - 1) << 14)
    val payload = Array(0x2f.toByte) ++ le32(v) ++
      Array.tabulate(fillerLen)(j => ((id + j) % 256).toByte)
    riff("WEBP", chunk("VP8L", payload))
  }

  /** The q100 asset for one document id — PNG / GIF / WebP by id mod 3
    * (the oracle restates these):
    *   - id≡0: PNG, w = 1+id%50, h = 1+id%40, IDAT n = 8+id%32;
    *   - id≡1: GIF, w = 1+id%30, h = 1+id%25, comment n = 4+id%16;
    *   - id≡2: WebP-VP8L, w = 1+id%20, h = 1+id%15, filler
    *     n = 7+2·(id%12). */
  def imgAssetFor(id: Long): MediaAsset = {
    val empty = MediaMeta(0, 0, 0L, 0, "?")
    (id % 3).toInt match {
      case 0 => MediaAsset(id, "image",
        png(id, 1 + (id % 50).toInt, 1 + (id % 40).toInt, 8 + (id % 32).toInt), empty)
      case 1 => MediaAsset(id, "image",
        gif(id, 1 + (id % 30).toInt, 1 + (id % 25).toInt, 4 + (id % 16).toInt), empty)
      case _ => MediaAsset(id, "image",
        webp(id, 1 + (id % 20).toInt, 1 + (id % 15).toInt,
          7 + 2 * (id % 12).toInt), empty)
    }
  }

  /** The q99 asset for one document id — JPEG / MP4 / MKV by id mod 3,
    * every parameter a small modulus of the id (the oracle restates
    * these formulas):
    *   - id≡0: JPEG, w = 8+id%63, h = 8+id%47, entropy n = 10+id%40;
    *   - id≡1: MP4, nf = 1+id%5 frames of 32+2·(id%20) base length;
    *   - id≡2: MKV, w = 16+id%9, h = 9+id%7, nf = 1+id%4 frames of
    *     24+2·(id%40) base length. */
  def extAssetFor(id: Long): MediaAsset = {
    val empty = MediaMeta(0, 0, 0L, 0, "?")
    (id % 3).toInt match {
      case 0 => MediaAsset(id, "image",
        jpeg(id, 8 + (id % 63).toInt, 8 + (id % 47).toInt,
          10 + (id % 40).toInt), empty)
      case 1 => MediaAsset(id, "video",
        mp4(id, 1 + (id % 5).toInt, 32 + 2 * (id % 20).toInt), empty)
      case _ => MediaAsset(id, "video",
        mkv(id, 16 + (id % 9).toInt, 9 + (id % 7).toInt,
          1 + (id % 4).toInt, 24 + 2 * (id % 40).toInt), empty)
    }
  }

  // ---- q103: the AUDIO trio beyond WAV (MPEG-1 Layer III + FLAC) ----

  /** MPEG-1 Layer III stream: an ID3v2.3 tag (syncsafe size `tagLen`)
    * followed by `nf` frames at bitrate index `brIdx` / sample-rate
    * index `srIdx`, mono or stereo. Frame length is the published
    * formula `144·kbps·1000/sr` (padding 0, protection off); filler
    * bytes cycle mod 255 so 0xFF — and with it a false frame sync —
    * can never appear inside a frame body.
    * n_bytes = 10 + tagLen + nf · frameLen. */
  def mp3(id: Long, brIdx: Int, srIdx: Int, nf: Int, tagLen: Int,
      mono: Boolean): Array[Byte] = {
    val kbps = AudioCodecs.Mp3Bitrates(brIdx)
    val sr = AudioCodecs.Mp3SampleRates(srIdx)
    val flen = 144 * kbps * 1000 / sr
    val id3 = cc("ID3") ++ Array[Byte](3, 0, 0,
      ((tagLen >> 21) & 0x7f).toByte, ((tagLen >> 14) & 0x7f).toByte,
      ((tagLen >> 7) & 0x7f).toByte, (tagLen & 0x7f).toByte) ++
      Array.tabulate(tagLen)(j => ((id + j) % 255).toByte)
    def frame(fi: Int): Array[Byte] =
      Array(0xff.toByte, 0xfb.toByte,
        ((brIdx << 4) | (srIdx << 2)).toByte,
        (if (mono) 0xc0 else 0x00).toByte) ++
        Array.tabulate(flen - 4)(j => ((id + fi + j) % 255).toByte)
    id3 ++ Array.range(0, nf).flatMap(frame)
  }

  /** FLAC: magic + STREAMINFO metadata block (RFC 9639 packing: 20-bit
    * sample rate | 3-bit channels-1 | 5-bit bps-1 | 36-bit total
    * samples) + a PADDING block (so the reader's block walk is real)
    * + `audioLen` opaque frame bytes.
    * n_bytes = 4 + 38 + (4 + padLen) + audioLen = 46 + padLen + audioLen. */
  def flac(id: Long, sr: Int, channels: Int, bps: Int, totalSamples: Long,
      padLen: Int, audioLen: Int): Array[Byte] = {
    val packed = (sr.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | totalSamples
    val packedBytes =
      Array.tabulate(8)(i => ((packed >>> (56 - 8 * i)) & 0xff).toByte)
    val streaminfo = be16(1024) ++ be16(1024) ++          // block size bounds
      Array[Byte](0, 16, 0, 0, 16, 0) ++                  // frame size bounds
      packedBytes ++ Array.fill(16)(0.toByte)             // md5 (unset)
    cc("fLaC") ++
      (Array[Byte](0, 0, 0, 34) ++ streaminfo) ++         // STREAMINFO (not last)
      (Array(0x81.toByte, 0.toByte, 0.toByte, padLen.toByte) ++
        Array.fill(padLen)(0.toByte)) ++                  // PADDING (last)
      Array.tabulate(audioLen)(j => ((id + j) % 255).toByte)
  }

  /** The q103 asset for one document id — MP3 / FLAC by id mod 2,
    * every parameter a small modulus of the id (the oracle restates
    * these formulas):
    *   - id≡0: MP3, brIdx = 1+id%14, srIdx = id%3, nf = 1+id%5 frames,
    *     tag = id%17 bytes, mono iff (id/2)%2 = 0;
    *   - id≡1: FLAC, sr = 8000+100·(id%40), channels = 1+(id/2)%2,
    *     16-bit, totalSamples = 1000+id%5000, pad = id%10,
    *     audio = 20+id%64. */
  def audioAssetFor(id: Long): MediaAsset = {
    val empty = MediaMeta(0, 0, 0L, 0, "?")
    if (id % 2 == 0)
      MediaAsset(id, "audio",
        mp3(id, 1 + (id % 14).toInt, (id % 3).toInt, 1 + (id % 5).toInt,
          (id % 17).toInt, (id / 2) % 2 == 0), empty)
    else
      MediaAsset(id, "audio",
        flac(id, 8000 + 100 * (id % 40).toInt, 1 + ((id / 2) % 2).toInt,
          16, 1000 + id % 5000, (id % 10).toInt, 20 + (id % 64).toInt), empty)
  }

  // ---- q105: the OGG pair (Vorbis + Opus id headers, RFC 3533 pages) ----

  private lazy val oggCrcTable: Array[Int] = Array.tabulate(256) { n =>
    var r = n << 24
    var i = 0
    while (i < 8) {
      r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
      i += 1
    }
    r
  }

  /** One OGG page (RFC 3533 §6) with the REAL page CRC (poly
    * 0x04C11DB7, forward, init/xorout 0, computed with the CRC field
    * zeroed) — a future checksum-verifying reader must not break the
    * gate (the q100 PNG-CRC discipline). Synth packets stay < 255
    * bytes, one lacing byte each. */
  private def oggPage(headerType: Int, granule: Long, serial: Int,
      seq: Int, packets: Array[Array[Byte]]): Array[Byte] = {
    require(packets.forall(_.length < 255), "synth packets stay < 255")
    val lacing = packets.map(p => p.length.toByte)
    val page = cc("OggS") ++ Array(0.toByte, headerType.toByte) ++
      Array.tabulate(8)(i => ((granule >>> (8 * i)) & 0xff).toByte) ++
      le32(serial) ++ le32(seq) ++ le32(0) ++
      Array(packets.length.toByte) ++ lacing ++ packets.flatten
    var crc = 0
    var i = 0
    while (i < page.length) {
      crc = (crc << 8) ^ oggCrcTable(((crc >>> 24) ^ (page(i) & 0xff)) & 0xff)
      i += 1
    }
    System.arraycopy(le32(crc), 0, page, 22, 4)
    page
  }

  /** One OGG page with an EXPLICIT lacing table — the fragmented-
    * packet writer ([[oggVorbisSplitHeader]]): a packet slice laced
    * 255 continues on the next page, which [[oggPage]]'s < 255
    * invariant cannot express. Same real CRC. */
  private def oggPageRaw(headerType: Int, granule: Long, serial: Int,
      seq: Int, lacing: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val page = cc("OggS") ++ Array(0.toByte, headerType.toByte) ++
      Array.tabulate(8)(i => ((granule >>> (8 * i)) & 0xff).toByte) ++
      le32(serial) ++ le32(seq) ++ le32(0) ++
      Array(lacing.length.toByte) ++ lacing ++ data
    var crc = 0
    var i = 0
    while (i < page.length) {
      crc = (crc << 8) ^ oggCrcTable(((crc >>> 24) ^ (page(i) & 0xff)) & 0xff)
      i += 1
    }
    System.arraycopy(le32(crc), 0, page, 22, 4)
    page
  }

  /** OGG/Vorbis with the identification header FRAGMENTED across the
    * page boundary (RFC 3533 §5–6: page 1's single lacing value is
    * 255, so the packet continues on page 2, which carries the
    * continued-packet flag 0x01) — the legal-but-never-mainstream
    * layout the round-16 verdict asked the decoder to survive. The id
    * packet is the real 30-byte header padded to 300 bytes (container-
    * level fragmentation requires ≥ 255 bytes before the split;
    * trailing bytes in the packet are ignored padding), split 255/45.
    * Page 3 (EOS) carries the payload and final granule. */
  def oggVorbisSplitHeader(id: Long, sr: Int, channels: Int,
      totalSamples: Long, payloadLen: Int): Array[Byte] = {
    val idHeader = Array(0x01.toByte) ++ cc("vorbis") ++ le32(0) ++
      Array(channels.toByte) ++ le32(sr) ++ le32(0) ++ le32(0) ++ le32(0) ++
      Array(0xb8.toByte, 0x01.toByte)
    val pkt = idHeader ++ Array.tabulate(300 - idHeader.length)(j =>
      ((id + 31 + j) % 255).toByte)
    val payload = Array.tabulate(payloadLen)(j => ((id + j) % 255).toByte)
    oggPageRaw(0x02, 0L, id.toInt, 0,
        Array(255.toByte), pkt.take(255)) ++
      oggPageRaw(0x01, 0L, id.toInt, 1,
        Array((pkt.length - 255).toByte), pkt.drop(255)) ++
      oggPage(0x04, totalSamples, id.toInt, 2, Array(payload))
  }

  /** OGG/Vorbis: page 1 (BOS) = the 30-byte Vorbis I identification
    * header (version 0, channels, rate, three bitrate fields 0,
    * blocksizes 2⁸/2¹¹, framing 1), page 2 (EOS) = `payloadLen` opaque
    * audio bytes with granule = `totalSamples`.
    * n_bytes = 58 + 28 + payloadLen = 86 + payloadLen. */
  def oggVorbis(id: Long, sr: Int, channels: Int, totalSamples: Long,
      payloadLen: Int): Array[Byte] = {
    val idHeader = Array(0x01.toByte) ++ cc("vorbis") ++ le32(0) ++
      Array(channels.toByte) ++ le32(sr) ++ le32(0) ++ le32(0) ++ le32(0) ++
      Array(0xb8.toByte, 0x01.toByte)
    val payload = Array.tabulate(payloadLen)(j => ((id + j) % 255).toByte)
    oggPage(0x02, 0L, id.toInt, 0, Array(idHeader)) ++
      oggPage(0x04, totalSamples, id.toInt, 1, Array(payload))
  }

  /** OGG/Opus (RFC 7845): page 1 (BOS) = the 19-byte OpusHead
    * (version 1, channels, pre-skip, informational input rate, gain 0,
    * mapping family 0), page 2 = a minimal OpusTags, page 3 (EOS) =
    * `payloadLen` opaque bytes carrying the final 48 kHz granule
    * (`preSkip + 48·durMs`).
    * n_bytes = 47 + 48 + 28 + payloadLen = 123 + payloadLen. */
  def oggOpus(id: Long, channels: Int, preSkip: Int, inputSr: Int,
      granule: Long, payloadLen: Int): Array[Byte] = {
    val head = cc("OpusHead") ++ Array(1.toByte, channels.toByte) ++
      le16(preSkip) ++ le32(inputSr) ++ le16(0) ++ Array(0.toByte)
    val tags = cc("OpusTags") ++ le32(4) ++ cc("gfts") ++ le32(0)
    val payload = Array.tabulate(payloadLen)(j => ((id + 7 + j) % 255).toByte)
    oggPage(0x02, 0L, id.toInt, 0, Array(head)) ++
      oggPage(0x00, 0L, id.toInt, 1, Array(tags)) ++
      oggPage(0x04, granule, id.toInt, 2, Array(payload))
  }

  /** The q105 asset for one document id — OGG/Vorbis / OGG/Opus by id
    * mod 2, every parameter a small modulus of the id (the oracle
    * restates these formulas):
    *   - id≡0: Vorbis, sr = 8000+100·(id%40), channels = 1+(id/2)%2,
    *     totalSamples = 2000+id%3000, payload = 20+id%50
    *     → n_bytes = 106 + id%50;
    *   - id≡1: Opus, channels = 1+(id/2)%2, preSkip = 312+id%100,
    *     inputSr ∈ {8000,12000,16000,24000,48000} by id%5,
    *     durMs = 10+id%200 (granule = preSkip + 48·durMs),
    *     payload = 16+id%40 → n_bytes = 139 + id%40. */
  def oggAssetFor(id: Long): MediaAsset = {
    val empty = MediaMeta(0, 0, 0L, 0, "?")
    if (id % 2 == 0)
      MediaAsset(id, "audio",
        oggVorbis(id, 8000 + 100 * (id % 40).toInt, 1 + ((id / 2) % 2).toInt,
          2000 + id % 3000, 20 + (id % 50).toInt), empty)
    else {
      val preSkip = 312 + (id % 100).toInt
      val durMs = 10 + (id % 200)
      MediaAsset(id, "audio",
        oggOpus(id, 1 + ((id / 2) % 2).toInt, preSkip,
          Array(8000, 12000, 16000, 24000, 48000)((id % 5).toInt),
          preSkip + 48L * durMs, 16 + (id % 40).toInt), empty)
    }
  }

  // ---- q106: M4A / ISO-BMFF AAC audio headers ----

  /** Minimal-but-real M4A: `ftyp(M4A )` + `moov(mvhd + trak(mdhd +
    * hdlr 'soun' + minf/stbl/stsd/mp4a(esds)))` + `mdat` pad. The
    * `esds` carries a REAL MPEG-4 descriptor chain (ES_Descr 0x03 →
    * DecoderConfig 0x04 with objectTypeIndication 0x40 and audio
    * streamType 0x15 → DecoderSpecificInfo 0x05 = the 2-byte
    * AudioSpecificConfig packing AAC-LC(2) / samplingFrequencyIndex /
    * channelConfiguration → SLConfig 0x06), so a stricter parser than
    * ours still reads it. Box sizes are closed-form:
    * ftyp 20 + moov 304 + mdat (8 + padLen) → n_bytes = 332 + padLen.
    * The mdhd timescale is `sr` and its duration `totalSamples` (the
    * audio sample clock); the movie-level mvhd carries the same span
    * at timescale 1000. `sr` must be an AAC table rate (ISO 14496-3
    * §1.6.3.4) so the ASC index exists. */
  private val aacRates = Array(96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350)

  def m4a(id: Long, sr: Int, channels: Int, totalSamples: Long,
      movieDurMs: Long, padLen: Int): Array[Byte] = {
    val sfi = aacRates.indexOf(sr)
    require(sfi >= 0, s"sr $sr is not an AAC sampling-table rate")
    val ftyp = box("ftyp", cc("M4A ") ++ be32(0) ++ cc("M4A "))
    val matrix = be32(0x00010000) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000)
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(1000) ++ be32(movieDurMs.toInt) ++
      be32(0x00010000) ++ be16(0x0100) ++ be16(0) ++ new Array[Byte](8) ++
      matrix ++ new Array[Byte](24) ++ be32(2))
    val mdhd = box("mdhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(sr) ++ be32(totalSamples.toInt) ++ be16(0x55c4) ++ be16(0))
    val hdlr = box("hdlr", be32(0) ++ be32(0) ++ cc("soun") ++
      new Array[Byte](12) ++ Array(0.toByte))
    val asc0 = (2 << 3) | ((sfi >> 1) & 0x7)
    val asc1 = ((sfi & 1) << 7) | ((channels & 0xf) << 3)
    val dsi = Array(0x05.toByte, 2.toByte, asc0.toByte, asc1.toByte)
    val slc = Array(0x06.toByte, 1.toByte, 0x02.toByte)
    val dcdPayload = Array(0x40.toByte, 0x15.toByte) ++ new Array[Byte](3) ++
      be32(128000) ++ be32(128000) ++ dsi ++ slc
    val dcd = Array(0x04.toByte, dcdPayload.length.toByte) ++ dcdPayload
    val esd = Array(0x03.toByte, (3 + dcd.length).toByte) ++
      be16(1) ++ Array(0.toByte) ++ dcd
    val esds = box("esds", be32(0) ++ esd)
    val mp4aEntry = box("mp4a",
      new Array[Byte](6) ++ be16(1) ++ new Array[Byte](8) ++
        be16(channels) ++ be16(16) ++ be16(0) ++ be16(0) ++
        be32(sr << 16) ++ esds)
    val stsd = box("stsd", be32(0) ++ be32(1) ++ mp4aEntry)
    val stbl = box("stbl", stsd)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd ++ hdlr ++ minf)
    val trak = box("trak", mdia)
    val moov = box("moov", mvhd ++ trak)
    val pad = Array.tabulate(padLen)(j => ((id + 3 + j) % 255).toByte)
    ftyp ++ moov ++ box("mdat", pad)
  }

  /** The q106 asset for one document id — M4A/AAC-LC, every parameter
    * a small modulus of the id (the oracle restates these formulas):
    * sr ∈ {48000, 44100, 32000, 16000, 8000} by id%5 (all AAC table
    * rates), channels = 1 + (id/2)%2, totalSamples = 4000 + id%9000
    * (the mdhd duration at timescale sr), pad = id%32
    * → n_bytes = 332 + id%32, duration_ms = totalSamples·1000//sr. */
  def m4aAssetFor(id: Long): MediaAsset = {
    val empty = MediaMeta(0, 0, 0L, 0, "?")
    val sr = Array(48000, 44100, 32000, 16000, 8000)((id % 5).toInt)
    val totalSamples = 4000 + id % 9000
    MediaAsset(id, "audio",
      m4a(id, sr, 1 + ((id / 2) % 2).toInt, totalSamples,
        totalSamples * 1000L / sr, (id % 32).toInt), empty)
  }

  // ---- q111: AVIF / HEIC still-image headers ----

  /** A minimal-but-real HEIF still image (ISO/IEC 23008-12): `ftyp`
    * with the requested brand + mif1 compatibility, the `meta` FULLBOX
    * nesting a `pict` handler and `iprp(ipco(ispe))` with the
    * version/flags-prefixed width/height, then an `mdat` pad standing
    * in for the coded payload. Closed-form size: ftyp 24 + meta 81
    * (fullbox 12 + hdlr 33 + iprp 36) + mdat (8 + padLen)
    * → n_bytes = 113 + padLen. */
  def avif(id: Long, brand: String, w: Int, h: Int, padLen: Int): Array[Byte] = {
    require(brand.length == 4, s"brand must be a fourcc: $brand")
    val ftyp = box("ftyp", cc(brand) ++ be32(0) ++ cc(brand) ++ cc("mif1"))
    val hdlr = box("hdlr", be32(0) ++ be32(0) ++ cc("pict") ++
      new Array[Byte](12) ++ Array(0.toByte))
    val ispe = box("ispe", be32(0) ++ be32(w) ++ be32(h))
    val iprp = box("iprp", box("ipco", ispe))
    val meta = box("meta", be32(0) ++ hdlr ++ iprp)
    val pad = Array.tabulate(padLen)(j => ((id + 9 + j) % 255).toByte)
    ftyp ++ meta ++ box("mdat", pad)
  }

  /** The q111 asset for one document id — AVIF / HEIC by id parity,
    * every parameter a small modulus of the id (the oracle restates
    * these formulas): brand avif on even ids / heic on odd,
    * w = 1 + id%64, h = 1 + id%48, pad = id%20
    * → n_bytes = 113 + id%20. */
  def avifAssetFor(id: Long): MediaAsset = {
    val empty = MediaMeta(0, 0, 0L, 0, "?")
    MediaAsset(id, "image",
      avif(id, if (id % 2 == 0) "avif" else "heic",
        1 + (id % 64).toInt, 1 + (id % 48).toInt, (id % 20).toInt), empty)
  }

  // ---- q110: TIFF baseline headers ----

  /** A REAL baseline TIFF header (TIFF 6.0 §2) in EITHER byte order:
    * 'II'/'MM' magic + 42, IFD0 at offset 8 with five entries
    * (ImageWidth 256 / ImageLength 257 as inline SHORTs, plus
    * BitsPerSample 8, Compression 1, SamplesPerPixel 1 for parser
    * realism), a zero next-IFD offset, then `padLen` deterministic
    * filler bytes standing in for strip data. Closed-form size:
    * 8 header + 2 count + 5·12 entries + 4 next → 74 + padLen.
    * Inline SHORT values are left-justified in the 4-byte value field
    * per §2 (first two bytes in the file's byte order). */
  def tiff(id: Long, w: Int, h: Int, padLen: Int,
      bigEndian: Boolean, longDims: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (bigEndian) { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
      else { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit =
      if (bigEndian) { w16((v >> 16) & 0xffff); w16(v & 0xffff) }
      else { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    if (bigEndian) { out.write('M'); out.write('M') }
    else { out.write('I'); out.write('I') }
    w16(42)
    w32(8) // IFD0 immediately after the header
    w16(5) // entry count
    def entry(tag: Int, value: Int): Unit = {
      w16(tag); w16(3 /* SHORT */); w32(1)
      w16(value); w16(0) // left-justified inline SHORT
    }
    // `longDims` writes the dimension tags as inline LONGs (type 4,
    // the full 4-byte value field) — real-world TIFFs commonly carry
    // LONG-typed dims, so the reader's type-4 path needs corpus too
    def dimEntry(tag: Int, value: Int): Unit =
      if (longDims) { w16(tag); w16(4 /* LONG */); w32(1); w32(value) }
      else entry(tag, value)
    dimEntry(256, w)
    dimEntry(257, h)
    entry(258, 8)
    entry(259, 1)
    entry(277, 1)
    w32(0) // no next IFD
    var j = 0
    while (j < padLen) { out.write(((id + 5 + j) % 255).toInt); j += 1 }
    out.toByteArray
  }

  /** The q110 asset for one document id — baseline TIFF, byte order
    * alternating by id parity (II even / MM odd) and dimension tags
    * written as inline LONGs on id%3 = 0 (both entry forms are 12
    * bytes, so the size arithmetic is type-independent), every
    * parameter a small modulus of the id (the oracle restates these
    * formulas): w = 1 + id%60, h = 1 + id%45, pad = id%24
    * → n_bytes = 74 + id%24. */
  def tiffAssetFor(id: Long): MediaAsset = {
    val empty = MediaMeta(0, 0, 0L, 0, "?")
    MediaAsset(id, "image",
      tiff(id, 1 + (id % 60).toInt, 1 + (id % 45).toInt, (id % 24).toInt,
        bigEndian = id % 2 == 1, longDims = id % 3 == 0), empty)
  }

  // ---- q107: ADTS-AAC transport streams ----

  /** A REAL ADTS stream (ISO/IEC 14496-3 §1.A.2): `frames` back-to-back
    * frames, each a 7-byte fixed+variable header (9 with the CRC-
    * protected form — protection_absent 0 adds the 16-bit crc_check
    * field) followed by `payloadLen` deterministic filler bytes. The
    * 13-bit aac_frame_length includes the header; buffer fullness is
    * the 0x7FF VBR sentinel; one raw data block per frame. Parameters
    * must be stream-constant (the walker enforces that), `sr` an AAC
    * table rate. `channels` is the 3-bit channel CONFIGURATION field
    * (= channel count for 1–6; config 7 is the 8-channel 7.1
    * layout). */
  def adts(id: Long, sr: Int, channels: Int, frames: Int, payloadLen: Int,
      withCrc: Boolean = false): Array[Byte] = {
    val sfi = AudioCodecs.AacSampleRates.indexOf(sr)
    require(sfi >= 0, s"sr $sr is not an AAC sampling-table rate")
    val headerLen = if (withCrc) 9 else 7
    val frameLen = headerLen + payloadLen
    require(frameLen < (1 << 13), s"frame length $frameLen overflows 13 bits")
    val out = new Array[Byte](frames * frameLen)
    var f = 0
    while (f < frames) {
      val o = f * frameLen
      out(o) = 0xff.toByte
      out(o + 1) = (0xf0 | (if (withCrc) 0 else 1)).toByte // MPEG-4, layer 00
      out(o + 2) = ((1 << 6) | (sfi << 2) | ((channels >> 2) & 1)).toByte // AAC-LC
      out(o + 3) = (((channels & 3) << 6) | ((frameLen >> 11) & 3)).toByte
      out(o + 4) = ((frameLen >> 3) & 0xff).toByte
      out(o + 5) = (((frameLen & 7) << 5) | 0x1f).toByte // fullness hi
      out(o + 6) = 0xfc.toByte // fullness lo ++ one raw data block
      if (withCrc) { out(o + 7) = (id % 251).toByte; out(o + 8) = (f % 253).toByte }
      var j = 0
      while (j < payloadLen) {
        out(o + headerLen + j) = ((id + 7 * f + j) % 255).toByte; j += 1
      }
      f += 1
    }
    out
  }

  /** The q107 asset for one document id — raw ADTS-AAC, every parameter
    * a small modulus of the id (the oracle restates these formulas):
    * sr ∈ {48000, 44100, 32000, 16000, 8000} by id%5, channels =
    * 1 + (id/2)%2, frames = 20 + id%80, payload = 5 + id%20, CRC
    * header form on id%3 = 0 (9-byte headers) → n_bytes =
    * frames·(header + payload), n_units = frames·1024,
    * duration_ms = n_units·1000//sr. */
  def adtsAssetFor(id: Long): MediaAsset = {
    val empty = MediaMeta(0, 0, 0L, 0, "?")
    val sr = Array(48000, 44100, 32000, 16000, 8000)((id % 5).toInt)
    MediaAsset(id, "audio",
      adts(id, sr, 1 + ((id / 2) % 2).toInt, (20 + id % 80).toInt,
        (5 + id % 20).toInt, withCrc = id % 3 == 0), empty)
  }

  // ---- q114: AIFF / AIFF-C audio (round 17) ----

  /** IEEE 754 80-bit extended float, big-endian, for an integral
    * sample rate (the AIFF COMM encoding): exponent 16383 + p where p
    * is the rate's highest set bit, 64-bit mantissa with the explicit
    * integer bit left-justified. */
  private def ext80(rate: Int): Array[Byte] = {
    require(rate > 0, "ext80 synthesizes positive rates")
    val p = 31 - Integer.numberOfLeadingZeros(rate)
    val exp = 16383 + p
    val mant = rate.toLong << (63 - p)
    be16(exp) ++ Array.tabulate(8)(i => ((mant >>> (8 * (7 - i))) & 0xff).toByte)
  }

  /** Minimal-but-real AIFF (EA IFF 85, big-endian — the byte-order
    * mirror of [[wav]]): `FORM`/`AIFF` + an 18-byte `COMM` (channels,
    * sampleFrames, 16-bit sampleSize, 80-bit extended rate) + an
    * `SSND` chunk (offset/blockSize 0) carrying
    * `frames · channels · 2` deterministic payload bytes.
    * n_bytes = 12 + 26 + 16 + dataLen = 54 + frames·channels·2. */
  def aiff(id: Long, sr: Int, channels: Int, frames: Int): Array[Byte] = {
    val dataLen = frames * channels * 2
    val comm = cc("COMM") ++ be32(18) ++ be16(channels) ++ be32(frames) ++
      be16(16) ++ ext80(sr)
    val payload = Array.tabulate(dataLen)(j => ((id + 3 * j) % 251).toByte)
    val ssnd = cc("SSND") ++ be32(8 + dataLen) ++ be32(0) ++ be32(0) ++ payload
    val body = cc("AIFF") ++ comm ++ ssnd
    cc("FORM") ++ be32(body.length) ++ body
  }

  /** The q114 asset for one document id — every parameter a small
    * modulus of the id (the oracle restates these formulas):
    * sr ∈ {8000,11025,16000,22050,44100} by id%5, channels = 1+id%2,
    * frames = 1000 + id%9000 → n_bytes = 54 + frames·channels·2,
    * duration_ms = frames·1000 // sr. */
  def aiffAssetFor(id: Long): MediaAsset = {
    val empty = MediaMeta(0, 0, 0L, 0, "?")
    MediaAsset(id, "audio",
      aiff(id, Array(8000, 11025, 16000, 22050, 44100)((id % 5).toInt),
        1 + (id % 2).toInt, (1000 + id % 9000).toInt), empty)
  }
}
