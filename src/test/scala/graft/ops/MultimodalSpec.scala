package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import Multimodal._

  implicit lazy val s: org.apache.spark.sql.SparkSession = spark
  import spark.implicits._

  private def header(w: Int, h: Int): Array[Byte] =
    Array((w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte, w.toByte,
      (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte, h.toByte)

  private def asset(id: Long, kind: String, w: Int, h: Int,
      durMs: Long = 0L, extra: Int = 64) = {
    val rnd = new scala.util.Random(id)
    val payload = new Array[Byte](extra)
    rnd.nextBytes(payload)
    MediaAsset(id, kind, header(w, h) ++ payload,
      MediaMeta(0, 0, durMs, 0, if (kind == "image") "png" else "mp4"))
  }

  lazy val assets = Seq(
    asset(1, "image", 640, 480),
    asset(2, "image", 4000, 3000),
    asset(3, "video", 1920, 1080, durMs = 10000),
    MediaAsset(4, "image", Array[Byte](1, 2, 3), MediaMeta(0, 0, 0, 0, "bad"))
  ).toDS()

  /** Real container bytes via the JDK's own encoder (javax.imageio). */
  private def realImage(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff8040)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"JDK can't encode $fmt")
    out.toByteArray
  }

  test("real PNG/JPEG/BMP/GIF bytes decode end-to-end through decodeImages") {
    val real = Seq(
      MediaAsset(10, "image", realImage("png", 7, 5), MediaMeta(0, 0, 0, 0, "?")),
      MediaAsset(11, "image", realImage("jpg", 31, 17), MediaMeta(0, 0, 0, 0, "?")),
      MediaAsset(12, "image", realImage("bmp", 9, 3), MediaMeta(0, 0, 0, 0, "?")),
      MediaAsset(13, "image", realImage("gif", 4, 6), MediaMeta(0, 0, 0, 0, "?"))
    ).toDS()
    val decoded = decodeImages(real).collect().map(a => a.asset_id -> a.meta).toMap
    assert(decoded(10L) == MediaMeta(7, 5, 0, 0, "png"))
    assert(decoded(11L) == MediaMeta(31, 17, 0, 0, "jpeg"))
    assert(decoded(12L) == MediaMeta(9, 3, 0, 0, "bmp"))
    assert(decoded(13L) == MediaMeta(4, 6, 0, 0, "gif"))
  }

  test("ImageCodecs rejects truncated and corrupt headers") {
    import ImageCodecs._
    val png = realImage("png", 7, 5)
    assert(decodeHeader(png.take(12)).isEmpty) // truncated before IHDR dims
    assert(decodeHeader(Array[Byte](0, 1, 2, 3, 4, 5, 6, 7, 8)).isEmpty)
    assert(decodeHeader(null).isEmpty)
    val corrupt = png.clone(); corrupt(12) = 'X'.toByte // IHDR tag broken
    assert(decodeHeader(corrupt).isEmpty)
    // JPEG with EOI before any SOF frame header
    assert(decodeJpeg(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)).isEmpty)
  }

  test("WebP lossy/lossless/extended headers decode; corrupt chunks reject") {
    import ImageCodecs._
    def le24b(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte)
    def webp(id: String, payload: Array[Byte]): Array[Byte] = {
      val content = cc("WEBP") ++ cc(id) ++ le32b(payload.length) ++ payload
      cc("RIFF") ++ le32b(content.length) ++ content
    }
    val lossy = webp("VP8 ", Array[Byte](0, 0, 0) ++
      Array(0x9d, 0x01, 0x2a).map(_.toByte) ++ le16b(320) ++ le16b(240))
    val lossless = webp("VP8L",
      Array(0x2f.toByte) ++ le32b((100 - 1) | ((60 - 1) << 14)))
    val extended = webp("VP8X",
      Array[Byte](0, 0, 0, 0) ++ le24b(1920 - 1) ++ le24b(1080 - 1))
    assert(decodeWebp(lossy).contains(Dims(320, 240, "webp")))
    assert(decodeWebp(lossless).contains(Dims(100, 60, "webp")))
    assert(decodeWebp(extended).contains(Dims(1920, 1080, "webp")))
    // magic-order dispatch reaches WebP before the JPEG marker scan
    assert(decodeHeader(lossy).contains(Dims(320, 240, "webp")))
    // header-only prefix (the read-first-N-bytes sniffing pattern): a
    // first chunk whose declared size extends far past the buffer must
    // still yield dims — the decoder only reads ~30 bytes
    val bigDeclared = cc("RIFF") ++ le32b(5000) ++ cc("WEBP") ++ cc("VP8X") ++
      le32b(4096) ++ Array[Byte](0, 0, 0, 0) ++ le24b(1920 - 1) ++ le24b(1080 - 1)
    assert(decodeWebp(bigDeclared).contains(Dims(1920, 1080, "webp")))
    // truncated payload (lying size), broken start code, wrong form
    assert(decodeWebp(lossy.dropRight(6)).isEmpty)
    val badCode = lossy.clone(); badCode(23) = 0x00
    assert(decodeWebp(badCode).isEmpty)
    val notWebp = lossy.clone(); notWebp(8) = 'A'.toByte
    assert(decodeWebp(notWebp).isEmpty)
  }

  test("decode fills meta from payload and dead-letters undecodable assets") {
    val decoded = decodeImages(assets).collect().map(a => a.asset_id -> a.meta).toMap
    assert(decoded.keySet == Set(1L, 2L, 3L)) // asset 4 dropped (3 bytes)
    assert(decoded(1L).width == 640 && decoded(1L).height == 480)
    assert(decoded(2L).width == 4000 && decoded(2L).height == 3000)
  }

  test("resizeMeta computes targets without touching bytes") {
    val out = resizeMeta(decodeImages(assets).toDF(), maxDim = 1000)
      .select("asset_id", "target_width", "target_height", "needs_resize")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((640, 480, false)))
    assert(out(2L) == ((1000, 750, true)))
  }

  test("feature extraction is deterministic with the declared shape") {
    val f1 = extractFeatures(assets, dim = 8).collect().sortBy(_.asset_id)
    val f2 = extractFeatures(assets, dim = 8).collect().sortBy(_.asset_id)
    assert(f1.map(_.features.toList).toList == f2.map(_.features.toList).toList)
    assert(f1.forall(_.features.size == 8))
    assert(f1.map(_.n_bytes).toList == List(72L, 72L, 72L, 3L))
    // features are a real L1-normalized histogram: buckets sum to 1
    assert(f1.forall(f => math.abs(f.features.map(_.toDouble).sum - 1.0) < 1e-6))
  }

  test("feature values are the actual byte statistics") {
    val known = Seq(
      // constant payload: zero entropy, all mass in bucket 0 (byte 0x00)
      MediaAsset(10L, "image", Array.fill[Byte](64)(0),
        MediaMeta(0, 0, 0L, 0, "raw")),
      // one byte of every value: exactly 8 bits = 8000 milli-bits,
      // perfectly uniform buckets
      MediaAsset(11L, "image", Array.tabulate[Byte](256)(_.toByte),
        MediaMeta(0, 0, 0L, 0, "raw"))).toDS()
    val out = extractFeatures(known, dim = 8).collect().sortBy(_.asset_id)
    assert(out(0).byte_entropy_q == 0L)
    assert(out(0).features.head == 1.0f)
    assert(out(0).features.tail.forall(_ == 0.0f))
    assert(out(1).byte_entropy_q == 8000L)
    assert(out(1).features.forall(_ == 0.125f))
  }

  test("frame sampling yields one row per interval, video only") {
    val frames = sampleFrames(decodeImages(assets), everyMs = 1000).collect()
    assert(frames.forall(_.asset_id == 3L))
    assert(frames.length == 10) // 10 s / 1 s
    assert(frames.map(_.offset_ms).sorted.toList == (0 until 10).map(_ * 1000L).toList)
    assert(frames.forall(_.frame_bytes.length <= 16))
  }

  // -------------------------------------------------- RIFF containers

  private def le16b(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32b(v: Int) =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def cc(s: String) = s.getBytes("US-ASCII")
  private def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val pad = if (payload.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
    cc(id) ++ le32b(payload.length) ++ payload ++ pad
  }
  private def list(listType: String, payload: Array[Byte]): Array[Byte] =
    cc("LIST") ++ le32b(payload.length + 4) ++ cc(listType) ++ payload

  /** Minimal MJPEG AVI: avih header + movi list of 00dc JPEG chunks. */
  private def mjpegAvi(jpegs: Seq[Array[Byte]], usPerFrame: Int,
      w: Int, h: Int): Array[Byte] = {
    val avih = le32b(usPerFrame) ++ le32b(0) ++ le32b(0) ++ le32b(0) ++
      le32b(jpegs.length) ++ le32b(0) ++ le32b(1) ++ le32b(0) ++
      le32b(w) ++ le32b(h) ++ Array.fill[Byte](16)(0)
    val hdrl = list("hdrl", chunk("avih", avih))
    val movi = list("movi", jpegs.flatMap(j => chunk("00dc", j)).toArray)
    val body = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ le32b(body.length) ++ body
  }

  private def wav(rate: Int, bits: Int, channels: Int, nBytes: Int): Array[Byte] = {
    val byteRate = rate * channels * bits / 8
    val fmt = le16b(1) ++ le16b(channels) ++ le32b(rate) ++ le32b(byteRate) ++
      le16b(channels * bits / 8) ++ le16b(bits)
    val body = cc("WAVE") ++ chunk("fmt ", fmt) ++
      chunk("data", Array.fill[Byte](nBytes)(7))
    cc("RIFF") ++ le32b(body.length) ++ body
  }

  /** WAV with explicit little-endian PCM payload bytes. */
  private def wavPcm(rate: Int, bits: Int, channels: Int, data: Array[Byte]): Array[Byte] = {
    val byteRate = rate * channels * bits / 8
    val fmt = le16b(1) ++ le16b(channels) ++ le32b(rate) ++ le32b(byteRate) ++
      le16b(channels * bits / 8) ++ le16b(bits)
    val body = cc("WAVE") ++ chunk("fmt ", fmt) ++ chunk("data", data)
    cc("RIFF") ++ le32b(body.length) ++ body
  }

  test("wavPcmWindows: hand-computed energy/peak/zero-crossing windows (16-bit stereo, 8-bit mono)") {
    // 16-bit stereo, channel-0 samples 100,-200,300,0,-1,50 (ch1 = 0)
    val ch0 = Seq(100, -200, 300, 0, -1, 50)
    val pcm16 = ch0.flatMap(s => le16b(s & 0xffff) ++ le16b(0)).toArray
    val w = RiffCodecs.wavPcmWindows(
      wavPcm(16000, 16, 2, pcm16), windowSamples = 4, hop = 2)
    assert(w.map(x => (x.start, x.n, x.sumAbs, x.peak, x.zeroCross)) == Seq(
      (0L, 4, 600L, 300, 2),  // +,-,+,0(+): two sign flips
      (2L, 4, 351L, 300, 2),  // +,0(+),-,+
      (4L, 2, 51L, 50, 1)))   // -,+

    // 8-bit mono is unsigned around 128: bytes 128,138,118 → 0,10,-10
    val w8 = RiffCodecs.wavPcmWindows(
      wavPcm(8000, 8, 1, Array[Byte](128.toByte, 138.toByte, 118.toByte)),
      windowSamples = 3, hop = 3)
    assert(w8.map(x => (x.start, x.n, x.sumAbs, x.peak, x.zeroCross)) ==
      Seq((0L, 3, 20L, 10, 1)))

    // dead-letter contract: junk, non-PCM format tag, bad params → empty
    assert(RiffCodecs.wavPcmWindows(Array[Byte](1, 2, 3)).isEmpty)
    val nonPcm = {
      val fmt = le16b(3) ++ le16b(1) ++ le32b(8000) ++ le32b(32000) ++
        le16b(4) ++ le16b(32) // IEEE-float format tag
      val body = cc("WAVE") ++ chunk("fmt ", fmt) ++ chunk("data", Array.fill[Byte](8)(1))
      cc("RIFF") ++ le32b(body.length) ++ body
    }
    assert(RiffCodecs.wavPcmWindows(nonPcm).isEmpty)
    assert(RiffCodecs.wavPcmWindows(wavPcm(8000, 8, 1, Array[Byte](1)), 0, 4).isEmpty)
  }

  test("audioWindows: per-window rows for audio assets, junk contributes none") {
    implicit val s = spark
    val good = MediaAsset(60L, "audio",
      wavPcm(16000, 16, 1, Seq(5, -6).flatMap(x => le16b(x & 0xffff)).toArray),
      MediaMeta(0, 0, 0L, 0, ""))
    val junk = MediaAsset(61L, "audio", Array[Byte](9, 9, 9),
      MediaMeta(0, 0, 0L, 0, ""))
    val rows = Multimodal.audioWindows(Seq(good, junk).toDS(), 2, 2).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 60L && r.getLong(1) == 0L && r.getInt(2) == 2 &&
      r.getLong(3) == 11L && r.getInt(4) == 6 && r.getInt(5) == 1)
  }

  test("AVI demux: sampled frames are the container's actual JPEG payloads") {
    // 6 MJPEG frames at 2 fps (500 ms/frame) → 3 s of video, each frame
    // a real JDK-encoded JPEG with distinct dimensions
    val jpegs = (0 until 6).map(i => realImage("jpg", 16 + i, 8 + i))
    val avi = mjpegAvi(jpegs, usPerFrame = 500000, w = 21, h = 13)
    val info = RiffCodecs.decodeAvi(avi).get
    assert(info.width == 21 && info.height == 13)
    assert(info.frames.size == 6 && info.durationMs == 3000)

    val ds = Seq(MediaAsset(30L, "video", avi,
      MediaMeta(0, 0, 0L, 0, "avi"))).toDS()
    // every 1000 ms over 3 s → frames at 0/1000/2000 ms = indices 0/2/4
    val frames = sampleFrames(ds, everyMs = 1000).collect().sortBy(_.offset_ms)
    assert(frames.map(_.frame_index).toList == List(0, 2, 4))
    assert(frames.map(_.offset_ms).toList == List(0L, 1000L, 2000L))
    frames.zip(List(0, 2, 4)).foreach { case (f, i) =>
      assert(f.frame_bytes.sameElements(jpegs(i)), s"frame $i bytes differ")
      // the demuxed payload is itself a decodable JPEG
      val dims = ImageCodecs.decodeJpeg(f.frame_bytes).get
      assert(dims.width == 16 + i && dims.height == 8 + i)
    }
    // truncated container dead-letters instead of throwing
    assert(RiffCodecs.decodeAvi(avi.take(avi.length / 2)).isEmpty ||
      RiffCodecs.decodeAvi(avi.take(avi.length / 2)).get.frames.size < 6)
  }

  private def be32b(v: Long) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
    (v >> 8).toByte, v.toByte)
  private def box(tpe: String, payload: Array[Byte]): Array[Byte] =
    be32b(payload.length + 8L) ++ cc(tpe) ++ payload

  test("MP4 metadata: brand + mvhd duration via the box walk; video pass dispatches by container") {
    // mvhd v0: version/flags(4) created(4) modified(4) timescale(4) duration(4)
    val mvhd = box("mvhd", be32b(0) ++ be32b(0) ++ be32b(0) ++
      be32b(600) ++ be32b(1500) ++ Array.fill[Byte](80)(0))
    val mp4 = box("ftyp", cc("isom") ++ be32b(512) ++ cc("isomavc1")) ++
      box("moov", mvhd)
    val info = RiffCodecs.decodeMp4(mp4).get
    assert(info.brand == "isom")
    assert(info.durationMs == 2500L) // 1500 ticks at 600/s
    assert(RiffCodecs.decodeMp4(mp4.take(10)).isEmpty)
    assert(RiffCodecs.decodeMp4(wav(16000, 16, 1, 64)).isEmpty)

    val jpegs = (0 until 2).map(_ => realImage("jpg", 8, 8))
    val avi = mjpegAvi(jpegs, usPerFrame = 500000, w = 8, h = 8)
    val out = decodeVideo(Seq(
      MediaAsset(50L, "video", mp4, MediaMeta(0, 0, 0L, 0, "?")),
      MediaAsset(51L, "video", avi, MediaMeta(0, 0, 0L, 0, "?")),
      MediaAsset(52L, "video", Array[Byte](9, 9, 9), MediaMeta(0, 0, 0L, 0, "?"))
    ).toDS()).collect().map(a => a.asset_id -> a.meta).toMap
    assert(out.keySet == Set(50L, 51L))
    assert(out(50L).format == "isom" && out(50L).durationMs == 2500L)
    assert(out(51L).format == "avi" && out(51L).width == 8 && out(51L).durationMs == 1000L)
  }

  private def ebmlId(id: Long): Array[Byte] = {
    val w = if (id <= 0xff) 1 else if (id <= 0xffff) 2 else if (id <= 0xffffff) 3 else 4
    (0 until w).map(i => ((id >> (8 * (w - 1 - i))) & 0xff).toByte).toArray
  }
  // 2-byte size form (0x40xx): marker in bit 14, ample for fixtures
  private def ebmlSize(n: Long): Array[Byte] =
    Array[Byte]((0x40 | (n >> 8)).toByte, (n & 0xff).toByte)
  private def el(id: Long, payload: Array[Byte]): Array[Byte] =
    ebmlId(id) ++ ebmlSize(payload.length) ++ payload

  test("MKV metadata: EBML walk fills docType/duration/tracks; streamed unknown-size segment; fuzz-safe") {
    val headerEl = el(0x1A45DFA3L, el(0x4282L, "matroska".getBytes("US-ASCII")))
    val info = el(0x1549A966L,
      el(0x2AD7B1L, Array[Byte](0x0F, 0x42, 0x40)) ++ // TimestampScale 1e6 ns
        el(0x4489L, be32b(java.lang.Float.floatToIntBits(2000f)))) // 2000 ticks
    val tracks = el(0x1654AE6BL,
      el(0xAEL, el(0x83L, Array[Byte](1))) ++ // video
        el(0xAEL, el(0x83L, Array[Byte](2)))) // audio
    val mkv = headerEl ++ el(0x18538067L, info ++ tracks)
    assert(RiffCodecs.decodeMkv(mkv).get ==
      RiffCodecs.MkvInfo("matroska", 2000L, 1, 1))

    // unknown-size Segment (streamed capture): 0xFF clamps to the end
    val streamed = headerEl ++ ebmlId(0x18538067L) ++
      Array[Byte](0xff.toByte) ++ info ++ tracks
    assert(RiffCodecs.decodeMkv(streamed).get ==
      RiffCodecs.MkvInfo("matroska", 2000L, 1, 1))

    // the video pass dispatches by container alongside AVI/MP4
    val out = decodeVideo(Seq(
      MediaAsset(60L, "video", mkv, MediaMeta(0, 0, 0L, 0, "?"))).toDS())
      .collect().head
    assert(out.meta.format == "matroska" && out.meta.durationMs == 2000L)

    // non-matroska doc type and non-EBML lead-in dead-letter
    assert(RiffCodecs.decodeMkv(
      el(0x1A45DFA3L, el(0x4282L, "avi".getBytes("US-ASCII")))).isEmpty)
    assert(RiffCodecs.decodeMkv(mkv.drop(2)).isEmpty)
    // every truncation is clean (no throw)
    (0 until mkv.length).foreach(n => RiffCodecs.decodeMkv(mkv.take(n)))
    // fuzz with the EBML magic spliced in to reach deep walk paths
    val rnd = new scala.util.Random(31)
    (0 until 300).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(120))
      rnd.nextBytes(b)
      if (b.length >= 4) System.arraycopy(
        Array[Byte](0x1a, 0x45, 0xdf.toByte, 0xa3.toByte), 0, b, 0, 4)
      RiffCodecs.decodeMkv(b)
    }
  }

  // Matroska block: vint track number, signed be16 relative timestamp,
  // flags byte (lacing in bits 0x06), then the (possibly laced) payload
  private def blockBytes(track: Int, relTs: Int, lace: Int, payload: Array[Byte]): Array[Byte] =
    Array[Byte]((0x80 | track).toByte, (relTs >> 8).toByte, relTs.toByte,
      (lace << 1).toByte) ++ payload
  private def simpleBlock(track: Int, relTs: Int, lace: Int, payload: Array[Byte]): Array[Byte] =
    el(0xA3L, blockBytes(track, relTs, lace, payload))

  test("MKV frame demux: Cluster/SimpleBlock traversal with all four lacings; sampleFrames serves them") {
    val headerEl = el(0x1A45DFA3L, el(0x4282L, "matroska".getBytes("US-ASCII")))
    val info = el(0x1549A966L,
      el(0x2AD7B1L, Array[Byte](0x0F, 0x42, 0x40)) ++ // 1 ms per tick
        el(0x4489L, be32b(java.lang.Float.floatToIntBits(4000f)))) // 4000 ms
    val tracks = el(0x1654AE6BL,
      el(0xAEL, el(0xD7L, Array[Byte](1)) ++ el(0x83L, Array[Byte](1)) ++
        el(0xE0L, el(0xB0L, Array[Byte](0, 32)) ++ el(0xBAL, Array[Byte](24)))) ++
        el(0xAEL, el(0xD7L, Array[Byte](2)) ++ el(0x83L, Array[Byte](2))))

    val jpeg0 = realImage("jpg", 16, 8)
    val jpeg1 = realImage("jpg", 17, 9)
    // Xiph lace: 3 frames of 5, 300, 7 bytes — 300 needs a 255+45 run
    val xf = Seq(Array.fill[Byte](5)(11), Array.fill[Byte](300)(12), Array.fill[Byte](7)(13))
    val xiphPayload = Array[Byte](2, 5, 0xff.toByte, 45) ++ xf(0) ++ xf(1) ++ xf(2)
    // fixed-size lace: 4 frames x 6 bytes
    val ff = (0 until 4).map(i => Array.fill[Byte](6)((20 + i).toByte))
    val fixedPayload = Array[Byte](3) ++ ff.flatten
    // EBML lace: sizes 5, 8 (delta +3 → 1-byte signed vint 63+3=66), last 6
    val ef = Seq(Array.fill[Byte](5)(31), Array.fill[Byte](8)(32), Array.fill[Byte](6)(33))
    val ebmlPayload = Array[Byte](2, 0x85.toByte, (0x80 | 66).toByte) ++ ef(0) ++ ef(1) ++ ef(2)

    val cluster1 = el(0x1F43B675L,
      el(0xE7L, Array[Byte](0)) ++
        simpleBlock(1, 0, 0, jpeg0) ++
        simpleBlock(2, 5, 0, Array.fill[Byte](9)(99)) ++ // audio: excluded
        simpleBlock(1, 10, 1, xiphPayload))
    val cluster2 = el(0x1F43B675L,
      el(0xE7L, Array[Byte](100)) ++
        el(0xA0L, el(0xA1L, blockBytes(1, 0, 0, jpeg1))) ++ // BlockGroup>Block
        simpleBlock(1, 10, 2, fixedPayload) ++
        simpleBlock(1, 20, 3, ebmlPayload))
    val mkv = headerEl ++ el(0x18538067L, info ++ tracks ++ cluster1 ++ cluster2)

    val m = RiffCodecs.decodeMkv(mkv).get
    assert(m.width == 32 && m.height == 24, s"dims ${m.width}x${m.height}")
    assert(m.durationMs == 4000L)
    // 1 (plain) + 3 (xiph) + 1 (block group) + 4 (fixed) + 3 (ebml) = 12
    assert(m.frames.size == 12, s"got ${m.frames.size}: ${m.frames}")
    def slice(i: Int): Array[Byte] = {
      val (o, l) = m.frames(i)
      java.util.Arrays.copyOfRange(mkv, o, o + l)
    }
    // timestamp order: cluster1 (ts 0, 10) then cluster2 (ts 100, 110, 120)
    assert(ImageCodecs.decodeJpeg(slice(0)).exists(d => d.width == 16 && d.height == 8))
    (0 until 3).foreach(i => assert(slice(1 + i).sameElements(xf(i)), s"xiph frame $i"))
    assert(ImageCodecs.decodeJpeg(slice(4)).exists(d => d.width == 17 && d.height == 9))
    (0 until 4).foreach(i => assert(slice(5 + i).sameElements(ff(i)), s"fixed frame $i"))
    (0 until 3).foreach(i => assert(slice(9 + i).sameElements(ef(i)), s"ebml frame $i"))

    // the sampler serves MKV frames end-to-end (4000ms / 12 frames)
    val fs = Multimodal.sampleFrames(Seq(
        MediaAsset(61L, "video", mkv, MediaMeta(0, 0, 4000L, 0, "matroska"))).toDS(),
        everyMs = 2000L)
      .collect().sortBy(_.frame_index)
    assert(fs.length == 2, s"got ${fs.length}")
    assert(ImageCodecs.decodeJpeg(fs(0).frame_bytes).exists(_.width == 16))

    // a lying Xiph lace (declared sizes overrun the block) drops whole,
    // the rest of the file still demuxes
    val lying = el(0x1F43B675L,
      el(0xE7L, Array[Byte](0)) ++
        simpleBlock(1, 0, 1, Array[Byte](1, 120) ++ Array.fill[Byte](10)(7)) ++
        simpleBlock(1, 5, 0, Array.fill[Byte](4)(42)))
    val mkvLying = headerEl ++ el(0x18538067L, info ++ tracks ++ lying)
    val lm = RiffCodecs.decodeMkv(mkvLying).get
    assert(lm.frames.size == 1 && lm.frames.head._2 == 4, s"got ${lm.frames}")

    // frames survive Cluster-before-Tracks ordering (track filter is
    // applied after the walk)
    val mkvSwapped = headerEl ++ el(0x18538067L, info ++ cluster1 ++ tracks)
    assert(RiffCodecs.decodeMkv(mkvSwapped).get.frames.size == 4)

    // every truncation of the real fixture is clean (no throw)
    (0 until mkv.length).foreach(n => RiffCodecs.decodeMkv(mkv.take(n)))
  }

  test("WAV decode: format + duration from the RIFF walk, audio pass dead-letters junk") {
    // 16 kHz mono 16-bit, 32000 bytes of data = exactly 1000 ms
    val good = MediaAsset(40L, "audio", wav(16000, 16, 1, 32000),
      MediaMeta(0, 0, 0L, 0, "?"))
    val junk = MediaAsset(41L, "audio", Array[Byte](1, 2, 3, 4),
      MediaMeta(0, 0, 0L, 0, "?"))
    val out = decodeAudio(Seq(good, junk).toDS()).collect()
    assert(out.length == 1 && out(0).asset_id == 40L)
    assert(out(0).meta.sampleRate == 16000)
    assert(out(0).meta.durationMs == 1000L)
    assert(out(0).meta.format == "wav")
  }

  test("codecs never throw on fuzzed bytes — corrupt payloads dead-letter") {
    val rnd = new scala.util.Random(97)
    val magics = Seq(cc("RIFF"), cc("LIST"), Array[Byte](0xff.toByte, 0xd8.toByte),
      cc("ftyp"), Array[Byte](0x89.toByte, 'P', 'N', 'G'))
    (0 until 500).foreach { i =>
      val len = rnd.nextInt(200)
      val b = new Array[Byte](len)
      rnd.nextBytes(b)
      // half the probes get a real magic spliced in to reach deep parse paths
      if (i % 2 == 0 && len >= 12) {
        val m = magics(rnd.nextInt(magics.size))
        System.arraycopy(m, 0, b, 0, math.min(m.length, len))
      }
      RiffCodecs.decodeAvi(b); RiffCodecs.decodeWav(b); RiffCodecs.decodeMp4(b)
      RiffCodecs.decodeMkv(b)
      ImageCodecs.decodeHeader(b)
    }
    // truncations of VALID containers, every prefix length
    val avi = mjpegAvi(Seq(realImage("jpg", 8, 8)), 500000, 8, 8)
    val w = wav(16000, 16, 1, 64)
    (0 until avi.length).foreach(n => RiffCodecs.decodeAvi(avi.take(n)))
    (0 until w.length).foreach(n => RiffCodecs.decodeWav(w.take(n)))

    // 32-bit-wrap sizes: a chunk/box length near 2^31..2^32 must trip
    // the truncation guard, not wrap the walker's offsets negative
    for (evil <- Seq(0x7ffffff0L, 0x80000000L, 0xfffffff8L)) {
      val evilChunk = cc("00dc") ++ le32b(evil.toInt) ++ Array.fill[Byte](16)(0)
      assert(RiffCodecs.decodeAvi(
        cc("RIFF") ++ le32b(1000) ++ cc("AVI ") ++ evilChunk).isEmpty)
      assert(RiffCodecs.decodeWav(
        cc("RIFF") ++ le32b(1000) ++ cc("WAVE") ++
          cc("data") ++ le32b(evil.toInt) ++ Array.fill[Byte](16)(0)).isEmpty)
      assert(RiffCodecs.decodeMp4(
        box("ftyp", cc("isom") ++ be32b(0)) ++
          be32b(evil) ++ cc("moov") ++ Array.fill[Byte](16)(0)).map(_.durationMs)
          .forall(_ == 0L)) // brand parsed, evil moov box stops the walk
    }
  }

  test("MP4 frame demux: stsz/stco/stsc resolve to real frame slices; sampleFrames serves them") {
    // three MJPEG frames laid out in TWO chunks (2 + 1 samples) with a
    // junk gap between the chunks — only the sample tables know the
    // true layout, so matching slices proves stco/stsc/stsz are honored
    val jpegs = (0 until 3).map(i => realImage("jpg", 16 + i, 8 + i))
    def fullBox(tpe: String, payload: Array[Byte]) =
      box(tpe, be32b(0) ++ payload) // version(1)+flags(3) = one zero be32
    val hdlr = fullBox("hdlr", be32b(0) ++ cc("vide") ++ Array.fill[Byte](12)(0))
    val stsc = fullBox("stsc", be32b(2) ++
      (be32b(1) ++ be32b(2) ++ be32b(1)) ++ // chunks 1..1: 2 samples each
      (be32b(2) ++ be32b(1) ++ be32b(1)))   // chunks 2..: 1 sample each
    val stsz = fullBox("stsz", be32b(0) ++ be32b(3) ++
      jpegs.toArray.flatMap(f => be32b(f.length.toLong)))
    val mvhd = box("mvhd", be32b(0) ++ be32b(0) ++ be32b(0) ++
      be32b(600) ++ be32b(1500) ++ Array.fill[Byte](80)(0)) // 2500 ms
    val ftypB = box("ftyp", cc("isom") ++ be32b(512) ++ cc("isomavc1"))

    def assemble(c1: Long, c2: Long): Array[Byte] = {
      val stco = fullBox("stco", be32b(2) ++ be32b(c1) ++ be32b(c2))
      val stbl = box("stbl", stsc ++ stsz ++ stco)
      val trak = box("trak", box("mdia", hdlr ++ box("minf", stbl)))
      val moov = box("moov", mvhd ++ trak)
      val gap = Array[Byte](9, 9, 9, 9)
      val mdat = box("mdat", jpegs(0) ++ jpegs(1) ++ gap ++ jpegs(2))
      ftypB ++ moov ++ mdat
    }
    // stco holds absolute file offsets → two-pass: sizes are offset-
    // independent, so assemble once for lengths, then with real offsets
    val probe = assemble(0, 0)
    val mdatPayload = probe.length - (jpegs.map(_.length).sum + 4)
    val c1 = mdatPayload
    val c2 = mdatPayload + jpegs(0).length + jpegs(1).length + 4
    val mp4 = assemble(c1, c2)

    val info = RiffCodecs.decodeMp4(mp4).get
    assert(info.durationMs == 2500L)
    assert(info.frames.size == 3, s"got ${info.frames}")
    info.frames.zipWithIndex.foreach { case ((off, len), i) =>
      val dims = ImageCodecs.decodeJpeg(
        java.util.Arrays.copyOfRange(mp4, off, off + len)).get
      assert(dims.width == 16 + i && dims.height == 8 + i, s"frame $i: $dims")
    }

    // the sampler serves MP4 frames end-to-end (clock: 2500ms / 3 frames)
    val fs = Multimodal.sampleFrames(Seq(
        MediaAsset(60L, "video", mp4, MediaMeta(0, 0, 2500L, 0, "isom"))).toDS(),
        everyMs = 900L)
      .collect().sortBy(_.frame_index)
    assert(fs.length == 2, s"2500ms / 900ms = offsets 0,900 → container frames 0,1; got ${fs.length}")
    fs.foreach { f =>
      val dims = ImageCodecs.decodeJpeg(f.frame_bytes).get
      assert(dims.width == 16 + f.frame_index, s"frame ${f.frame_index}: $dims")
    }

    // a non-video trak (hdlr 'soun') must not contribute frames
    val soun = fullBox("hdlr", be32b(0) ++ cc("soun") ++ Array.fill[Byte](12)(0))
    val audioOnly = {
      val stco = fullBox("stco", be32b(2) ++ be32b(c1) ++ be32b(c2))
      val stbl = box("stbl", stsc ++ stsz ++ stco)
      val trak = box("trak", box("mdia", soun ++ box("minf", stbl)))
      val gap = Array[Byte](9, 9, 9, 9)
      ftypB ++ box("moov", mvhd ++ trak) ++
        box("mdat", jpegs(0) ++ jpegs(1) ++ gap ++ jpegs(2))
    }
    assert(RiffCodecs.decodeMp4(audioOnly).get.frames.isEmpty)

    // crafted table counts (entry count >> box payload) are ignored, not allocated
    val evilStsz = fullBox("stsz", be32b(0) ++ be32b(0x7fffffffL) ++ be32b(1))
    val evil = {
      val stco = fullBox("stco", be32b(2) ++ be32b(c1) ++ be32b(c2))
      val stbl = box("stbl", stsc ++ evilStsz ++ stco)
      ftypB ++ box("moov", mvhd ++ box("trak", box("mdia", hdlr ++ box("minf", stbl))))
    }
    assert(RiffCodecs.decodeMp4(evil).get.frames.isEmpty)
  }

  test("deeply nested containers are depth-bounded — no StackOverflowError") {
    // ~20k nesting levels, every size field VALID: an unbounded recursive
    // walk dies with StackOverflowError (an Error — it would escape the
    // Option dead-letter path and kill the task). The walker must cap
    // depth and return cleanly instead.
    val depth = 20000

    // AVI: RIFF('AVI ') wrapping `depth` nested LISTs around an avih
    val avih = chunk("avih", le32b(500000) ++ Array.fill[Byte](36)(0))
    val nest = new Array[Byte](12 * depth + avih.length)
    var off = 0
    while (off < 12 * depth) {
      System.arraycopy(cc("LIST"), 0, nest, off, 4)
      System.arraycopy(le32b(nest.length - off - 8), 0, nest, off + 4, 4)
      System.arraycopy(cc("hdrl"), 0, nest, off + 8, 4)
      off += 12
    }
    System.arraycopy(avih, 0, nest, off, avih.length)
    val deepAvi = cc("RIFF") ++ le32b(nest.length + 4) ++ cc("AVI ") ++ nest
    assert(RiffCodecs.decodeAvi(deepAvi).isEmpty) // avih sits past the cap

    // MP4: ftyp + `depth` nested moov boxes around an mvhd
    val mvhd = box("mvhd", be32b(0) ++ be32b(0) ++ be32b(0) ++
      be32b(600) ++ be32b(1500) ++ Array.fill[Byte](80)(0))
    val mnest = new Array[Byte](8 * depth + mvhd.length)
    off = 0
    while (off < 8 * depth) {
      System.arraycopy(be32b(mnest.length - off.toLong), 0, mnest, off, 4)
      System.arraycopy(cc("moov"), 0, mnest, off + 4, 4)
      off += 8
    }
    System.arraycopy(mvhd, 0, mnest, off, mvhd.length)
    val deepMp4 = box("ftyp", cc("isom") ++ be32b(512) ++ cc("isomavc1")) ++ mnest
    val deepInfo = RiffCodecs.decodeMp4(deepMp4).get
    assert(deepInfo.brand == "isom" && deepInfo.durationMs == 0L) // mvhd past cap

    // WITHIN the cap, nesting still parses: avih/mvhd behind 8 extra levels
    val shallowAvi = {
      val hdrl = (0 until 8).foldLeft(chunk("avih",
        le32b(500000) ++ le32b(0) ++ le32b(0) ++ le32b(0) ++ le32b(1) ++
          le32b(0) ++ le32b(1) ++ le32b(0) ++ le32b(9) ++ le32b(7) ++
          Array.fill[Byte](16)(0))) { (inner, _) => list("hdrl", inner) }
      val movi = list("movi", chunk("00dc", Array.fill[Byte](6)(1)))
      val body = cc("AVI ") ++ hdrl ++ movi
      cc("RIFF") ++ le32b(body.length) ++ body
    }
    val si = RiffCodecs.decodeAvi(shallowAvi).get
    assert(si.width == 9 && si.height == 7 && si.frames.size == 1)
    val shallowMp4 = box("ftyp", cc("isom") ++ be32b(512)) ++
      (0 until 8).foldLeft(mvhd) { (inner, _) => box("moov", inner) }
    assert(RiffCodecs.decodeMp4(shallowMp4).get.durationMs == 2500L)
  }

  test("binary round-trips through parquet with the declared schema") {
    val dir = java.nio.file.Files.createTempDirectory("mm").toString
    assets.toDF().write.mode("overwrite").parquet(dir)
    val back = spark.read.schema(Multimodal.assetSchema).parquet(dir)
    assert(back.count() == 4)
    assert(back.filter(length(col("bytes")) > 8).count() == 3)
  }
}
