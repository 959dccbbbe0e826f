package graft.ops

/** Real pure-JVM image header codecs for the multimodal decode pass —
  * no image library needed to read dimensions: every mainstream
  * container carries (width, height) in its first kilobyte.
  *
  *   - PNG:  8-byte signature, then the IHDR chunk — width/height as
  *     big-endian u32 at offsets 16/20 (PNG spec §11.2.2).
  *   - BMP:  "BM" + BITMAPINFOHEADER — width/height as little-endian
  *     i32 at offsets 18/22 (height may be negative = top-down rows).
  *   - GIF:  "GIF87a"/"GIF89a" + logical screen size as little-endian
  *     u16 at offsets 6/8.
  *   - JPEG: marker scan to the first SOFn segment (baseline /
  *     progressive / lossless variants), height/width as big-endian
  *     u16 at segment offsets 3/5 (ITU T.81 §B.2.2).
  *
  * These run inside `mapPartitions` on binary columns — at 100 TB a
  * dimensions sweep reads headers, never payload tails, and never
  * shells out to a codec library.
  */
object ImageCodecs {

  final case class Dims(width: Int, height: Int, format: String)

  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xff
  private def be16(b: Array[Byte], o: Int): Int = (u8(b, o) << 8) | u8(b, o + 1)
  private def le16(b: Array[Byte], o: Int): Int = (u8(b, o + 1) << 8) | u8(b, o)
  private def be32(b: Array[Byte], o: Int): Int =
    (u8(b, o) << 24) | (u8(b, o + 1) << 16) | (u8(b, o + 2) << 8) | u8(b, o + 3)
  private def le32(b: Array[Byte], o: Int): Int =
    (u8(b, o + 3) << 24) | (u8(b, o + 2) << 16) | (u8(b, o + 1) << 8) | u8(b, o)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def decodePng(b: Array[Byte]): Option[Dims] =
    if (b.length < 24 || !b.take(8).sameElements(PngSig)) None
    else if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) None
    else {
      val (w, h) = (be32(b, 16), be32(b, 20))
      if (w > 0 && h > 0) Some(Dims(w, h, "png")) else None
    }

  def decodeBmp(b: Array[Byte]): Option[Dims] =
    if (b.length < 26 || b(0) != 'B' || b(1) != 'M') None
    else {
      val headerSize = le32(b, 14)
      if (headerSize < 40) { // BITMAPCOREHEADER: u16 dims at 18/20
        val (w, h) = (le16(b, 18), le16(b, 20))
        if (w > 0 && h > 0) Some(Dims(w, h, "bmp")) else None
      } else {
        val w = le32(b, 18)
        val h = math.abs(le32(b, 22)) // negative height = top-down
        if (w > 0 && h > 0) Some(Dims(w, h, "bmp")) else None
      }
    }

  def decodeGif(b: Array[Byte]): Option[Dims] = {
    val sigOk = b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'
    if (!sigOk) None
    else {
      val (w, h) = (le16(b, 6), le16(b, 8))
      if (w > 0 && h > 0) Some(Dims(w, h, "gif")) else None
    }
  }

  /** SOFn markers carrying frame dimensions: C0-C3, C5-C7, C9-CB, CD-CF
    * (C4=DHT, C8=JPG extension, CC=DAC are not frame headers). */
  private def isSof(marker: Int): Boolean =
    marker >= 0xc0 && marker <= 0xcf &&
      marker != 0xc4 && marker != 0xc8 && marker != 0xcc

  def decodeJpeg(b: Array[Byte]): Option[Dims] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var o = 2
    while (o + 3 < b.length) {
      if (u8(b, o) != 0xff) return None // desynced marker stream
      var marker = u8(b, o + 1)
      while (marker == 0xff && o + 2 < b.length) { o += 1; marker = u8(b, o + 1) } // fill bytes
      if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS before any SOF
      if (isSof(marker)) {
        if (o + 8 >= b.length) return None
        val (h, w) = (be16(b, o + 5), be16(b, o + 7))
        return if (w > 0 && h > 0) Some(Dims(w, h, "jpeg")) else None
      }
      val segLen = be16(b, o + 2)
      if (segLen < 2) return None
      o += 2 + segLen
    }
    None
  }

  private def le24(b: Array[Byte], o: Int): Int =
    (u8(b, o + 2) << 16) | (u8(b, o + 1) << 8) | u8(b, o)

  /** WebP: a RIFF container ('WEBP' form) whose first chunk names the
    * flavor (RFC 9649):
    *   - 'VP8 ' lossy — 3-byte frame tag, 0x9D012A start code, then
    *     14-bit width/height in the next two le16s;
    *   - 'VP8L' lossless — 0x2F signature byte, then width-1/height-1
    *     as consecutive 14-bit fields of one le32;
    *   - 'VP8X' extended — canvas width-1/height-1 as le24s at payload
    *     offsets 4/7. */
  def decodeWebp(b: Array[Byte]): Option[Dims] = {
    if (b == null || b.length < 25) return None // 12 RIFF + 8 chunk + 5 VP8L min
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P')) return None
    val id = new String(b, 12, 4, java.nio.charset.StandardCharsets.US_ASCII)
    val size = le32(b, 16).toLong & 0xffffffffL
    val p = 20 // chunk payload start
    // bound the buffer check to the bytes this decoder actually READS
    // (≤ 10 payload bytes) — a header-only PREFIX of a valid WebP (the
    // standard read-first-N-bytes sniffing pattern) must still decode;
    // the declared chunk size stays a per-flavor sanity LOWER bound
    // (the other decoders are exactly this lenient on truncated tails)
    def has(n: Int): Boolean = p + n <= b.length
    id match {
      case "VP8 " if size >= 10 && has(10) &&
          u8(b, p + 3) == 0x9d && u8(b, p + 4) == 0x01 && u8(b, p + 5) == 0x2a =>
        val w = le16(b, p + 6) & 0x3fff
        val h = le16(b, p + 8) & 0x3fff
        if (w > 0 && h > 0) Some(Dims(w, h, "webp")) else None
      case "VP8L" if size >= 5 && has(5) && u8(b, p) == 0x2f =>
        val v = le32(b, p + 1)
        val w = (v & 0x3fff) + 1
        val h = ((v >>> 14) & 0x3fff) + 1
        Some(Dims(w, h, "webp"))
      case "VP8X" if size >= 10 && has(10) =>
        val w = le24(b, p + 4) + 1
        val h = le24(b, p + 7) + 1
        Some(Dims(w, h, "webp"))
      case _ => None
    }
  }

  /** TIFF baseline header (TIFF 6.0 §2): 'II'/0x2A00 little-endian or
    * 'MM'/0x002A big-endian, a 32-bit offset to IFD0, then the IFD —
    * a 16-bit entry count and 12-byte entries (tag/type/count/value).
    * Dimensions are tags 256 (ImageWidth) and 257 (ImageLength) with
    * type SHORT(3) or LONG(4) and count 1, so the value sits INLINE in
    * the entry's value field — a SHORT occupies the field's FIRST two
    * bytes in the file's byte order (left-justified per §2, which for
    * big-endian means the high half of the 32-bit field). Both byte
    * orders walked with the same code through order-dispatched reads;
    * garbage, truncation, and missing dimension tags return None. */
  def decodeTiff(b: Array[Byte]): Option[Dims] = {
    if (b == null || b.length < 8) return None
    val little =
      if (b(0) == 'I' && b(1) == 'I' && u8(b, 2) == 0x2a && u8(b, 3) == 0) true
      else if (b(0) == 'M' && b(1) == 'M' && u8(b, 2) == 0 && u8(b, 3) == 0x2a) false
      else return None
    def r16(o: Int): Int = if (little) le16(b, o) else be16(b, o)
    def r32(o: Int): Int = if (little) le32(b, o) else be32(b, o)
    val ifd = r32(4)
    // subtraction, not addition: a crafted offset near Int.MaxValue
    // must fail the guard, never wrap it (b.length >= 8 here)
    if (ifd < 8 || ifd > b.length - 2) return None
    val n = r16(ifd)
    // same subtraction-style overflow discipline as the ifd guard:
    // ifd + 2 + 12*n can wrap Int for n up to 65535 with ifd near
    // b.length, so bound n against the remaining bytes instead
    if (n <= 0 || n > (b.length - ifd - 2) / 12) return None
    var w = 0
    var h = 0
    var i = 0
    while (i < n) {
      val e = ifd + 2 + 12 * i
      val tag = r16(e)
      val tpe = r16(e + 2)
      val count = r32(e + 4)
      if ((tag == 256 || tag == 257) && count == 1 &&
          (tpe == 3 || tpe == 4)) {
        // inline value: SHORT left-justified in the 4-byte field
        val v = if (tpe == 3) r16(e + 8) else r32(e + 8)
        if (tag == 256) w = v else h = v
      }
      i += 1
    }
    if (w > 0 && h > 0) Some(Dims(w, h, "tiff")) else None
  }

  /** AVIF / HEIC still images (ISO-BMFF / HEIF, ISO/IEC 23008-12):
    * `ftyp` with an image brand, then the `meta` FULLBOX (4 bytes of
    * version/flags precede its children — the one structural trap of
    * this walk) nesting `iprp` → `ipco` → `ispe`, whose payload after
    * its own version/flags is image_width/image_height as be32s. The
    * walk descends exactly that spine with per-box bounds checks;
    * lying sizes, truncation, or a missing `ispe` return None. Format
    * reports the brand family (avif/avis → "avif", heic/heix →
    * "heic", other mif1-style brands → "heif"). */
  def decodeAvif(b: Array[Byte]): Option[Dims] = {
    if (b == null || b.length < 16) return None
    def fourcc(o: Int): String =
      if (o + 4 > b.length) ""
      else new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fourcc(4) != "ftyp") return None
    val fmt = fourcc(8) match {
      case "avif" | "avis" => "avif"
      case "heic" | "heix" => "heic"
      case "mif1" | "msf1" => "heif"
      case _ => return None
    }
    // find a child box by type inside [start, end); returns payload
    // bounds. Fullbox children are handled at the call sites (the
    // caller offsets past the 4 version/flags bytes). size==1 carries
    // a 64-bit largesize at o+8 (some streaming muxers emit it
    // unconditionally, e.g. on a leading mdat) — parsed, not fatal.
    def child(start: Int, end: Int, tpe: String): Option[(Int, Int)] = {
      var o = start
      while (o + 8 <= end) {
        val size32 = be32(b, o).toLong & 0xffffffffL
        val (size, payload) =
          if (size32 == 1 && o + 16 <= end)
            ((be32(b, o + 8).toLong << 32) | (be32(b, o + 12).toLong & 0xffffffffL),
              o + 16)
          else (size32, o + 8)
        val boxEnd = if (size == 0) end.toLong else o + size
        val minSize = (payload - o).toLong
        if ((size != 0 && size < minSize) || boxEnd > end || boxEnd < payload)
          return None
        if (fourcc(o + 4) == tpe) return Some((payload, boxEnd.toInt))
        o = boxEnd.toInt
      }
      None
    }
    for {
      (metaP, metaE) <- child(0, b.length, "meta")
      // meta is a FULLBOX: children start after 4 version/flags bytes
      (iprpP, iprpE) <- child(metaP + 4, metaE, "iprp")
      (ipcoP, ipcoE) <- child(iprpP, iprpE, "ipco")
      (ispeP, ispeE) <- child(ipcoP, ipcoE, "ispe")
      if ispeP + 12 <= ispeE
      w = be32(b, ispeP + 4)
      h = be32(b, ispeP + 8)
      if w > 0 && h > 0
    } yield Dims(w, h, fmt)
  }

  /** Try every container in magic-number order. */
  def decodeHeader(b: Array[Byte]): Option[Dims] =
    if (b == null || b.length < 4) None
    else decodePng(b).orElse(decodeBmp(b)).orElse(decodeGif(b))
      .orElse(decodeWebp(b)).orElse(decodeTiff(b)).orElse(decodeAvif(b))
      .orElse(decodeJpeg(b))
}
