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

  /** Try every container in magic-number order. */
  def decodeHeader(b: Array[Byte]): Option[Dims] =
    if (b == null || b.length < 4) None
    else decodePng(b).orElse(decodeBmp(b)).orElse(decodeGif(b)).orElse(decodeJpeg(b))
}
