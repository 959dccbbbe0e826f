package graft.codec

/** Minimal dag-cbor decoder for builtin-actor event entry values.
  *
  * The reference decodes each entry `Value` (base64pad string) with a full
  * dag-cbor library and then accepts exactly two shapes: numbers and CIDs
  * (reference: backend/lib/rpc-service/utils.js:9-11,37-45). The `$type`
  * discriminator additionally arrives as a CBOR text string ("claim").
  * This decoder supports precisely that subset:
  *
  *   - unsigned ints, major type 0, incl. full 64-bit (0x1b) — piece sizes
  *     reach 2^35 (32 GiB fixtures)
  *   - negative ints, major type 1 (defensive; unused by fixtures)
  *   - text strings, major type 3 (the `$type` value)
  *   - tag 42 + byte string (major 6 / major 2): a CID, rendered to its
  *     canonical base32 multibase string exactly like CID.toString()
  *
  * Pure JVM object — usable from a UDF, a Catalyst Expression, or tests.
  */
object DagCbor {

  sealed trait Value
  final case class IntVal(v: Long) extends Value
  final case class TextVal(v: String) extends Value
  final case class CidVal(v: String) extends Value

  final class CborException(msg: String) extends RuntimeException(msg)

  /** Decode a single CBOR item from `bytes`. Throws CborException on any
    * shape outside the supported subset (mirrors the reference's
    * "Invalid event value" error path, utils.js:39-45). */
  def decode(bytes: Array[Byte]): Value = {
    val (v, consumed) = decodeItem(bytes, 0)
    if (consumed != bytes.length)
      throw new CborException(s"trailing bytes: consumed $consumed of ${bytes.length}")
    v
  }

  /** Decode the base64pad transport encoding then the CBOR payload.
    * reference: backend/lib/rpc-service/utils.js:9-11 */
  def decodeBase64(b64: String): Value =
    decode(java.util.Base64.getDecoder.decode(b64))

  private def decodeItem(b: Array[Byte], off: Int): (Value, Int) = {
    if (off >= b.length) throw new CborException("truncated")
    val ib = b(off) & 0xff
    val major = ib >> 5
    val minor = ib & 0x1f
    major match {
      case 0 => // unsigned int
        val (v, n) = readUint(b, off, minor)
        (IntVal(v), n)
      case 1 => // negative int: -1 - n
        val (v, n) = readUint(b, off, minor)
        (IntVal(-1L - v), n)
      case 3 => // text string
        val (len, afterHdr) = readUint(b, off, minor)
        val s = new String(b, afterHdr, len.toInt, java.nio.charset.StandardCharsets.UTF_8)
        (TextVal(s), afterHdr + len.toInt)
      case 2 => // byte string (only valid directly under tag 42 — handled there)
        throw new CborException("bare byte string unsupported")
      case 6 if minor == 24 && (b(off + 1) & 0xff) == 42 =>
        // tag 42 (CID), 1-byte tag argument
        decodeCid(b, off + 2)
      case 6 =>
        val (tag, n) = readUint(b, off, minor)
        if (tag == 42L) decodeCid(b, n) else throw new CborException(s"unsupported tag $tag")
      case m => throw new CborException(s"unsupported major type $m")
    }
  }

  /** Returns (value, absoluteOffsetAfterHeader). */
  private def readUint(b: Array[Byte], off: Int, minor: Int): (Long, Int) = minor match {
    case m if m < 24 => (m.toLong, off + 1)
    case 24 => ((b(off + 1) & 0xffL), off + 2)
    case 25 => (((b(off + 1) & 0xffL) << 8) | (b(off + 2) & 0xffL), off + 3)
    case 26 =>
      var v = 0L
      var i = 0
      while (i < 4) { v = (v << 8) | (b(off + 1 + i) & 0xffL); i += 1 }
      (v, off + 5)
    case 27 =>
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (b(off + 1 + i) & 0xffL); i += 1 }
      (v, off + 9)
    case m => throw new CborException(s"unsupported additional info $m")
  }

  /** Tag-42 payload: a byte string whose first byte is the 0x00 identity
    * multibase prefix, followed by the raw CID bytes. Rendered as
    * 'b' + lowercase unpadded RFC4648 base32 — the canonical CIDv1 string
    * (what multiformats CID.toString() emits; reference utils.js:37-38). */
  private def decodeCid(b: Array[Byte], off: Int): (Value, Int) = {
    val ib = b(off) & 0xff
    if ((ib >> 5) != 2) throw new CborException("tag 42 payload must be a byte string")
    val (len, afterHdr) = readUint(b, off, ib & 0x1f)
    val start = afterHdr
    if ((b(start) & 0xff) != 0)
      throw new CborException("CID byte string must start with identity multibase prefix 0x00")
    val cidBytes = java.util.Arrays.copyOfRange(b, start + 1, start + len.toInt)
    (CidVal("b" + base32Lower(cidBytes)), start + len.toInt)
  }

  private val B32 = "abcdefghijklmnopqrstuvwxyz234567".toCharArray

  /** RFC 4648 base32, lowercase, no padding. */
  def base32Lower(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder((bytes.length * 8 + 4) / 5)
    var buffer = 0L
    var bits = 0
    var i = 0
    while (i < bytes.length) {
      buffer = (buffer << 8) | (bytes(i) & 0xffL)
      bits += 8
      while (bits >= 5) {
        sb.append(B32(((buffer >> (bits - 5)) & 0x1f).toInt))
        bits -= 5
      }
      i += 1
    }
    if (bits > 0) sb.append(B32(((buffer << (5 - bits)) & 0x1f).toInt))
    sb.toString
  }
}
