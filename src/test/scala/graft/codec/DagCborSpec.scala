package graft.codec

import org.scalatest.funsuite.AnyFunSuite

class DagCborSpec extends AnyFunSuite {
  import DagCbor._

  test("decodes the $type discriminator (text string)") {
    assert(decodeBase64("ZWNsYWlt") == TextVal("claim"))
  }

  test("decodes small uints (single-byte and 1/2/4-byte args)") {
    assert(decode(Array(0x05.toByte)) == IntVal(5))
    assert(decode(Array(0x18, 0xff).map(_.toByte)) == IntVal(255))
    assert(decode(Array(0x19, 0x01, 0x00).map(_.toByte)) == IntVal(256))
    // fixture claimId: GgU9Azg= → 0x1a 0x053d0338
    assert(decodeBase64("GgU9Azg=") == IntVal(0x053d0338L))
  }

  test("decodes 64-bit uints (32 GiB piece size, fixture exemplar)") {
    // GwAAAAgAAAAA = 0x1b 0x0000000800000000 = 34359738368
    assert(decodeBase64("GwAAAAgAAAAA") == IntVal(34359738368L))
  }

  test("decodes negative ints") {
    assert(decode(Array(0x20.toByte)) == IntVal(-1))
    assert(decode(Array(0x38, 0x63).map(_.toByte)) == IntVal(-100))
  }

  test("decodes a tag-42 CID to its canonical base32 string") {
    // fixture piece-cid entry (claimEvent.js exemplar row)
    val got = decodeBase64("2CpYKAABgeIDkiAgR4YG+O8RvPGtJY29gurIsQs2sjrcDHTDje72xmhxxCY=")
    got match {
      case CidVal(s) =>
        assert(s.startsWith("baga6ea4seaq"), s) // fil-commitment-unsealed CIDv1
        assert(s.length == 64, s)
      case other => fail(s"expected CidVal, got $other")
    }
  }

  test("rejects garbage") {
    intercept[CborException](decode(Array[Byte]()))
    intercept[CborException](decode(Array(0x05.toByte, 0x05.toByte))) // trailing
    intercept[CborException](decode(Array(0xa1.toByte))) // map: unsupported
  }

  test("property: uint round-trip at every width boundary") {
    val cases = Seq(0L, 23L, 24L, 255L, 256L, 65535L, 65536L,
      4294967295L, 4294967296L, Long.MaxValue)
    for (v <- cases) {
      val enc = encodeUint(v)
      assert(decode(enc) == IntVal(v), s"v=$v")
    }
  }

  test("property: random uints round-trip (seeded)") {
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val n = rnd.nextLong() & Long.MaxValue
      assert(decode(encodeUint(n)) == IntVal(n))
    }
  }

  /** Test-local CBOR uint encoder (canonical shortest form). */
  private def encodeUint(v: Long): Array[Byte] = {
    if (v < 24) Array(v.toByte)
    else if (v < 256) Array(0x18.toByte, v.toByte)
    else if (v < 65536) Array(0x19.toByte, (v >> 8).toByte, v.toByte)
    else if (v <= 0xffffffffL) Array(0x1a.toByte,
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    else Array(0x1b.toByte, (v >> 56).toByte, (v >> 48).toByte, (v >> 40).toByte,
      (v >> 32).toByte, (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  }
}
