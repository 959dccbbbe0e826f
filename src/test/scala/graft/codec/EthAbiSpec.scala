package graft.codec

import org.scalatest.funsuite.AnyFunSuite

/** Keccak-256 against the published test vectors, and the minimal ABI
  * codec via a hand-laid-out reference vector plus seeded roundtrip
  * properties — the byte-level floor under the live contract leg. */
class EthAbiSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("keccak256 published vectors (original 0x01 padding, not SHA3)") {
    assert(EthAbi.hex(Keccak256.hash("")) ==
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(EthAbi.hex(Keccak256.hash("abc")) ==
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    // multi-block absorb: > 136-byte input crosses the rate boundary
    assert(EthAbi.hex(Keccak256.hash("a" * 200)) ==
      EthAbi.hex(Keccak256.hash(("a" * 200).getBytes("UTF-8"))))
    assert(Keccak256.hash("a" * 135).length == 32) // 1-byte-pad edge (0x81)
  }

  test("the universally-known ERC-20 selector pins the selector path") {
    assert(EthAbi.hex(EthAbi.selector("transfer(address,uint256)")) == "a9059cbb")
  }

  test("uint64 calldata: reference layout, decode validates the selector") {
    val data = EthAbi.encodeUint64Call("getPeerData(uint64)", 1531188L)
    // 4-byte selector + 32-byte big-endian argument
    assert(data.length == 2 + 8 + 64)
    assert(data.endsWith(f"${1531188L}%064x"))
    assert(EthAbi.decodeUint64Call(data, "getPeerData(uint64)") == 1531188L)
    intercept[IllegalArgumentException] {
      EthAbi.decodeUint64Call(data, "someOtherFn(uint64)")
    }
  }

  test("PeerData return: hand-laid-out vector decodes") {
    // struct (string "ab", bytes [0x01]): head offset 0x20; tuple =
    // two member offsets (0x40, 0x80), then len+payload blocks
    val manual = "0x" +
      "0000000000000000000000000000000000000000000000000000000000000020" +
      "0000000000000000000000000000000000000000000000000000000000000040" +
      "0000000000000000000000000000000000000000000000000000000000000080" +
      "0000000000000000000000000000000000000000000000000000000000000002" +
      "6162000000000000000000000000000000000000000000000000000000000000" +
      "0000000000000000000000000000000000000000000000000000000000000001" +
      "0100000000000000000000000000000000000000000000000000000000000000"
    val (pid, sig) = EthAbi.decodePeerDataReturn(manual)
    assert(pid == "ab" && sig.toSeq == Seq(1.toByte))
    assert(EthAbi.encodePeerDataReturn("ab", Array(1.toByte)) == manual)
  }

  test("PeerData return roundtrips for arbitrary peerIds and signatures") {
    (0 until 200).foreach { _ =>
      val pid = rnd.alphanumeric.take(rnd.nextInt(90)).mkString
      val sig = Array.fill(rnd.nextInt(96))(rnd.nextInt().toByte)
      val (p2, s2) = EthAbi.decodePeerDataReturn(EthAbi.encodePeerDataReturn(pid, sig))
      assert(p2 == pid && s2.toSeq == sig.toSeq)
    }
  }

  test("hex/unhex roundtrip and 0x tolerance") {
    (0 until 200).foreach { _ =>
      val arr = Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
      assert(EthAbi.unhex(EthAbi.hex(arr)).toSeq == arr.toSeq)
      assert(EthAbi.unhex("0x" + EthAbi.hex(arr)).toSeq == arr.toSeq)
    }
  }

  test("malformed return data fails loudly, never garbage-decodes") {
    intercept[IllegalArgumentException] { EthAbi.decodePeerDataReturn("0x") }
    // truncated payload: tuple promises a longer string than the data
    val good = EthAbi.encodePeerDataReturn("12D3KooWExample", Array[Byte](1, 2))
    intercept[IllegalArgumentException] {
      EthAbi.decodePeerDataReturn(good.dropRight(80))
    }
  }
}
