package graft.codec

/** The MINIMAL Solidity-ABI surface the miner→peerID smart-contract
  * leg needs (reference backend/lib/resolve-payload-cids.js:125-136 —
  * an `ethers.Contract` around the public index-provider-peer-id
  * contract, whose `getPeerData(uint64)` view returns a
  * `(string peerID, bytes signature)` struct): a keccak-derived
  * function selector, a single static uint64 argument, and the
  * standard dynamic-tuple return layout (ABI spec, docs.soliditylang
  * .org/en/latest/abi-spec.html). Both directions are implemented so
  * the stub-server specs can SERVE what the client decodes — the
  * encode/decode pair is pinned by roundtrip properties plus a
  * hand-laid-out reference vector. */
object EthAbi {

  private val HexChars = "0123456789abcdef".toCharArray

  def hex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    bytes.foreach { b =>
      sb.append(HexChars((b >> 4) & 0xf)); sb.append(HexChars(b & 0xf))
    }
    sb.toString
  }

  def unhex(s: String): Array[Byte] = {
    val t = if (s.startsWith("0x")) s.substring(2) else s
    require(t.length % 2 == 0, s"odd-length hex: ${t.take(32)}")
    val out = new Array[Byte](t.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(t.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  /** First 4 bytes of keccak256 of the canonical signature. */
  def selector(signature: String): Array[Byte] =
    Keccak256.hash(signature).take(4)

  private def word(v: Long): Array[Byte] = {
    require(v >= 0, s"ABI uint must be non-negative: $v")
    val w = new Array[Byte](32)
    var i = 0
    while (i < 8) { w(31 - i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    w
  }

  private def wordAt(data: Array[Byte], off: Int): Long = {
    require(off + 32 <= data.length, s"truncated ABI data at offset $off")
    // reject values beyond Long range (top 24 bytes must be zero for
    // every offset/length this codec reads)
    var i = 0
    while (i < 24) {
      require(data(off + i) == 0, s"ABI word at $off exceeds uint64 range")
      i += 1
    }
    var v = 0L
    i = 24
    while (i < 32) { v = (v << 8) | (data(off + i) & 0xffL); i += 1 }
    v
  }

  private def pad32(b: Array[Byte]): Array[Byte] =
    java.util.Arrays.copyOf(b, ((b.length + 31) / 32) * 32)

  /** Calldata for `<signature>` applied to one uint64: selector plus
    * the 32-byte big-endian argument. */
  def encodeUint64Call(signature: String, v: Long): String =
    "0x" + hex(selector(signature) ++ word(v))

  /** Stub-server side: validate the selector and recover the uint64
    * argument from calldata produced by [[encodeUint64Call]]. */
  def decodeUint64Call(calldata: String, signature: String): Long = {
    val bytes = unhex(calldata)
    require(bytes.length == 36, s"expected 4+32 calldata bytes, got ${bytes.length}")
    val sel = selector(signature)
    require(java.util.Arrays.equals(bytes.take(4), sel),
      s"selector mismatch: got ${hex(bytes.take(4))}, want ${hex(sel)}")
    wordAt(bytes, 4)
  }

  /** Return data of a function whose single return value is the
    * dynamic struct `(string peerID, bytes signature)`: one head word
    * pointing at the tuple, then the tuple's two member offsets, then
    * each member as length word + 32-padded payload. */
  def encodePeerDataReturn(peerId: String, signature: Array[Byte]): String = {
    val pid = peerId.getBytes("UTF-8")
    val strBlock = word(pid.length.toLong) ++ pad32(pid)
    val sigBlock = word(signature.length.toLong) ++ pad32(signature)
    val tuple = word(0x40L) ++ word(0x40L + strBlock.length) ++ strBlock ++ sigBlock
    "0x" + hex(word(0x20L) ++ tuple)
  }

  /** Decode [[encodePeerDataReturn]]'s layout. All offsets are read
    * from the data (never assumed), so a compiler that packs the
    * blocks differently still decodes. */
  def decodePeerDataReturn(returnData: String): (String, Array[Byte]) = {
    val d = unhex(returnData)
    require(d.nonEmpty, "empty eth_call return")
    val tupleOff = wordAt(d, 0).toInt
    val strOff = tupleOff + wordAt(d, tupleOff).toInt
    val sigOff = tupleOff + wordAt(d, tupleOff + 32).toInt
    val strLen = wordAt(d, strOff).toInt
    val sigLen = wordAt(d, sigOff).toInt
    require(strOff + 32 + strLen <= d.length && sigOff + 32 + sigLen <= d.length,
      "truncated ABI dynamic payload")
    val pid = new String(d, strOff + 32, strLen, "UTF-8")
    (pid, java.util.Arrays.copyOfRange(d, sigOff + 32, sigOff + 32 + sigLen))
  }
}
