package graft.codec

/** Keccak-256 (the ORIGINAL Keccak padding 0x01, as Ethereum uses for
  * function selectors and event topics — NOT FIPS-202 SHA3-256's 0x06).
  * Needed by the live miner→peerID smart-contract leg
  * ([[graft.sources.MinerPeerIdClient]]): an `eth_call`'s calldata
  * starts with the first 4 bytes of keccak256 of the function
  * signature, and no JVM-standard provider ships legacy Keccak.
  *
  * Public algorithm (Bertoni, Daemen, Peeters, Van Assche — the Keccak
  * reference, keccak.team): Keccak-f[1600] with rate 1088 / capacity
  * 512, little-endian lanes. Pinned in EthAbiSpec against the
  * published test vectors (empty string, "abc") and the universally
  * known ERC-20 `transfer(address,uint256)` selector `a9059cbb`. */
object Keccak256 {

  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL,
    0x8000000080008000L, 0x000000000000808bL, 0x0000000080000001L,
    0x8000000080008081L, 0x8000000000008009L, 0x000000000000008aL,
    0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L,
    0x8000000000008003L, 0x8000000000008002L, 0x8000000000000080L,
    0x000000000000800aL, 0x800000008000000aL, 0x8000000080008081L,
    0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  /** rotation offsets r[x][y] of the rho step */
  private val ROT: Array[Array[Int]] = Array(
    Array(0, 36, 3, 41, 18),
    Array(1, 44, 10, 45, 2),
    Array(62, 6, 43, 15, 61),
    Array(28, 55, 25, 21, 56),
    Array(27, 20, 39, 8, 14))

  private val Rate = 136 // 1088-bit rate → 256-bit capacity-512 digest

  private def keccakF(a: Array[Long]): Unit = {
    val c = new Array[Long](5)
    val d = new Array[Long](5)
    val b = new Array[Long](25)
    var round = 0
    while (round < 24) {
      // theta
      var x = 0
      while (x < 5) {
        c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20)
        x += 1
      }
      x = 0
      while (x < 5) {
        d(x) = c((x + 4) % 5) ^ java.lang.Long.rotateLeft(c((x + 1) % 5), 1)
        var y = 0
        while (y < 5) { a(x + 5 * y) ^= d(x); y += 1 }
        x += 1
      }
      // rho + pi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          b(y + 5 * ((2 * x + 3 * y) % 5)) =
            java.lang.Long.rotateLeft(a(x + 5 * y), ROT(x)(y))
          y += 1
        }
        x += 1
      }
      // chi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          a(x + 5 * y) =
            b(x + 5 * y) ^ (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          y += 1
        }
        x += 1
      }
      // iota
      a(0) ^= RC(round)
      round += 1
    }
  }

  def hash(input: Array[Byte]): Array[Byte] = {
    val state = new Array[Long](25)
    // multi-rate padding, original Keccak domain byte 0x01: append
    // 0x01, zero-fill, final byte |= 0x80 (0x81 when one byte remains)
    val padLen = Rate - (input.length % Rate)
    val padded = java.util.Arrays.copyOf(input, input.length + padLen)
    padded(input.length) = 0x01.toByte
    padded(padded.length - 1) = (padded(padded.length - 1) | 0x80).toByte
    // absorb, little-endian lanes
    var off = 0
    while (off < padded.length) {
      var i = 0
      while (i < Rate / 8) {
        var lane = 0L
        var j = 7
        while (j >= 0) {
          lane = (lane << 8) | (padded(off + i * 8 + j) & 0xffL)
          j -= 1
        }
        state(i) ^= lane
        i += 1
      }
      keccakF(state)
      off += Rate
    }
    // squeeze 32 bytes
    val out = new Array[Byte](32)
    var i = 0
    while (i < 4) {
      var j = 0
      while (j < 8) {
        out(i * 8 + j) = ((state(i) >>> (8 * j)) & 0xff).toByte
        j += 1
      }
      i += 1
    }
    out
  }

  def hash(input: String): Array[Byte] = hash(input.getBytes("UTF-8"))
}
