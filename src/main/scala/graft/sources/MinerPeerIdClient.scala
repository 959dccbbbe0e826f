package graft.sources

import graft.codec.EthAbi

/** The LIVE minerId→peerID lookup chain (S5) — the last reference
  * integration behind [[graft.state.PeerIdDirectory]]'s injected
  * slots, now with real transports like S2/S3 ([[RpcTransport]]) and
  * S4 ([[PieceIndexer]]):
  *
  *   - PRIMARY: a raw JSON-RPC `eth_call` against the public
  *     miner-to-peerID FEVM contract — the reference wraps the same
  *     call in `ethers.Contract` with a bearer token and a 60 s abort
  *     (backend/lib/resolve-payload-cids.js:125-155 via the
  *     index-provider-peer-id package). Calldata = keccak selector of
  *     `getPeerData(uint64)` + the miner's actor number; the return is
  *     the ABI `(string peerID, bytes signature)` struct
  *     ([[EthAbi.decodePeerDataReturn]]). An EMPTY peerID (the
  *     contract's miss encoding — an unset mapping returns the zero
  *     struct) and a transport failure that survives the retry budget
  *     both yield None, handing the miner to the fallback leg exactly
  *     like the reference's try-contract-then-RPC chain.
  *   - FALLBACK: `Filecoin.StateMinerInfo(minerAddr, null)` JSON-RPC,
  *     whose result carries the miner's libp2p `PeerId`. A null/absent
  *     PeerId is a clean miss; a transport failure here PROPAGATES —
  *     there is no third leg, and silently caching "unknown" for a
  *     reachable miner would starve the resolve loop.
  *
  * Both legs run through [[JsonRpc.post]] (retry ×5, random endpoint
  * per attempt, bearer token) and are driver-side by design: the
  * directory refresh touches only the tick's distinct miners
  * (≤ maxDeals), so the lookup volume is queue-bounded, never
  * state-table-bounded. */
object MinerPeerIdClient {

  /** Canonical signature of the contract's lookup view. */
  val GetPeerDataSignature = "getPeerData(uint64)"

  /** "f0<actorId>" → actor number (reference getPeerId builds the
    * f0-string from the numeric minerId the same way,
    * resolve-payload-cids.js:139-147). */
  def minerNumber(f0Miner: String): Long = {
    require(f0Miner.startsWith("f0") && f0Miner.length > 2 &&
      f0Miner.drop(2).forall(_.isDigit), s"not an f0 actor address: $f0Miner")
    f0Miner.drop(2).toLong
  }

  /** The contract leg as a [[graft.state.PeerIdDirectory]] slot. */
  def contractLookup(
      endpoints: Seq[String],
      contractAddress: String,
      authToken: Option[String] = None,
      attempts: Int = 5,
      timeoutMs: Int = 60000,
      sleep: Long => Unit = Thread.sleep): String => Option[String] =
    f0Miner => {
      val calldata = EthAbi.encodeUint64Call(GetPeerDataSignature, minerNumber(f0Miner))
      try {
        val result = JsonRpc.post(endpoints, "eth_call",
          s"""[{"to":"$contractAddress","data":"$calldata"},"latest"]""",
          authToken, attempts, timeoutMs, sleep)
        val hexOut = result.asText()
        if (hexOut == null || hexOut.isEmpty || hexOut == "0x") None
        else {
          val (peerId, _) = EthAbi.decodePeerDataReturn(hexOut)
          if (peerId.isEmpty) None else Some(peerId)
        }
      } catch {
        // the primary leg absorbs persistent failures into a miss so
        // the RPC fallback still runs — the reference's chain likewise
        // falls through on a contract error
        case scala.util.control.NonFatal(_) => None
      }
    }

  /** The `Filecoin.StateMinerInfo` leg as a directory slot. */
  def stateMinerInfoLookup(
      endpoints: Seq[String],
      authToken: Option[String] = None,
      attempts: Int = 5,
      timeoutMs: Int = 60000,
      sleep: Long => Unit = Thread.sleep): String => Option[String] =
    f0Miner => {
      // same digits-only guard as the contract leg: the address is
      // interpolated into the outbound JSON-RPC body, so a non-numeric
      // suffix must die here, not inject into the request
      minerNumber(f0Miner)
      val result = JsonRpc.post(endpoints, "Filecoin.StateMinerInfo",
        s"""["$f0Miner",null]""", authToken, attempts, timeoutMs, sleep)
      val pid = result.get("PeerId")
      if (pid == null || pid.isNull) None else Some(pid.asText())
    }

  /** A fully-live [[graft.state.PeerIdDirectory]]: contract primary,
    * StateMinerInfo fallback, reference cache bounds (LRU 10k / 1 h). */
  def directory(
      endpoints: Seq[String],
      contractAddress: String,
      authToken: Option[String] = None,
      attempts: Int = 5,
      timeoutMs: Int = 60000,
      sleep: Long => Unit = Thread.sleep): graft.state.PeerIdDirectory =
    new graft.state.PeerIdDirectory(
      contractLookup(endpoints, contractAddress, authToken, attempts, timeoutMs, sleep),
      stateMinerInfoLookup(endpoints, authToken, attempts, timeoutMs, sleep))
}
