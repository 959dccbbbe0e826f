package graft.state

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-side TTL'd minerId→peerId directory — the Spark restatement of
  * the reference's LRU peerId cache (max 10 000 entries, 1 h TTL;
  * reference resolve-payload-cids.js:158-181) in front of the
  * contract→`StateMinerInfo` fallback chain
  * (resolve-payload-cids.js:125-155, via the index-provider-peer-id
  * package: try the miner-to-peerID smart contract first, fall back to
  * the `Filecoin.StateMinerInfo` JSON-RPC call).
  *
  * Spark shape: the directory is a tiny driver-side map (bounded by the
  * LRU cap) snapshotted per resolve tick into a broadcastable dimension
  * DataFrame. The per-tick refresh touches only the DISTINCT miners of
  * the current work queue (≤ maxDeals rows) — never the state table —
  * so lookups stay O(queue), exactly like the reference's per-deal loop
  * but batched. Lookup functions are injected (DI, like the reference's
  * `getIndexProviderPeerId` parameter) so tests and batch replays run
  * hermetically.
  */
final class PeerIdDirectory(
    contractLookup: String => Option[String],
    stateMinerInfoLookup: String => Option[String],
    ttlMillis: Long = 60L * 60 * 1000, // reference: 1 h TTL
    maxEntries: Int = 10000) { // reference: LRU max

  final case class Entry(peerId: String, source: String, fetchedAtMs: Long)

  /** insertion-ordered for LRU eviction of the oldest fetch */
  private val cache = new java.util.LinkedHashMap[String, Entry]()

  /** Resolve one miner through the fallback chain, cache-first.
    * Returns (peerId, source) like the reference's `{ peerId, source }`. */
  def lookup(f0Miner: String, nowMs: Long): Option[(String, String)] = synchronized {
    val hit = cache.get(f0Miner)
    if (hit != null && nowMs - hit.fetchedAtMs < ttlMillis)
      return Some((hit.peerId, hit.source))
    val fetched = contractLookup(f0Miner).map((_, "smartContract"))
      .orElse(stateMinerInfoLookup(f0Miner).map((_, "stateMinerInfo")))
    fetched match {
      case Some((pid, src)) =>
        cache.remove(f0Miner)
        cache.put(f0Miner, Entry(pid, src, nowMs))
        // LRU bound: evict the oldest insertions beyond the cap
        val it = cache.entrySet().iterator()
        while (cache.size() > maxEntries && it.hasNext) { it.next(); it.remove() }
      case None =>
        // failed refresh of an expired entry must not leave the stale
        // peerId servable — the reference's TTL'd LRU would miss here
        if (hit != null) cache.remove(f0Miner)
    }
    fetched
  }

  /** Per-batch refresh hook: warm the cache for every miner in `miners`
    * (expired and missing entries go through the fallback chain), then
    * return the directory as a broadcastable dimension
    * `(minerId, peerId, peer_source)` for the resolve tick's join. */
  def refreshed(spark: SparkSession, miners: Seq[String], nowMs: Long): DataFrame = {
    miners.distinct.foreach(lookup(_, nowMs))
    snapshot(spark, nowMs)
  }

  /** Current directory as a dimension DataFrame (no lookups). Entries
    * past their TTL are withheld — an expired peerId must never reach
    * the resolve tick's join, matching the reference LRU's TTL miss. */
  def snapshot(spark: SparkSession, nowMs: Long): DataFrame = synchronized {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    cache.entrySet().iterator().asScala
      .filter(e => nowMs - e.getValue.fetchedAtMs < ttlMillis)
      .map(e => (e.getKey, e.getValue.peerId, e.getValue.source))
      .toSeq.toDF("minerId", "peerId", "peer_source")
  }

  def size: Int = synchronized(cache.size())
}
