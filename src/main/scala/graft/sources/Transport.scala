package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.model.{EventEntry, RawActorEvent}
import org.apache.hadoop.fs.Path
import org.apache.spark.util.SerializableConfiguration

/** The transport slot behind [[EpochEventSource]] (S3): where the bytes
  * of the actor-event log actually come from.
  *
  * Two implementations, selected by the source's `transport` option:
  *
  *   - `file` — NDJSON event-log files (test/backfill path).
  *   - `rpc`  — live Filecoin JSON-RPC: `Filecoin.ChainHead` for the
  *     high-watermark and `Filecoin.GetActorEventsRaw` for the events,
  *     with the `$type = claim` filter applied SERVER-side via the
  *     cbor/base64 field filter, bounded retries with exponential
  *     backoff, and a random endpoint pick per request.
  *     (reference: backend/lib/rpc-service/service.js:19-116,
  *     backend/lib/config.js:7-21)
  *
  * A [[TransportConfig]] is the serializable recipe shipped inside each
  * input partition; the transport itself (HTTP client, open streams) is
  * constructed on the executor.
  */
trait EventTransport {
  /** Current chain-head height (the source's high-watermark). */
  def chainHead(): Int

  /** All claim events with height in [fromEpoch, toEpoch]. The caller
    * MUST close the cursor (also on early termination) — it may hold an
    * open stream. */
  def actorEvents(fromEpoch: Int, toEpoch: Int): EventCursor
}

/** Iterator over events plus the resource it holds open. */
final class EventCursor(underlying: Iterator[RawActorEvent], onClose: () => Unit)
    extends Iterator[RawActorEvent] with AutoCloseable {
  override def hasNext: Boolean = underlying.hasNext
  override def next(): RawActorEvent = underlying.next()
  override def close(): Unit = onClose()
}

/** Serializable recipe for building an [[EventTransport]] on executors. */
sealed trait TransportConfig extends Serializable {
  def create(): EventTransport
}

final case class FileTransportConfig(
    path: String, headFile: String, conf: SerializableConfiguration)
    extends TransportConfig {
  override def create(): EventTransport = new FileTransport(this)
}

final case class RpcTransportConfig(
    endpoints: Seq[String],
    authToken: Option[String] = None,
    eventType: String = "claim",
    attempts: Int = 5,
    requestTimeoutMs: Int = 60000)
    extends TransportConfig {
  require(endpoints.nonEmpty, "rpc transport needs at least one endpoint")
  override def create(): EventTransport = new RpcTransport(this)
}

/** Shared NDJSON/JSON-node → [[RawActorEvent]] parsing with dead-letter
  * semantics: malformed input yields None, never a task failure. */
object EventJson {
  def parseNode(node: JsonNode): Option[RawActorEvent] = {
    val hNode = node.get("height")
    if (hNode == null || node.get("entries") == null) None
    else {
      val entries = Vector.newBuilder[EventEntry]
      val it = node.get("entries").elements()
      while (it.hasNext) {
        val e = it.next()
        entries += EventEntry(e.get("Codec").asInt, e.get("Flags").asInt,
          e.get("Key").asText, e.get("Value").asText)
      }
      Some(RawActorEvent(node.get("emitter").asText, hNode.asInt,
        node.get("reverted").asBoolean, entries.result()))
    }
  }
}

/** NDJSON file transport. Files named `epochs-<lo>-<hi>.json` are
  * range-pruned without being opened; others are scanned and
  * row-filtered. Tracks the currently open reader so `close()` releases
  * it even when a task terminates early (failure, kill, limit). */
final class FileTransport(cfg: FileTransportConfig) extends EventTransport {
  private val mapper = new ObjectMapper()

  override def chainHead(): Int = Retry.withRetries() {
    val p = new Path(cfg.headFile)
    val fs = p.getFileSystem(cfg.conf.value)
    val in = fs.open(p)
    try mapper.readTree(in).get("Height").asInt
    finally in.close()
  }

  override def actorEvents(fromEpoch: Int, toEpoch: Int): EventCursor = {
    val dir = new Path(cfg.path)
    val fs = dir.getFileSystem(cfg.conf.value)
    val namePat = "epochs-(\\d+)-(\\d+)\\.json".r
    val files = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".json"))
      .filter { f =>
        f.getName match {
          case namePat(lo, hi) => lo.toInt <= toEpoch && hi.toInt >= fromEpoch
          case _ => true
        }
      }

    // the reader currently open, if any — closed by cursor.close() on
    // early termination, or at EOF of each file during normal advance
    var open: java.io.BufferedReader = null
    val rows = files.iterator.flatMap { f =>
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(f), "UTF-8"))
      open = in
      Iterator.continually(in.readLine()).takeWhile { l =>
        if (l == null) { in.close(); open = null }
        l != null
      }.flatMap { line =>
        // dead-letter malformed lines / foreign files instead of
        // failing the partition (one bad record must not poison a
        // backfill)
        try {
          EventJson.parseNode(mapper.readTree(line))
            .filter(ev => ev.height >= fromEpoch && ev.height <= toEpoch)
        } catch {
          case _: com.fasterxml.jackson.core.JacksonException => None
        }
      }
    }
    new EventCursor(rows, () => if (open != null) { open.close(); open = null })
  }
}

/** Live Filecoin JSON-RPC transport.
  *
  * Wire protocol (reference: backend/lib/rpc-service/service.js:19-116):
  *   - request body `{"method":M,"params":P,"id":1,"jsonrpc":"2.0"}`
  *     POSTed as `application/json`;
  *   - `Filecoin.ChainHead` with `[]` params → `result.Height`;
  *   - `Filecoin.GetActorEventsRaw` with a single filter param
  *     `{fromHeight, toHeight, fields: {"$type": [{"Codec": 81,
  *     "Value": base64pad(cbor(eventType))}]}}` — Codec 81 (CBOR)
  *     selects builtin-actor events only; the filter runs node-side so
  *     non-claim events never cross the wire;
  *   - non-2xx or malformed responses retry up to `attempts` times with
  *     exponential backoff; each attempt picks a RANDOM endpoint, so a
  *     sick node is skipped with probability (n-1)/n per retry
  *     (reference picks a random RPC_URL from RPC_URLS at startup;
  *     per-request re-pick strictly dominates for availability);
  *   - optional bearer token (the reference's GLIF_TOKEN, config.js:13-16).
  */
final class RpcTransport(cfg: RpcTransportConfig) extends EventTransport {
  private val mapper = new ObjectMapper()
  private lazy val http = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(cfg.requestTimeoutMs.toLong))
    .build()
  private val rnd = new java.util.Random()

  /** base64pad(cbor(text)) for the `$type` field filter. CBOR text
    * strings < 24 bytes are one header byte 0x60|len, then UTF-8. */
  private[sources] def cborB64(s: String): String = {
    val utf8 = s.getBytes("UTF-8")
    require(utf8.length < 24, "field-filter strings are short")
    val bytes = (0x60 | utf8.length).toByte +: utf8
    java.util.Base64.getEncoder.encodeToString(bytes)
  }

  private def rpcRequest(method: String, params: String): JsonNode =
    JsonRpc.post(cfg.endpoints, method, params, cfg.authToken,
      attempts = cfg.attempts, timeoutMs = cfg.requestTimeoutMs,
      http = http, rnd = rnd)

  override def chainHead(): Int =
    rpcRequest("Filecoin.ChainHead", "[]").get("Height").asInt

  override def actorEvents(fromEpoch: Int, toEpoch: Int): EventCursor = {
    val filter =
      s"""[{"fromHeight":$fromEpoch,"toHeight":$toEpoch,"fields":{"$$type":[{"Codec":81,"Value":"${cborB64(cfg.eventType)}"}]}}]"""
    val result = rpcRequest("Filecoin.GetActorEventsRaw", filter)
    val events = Iterator.from(0).takeWhile(i => result.has(i)).flatMap { i =>
      // belt-and-braces: re-check the range client-side; a node bug
      // must not leak out-of-window (possibly un-finalized) events
      EventJson.parseNode(result.get(i))
        .filter(ev => ev.height >= fromEpoch && ev.height <= toEpoch)
    }
    new EventCursor(events, () => ())
  }
}
