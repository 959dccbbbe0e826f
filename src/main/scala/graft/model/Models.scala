package graft.model

import org.apache.spark.sql.types._

/** Domain model for the FIL+ deal-observation pipeline.
  *
  * Mirrors the reference's TypeBox schemas
  * (reference: backend/lib/rpc-service/data-types.js:3-46,
  * db/lib/types.js:12-31) as Scala case classes with explicit
  * `StructType`s — schemas are always declared, never inferred.
  */

/** One key/value entry of a raw actor event.
  * reference: backend/lib/rpc-service/data-types.js:15-20 */
final case class EventEntry(
    Codec: Int,
    Flags: Int,
    Key: String,
    Value: String // base64pad(CBOR)
)

/** A raw built-in-actor event as returned by `Filecoin.GetActorEventsRaw`.
  * reference: backend/lib/rpc-service/data-types.js:22-29 */
final case class RawActorEvent(
    emitter: String,
    height: Int,
    reverted: Boolean,
    entries: Seq[EventEntry]
)

/** A decoded `claim` event.
  * reference: backend/lib/rpc-service/data-types.js:3-13 */
final case class ClaimEvent(
    claimId: Long,
    client: Long,
    provider: Long,
    pieceCid: String,
    pieceSize: Long,
    termMin: Long,
    termMax: Long,
    termStart: Long,
    sector: Long
)

/** A decoded event tagged with its block context.
  * reference: backend/lib/rpc-service/data-types.js:31-40 */
final case class BlockEvent(
    height: Int,
    emitter: String,
    reverted: Boolean,
    event: ClaimEvent
)

/** Payload-retrievability state machine values.
  * reference: db/lib/types.js:3-8 */
object PayloadRetrievabilityState {
  val NotQueried = "PAYLOAD_CID_NOT_QUERIED_YET"
  val Resolved = "PAYLOAD_CID_RESOLVED"
  val Unresolved = "PAYLOAD_CID_UNRESOLVED"
  val TerminallyUnretrievable = "PAYLOAD_CID_TERMINALLY_UNRETRIEVABLE"
  val all: Seq[String] =
    Seq(NotQueried, Resolved, Unresolved, TerminallyUnretrievable)
}

/** One row of the active-deals state table. Identity is the 9-column
  * natural key (no surrogate serial id — see SURVEY §7.4).
  * reference: db/migrations/002.do.active-deals.sql:1-12,
  * db/migrations/008.do.unique-constraint.sql:1-14, db/lib/types.js:12-27 */
final case class ActiveDeal(
    activated_at_epoch: Int,
    miner_id: Int,
    client_id: Int,
    piece_cid: String,
    piece_size: Long,
    term_start_epoch: Int,
    term_min: Int,
    term_max: Int,
    sector_id: Long,
    reverted: Boolean,
    payload_cid: Option[String],
    payload_retrievability_state: String,
    last_payload_retrieval_attempt: Option[java.sql.Timestamp],
    submitted_at: Option[java.sql.Timestamp]
)

object ActiveDeal {
  /** The dedup/natural key, reference: db/migrations/008.do.unique-constraint.sql:1-14 */
  val naturalKey: Seq[String] = Seq(
    "activated_at_epoch", "miner_id", "client_id", "piece_cid", "piece_size",
    "term_start_epoch", "term_min", "term_max", "sector_id")

  val schema: StructType = StructType(Seq(
    StructField("activated_at_epoch", IntegerType, nullable = false),
    StructField("miner_id", IntegerType, nullable = false),
    StructField("client_id", IntegerType, nullable = false),
    StructField("piece_cid", StringType, nullable = false),
    StructField("piece_size", LongType, nullable = false),
    StructField("term_start_epoch", IntegerType, nullable = false),
    StructField("term_min", IntegerType, nullable = false),
    StructField("term_max", IntegerType, nullable = false),
    StructField("sector_id", LongType, nullable = false),
    StructField("reverted", BooleanType, nullable = false),
    StructField("payload_cid", StringType, nullable = true),
    StructField("payload_retrievability_state", StringType, nullable = false),
    StructField("last_payload_retrieval_attempt", TimestampType, nullable = true),
    StructField("submitted_at", TimestampType, nullable = true)
  ))
}

object RawActorEvent {
  /** Ingest schema for the raw-event log (explicit; never inferred).
    * Array-of-struct appears only here, as transport encoding. */
  val schema: StructType = StructType(Seq(
    StructField("emitter", StringType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("reverted", BooleanType, nullable = false),
    StructField("entries", ArrayType(StructType(Seq(
      StructField("Codec", IntegerType, nullable = false),
      StructField("Flags", IntegerType, nullable = false),
      StructField("Key", StringType, nullable = false),
      StructField("Value", StringType, nullable = false)
    ))), nullable = false)
  ))
}

/** minerId → PeerID dimension row (broadcast-joined).
  * reference: backend/test/test_data/minerInfo.js */
final case class MinerPeerId(minerId: String, peerId: String)

/** (peerId, pieceCid) → payloadCid lookup row.
  * reference: backend/test/test_data/payloadCIDs.js */
final case class PayloadCidEntry(peerId: String, pieceCid: String, payloadCid: String)
