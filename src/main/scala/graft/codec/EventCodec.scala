package graft.codec

import graft.model._
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Decode raw actor events into typed claim events and project them to
  * active-deal rows.
  *
  * The reference pipeline is: base64 → dag-cbor per entry value
  * (backend/lib/rpc-service/utils.js:9-11), fold the entry list into one
  * object with camelCase keys + `$type` discriminator (utils.js:19-53),
  * validate as ClaimEvent and wrap with block context
  * (rpc-service/service.js:59-85), then project to an ActiveDeal
  * (backend/lib/utils.js:11-27).
  *
  * Spark restatement: one narrow map stage — the native [[ClaimPivot]]
  * expression pivots the entries array straight to a ClaimEvent struct
  * (no explode, no shuffle, no catalyst→Scala conversion), followed by
  * a declarative projection Catalyst can prune.
  * Rows whose `$type` is not "claim" or whose values don't decode are
  * dead-lettered (null struct + filter) instead of throwing, so one bad
  * event can't poison a 100 TB backfill.
  */
object EventCodec {

  /** kebab-case → camelCase (reference utils.js:27). The key set is fixed,
    * so this is a lookup table, not a runtime regex. */
  private val keyRename: Map[String, String] = Map(
    "$type" -> "$type",
    "id" -> "id",
    "client" -> "client",
    "provider" -> "provider",
    "piece-cid" -> "pieceCid",
    "piece-size" -> "pieceSize",
    "term-min" -> "termMin",
    "term-max" -> "termMax",
    "term-start" -> "termStart",
    "sector" -> "sector"
  )

  /** Pure pivot of one event's entries. Returns Right((eventType, fields))
    * with decoded values, or Left(reason) for undecodable input.
    * reference: backend/lib/rpc-service/utils.js:19-53 */
  def pivotEntries(entries: Seq[(String, String)]): Either[String, (String, Map[String, DagCbor.Value])] = {
    try {
      var typ: String = null
      val fields = Map.newBuilder[String, DagCbor.Value]
      entries.foreach { case (key, b64) =>
        val v = DagCbor.decodeBase64(b64)
        if (key == "$type") v match {
          case DagCbor.TextVal(t) => typ = t
          case _ => return Left("$type is not a text string")
        } else {
          val name = keyRename.getOrElse(key, key)
          v match {
            case DagCbor.IntVal(_) | DagCbor.CidVal(_) => fields += name -> v
            case _ => return Left(s"invalid event value for key $key")
          }
        }
      }
      if (typ == null) Left("event has no $type") else Right((typ, fields.result()))
    } catch {
      case e: Exception => Left(s"decode failure: ${e.getMessage}")
    }
  }

  /** Pivot + validate one event's entries to a ClaimEvent. The `id` field
    * is renamed claimId (reference service.js:66-70). Non-claim types and
    * invalid shapes → None (dead-letter policy). */
  def toClaimEvent(entries: Seq[(String, String)]): Option[ClaimEvent] =
    pivotEntries(entries) match {
      case Right(("claim", f)) =>
        def num(k: String): Option[Long] = f.get(k).collect { case DagCbor.IntVal(v) => v }
        def cid(k: String): Option[String] = f.get(k).collect { case DagCbor.CidVal(v) => v }
        for {
          claimId <- num("id")
          client <- num("client")
          provider <- num("provider")
          pieceCid <- cid("pieceCid")
          pieceSize <- num("pieceSize")
          termMin <- num("termMin")
          termMax <- num("termMax")
          termStart <- num("termStart")
          sector <- num("sector")
        } yield ClaimEvent(claimId, client, provider, pieceCid, pieceSize,
          termMin, termMax, termStart, sector)
      case _ => None
    }

  /** UDF: array<struct<Codec,Flags,Key,Value>> → ClaimEvent struct (null
    * when not a valid claim event). Kept as the readable reference
    * formulation and for the property spec's equivalence check; the
    * pipeline runs the native expression below. */
  private[graft] val decodeClaimUdf = udf { (entries: Seq[Row]) =>
    if (entries == null) None
    else toClaimEvent(entries.map(r => (r.getAs[String]("Key"), r.getAs[String]("Value"))))
  }

  /** Column expression: decoded claim event struct for a raw event row.
    * Native Catalyst expression ([[ClaimPivot]]) — no catalyst→Scala Row
    * conversion, stays inside whole-stage codegen on the ingest map. */
  def claimEvent(entries: Column): Column = ClaimPivot.decodeClaimEvent(entries)

  /** Raw events (RawActorEvent schema) → decoded block events.
    * Output: height, emitter, reverted, event(struct of ClaimEvent). */
  def decodeBlockEvents(raw: DataFrame): DataFrame =
    raw
      .withColumn("event", claimEvent(col("entries")))
      .filter(col("event").isNotNull)
      .select(col("height"), col("emitter"), col("reverted"), col("event"))

  /** Block events → new active-deal rows (T4 projection,
    * reference backend/lib/utils.js:11-27). */
  def toActiveDeals(blockEvents: DataFrame): DataFrame =
    blockEvents.select(
      col("height").cast("int").as("activated_at_epoch"),
      col("event.provider").cast("int").as("miner_id"),
      col("event.client").cast("int").as("client_id"),
      col("event.pieceCid").as("piece_cid"),
      col("event.pieceSize").as("piece_size"),
      col("event.termStart").cast("int").as("term_start_epoch"),
      col("event.termMin").cast("int").as("term_min"),
      col("event.termMax").cast("int").as("term_max"),
      col("event.sector").as("sector_id"),
      col("reverted"),
      lit(null).cast("string").as("payload_cid"),
      lit(PayloadRetrievabilityState.NotQueried).as("payload_retrievability_state"),
      lit(null).cast("timestamp").as("last_payload_retrieval_attempt"),
      lit(null).cast("timestamp").as("submitted_at")
    )
}
