package graft.sources

import graft.model.RawActorEvent
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka-shaped event ingestion: the adapter between a Kafka topic of
  * NDJSON-encoded actor events and the engine's decode pipeline.
  *
  * The sandbox has no broker and no `spark-sql-kafka` connector jar,
  * so this is deliberately NOT a socket client: Spark's Kafka source
  * already is one, and its output shape is a fixed public contract
  * (`key binary, value binary, topic string, partition int, offset
  * long, timestamp timestamp, timestampType int` — the schema every
  * `format("kafka")` DataFrame has, batch or streaming). Everything
  * engine-specific starts AFTER that contract: [[decode]] turns any
  * DataFrame of that shape into [[graft.model.RawActorEvent]] rows,
  * identical to what the DSv2 [[EpochEventSource]] emits, so the whole
  * downstream pipeline (`EventCodec.decodeBlockEvents` →
  * `toActiveDeals` → `DealIngest`) is source-agnostic. A deployment
  * with a real broker composes:
  *
  * {{{
  *   val kafka = spark.readStream.format("kafka")
  *     .option("kafka.bootstrap.servers", brokers)
  *     .option("subscribe", "actor-events").load()
  *   val events = KafkaEvents.decode(kafka)   // RawActorEvent rows
  * }}}
  *
  * and keeps exactly-once semantics from the Kafka source's offset
  * checkpointing plus the ingest loop's natural-key dedup (ST5) — the
  * same replay contract the DSv2 source's epoch offsets provide.
  *
  * Finality gating (ST3) is an EPOCH property, not an offset property:
  * a Kafka deployment either publishes only final epochs (the
  * producer tails `chainHead - finalityEpochs`, the reference's own
  * polling rule, backend/lib/deal-observer.js:16-23) or gates in the
  * stream with [[finalityGate]] against a chain-head lookup. The
  * trade-offs live in ARCHITECTURE.md §"Kafka integration".
  *
  * Scale: `from_json` is a codegen'd expression evaluated map-side in
  * the Kafka scan's own partitions (one Spark partition per Kafka
  * topic-partition slice) — no shuffle, no driver involvement, and
  * malformed values dead-letter row-wise exactly like
  * [[EventJson.parseNode]] (drop, never a task failure).
  */
object KafkaEvents {

  /** The Kafka source's fixed output schema (public contract of
    * `format("kafka")`). Specs build [[decode]] inputs against this
    * shape with MemoryStream/LocalRelation — byte-compatible with what
    * a real broker-backed source produces. */
  val kafkaSourceSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** True when every field [[EventJson.parseNode]] dereferences is
    * present — the column twin of its null checks, incl. per-entry
    * fields (a JSON entry missing `Key` would NPE the JVM parser; here
    * it dead-letters the row). */
  private def wellFormed(e: Column): Column =
    e.isNotNull && e.getField("emitter").isNotNull &&
      e.getField("height").isNotNull && e.getField("reverted").isNotNull &&
      e.getField("entries").isNotNull &&
      forall(e.getField("entries"), x =>
        x.getField("Codec").isNotNull && x.getField("Flags").isNotNull &&
          x.getField("Key").isNotNull && x.getField("Value").isNotNull)

  /** Kafka-schema DataFrame (batch or streaming) → [[RawActorEvent]]
    * rows. Values are the same NDJSON objects [[FileTransport]] reads
    * (`{"emitter":…,"height":…,"reverted":…,"entries":[{"Codec":…,
    * "Flags":…,"Key":…,"Value":…}]}`); unparseable or field-incomplete
    * values are dropped (dead-letter contract). */
  def decode(kafka: DataFrame): DataFrame = {
    val parsed = kafka
      .select(from_json(col("value").cast("string"), RawActorEvent.schema).as("e"))
      .filter(wellFormed(col("e")))
    parsed.select(col("e.emitter").as("emitter"), col("e.height").as("height"),
      col("e.reverted").as("reverted"), col("e.entries").as("entries"))
  }

  /** Optional stream-side finality gate: keep events at least
    * `finalityEpochs` below the supplied chain head. The DSv2 source
    * does this at the SOURCE (ranges never read past the gate); on
    * Kafka the range is the producer's to bound, so this is a plain
    * codegen'd filter for deployments whose producer publishes
    * optimistically. */
  def finalityGate(events: DataFrame, chainHead: Int, finalityEpochs: Int): DataFrame =
    events.filter(col("height") <= lit(chainHead - finalityEpochs))
}
