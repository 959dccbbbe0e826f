package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Filecoin epoch ↔ timestamp conversions as pure column algebra.
  *
  * The Filecoin epoch is the pipeline's universal clock: 30-second blocks
  * since genesis 1598306400 (reference: backend/lib/epoch.js:2-11). The
  * reference implements these twice — as JS helpers (epoch.js:9-21) and as
  * PL/pgSQL UDFs (db/migrations/005.do.epoch-to-timestamp.sql:1-9,
  * 006.do.timestamp-to-epoch.sql:1-16). Here they are plain Catalyst
  * expressions — codegen'd, push-down friendly, no UDF.
  */
object EpochFunctions {

  val GenesisUnixSeconds: Long = 1598306400L
  val BlockDelaySeconds: Long = 30L

  /** epoch → timestamp: `to_timestamp(e * 30 + genesis)`.
    * reference: db/migrations/005.do.epoch-to-timestamp.sql:4-7 */
  def epochToTimestamp(epoch: Column): Column =
    timestamp_seconds(epoch.cast("long") * BlockDelaySeconds + GenesisUnixSeconds)

  /** timestamp → epoch: `floor((unix(ts) − genesis) / 30)`.
    * `floor`, not integer division — pre-genesis timestamps must round
    * toward −∞ exactly like PL/pgSQL FLOOR / JS Math.floor
    * (reference: db/migrations/006.do.timestamp-to-epoch.sql:9-13,
    * backend/lib/epoch.js:9-11). */
  def timestampToEpoch(ts: Column): Column =
    floor((unix_timestamp(ts) - GenesisUnixSeconds).cast("double") / BlockDelaySeconds)
      .cast("int")

  /** Scalar twins (reference backend/lib/epoch.js:9-21) for driver-side
    * offset math — no Spark needed. */
  def unixToEpoch(unixSeconds: Long): Long =
    Math.floorDiv(unixSeconds - GenesisUnixSeconds, BlockDelaySeconds)

  def epochToUnix(epoch: Long): Long =
    epoch * BlockDelaySeconds + GenesisUnixSeconds

  /** Register both as SQL functions so the surface is reachable from
    * `spark.sql` too. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("epoch_to_timestamp",
      (e: Long) => new java.sql.Timestamp(epochToUnix(e) * 1000L))
    spark.udf.register("timestamp_to_epoch",
      (ts: java.sql.Timestamp) =>
        Math.floorDiv(ts.getTime / 1000L - GenesisUnixSeconds, BlockDelaySeconds).toInt)
  }
}
