package graft.queries

import graft.codec.EventCodec
import graft.ingest.DealIngest
import graft.model.{ActiveDeal, RawActorEvent}
import graft.state.{ResolvePayloadCids, SubmitDeals}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The deal-observation pipeline itself as driver-checkable queries.
  * These run over the golden fixture (the reference's captured mainnet
  * events), not the sfDir tables. The Spark side computes decode →
  * resolve → submit LIVE from the raw CBOR fixture; the DuckDB oracles
  * re-derive the same results in ANSI SQL over the pre-decoded
  * `fixtures/decoded_deals.parquet` (regenerate with
  * `Test/runMain graft.pipeline.DumpDecodedFixture`; the decode step
  * itself is validated by the golden 360/25/336 count specs), so a
  * decode or state-machine regression breaks the hash match.
  * Deterministic by construction (fixed fixture, fixed `now`). */
object DealQueries {

  private val fixtures = "/root/repo/src/test/resources/fixtures"

  private def raw(spark: SparkSession): DataFrame =
    spark.read.schema(RawActorEvent.schema).json(s"$fixtures/rawActorEvents.json")

  private def emptyState(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ActiveDeal.schema)

  /** S2+T1-T4+J1: full decode → dedup ingest of the fixture (360 rows). */
  def q24DealDecode(spark: SparkSession, dir: String): DataFrame =
    DealIngest.dedupeAgainst(
      DealIngest.decodeRange(raw(spark), 4622129, 4622139), emptyState(spark))
      .select("activated_at_epoch", "miner_id", "client_id", "piece_cid",
        "piece_size", "term_start_epoch", "sector_id", "reverted")

  /** J2+J3+ST6+A4: resolve tick over the fixture state, counts by
    * retrievability state (deterministic 270 resolved / 90 unresolved). */
  def q25DealStateCounts(spark: SparkSession, dir: String): DataFrame = {
    val state = DealIngest.dedupeAgainst(
      DealIngest.decodeRange(raw(spark), 4622129, 4622139), emptyState(spark))
    val peer = spark.read.json(s"$fixtures/minerPeerIds.json")
    val pay = spark.read.json(s"$fixtures/payloadCids.json")
    val now = java.sql.Timestamp.valueOf("2025-01-15 00:00:00")
    ResolvePayloadCids.countsByState(
      ResolvePayloadCids.resolve(state, peer, pay, now, maxDeals = 10000))
  }

  /** F3+T5+T6: submit-eligible payload rendering over the resolved
    * fixture state at a fixed clock. */
  def q26DealSubmittable(spark: SparkSession, dir: String): DataFrame = {
    val state = DealIngest.dedupeAgainst(
      DealIngest.decodeRange(raw(spark), 4622129, 4622139), emptyState(spark))
    val peer = spark.read.json(s"$fixtures/minerPeerIds.json")
    val pay = spark.read.json(s"$fixtures/payloadCids.json")
    val now = java.sql.Timestamp.valueOf("2025-01-15 00:00:00")
    val resolved = ResolvePayloadCids.resolve(state, peer, pay, now, maxDeals = 10000)
    // expiresAt rendered as unix seconds: the oracle-compare contract
    // normalizes timestamps as epoch integers (see q02/q08)
    SubmitDeals.toSubmittable(
      SubmitDeals.eligible(resolved, java.sql.Timestamp.valueOf("2025-06-15 00:00:00")))
      .withColumn("expires_at_unix", unix_timestamp(col("expiresAt")))
      .drop("expiresAt")
  }
}
