package graft.pipeline

import graft.ingest.DealIngest
import graft.model._
import graft.state._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual end-to-end drive of the observe → resolve → submit pipeline on
  * the golden fixtures. Run with:
  *   sbt "Test/runMain graft.pipeline.PipelineDemo"
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fx = "/root/repo/src/test/resources/fixtures"
    val raw = spark.read.schema(RawActorEvent.schema).json(s"$fx/rawActorEvents.json")
    val peer = spark.read.json(s"$fx/minerPeerIds.json")
    val pay = spark.read.json(s"$fx/payloadCids.json")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ActiveDeal.schema)

    val deals = DealIngest.observe(raw, empty, 4622139 + 940)
    println(s"OBSERVE appended=${deals.count()}")

    val storeDir = java.nio.file.Files.createTempDirectory("drive-store").toString
    val store = new DealStateStore(spark, storeDir)
    store.write(deals)
    println(s"STORE version=${store.latestVersion} rows=${store.read().count()}")

    val again = DealIngest.observe(raw, store.read(), 4622139 + 940)
    println(s"REPLAY appended=${again.count()}")

    val now = java.sql.Timestamp.valueOf("2025-01-15 00:00:00")
    val resolved = ResolvePayloadCids.resolve(store.read(), peer, pay, now, 10000)
    store.write(resolved)
    val counts = ResolvePayloadCids.countsByState(store.read()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"RESOLVE counts=$counts")

    val later = java.sql.Timestamp.valueOf("2025-06-15 00:00:00")
    var batches = 0
    val sr = SubmitDeals.submit(store.read(), later, 100,
      rows => { batches += 1; (rows.length.toLong, 0L) })
    println(s"SUBMIT submitted=${sr.submitted} batches=$batches")
    store.write(sr.newState)
    println(s"FINAL submitted_rows=${store.read().filter(col("submitted_at").isNotNull).count()} version=${store.latestVersion}")
    spark.stop()
  }
}
