package graft.pipeline

import graft.TestSpark
import graft.ingest.DealIngest
import graft.model.{ActiveDeal, RawActorEvent}
import org.apache.spark.sql.functions._

/** Regenerates `fixtures/decoded_deals.parquet`: the golden fixture's 360
  * events decoded + deduped into initial-state ActiveDeal rows, as ONE
  * parquet file committed to the repo.
  *
  * Purpose: DuckDB oracles for the deal-pipeline queries (q24–q26). The
  * Spark side computes decode → resolve → submit LIVE from the raw CBOR
  * fixture; the oracle SQL reads this pre-decoded parquet (decode
  * validated separately by the golden 360/25/336 count specs) and
  * re-derives the same results in ANSI SQL — so a decode or state-machine
  * regression breaks the hash match.
  *
  * Run: `sbt "Test/runMain graft.pipeline.DumpDecodedFixture"`.
  */
object DumpDecodedFixture {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val raw = spark.read.schema(RawActorEvent.schema)
      .json(s"${TestSpark.fixtures}/rawActorEvents.json")
    val emptyState = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ActiveDeal.schema)
    val deals = DealIngest.dedupeAgainst(
      DealIngest.decodeRange(raw, 4622129, 4622139), emptyState)
      .orderBy(ActiveDeal.naturalKey.map(col): _*)

    val tmp = java.nio.file.Files.createTempDirectory("decoded-deals").toString
    deals.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error("no part file written"))
    val dest = java.nio.file.Paths.get(s"${TestSpark.fixtures}/decoded_deals.parquet")
    java.nio.file.Files.copy(part.toPath, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote ${dest} (${java.nio.file.Files.size(dest)} bytes)")
    spark.stop()
  }
}
