package graft.streaming

import graft.{SparkSpec, TestSpark}
import graft.model.{ActiveDeal, RawActorEvent}
import graft.state.DealStateStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSpec {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("streaming observe: fixture replay reaches the same state as batch") {
    val events = tmp("stream-events")
    val store = tmp("stream-store")
    val ckpt = tmp("stream-ckpt")

    // stage the fixture as the first file in the event log
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.fixtures}/rawActorEvents.json"),
      java.nio.file.Paths.get(s"$events/batch0.json"))

    val q = DealObserverStream.start(spark, events, store, ckpt,
      chainHead = () => 4622139 + 940, trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)

    val st = new DealStateStore(spark, store)
    assert(st.read().count() == 360)

    // late second file with overlapping epochs: idempotent, no dupes
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.fixtures}/rawActorEvents.json"),
      java.nio.file.Paths.get(s"$events/batch1.json"))
    val q2 = DealObserverStream.start(spark, events, store, ckpt,
      chainHead = () => 4622139 + 940, trigger = Trigger.AvailableNow())
    q2.awaitTermination(120000)
    assert(st.read().count() == 360)
    assert(st.read().dropDuplicates(ActiveDeal.naturalKey).count() == 360)
  }

  test("dropDuplicatesWithinWatermark dedupes the stream without the store") {
    val events = tmp("stream-wmk")
    // the fixture twice = every deal duplicated across two files
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.fixtures}/rawActorEvents.json"),
      java.nio.file.Paths.get(s"$events/a.json"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.fixtures}/rawActorEvents.json"),
      java.nio.file.Paths.get(s"$events/b.json"))
    val q = DealObserverStream.dedupedDealStream(spark, events)
      .writeStream.format("memory").queryName("wmk_deals")
      .outputMode("append")
      .option("checkpointLocation", tmp("stream-wmk-ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(spark.table("wmk_deals").count() == 360)
    assert(spark.table("wmk_deals")
      .dropDuplicates(ActiveDeal.naturalKey).count() == 360)
  }

  test("finality gate holds in streaming: young epochs never enter the store") {
    val events = tmp("stream-events2")
    val store = tmp("stream-store2")
    val ckpt = tmp("stream-ckpt2")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.fixtures}/rawActorEvents.json"),
      java.nio.file.Paths.get(s"$events/batch0.json"))

    // head such that only epochs <= 4622134 are finalized
    val q = DealObserverStream.start(spark, events, store, ckpt,
      chainHead = () => 4622134 + 940, trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)
    val st = new DealStateStore(spark, store)
    assert(st.read().agg(max("activated_at_epoch")).collect()(0).getInt(0) == 4622134)
    assert(st.read().count() == 228) // 25+22+58+32+31+60 for 4622129..4622134
  }
}
