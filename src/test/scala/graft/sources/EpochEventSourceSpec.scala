package graft.sources

import graft.{SparkSpec, TestSpark}
import graft.ingest.DealIngest
import graft.model.ActiveDeal
import graft.state.DealStateStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class EpochEventSourceSpec extends SparkSpec {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def stage(events: String, headHeight: Int): String = {
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.fixtures}/rawActorEvents.json"),
      java.nio.file.Paths.get(s"$events/epochs-4622129-4622139.json"))
    val head = s"${tmp("src-head")}/head.json"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(head), s"""{"Height":$headHeight}""")
    head
  }

  test("batch read applies finality and lookback gating at the source") {
    val events = tmp("src-ev")
    val head = stage(events, 4622139 + 940)
    val df = spark.read.format("graft.sources.EpochEventSource")
      .option("path", events).option("headFile", head)
      .option("finalityEpochs", 940).option("maxPastEpochs", 1999)
      .load()
    assert(df.count() == 360)
    assert(df.schema == graft.model.RawActorEvent.schema)

    // head close to the data: only epochs <= head-940 visible
    val head2 = s"$events/head2.json"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(head2), s"""{"Height":${4622134 + 940}}""")
    val df2 = spark.read.format("graft.sources.EpochEventSource")
      .option("path", events).option("headFile", head2).load()
    assert(df2.agg(max("height")).collect()(0).getInt(0) == 4622134)
    assert(df2.count() == 228)
  }

  test("epochsPerPartition controls input-partition fan-out; default tracks parallelism") {
    val scan = new EpochEventScan(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", "/nonexistent", "epochsPerPartition", "10")))
    // 100-epoch range / 10 per partition = 10 partitions, last one short
    val parts = scan.partitions(1000, 1099)
    assert(parts.length == 10)
    val ranges = parts.map(_.asInstanceOf[EpochRangePartition]).map(p => (p.fromEpoch, p.toEpoch))
    assert(ranges.head == ((1000, 1009)) && ranges.last == ((1090, 1099)))
    assert(scan.partitions(1000, 1004).length == 1) // range smaller than chunk
    assert(scan.partitions(1000, 999).isEmpty)      // empty window

    // unset: the range splits ~defaultParallelism-wide, never hard-coded
    val auto = new EpochEventScan(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", "/nonexistent")))
    val dp = spark.sparkContext.defaultParallelism
    val n = auto.partitions(1000, 1000 + dp * 10 - 1).length
    assert(n >= dp && n <= dp + 1)
  }

  test("file-name range pruning skips files outside the epoch window") {
    val events = tmp("src-prune")
    val head = stage(events, 4622139 + 940)
    // duplicate fixture named outside the window: if the reader opened
    // it, its in-window heights would double the count — name pruning
    // must skip the file without reading it
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.fixtures}/rawActorEvents.json"),
      java.nio.file.Paths.get(s"$events/epochs-5000000-5000010.json"))
    val df = spark.read.format("graft.sources.EpochEventSource")
      .option("path", events).option("headFile", head).load()
    assert(df.count() == 360)
  }

  test("live polling: ProcessingTime trigger picks up an advancing head mid-run") {
    val events = tmp("src-live")
    val head = stage(events, 4622134 + 940) // only epochs <= 4622134 finalized
    val headPath = java.nio.file.Paths.get(head)

    val raw = spark.readStream.format("graft.sources.EpochEventSource")
      .option("path", events).option("headFile", head).load()
    val q = raw.writeStream.format("memory").queryName("live_events")
      .outputMode("append")
      .option("checkpointLocation", tmp("src-live-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
      .start()
    try {
      // first window lands
      var waited = 0
      while (spark.table("live_events").count() < 228 && waited < 60000) {
        Thread.sleep(500); waited += 500
      }
      assert(spark.table("live_events").count() == 228)
      // head advances while the query keeps running: the next poll's
      // latestOffset exposes the remaining epochs, no restart needed
      java.nio.file.Files.writeString(headPath, s"""{"Height":${4622139 + 940}}""")
      waited = 0
      while (spark.table("live_events").count() < 360 && waited < 60000) {
        Thread.sleep(500); waited += 500
      }
      assert(spark.table("live_events").count() == 360)
    } finally q.stop()
  }

  test("streaming: epoch offsets checkpoint and resume as the head advances") {
    val events = tmp("src-stream")
    val store = tmp("src-store")
    val ckpt = tmp("src-ckpt")
    // head only reveals epochs up to 4622134 at first
    val head = stage(events, 4622134 + 940)
    val headPath = java.nio.file.Paths.get(head)

    def runOnce(): Unit = {
      val raw = spark.readStream.format("graft.sources.EpochEventSource")
        .option("path", events).option("headFile", head).load()
      val q = raw.writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val st = new DealStateStore(batch.sparkSession, store)
          val existing = st.read()
          val deals = DealIngest.dedupeAgainst(
            graft.codec.EventCodec.toActiveDeals(
              graft.codec.EventCodec.decodeBlockEvents(batch)), existing)
          if (deals.count() > 0) st.write(existing.unionByName(deals))
          ()
        }
        .start()
      q.awaitTermination(120000)
    }

    runOnce()
    val st = new DealStateStore(spark, store)
    assert(st.read().count() == 228)
    assert(st.read().agg(max("activated_at_epoch")).collect()(0).getInt(0) == 4622134)

    // head advances: the checkpointed offset means ONLY the new epochs
    // are re-read (the reference's resume-from-watermark, ST2)
    java.nio.file.Files.writeString(headPath, s"""{"Height":${4622139 + 940}}""")
    runOnce()
    assert(st.read().count() == 360)
    assert(st.read().dropDuplicates(ActiveDeal.naturalKey).count() == 360)
  }
}
