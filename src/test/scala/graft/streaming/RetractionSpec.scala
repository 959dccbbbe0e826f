package graft.streaming

import graft.{SparkSpec, TestSpark}
import graft.model.RawActorEvent
import graft.state.DealStateStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** BEYOND-REFERENCE reorg retraction (the reference's service.js:57-58
  * TODO): a reverted re-delivery removes the stored un-reverted row. */
class RetractionSpec extends SparkSpec {

  private def stage(): (String, String, String, String) = {
    val root = java.nio.file.Files.createTempDirectory("retract").toString
    val events = s"$root/events"
    new java.io.File(events).mkdirs()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.fixtures}/rawActorEvents.json"),
      java.nio.file.Paths.get(s"$events/epochs-4622129-4622139.json"))
    (events, s"$root/store", s"$root/ckpt", s"$root/metrics")
  }

  /** Write reverted copies of the fixture events in [lo, hi] as one new
    * NDJSON file in the stream directory. */
  private def stageReverts(events: String, lo: Int, hi: Int): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("reverts").toString
    spark.read.schema(RawActorEvent.schema)
      .json(s"${TestSpark.fixtures}/rawActorEvents.json")
      .filter(col("height").between(lo, hi))
      .withColumn("reverted", lit(true))
      .coalesce(1).write.mode("overwrite").json(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".json")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$events/reverts-$lo-$hi.json"))
  }

  private def runTick(events: String, store: String, ckpt: String,
      sink: MetricsSink): Unit = {
    val q = DealObserverStream.start(
      spark, events, store, ckpt,
      chainHead = () => 4622139 + 940,
      trigger = Trigger.AvailableNow(),
      metrics = Some(sink),
      retractReverts = true)
    q.awaitTermination()
  }

  test("a reverted re-delivery retracts the stored rows (day rewrite)") {
    val (events, storeRoot, ckpt, metricsRoot) = stage()
    val sink = new MetricsSink(spark, metricsRoot)
    runTick(events, storeRoot, ckpt, sink)
    val store = new DealStateStore(spark, storeRoot)
    assert(store.read().count() == 360)

    // reorg un-happens the newest epoch's 24 claims
    stageReverts(events, 4622139, 4622139)
    runTick(events, storeRoot, ckpt, sink)
    assert(store.read().count() == 336)
    assert(store.read().filter(col("activated_at_epoch") === 4622139).count() == 0)
    // retraction went through the day-rewrite path, not a full snapshot
    assert(store.chainDepth() > 1)
    val retracted = sink.table().filter(col("metric") === "retracted")
      .agg(sum("value")).collect()(0).getLong(0)
    assert(retracted == 24L)

    // replaying the same stream is a no-op (idempotent either path)
    runTick(events, storeRoot, ckpt, sink)
    assert(store.read().count() == 336)

    // the watermark rolled back below the retracted epoch, so the
    // REPLACEMENT chain's events at that height can re-enter the window
    assert(store.maxEpoch().contains(4622138))
    val tmp = java.nio.file.Files.createTempDirectory("replacement").toString
    spark.read.schema(RawActorEvent.schema)
      .json(s"${TestSpark.fixtures}/rawActorEvents.json")
      .filter(col("height") === 4622139)
      .limit(10) // the canonical chain re-confirms 10 of the 24 claims
      .coalesce(1).write.mode("overwrite").json(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".json")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$events/replacement-4622139.json"))
    runTick(events, storeRoot, ckpt, sink)
    assert(store.read().count() == 346)
    assert(store.read().filter(col("activated_at_epoch") === 4622139).count() == 10)
  }

  test("replacement chain spread over several micro-batches is fully ingested") {
    val (events, storeRoot, ckpt, metricsRoot) = stage()
    val sink = new MetricsSink(spark, metricsRoot)
    runTick(events, storeRoot, ckpt, sink)
    val store = new DealStateStore(spark, storeRoot)
    assert(store.read().count() == 360)

    // reorg un-happens the TWO newest epochs; floor = the lower one
    stageReverts(events, 4622138, 4622139)
    runTick(events, storeRoot, ckpt, sink)
    assert(store.read().filter(col("activated_at_epoch") >= 4622138).count() == 0)
    assert(store.rescanFloor().contains(4622138))

    def stageReplacement(height: Int, n: Int, tag: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(tag).toString
      spark.read.schema(RawActorEvent.schema)
        .json(s"${TestSpark.fixtures}/rawActorEvents.json")
        .filter(col("height") === height)
        .limit(n)
        .coalesce(1).write.mode("overwrite").json(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".json")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$events/$tag.json"))
    }

    // batch A: the replacement chain's 4622139 slice arrives FIRST.
    // A first-receipt heuristic would close the floor here and lose
    // batch B; the age-based floor must stay open.
    stageReplacement(4622139, 10, "replacementA")
    runTick(events, storeRoot, ckpt, sink)
    assert(store.read().filter(col("activated_at_epoch") === 4622139).count() == 10)
    assert(store.rescanFloor().contains(4622138),
      "floor must survive the first replacement batch")

    // batch B: the 4622138 slice arrives a tick later — it must land
    stageReplacement(4622138, 8, "replacementB")
    runTick(events, storeRoot, ckpt, sink)
    assert(store.read().filter(col("activated_at_epoch") === 4622138).count() == 8)
    assert(store.read().filter(col("activated_at_epoch") === 4622139).count() == 10)
  }

  test("the floor clears once it ages out of the lookback window") {
    val (events, storeRoot, ckpt, metricsRoot) = stage()
    val sink = new MetricsSink(spark, metricsRoot)
    runTick(events, storeRoot, ckpt, sink)
    val store = new DealStateStore(spark, storeRoot)

    stageReverts(events, 4622139, 4622139)
    runTick(events, storeRoot, ckpt, sink)
    assert(store.rescanFloor().contains(4622139))

    // the chain advances 2000 epochs: new finalized events arrive at
    // heights the floor can no longer reach (observe clamps at
    // head − maxPastEpochs = 4623090 > floor) — the tick that writes
    // them drops the moot floor
    val tmp = java.nio.file.Files.createTempDirectory("future").toString
    spark.read.schema(RawActorEvent.schema)
      .json(s"${TestSpark.fixtures}/rawActorEvents.json")
      .filter(col("height") === 4622139)
      .limit(5)
      .withColumn("height", col("height") + 2000)
      .coalesce(1).write.mode("overwrite").json(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".json")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$events/future-4624139.json"))
    val q = DealObserverStream.start(
      spark, events, storeRoot, ckpt,
      chainHead = () => 4622139 + 2000 + 950,
      trigger = Trigger.AvailableNow(),
      metrics = Some(sink),
      retractReverts = true)
    q.awaitTermination()
    assert(store.read().filter(col("activated_at_epoch") === 4624139).count() == 5)
    assert(store.rescanFloor().isEmpty, "aged-out floor must clear")
  }

  test("floor holds while the retracted span's CEILING is still inside the lookback") {
    val (events, storeRoot, ckpt, metricsRoot) = stage()
    val sink = new MetricsSink(spark, metricsRoot)
    runTick(events, storeRoot, ckpt, sink)
    val store = new DealStateStore(spark, storeRoot)

    // reorg spans the WHOLE fixture: floor 4622129, ceiling 4622139
    stageReverts(events, 4622129, 4622139)
    runTick(events, storeRoot, ckpt, sink)
    assert(store.rescanFloor().contains(4622129))
    assert(store.rescanCeil().contains(4622139))

    def stageShifted(shift: Int, n: Int, tag: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(tag).toString
      spark.read.schema(RawActorEvent.schema)
        .json(s"${TestSpark.fixtures}/rawActorEvents.json")
        .filter(col("height") === 4622139)
        .limit(n)
        .withColumn("height", col("height") + shift)
        .coalesce(1).write.mode("overwrite").json(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".json")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$events/$tag.json"))
    }
    def tickAt(head: Int): Unit = {
      val q = DealObserverStream.start(
        spark, events, storeRoot, ckpt, chainHead = () => head,
        trigger = Trigger.AvailableNow(), metrics = Some(sink),
        retractReverts = true)
      q.awaitTermination()
    }

    // head = 4624130: the FLOOR (4622129) is below head − 1999 = 4622131,
    // but the ceiling (4622139) is still inside the lookback — a
    // floor-only age-out would clear here and lose late replacements
    // for the span's upper epochs. The span test must hold the floor.
    stageShifted(500, 5, "mid-span-append")
    tickAt(4622139 + 1991)
    assert(store.rescanFloor().contains(4622129),
      "floor must hold while any retracted epoch is still reachable")

    // once the CEILING ages out too, the next writing tick clears
    stageShifted(2000, 5, "post-span-append")
    tickAt(4622139 + 2000 + 950)
    assert(store.rescanFloor().isEmpty, "whole span aged out → cleared")
    assert(store.rescanCeil().isEmpty)
  }

  test("same-batch revert + replacement: both apply in one tick (identical keys)") {
    val (events, storeRoot, ckpt, metricsRoot) = stage()
    val sink = new MetricsSink(spark, metricsRoot)
    runTick(events, storeRoot, ckpt, sink)
    val store = new DealStateStore(spark, storeRoot)
    assert(store.read().count() == 360)

    // ONE file: reverted copies of all 24 epoch-4622139 events PLUS
    // non-reverted re-deliveries of 10 of them (the canonical chain
    // re-confirms 10 claims under the same natural keys)
    val tmp = java.nio.file.Files.createTempDirectory("mixed").toString
    val newest = spark.read.schema(RawActorEvent.schema)
      .json(s"${TestSpark.fixtures}/rawActorEvents.json")
      .filter(col("height") === 4622139)
    newest.withColumn("reverted", lit(true))
      .unionByName(newest.limit(10))
      .coalesce(1).write.mode("overwrite").json(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".json")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$events/mixed-4622139.json"))

    runTick(events, storeRoot, ckpt, sink)
    assert(store.read().count() == 346)
    assert(store.read().filter(col("activated_at_epoch") === 4622139).count() == 10)
  }

  test("a reorg emptying a whole epoch-day tombstones it — still a delta write") {
    val (events, storeRoot, ckpt, metricsRoot) = stage()
    val sink = new MetricsSink(spark, metricsRoot)
    runTick(events, storeRoot, ckpt, sink)
    val store = new DealStateStore(spark, storeRoot)
    assert(store.read().count() == 360)

    // the whole fixture lives in one epoch_day: reverting everything
    // empties it — the day is deleted by tombstone, NOT a full rewrite
    stageReverts(events, 4622129, 4622139)
    runTick(events, storeRoot, ckpt, sink)
    assert(store.read().count() == 0)
    assert(store.chainDepth() > 1, "tombstone delete must stay a delta write")

    // a later ingest can re-create the tombstoned day (newest wins)
    val store2 = new DealStateStore(spark, storeRoot)
    val raw = spark.read.schema(RawActorEvent.schema)
      .json(s"${TestSpark.fixtures}/rawActorEvents.json")
    val fresh = graft.ingest.DealIngest.dedupeAgainst(
      graft.ingest.DealIngest.decodeRange(raw, 4622129, 4622130),
      store2.read())
    store2.writeDelta(fresh)
    assert(store2.read().count() == fresh.count())
    assert(store2.read().count() > 0)

    // compact() folds tombstones away into one clean snapshot
    store2.compact()
    assert(store2.chainDepth() == 1)
    assert(store2.read().count() == fresh.count())
  }
}
