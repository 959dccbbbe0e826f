package graft.streaming

import graft.{HealthServer, SparkSpec, TestSpark}
import graft.model.RawActorEvent
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** S12 (metrics table + listener bridge) and S13 (health route). */
class MetricsSinkSpec extends SparkSpec {

  test("record() appends queryable day-partitioned points") {
    val root = java.nio.file.Files.createTempDirectory("metrics").toString + "/m"
    val sink = new MetricsSink(spark, root)
    assert(sink.table().count() == 0)

    val t1 = java.sql.Timestamp.valueOf("2025-01-15 10:00:00")
    sink.record("observe", Map("ingested" -> 360L, "last_searched_epoch" -> 4622139L), t1)
    sink.record("resolve", Map("queued" -> 85L), t1)
    val t2 = java.sql.Timestamp.valueOf("2025-01-16 10:00:00")
    sink.record("submit", Map("submitted" -> 270L), t2)

    val tbl = sink.table()
    assert(tbl.count() == 4)
    assert(tbl.filter(col("loop") === "observe").count() == 2)
    assert(tbl.filter(col("metric") === "ingested")
      .select("value").collect()(0).getLong(0) == 360L)
    // day partitioning: retention sweeps prune by directory
    assert(tbl.select("day").distinct().count() == 2)
  }

  test("iterative graph loops record per-round telemetry through roundHook") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("metrics-graph").toString + "/m"
    val sink = new MetricsSink(spark, root)

    // CC: force the distributed star-contraction path so every round
    // fires the hook with its edge gauge
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id1", "id2")
    graft.ops.ConnectedComponents.connectedComponents(
      edges, onRound = sink.roundHook("cc"), localThreshold = 0).collect()
    val cc = sink.table().filter(col("loop") === "cc")
    val ccRounds = cc.filter(col("metric") === "round")
      .select("value").collect().map(_.getLong(0)).sorted
    assert(ccRounds.nonEmpty && ccRounds.head == 1L,
      s"per-round rows expected, got ${ccRounds.mkString(",")}")
    assert(cc.filter(col("metric") === "edges").count() == ccRounds.length,
      "each round carries its edge gauge")

    // PageRank: the checkpoint heartbeat is the loop's only action —
    // 5 iterations at checkpointEvery=2 cut at i=2 and i=4
    val (pr, release) = graft.ops.PageRank.pageRankWithRelease(
      Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"), iters = 5,
      checkpointEvery = 2,
      onCheckpoint = sink.roundHook("pagerank", valueName = "checkpoint_ms"))
    assert(pr.count() == 2)
    val prRounds = sink.table()
      .filter(col("loop") === "pagerank" && col("metric") === "round")
      .select("value").collect().map(_.getLong(0)).sorted
    assert(prRounds.toSeq == Seq(2L, 4L), s"got ${prRounds.mkString(",")}")

    // the release handle frees the three persisted relations without
    // touching unrelated cache entries
    val other = Seq((1, 2)).toDF("a", "b").cache()
    other.count()
    val before = spark.sparkContext.getPersistentRDDs.size
    release()
    // unpersist is async (blocking=false): poll briefly
    val deadline = System.currentTimeMillis() + 10000
    while (spark.sparkContext.getPersistentRDDs.size > before - 3 &&
      System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(spark.sparkContext.getPersistentRDDs.size <= before - 3,
      s"release must drop the 3 pagerank relations (before=$before)")
    assert(other.storageLevel.useMemory, "unrelated cache entries must survive")
    other.unpersist()
  }

  test("streaming loop records per-micro-batch points via the sink") {
    val tmp = java.nio.file.Files.createTempDirectory("metrics-stream").toString
    val sink = new MetricsSink(spark, s"$tmp/metrics")
    val events = s"$tmp/events"
    new java.io.File(events).mkdirs()
    // stage the golden fixture as the stream input
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.fixtures}/rawActorEvents.json"),
      java.nio.file.Paths.get(s"$events/rawActorEvents.json"))

    val q = DealObserverStream.start(
      spark, events, s"$tmp/store", s"$tmp/ckpt",
      chainHead = () => 4622139 + 940,
      trigger = Trigger.AvailableNow(),
      metrics = Some(sink))
    q.awaitTermination()

    val pts = sink.table().filter(col("loop") === "observe")
    assert(pts.filter(col("metric") === "ingested").count() >= 1)
    val ingested = pts.filter(col("metric") === "ingested")
      .agg(sum("value")).collect()(0).getLong(0)
    assert(ingested == 360L)
  }

  test("progressListener bridges engine progress into the table") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("metrics-l").toString + "/m"
    val sink = new MetricsSink(spark, root)
    val listener = sink.progressListener()
    spark.streams.addListener(listener)
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = MemoryStream[Int]
      mem.addData(1, 2, 3)
      val q = mem.toDF().writeStream.queryName("probe")
        .format("noop").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // listener fires asynchronously after the batch commits
      var tries = 0
      while (sink.table().count() == 0 && tries < 50) { Thread.sleep(200); tries += 1 }
      val rows = sink.table().filter(col("loop") === "probe")
      assert(rows.filter(col("metric") === "numInputRows")
        .agg(sum("value")).collect()(0).getLong(0) == 3L)
    } finally spark.streams.removeListener(listener)
  }

  test("health endpoint serves OK and flips on failing check") {
    @volatile var ok = true
    val hs = new HealthServer(port = 0, healthy = () => ok)
    val port = hs.start()
    try {
      val http = java.net.http.HttpClient.newHttpClient()
      def get() = http.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port/")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      val r1 = get()
      assert(r1.statusCode() == 200 && r1.body() == "OK")
      ok = false
      assert(get().statusCode() == 503)
    } finally hs.stop()
  }
}
