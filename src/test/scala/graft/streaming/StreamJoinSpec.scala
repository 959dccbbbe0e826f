package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp

/** Watermarked stream-stream attribution join: in-window matches, out-
  * of-window drops, and outer-join null emission once the watermark
  * closes an impression's window. */
class StreamJoinSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // (query ticks, collected rows) for the given join type after feeding
  // impressions/clicks then heartbeats that push both watermarks far
  // past every window of interest
  private def run(joinType: String, name: String): Seq[(String, Timestamp, Boolean)] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val imp = MemoryStream[(String, Timestamp)]
    val clk = MemoryStream[(String, Timestamp)]
    val joined = StreamJoin.attributionJoin(
      imp.toDF().toDF("key", "ts"), clk.toDF().toDF("key", "ts"),
      key = "key", maxDelay = "1 minute", joinType = joinType)
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      imp.addData(("a", ts("2026-01-01 10:00:00")), ("b", ts("2026-01-01 10:00:10")))
      clk.addData(
        ("a", ts("2026-01-01 10:00:30")), // in window → match
        ("b", ts("2026-01-01 10:20:00")), // 20 min late → outside horizon
        ("c", ts("2026-01-01 10:00:05"))) // click with no impression
      q.processAllAvailable()
      // heartbeats advance both watermarks ~2h past every window; a
      // second round lets the closed state actually evict/emit
      (1 to 2).foreach { i =>
        imp.addData(("hb", ts(s"2026-01-01 12:0$i:00")))
        clk.addData(("hb2", ts(s"2026-01-01 12:0$i:00")))
        q.processAllAvailable()
      }
      spark.table(name).collect().toSeq
        .map(r => (r.getString(0), r.getTimestamp(1), r.isNullAt(4)))
        .filterNot(t => t._1 == "hb" || t._1 == "hb2")
    } finally q.stop()
  }

  test("inner attribution join matches only clicks inside the horizon") {
    val rows = run("inner", "sj_inner")
    assert(rows == Seq(("a", ts("2026-01-01 10:00:00"), false)),
      s"got ${rows.mkString(",")}")
  }

  test("left-outer join emits null clicks once the watermark closes the window") {
    val rows = run("leftOuter", "sj_outer").sortBy(_._1)
    // a matched; b's window closed with no in-horizon click → null side
    assert(rows.map(t => (t._1, t._3)) == Seq("a" -> false, "b" -> true),
      s"got ${rows.mkString(",")}")
  }
}
