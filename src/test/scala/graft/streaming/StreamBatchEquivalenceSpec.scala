package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

/** The tumbling-window aggregation must produce identical results in
  * batch and in Structured Streaming complete mode — the property that
  * lets the engine serve the same query surface over a live stream. */
class StreamBatchEquivalenceSpec extends SparkSpec {

  test("streaming tumbling-window agg equals the batch formulation (q11)") {
    val dir = "/root/testdata/sf0.001"
    val batch = graft.queries.Queries.q11TumblingWindow(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // stream the same parquet through the identical aggregation (the
    // file source needs a directory; stage the single file into one)
    val staged = java.nio.file.Files.createTempDirectory("eq-ev")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    // raw on-disk schema for the file source, then the SAME shared
    // normalizer the batch path uses — no open-coded encoding assumption
    val raw = graft.queries.Queries.eventsRaw(spark, dir)
    val stream = graft.queries.Queries.normalizeTs(
      spark.readStream.schema(raw.schema).parquet(staged.toString))
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double").as("sum_value"))
      .select(unix_timestamp(col("hour_ts")).as("hour_unix"),
        col("n"), col("sum_value"))

    val q = stream.writeStream.format("memory").queryName("eq_win")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamed = spark.table("eq_win")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch, s"sizes: stream=${streamed.size} batch=${batch.size}")
    assert(batch.nonEmpty)
  }
}
