package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The write-once-shuffle-never contract: equi-joins and aggregations
  * on the bucket key must plan with ZERO Exchange operators on the
  * bucketed sides. */
class BucketedSinkSpec extends SparkSpec {

  test("bucketed tables join and aggregate with no exchange on the bucket key") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val root = java.nio.file.Files.createTempDirectory("bucketed").toString
    BucketedSink.saveBucketed(
      docs.select(col("doc_id"), col("source")), "bspec_left", s"$root/l",
      bucketCol = "doc_id", nBuckets = 8)
    BucketedSink.saveBucketed(
      docs.select(col("doc_id"), col("n_chars")), "bspec_right", s"$root/r",
      bucketCol = "doc_id", nBuckets = 8)

    // at test scale the planner would broadcast (and rightly skip the
    // bucket layout); force the shuffle-join path the layout exists for
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val joined = BucketedSink.readBucketed(spark, "bspec_left")
      .join(BucketedSink.readBucketed(spark, "bspec_right"), "doc_id")
    val n = joined.count()
    assert(n == docs.count(), s"join must be lossless, got $n")

    // AQE finalizes the plan after execution; assert on the final form
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed equi-join must not shuffle either side:\n$plan")

    // aggregation on the bucket key also satisfies distribution from layout
    val agg = BucketedSink.readBucketed(spark, "bspec_left")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    agg.count()
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange"),
      s"bucket-key aggregation must not shuffle:\n$aggPlan")

    // control: the same join on NON-bucketed reads does shuffle — the
    // no-Exchange assertions above test the layout, not a trivial plan
    val flat = spark.read.parquet(s"$root/l")
      .join(spark.read.parquet(s"$root/r"), "doc_id")
    flat.count()
    assert(flat.queryExecution.executedPlan.toString.contains("Exchange"),
      "control join without catalog bucketing should shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bspec_left")
      spark.sql("DROP TABLE IF EXISTS bspec_right")
    }
  }
}
