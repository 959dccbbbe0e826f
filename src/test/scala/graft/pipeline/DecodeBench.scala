package graft.pipeline

import graft.TestSpark
import graft.codec.{ClaimPivot, EventCodec}
import graft.model.RawActorEvent
import org.apache.spark.sql.functions._

/** Ingest-decode microbench: native ClaimPivot expression vs the UDF
  * formulation over the golden fixture replicated ×N.
  * Run: sbt "Test/runMain graft.pipeline.DecodeBench [replicas]" */
object DecodeBench {
  def main(args: Array[String]): Unit = {
    val replicas = if (args.nonEmpty) args(0).toInt else 300
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    val raw = spark.read.schema(RawActorEvent.schema)
      .json(s"${TestSpark.fixtures}/rawActorEvents.json")
    // replicate with shifted heights so rows are distinct events
    val big = raw.crossJoin(spark.range(replicas).select(col("id").as("rep")))
      .withColumn("height", col("height") + col("rep").cast("int") * 100)
      .drop("rep")
      .repartition(8).cache()
    val n = big.count()

    def timed(label: String)(f: => Long): Unit = {
      // warm-up + 3 timed runs, report median
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val c = f
        assert(c == n, s"decoded $c of $n")
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"DECODE $label: ${ts(1)}%.2f s median (${n / ts(1)}%.0f events/s)")
    }

    timed("native-expression") {
      big.withColumn("event", ClaimPivot.decodeClaimEvent(col("entries")))
        .filter(col("event").isNotNull).count()
    }
    timed("udf") {
      big.withColumn("event", EventCodec.decodeClaimUdf(col("entries")))
        .filter(col("event").isNotNull).count()
    }
    spark.stop()
  }
}
