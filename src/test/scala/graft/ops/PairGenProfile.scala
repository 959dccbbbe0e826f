package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does ngramJaccardPairs' edge generation spend its ~15 s at
  * sf1 — the SMJ pair stream or the (id1, id2) count aggregate?
  * Run: sbt "Test/runMain graft.ops.PairGenProfile target/sf1" */
object PairGenProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.queries.Queries.parallelFloor(
      spark.read.parquet(s"$dir/documents.parquet"))

    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $tag%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sh = docs.select(col("source").as("block"), col("doc_id").as("id"),
        explode(Dedup.gramHashArray(col("text"), 2)).as("sh"))
      .persist()
    timed("postings: materialize")(sh.count())

    val a = sh.select(col("id").as("id1"), col("block"), col("sh"))
    val b = sh.select(col("id").as("id2"), col("block"), col("sh"))
    val joined = a.join(b, Seq("block", "sh")).filter(col("id1") < col("id2"))

    timed("join only (count)")(joined.count())
    timed("join + (id1,id2) count agg") {
      joined.groupBy("id1", "id2").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 8).count()
    }
    timed("join + packed-key count agg") {
      // doc_ids < 2^31 on this corpus: experiment only, not the operator
      joined.groupBy((col("id1") * lit(4294967296L) + col("id2")).as("pk"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= 8).count()
    }
    timed("full ngramJaccardPairs (sizes)") {
      Dedup.ngramJaccardPairs(docs, n = 2, minIntersect = 8,
        blockCol = Some("source")).count()
    }
    spark.stop()
  }
}
