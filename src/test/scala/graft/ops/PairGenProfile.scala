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
    // INTERLEAVED A/B: host steal varies on minute timescales, so
    // sequential one-shot comparisons don't cancel it — alternate the
    // two aggregates and compare per-variant MINIMA.
    val gen = Array.fill(3)(0.0); val pk = Array.fill(3)(0.0)
    for (i <- 0 until 3) {
      val t0 = System.nanoTime()
      joined.groupBy("id1", "id2").agg(count(lit(1)).as("n"))
        .filter(col("n") >= 8).count()
      gen(i) = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      // doc_ids < 2^31 on this corpus: experiment only, not the operator
      joined.groupBy((col("id1") * lit(4294967296L) + col("id2")).as("pk"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= 8).count()
      pk(i) = (System.nanoTime() - t1) / 1e9
      println(f"PROF round $i generic=${gen(i)}%.2f packed=${pk(i)}%.2f")
    }
    println(f"PROF MIN generic=${gen.min}%.2f packed=${pk.min}%.2f")
    timed("full ngramJaccardPairs (sizes)") {
      Dedup.ngramJaccardPairs(docs, n = 2, minIntersect = 8,
        blockCol = Some("source")).count()
    }
    spark.stop()
  }
}
