package graft.pipeline

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage wall-clock probe for the q17 MinHash pipeline.
  * Run: SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.pipeline.MinhashProbe" */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm session

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val (n, numHashes, bands, minJaccard) = (2, 64, 32, 0.5)
    val sh = Dedup.shingleHashes(docs, n).cache()
    timed("shingle+cache")(sh.count())
    val sigs = Dedup.minhashSignatures(sh, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("signatures")(sigs.count())
    val cands = Dedup.lshCandidatePairs(sigs, numHashes, bands).cache()
    val nc = timed("lsh candidates")(cands.count())
    println(s"PROBE candidate pairs: $nc")

    val full = timed("full minhashDedupPairs")(
      Dedup.minhashDedupPairs(docs, n, numHashes, bands, minJaccard).count())
    println(s"PROBE verified pairs: $full")
    spark.stop()
  }
}
