package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for one q97-shaped delta fold at a given SF dir —
  * where do the per-tick seconds go?
  * `sbt "Test/runMain graft.pipeline.FoldProfile /root/testdata/sf0.1"` */
object FoldProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Dedup
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"FOLDPROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("?")))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, d) = starts.getOrDefault(j.jobId, (0L, "?"))
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec > 0.5) println(f"JOB ${j.jobId}%4d $sec%6.2f s  ${d.take(90)}")
      }
    })
    val docs = graft.queries.Queries.parallelFloor(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val fps = t("fingerprints")(
      { val f = Dedup.simhashPortable(docs)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        f.count(); f })
    val pairs = t("pairs")(
      { val p = Dedup.simhashPairsBalanced(fps, maxDist = 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"FOLDPROF pair_rows ${p.count()}"); p })
    val store = java.nio.file.Files.createTempDirectory("foldprof").toString
    (0 until 3).foreach { c =>
      t(s"fold tick $c") {
        graft.streaming.DedupStream.foldLabels(
          docs.filter(pmod(col("doc_id"), lit(3)) === c).select(
            col("doc_id").cast("long").as("id")),
          pairs.filter(pmod(col("id1") + col("id2"), lit(3)) === c),
          store, batchTag = s"t$c")
      }
    }
    t("resolve")(println(s"FOLDPROF rows ${
      graft.streaming.DedupStream.latestLabels(spark, store).count()}"))
    spark.stop()
  }
}
