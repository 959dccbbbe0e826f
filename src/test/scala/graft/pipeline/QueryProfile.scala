package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Job-level timing for any declared query — where do a gate's seconds
  * go? Prints every Spark job over `minSec` (default 0.05 s) with its
  * call site, plus the per-run wall.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "Test/runMain graft.pipeline.QueryProfile q101_ann_stream [runs]"
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val qs = args.filterNot(_.forall(_.isDigit))
    val runs = args.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val minSec = sys.env.get("SPARK_GRAFT_PROFILE_MIN").map(_.toDouble).getOrElse(0.05)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobNanos = new java.util.concurrent.atomic.AtomicLong(0L)
    @volatile var echo = false
    @volatile var runT0 = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (System.nanoTime(),
          j.stageInfos.lastOption.map(_.name).getOrElse("?")))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, d) = jobs.getOrDefault(j.jobId, (0L, "?"))
        val sec = (System.nanoTime() - t0) / 1e9
        if (echo) { jobCount.incrementAndGet(); jobNanos.addAndGet(System.nanoTime() - t0); () }
        if (echo && sec >= minSec)
          println(f"JOB ${j.jobId}%4d at ${(t0 - runT0) / 1e9}%7.3f dur $sec%7.3f s  ${d.take(100)}")
      }
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val sec = (for (a <- i.submissionTime; b <- i.completionTime) yield (b - a) / 1e3)
          .getOrElse(-1.0)
        if (echo && sec >= minSec)
          println(f"STG ${i.stageId}%4d $sec%7.3f s tasks ${i.numTasks}%4d  ${i.name.take(100)}")
      }
    })
    // session warm-up (the Bench discipline)
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    qs.foreach { q =>
      (1 to runs).foreach { r =>
        println(s"===== $q run $r")
        echo = true
        jobCount.set(0); jobNanos.set(0L)
        val t0 = System.nanoTime()
        runT0 = t0
        val n = graft.SparkEntry.queries(q)(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        echo = false
        println(f"QPROF $q run $r wall $sec%7.3f s rows $n " +
          f"jobs ${jobCount.get()} jobSec ${jobNanos.get() / 1e9}%7.3f")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
