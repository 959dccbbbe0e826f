package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Drift auto-refit rehearsal (round 16, verdict #6): picks the
  * recommended `refitDriftFactor` default from sf1-scale evidence.
  *
  * Protocol, per tier (IVF, IVF-PQ): tick 0 fits + pins the quantizer
  * and its drift BASELINE on the first slice of the sf1 embeddings;
  * ticks 1–5 are STATIONARY slices of the same corpus — their
  * member-weighted mean-distance ratio to the baseline is the noise
  * band the default must sit ABOVE; ticks 6–7 are DRIFTED batches
  * (every vector's coordinates rolled by 17 positions — same marginal
  * scale, different joint distribution) — their ratio is the signal
  * the default must sit BELOW. `maybeRefitOnDrift(factor)` must stay
  * quiet through ticks 1–5, fire EXACTLY ONCE at tick 6 (the refit
  * re-pins centroids + baseline), and stay quiet at tick 7 (the
  * re-pinned quantizer now fits the new distribution). A post-refit
  * search sanity-checks the store still answers.
  *
  * Emits `DRIFT tier=… tick=… ratio=… refit=…` lines; the factor under
  * test comes from SPARK_GRAFT_DRIFT_FACTOR (default 1.5 — the value
  * the `start()` entries pin as their default). */
object DriftRehearsal {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-drift-rehearsal")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_DRIFT_FACTOR", "1.5").toDouble

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    // drifted twin: coordinates rolled by 17 — a joint-distribution
    // shift the pinned quantizer compresses badly, at identical scale
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    val rolled = emb.select(
      (col("vec_id") + lit(1000000000L)).as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => element_at(col("embedding"), (pmod(i + lit(17), lit(dim)) + 1)
          .cast("int"))).as("embedding"))

    def slice(c: Int): DataFrame = emb.filter(pmod(col("vec_id"), lit(6)) === c)
    def baselineOf(storeDir: String, marker: String): Double = {
      val src = scala.io.Source.fromFile(s"$storeDir/$marker")
      try src.getLines().find(_.startsWith("baseline "))
        .map(_.stripPrefix("baseline ").toDouble).getOrElse(-1.0)
      finally src.close()
    }
    def weightedMean(monitor: DataFrame, distCol: String): Double = {
      val r = monitor.agg(sum(col("members")).as("n"),
        sum(col("members") * col(distCol)).as("w")).collect()(0)
      if (r.isNullAt(0) || r.getLong(0) == 0L) 0.0 else r.getDouble(1) / r.getLong(0)
    }

    def leg(dir: String, tier: String, marker: String, distCol: String,
        up: (DataFrame, String) => DataFrame,
        refit: DataFrame => Boolean,
        search: () => Long): Unit = {
      var refits = 0
      def tick(t: Int, batch: DataFrame): Unit = {
        val mon = up(batch, s"t$t")
        val mean = weightedMean(mon, distCol)
        val base = baselineOf(dir, marker)
        val fired = refit(mon)
        if (fired) refits += 1
        println(f"DRIFT tier=$tier%s tick=$t%d ratio=${mean / base}%.3f " +
          f"refit=$fired%s")
      }
      (0 until 6).foreach(t => tick(t, slice(t)))
      tick(6, rolled.filter(pmod(col("vec_id"), lit(6)) === 0))
      tick(7, rolled.filter(pmod(col("vec_id"), lit(6)) === 1))
      val t0 = System.nanoTime()
      val rows = search()
      println(f"DRIFT tier=$tier%s refits=$refits%d search_rows=$rows%d " +
        f"search_sec=${(System.nanoTime() - t0) / 1e9}%.2f " +
        f"canary=${graft.Canary.cpu(spark)}%.2f")
    }

    val ivfDir = java.nio.file.Files.createTempDirectory("driftivf").toString
    leg(ivfDir, "ivf", "_IVF", "mean_dist",
      (b, t) => graft.streaming.IvfStream.upsertStep(
        b, ivfDir, dim = dim, nlist = 64, seed = 13L, batchTag = t),
      mon => graft.streaming.IvfStream.maybeRefitOnDrift(spark, ivfDir, mon, factor),
      () => graft.streaming.IvfStream.searchStore(
        spark, ivfDir, emb.filter(col("vec_id") < 10), k = 5, nprobe = 4).count())

    val pqDir = java.nio.file.Files.createTempDirectory("driftpq").toString
    leg(pqDir, "ivfpq", "_IVFPQ", "mean_code_err",
      (b, t) => graft.streaming.IvfPqStream.upsertStep(
        b, pqDir, dim = dim, nlist = 64, m = 8, seed = 37L, batchTag = t),
      mon => graft.streaming.IvfPqStream.maybeRefitOnDrift(spark, pqDir, mon, factor),
      () => graft.streaming.IvfPqStream.searchStore(
        spark, pqDir, emb.filter(col("vec_id") < 10), k = 5,
        nprobe = 4, rerank = 32).count())

    spark.stop()
  }
}
