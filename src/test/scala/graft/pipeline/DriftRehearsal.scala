package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Drift auto-refit rehearsal (round 16, verdict #6): picks the
  * recommended `refitDriftFactor` default from sf1-scale evidence and
  * exercises the cooldown at the `start()` wiring's defaults.
  *
  * Protocol, per tier (IVF, IVF-PQ): tick 0 fits + pins the quantizer
  * and its drift BASELINE on the first slice of the sf1 embeddings;
  * ticks 1–7 are STATIONARY slices of the same corpus — their
  * member-weighted mean-monitor ratio to the baseline is the noise
  * band the default must sit ABOVE (and they accrue the ≥ 8 visible
  * commits the default cooldown requires before a refit may fire);
  * ticks 8–10 are DRIFTED batches. Expected, IVF leg:
  * `maybeRefitOnDrift(1.5)` stays quiet through ticks 0–7 (ratio
  * ~1.08), fires EXACTLY ONCE at tick 8 (scaled/mean-shifted vectors,
  * ratio ~17.8), and the cooldown suppresses ticks 9–10 (2–3 commits
  * < 8) while the refit's re-pinned quantizer absorbs the new regime;
  * a post-refit search sanity-checks the store still answers.
  *
  * The IVF-PQ leg documents the monitor's OBSERVABILITY BOUNDARY on
  * this corpus rather than a firing: code-reconstruction error is
  * measured on UNIT-normalized vectors, and its dynamic range is
  * (achievable err)/(fit baseline). The jittered sf1 embeddings fit
  * at baseline 0.67 — the codebooks never compressed them well — so
  * every shift family rehearsed stays under factor 1.5: scale/offset
  * 1.11 (normalization absorbs it), negation 1.13 (symmetric cloud),
  * global/per-vector coordinate rolls ≤ 1.18 (permutations of a
  * near-exchangeable corpus preserve the subvector marginals PQ
  * measures), all-energy-in-one-subspace concentration 1.34 (the
  * ceiling is ~2×baseline). On the structured prototype corpus of
  * Round15StreamSpec the baseline is small and a family shift fires
  * at 1.5 — quietness here is the monitor being right (reconstruction
  * had no quality to lose), not blind. ARCHITECTURE §2b records the
  * boundary.
  *
  * Emits `DRIFT tier=… tick=… ratio=… occ_tv=… refit=…` lines; the
  * factor under test comes from SPARK_GRAFT_DRIFT_FACTOR (default
  * 1.5 — the value the IVF/IVF-PQ `start()` entries pin) and, for the
  * scalar tier, SPARK_GRAFT_DRIFT_FACTOR_SQ (default 2.0 —
  * `IvfSqStream.start`'s own default: min/max-bound clamping lifts
  * THIS tier's stationary held-out band to 1.35–1.84 on this corpus,
  * measured by this very rig, so 1.5 sits inside its noise).
  *
  * ROUND 17 closes the observability boundary above: the
  * cell-OCCUPANCY TV signal (SPARK_GRAFT_DRIFT_OCC_TV, default 0.35 —
  * the shipped `refitOccupancyTv`) OR-triggers beside the error
  * ratio. Measured on this corpus at the defaults: the IVF-SQ leg's
  * ×3 scale+offset shift reads error ratio 1.001 (BLIND — the round-16
  * finding) but occ_tv 0.944 → refit FIRES; the IVF-PQ concentration
  * shift reads ratio 1.337 (under 1.5) but occ_tv 0.964 → FIRES; zero
  * stationary fires on any leg (ticks under the 32-samples/cell
  * minimum abstain — printed occ_tv=-1 — and the active fit tick reads
  * 0.000); exactly one refit per leg through the cooldown.
  * Round17OccupancySpec pins the active-signal stationary band (≤
  * ~0.05 at 128 samples/cell) and the routing-shift firing on a
  * structured corpus where the error ratio is provably flat. */
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
    // the scalar tier ships its own higher default (see the docstring)
    val sqFactor = sys.env.getOrElse("SPARK_GRAFT_DRIFT_FACTOR_SQ", "2.0").toDouble
    // round-17 occupancy-TV OR-trigger under test (the stores' shipped
    // default): the signal that fires on the regime shifts the error
    // ratios above are blind to on this near-isotropic corpus
    val occTv = sys.env.getOrElse("SPARK_GRAFT_DRIFT_OCC_TV", "0.35").toDouble

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    // IVF drift: scaled 3x and mean-shifted — the new-embedding-model
    // regime; the pinned centroids sit far from every new vector
    val scaled = emb.select(
      (col("vec_id") + lit(1000000000L)).as("vec_id"),
      transform(col("embedding"),
        x => (x * lit(3.0f) + lit(2.0f)).cast("float")).as("embedding"))
    // IVF-PQ shift under test: all energy in the first PQ subspace —
    // the strongest of the rehearsed families (see docstring), still
    // under 1.5 on this corpus; the leg records the boundary
    val concentrated = emb.select(
      (col("vec_id") + lit(1000000000L)).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i < lit(8), x + lit(0.5f)).otherwise(lit(0.0f))
          .cast("float")).as("embedding"))

    // fit tick = HALF the corpus (a production-shaped first batch: the
    // 256-centroid codebooks overfit a 2.5k fit slice, inflating the
    // stationary held-out band to ~1.43 - rehearsed); stationary ticks
    // slice the OTHER half so every ratio is held-out vs held-out
    val fitBatch = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    def slice(c: Int): DataFrame =
      emb.filter(pmod(col("vec_id"), lit(2)) === 1 &&
        pmod(col("vec_id"), lit(16)) === (2 * c + 1))
    def baselineOf(storeDir: String, marker: String): Double = {
      val src = scala.io.Source.fromFile(s"$storeDir/$marker")
      try src.getLines().find(_.startsWith("baseline "))
        .map(_.stripPrefix("baseline ").toDouble).getOrElse(-1.0)
      finally src.close()
    }
    def occBaseOf(storeDir: String, marker: String): Array[Double] = {
      val src = scala.io.Source.fromFile(s"$storeDir/$marker")
      try src.getLines().find(_.startsWith("occupancy "))
        .map(_.stripPrefix("occupancy ").split(',').map(_.toDouble))
        .getOrElse(Array.empty[Double])
      finally src.close()
    }
    def weightedMean(monitor: DataFrame, distCol: String): Double = {
      val r = monitor.agg(sum(col("members")).as("n"),
        sum(col("members") * col(distCol)).as("w")).collect()(0)
      if (r.isNullAt(0) || r.getLong(0) == 0L) 0.0 else r.getDouble(1) / r.getLong(0)
    }

    def leg(dir: String, tier: String, marker: String, distCol: String,
        drifted: DataFrame,
        up: (DataFrame, String) => DataFrame,
        refit: DataFrame => Boolean,
        search: () => Long): Unit = {
      var refits = 0
      def tick(t: Int, batch: DataFrame): Unit = {
        val mon = up(batch, s"t$t").persist()
        val mean = weightedMean(mon, distCol)
        val base = baselineOf(dir, marker)
        // the round-17 occupancy signal, computed exactly as the
        // stores' maybeRefitOnDrift does (TV vs the marker's pinned
        // fit-sample histogram); -1 = signal abstained (no baseline
        // or sub-minimum tick)
        val tv = graft.streaming.StoreCommits.occupancyTv(
          mon.select(col("cell"), col("members")).collect()
            .map(r => (r.getInt(0), r.getLong(1))).toSeq,
          occBaseOf(dir, marker)).getOrElse(-1.0)
        val fired = refit(mon)
        mon.unpersist()
        if (fired) refits += 1
        println(f"DRIFT tier=$tier%s tick=$t%d ratio=${mean / base}%.3f " +
          f"occ_tv=$tv%.3f refit=$fired%s")
      }
      tick(0, fitBatch)
      (0 until 7).foreach(t => tick(t + 1, slice(t)))
      (0 until 3).foreach(c =>
        tick(8 + c, drifted.filter(pmod(col("vec_id"), lit(8)) === c)))
      val t0 = System.nanoTime()
      val rows = search()
      println(f"DRIFT tier=$tier%s refits=$refits%d search_rows=$rows%d " +
        f"search_sec=${(System.nanoTime() - t0) / 1e9}%.2f " +
        f"canary=${graft.Canary.cpu(spark)}%.2f")
    }

    val ivfDir = java.nio.file.Files.createTempDirectory("driftivf").toString
    leg(ivfDir, "ivf", "_IVF", "mean_dist", scaled,
      (b, t) => graft.streaming.IvfStream.upsertStep(
        b, ivfDir, dim = dim, nlist = 64, seed = 13L, batchTag = t),
      mon => graft.streaming.IvfStream.maybeRefitOnDrift(spark, ivfDir, mon,
        factor, occTvMax = occTv),
      () => graft.streaming.IvfStream.searchStore(
        spark, ivfDir, emb.filter(col("vec_id") < 10), k = 5, nprobe = 4).count())

    val pqDir = java.nio.file.Files.createTempDirectory("driftpq").toString
    leg(pqDir, "ivfpq", "_IVFPQ", "mean_code_err", concentrated,
      (b, t) => graft.streaming.IvfPqStream.upsertStep(
        b, pqDir, dim = dim, nlist = 64, m = 8, seed = 37L, batchTag = t),
      mon => graft.streaming.IvfPqStream.maybeRefitOnDrift(spark, pqDir, mon,
        factor, occTvMax = occTv),
      () => graft.streaming.IvfPqStream.searchStore(
        spark, pqDir, emb.filter(col("vec_id") < 10), k = 5,
        nprobe = 4, rerank = 32).count())

    // IVF-SQ8 (round 16), at ITS OWN shipped default (2.0): this
    // corpus records the tier's observability boundary rather than a
    // firing — min/max clamping lifts the stationary held-out band to
    // 1.35-1.84 (why 1.5 was rejected as the default), and the
    // shifted-regime ticks read ~1.0 (reconstruction error measures
    // quantization quality, not novelty; the baseline is already at
    // the ceiling on a near-isotropic corpus). The structured-corpus
    // firing at 2.0 is spec-gated (IvfSqStreamSpec).
    val sqDir = java.nio.file.Files.createTempDirectory("driftsq").toString
    leg(sqDir, "ivfsq", "_IVFSQ", "mean_code_err", scaled,
      (b, t) => graft.streaming.IvfSqStream.upsertStep(
        b, sqDir, dim = dim, nlist = 64, seed = 41L, batchTag = t),
      mon => graft.streaming.IvfSqStream.maybeRefitOnDrift(spark, sqDir, mon,
        sqFactor, occTvMax = occTv),
      () => graft.streaming.IvfSqStream.searchStore(
        spark, sqDir, emb.filter(col("vec_id") < 10), k = 5,
        nprobe = 4, rerank = 32).count())

    spark.stop()
  }
}
