package graft.streaming

import graft.SparkSpec
import graft.ops.SimilaritySearch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The round-17 cell-occupancy drift signal, pinned.
  *
  * Why it exists: the reconstruction-error monitors have a MEASURED
  * blind spot (round-16 sf1 rehearsal) — a regime shift that re-routes
  * vectors into different cells without degrading their quantization
  * error reads ratio ~1.0 forever, and the store silently serves a
  * quantizer fitted to a distribution that no longer exists. The
  * occupancy signal compares each tick's per-cell member histogram to
  * the fit-sample histogram pinned in the marker
  * ([[StoreCommits.occupancyTv]], total-variation distance) and
  * OR-triggers the same refit path.
  *
  * The store tests build a ROUTING shift on purpose: two well-
  * separated prototype clusters, fit 50/50, then ticks drawn from one
  * cluster only. Reconstruction error is unchanged (the tick's vectors
  * quantize exactly as well as at fit time — assert ratio stays under
  * the error factor), but half the histogram mass moves, TV ≈ 0.5
  * clears the 0.35 default, and the refit fires — the shift family the
  * error signal provably misses. */
class Round17OccupancySpec extends SparkSpec {

  // ---- the TV primitive ----------------------------------------------

  test("occupancyTv: identical=0, disjoint=1, half-moved=0.5, tiny ticks abstain") {
    val base = Array(0.25, 0.25, 0.25, 0.25)
    def cells(ms: Long*): Seq[(Int, Long)] = ms.zipWithIndex.map { case (m, c) => (c, m) }
    // identical distribution
    assert(StoreCommits.occupancyTv(cells(100, 100, 100, 100), base).get === 0.0)
    // all mass into cell 0 (disjoint from 3/4 of the baseline): TV = 0.75
    assert(math.abs(StoreCommits.occupancyTv(
      Seq((0, 400L)), base).get - 0.75) < 1e-12)
    // half the mass moved from cells 2,3 into 0,1
    assert(math.abs(StoreCommits.occupancyTv(
      cells(200, 200, 0, 0), base).get - 0.5) < 1e-12)
    // sub-minimum tick (n < 32·nlist): the signal must abstain, not fire
    assert(StoreCommits.occupancyTv(cells(30, 30, 30, 30), base).isEmpty)
    // empty baseline (pre-round-17 marker): abstain
    assert(StoreCommits.occupancyTv(cells(100, 100, 100, 100),
      Array.empty[Double]).isEmpty)
  }

  // ---- shared routing-shift corpus -----------------------------------

  /** Two prototype clusters far apart (U leads with +8 on dims 0-3,
    * W with +8 on dims 8-11), deterministic per-id jitter. `uFrac`
    * selects the mixture: 0.5 = the fit/stationary regime, 1.0 = the
    * routing shift (same vectors-per-cluster geometry, all mass in U). */
  private def mixVecs(n: Int, offset: Long, uFrac: Double): DataFrame = {
    val s = spark
    import s.implicits._
    (0L until n.toLong).map { i =>
      val inU = (i.toDouble / n) < uFrac
      val v = Array.tabulate(16) { t =>
        val proto =
          if (inU) (if (t < 4) 8.0 else 0.0)
          else (if (t >= 8 && t < 12) 8.0 else 0.0)
        val jitter = (((i * 13 + t * 7 + offset) % 11) - 5) * 0.03
        (proto + jitter).toFloat
      }
      (offset + i, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def errRatio(mon: DataFrame, store: String, marker: String,
      errCol: String): Double = {
    val r = mon.agg(sum(col("members")).as("n"),
      sum(col("members") * col(errCol)).as("w")).collect()(0)
    val mean = if (r.isNullAt(0) || r.getLong(0) == 0L) 0.0
      else r.getDouble(1) / r.getLong(0)
    val src = scala.io.Source.fromFile(s"$store/$marker")
    val base = try src.getLines().find(_.startsWith("baseline "))
      .map(_.stripPrefix("baseline ").toDouble).getOrElse(-1.0)
    finally src.close()
    mean / base
  }

  test("IvfSqStream: occupancy TV fires on a routing shift the error ratio misses") {
    val store = java.nio.file.Files.createTempDirectory("sqocc").toString
    def tick(batch: DataFrame, tag: String): (Boolean, Double) = {
      val mon = IvfSqStream.upsertStep(batch, store,
        dim = 16, nlist = 4, seed = 41L, batchTag = tag).persist()
      val ratio = errRatio(mon, store, "_IVFSQ", "mean_code_err")
      val fired = IvfSqStream.maybeRefitOnDrift(spark, store, mon,
        factor = 2.0, cooldownCommits = 1, occTvMax = 0.35)
      mon.unpersist()
      (fired, ratio)
    }
    // fit 50/50 (pins quantizer + error baseline + occupancy histogram)
    val (f0, _) = tick(mixVecs(1024, 0L, 0.5), "t0")
    // stationary 50/50 ticks: occupancy ACTIVE (512 ≥ 32·4) and quiet
    val (f1, r1) = tick(mixVecs(512, 100000L, 0.5), "t1")
    val (f2, r2) = tick(mixVecs(512, 200000L, 0.5), "t2")
    // the ROUTING shift: same geometry, all mass in U — reconstruction
    // unchanged, half the histogram moved
    val (f3, r3) = tick(mixVecs(512, 300000L, 1.0), "t3")
    assert(Seq(f0, f1, f2, f3) == Seq(false, false, false, true),
      s"fire pattern was ${Seq(f0, f1, f2, f3)}")
    // the error signal was BLIND to the shift (this is the point):
    // the shift tick's ratio sits with the stationary ticks, under 2.0
    assert(r1 < 2.0 && r2 < 2.0, s"stationary ratios $r1 / $r2 out of band")
    assert(r3 < 2.0, s"shift ratio $r3 cleared the error factor on its " +
      "own — the corpus no longer isolates the occupancy signal")
    // post-refit: the re-pinned store still answers exactly (nprobe =
    // nlist and rerank ≥ store size → must equal brute force)
    val all = mixVecs(1024, 0L, 0.5).union(mixVecs(512, 100000L, 0.5))
      .union(mixVecs(512, 200000L, 0.5)).union(mixVecs(512, 300000L, 1.0))
    val queries = mixVecs(1024, 0L, 0.5).filter(col("vec_id") < 8)
    val got = IvfSqStream.searchStore(spark, store, queries, k = 3,
        nprobe = 4, rerank = 65536)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = SimilaritySearch.bruteForceTopK(queries, all, k = 3)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute && got.nonEmpty, "post-refit store must answer exactly")
    // and the refit re-pinned BOTH anchors: the refit fit on the WHOLE
    // store (1536 U / 1024 W after t3 = a 60/40 mixture), so a tick
    // drawn at the store's new mixture is the new stationary regime —
    // no second fire. (A pure-U tick would still read TV ≈ 0.4 until
    // the mixture turns over — the documented convergence-under-
    // cooldown behavior, same as the error monitor's.)
    val (f4, _) = tick(mixVecs(512, 400000L, 0.6), "t4")
    assert(!f4, "post-refit mixture-matched tick must read as stationary")
  }

  test("IvfStream: the same routing shift fires occupancy while mean_dist stays in band") {
    val store = java.nio.file.Files.createTempDirectory("ivfocc").toString
    def tick(batch: DataFrame, tag: String): (Boolean, Double) = {
      val mon = IvfStream.upsertStep(batch, store,
        dim = 16, nlist = 4, seed = 13L, batchTag = tag).persist()
      val ratio = errRatio(mon, store, "_IVF", "mean_dist")
      val fired = IvfStream.maybeRefitOnDrift(spark, store, mon,
        factor = 1.5, cooldownCommits = 1, occTvMax = 0.35)
      mon.unpersist()
      (fired, ratio)
    }
    val (f0, _) = tick(mixVecs(1024, 0L, 0.5), "t0")
    val (f1, r1) = tick(mixVecs(512, 100000L, 0.5), "t1")
    val (f2, r2) = tick(mixVecs(512, 300000L, 1.0), "t2")
    assert(Seq(f0, f1, f2) == Seq(false, false, true),
      s"fire pattern was ${Seq(f0, f1, f2)}")
    assert(r1 < 1.5, s"stationary ratio $r1 out of band")
    assert(r2 < 1.5, s"shift ratio $r2 cleared the distance factor on " +
      "its own — the corpus no longer isolates the occupancy signal")
  }
}
