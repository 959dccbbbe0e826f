package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative PageRank over an edge DataFrame — the canonical "loop of
  * joins" graph operator (the contraction-style twin of
  * [[ConnectedComponents]]). Simplified formulation without dangling-
  * mass redistribution: `r'(v) = (1-d) + d · Σ_{u→v} r(u)/deg(u)`,
  * ranks initialised to 1.0 — the fixed point every textbook power
  * iteration converges to (unnormalised; divide by node count for the
  * probability form).
  *
  * Scale shape: the edge relation is hash-partitioned on `src` ONCE and
  * persisted — every iteration's rank join then reuses that exchange
  * (the per-iteration shuffle is the rank relation, which is nodes-
  * sized, not edges-sized). Degree is precomputed on the same
  * partitioning. Contributions aggregate on `dst` (one edges-sized
  * shuffle per iteration — irreducible for power iteration), and the
  * rank lineage is cut with `localCheckpoint` every few rounds so long
  * runs don't accumulate a 100-join plan for Catalyst to re-analyze.
  *
  * reference analog: none — graph centrality is part of the extended
  * training-data surface (e.g. domain authority over a crawl's link
  * graph when curating web corpora).
  */
object PageRank {

  /** @param edges     (src, dst) directed edge relation; parallel edges
    *                  count multiply (pre-`distinct` if unwanted).
    *                  Nodes with no out-edges contribute no mass (the
    *                  simplified model; oracle-portable).
    * @param iters     fixed power-iteration count (deterministic — a
    *                  convergence test would make results data-timing
    *                  dependent).
    * @param damping   standard 0.85.
    * @param checkpointEvery cut rank lineage every k iterations.
    * @param onCheckpoint telemetry heartbeat, fired after each eager
    *                  lineage cut with (iteration, elapsed ms of the
    *                  cut) — the only actions inside the otherwise
    *                  lazy loop, so they are where a stalling run is
    *                  observable (wire to
    *                  [[graft.streaming.MetricsSink.roundHook]]). */
  def pageRank(
      edges: DataFrame, iters: Int, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst",
      checkpointEvery: Int = 8,
      onCheckpoint: (Int, Long) => Unit = (_, _) => ()): DataFrame =
    pageRankWithRelease(
      edges, iters, damping, srcCol, dstCol, checkpointEvery, onCheckpoint)._1

  /** [[pageRank]] plus an explicit RELEASE HANDLE for the three
    * relations it persists (edges, edges⋈degree, nodes). The returned
    * plan consumes them lazily, so call the handle only AFTER the
    * result is consumed (or abandoned). Bench/Verify-style harnesses
    * can keep using `spark.catalog.clearCache()`; long-lived sessions
    * that must not clear unrelated cache entries use this instead. */
  def pageRankWithRelease(
      edges: DataFrame, iters: Int, damping: Double = 0.85,
      srcCol: String = "src", dstCol: String = "dst",
      checkpointEvery: Int = 8,
      onCheckpoint: (Int, Long) => Unit = (_, _) => ()): (DataFrame, () => Unit) = {
    require(checkpointEvery > 0, "checkpointEvery must be positive")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = e.join(deg, "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var ranks = nodes.select(col("node"), lit(1.0).as("r"))
    var i = 0
    while (i < iters) {
      val contribs = withDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("r") / col("deg")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("c"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(1 - damping) + lit(damping) * coalesce(col("c"), lit(0.0))).as("r"))
      i += 1
      if (i % checkpointEvery == 0 && i < iters) {
        val t0 = System.nanoTime()
        ranks = ranks.localCheckpoint()
        onCheckpoint(i, (System.nanoTime() - t0) / 1000000L)
      }
    }
    // Returned LAZY on purpose: an eager localCheckpoint here would
    // release the three persisted relations early but costs ~2.5x wall
    // time (it forfeits whole-DAG adaptive execution — measured 4.8s
    // vs 1.4s at sf0.1). Same CACHE LIFECYCLE CONTRACT as the pairwise
    // Dedup operators: the persisted edge/degree/node relations are
    // consumed by the returned plan, so a long-lived session must
    // release them after consuming the result — via the returned
    // handle, or `spark.catalog.clearCache()` between operator calls
    // (what Bench and Verify do).
    val release = () => {
      e.unpersist(blocking = false)
      withDeg.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
      ()
    }
    (ranks, release)
  }
}
