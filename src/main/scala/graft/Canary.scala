package graft

import org.apache.spark.sql.{SparkSession, functions => F}

/** Host-noise canaries stamped into every bench artifact.
  *
  * The CPU canary (pure codegen arithmetic + one tiny shuffle) tracks
  * CPU steal — its true cost is a machine constant, so its ratio
  * across runs is the host-contention factor. Round 15 proved it is
  * BLIND to this host's OTHER dominant noise mode: q96 swung
  * 4.2↔116.9 s on byte-identical code at CPU canaries of 0.25–0.29
  * (quiet!), because the interference was disk/page-cache contention
  * against the query's shuffle spill, which a zero-data workload never
  * touches.
  *
  * The IO canary closes that blind spot: a FIXED parquet scan + full
  * shuffle over a ~200 MB incompressible working set (xxhash64-derived
  * longs — deterministic, generated once into `target/iocanary` and
  * reused). Disk or page-cache contention moves this number while pure
  * CPU steal barely does, so the pair (cpu, io) adjudicates which
  * noise mode a wall-clock swing came from — the round-15 q96 and
  * driver-bench artifacts each took a manual two-worktree A/B to
  * settle; with both canaries stamped the artifact settles itself.
  *
  * Both report the MEDIAN of 3 samples after one untimed warm-up
  * (same discipline as the original Bench canary). */
object Canary {

  def cpuOnce(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 20000000L)
      .groupBy(F.pmod(F.col("id") * 2654435761L, F.lit(32)))
      .agg(F.sum(F.col("id") % 1000003L))
      .count()
    (System.nanoTime() - t0) / 1e9
  }

  /** Warm-up + median-of-3 CPU steal index. */
  def cpu(spark: SparkSession): Double = {
    cpuOnce(spark)
    Seq.fill(3)(cpuOnce(spark)).sorted.apply(1)
  }

  val ioDir = "target/iocanary"

  /** One-time fixture: 8M rows × 3 xxhash64 longs ≈ 200 MB of
    * incompressible parquet (hash output defeats encoding), 16 files. */
  def ensureIoFixture(spark: SparkSession): Unit =
    if (!new java.io.File(s"$ioDir/_SUCCESS").exists())
      spark.range(0L, 8000000L)
        .select(F.col("id"),
          F.xxhash64(F.col("id")).as("a"),
          F.xxhash64(F.col("id"), F.lit(1)).as("b"),
          F.xxhash64(F.col("id"), F.lit(2)).as("c"))
        .repartition(16)
        .write.mode("overwrite").parquet(ioDir)

  def ioOnce(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    // scan the full fixture, shuffle all of it (explicit repartition —
    // the optimizer cannot elide a user exchange), then a cheap agg so
    // the shuffle output is actually read back
    spark.read.parquet(ioDir)
      .repartition(64, F.pmod(F.col("a"), F.lit(9973)))
      .agg(F.sum(F.col("b")), F.sum(F.col("c")))
      .count()
    (System.nanoTime() - t0) / 1e9
  }

  /** Warm-up + median-of-3 IO contention index (generates the fixture
    * if absent — untimed). */
  def io(spark: SparkSession): Double = {
    ensureIoFixture(spark)
    ioOnce(spark)
    Seq.fill(3)(ioOnce(spark)).sorted.apply(1)
  }
}
