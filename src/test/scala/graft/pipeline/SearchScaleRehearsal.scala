package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SEARCH-side scale rehearsal for the three durable ANN stores
  * (round-15, verdict #6): the TICK legs prove flat upserts, this
  * proves the SERVING path at realistic query-batch sizes. Builds one
  * sf1-scale store per tier (reused across runs if present — so an A/B
  * can build with one HEAD and search with another), then walls
  * `searchStore` at nq ∈ SPARK_GRAFT_SEARCH_NQ (default 10000,50000),
  * canary-stamped (the Bench steal index) so walls are interpretable
  * against host noise.
  *
  * The IVF-PQ leg is the measurement harness for the round-15
  * cell-indexed ADC pass: at nq = 10k+ against a ~400k-vector store
  * the r14 shape scanned the whole broadcast query array per code row
  * (O(rows × nq)); the cell index bounds per-row work by the queries
  * probing that row's cell (~nq·nprobe/nlist). nlist is 64 here so the
  * prune is visible (16× at nprobe 4), matching how a real deployment
  * sizes nlist ≫ nprobe. */
object SearchScaleRehearsal {

  val StoreRoot = "/root/repo/target/searchstores"

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-search-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "48g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val nqs = sys.env.getOrElse("SPARK_GRAFT_SEARCH_NQ", "10000,50000")
      .split(',').map(_.trim.toInt).toSeq
    val tiers = sys.env.getOrElse("SPARK_GRAFT_SEARCH_TIERS", "ann,ivf,ivfpq")
      .split(',').map(_.trim).toSet

    // dual host-noise stamp (round 16): cpu = steal, io = disk/page-
    // cache contention — the mode the cpu canary is provably blind to
    def canary(): Double = graft.Canary.cpu(spark)
    def ioCanary(): Double = graft.Canary.io(spark)

    // sf1 ships 20k embeddings — tile by id-offset copies so the store
    // is serving-path-sized (~160k vectors at the default 8); offsets sit
    // at 1e12 strides, far above the sf1 generator's own 1e8 id strides
    val copies = sys.env.getOrElse("SPARK_GRAFT_SEARCH_COPIES", "8").toInt
    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val emb = (0 until copies).map(c => emb0.select(
        (col("vec_id") + lit(c.toLong * 1000000000000L)).as("vec_id"),
        col("embedding"))).reduce(_ unionByName _)
    val total = emb.count()
    println(f"SEARCH_SCALE corpus=$total%d sf_dir=$sfDir " +
      f"canary=${canary()}%.2f io=${ioCanary()}%.2f")

    // ---- stores: build once (4 accretion ticks each), reuse if pinned
    def ensure(tier: String, marker: String)(build: String => Unit): String = {
      val dir = s"$StoreRoot/$tier"
      if (!new java.io.File(s"$dir/$marker").exists()) {
        val t0 = System.nanoTime()
        build(dir)
        println(f"SEARCH_SCALE built tier=$tier%s wall=${(System.nanoTime() - t0) / 1e9}%.2f")
      } else println(s"SEARCH_SCALE reuse tier=$tier")
      dir
    }
    def ticks(f: (DataFrame, String) => Unit): Unit =
      (0 until 4).foreach { c =>
        f(emb.filter(pmod(col("vec_id"), lit(4)) === c), s"t$c")
      }

    val annDir = if (!tiers("ann")) "" else ensure("ann", "_ANN") { dir =>
      ticks((b, t) => { graft.streaming.AnnStream.upsertStep(
        b, dir, dim = 64, planes = 8, seed = 7L, tables = 2, batchTag = t); () })
      graft.streaming.AnnStream.compactStore(spark, dir)
    }
    val ivfDir = if (!tiers("ivf")) "" else ensure("ivf", "_IVF") { dir =>
      ticks((b, t) => { graft.streaming.IvfStream.upsertStep(
        b, dir, dim = 64, nlist = 64, seed = 13L, batchTag = t); () })
      graft.streaming.IvfStream.compactStore(spark, dir)
    }
    val pqDir = if (!tiers("ivfpq")) "" else ensure("ivfpq", "_IVFPQ") { dir =>
      ticks((b, t) => { graft.streaming.IvfPqStream.upsertStep(
        b, dir, dim = 64, nlist = 64, m = 8, seed = 37L, batchTag = t); () })
      graft.streaming.IvfPqStream.compactStore(spark, dir)
    }
    val sqDir = if (!tiers("ivfsq")) "" else ensure("ivfsq", "_IVFSQ") { dir =>
      ticks((b, t) => { graft.streaming.IvfSqStream.upsertStep(
        b, dir, dim = 64, nlist = 64, seed = 41L, batchTag = t); () })
      graft.streaming.IvfSqStream.compactStore(spark, dir)
    }

    // ---- search legs: wall of the FULL top-5 answer at each nq
    def leg(tier: String, nq: Int)(run: DataFrame => DataFrame): Unit = {
      val queries = emb.orderBy(col("vec_id")).limit(nq)
      val t0 = System.nanoTime()
      val n = run(queries).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"SEARCH_SCALE tier=$tier%s nq=$nq%d rows=$n%d " +
        f"wall=$wall%.2f canary=${canary()}%.2f io=${ioCanary()}%.2f")
    }
    nqs.foreach { nq =>
      if (tiers("ann")) leg("ann", nq)(q =>
        graft.streaming.AnnStream.searchStore(spark, annDir, q, k = 5))
      if (tiers("ivf")) leg("ivf", nq)(q =>
        graft.streaming.IvfStream.searchStore(spark, ivfDir, q, k = 5, nprobe = 4))
      if (tiers("ivfpq")) leg("ivfpq", nq)(q =>
        graft.streaming.IvfPqStream.searchStore(spark, pqDir, q, k = 5,
          nprobe = 4, rerank = 32))
      if (tiers("ivfsq")) leg("ivfsq", nq)(q =>
        graft.streaming.IvfSqStream.searchStore(spark, sqDir, q, k = 5,
          nprobe = 4, rerank = 32))
    }

    // ---- round-16 BATCH-operator legs (verdict #1): the five
    // SimilaritySearch batch tiers over the same tiled corpus, after
    // the TopKMap scoring fold — the walls must land in the stream
    // class, not the 130–630 s per-pair-relation class the streams
    // measured before their rework. Index build walls print separately
    // (the amortized serve shape); tier knobs mirror the store legs
    // (nlist 64 / nprobe 4 / m 8 / rerank 32; LSH 8 planes × 2 tables).
    if (tiers.exists(_.startsWith("batch_"))) {
      import graft.ops.{SimilaritySearch => SS}
      val corpusP = emb.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      corpusP.count()
      def bleg(tier: String, nq: Int)(run: DataFrame => DataFrame): Unit = {
        val queries = corpusP.orderBy(col("vec_id")).limit(nq)
        val t0 = System.nanoTime()
        val n = run(queries).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"SEARCH_SCALE tier=$tier%s nq=$nq%d rows=$n%d " +
          f"wall=$wall%.2f canary=${canary()}%.2f io=${ioCanary()}%.2f")
      }
      def built(tier: String)(mk: => (DataFrame => DataFrame, () => Unit)): Unit = {
        val t0 = System.nanoTime()
        val (search, release) = mk
        println(f"SEARCH_SCALE built tier=$tier%s " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%.2f")
        nqs.foreach(nq => bleg(tier, nq)(search))
        release()
      }
      if (tiers("batch_brute"))
        nqs.foreach(nq => bleg("batch_brute", nq)(q =>
          SS.bruteForceTopK(q, corpusP, k = 5)))
      if (tiers("batch_lsh")) built("batch_lsh") {
        val idx = SS.lshBuild(corpusP, dim = 64, planes = 8, tables = 2)
        idx.bucketSizes.count()
        (q => SS.lshSearch(idx, q, k = 5), () => idx.release())
      }
      if (tiers("batch_ivf")) built("batch_ivf") {
        val idx = SS.ivfBuild(corpusP, nlist = 64)
        idx.cellSizes.count()
        (q => SS.ivfSearch(idx, q, k = 5, nprobe = 4), () => idx.release())
      }
      if (tiers("batch_pq")) built("batch_pq") {
        val idx = SS.pqBuild(corpusP, dim = 64, m = 8)
        // 1-query warm search forces the persisted encode pass into the
        // build wall (the other tiers force via their occupancy views)
        SS.pqSearch(idx, corpusP.limit(1), k = 1).count()
        (q => SS.pqSearch(idx, q, k = 5, rerank = 32), () => idx.release())
      }
      if (tiers("batch_ivfpq")) built("batch_ivfpq") {
        val idx = SS.ivfPqBuild(corpusP, dim = 64, nlist = 64, m = 8)
        idx.cellSizes.count()
        (q => SS.ivfPqSearch(idx, q, k = 5, nprobe = 4, rerank = 32),
          () => idx.release())
      }
      if (tiers("batch_ivfsq")) built("batch_ivfsq") {
        val idx = SS.ivfSqBuild(corpusP, dim = 64, nlist = 64)
        idx.cellSizes.count()
        (q => SS.ivfSqSearch(idx, q, k = 5, nprobe = 4, rerank = 32),
          () => idx.release())
      }
      corpusP.unpersist()
    }
    spark.stop()
  }
}
