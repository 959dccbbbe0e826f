package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall-evidence harness for the rows-only approximate ANN tiers:
  * measures recall@5 of q20 (LSH) / q30 (IVF) / q45 (PQ+re-rank) /
  * q65 (IVF-PQ fused) against q19's brute-force cosine ground truth on
  * the SAME query set, at whatever SF dir is supplied. The per-tier
  * specs assert thresholds; this main produces the committed numbers
  * (RECALL.md) so the quality of the approximate tiers is a recorded
  * artifact, not an act of faith.
  *
  * Second leg — index persistence round-trip: each tier's index is
  * BUILT (same params as its query entry), SAVED via [[graft.ops.AnnIndexIO]],
  * released, re-LOADED into a fresh `newSession()`, and searched again.
  * The loaded search must return the IDENTICAL neighbor set (not merely
  * equal recall) — the at-scale proof that a saved index is the same
  * asset as the one that built it, measured on the real corpus rather
  * than a fixture.
  *
  * Usage: `sbt "runMain graft.Recall /root/testdata/sf0.1"` (or set
  * SPARK_GRAFT_SF_DIR). Emits one JSON line:
  * `{"sf":…,"truth_pairs":N,"recall":{"q20_lsh":r,…},
  *   "recall_loaded":{…},"loaded_identical":{…}}`.
  */
object Recall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.queries.OpsQueries
    import graft.ops.{AnnIndexIO, SimilaritySearch => SS}
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(r: Set[(Long, Long)], truth: Set[(Long, Long)]): Double =
      if (truth.isEmpty) 0.0 else r.intersect(truth).size.toDouble / truth.size

    val truth = pairs(OpsQueries.q19CosineTopK(spark, sfDir))
    spark.catalog.clearCache()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    // the q20/q30/q45/q65 QUERY ENTRIES run over the planted-neighbor
    // corpus (their DuckDB hash gates need provable-recall structure),
    // so their outputs are planted ids — disjoint from raw-corpus
    // truth by construction. The recall matrix therefore measures the
    // TIERS on the RAW corpus at the gate knobs — the regime RECALL.md
    // documents. (The previous block ran the planted-corpus entries
    // against raw truth and had silently read 0.00 since the planted
    // corpus landed; fixed round 16.)
    import graft.ops.{SimilaritySearch => SSb}
    val recalls = Seq[(String, () => DataFrame)](
      "q20_lsh" -> (() => SSb.lshTopK(q, emb, dim = 64, k = 5, planes = 6, tables = 8)),
      "q30_ivf" -> (() => SSb.ivfTopK(q, emb, k = 5, nprobe = 8)),
      "q45_pq" -> (() => SSb.pqTopK(q, emb, dim = 64, k = 5, rerank = 200)),
      "q65_ivfpq" -> (() => SSb.ivfPqTopK(q, emb, dim = 64, k = 5,
        nprobe = 10, rerank = 192)),
      "q108_ivfsq" -> (() => SSb.ivfSqTopK(q, emb, dim = 64, k = 5,
        nprobe = 10, rerank = 192))
    ).map { case (name, fn) =>
      val r = pairs(fn())
      spark.catalog.clearCache()
      name -> recallOf(r, truth)
    }

    // ---- streaming-store recall (round 16; 4th tier round 17): the
    // durable stores' searchStore against the SAME brute-force truth,
    // at TWO store states — mid-accretion (3 un-compacted commits) and
    // post-compaction. Store knobs mirror the q101/q102/q104/q109
    // entries.
    val storeRoot = java.nio.file.Files.createTempDirectory("recallstores").toString
    def accrete(up: (DataFrame, String) => Unit): Unit =
      (0 until 3).foreach(c =>
        up(emb.filter(pmod(col("vec_id"), lit(3)) === c), s"t$c"))
    val storeLegs: Seq[(String, Double, Double)] = Seq(
      ("ann_store", () => {
        val d = s"$storeRoot/ann"
        accrete((b, t) => { graft.streaming.AnnStream.upsertStep(
          b, d, dim = 64, planes = 6, tables = 8, batchTag = t); () })
        val mid = recallOf(pairs(
          graft.streaming.AnnStream.searchStore(spark, d, q, k = 5)), truth)
        graft.streaming.AnnStream.compactStore(spark, d)
        val post = recallOf(pairs(
          graft.streaming.AnnStream.searchStore(spark, d, q, k = 5)), truth)
        (mid, post)
      }),
      ("ivf_store", () => {
        val d = s"$storeRoot/ivf"
        accrete((b, t) => { graft.streaming.IvfStream.upsertStep(
          b, d, dim = 64, nlist = 16, seed = 13L, batchTag = t); () })
        val mid = recallOf(pairs(graft.streaming.IvfStream.searchStore(
          spark, d, q, k = 5, nprobe = 8)), truth)
        graft.streaming.IvfStream.compactStore(spark, d)
        val post = recallOf(pairs(graft.streaming.IvfStream.searchStore(
          spark, d, q, k = 5, nprobe = 8)), truth)
        (mid, post)
      }),
      ("ivfpq_store", () => {
        val d = s"$storeRoot/ivfpq"
        accrete((b, t) => { graft.streaming.IvfPqStream.upsertStep(
          b, d, dim = 64, nlist = 16, m = 8, seed = 37L, batchTag = t); () })
        val mid = recallOf(pairs(graft.streaming.IvfPqStream.searchStore(
          spark, d, q, k = 5, nprobe = 10, rerank = 192)), truth)
        graft.streaming.IvfPqStream.compactStore(spark, d)
        val post = recallOf(pairs(graft.streaming.IvfPqStream.searchStore(
          spark, d, q, k = 5, nprobe = 10, rerank = 192)), truth)
        (mid, post)
      }),
      // round 17: the fourth durable tier at the q109 gate knobs
      ("ivfsq_store", () => {
        val d = s"$storeRoot/ivfsq"
        accrete((b, t) => { graft.streaming.IvfSqStream.upsertStep(
          b, d, dim = 64, nlist = 16, seed = 41L, batchTag = t); () })
        val mid = recallOf(pairs(graft.streaming.IvfSqStream.searchStore(
          spark, d, q, k = 5, nprobe = 10, rerank = 192)), truth)
        graft.streaming.IvfSqStream.compactStore(spark, d)
        val post = recallOf(pairs(graft.streaming.IvfSqStream.searchStore(
          spark, d, q, k = 5, nprobe = 10, rerank = 192)), truth)
        (mid, post)
      })
    ).map { case (name, fn) =>
      val (mid, post) = fn()
      spark.catalog.clearCache()
      (name, mid, post)
    }

    // ---- persistence round-trip: build → save → release → load into a
    // fresh session → search → identical pairs (params = query entries)
    val idxRoot = sys.env.getOrElse("SPARK_GRAFT_INDEX_DIR", "target/ann-index")
    val fresh = spark.newSession()
    val embF = fresh.read.parquet(s"$sfDir/embeddings.parquet")
    val qF = embF.filter(col("vec_id") < 10)

    val roundTrips: Seq[(String, Set[(Long, Long)], Set[(Long, Long)])] = Seq(
      {
        val idx = SS.lshBuild(emb, dim = 64, planes = 6, tables = 8)
        val built = pairs(SS.lshSearch(idx, q, k = 5))
        AnnIndexIO.lshSave(idx, s"$idxRoot/lsh")
        idx.release(); spark.catalog.clearCache()
        val loaded = AnnIndexIO.lshLoad(fresh, s"$idxRoot/lsh")
        val got = pairs(SS.lshSearch(loaded, qF, k = 5))
        loaded.release()
        ("q20_lsh", built, got)
      }, {
        val idx = SS.ivfBuild(emb)
        val built = pairs(SS.ivfSearch(idx, q, k = 5, nprobe = 8))
        AnnIndexIO.ivfSave(idx, s"$idxRoot/ivf")
        idx.release(); spark.catalog.clearCache()
        val loaded = AnnIndexIO.ivfLoad(fresh, s"$idxRoot/ivf")
        val got = pairs(SS.ivfSearch(loaded, qF, k = 5, nprobe = 8))
        loaded.release()
        ("q30_ivf", built, got)
      }, {
        val idx = SS.pqBuild(emb, dim = 64)
        val built = pairs(SS.pqSearch(idx, q, k = 5, rerank = 200))
        AnnIndexIO.pqSave(idx, s"$idxRoot/pq")
        idx.release(); spark.catalog.clearCache()
        val loaded = AnnIndexIO.pqLoad(fresh, s"$idxRoot/pq", embF)
        val got = pairs(SS.pqSearch(loaded, qF, k = 5, rerank = 200))
        loaded.release()
        ("q45_pq", built, got)
      }, {
        val idx = SS.ivfPqBuild(emb, dim = 64)
        val built = pairs(SS.ivfPqSearch(idx, q, k = 5, nprobe = 10, rerank = 192))
        AnnIndexIO.ivfPqSave(idx, s"$idxRoot/ivfpq")
        idx.release(); spark.catalog.clearCache()
        val loaded = AnnIndexIO.ivfPqLoad(fresh, s"$idxRoot/ivfpq", embF)
        val got = pairs(SS.ivfPqSearch(loaded, qF, k = 5, nprobe = 10, rerank = 192))
        loaded.release()
        ("q65_ivfpq", built, got)
      }, {
        val idx = SS.ivfSqBuild(emb, dim = 64)
        val built = pairs(SS.ivfSqSearch(idx, q, k = 5, nprobe = 10, rerank = 192))
        AnnIndexIO.ivfSqSave(idx, s"$idxRoot/ivfsq")
        idx.release(); spark.catalog.clearCache()
        val loaded = AnnIndexIO.ivfSqLoad(fresh, s"$idxRoot/ivfsq", embF)
        val got = pairs(SS.ivfSqSearch(loaded, qF, k = 5, nprobe = 10, rerank = 192))
        loaded.release()
        ("q108_ivfsq", built, got)
      })
    spark.catalog.clearCache()

    // ---- PCA-reduced-space legs: fit k=32 on the corpus, then measure
    // brute-force cosine recall in BOTH the truncated 16-dim and full
    // 32-dim projected spaces (4×/2× less distance arithmetic +
    // broadcast bytes) vs the 64-dim truth — the recorded evidence for
    // the dimensionality-reduction serving path.
    val pcaModel = graft.ops.Pca.fit(emb, k = 32)
    def pcaRecallAt(kDims: Int): Double = {
      val m = graft.ops.Pca.Model(pcaModel.mean,
        pcaModel.components.take(kDims), pcaModel.eigenvalues)
      val projAll = graft.ops.Pca.project(emb, m)
        .select(col("vec_id"),
          transform(col("pc"), x => x.cast("float")).as("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val r = recallOf(
        pairs(SS.bruteForceTopK(projAll.filter(col("vec_id") < 10), projAll, k = 5)),
        truth)
      projAll.unpersist()
      spark.catalog.clearCache()
      r
    }
    val pcaLegs = Seq("pca16_brute" -> pcaRecallAt(16),
      "pca32_brute" -> pcaRecallAt(32))

    val body = (recalls ++ pcaLegs)
      .map { case (n, r) => "\"" + n + "\":" + f"$r%.4f" }
      .mkString("{", ",", "}")
    val loadedBody = roundTrips.map { case (n, _, got) =>
      "\"" + n + "\":" + f"${recallOf(got, truth)}%.4f" }
      .mkString("{", ",", "}")
    val identBody = roundTrips.map { case (n, built, got) =>
      "\"" + n + "\":" + (built == got) }
      .mkString("{", ",", "}")
    spark.stop()
    val ve = {
      val tot = pcaModel.eigenvalues.sum
      (k: Int) => if (tot == 0.0) 0.0 else pcaModel.eigenvalues.take(k).sum / tot
    }
    val storeMid = storeLegs.map { case (n, mid, _) =>
      "\"" + n + "\":" + f"$mid%.4f" }.mkString("{", ",", "}")
    val storePost = storeLegs.map { case (n, _, post) =>
      "\"" + n + "\":" + f"$post%.4f" }.mkString("{", ",", "}")
    println(s"""{"sf":"$sfDir","truth_pairs":${truth.size},"recall":$body,"recall_loaded":$loadedBody,"loaded_identical":$identBody,"recall_store_mid":$storeMid,"recall_store_compacted":$storePost,"pca_var_explained":{"16":${f"${ve(16)}%.4f"},"32":${f"${ve(32)}%.4f"}}}""")
  }
}
