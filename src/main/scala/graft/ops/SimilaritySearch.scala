package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *   - brute-force cosine top-k: broadcast the (small) query set, one
  *     pass over the corpus, per-query top-k — the exact baseline;
  *   - LSH-bucketed (random hyperplane signs): corpus and queries share
  *     sign-pattern buckets with multi-probe (flip one bit), so each
  *     query scores only its bucket neighborhood — the 100 TB path,
  *     where the corpus side stays partitioned by bucket and never
  *     broadcasts or cross-joins.
  */
object SimilaritySearch {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Deterministic pseudo-random projection vectors (seeded). */
  private def planeVectors(dim: Int, planes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** The shared post-scoring tail of every top-k tier: the scoring
    * mapPartitions has already folded per-query bounded top-K
    * accumulators ([[graft.streaming.StoreCommits.TopKMap]]) and
    * drained ≤ partitions·nq·cap survivor rows — a provable superset
    * of each query's global top-cap (fewer than cap distinct neighbors
    * can beat a true member in any one partition). Cross-partition
    * duplicates (an LSH neighbor keyed into several tables, a
    * re-indexed commit) score identically, so max() is the dedup; the
    * window then ranks a survivor relation thousands of times smaller
    * than the pair relation it replaced (the 10⁸-group hash
    * aggregation + per-pair boxed tuples were the measured 130–630 s
    * walls at nq = 10k–50k — see BENCH_NOTES round 15). */
  private def rankTopK(scored: DataFrame, scoreCol: String, k: Int): DataFrame =
    // the shared exchange-bound tail (StoreCommits.rankSurvivors):
    // second-level fold to ≤ nq·k survivors BEFORE one bounded ranking
    // window — at nq=100k × cap=32 × 32 scoring partitions the raw
    // survivors are ~10⁸ rows, and a groupBy-max + window here
    // re-created the very sort/hash-agg the scoring fold removed
    // (thread-dump-verified, BENCH_NOTES round 15)
    graft.streaming.StoreCommits.rankSurvivors(scored, k, scoreCol)

  /** Wrap a drained survivor iterator with the optional exchange-row
    * probe the scale specs assert against: `emitted` counts exactly
    * the rows a scoring partition sends to the exchange (bounded by
    * nq·cap per partition, NEVER per-pair). */
  private def countEmitted(
      out: Iterator[(Long, Long, Double)],
      emitted: Option[org.apache.spark.util.LongAccumulator])
      : Iterator[(Long, Long, Double)] =
    emitted match {
      case Some(a) => out.map { t => a.add(1L); t }
      case None => out
    }

  /** Query-side contract shared by every top-k tier: the query set is
    * collected/broadcast BY DESIGN (this is top-k SERVING — query sets
    * are small by contract), so its size must be bounded or a caller
    * passing a corpus as `queries` OOMs the driver. Enforced, not just
    * documented: limit-collect maxQueries+1 rows and fail on overflow
    * — ONE job serves the bound check and the scoring broadcast. */
  private def collectBounded(
      q: DataFrame, maxQueries: Int, op: String): Array[org.apache.spark.sql.Row] = {
    val rows = q.limit(maxQueries + 1).collect()
    require(rows.length <= maxQueries, boundMessage(maxQueries, op))
    rows
  }

  private def boundMessage(maxQueries: Int, op: String): String =
    s"$op: the query side is collected/broadcast by design (top-k serving) " +
      s"but has more than maxQueries=$maxQueries rows. Raise maxQueries " +
      "deliberately, or don't pass a corpus as `queries` — corpus-scale " +
      "sweeps are the near-dup pair generators' job " +
      "(embeddingNearDupPairs / semanticNearDupPairs)"

  /** Flat plane matrix for `tables` independent hash tables (per-table
    * seeds `seed + 1000003·t`), [(table, plane), dim] layout — the
    * [[graft.functions.VectorExpressions.HyperplaneKeys]] input
    * [[lshTopK]] builds (exposed for the equivalence spec). */
  private[graft] def tablePlanesFlat(
      dim: Int, planes: Int, seed: Long, tables: Int): Seq[Float] =
    (0 until tables).flatMap(t =>
      planeVectors(dim, planes, seed + 1000003L * t).flatMap(_.map(_.toFloat)))

  /** Sign-pattern LSH key: bit b = sign(vec · plane_b). Each dot is one
    * native VectorDot against a literal plane vector — 8 fused loops,
    * not an 8×dim element_at expression tree (which made janino compile
    * time the dominant cost). For many keys at once (multi-table), use
    * the fused [[graft.functions.VectorExpressions.HyperplaneKeys]] —
    * composing dozens of VectorDots in one projection exceeds the JIT
    * bytecode threshold (see lshTopK). */
  def hyperplaneKey(vec: Column, dim: Int, planes: Int, seed: Long): Column = {
    val pvs = planeVectors(dim, planes, seed)
    val bits = pvs.zipWithIndex.map { case (pv, b) =>
      val plane = typedLit[Seq[Float]](pv.map(_.toFloat).toSeq)
      val dot = graft.functions.VectorExpressions.vectorDot(vec, plane)
      when(dot >= 0, shiftleft(lit(1), b)).otherwise(0)
    }
    bits.reduce(_.bitwiseOR(_)).cast("int")
  }

  /** Exact brute-force cosine top-k. `queries` is expected to be small
    * (it is collected + broadcast; maxQueries-gated); the corpus is
    * streamed once in a typed mapPartitions that deserializes each
    * corpus vector ONCE, scores it against every query
    * ([[graft.streaming.StoreCommits.cosineSeq]] — bit-identical to
    * the Dedup.cosine expression this replaced), and folds per-query
    * bounded top-k accumulators in place: no per-pair row is ever
    * allocated or exchanged (the per-pair + window shape measured
    * 130–630 s at nq = 10k–50k on the streams before the same
    * rework). Output: (query_id, neighbor_id, rank, cos) with ids as
    * LONG, rank 1..k, self-matches excluded, ties broken by neighbor
    * id. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxQueries: Int = 100000,
      emitted: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qs: Array[(Long, Array[Float])] = collectBounded(
      queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qvec")),
      maxQueries, "bruteForceTopK")
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qBc = spark.sparkContext.broadcast(qs)
    val scored = graft.streaming.StoreCommits.rebalance(
        corpus.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("cvec")))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val q = qBc.value
        val acc = new graft.streaming.StoreCommits.TopKMap(k)
        it.foreach { case (nid, cvec) =>
          var i = 0
          while (i < q.length) {
            val qid = q(i)._1
            if (qid != nid)
              acc.insert(qid, nid, graft.streaming.StoreCommits.cosineSeq(q(i)._2, cvec))
            i += 1
          }
        }
        countEmitted(acc.drain(), emitted)
      }.toDF("query_id", "neighbor_id", "cos")
    rankTopK(scored, "cos", k)
  }

  /** IVF (inverted-file) ANN top-k: a coarse quantizer assigns every
    * corpus vector to its nearest of `nlist` centroids; each query
    * scores only the vectors in its `nprobe` closest cells. The
    * quantizer fits on a BOUNDED deterministic sample driver-side
    * (same contract as [[pqTopK]]/[[ivfPqTopK]] — a 16-cell model
    * cannot absorb corpus-sized training, and a distributed Lloyd's
    * pays ~2 scheduled jobs per iteration that the problem size can't
    * justify); assignment is one broadcast-centroid pass; the search
    * shuffle is bounded by cell membership, never the corpus square.
    * Deterministic via fixed seed. */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 3, seed: Long = 13L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxQueries: Int = 100000): DataFrame =
    ivfSearch(ivfAssignedIndex(corpus, nlist, seed, idCol, vecCol, persist = false),
      queries, k, nprobe, idCol, vecCol, maxQueries)

  /** A BUILT IVF index: the driver-fit coarse quantizer plus the
    * cell-assigned corpus relation. [[ivfBuild]] persists the
    * assignment so REPEATED query batches amortize the corpus pass —
    * the production serve shape ([[ivfTopK]] is the one-shot
    * composition and does not persist). Call [[IvfIndex.release]]
    * after the last search's results are consumed (same lazy-consumer
    * contract as the `...WithRelease` twins). */
  final class IvfIndex private[ops] (
      private[ops] val centroids: Array[Array[Double]],
      private[ops] val assigned: DataFrame,
      val nlist: Int) {
    /** (cell, members) occupancy — the hot-cell monitor for a built index. */
    def cellSizes: DataFrame =
      assigned.groupBy("cell").agg(count(lit(1)).as("members"))
    def release(): Unit = { assigned.unpersist(blocking = false); () }
  }

  /** Fit + assign, optionally persisting the assignment (the index
    * path persists; the one-shot path keeps the old recompute plan). */
  private def ivfAssignedIndex(
      corpus: DataFrame, nlist: Int, seed: Long,
      idCol: String, vecCol: String, persist: Boolean): IvfIndex = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    // bounded deterministic sample (smallest xxhash64(id) order — a
    // seeded global draw independent of partitioning)
    val sample: Array[Array[Double]] = c
      .orderBy(xxhash64(col("neighbor_id")).asc, col("neighbor_id").asc)
      .limit(20000)
      .select(col("cvec"))
      .collect().map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val centroids = localKMeans(sample, nlist, iters = 10, seed = seed)
    val bc = c.sparkSession.sparkContext.broadcast(centroids)
    val assignCell = udf { (v: Seq[Float]) => nearestCellsOf(bc.value, v, 1).head }
    val assigned0 = c.withColumn("cell", assignCell(col("cvec")))
    val assigned =
      if (persist) assigned0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else assigned0
    new IvfIndex(centroids, assigned, nlist)
  }

  /** Build an IVF index over the corpus: one bounded-sample fit + one
    * assignment pass, persisted for repeated [[ivfSearch]] batches. */
  def ivfBuild(
      corpus: DataFrame, nlist: Int = 16, seed: Long = 13L,
      idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex =
    ivfAssignedIndex(corpus, nlist, seed, idCol, vecCol, persist = true)

  private[graft] def nearestCellsOf(
      cs: Array[Array[Double]], v: Seq[Float], n: Int): Seq[Int] =
    cs.indices.map { i =>
      var d = 0.0; var j = 0
      val cc = cs(i)
      while (j < cc.length) { val t = cc(j) - v(j); d += t * t; j += 1 }
      (i, d)
    }.sortBy(_._2).take(n).map(_._1)

  /** Search a built [[IvfIndex]]: probe each query's `nprobe` nearest
    * cells and score only those members — the corpus-side work is a
    * pass over the (persisted) assignment, never a re-fit. Scoring is
    * CELL-INDEXED (the [[graft.streaming.IvfStream.searchStore]]
    * shape): a broadcast Map[cell → queries probing it] lets each
    * assigned row score only its own cell's queries, folding per-query
    * bounded top-k in place — no per-pair row is materialized,
    * shuffled, or hash-aggregated. Probe selection and cosine
    * arithmetic are bit-identical to the broadcast-join plan this
    * replaced ([[nearestCellsOf]] driver-side ≡ the old udf;
    * cosineSeq ≡ Dedup.cosine), so results are unchanged. */
  def ivfSearch(
      index: IvfIndex, queries: DataFrame, k: Int, nprobe: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxQueries: Int = 100000,
      emitted: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qs: Array[(Long, Array[Float])] = collectBounded(
      queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qvec")),
      maxQueries, "ivfSearch")
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cs = index.centroids
    val byCell: Map[Int, Array[(Long, Array[Float])]] =
      qs.flatMap { case (qid, qv) =>
        nearestCellsOf(cs, qv, nprobe).map(c => (c, (qid, qv)))
      }.groupBy(_._1).map { case (c, arr) => c -> arr.map(_._2) }
    val qBc = spark.sparkContext.broadcast(byCell)
    val scored = graft.streaming.StoreCommits.rebalance(
        index.assigned.select(col("neighbor_id").cast("long"), col("cell"), col("cvec")))
      .as[(Long, Int, Array[Float])]
      .mapPartitions { it =>
        val qc = qBc.value
        val none = Array.empty[(Long, Array[Float])]
        val acc = new graft.streaming.StoreCommits.TopKMap(k)
        it.foreach { case (nid, cell, cvec) =>
          val entries = qc.getOrElse(cell, none)
          var i = 0
          while (i < entries.length) {
            val qid = entries(i)._1
            if (qid != nid)
              acc.insert(qid, nid, graft.streaming.StoreCommits.cosineSeq(entries(i)._2, cvec))
            i += 1
          }
        }
        countEmitted(acc.drain(), emitted)
      }.toDF("query_id", "neighbor_id", "cos")
    rankTopK(scored, "cos", k)
  }

  /** SemDeDup-style semantic near-dup sweep (Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embedding space, then
    * compare vectors ONLY within their cluster and emit pairs at
    * cosine ≥ `minCos`, each labelled for keep-lowest-id dedup.
    *
    * This is the embedding analog of LSH blocking: the O(n²) cosine
    * sweep becomes Σ O(|cell|²) with cells sized by `nlist`, and the
    * pair join shuffles on the cell id, never cross-cluster. Returned
    * pairs are EXACT cosines (precision 1 by construction); recall is
    * bounded by cluster purity — near-dups straddling a k-means
    * boundary are missed, the documented SemDeDup trade (its published
    * recipe accepts it for the ~n²/nlist cost cut). Feed the pairs to
    * [[ConnectedComponents]] + keep-min for the deduped corpus.
    *
    * Scale: the quantizer fits on a bounded deterministic sample
    * driver-side ([[coarseAssign]], shared with [[cellSizes]]);
    * assignment is one broadcast-centroid pass; the
    * within-cell self-join is the same bucket-local pair shape as
    * [[Dedup.lshCandidatePairs]]. Skewed cells (a mode collapse in the
    * embedding space) are observable via `cellSizes` before the join
    * runs — and `cellCap` is ENFORCED BY DEFAULT (100k; the
    * module-wide hot-bucket contract shared with [[Dedup.simhashPairs]]
    * and [[Dedup.embeddingNearDupPairs]]): cells past the cap are
    * excluded from the |cell|² join instead of silently dominating the
    * sweep. THIS IS A RECALL-AFFECTING DROP vs SemDeDup's published
    * full-recall-within-cells recipe — pairs wholly inside a dropped
    * cell are not emitted; pass `Int.MaxValue` to restore it on a
    * bounded corpus. Not silent: `onDrop` (when non-null) receives
    * (cells, members) dropped before the join runs (wire it to
    * [[graft.streaming.MetricsSink.dropHook]]), and
    * `cellSizes(...).filter($"n" > cap)` reports exactly the dropped
    * cells at the same (nlist, seed). */
  def semanticNearDupPairs(
      emb: DataFrame, minCos: Double,
      nlist: Int = 16, seed: Long = 13L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cellCap: Int = 100000,
      onDrop: (Long, Long) => Unit = null): DataFrame =
    semanticNearDupPairsWithRelease(
      emb, minCos, nlist, seed, idCol, vecCol, cellCap, onDrop)._1

  /** [[semanticNearDupPairs]] plus an explicit RELEASE HANDLE for the
    * assignment relation it persists — same contract as
    * [[graft.ops.Dedup.simhashPairsWithRelease]]: call the handle only
    * AFTER the result is consumed. The persist makes the drop
    * accounting (always computed — it feeds both the WARN log and
    * `onDrop`) and the a/b self-join read ONE materialized assignment
    * instead of re-running the sample fit + centroid pass per
    * consumer. */
  def semanticNearDupPairsWithRelease(
      emb: DataFrame, minCos: Double,
      nlist: Int = 16, seed: Long = 13L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      cellCap: Int = 100000,
      onDrop: (Long, Long) => Unit = null): (DataFrame, () => Unit) = {
    val assigned0 = coarseAssign(emb, nlist, seed, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ≤ nlist rows by construction — ONE collect serves the cold
    // filter, the recall warning, and the onDrop metric (no second
    // assignment pass when metrics are wired)
    val sizeRows = assigned0.groupBy("cell").agg(count(lit(1)).as("n")).collect()
    val hot = sizeRows.filter(_.getLong(1) > cellCap)
    val (dropCells, dropMembers) = (hot.length.toLong, hot.map(_.getLong(1)).sum)
    if (dropCells > 0)
      log.warn(s"semanticNearDupPairs: cellCap=$cellCap drops $dropCells " +
        s"cells / $dropMembers members from the pair sweep (recall-affecting; " +
        "inspect cellSizes, raise cellCap, or pass Int.MaxValue for full recall)")
    if (onDrop != null) onDrop(dropCells, dropMembers)
    val coldCells = sizeRows.filter(_.getLong(1) <= cellCap).map(_.getInt(0)).toSeq
    val assigned = assigned0.filter(col("cell").isin(coldCells: _*))
    val a = assigned.select(col("cell"), col("id").as("id1"), col("vec").as("v1"))
    val b = assigned.select(col("cell"), col("id").as("id2"), col("vec").as("v2"))
    val pairs = a.join(b, Seq("cell"))
      .filter(col("id1") < col("id2"))
      .withColumn("cos", Dedup.cosine(col("v1"), col("v2")))
      .filter(col("cos") >= minCos)
      .select(col("id1"), col("id2"), col("cos"))
    (pairs, () => { assigned0.unpersist(blocking = false); () })
  }

  /** Cluster-size monitor for [[semanticNearDupPairs]]: (cell, n) rows
    * — at 100 TB, check the largest cell BEFORE paying its |cell|²
    * join (same no-silent-hotspot contract as Dedup.hotBuckets).
    * Shares [[coarseAssign]] with the sweep, so at the same
    * (nlist, seed) it reports exactly the cells the sweep uses. */
  def cellSizes(
      emb: DataFrame, nlist: Int = 16, seed: Long = 13L,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame =
    coarseAssign(emb, nlist, seed, idCol, vecCol)
      .groupBy("cell").agg(count(lit(1)).as("n"))

  /** The SemDeDup family's shared coarse quantizer: bounded
    * deterministic 20k sample (smallest xxhash64(id) order — a seeded
    * global draw independent of partitioning) trains a driver-local
    * Lloyd's (an nlist-cell model cannot absorb corpus-sized training,
    * and a distributed fit pays ~2 scheduled jobs per iteration — the
    * same argument as the PQ codebooks); assignment is one
    * broadcast-centroid pass. Returns (id, vec, cell). */
  private def coarseAssign(
      emb: DataFrame, nlist: Int, seed: Long,
      idCol: String, vecCol: String): DataFrame = {
    val spark = emb.sparkSession
    val c = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val sample: Array[Array[Double]] = c
      .orderBy(xxhash64(col("id")).asc, col("id").asc)
      .limit(20000)
      .select(col("vec"))
      .collect().map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val centroids = localKMeans(sample, nlist, iters = 10, seed = seed)
    val bc = spark.sparkContext.broadcast(centroids)
    val assign = udf { (v: Seq[Float]) =>
      val cs = bc.value
      var best = 0; var bd = Double.MaxValue; var ci = 0
      while (ci < cs.length) {
        var d = 0.0; var j = 0
        val cc = cs(ci)
        while (j < cc.length) { val t = cc(j) - v(j); d += t * t; j += 1 }
        if (d < bd) { bd = d; best = ci }
        ci += 1
      }
      best
    }
    c.withColumn("cell", assign(col("vec")))
  }

  /** Product-quantization ANN top-k (the IVF-PQ compressed-codes path):
    * vectors are L2-normalized, split into `m` subspaces, each subspace
    * k-means-quantized to 16 centroids (4 bits), so a corpus vector
    * compresses to `m` bytes. Search scores codes against a per-query
    * ADC (asymmetric distance computation) lookup table — `m` array
    * reads per corpus row instead of a `dim`-length dot product.
    *
    * Scale shape: the codebook is m×16 small centroids (broadcast); the
    * encoded corpus is ~dim×4/m smaller than the raw vectors (16× at
    * m=dim/4), which is the point — at 10⁹ vectors the CODES fit where
    * the floats cannot. Encode and scoring run in `mapPartitions` with
    * the broadcast codebook/tables: per-row argmin over 16 centroids is
    * imperative inner-loop work, the documented last-resort tier.
    * Deterministic via fixed seed; recall is spec-gated vs brute force
    * (approximation error is inherent to PQ).
    *
    * `rerank` > 0 enables the standard two-stage search: ADC produces a
    * shortlist of `rerank` candidates per query (cheap, code-domain),
    * which are then re-scored against their RAW vectors (exact cosine)
    * — quantization cannot preserve ordering among near-equal
    * neighbors, so production IVF-PQ always re-ranks; the extra cost is
    * a join bounded by queries × rerank, never corpus-sized. */
  /** A BUILT PQ index: the driver-fit codebook plus the byte-code
    * relation. [[pqBuild]] persists the codes (m bytes per vector —
    * the compressed representation IS the cacheable asset) so repeated
    * [[pqSearch]] batches amortize the encode pass; [[pqTopK]] is the
    * one-shot composition and does not persist. Re-rank reads raw
    * vectors back from the retained corpus reference — a
    * shortlist-sized join, never a corpus re-scan. */
  final class PqIndex private[ops] (
      private[ops] val codebook: Array[Array[Array[Double]]],
      private[ops] val encoded: DataFrame,
      private[ops] val corpus: DataFrame,
      private[ops] val idCol: String,
      private[ops] val vecCol: String,
      val m: Int, val dim: Int) {
    def release(): Unit = { encoded.unpersist(blocking = false); () }
  }

  /** Build a PQ index: bounded-sample codebook fit + one encode pass,
    * codes persisted for repeated [[pqSearch]] batches. */
  def pqBuild(
      corpus: DataFrame, dim: Int, m: Int = 8, seed: Long = 29L,
      idCol: String = "vec_id", vecCol: String = "embedding"): PqIndex =
    pqEncodedIndex(corpus, dim, m, seed, idCol, vecCol, persist = true)

  def pqTopK(
      queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
      m: Int = 8, seed: Long = 29L, rerank: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxQueries: Int = 100000): DataFrame =
    pqSearch(pqEncodedIndex(corpus, dim, m, seed, idCol, vecCol, persist = false),
      queries, k, rerank, maxQueries)

  private def unitUdf = udf { (v: Seq[Float]) =>
    var s = 0.0
    v.foreach(x => s += x.toDouble * x)
    val inv = if (s == 0) 0.0 else 1.0 / math.sqrt(s)
    v.map(x => (x * inv).toFloat)
  }

  private def pqEncodedIndex(
      corpus: DataFrame, dim: Int, m: Int, seed: Long,
      idCol: String, vecCol: String, persist: Boolean): PqIndex = {
    require(dim % m == 0, "m must divide dim")
    val spark = corpus.sparkSession
    import spark.implicits._
    val sub = dim / m
    val nCentroids = 16

    val unit = unitUdf
    // the ONE-SHOT path does not cache: the corpus is scanned exactly
    // twice (bounded sample draw, then the encode pass) and a pinned
    // full-corpus float cache is exactly what the compressed-codes
    // path exists to avoid. The BUILD path persists only the m-byte
    // codes — the compressed asset, not the floats.
    val c = corpus.select(col(idCol).as("nid"), unit(col(vecCol)).as("v"))

    // codebook fit on a BOUNDED sample: PQ codebooks are always trained
    // on ~10-40k points regardless of corpus size (a 16-centroid
    // quantizer cannot absorb more) — at 10⁹ vectors a full-corpus
    // iterative fit is wasted work, and at any scale m MLlib KMeans
    // runs pay a scheduling floor the problem size can't justify. The
    // sample is deterministic (smallest xxhash64(id) order — a seeded
    // global draw independent of partitioning), collects to the driver
    // (trainSample × dim floats ≈ 5 MB at the defaults), and the m
    // subspace Lloyd's runs cost milliseconds locally.
    val trainSample = 20000
    val sample: Array[Array[Float]] = c
      .orderBy(xxhash64(col("nid")).asc, col("nid").asc)
      .limit(trainSample)
      .select(col("v"))
      .collect().map(_.getSeq[Float](0).toArray)
    val codebook: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      val pts = sample.map(v => Array.tabulate(sub)(t => v(j * sub + t).toDouble))
      localKMeans(pts, nCentroids, iters = 12, seed = seed + j)
    }
    // both broadcasts are bounded-small by construction: the codebook is
    // m × ≤16 sub-vectors, the query side is the (small) query set —
    // same contract as bruteForceTopK's broadcast
    val bc = spark.sparkContext.broadcast(codebook)

    // encode: corpus vector -> m byte codes (argmin centroid / subspace)
    val encoded = c.mapPartitions { it =>
      val cb = bc.value
      it.map { r =>
        val id = r.getLong(0)
        val v = r.getSeq[Float](1)
        val codes = Array.tabulate(m) { j =>
          var best = 0; var bestD = Double.MaxValue
          var ci = 0
          while (ci < cb(j).length) {
            var d = 0.0; var t = 0
            while (t < sub) {
              val diff = v(j * sub + t) - cb(j)(ci)(t); d += diff * diff; t += 1
            }
            if (d < bestD) { bestD = d; best = ci }
            ci += 1
          }
          best.toByte
        }
        (id, codes)
      }
    }.toDF("nid", "codes")
    val kept =
      if (persist) encoded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else encoded
    new PqIndex(codebook, kept, corpus, idCol, vecCol, m, dim)
  }

  /** Search a built [[PqIndex]]: per-query ADC tables over the
    * (persisted) byte codes, optional exact re-rank over the
    * shortlist's raw vectors — never a re-fit or re-encode. */
  def pqSearch(
      index: PqIndex, queries: DataFrame, k: Int, rerank: Int = 0,
      maxQueries: Int = 100000,
      emitted: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val m = index.m
    val sub = index.dim / m
    val idCol = index.idCol
    val vecCol = index.vecCol
    val unit = unitUdf
    // per-query ADC table (m × 16 inner products), built ONCE on the
    // driver (parallel over queries) and broadcast — dim-independent
    // bytes (~1.5 KB/query) instead of raw dim-scaled query vectors,
    // and no per-partition table rebuild (nq × m × 16 × sub work per
    // partition at the 100k bound). table(j)(c) = <q_subj, centroid_jc>:
    // sum over j approximates <q, v>. Sized by the ACTUAL centroid
    // count per subspace — KMeans may return fewer than k centers on
    // degenerate data, and the encode pass guards the same way.
    // The collect doubles as the maxQueries bound check (one job).
    val qs = collectBounded(
      queries.select(col(idCol).as("query_id"), unit(col(vecCol)).as("qv")),
      maxQueries, "pqSearch")
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cbLocal = index.codebook
    val qts: Array[(Long, Array[Array[Double]])] = {
      import scala.collection.parallel.CollectionConverters._
      qs.par.map { case (qid, qv) =>
        val table = Array.tabulate(m) { j =>
          Array.tabulate(cbLocal(j).length) { ci =>
            var s = 0.0; var t = 0
            while (t < sub) { s += qv(j * sub + t) * cbLocal(j)(ci)(t); t += 1 }
            s
          }
        }
        (qid, table)
      }.toArray
    }
    // tables flattened to one Array[Double] per query at stride 16
    // (codes are 4-bit, ≤ 16 centroids per subspace): flat((j<<4)|code)
    // is one dereference instead of two pointer chases per subspace
    val qtsFlat: Array[(Long, Array[Double])] = qts.map { case (qid, table) =>
      val flat = new Array[Double](m * 16)
      var j = 0
      while (j < m) {
        var ci = 0
        while (ci < table(j).length) { flat((j << 4) | ci) = table(j)(ci); ci += 1 }
        j += 1
      }
      (qid, flat)
    }
    val qBc = spark.sparkContext.broadcast(qtsFlat)
    // bounded top-cap fold INSIDE the ADC loop (StoreCommits.TopKMap):
    // no per-pair tuple allocates and only ≤ nq·cap survivors per
    // partition reach the exchange — the cap is the re-rank shortlist
    // depth, so stage 2 sees exactly the rows the old window kept
    val cap = if (rerank <= 0) k else math.max(rerank, k)
    val scored = graft.streaming.StoreCommits.rebalance(index.encoded.toDF())
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val qt = qBc.value
        // QUERY-OUTER scoring over the partition's buffered codes: each
        // query's 1 KB flat table stays in L1 while the code bytes
        // stream sequentially, and its TopK accumulator is hoisted out
        // of the row loop. The row-outer shape touched nq tables per
        // row (~100 MB of tables at the 100k-query bound) and was
        // measured cache-bound, not arithmetic-bound. Buffering costs
        // m B + 8 B per row — size scoring partitions accordingly
        // (rebalance keeps them at corpus/parallelism rows).
        val idsB = scala.collection.mutable.ArrayBuilder.make[Long]
        val codeB = new java.io.ByteArrayOutputStream()
        it.foreach { case (nid, c) => idsB += nid; codeB.write(c, 0, m) }
        val ids = idsB.result()
        val cs = codeB.toByteArray
        val nRows = ids.length
        val acc = new graft.streaming.StoreCommits.TopKMap(cap)
        var qi = 0
        while (qi < qt.length) {
          val qid = qt(qi)._1
          val flat = qt(qi)._2
          val tk = acc.accFor(qid)
          var r = 0
          while (r < nRows) {
            val nid = ids(r)
            if (qid != nid) {
              val base = r * m
              var s = 0.0; var j = 0
              while (j < m) { s += flat((j << 4) | (cs(base + j) & 0xff)); j += 1 }
              tk.insert(nid, s)
            }
            r += 1
          }
          qi += 1
        }
        countEmitted(acc.drain(), emitted)
      }.toDF("query_id", "neighbor_id", "adc")
    if (rerank <= 0) {
      rankTopK(scored, "adc", k)
    } else {
      // stage 2: exact cosine over the ADC shortlist's raw vectors
      val shortlist = rankTopK(scored, "adc", cap)
        .select("query_id", "neighbor_id")
      val qRaw = queries.select(
        col(idCol).cast("long").as("query_id"), col(vecCol).as("qvec"))
      val exact = shortlist
        .join(index.corpus.select(
          col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("cvec")),
          "neighbor_id")
        .join(broadcast(qRaw), "query_id")
        .withColumn("cos", Dedup.cosine(col("qvec"), col("cvec")))
      // unique (query, neighbor) pairs by construction, so the shared
      // fold-ranked tail IS the ranking window it replaces — one
      // exchange, no sort (optimization round 17)
      graft.streaming.StoreCommits.rankSurvivors(
        exact.select(col("query_id"), col("neighbor_id"), col("cos")), k, "cos")
    }
  }

  /** IVF-PQ fused ANN top-k — the production large-index layout
    * (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
    * Search", §IV): a coarse quantizer splits the corpus into `nlist`
    * inverted lists, and each vector stores only its cell id + the PQ
    * codes of its RESIDUAL (v − cell centroid). Search probes the
    * `nprobe` nearest cells and scores codes against per-query ADC
    * tables, with `⟨q, v⟩ ≈ ⟨q, c_cell⟩ + ⟨q, residual⟩` — the cell
    * term exact, the residual term from the code tables. Residual
    * quantization is the point of the fusion: residuals are small and
    * centered, so 16-centroid sub-quantizers spend their precision
    * where the coarse quantizer left error.
    *
    * Scale shape: both quantizers fit on the same bounded
    * deterministic 20k sample (driver-local Lloyd's — a cell/codebook
    * model cannot absorb corpus-sized training); one corpus pass
    * assigns + encodes (`mapPartitions`, broadcast models); search
    * touches only rows whose cell is probed by some query (the
    * inverted-list prune — a filter on the code relation, never a
    * corpus-wide score). Exact re-rank over the `rerank`-deep ADC
    * shortlist restores ordering among near-equal neighbors. Rows-only
    * + recall-spec-gated like the other approximate ANN tiers. */
  def ivfPqTopK(
      queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
      nlist: Int = 16, nprobe: Int = 4, m: Int = 8, seed: Long = 37L,
      rerank: Int = 32,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxQueries: Int = 100000): DataFrame =
    ivfPqSearch(
      ivfPqEncodedIndex(corpus, dim, nlist, m, seed, idCol, vecCol, persist = false),
      queries, k, nprobe, rerank, maxQueries)

  /** A BUILT IVF-PQ index: both driver-fit quantizers plus the
    * (cell, residual-codes) relation — the production large-index
    * asset. [[ivfPqBuild]] persists the codes (4-byte cell + m bytes
    * per vector) so repeated [[ivfPqSearch]] batches amortize the
    * assign+encode pass; [[ivfPqTopK]] is the one-shot composition. */
  final class IvfPqIndex private[ops] (
      private[ops] val coarse: Array[Array[Double]],
      private[ops] val codebook: Array[Array[Array[Double]]],
      private[ops] val encoded: DataFrame,
      private[ops] val corpus: DataFrame,
      private[ops] val idCol: String,
      private[ops] val vecCol: String,
      val nlist: Int, val m: Int, val dim: Int) {
    /** (cell, members) occupancy over the inverted lists. */
    def cellSizes: DataFrame =
      encoded.groupBy("cell").agg(count(lit(1)).as("members"))
    def release(): Unit = { encoded.unpersist(blocking = false); () }
  }

  /** Build an IVF-PQ index: one bounded-sample dual-quantizer fit +
    * one assign+encode corpus pass, codes persisted for repeated
    * [[ivfPqSearch]] batches. */
  def ivfPqBuild(
      corpus: DataFrame, dim: Int,
      nlist: Int = 16, m: Int = 8, seed: Long = 37L,
      idCol: String = "vec_id", vecCol: String = "embedding"): IvfPqIndex =
    ivfPqEncodedIndex(corpus, dim, nlist, m, seed, idCol, vecCol, persist = true)

  private def ivfPqEncodedIndex(
      corpus: DataFrame, dim: Int, nlist: Int, m: Int, seed: Long,
      idCol: String, vecCol: String, persist: Boolean): IvfPqIndex = {
    require(dim % m == 0, "m must divide dim")
    val spark = corpus.sparkSession
    import spark.implicits._
    val sub = dim / m
    val unit = unitUdf
    val c = corpus.select(col(idCol).as("nid"), unit(col(vecCol)).as("v"))

    // bounded deterministic sample (same contract as pqTopK) trains
    // BOTH quantizers; residuals are derived sample-locally
    val sample: Array[Array[Double]] = c
      .orderBy(xxhash64(col("nid")).asc, col("nid").asc)
      .limit(20000)
      .select(col("v"))
      .collect().map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val coarse = localKMeans(sample, nlist, iters = 12, seed = seed)
    def nearestCell(cs: Array[Array[Double]], v: Array[Double]): Int = {
      var best = 0; var bd = Double.MaxValue; var ci = 0
      while (ci < cs.length) {
        var d = 0.0; var t = 0
        while (t < v.length) { val df = v(t) - cs(ci)(t); d += df * df; t += 1 }
        if (d < bd) { bd = d; best = ci }
        ci += 1
      }
      best
    }
    val residuals = sample.map { v =>
      val cc = coarse(nearestCell(coarse, v))
      Array.tabulate(dim)(t => v(t) - cc(t))
    }
    val codebook: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      localKMeans(residuals.map(r => java.util.Arrays.copyOfRange(r, j * sub, (j + 1) * sub)),
        16, iters = 12, seed = seed + 1 + j)
    }
    val coarseBc = spark.sparkContext.broadcast(coarse)
    val cbBc = spark.sparkContext.broadcast(codebook)

    // ONE corpus pass: coarse-assign, residual-encode
    val encoded = c.mapPartitions { it =>
      val cs = coarseBc.value
      val cb = cbBc.value
      it.map { r =>
        val id = r.getLong(0)
        val vf = r.getSeq[Float](1)
        val v = Array.tabulate(vf.length)(vf(_).toDouble)
        val cell = nearestCell(cs, v)
        val cc = cs(cell)
        val codes = Array.tabulate(m) { j =>
          var best = 0; var bestD = Double.MaxValue
          var ci = 0
          while (ci < cb(j).length) {
            var d = 0.0; var t = 0
            while (t < sub) {
              val diff = (v(j * sub + t) - cc(j * sub + t)) - cb(j)(ci)(t)
              d += diff * diff; t += 1
            }
            if (d < bestD) { bestD = d; best = ci }
            ci += 1
          }
          best.toByte
        }
        (id, cell, codes)
      }
    }.toDF("nid", "cell", "codes")
    val kept =
      if (persist) encoded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else encoded
    new IvfPqIndex(coarse, codebook, kept, corpus, idCol, vecCol, nlist, m, dim)
  }

  /** The per-cell query index for an ADC pass: for each query, the
    * `nprobe` nearest coarse cells, and under each probed cell the
    * `(query_id, ⟨q, c_cell⟩, residual ADC table)` triple. Built ONCE
    * on the driver (parallel over queries; bounded by maxQueries) and
    * broadcast, so:
    *   - each stored row touches ONLY the queries probing ITS cell —
    *     per-row work is O(queries-probing-cell) ≈ nq·nprobe/nlist,
    *     not O(nq) (at the 100k-query bound against millions of
    *     probed-cell rows, the difference between ~10¹¹ inner
    *     iterations and ~10¹⁰/nlist — the wall-clock scale-killer);
    *   - the broadcast bytes are DIM-INDEPENDENT (~1.5 KB/query of
    *     table + one double per probed cell), never the raw query
    *     vectors whose bytes scale with dim (100k × dim 768 ≈ 600 MB).
    * The m×≤16 table is shared by reference across a query's nprobe
    * entries (Java serialization preserves identity in one graph).
    * Probe selection (by-distance sort, index-stable ties) and all
    * arithmetic orders match the previous per-partition build exactly,
    * so scores are bit-identical. */
  private[graft] def adcByCell(
      qs: Array[(Long, Array[Double])],
      coarse: Array[Array[Double]],
      codebook: Array[Array[Array[Double]]],
      nprobe: Int): Map[Int, Array[(Long, Double, Array[Array[Double]])]] = {
    import scala.collection.parallel.CollectionConverters._
    val dim = if (coarse.nonEmpty) coarse(0).length else 0
    val m = codebook.length
    val sub = if (m > 0) dim / m else 0
    val perQuery: Array[Array[(Int, (Long, Double, Array[Array[Double]]))]] =
      qs.par.map { case (qid, qv) =>
        val dots = new Array[Double](coarse.length)
        val dists = new Array[Double](coarse.length)
        var ci = 0
        while (ci < coarse.length) {
          val cc = coarse(ci)
          var dot = 0.0; var t = 0
          while (t < dim) { dot += qv(t) * cc(t); t += 1 }
          var dist = 0.0; t = 0
          while (t < dim) { val df = qv(t) - cc(t); dist += df * df; t += 1 }
          dots(ci) = dot; dists(ci) = dist; ci += 1
        }
        val table = Array.tabulate(m) { j =>
          Array.tabulate(codebook(j).length) { w =>
            var s = 0.0; var t = 0
            while (t < sub) { s += qv(j * sub + t) * codebook(j)(w)(t); t += 1 }
            s
          }
        }
        coarse.indices.sortBy(ci => dists(ci)).take(nprobe)
          .map(c => (c, (qid, dots(c), table))).toArray
      }.toArray
    perQuery.flatten.groupBy(_._1).map { case (c, arr) => c -> arr.map(_._2) }
  }

  /** Search a built [[IvfPqIndex]]: probed-cell ADC over the
    * (persisted) code relation + exact re-rank — never a re-fit or
    * re-encode. The broadcast query state is CELL-INDEXED
    * ([[adcByCell]]): a code row iterates only the queries probing its
    * cell. `touches`, when supplied, counts exactly those per-row
    * query visits — the complexity probe the specs assert against. */
  def ivfPqSearch(
      index: IvfPqIndex, queries: DataFrame, k: Int,
      nprobe: Int = 4, rerank: Int = 32,
      maxQueries: Int = 100000,
      touches: Option[org.apache.spark.util.LongAccumulator] = None,
      emitted: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val m = index.m
    val idCol = index.idCol
    val vecCol = index.vecCol
    val unit = unitUdf
    // collect doubles as the maxQueries bound check (one job)
    val qs = collectBounded(
      queries.select(col(idCol).cast("long").as("query_id"), unit(col(vecCol)).as("qv")),
      maxQueries, "ivfPqSearch")
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    val qBc = spark.sparkContext.broadcast(
      adcByCell(qs, index.coarse, index.codebook, nprobe))
    // bounded top-cap fold inside the ADC loop (the IvfPqStream
    // searchStore shape, StoreCommits.TopKMap): only ≤ nq·cap
    // survivors per partition reach the exchange — never the
    // candidate-proportional pair relation
    val cap = math.max(rerank, k)
    val scored = graft.streaming.StoreCommits.rebalance(index.encoded.toDF())
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { it =>
        val qc = qBc.value
        val none = Array.empty[(Long, Double, Array[Array[Double]])]
        val acc = new graft.streaming.StoreCommits.TopKMap(cap)
        it.foreach { case (nid, cell, codes) =>
          val entries = qc.getOrElse(cell, none)
          touches.foreach(_.add(entries.length))
          var i = 0
          while (i < entries.length) {
            val (qid, cellDot, table) = entries(i)
            if (qid != nid) {
              var s = cellDot; var j = 0
              while (j < m) { s += table(j)(codes(j) & 0xff); j += 1 }
              acc.insert(qid, nid, s)
            }
            i += 1
          }
        }
        countEmitted(acc.drain(), emitted)
      }.toDF("query_id", "neighbor_id", "adc")

    // ADC shortlist → exact cosine re-rank (standard two-stage search)
    val shortlist = rankTopK(scored, "adc", cap)
      .select("query_id", "neighbor_id")
    val qRaw = queries.select(
      col(idCol).cast("long").as("query_id"), col(vecCol).as("qvec"))
    val exact = shortlist
      .join(index.corpus.select(
        col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("cvec")),
        "neighbor_id")
      .join(broadcast(qRaw), "query_id")
      .withColumn("cos", Dedup.cosine(col("qvec"), col("cvec")))
    // unique (query, neighbor) pairs by construction — the shared
    // fold-ranked tail replaces the window: one exchange, no sort
    graft.streaming.StoreCommits.rankSurvivors(
      exact.select(col("query_id"), col("neighbor_id"), col("cos")), k, "cos")
  }

  /** IVF-SQ8 fused ANN top-k — the scalar-quantized middle rung of the
    * compression ladder (FAISS's `IVF,SQ8` layout; Jégou et al. 2011
    * §III discusses the scalar-quantization baseline PQ improves on):
    * a coarse quantizer splits the corpus into `nlist` inverted lists
    * and each vector stores its cell id + its RESIDUAL quantized to
    * one byte per dimension against per-dimension trained bounds.
    * 4× smaller than raw float32 (dim bytes vs 4·dim) at near-exact
    * recall — the tier between IVF-flat (exact vectors, no memory cut)
    * and IVF-PQ (m bytes total, aggressive cut, re-rank-dependent
    * recall). One-shot composition; [[ivfSqBuild]]+[[ivfSqSearch]] is
    * the amortized index path. */
  def ivfSqTopK(
      queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 41L,
      rerank: Int = 32,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxQueries: Int = 100000): DataFrame =
    ivfSqSearch(
      ivfSqEncodedIndex(corpus, dim, nlist, seed, idCol, vecCol, persist = false),
      queries, k, nprobe, rerank, maxQueries)

  /** A BUILT IVF-SQ8 index: the coarse quantizer, the per-dimension
    * residual bounds, and the (cell, byte-codes) relation — dim bytes
    * per vector where the raw corpus stores 4·dim. [[ivfSqBuild]]
    * persists the codes so repeated [[ivfSqSearch]] batches amortize
    * the assign+encode pass. */
  final class IvfSqIndex private[ops] (
      private[ops] val coarse: Array[Array[Double]],
      private[ops] val vmin: Array[Double],
      private[ops] val vstep: Array[Double],
      private[ops] val encoded: DataFrame,
      private[ops] val corpus: DataFrame,
      private[ops] val idCol: String,
      private[ops] val vecCol: String,
      val nlist: Int, val dim: Int) {
    /** (cell, members) occupancy over the inverted lists. */
    def cellSizes: DataFrame =
      encoded.groupBy("cell").agg(count(lit(1)).as("members"))
    def release(): Unit = { encoded.unpersist(blocking = false); () }
  }

  /** Build an IVF-SQ8 index: one bounded-sample fit (coarse centroids
    * + per-dim residual bounds) + one assign+encode corpus pass, codes
    * persisted for repeated [[ivfSqSearch]] batches. */
  def ivfSqBuild(
      corpus: DataFrame, dim: Int, nlist: Int = 16, seed: Long = 41L,
      idCol: String = "vec_id", vecCol: String = "embedding"): IvfSqIndex =
    ivfSqEncodedIndex(corpus, dim, nlist, seed, idCol, vecCol, persist = true)

  private def ivfSqEncodedIndex(
      corpus: DataFrame, dim: Int, nlist: Int, seed: Long,
      idCol: String, vecCol: String, persist: Boolean): IvfSqIndex = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val unit = unitUdf
    val c = corpus.select(col(idCol).as("nid"), unit(col(vecCol)).as("v"))

    // bounded deterministic sample (same contract as the PQ tiers)
    // trains the coarse quantizer AND the per-dim residual bounds;
    // out-of-sample residuals clamp into the trained range at encode
    // (the standard trained-scalar-quantizer contract) and the exact
    // re-rank absorbs the tail error
    val sample: Array[Array[Double]] = c
      .orderBy(xxhash64(col("nid")).asc, col("nid").asc)
      .limit(20000)
      .select(col("v"))
      .collect().map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val coarse = localKMeans(sample, nlist, iters = 12, seed = seed)
    def nearestCell(cs: Array[Array[Double]], v: Array[Double]): Int = {
      var best = 0; var bd = Double.MaxValue; var ci = 0
      while (ci < cs.length) {
        var d = 0.0; var t = 0
        while (t < v.length) { val df = v(t) - cs(ci)(t); d += df * df; t += 1 }
        if (d < bd) { bd = d; best = ci }
        ci += 1
      }
      best
    }
    val vmin = Array.fill(dim)(Double.MaxValue)
    val vmax = Array.fill(dim)(Double.MinValue)
    sample.foreach { v =>
      val cc = coarse(nearestCell(coarse, v))
      var t = 0
      while (t < dim) {
        val r = v(t) - cc(t)
        if (r < vmin(t)) vmin(t) = r
        if (r > vmax(t)) vmax(t) = r
        t += 1
      }
    }
    // 255 steps across the trained range; a degenerate dimension
    // (constant residual) gets step 0 and decodes to exactly vmin
    val vstep = Array.tabulate(dim)(t => (vmax(t) - vmin(t)) / 255.0)
    val coarseBc = spark.sparkContext.broadcast(coarse)
    val minBc = spark.sparkContext.broadcast(vmin)
    val stepBc = spark.sparkContext.broadcast(vstep)

    // ONE corpus pass: coarse-assign, residual scalar-encode
    val encoded = c.mapPartitions { it =>
      val cs = coarseBc.value
      val mn = minBc.value
      val st = stepBc.value
      it.map { r =>
        val id = r.getLong(0)
        val vf = r.getSeq[Float](1)
        val v = Array.tabulate(vf.length)(vf(_).toDouble)
        val cell = nearestCell(cs, v)
        val cc = cs(cell)
        val code = new Array[Byte](mn.length)
        var t = 0
        while (t < mn.length) {
          val q =
            if (st(t) == 0.0) 0
            else {
              val raw = math.round((v(t) - cc(t) - mn(t)) / st(t)).toInt
              if (raw < 0) 0 else if (raw > 255) 255 else raw
            }
          code(t) = q.toByte
          t += 1
        }
        (id, cell, code)
      }
    }.toDF("nid", "cell", "code")
    val kept =
      if (persist) encoded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else encoded
    new IvfSqIndex(coarse, vmin, vstep, kept, corpus, idCol, vecCol, nlist, dim)
  }

  /** The per-cell query index for a scalar-quantized scoring pass:
    * under each probed cell, `(query_id, base, s1)` where
    * `base = ⟨q, c_cell⟩ + ⟨q, vmin⟩` folds every code-independent
    * term and `s1(d) = q(d) · step(d)` prices one code unit in
    * dimension d — so a stored row scores as
    * `⟨q, v̂⟩ = base + Σ_d code(d) · s1(d)` with one multiply-add per
    * dimension and no per-row decode buffer. `s1` is shared BY
    * REFERENCE across a query's nprobe entries (broadcast
    * serialization preserves identity in one graph), so broadcast
    * bytes are ~8·dim + 16 per query entry — the same dim-scaled class
    * as [[ivfSearch]]'s raw query vectors, unlike the dim-independent
    * ADC tables (SQ8 keeps per-dimension resolution; that is its
    * recall advantage over PQ and its broadcast cost). */
  private[graft] def sqByCell(
      qs: Array[(Long, Array[Double])],
      coarse: Array[Array[Double]],
      vmin: Array[Double],
      vstep: Array[Double],
      nprobe: Int): Map[Int, Array[(Long, Double, Array[Double])]] = {
    import scala.collection.parallel.CollectionConverters._
    val dim = vmin.length
    val perQuery: Array[Array[(Int, (Long, Double, Array[Double]))]] =
      qs.par.map { case (qid, qv) =>
        val dots = new Array[Double](coarse.length)
        val dists = new Array[Double](coarse.length)
        var ci = 0
        while (ci < coarse.length) {
          val cc = coarse(ci)
          var dot = 0.0; var t = 0
          while (t < dim) { dot += qv(t) * cc(t); t += 1 }
          var dist = 0.0; t = 0
          while (t < dim) { val df = qv(t) - cc(t); dist += df * df; t += 1 }
          dots(ci) = dot; dists(ci) = dist; ci += 1
        }
        var qDotMin = 0.0
        val s1 = new Array[Double](dim)
        var t = 0
        while (t < dim) {
          qDotMin += qv(t) * vmin(t)
          s1(t) = qv(t) * vstep(t)
          t += 1
        }
        coarse.indices.sortBy(ci => dists(ci)).take(nprobe)
          .map(c => (c, (qid, dots(c) + qDotMin, s1))).toArray
      }.toArray
    perQuery.flatten.groupBy(_._1).map { case (c, arr) => c -> arr.map(_._2) }
  }

  /** Search a built [[IvfSqIndex]]: probed-cell asymmetric scoring
    * over the (persisted) byte-code relation + exact cosine re-rank —
    * the [[ivfPqSearch]] two-stage shape with scalar decode folded
    * into per-query linear coefficients ([[sqByCell]]). Bounded
    * per-query top-cap accumulators inside the scoring mapPartitions
    * ([[graft.streaming.StoreCommits.TopKMap]]): only ≤ nq·cap
    * survivors per partition reach the exchange, never the
    * candidate-proportional pair relation. `touches` counts per-row
    * query visits (the O(queries-probing-cell) complexity probe);
    * `emitted` counts exchange survivors. */
  def ivfSqSearch(
      index: IvfSqIndex, queries: DataFrame, k: Int,
      nprobe: Int = 4, rerank: Int = 32,
      maxQueries: Int = 100000,
      touches: Option[org.apache.spark.util.LongAccumulator] = None,
      emitted: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val idCol = index.idCol
    val vecCol = index.vecCol
    val unit = unitUdf
    val qs = collectBounded(
      queries.select(col(idCol).cast("long").as("query_id"), unit(col(vecCol)).as("qv")),
      maxQueries, "ivfSqSearch")
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    val qBc = spark.sparkContext.broadcast(
      sqByCell(qs, index.coarse, index.vmin, index.vstep, nprobe))
    val cap = math.max(rerank, k)
    val scored = graft.streaming.StoreCommits.rebalance(index.encoded.toDF())
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { it =>
        val qc = qBc.value
        val none = Array.empty[(Long, Double, Array[Double])]
        val acc = new graft.streaming.StoreCommits.TopKMap(cap)
        it.foreach { case (nid, cell, code) =>
          val entries = qc.getOrElse(cell, none)
          touches.foreach(_.add(entries.length))
          var i = 0
          while (i < entries.length) {
            val (qid, base, s1) = entries(i)
            if (qid != nid) {
              var s = base; var t = 0
              while (t < s1.length) { s += (code(t) & 0xff) * s1(t); t += 1 }
              acc.insert(qid, nid, s)
            }
            i += 1
          }
        }
        countEmitted(acc.drain(), emitted)
      }.toDF("query_id", "neighbor_id", "adc")

    // SQ shortlist → exact cosine re-rank (the ivfPqSearch stage 2)
    val shortlist = rankTopK(scored, "adc", cap)
      .select("query_id", "neighbor_id")
    val qRaw = queries.select(
      col(idCol).cast("long").as("query_id"), col(vecCol).as("qvec"))
    val exact = shortlist
      .join(index.corpus.select(
        col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("cvec")),
        "neighbor_id")
      .join(broadcast(qRaw), "query_id")
      .withColumn("cos", Dedup.cosine(col("qvec"), col("cvec")))
    // unique (query, neighbor) pairs by construction — the shared
    // fold-ranked tail replaces the window: one exchange, no sort
    graft.streaming.StoreCommits.rankSurvivors(
      exact.select(col("query_id"), col("neighbor_id"), col("cos")), k, "cos")
  }

  /** Driver-local Lloyd's k-means for the PQ codebook fit: the training
    * set is a bounded sample (see pqTopK), so a distributed iterative
    * fit buys nothing but per-iteration job overhead. Random init over
    * DISTINCT points (seeded, like the MLlib setting it replaced), so
    * degenerate data yields fewer-than-k centers rather than duplicate
    * ones — the encode/ADC passes already size by the actual count. */
  private[graft] def localKMeans(
      pts: Array[Array[Double]], k: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    require(pts.nonEmpty, "k-means needs a non-empty training sample")
    val dim = pts(0).length
    val rnd = new scala.util.Random(seed)
    // distinct BY VALUE (Array equality is reference equality)
    val distinctPts = pts.map(_.toVector).distinct
    var centers: Array[Array[Double]] =
      rnd.shuffle(distinctPts.indices.toVector)
        .take(math.min(k, distinctPts.length))
        .map(i => distinctPts(i).toArray).toArray
    var round = 0
    while (round < iters) {
      val sums = Array.fill(centers.length)(new Array[Double](dim))
      val counts = new Array[Long](centers.length)
      pts.foreach { p =>
        var best = 0; var bd = Double.MaxValue; var ci = 0
        while (ci < centers.length) {
          var d = 0.0; var t = 0
          while (t < dim) { val df = p(t) - centers(ci)(t); d += df * df; t += 1 }
          if (d < bd) { bd = d; best = ci }
          ci += 1
        }
        var t = 0
        while (t < dim) { sums(best)(t) += p(t); t += 1 }
        counts(best) += 1
      }
      centers = Array.tabulate(centers.length) { ci =>
        if (counts(ci) == 0) centers(ci) // empty cluster keeps its center
        else Array.tabulate(dim)(t => sums(ci)(t) / counts(ci))
      }
      round += 1
    }
    centers
  }

  /** LSH-bucketed ANN top-k: `tables` independent hyperplane hash
    * tables (the classic E2LSH/FAISS-LSH layout — per-table seeds, a
    * candidate is scored if ANY table buckets it with the query) each
    * probed with one-bit multi-probe (own bucket + the `planes`
    * single-bit-flip neighbors). Recall < 1 by construction and
    * recall-vs-candidates is the knob pair: on sharply clustered data
    * one table suffices (the spec fixture); on weakly structured
    * embeddings P[bit agrees] = 1 − θ/π per plane, so fewer planes +
    * more tables buys recall at candidate-coverage cost (RECALL.md
    * records the measured trade-off on the testdata corpus). The
    * per-table key explode scales the corpus side by `tables` — keys
    * only, vectors are not duplicated into the shuffle; candidate
    * dedup happens on (query, neighbor) before scoring. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
      planes: Int = 8, seed: Long = 7L, tables: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxQueries: Int = 100000): DataFrame =
    lshSearch(lshKeyedIndex(corpus, dim, planes, seed, tables, idCol, vecCol,
      persist = false), queries, k, maxQueries)

  /** A BUILT LSH index: the (tbl, bucket)-keyed corpus relation plus
    * the plane matrix that keyed it. [[lshBuild]] persists the keyed
    * relation so repeated [[lshSearch]] batches skip the corpus keying
    * pass; [[lshTopK]] is the one-shot composition.
    *
    * Sizing at corpus scale: bucket occupancy ≈ n / 2^planes per
    * table, so `planes` should grow with log₂(n) to keep per-probe
    * candidate counts bounded (the q20 entry's planes=6 is tuned for
    * the 2k-vector testdata); `tables` is then the recall lever —
    * candidates are OR'd across tables at `tables`× key rows cost. */
  final class LshIndex private[ops] (
      private[ops] val keyed: DataFrame,
      private[ops] val planesFlat: Seq[Float],
      private[ops] val idCol: String,
      private[ops] val vecCol: String,
      val planes: Int, val dim: Int, val tables: Int) {
    /** (tbl, bucket, members) occupancy — the hot-bucket monitor. */
    def bucketSizes: DataFrame =
      keyed.groupBy("tbl", "bucket").agg(count(lit(1)).as("members"))
    def release(): Unit = { keyed.unpersist(blocking = false); () }
  }

  /** Build an LSH index: one fused keying pass over the corpus,
    * persisted for repeated [[lshSearch]] batches. */
  def lshBuild(
      corpus: DataFrame, dim: Int,
      planes: Int = 8, seed: Long = 7L, tables: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): LshIndex =
    lshKeyedIndex(corpus, dim, planes, seed, tables, idCol, vecCol, persist = true)

  private def lshKeyedIndex(
      corpus: DataFrame, dim: Int, planes: Int, seed: Long, tables: Int,
      idCol: String, vecCol: String, persist: Boolean): LshIndex = {
    require(tables >= 1 && tables <= 64, s"tables must be in [1,64] (got $tables)")
    // ALL table keys from one native expression (HyperplaneKeys):
    // composing tables × planes VectorDots in a single projection
    // generates a method past HotSpot's JIT bytecode threshold — the
    // hot path then runs interpreted, measured ~10× wall on the sf1
    // corpus. The fused expression keeps the plane matrix as a codegen
    // reference object and emits one compact triple loop. Seeds are
    // per-table (seed + 1000003·t); table 0 ≡ the single-table scheme.
    val planesFlat: Seq[Float] = tablePlanesFlat(dim, planes, seed, tables)
    val allKeys = graft.functions.VectorExpressions
      .hyperplaneKeys(col(vecCol), planesFlat, planes, dim)
    val keyed0 = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
        posexplode(allKeys).as(Seq("tbl", "bucket")))
    val keyed =
      if (persist) keyed0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else keyed0
    new LshIndex(keyed, planesFlat, idCol, vecCol, planes, dim, tables)
  }

  /** Search a built [[LshIndex]] with one-bit multi-probe per table —
    * the corpus side is the (persisted) keyed relation, never re-keyed.
    * Scoring is BUCKET-INDEXED (the
    * [[graft.streaming.AnnStream.searchStore]] shape): a broadcast
    * Map[(tbl«32|bucket) → probing queries] lets each keyed row score
    * only its own bucket's queries with a bounded per-query top-k fold
    * — multi-table × multi-probe duplicates dedup inside the bounded
    * structure (identical scores, so max() is the dedup), and no
    * per-pair row is materialized, shuffled, or hash-aggregated. Probe
    * keys are derived from the SAME collected query snapshot (a local
    * relation fed back through the exact hyperplaneKeys expression the
    * index was built with), so a nondeterministic query source cannot
    * disagree between the vector collect and the key derivation. */
  def lshSearch(
      index: LshIndex, queries: DataFrame, k: Int,
      maxQueries: Int = 100000,
      emitted: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val planes = index.planes
    val qRows = collectBounded(
      queries.select(col(index.idCol).cast("long").as("query_id"),
        col(index.vecCol).as("qvec")),
      maxQueries, "lshSearch")
    val vecOf = qRows.map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val qLocal = spark.createDataFrame(
      java.util.Arrays.asList(qRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("qvec",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    val qKeys = qLocal.select(col("query_id"),
      posexplode(graft.functions.VectorExpressions.hyperplaneKeys(
        col("qvec"), index.planesFlat, planes, index.dim))
        .as(Seq("tbl", "key")))
    val probeMasks = lit(0) +: (0 until planes).map(b => shiftleft(lit(1), b))
    val probeRows = qKeys.select(col("query_id"), col("tbl"),
      explode(array(probeMasks.map(mm => col("key").bitwiseXOR(mm)): _*)).as("bucket"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val byKey: Map[Long, Array[(Long, Array[Float])]] =
      probeRows.groupBy { case (_, t, b) => t.toLong * (1L << 32) + b }
        .map { case (kk, arr) =>
          kk -> arr.map { case (qid, _, _) => (qid, vecOf(qid)) }
        }
    val qBc = spark.sparkContext.broadcast(byKey)
    val scored = graft.streaming.StoreCommits.rebalance(
        index.keyed.select(col("neighbor_id").cast("long"),
          col("tbl"), col("bucket"), col("cvec")))
      .as[(Long, Int, Int, Array[Float])]
      .mapPartitions { it =>
        val qc = qBc.value
        val none = Array.empty[(Long, Array[Float])]
        val acc = new graft.streaming.StoreCommits.TopKMap(k)
        it.foreach { case (nid, tbl, bucket, cvec) =>
          val entries = qc.getOrElse(tbl.toLong * (1L << 32) + bucket, none)
          var i = 0
          while (i < entries.length) {
            val qid = entries(i)._1
            if (qid != nid)
              acc.insert(qid, nid,
                graft.streaming.StoreCommits.cosineSeq(entries(i)._2, cvec))
            i += 1
          }
        }
        countEmitted(acc.drain(), emitted)
      }.toDF("query_id", "neighbor_id", "cos")
    rankTopK(scored, "cos", k)
  }

  /** Deterministic PLANTED-NEIGHBOR benchmark relation: the corpus
    * plus, for each of the first `nQueries` vectors q, `copies` planted
    * near-duplicates `v_c = (1 − c/100)·q + (c/100)·u` mixed toward a
    * fixed partner vector u (the vector `nQueries` ids above q). The
    * mix is computed in DOUBLE and rounded once to FLOAT32, so any
    * engine replays it bit-for-bit from the same parquet floats — this
    * is what turns the approximate ANN tiers into HASH-CHECKABLE
    * queries: planted copies sit at cosine ≥ ~0.9987 against a
    * distractor floor ≤ ~0.6, so every tier's top-k over this relation
    * provably equals the brute-force oracle's (the re-crawled-corpus
    * regime RECALL.md measures at recall 1.00), while rank order among
    * the copies is fixed by the strictly-decreasing cosine in c with
    * gaps ~1e-4 — far above cross-engine summation-order ulps.
    * Distractors are the ENTIRE original corpus, so the bucketed /
    * cell-probed / code-quantized paths all do their real work.
    * Planted ids start at `idOffset` (2^40 — disjoint from any real
    * corpus id by construction). */
  def plantedNeighborCorpus(
      emb: DataFrame, nQueries: Int = 10, copies: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding",
      idOffset: Long = 1L << 40): DataFrame = {
    val base = emb.select(col(idCol), col(vecCol))
    val q = base.filter(col(idCol) < nQueries)
      .select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val u = base.filter(col(idCol) >= nQueries && col(idCol) < 2L * nQueries)
      .select((col(idCol) - nQueries).as("qid"), col(vecCol).as("uv"))
    val planted = q.join(u, "qid")
      .select(col("qid"), col("qv"), col("uv"),
        explode(sequence(lit(1), lit(copies))).as("c"))
      .select(
        (lit(idOffset) + col("qid") * copies + col("c")).cast("long").as(idCol),
        zip_with(col("qv"), col("uv"), (a, b) =>
          ((lit(1.0) - col("c") * lit(0.01)) * a.cast("double")
            + col("c") * lit(0.01) * b.cast("double")).cast("float")).as(vecCol))
    base.withColumn(idCol, col(idCol).cast("long")).unionByName(planted)
  }
}
