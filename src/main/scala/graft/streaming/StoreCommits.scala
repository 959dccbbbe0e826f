package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The commit-store plumbing SHARED by the three ANN stores
  * ([[AnnStream]], [[IvfStream]], [[IvfPqStream]]): atomic control-file
  * writes, `_PARTS` reads, manifest claiming, the fold-and-swap
  * compaction skeleton with one-generation GC grace, and the generic
  * two-phase pending-marker promote for data-fit models. Each store
  * keeps only its schema, key derivation, and fit/encode logic — a fix
  * to the promote/GC machinery lands HERE, once.
  *
  * The contracts these primitives implement are documented at their
  * original sites ([[DedupStream]] for manifest/`_FOLDED`/visibility,
  * [[AnnStream.compactStore]] for the GC grace window,
  * [[IvfStream.compactStore]] for the refit two-phase commit). */
private[graft] object StoreCommits {

  private def fs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Atomic full-text file replace (temp + FileContext rename with
    * OVERWRITE): ORDERED content, unlike the sorted-set writeNameFile —
    * centroid/codebook rows must round-trip in file order because
    * stored codes index into them. */
  def writeTextFile(
      spark: SparkSession, root: org.apache.hadoop.fs.Path,
      fileName: String, text: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val f = fs(spark, root)
    val tmp = new org.apache.hadoop.fs.Path(root,
      s"_$fileName.tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(root.toUri, conf)
    fc.rename(tmp, new org.apache.hadoop.fs.Path(root, fileName),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** ChecksumException-retrying read: see [[DedupStream.readSmallText]]. */
  def readTextFile(
      f: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[String] =
    DedupStream.readSmallText(f, p)

  /** Visible `batch=` commit count of a store data root — the
    * manifest's size when claimed, else a directory listing. Because
    * every fold (compaction or refit) collapses the manifest to ONE
    * entry and every tick publishes one more, this count is the tick
    * distance from the last fold — the drift auto-refit's cooldown
    * signal (no extra state file). */
  def visibleCommitCount(spark: SparkSession, dataRoot: String): Int = {
    val root = new org.apache.hadoop.fs.Path(dataRoot)
    val f = fs(spark, root)
    DedupStream.readManifest(f, root).map(_.size).getOrElse(
      if (f.exists(root))
        f.listStatus(root).count(s =>
          s.isDirectory && s.getPath.getName.startsWith("batch="))
      else 0)
  }

  /** The pinned partition count from the store's `_PARTS` marker. */
  def storePartsOf(
      f: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Int = {
    val t = readTextFile(f, new org.apache.hadoop.fs.Path(dir, "_PARTS"))
      .getOrElse(throw new IllegalArgumentException(
        s"store $dir has no _PARTS marker")).trim
    t.split('/')(0).toInt
  }

  /** Manifest-gated from birth: claim a `_MANIFEST` before the first
    * commit so readers never see a half-written dir through the
    * manifest-less listing fallback; adopt `_SUCCESS`-complete dirs if
    * the file is somehow absent on a non-empty store. */
  def ensureManifestClaimed(
      spark: SparkSession,
      root: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FileSystem = {
    val f = fs(spark, root)
    if (!f.exists(new org.apache.hadoop.fs.Path(root, "_MANIFEST"))) {
      f.mkdirs(root)
      val adopt = DedupStream.visibleCommits(f, root).filter(s =>
        f.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      DedupStream.writeManifest(spark, root, adopt.map(_.getPath.getName).toSet)
    }
    f
  }

  /** The EFFECTIVE pinned model under the two-phase `<marker>.pending`
    * promote — the crash-healing read shared by the refitting stores.
    * A refit stages the new model as `<marker>.pending` naming its
    * re-encoded commit, then swaps the manifest (THE commit point),
    * then promotes pending → `<marker>`. This resolves either crash
    * window: a pending whose target IS visible is the post-swap truth
    * (and `promote = true` finishes the promotion); a pending whose
    * target is NOT visible is a pre-swap dead letter and the standing
    * marker wins. */
  def effectivePinned[M](
      spark: SparkSession, storeDir: String, subdir: String, marker: String,
      parse: String => M, render: M => String,
      targetOf: M => Option[String], clearTarget: M => M,
      promote: Boolean): Option[M] = {
    val dir = new org.apache.hadoop.fs.Path(storeDir)
    val f = fs(spark, dir)
    val root = new org.apache.hadoop.fs.Path(dir, subdir)
    val pendingPath = new org.apache.hadoop.fs.Path(dir, s"$marker.pending")
    val pending = readTextFile(f, pendingPath).map(parse)
    val visible = DedupStream.readManifest(f, root).getOrElse(Set.empty)
    pending match {
      case Some(m) if targetOf(m).exists(visible.contains) =>
        if (promote) {
          writeTextFile(spark, dir, marker, render(clearTarget(m)))
          f.delete(pendingPath, false)
        }
        Some(clearTarget(m))
      case _ =>
        readTextFile(f, new org.apache.hadoop.fs.Path(dir, marker)).map(parse)
    }
  }

  /** Sequential-double cosine, the exact arithmetic of
    * [[graft.functions.VectorExpressions.cosineFast]] (ascending-index
    * double dot, then `dot / (√Σa² · √Σb²)` with the query side as
    * `a`) — bit-identical scores keep the q101/q102 hash gates
    * closed. */
  def cosineSeq(q: Array[Float], c: Array[Float]): Double = {
    val n = q.length
    var dot = 0.0; var i = 0
    while (i < n) { dot += q(i).toDouble * c(i).toDouble; i += 1 }
    var qs = 0.0; i = 0
    while (i < n) { qs += q(i).toDouble * q(i).toDouble; i += 1 }
    var cs = 0.0; i = 0
    while (i < n) { cs += c(i).toDouble * c(i).toDouble; i += 1 }
    dot / (math.sqrt(qs) * math.sqrt(cs))
  }

  /** Small pruned scans under-parallelize: a compacted store's probed
    * partitions are a handful of sub-MB files, which the file source
    * packs into one or two tasks — and the candidate-scoring map stage
    * inherits that, running ~10⁸ pair scores on a single core while 31
    * sit idle (measured: the map-side-UDF IVF leg at nq = 10k sat at
    * 598 s wall on a 0.24-canary host). Repartition the PROJECTED
    * relation (tens of MB for vectors, single-digit MB for codes) up to
    * the session parallelism when the scan plans fewer than half that
    * many tasks; a corpus-scale store plans thousands of scan tasks and
    * passes through untouched. */
  def rebalance(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    val have = df.rdd.getNumPartitions
    if (have * 2 < want) df.repartition(want)
    // the OVER-split side matters as much for the TopKMap fold: the
    // drained survivor volume is PARTITIONS × nq × cap, so a many-file
    // scan (measured: a 256-partition union of part-files drained
    // 410M survivor rows at nq = 50k, cap = 32 — 8× the useful volume)
    // multiplies the downstream exchange for zero scoring benefit.
    // coalesce is shuffle-free; scoring stays on `want` cores.
    else if (have > want * 2) df.coalesce(want)
    else df
  }

  /** Bounded per-query top-K accumulator for the scoring map stage —
    * array-backed, sorted best→worst under the search ordering
    * (score desc, neighbor asc), deduping by neighbor id WITHIN the
    * structure (duplicate candidates from multi-table/multi-probe hits
    * or re-indexed commits must not crowd a real neighbor out of the
    * local top-K). The hot path is two comparisons: a pair that cannot
    * qualify returns immediately — a duplicate of an already-kept
    * neighbor can only carry an equal-or-worse score, so skipping it
    * preserves max() semantics. */
  final class TopK(cap: Int) {
    private val nids = new Array[Long](cap)
    private val scs = new Array[Double](cap)
    private var n = 0
    // membership index for LARGE caps only (deep re-rank shortlists size
    // cap = max(rerank, k) into the tens of thousands, where the linear
    // dedup scan turns every qualifying insert into O(cap)); small caps
    // (serving k ≤ 64) keep the scan — it beats a hash probe at that
    // size and allocates nothing
    private val slotOf: java.util.HashMap[Long, Integer] =
      if (cap > 64) new java.util.HashMap[Long, Integer](cap * 2) else null
    private def beats(c1: Double, n1: Long, c2: Double, n2: Long): Boolean =
      c1 > c2 || (c1 == c2 && n1 < n2)
    private def swap(i: Int, j: Int): Unit = {
      val tn = nids(i); nids(i) = nids(j); nids(j) = tn
      val tc = scs(i); scs(i) = scs(j); scs(j) = tc
      if (slotOf != null) { slotOf.put(nids(i), i); slotOf.put(nids(j), j) }
    }
    private def bubbleUp(from: Int): Unit = {
      var j = from
      while (j > 0 && beats(scs(j), nids(j), scs(j - 1), nids(j - 1))) {
        swap(j, j - 1); j -= 1
      }
    }
    def insert(nid: Long, sc: Double): Unit = {
      if (n == cap && !beats(sc, nid, scs(n - 1), nids(n - 1))) return
      if (slotOf != null) {
        val s = slotOf.get(nid)
        if (s != null) {
          val i = s.intValue()
          if (sc > scs(i)) { scs(i) = sc; bubbleUp(i) }
          return
        }
      } else {
        var i = 0
        while (i < n) { // qualifier: dedup by neighbor id, keep the max
          if (nids(i) == nid) {
            if (sc > scs(i)) { scs(i) = sc; bubbleUp(i) }
            return
          }
          i += 1
        }
      }
      if (n < cap) {
        nids(n) = nid; scs(n) = sc
        if (slotOf != null) slotOf.put(nid, n)
        n += 1; bubbleUp(n - 1)
      } else {
        if (slotOf != null) { slotOf.remove(nids(n - 1)); slotOf.put(nid, n - 1) }
        nids(n - 1) = nid; scs(n - 1) = sc; bubbleUp(n - 1)
      }
    }
    def drain(qid: Long): Iterator[(Long, Long, Double)] =
      (0 until n).iterator.map(i => (qid, nids(i), scs(i)))
  }

  /** Per-partition map of [[TopK]] accumulators — the map-side combine
    * the per-pair dedup + window CANNOT get from a hash aggregation
    * (with ~every pair distinct, partial aggregation combines nothing
    * and the 10⁸-group hash map spills: measured 130–630 s on pair
    * relations the scoring map produced in 6 s). Scoring loops insert
    * DIRECTLY — no per-pair tuple ever allocates (5×10⁸ short-lived
    * boxed triples per 50k-query leg were pure GC churn) — and drain
    * emits only the ≤ nq·cap survivors, a provable superset of each
    * query's global top-K (fewer than K distinct neighbors beat a true
    * top-K member in any partition, and TopK slots hold distinct
    * neighbors), so the tiny downstream dedup + window returns exactly
    * the old answer. */
  final class TopKMap(cap: Int) {
    // primitive open-addressing map (round 16): java.util.HashMap boxed
    // every long key probe — at 10^10 probes (flat-PQ batch scoring at
    // the 100k bound) that is 10^10 transient Longs of pure GC churn.
    // Power-of-2 capacity, byteswap64 mix, linear probing, no deletion.
    private var keys = new Array[Long](1 << 10)
    private var accs = new Array[TopK](1 << 10)
    private var mask = keys.length - 1
    private var n = 0
    private def slotOf(k: Long): Int = {
      var i = scala.util.hashing.byteswap64(k).toInt & mask
      while (accs(i) != null && keys(i) != k) i = (i + 1) & mask
      i
    }
    private def grow(): Unit = {
      val ok = keys; val oa = accs
      keys = new Array[Long](ok.length << 1)
      accs = new Array[TopK](ok.length << 1)
      mask = keys.length - 1
      var j = 0
      while (j < ok.length) {
        if (oa(j) != null) {
          val i = slotOf(ok(j)); keys(i) = ok(j); accs(i) = oa(j)
        }
        j += 1
      }
    }
    def insert(qid: Long, nid: Long, sc: Double): Unit =
      accFor(qid).insert(nid, sc)
    /** The query's accumulator — query-OUTER scoring loops hoist this
      * out of the row loop so the per-pair path is a bare TopK.insert
      * (no hash probe per pair). */
    def accFor(qid: Long): TopK = {
      var i = slotOf(qid)
      if (accs(i) == null) {
        if ((n + 1) * 4 > keys.length * 3) { grow(); i = slotOf(qid) }
        keys(i) = qid; accs(i) = new TopK(cap); n += 1
      }
      accs(i)
    }
    def drain(): Iterator[(Long, Long, Double)] =
      keys.indices.iterator.filter(accs(_) != null)
        .flatMap(i => accs(i).drain(keys(i)))
  }

  /** SECOND-LEVEL top-K fold (round 16): hash-partition the scoring
    * partitions' survivors by query and fold once more, so the final
    * ranking window sees ≤ nq·cap rows instead of partitions·nq·cap.
    * The groupBy-max + window directly over the drained relation
    * re-created the round-15 lesson one level up: at nq = 100k,
    * cap = 32, 32 scoring partitions the survivors are ~10⁸ rows, and
    * the thread dump showed every worker inside the window's TimSort.
    * This fold replaces that hash-agg + full sort with one 24-byte-row
    * exchange and a linear pass; duplicate (query, neighbor) versions
    * dedup inside [[TopK]] with max() semantics, exactly like the
    * groupBy it replaces. Input columns must be
    * (query_id LONG, neighbor_id LONG, score DOUBLE). */
  def foldSurvivors(scored: DataFrame, cap: Int, scoreName: String): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored.repartition(col("query_id"))
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        val acc = new TopKMap(cap)
        it.foreach { case (q, nid, s) => acc.insert(q, nid, s) }
        acc.drain()
      }.toDF("query_id", "neighbor_id", scoreName)
  }

  // ======== tombstone deletes (round 16) ========

  private val tombSchema = StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType, nullable = false)))

  /** Upsert-shaped DELETE for the commit stores: `ids` land as a
    * tombstone commit under `<storeDir>/<subdir>/batch=<tag>`
    * (single-column distinct longs, one file, manifest-gated like
    * every commit). Search filters tombstoned ids out
    * ([[minusTombstones]]); the next compaction physically drops
    * their rows and then RETIRES the applied tombstones
    * ([[retireTombstones]]), after which the store equals one built
    * from the survivors — the takedown path a 100 TB serving corpus
    * needs without a full rebuild.
    *
    * CONTRACT: a tombstone masks the id until that compaction — an id
    * re-upserted BETWEEN delete and compaction stays masked (delete
    * wins within a store generation); after the compaction the id
    * inserts fresh. Deletes are writer operations: serialize them with
    * upserts and compaction (the stores' standing SINGLE-WRITER
    * contract). Returns the distinct id count committed. */
  def tombstoneStep(
      ids: DataFrame, storeDir: String, idColName: String,
      batchTag: String = java.util.UUID.randomUUID().toString,
      subdir: String = "tombstones"): Long = {
    val spark = ids.sparkSession
    val root = new org.apache.hadoop.fs.Path(s"$storeDir/$subdir")
    ensureManifestClaimed(spark, root)
    val commitDir = s"$storeDir/$subdir/batch=$batchTag"
    ids.select(col(idColName).cast("long").as("id"))
      .filter(col("id").isNotNull).distinct()
      .coalesce(1).write.mode("overwrite").parquet(commitDir)
    DedupStream.publishCommit(spark, root, s"batch=$batchTag")
    spark.read.parquet(commitDir).count()
  }

  /** The store's visible tombstoned-id relation (column `id`, LONG;
    * empty relation when none). Size is bounded by deletes since the
    * last compaction — the retire step keeps it from accreting. */
  def tombstones(
      spark: SparkSession, storeDir: String,
      subdir: String = "tombstones"): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(s"$storeDir/$subdir")
    val f = fs(spark, root)
    val leaves =
      if (!f.exists(root)) Nil
      else DedupStream.visibleCommits(f, root).map(_.getPath.toString)
    if (leaves.nonEmpty)
      spark.read.schema(tombSchema).parquet(leaves: _*).distinct()
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], tombSchema)
  }

  /** Names of the visible tombstone commits — captured BEFORE a
    * compaction so [[retireTombstones]] retires exactly the set the
    * fold applied. */
  def tombstoneCommits(
      spark: SparkSession, storeDir: String,
      subdir: String = "tombstones"): Set[String] = {
    val root = new org.apache.hadoop.fs.Path(s"$storeDir/$subdir")
    val f = fs(spark, root)
    if (!f.exists(root)) Set.empty
    else DedupStream.visibleCommits(f, root).map(_.getPath.getName).toSet
  }

  /** Drop tombstoned ids from a store relation: a broadcast anti-join
    * on `idCol` when tombstones exist, the UNTOUCHED plan when none —
    * a store that never saw a delete pays nothing (and its gates stay
    * plan-identical). */
  def minusTombstones(
      df: DataFrame, spark: SparkSession, storeDir: String, idCol: String,
      subdir: String = "tombstones"): DataFrame =
    if (tombstoneCommits(spark, storeDir, subdir).isEmpty) df
    else df.join(
      broadcast(tombstones(spark, storeDir, subdir)
        .withColumnRenamed("id", idCol)),
      Seq(idCol), "left_anti")

  /** Retire APPLIED tombstone commits after a compaction's manifest
    * swap: their names extend `_FOLDED` (a replayed delete tag cannot
    * resurrect), the manifest drops them, and the dirs are deleted. A
    * crash between the main swap and this step leaves already-dropped
    * rows plus standing tombstones — which re-filter to the same
    * answer until the next compaction retires them (idempotent). */
  def retireTombstones(
      spark: SparkSession, storeDir: String, applied: Set[String],
      subdir: String = "tombstones"): Unit = {
    if (applied.isEmpty) return
    val root = new org.apache.hadoop.fs.Path(s"$storeDir/$subdir")
    val f = fs(spark, root)
    if (!f.exists(root)) return
    DedupStream.writeNameFile(spark, root, "_FOLDED",
      DedupStream.readFolded(f, root) ++ applied)
    val remaining =
      DedupStream.visibleCommits(f, root).map(_.getPath.getName).toSet -- applied
    DedupStream.writeManifest(spark, root, remaining)
    applied.foreach(n =>
      f.delete(new org.apache.hadoop.fs.Path(root, n), true))
  }

  /** The fold-and-swap compaction skeleton: adopt the manifest, read
    * the whole visible store, let the caller transform it (identity
    * fold or refit re-encode), write the target commit hash-partitioned
    * and sorted, stage an optional pending marker, extend `_FOLDED`,
    * swap the manifest atomically, run the caller's post-swap step
    * (e.g. finish a pending promotion), then GC with a ONE-GENERATION
    * GRACE PERIOD: the commits THIS call replaced stay on disk until
    * the next compaction so an in-flight reader whose leaf list was
    * captured against the prior manifest finishes its lazy read.
    * Anything unlisted AND not just-replaced is deleted.
    * SINGLE-WRITER contract: run between upserts.
    *
    * @param extraWork   work even with one visible commit (a refit
    *                    must re-encode a single-commit store)
    * @param transform   visible rows → (target rows, target dir name,
    *                    optional (pendingMarkerName, pendingText))
    * @param afterSwap   runs after the manifest swap (before GC) */
  def foldAndSwap(
      spark: SparkSession, storeDir: String, subdir: String,
      schema: StructType, abOf: Long => Column, sortCols: Seq[String],
      extraWork: Boolean,
      transform: DataFrame => (DataFrame, String, Option[(String, String)]),
      afterSwap: () => Unit = () => ()): Unit = {
    val dir = new org.apache.hadoop.fs.Path(storeDir)
    val root = new org.apache.hadoop.fs.Path(dir, subdir)
    val f = fs(spark, root)
    if (!f.exists(root)) return
    ensureManifestClaimed(spark, root)
    val visible = DedupStream.visibleCommits(f, root)
    val justReplaced: Set[String] =
      if (visible.size >= 2 || (extraWork && visible.nonEmpty)) {
        val parts = storePartsOf(f, dir)
        val all = DedupStream.readStore(spark, s"$storeDir/$subdir", schema,
          excludeTag = " none ", partCol = "ab", wanted = (0 until parts).toSet)
        val (rows, target, pending) = transform(all)
        rows.withColumn("ab", abOf(parts.toLong))
          .repartition(col("ab")).sortWithinPartitions(sortCols.map(col): _*)
          .write.partitionBy("ab")
          .mode("overwrite").parquet(s"$storeDir/$subdir/$target")
        pending.foreach { case (name, text) => writeTextFile(spark, dir, name, text) }
        DedupStream.writeNameFile(spark, root, "_FOLDED",
          DedupStream.readFolded(f, root) ++ visible.map(_.getPath.getName).toSet)
        DedupStream.writeManifest(spark, root, Set(target)) // THE commit point
        afterSwap()
        visible.map(_.getPath.getName).toSet
      } else Set.empty
    DedupStream.readManifest(f, root).foreach { nowVisible =>
      f.listStatus(root).filter(_.isDirectory)
        .filter(_.getPath.getName.startsWith("batch="))
        .filterNot(s => nowVisible.contains(s.getPath.getName)
          || justReplaced.contains(s.getPath.getName))
        .foreach(s => f.delete(s.getPath, true))
    }
  }
}
