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
    if (df.rdd.getNumPartitions * 2 < want) df.repartition(want) else df
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
    private val m = new java.util.HashMap[Long, TopK]()
    def insert(qid: Long, nid: Long, sc: Double): Unit = {
      var acc = m.get(qid)
      if (acc == null) { acc = new TopK(cap); m.put(qid, acc) }
      acc.insert(nid, sc)
    }
    def drain(): Iterator[(Long, Long, Double)] = {
      import scala.jdk.CollectionConverters._
      m.entrySet().iterator().asScala.flatMap(e => e.getValue.drain(e.getKey))
    }
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
