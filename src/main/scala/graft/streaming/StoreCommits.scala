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
  * to the promote/GC machinery lands HERE, once. (The GC grace is
  * TIME-based since round 17 — see [[gcUnlisted]].)
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

  // ======== deferred physical GC (round-17 optimization round) ========
  //
  // The one-generation grace window is a RACE at read latency scale: a
  // reader resolves the manifest, captures its leaf list, and reads
  // lazily — if TWO compactions complete before its last file open, the
  // second one physically deletes the generation it is reading
  // (observed: the concurrent-searcher spec's FAILED_READ_FILE on
  // batch=w2 under full-suite load, where each read spans several Spark
  // jobs and the writer folds every other tick). Generations are
  // therefore retired by TIME, not by count: a replaced commit is
  // stamped into a `_RETIRED` ledger at the manifest swap and its files
  // are deleted only once the stamp is older than the grace window —
  // the snapshot-retention contract table formats use (Iceberg's
  // expire_snapshots(older_than)). Visibility is unchanged (the
  // manifest hides retired dirs from every NEW reader the instant the
  // swap lands); only physical file lifetime extends, so disk cost is
  // bounded by the writes inside one grace window. Never-visible strays
  // (a crashed partial write that no manifest ever listed) still delete
  // immediately — no reader can hold a reference to them.

  /** Grace window for retired commit dirs. Parameterized for scale
    * (`SPARK_GRAFT_GC_GRACE_MS`; sys-prop override for tests): the
    * default must exceed the slowest expected reader's manifest-resolve
    * → last-file-open span. Readers slower than the grace re-resolve
    * and retry — the standard snapshot-retention contract. */
  def defaultGcGraceMs: Long =
    sys.props.get("graft.gc.grace.ms")
      .orElse(sys.env.get("SPARK_GRAFT_GC_GRACE_MS"))
      .map(_.trim.toLong).getOrElse(600000L)

  private def readRetired(
      f: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Map[String, Long] =
    readTextFile(f, new org.apache.hadoop.fs.Path(root, "_RETIRED"))
      .map(_.linesIterator.map(_.trim).filter(_.nonEmpty).flatMap { l =>
        val i = l.lastIndexOf(' ')
        if (i <= 0) None
        else scala.util.Try(l.substring(0, i) -> l.substring(i + 1).toLong).toOption
      }.toMap).getOrElse(Map.empty)

  /** Sweep UNLISTED commit dirs under `root`: manifest-visible dirs are
    * untouchable; `stampNow` names (the generation this call just
    * replaced / the tombstones it just applied) are stamped into the
    * ledger; once-visible dirs (in `_FOLDED` or already stamped) are
    * deleted only when their stamp is older than `graceMs`;
    * never-visible strays delete immediately. Ledger entries for
    * vanished dirs drop out naturally (the rewrite keeps only what the
    * listing walk retained). */
  def gcUnlisted(
      spark: SparkSession, root: org.apache.hadoop.fs.Path,
      graceMs: Long, stampNow: Set[String]): Unit = {
    val f = fs(spark, root)
    if (!f.exists(root)) return
    DedupStream.readManifest(f, root) match {
      case None => () // no manifest authority: never delete
      case Some(visible) =>
        val folded = DedupStream.readFolded(f, root)
        val ledger = readRetired(f, root)
        val now = System.currentTimeMillis()
        var next = Map.empty[String, Long]
        f.listStatus(root).filter(_.isDirectory)
          .map(_.getPath).filter(_.getName.startsWith("batch="))
          .filterNot(p => visible.contains(p.getName))
          .foreach { p =>
            val name = p.getName
            if (stampNow.contains(name)) next += name -> now
            else if (!folded.contains(name) && !ledger.contains(name)) {
              f.delete(p, true); () // never-visible stray
            } else {
              val t = ledger.getOrElse(name, now)
              if (now - t >= graceMs) { f.delete(p, true); () }
              else next += name -> t
            }
          }
        if (next != ledger)
          writeTextFile(spark, root, "_RETIRED",
            next.toSeq.sorted.map { case (n, t) => s"$n $t" }.mkString("\n"))
    }
  }

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
    def resolveOnce(): Option[M] = {
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
    // Marker OVERWRITES (a refit re-pin, a concurrent promote) go
    // through rename-with-OVERWRITE, which on the local filesystem is
    // delete-then-rename — NOT atomic, so a concurrent reader can
    // observe a VANISHING marker for microseconds (caught by the
    // concurrent-searcher spec under heavy host contention: a search
    // falling through pending straight into the delete window read
    // "no marker" on a live store). A store that ever HAD a marker
    // only lacks one transiently, so an empty resolution retries
    // briefly before it is believed; a genuinely unpinned dir pays
    // ~100 ms once on its error path.
    var attempt = 0
    var out = resolveOnce()
    while (out.isEmpty && attempt < 4) {
      Thread.sleep(25L)
      attempt += 1
      out = resolveOnce()
    }
    out
  }

  // ======== per-id version election (round 17) ========
  //
  // The round-16 verdict's one substantive hole: the stores' documented
  // "latest-wins" upsert contract was false — no per-id version existed
  // anywhere, so an id re-upserted with a changed vector left BOTH rows
  // live forever and search served max-similarity-over-versions. These
  // primitives make upsert mean upsert in all four ANN stores at once:
  //   - every upsert commit is stamped with one monotonic store-wide
  //     version ([[nextVersion]] — a `_SEQ` control file, single-writer
  //     like every store write);
  //   - search masks superseded rows GLOBALLY ([[minusSuperseded]]):
  //     the (id, ver) projection of the delta commits since the last
  //     fold is aggregated to max-ver-per-id and applied as a bounded
  //     join — so a stale row in a PROBED partition is dropped even
  //     when the newer version lives in a partition the query never
  //     opens (a groupBy-max on the pruned scan alone could not see
  //     it). Cost is bounded by upserts-since-compaction, exactly the
  //     tombstone bound, and a freshly-folded store pays nothing (the
  //     plan is untouched);
  //   - compaction keeps latest-per-id ([[electLatest]]), which also
  //     closes the row-per-update space leak.

  /** Fold-target name test: commits written by [[foldAndSwap]] carry
    * these prefixes (every store's compact/refit target). Everything
    * else is a DELTA commit — the bounded set [[minusSuperseded]]
    * reads. */
  private def isFoldTarget(name: String): Boolean =
    name.startsWith("batch=compact-") || name.startsWith("batch=refit-")

  /** Marker written INSIDE a fold-target commit dir by [[foldAndSwap]]
    * when the caller's transform guarantees exactly one row per live id
    * ([[electLatestOne]]). The compacted fast paths trust one-row-per-id
    * ONLY for commits carrying this marker — a fold written by the
    * pre-round-17 [[electLatest]] (which keeps equal-version duplicate
    * rows) or by the multi-table LSH election never has it, so those
    * stores always pay the read-path election (round-17 ADVICE). */
  private val OneRowMarker = "_ONE_ROW_PER_ID"

  /** The store's next upsert version — a monotonic `_SEQ` counter under
    * the single-writer contract. The number is BURNED before the commit
    * it stamps becomes visible, so a crash mid-upsert skips a version
    * (harmless) rather than ever reusing one (two versions of an id
    * with the same number would make the election ambiguous). */
  def nextVersion(spark: SparkSession, storeDir: String): Long = {
    val dir = new org.apache.hadoop.fs.Path(storeDir)
    val f = fs(spark, dir)
    f.mkdirs(dir)
    val v = readTextFile(f, new org.apache.hadoop.fs.Path(dir, "_SEQ"))
      .map(_.trim.toLong).getOrElse(0L) + 1L
    writeTextFile(spark, dir, "_SEQ", v.toString)
    v
  }

  /** GLOBAL latest-wins search mask: drop store rows superseded by a
    * later re-upsert of the same id. The mask relation is the max
    * version per id over the DELTA commits (everything since the last
    * fold — fold targets carry at most one version per id already and
    * every later upsert outversions them, so they never need reading).
    * Broadcast below `broadcastDeltaBytes` of delta files, shuffle join
    * above it; a store with no delta commits returns the UNTOUCHED
    * plan. Size discipline is the tombstone one: compaction retires
    * the deltas, so the mask is bounded by upserts-since-compaction —
    * size `compactEvery` accordingly at corpus scale. */
  def minusSuperseded(
      df: DataFrame, spark: SparkSession, storeDir: String, subdir: String,
      idCol: String, broadcastDeltaBytes: Long = 1L << 30,
      // the commit set the caller's scan ADOPTED (round-18 ADVICE:
      // the mask must be computed against the SAME generation the scan
      // reads — a fold landing between the scan's listing and a fresh
      // listing here would hide the deltas while the scan still reads
      // the pre-fold leaves, serving stale rows unmasked)
      commits: Option[Seq[org.apache.hadoop.fs.FileStatus]] = None): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(s"$storeDir/$subdir")
    val f = fs(spark, root)
    if (!f.exists(root)) return df
    val deltas = commits.getOrElse(DedupStream.visibleCommits(f, root))
      .filterNot(s => isFoldTarget(s.getPath.getName))
    if (deltas.isEmpty) return df
    // leaf enumeration mirrors readStore (explicit, no partition
    // discovery) but UNPRUNED — the mask must be global: both layouts
    // (hash-partitioned ab= subdirs, L0 single files), all partitions
    val leaves = deltas.flatMap { b =>
      val subs = f.listStatus(b.getPath).filter(_.isDirectory)
        .filter(_.getPath.getName.startsWith("ab="))
      if (subs.isEmpty) Seq(b.getPath.toString)
      else subs.toSeq.map(_.getPath.toString)
    }
    if (leaves.isEmpty) return df
    val verSchema = StructType(Seq(
      org.apache.spark.sql.types.StructField(idCol,
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("ver",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val latest = spark.read.schema(verSchema).parquet(leaves: _*)
      .groupBy(col(idCol)).agg(max(col("ver")).as("__latest"))
    // broadcast decision from the FILE LISTING, not a count() job (the
    // count was a whole extra pass over the deltas per search): delta
    // file bytes include the vector column, so bytes-per-row is ≥
    // ~300 B (dim 64 float) while a mask row is 16 B — 1 GiB of delta
    // files is ≤ ~4M ids ≈ 64 MB broadcast, safely under the 8 GiB
    // broadcast hard cap at ANY dim. A bulk-loaded never-compacted
    // store (TBs of deltas) falls through to the shuffle join instead
    // of OOMing the driver.
    val deltaBytes = deltas.iterator.flatMap { b =>
      val st = f.getFileStatus(b.getPath)
      if (st.isDirectory)
        f.listStatus(b.getPath).iterator.flatMap { s =>
          if (s.isDirectory) f.listStatus(s.getPath).iterator.map(_.getLen)
          else Iterator.single(s.getLen)
        }
      else Iterator.single(st.getLen)
    }.sum
    val joined =
      if (deltaBytes <= broadcastDeltaBytes)
        df.join(broadcast(latest), Seq(idCol), "left")
      else df.join(latest, Seq(idCol), "left")
    joined.filter(col("__latest").isNull || col("ver") >= col("__latest"))
      .drop("__latest")
  }

  /** Compaction-side election: keep each id's max-version rows (ALL of
    * them — an LSH id legitimately holds one row per table within one
    * version). After this fold the store holds exactly one version per
    * live id, the documented latest-wins contract, and the space cost
    * of an update is zero across compactions. */
  def electLatest(df: DataFrame, idCol: String): DataFrame = {
    val mx = df.groupBy(col(idCol)).agg(max(col("ver")).as("__latest"))
    df.join(mx, Seq(idCol)).filter(col("ver") === col("__latest"))
      .drop("__latest")
  }

  /** [[electLatest]] for the SINGLE-row-per-id families (IVF/IVF-PQ/
    * IVF-SQ — everything but the multi-table LSH store): one max-struct
    * hash aggregation instead of the agg + self-join (one exchange
    * fewer per fold), and the fold output is guaranteed EXACTLY one row
    * per live id — an equal-version duplicate (the same id twice in one
    * batch) resolves by (ver, cvec, …) struct ordering, the
    * [[latestVecs]] tie-break, instead of surviving as two rows. That
    * guarantee is what lets [[liveVectors]] skip its election on a
    * freshly-compacted store (optimization round 17). */
  def electLatestOne(df: DataFrame, idCol: String): DataFrame = {
    val others = df.columns.filter(_ != idCol).toSeq
    val ordered = Seq("ver", "cvec").filter(others.contains) ++
      others.filterNot(Set("ver", "cvec"))
    df.groupBy(col(idCol)).agg(max(struct(ordered.map(col): _*)).as("__m"))
      .select(col(idCol) +: others.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Re-layout a just-written (still UNPUBLISHED) flat commit into the
    * hash-partitioned layout — the rare BULK branch of the observe-fused
    * upsert (optimization round 18): the batch count now rides the
    * commit write as an observed metric instead of a separate
    * persist + count() pass, so the layout decision lands AFTER the
    * write; a batch over the L0 bound re-lays out from the commit's own
    * columnar files (replacing the extra cached pass the old shape
    * paid). The temp dir `batch=<tag>.tmp-<uuid>` is never
    * manifest-listed → invisible to every reader; a crash mid-relayout
    * leaves either the flat commit (correct, merely unpruned until the
    * next fold) or a stray dir the next compaction sweep deletes. */
  def relayout(
      spark: SparkSession, commitDir: String, schema: StructType,
      withAb: DataFrame => DataFrame): Unit = {
    val dirP = new org.apache.hadoop.fs.Path(commitDir)
    val f = fs(spark, dirP)
    val tmp = new org.apache.hadoop.fs.Path(
      s"$commitDir.tmp-${java.util.UUID.randomUUID()}")
    withAb(spark.read.schema(schema).parquet(commitDir))
      .repartition(col("ab")).write.partitionBy("ab")
      .mode("overwrite").parquet(tmp.toString)
    f.delete(dirP, true)
    org.apache.hadoop.fs.FileContext
      .getFileContext(dirP.toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, dirP)
    ()
  }

  /** Cell-OCCUPANCY drift signal (round 17): total-variation distance
    * between a tick's per-cell member distribution and the fit-time
    * occupancy recorded in the store marker. The reconstruction-error
    * monitors have a measured blind spot on weak-structure corpora
    * (round-16 SQ rehearsal: a ×3 scale + offset shift reads ratio
    * ~1.00 for both IVF-SQ and IVF-PQ — clamping and normalization
    * absorb the shift, and a near-isotropic corpus fits at the error
    * ceiling so there is no quality left to lose). Occupancy sees
    * exactly that failure mode: a regime shift re-routes vectors into
    * different cells even when their reconstruction error is
    * unchanged, so the tick's cell histogram diverges from the pinned
    * baseline. TV ∈ [0, 1]: 0 = identical distribution, 1 = disjoint
    * support. Stationary sampling noise at tick sizes ≥ ~10k rows and
    * nlist ≤ 64 sits under ~0.1 (per-cell sd √(p(1−p)/n) summed);
    * the rehearsed shift families read ≥ 0.8. Takes the already-
    * collected (cell, members) pairs — the monitor relation is nlist
    * rows and each store's drift check collects it ONCE for both
    * signals. */
  def occupancyTv(cells: Seq[(Int, Long)], base: Array[Double]): Option[Double] = {
    if (base.isEmpty) return None
    val n = cells.iterator.map(_._2).sum
    // a histogram over nlist cells needs O(nlist) samples before TV
    // means anything: at n ≈ nlist the expected TV of an IDENTICALLY
    // distributed tick is already ~0.5 (most cells empty by chance).
    // 32 samples/cell puts stationary noise at ~0.1·√(nlist/64) —
    // well under the 0.35 default. Smaller ticks return None (signal
    // abstains; the error ratio still covers them).
    if (n < 32L * base.length) return None
    val p = new Array[Double](base.length)
    cells.foreach { case (c, m) =>
      if (c >= 0 && c < p.length) p(c) = m.toDouble / n
    }
    var tv = 0.0
    var i = 0
    while (i < base.length) { tv += math.abs(p(i) - base(i)); i += 1 }
    Some(tv / 2.0)
  }

  /** One DETERMINISTIC vector per neighbor id for the exact re-rank:
    * max over (ver, cvec) structs — the latest version wins, and an
    * equal-version duplicate (the same id twice in one batch) breaks
    * the tie by array ordering instead of the nondeterministic
    * `first()` this replaces. Input needs (neighbor_id, ver, cvec). */
  def latestVecs(stored: DataFrame): DataFrame =
    stored.select(col("neighbor_id"),
        struct(col("ver"), col("cvec")).as("__vc"))
      .groupBy("neighbor_id").agg(max(col("__vc")).as("__vc"))
      .select(col("neighbor_id"), col("__vc.cvec").as("cvec"))

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
  def rebalance(df: DataFrame): DataFrame =
    rebalanceBy(df, df.rdd.getNumPartitions)

  /** [[rebalance]] with the partition count SUPPLIED by the caller —
    * taken from the bare pruned scan, before the tombstone/supersede
    * masks (optimization round 18): `df.rdd.getNumPartitions` on a
    * masked relation materializes every exchange under AQE (the
    * supersede mask's aggregation + broadcast ran as a whole extra job
    * per search, then re-ran in the real query — exchange reuse does
    * not span QueryExecutions). The masks are partition-preserving
    * broadcast joins, so the scan's count IS the masked relation's
    * count on every bounded-delta store; the one divergence (a
    * shuffle-join mask on TBs of never-compacted deltas) at worst adds
    * one redundant repartition of an already-parallel relation. */
  def rebalanceBy(df: DataFrame, have: Int): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
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
    /** Drain with the slot position as the 1-based rank: the structure
      * is maintained sorted under (score desc, neighbor asc) — exactly
      * the ranking-window ordering — so when a fold holds a query's
      * GLOBAL survivors the position IS `row_number()` and the caller
      * skips the window (and its exchange + sort) entirely. */
    def drainRanked(qid: Long): Iterator[(Long, Long, Int, Double)] =
      (0 until n).iterator.map(i => (qid, nids(i), i + 1, scs(i)))
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
    /** See [[TopK.drainRanked]] — valid once each query's rows are all
      * in THIS fold's partition (post `repartition(query_id)`). */
    def drainRanked(): Iterator[(Long, Long, Int, Double)] =
      keys.indices.iterator.filter(accs(_) != null)
        .flatMap(i => accs(i).drainRanked(keys(i)))
  }

  /** The post-scoring tail every top-K tier shares (round 17 — hoisted
    * from near-verbatim copies in the four searchStores and the batch
    * tiers' rankTopK): hash-partition the scoring partitions' survivors
    * by query (≤ partitions·nq·cap rows of 24 bytes — at nq = 100k,
    * cap = 32, 32 scoring partitions that is ~10⁸ rows, where a
    * groupBy-max + window re-created the very sort the scoring fold
    * removed; thread-dump evidence in BENCH_NOTES round 15) and fold
    * once more. After this second-level fold each query's [[TopK]]
    * holds its GLOBAL top-cap in drain order — (score desc, neighbor
    * asc), the exact ranking-window ordering, with duplicate
    * (query, neighbor) versions deduped max() like the groupBy it
    * replaces — so the rank IS the drain position
    * ([[TopK.drainRanked]]) and the bounded window the round-16 shape
    * still paid (a SECOND exchange of the folded survivors plus a
    * TimSort: mapPartitions hides the fold's partitioning from the
    * planner, so the window could not reuse it) is deleted outright —
    * ONE exchange end-to-end after scoring (optimization round 17).
    * Input columns must be (query_id LONG, neighbor_id LONG,
    * score DOUBLE); returns (query_id, neighbor_id, rank, scoreName)
    * with rank ≤ cap. */
  def rankSurvivors(scored: DataFrame, cap: Int, scoreName: String): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored.repartition(col("query_id"))
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        val acc = new TopKMap(cap)
        it.foreach { case (q, nid, s) => acc.insert(q, nid, s) }
        acc.drainRanked()
      }.toDF("query_id", "neighbor_id", "rank", scoreName)
  }

  /** The whole scoring tail: one typed mapPartitions pass folding a
    * [[TopKMap]] (the caller's closure does the arithmetic — only
    * ≤ nq·cap survivor triples per partition ever reach the exchange),
    * then [[rankSurvivors]]. The four store searches and the batch
    * tiers differ ONLY in the scoring closure and the projection they
    * feed in; everything exchange-bound lives here, once. */
  def scoreAndRank[T](
      scan: org.apache.spark.sql.Dataset[T], cap: Int, scoreName: String)(
      fold: (Iterator[T], TopKMap) => Unit): DataFrame = {
    val spark = scan.sparkSession
    import spark.implicits._
    val scored = scan.mapPartitions { it =>
      val acc = new TopKMap(cap)
      fold(it, acc)
      acc.drain()
    }.toDF("query_id", "neighbor_id", scoreName)
    rankSurvivors(scored, cap, scoreName)
  }

  /** STORE-AS-CORPUS read (round 17): the store's LIVE vectors as a
    * plain (neighbor_id, cvec) relation — exactly one deterministic
    * row per live id, after the tombstone mask, the supersede mask,
    * and the [[latestVecs]] election (which also collapses an LSH
    * id's per-table rows). This is the read surface a downstream
    * batch job consumes (recluster the serving corpus, join store
    * contents against fresh metadata, export for training) without
    * going through search. Cost: one full-store scan of (id, ver,
    * cvec) — column-pruned, all partitions — plus the delta-bounded
    * masks; on a freshly-compacted store the masks are free and the
    * election is a single hash aggregation. */
  def liveVectors(
      spark: SparkSession, storeDir: String, subdir: String,
      schema: StructType, multiRowPerId: Boolean = true): DataFrame = {
    val dir = new org.apache.hadoop.fs.Path(storeDir)
    val f = fs(spark, dir)
    val parts = storePartsOf(f, dir)
    // ONE commit-set resolution feeds the scan, the supersede mask, and
    // the fast-path decision — they must all observe the same
    // generation (round-18 ADVICE: a fold landing between two separate
    // manifest reads could flip the fast path on while the scan still
    // holds a delta snapshot with per-id duplicates)
    val root = new org.apache.hadoop.fs.Path(s"$storeDir/$subdir")
    val commits = DedupStream.visibleCommits(f, root)
    val all = DedupStream.readStoreFrom(spark, commits, schema,
      excludeTag = " none ", partCol = "ab",
      wanted = (0 until parts).toSet)
    val masked = minusSuperseded(
      minusTombstones(all, spark, storeDir, "neighbor_id"),
      spark, storeDir, subdir, "neighbor_id", commits = Some(commits))
    // freshly-compacted fast path (optimization round 17): when every
    // visible commit is a fold target WRITTEN BY [[electLatestOne]]
    // (the in-dir one-row marker — a pre-round-17 electLatest fold
    // keeps equal-version duplicates and never qualifies), the fold
    // already elected exactly one row per live id for the single-row
    // families, so the election here is the identity — skip the
    // full-corpus hash aggregation (which moves every vector through
    // an exchange) and return the masked projection directly. The
    // multi-table LSH store always elects (it collapses per-table
    // rows); a store with delta commits always elects.
    if (!multiRowPerId && compactedOnly(f, commits))
      masked.select(col("neighbor_id"), col("cvec"))
    else latestVecs(masked)
  }

  /** TRUE when every commit of the ADOPTED set is a fold target
    * carrying the one-row-per-id marker ([[foldAndSwap]] with
    * `oneRowPerId = true` — i.e. written by [[electLatestOne]]): then
    * read-path elections are the identity and can be skipped
    * (liveVectors, the fused tiers' exact re-rank). Takes the SAME
    * commit set the caller's scan resolved, never a fresh manifest
    * read (round-18 ADVICE — see [[liveVectors]]). Bounded FS
    * existence checks (one per visible fold target, normally one). */
  def compactedOnly(
      f: org.apache.hadoop.fs.FileSystem,
      commits: Seq[org.apache.hadoop.fs.FileStatus]): Boolean =
    commits.nonEmpty && commits.forall(s =>
      isFoldTarget(s.getPath.getName) &&
        f.exists(new org.apache.hadoop.fs.Path(s.getPath, OneRowMarker)))

  /** The fused tiers' exact re-rank, shared by the IVF-PQ and IVF-SQ
    * stores: join the approximate shortlist to one deterministic
    * vector per candidate ([[latestVecs]]) and the raw queries, score
    * exact cosine, rank. `vecs` must be (neighbor_id, cvec) with one
    * row per id; `queries` must be (query_id, qvec). */
  def exactRerank(
      shortlist: DataFrame, vecs: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val exact = shortlist
      .join(vecs, Seq("neighbor_id"))
      .join(queries, Seq("query_id"))
      .withColumn("cos", graft.ops.Dedup.cosine(col("qvec"), col("cvec")))
    // one deterministic row per (query, neighbor) by construction
    // (shortlist keyed by the pair; vecs/queries one row per id), so
    // the shared fold-ranked tail is the exact window it replaces —
    // one exchange, no sort (optimization round 17)
    rankSurvivors(
      exact.select(col("query_id"), col("neighbor_id"), col("cos")), k, "cos")
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
    // the distinct-id count rides the write as an observed metric
    // (optimization round 18): the read-back count was a whole extra
    // job per delete just to re-count rows this write produced
    val obs = org.apache.spark.sql.Observation()
    ids.select(col(idColName).cast("long").as("id"))
      .filter(col("id").isNotNull).distinct()
      .observe(obs, count(lit(1)).as("n"))
      .coalesce(1).write.mode("overwrite").parquet(commitDir)
    DedupStream.publishCommit(spark, root, s"batch=$batchTag")
    obs.get("n").asInstanceOf[Long]
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
      subdir: String = "tombstones",
      gcGraceMs: Long = defaultGcGraceMs): Unit = {
    if (applied.isEmpty) return
    val root = new org.apache.hadoop.fs.Path(s"$storeDir/$subdir")
    val f = fs(spark, root)
    if (!f.exists(root)) return
    DedupStream.writeNameFile(spark, root, "_FOLDED",
      DedupStream.readFolded(f, root) ++ applied)
    // stamp the applied dirs into the grace ledger BEFORE the manifest
    // rewrite (round-18 ADVICE): ordering alone must guarantee a crash
    // can only EXTEND a retired tombstone's grace, never skip it — a
    // dir that is already unlisted but neither stamped nor in _FOLDED
    // would classify as a never-visible stray and delete immediately,
    // reopening the straddling-reader race the window exists to close.
    // (The _FOLDED write above already protects this path; the
    // pre-stamp makes the guarantee independent of that coupling.)
    val now = System.currentTimeMillis()
    writeTextFile(spark, root, "_RETIRED",
      (readRetired(f, root) ++ applied.map(_ -> now))
        .toSeq.sorted.map { case (n, t) => s"$n $t" }.mkString("\n"))
    val remaining =
      DedupStream.visibleCommits(f, root).map(_.getPath.getName).toSet -- applied
    DedupStream.writeManifest(spark, root, remaining)
    // physical deletion deferred by the grace window — an in-flight
    // reader's minusTombstones still opens these files; the mask it
    // applies is against the generation it is reading, so the answer
    // is unchanged
    gcUnlisted(spark, root, gcGraceMs, stampNow = applied)
  }

  /** The fold-and-swap compaction skeleton: adopt the manifest, read
    * the whole visible store, let the caller transform it (identity
    * fold or refit re-encode), write the target commit hash-partitioned
    * and sorted, stage an optional pending marker, extend `_FOLDED`,
    * swap the manifest atomically, run the caller's post-swap step
    * (e.g. finish a pending promotion), then GC with a TIME-BASED
    * GRACE PERIOD ([[gcUnlisted]]): the commits this call replaced are
    * ledger-stamped and stay on disk until `gcGraceMs` has elapsed —
    * an in-flight reader whose leaf list was captured against a prior
    * manifest finishes its lazy read even when multiple folds complete
    * under it (the one-generation grace this replaces lost that race
    * whenever two folds landed inside one read's latency).
    * Never-visible strays are deleted immediately.
    * SINGLE-WRITER contract: run between upserts.
    *
    * @param extraWork   work even with one visible commit (a refit
    *                    must re-encode a single-commit store)
    * @param transform   visible rows → (target rows, target dir name,
    *                    optional (pendingMarkerName, pendingText))
    * @param afterSwap   runs after the manifest swap (before GC)
    * @param oneRowPerId the caller's transform guarantees exactly one
    *                    row per live id ([[electLatestOne]]) — stamps
    *                    the in-dir marker the compacted fast paths
    *                    ([[compactedOnly]]) require */
  def foldAndSwap(
      spark: SparkSession, storeDir: String, subdir: String,
      schema: StructType, abOf: Long => Column, sortCols: Seq[String],
      extraWork: Boolean,
      transform: DataFrame => (DataFrame, String, Option[(String, String)]),
      afterSwap: () => Unit = () => (),
      gcGraceMs: Long = defaultGcGraceMs,
      oneRowPerId: Boolean = false): Unit = {
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
        // one-row-per-id marker INSIDE the target dir, before the swap:
        // the fast paths ([[compactedOnly]]) trust the guarantee only
        // for folds that carry it (underscore-prefixed → invisible to
        // the parquet reader and the leaf enumeration)
        if (oneRowPerId)
          writeTextFile(spark,
            new org.apache.hadoop.fs.Path(s"$storeDir/$subdir/$target"),
            OneRowMarker, "1")
        pending.foreach { case (name, text) => writeTextFile(spark, dir, name, text) }
        DedupStream.writeNameFile(spark, root, "_FOLDED",
          DedupStream.readFolded(f, root) ++ visible.map(_.getPath.getName).toSet)
        DedupStream.writeManifest(spark, root, Set(target)) // THE commit point
        afterSwap()
        visible.map(_.getPath.getName).toSet
      } else Set.empty
    // grace-ledger GC: just-replaced dirs are stamped (never deleted in
    // the call that retired them), prior generations age out past the
    // grace window, never-visible strays go immediately
    gcUnlisted(spark, root, gcGraceMs, stampNow = justReplaced)
    // opportunistic sweep of the sibling tombstones root so retired
    // tombstone dirs age out even when no further deletes ever happen
    val tombRoot = new org.apache.hadoop.fs.Path(dir, "tombstones")
    if (f.exists(tombRoot)) gcUnlisted(spark, tombRoot, gcGraceMs, Set.empty)
  }
}
