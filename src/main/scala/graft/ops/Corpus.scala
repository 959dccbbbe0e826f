package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Corpus-assembly operators for a training-data pipeline: deterministic
  * stratified sampling and token-budget sequence packing — the two steps
  * between "cleaned documents" and "training shards".
  *
  * Both are engine-portable integer/hash algebra (no RNG, no UDF, no
  * partition-order dependence), so results are bit-identical across
  * cluster sizes, re-runs, and engines — which is what makes a 100 TB
  * corpus build auditable and incrementally re-runnable.
  */
object Corpus {

  /** Equality-safe stratum key (round-18 ADVICE): a BinaryType stratum
    * collects as Array[Byte], whose REFERENCE equality and identity
    * hashCode would make every row a "new stratum" and every offsets-map
    * lookup miss — silently corrupting pack ids. Wrap byte arrays in an
    * element-wise-equal Seq before using them as map keys or boundary
    * comparisons; every other type keeps its own JVM equality (the
    * `<=>`-join semantics the driver folds replaced). */
  private def eqKey(v: Any): Any = v match {
    case b: Array[Byte] => scala.collection.immutable.ArraySeq.unsafeWrapArray(b)
    case x => x
  }

  /** Uniform per-row bucket in [0, 1000): the first 8 hex chars of
    * md5(id) read as a 32-bit integer, mod 1000. Deterministic in any
    * engine with md5 (DuckDB: `CAST('0x'||substr(md5(id),1,8) AS
    * BIGINT) % 1000`). */
  def hashBucketPermille(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % 1000)

  /** Deterministic stratified sample: keep a row iff its hash bucket
    * falls under the stratum's per-mille quota.
    *
    * Properties a 100 TB corpus build needs (and `df.sample()` lacks):
    *   - membership is a pure function of the id — growing the corpus,
    *     changing partitioning, or re-running never flips a decision;
    *   - per-stratum rates tune source mixture (the standard
    *     data-mixture knob) in one pass, no per-stratum jobs;
    *   - the filter is codegen'd column algebra that pushes into the
    *     scan's residual — no shuffle at all.
    *
    * @param quotaPermille per-stratum keep rate in ‰ (0–1000)
    * @param defaultPermille rate for strata not in the map
    */
  def hashSample(
      df: DataFrame,
      strataCol: String,
      quotaPermille: Map[String, Int],
      defaultPermille: Int,
      idCol: String = "doc_id"): DataFrame = {
    val quota = quotaPermille.foldLeft(lit(defaultPermille): Column) {
      case (acc, (stratum, q)) => when(col(strataCol) === stratum, lit(q)).otherwise(acc)
    }
    df.filter(hashBucketPermille(col(idCol)) < quota)
  }

  /** Token-budget sequence packing (contiguous quota packing): within
    * each stratum, docs ordered by id are laid out head-to-tail and cut
    * into packs of `budgetTokens`: a doc belongs to the pack its FIRST
    * token lands in.
    *
    *   pack_id     = floor(running_start / budget)
    *   pack_offset = running_start % budget
    *
    * No sequential bin state (closed-form), so the running token sum
    * is a PREFIX SUM — and computed scalably, not as one window per
    * stratum: a `Window.partitionBy(stratum)` cumsum funnels an
    * entire stratum through ONE task's sort, and a web-corpus stratum
    * can be half of 100 TB. Instead, the [[globalIndex]] recipe
    * generalized to token sums: range-partition on (stratum, id),
    * per-(partition, stratum) token totals (a ≤ numPartitions+strata
    * row collect — range layout means each partition spans few
    * strata), exclusive per-stratum offsets accumulated driver-side
    * in partition order (integer arithmetic — order-independent,
    * identical to the single-window form), broadcast back, and a
    * partition-LOCAL cumsum window keyed by (partition, stratum) —
    * bounded by the partition size whatever the stratum skew. This is
    * the quota variant of greedy packing: a pack may overflow by at
    * most one document tail instead of closing early — the standard
    * trade for a closed-form formulation. (True greedy
    * close-on-overflow needs per-row sequential state — that is
    * [[greedyPack]]'s streamed mapPartitions.) The input is persisted
    * across the two jobs (module cache contract — caller clearCache
    * after consuming).
    *
    * The driver-side offsets fold is O(partitions × strata-spanned);
    * range layout keeps it ≈ partitions + distinct strata, but a
    * high-cardinality stratum column (e.g. per-domain) can still blow
    * it up, so the collect is bounded by `maxOffsetRows` (fails fast
    * with guidance rather than silently exhausting driver memory).
    */
  def quotaPack(
      df: DataFrame,
      strataCol: String,
      tokensCol: Column,
      budgetTokens: Int,
      idCol: String = "doc_id",
      numPartitions: Option[Int] = None,
      maxOffsetRows: Int = 1 << 20): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(maxOffsetRows > 0, "maxOffsetRows must be positive")
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val keyed = df
      .withColumn("_tok", tokensCol.cast("long"))
      .repartitionByRange(n, col(strataCol), col(idCol))
      .sortWithinPartitions(col(strataCol), col(idCol))
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // limit+1 bounds the driver transfer whatever the stratum
    // cardinality; TakeOrdered keeps the (stratum, pid) order the fold
    // below depends on
    val partials = keyed.groupBy(col("_pid"), col(strataCol))
      .agg(sum(col("_tok")).as("_t"))
      .orderBy(col(strataCol).asc, col("_pid").asc)
      .limit(maxOffsetRows + 1)
      .collect()
    require(partials.length <= maxOffsetRows,
      s"quotaPack offsets exceed maxOffsetRows=$maxOffsetRows " +
        s"(partitions=$n × strata '$strataCol' too fine for a driver fold); " +
        "coarsen the stratum column, raise maxOffsetRows, or use " +
        "hashSample + PackingStream.greedyPackStream for per-key packing")
    // exclusive running offset per (stratum, pid), resetting at each
    // stratum boundary; long arithmetic — no summation-order effects
    var curStratum: Any = null
    var seenAny = false
    var acc = 0L
    val offMap = partials.map { r =>
      val s = eqKey(r.get(1)) // equality-safe: binary strata compare by value
      if (!seenAny || s != curStratum) { curStratum = s; seenAny = true; acc = 0L }
      val row = ((r.getInt(0), s), acc)
      acc += r.getLong(2)
      row
    }.toMap
    // positional per-stratum prefix sum over the cached (stratum, id)
    // sort order (optimization round 17): the (_pid, stratum) cumsum
    // WINDOW re-exchanged and re-sorted the whole relation (a window
    // needs hash partitioning) and joined the offsets back in; the
    // cached partitions are already sorted, strata contiguous within
    // them, so one streaming mapPartitions carries the running total,
    // re-seeding from the offsets map at each stratum boundary (the
    // map key is (pid, stratum-value) — NULL strata are legitimate
    // groups and Scala map equality keeps them, the `<=>` this
    // replaces). Exact long arithmetic, bit-identical start values.
    val offBc = spark.sparkContext.broadcast(offMap)
    val tokIdx = keyed.schema.fieldIndex("_tok")
    val pidIdx = keyed.schema.fieldIndex("_pid")
    val stIdx = keyed.schema.fieldIndex(strataCol)
    val stType = keyed.schema(strataCol).dataType
    // INTERNAL-ROW pass (optimization round 18): the external-Row
    // mapPartitions paid a full deserialize/serialize of EVERY column
    // (text payload included) per row just to append the running
    // start; InternalRowOps.appendLongs streams the cached internal
    // rows and appends the long with one UnsafeProjection. The carried
    // stratum key converts to its external Scala value (a copy — safe
    // across reused row buffers, and the exact key type of the
    // driver-collected offsets map), eqKey-wrapped for binary strata.
    org.apache.spark.sql.graft.InternalRowOps.appendLongs(keyed, Seq("_start")) { () =>
      val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToScalaConverter(stType)
      var cur: Any = null
      var seen = false
      var run = 0L
      val out = new Array[Long](1)
      (r: org.apache.spark.sql.catalyst.InternalRow) => {
        val st = eqKey(conv(r.get(stIdx, stType)))
        if (!seen || st != cur) {
          cur = st; seen = true
          run = offBc.value.getOrElse((r.getInt(pidIdx), st), 0L)
        }
        out(0) = run
        run += r.getLong(tokIdx)
        out
      }
    }
      .withColumn("pack_id", floor(col("_start") / budgetTokens).cast("long"))
      .withColumn("pack_offset", (col("_start") % budgetTokens).cast("long"))
      .drop("_tok", "_pid", "_start")
  }

  /** Deterministic EXACT-size stratified subset: the k docs per stratum
    * with the smallest md5(id) — a uniform "random" draw that is a pure
    * function of the ids, so growing the corpus or re-running never
    * swaps a chosen doc for an unchosen one arbitrarily (membership
    * changes only where new ids genuinely displace larger hashes).
    * [[hashSample]] gives a RATE per stratum; this gives a COUNT — the
    * knob a fixed-token-budget mixture needs. Ties broken by id so the
    * result is total-ordered.
    *
    * Two-phase top-k, because a single `Window.partitionBy(stratum)`
    * would funnel an entire stratum through ONE task's sort — a
    * billion-doc 'web' stratum is an OOM/straggler. Phase 1 winnows to
    * the k smallest per (input-partition, stratum) — shuffle on the
    * salted key is balanced by construction; phase 2 ranks only the
    * ≤ k × numPartitions survivors per stratum. The winnow cannot drop
    * a global top-k row (each survivor set contains its partition's
    * candidates), so the result is identical to the one-window form. */
  def stratifiedTopK(
      df: DataFrame,
      strataCol: String,
      k: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "k must be positive")
    val draw = md5(col(idCol).cast("string"))
    val local = Window.partitionBy(col(strataCol), col("_salt"))
      .orderBy(draw.asc, col(idCol).asc)
    val global = Window.partitionBy(col(strataCol))
      .orderBy(draw.asc, col(idCol).asc)
    df.withColumn("_salt", spark_partition_id())
      .withColumn("_lr", row_number().over(local))
      .filter(col("_lr") <= k)
      .withColumn("draw_rank", row_number().over(global).cast("long"))
      .filter(col("draw_rank") <= k)
      .drop("_salt", "_lr")
  }

  /** Deterministic global shuffle + EXACT fixed-size shard assignment:
    * order the whole corpus by (md5(id), id) — a uniform, re-run-stable
    * "random" permutation — and cut it into consecutive shards of
    * `shardSize` docs: the "shuffle then write N-doc training shards"
    * step at the end of every corpus build. Output adds
    * (shard_id, pos_in_shard), both 0-based.
    *
    * A global `row_number()` window would funnel 100 TB through ONE
    * task's sort. Instead, the classic scalable global-index recipe:
    * range-partition on the draw key (partition p then holds a
    * contiguous slice of the global order), sort within partitions,
    * derive each row's partition-local ordinal from
    * `monotonically_increasing_id` (pid ⋘ 33 | local counter), count
    * rows per partition (a numPartitions-row aggregate), and add the
    * exclusive prefix-sum offset via a broadcast join on pid. Two jobs,
    * no single-task stage, shuffle carries each row once.
    *
    * The input is persisted between the two jobs so both observe the
    * SAME physical partitioning (same cache-lifecycle contract as the
    * Dedup pairwise ops: callers in a long-lived session clearCache
    * after consuming the result). */
  /** Scalable 0-based GLOBAL INDEX over a total order: range-partition
    * on the sort keys (partition p then holds a contiguous slice of
    * the order), sort within partitions, derive partition-local
    * ordinals from `monotonically_increasing_id` (pid ⋘ 33 | local
    * counter), count rows per partition, add the exclusive prefix-sum
    * offset via a broadcast join. Two jobs, no single-task global
    * window; the input is persisted so both observe the same physical
    * partitioning (caller releases via clearCache per the module cache
    * contract — [[shuffleShards]]/[[interleaveByWeight]] consume it).
    *
    * `sortCols` must be a TOTAL order (include a unique tiebreak) or
    * ranks within ties are partition-dependent. */
  private[ops] def globalIndex(
      df: DataFrame,
      sortCols: Seq[org.apache.spark.sql.Column],
      rankCol: String,
      numPartitions: Option[Int]): DataFrame = {
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    // explicit partition count: AQE must not re-coalesce between the
    // count job and the assignment job
    val keyed = df
      .repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("_pid", shiftright(col("_mid"), 33).cast("int"))
      .withColumn("_loc", col("_mid").bitwiseAND(lit((1L << 33) - 1)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = keyed.groupBy(col("_pid")).agg(count(lit(1)).as("_cnt"))
      .orderBy(col("_pid")).collect()
    var acc = 0L
    val offMap = counts.map { r =>
      val row = (r.getInt(0), acc); acc += r.getLong(1); row
    }.toMap
    // offsets as an n-element literal array indexed by _pid instead of
    // a broadcast join: one BroadcastExchange + BroadcastHashJoin fewer
    // per call, pure codegen (optimization round 17 — the globalRank
    // shape)
    val offArr = array((0 until n).map(p => lit(offMap.getOrElse(p, 0L))): _*)
    keyed
      .withColumn(rankCol, element_at(offArr, col("_pid") + 1) + col("_loc"))
      .drop("_mid", "_pid", "_loc")
  }

  def shuffleShards(
      df: DataFrame,
      shardSize: Int,
      idCol: String = "doc_id",
      numPartitions: Option[Int] = None): DataFrame = {
    require(shardSize > 0, "shardSize must be positive")
    val keyed = df.withColumn("_draw", md5(col(idCol).cast("string")))
    globalIndex(keyed, Seq(col("_draw"), col(idCol)), "_rank", numPartitions)
      .withColumn("shard_id", (col("_rank") / shardSize).cast("long"))
      .withColumn("pos_in_shard", (col("_rank") % shardSize).cast("long"))
      .drop("_draw", "_rank")
  }

  /** Per-shard manifest of a [[shuffleShards]] assignment: the
    * verification artifact a training-data delivery ships beside its
    * shard files — one row per shard with the row count, the
    * token-estimate total, an ORDER-INSENSITIVE content checksum
    * (Σ over docs of the first 8 md5 hex digits as int64 — engine-
    * portable, and any dropped/duplicated/altered document moves it),
    * and the shard's first document. One aggregation over the shard
    * assignment; no windows, no collects, no join back ([[shuffleShards]]
    * preserves every input column, so `textCol` rides along). */
  def shardManifest(
      df: DataFrame, shardSize: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    manifestAgg(shuffleShards(df, shardSize, idCol), idCol, textCol)

  /** The manifest aggregation over an ALREADY-ASSIGNED relation (one
    * that carries `shard_id`/`pos_in_shard` plus the data columns) —
    * lets [[writeShards]] derive data files and manifest from the SAME
    * assignment instead of re-running the global sort. */
  private def manifestAgg(
      assigned: DataFrame, idCol: String, textCol: String): DataFrame =
    assigned.groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(ceil(length(col(textCol)) / lit(4.0)).cast("long")).as("sum_tokens"),
        sum(conv(substring(md5(col(textCol)), 1, 8), 16, 10).cast("long"))
          .as("content_sum"),
        min(struct(col("pos_in_shard").as("p"), col(idCol).as("d"))).as("_f"))
      .select(col("shard_id"), col("n_docs"), col("sum_tokens"),
        col("content_sum"), col("_f.d").as("first_doc"))

  /** Write the corpus as deterministic training shards + manifest:
    * `outDir/data/shard_id=K/` parquet (each shard's rows carry
    * `pos_in_shard` so a reader restores the exact training order) and
    * `outDir/manifest/` ([[shardManifest]] rows). Returns the manifest
    * AS WRITTEN (re-read from `outDir/manifest`), so the returned rows
    * can never diverge from the shipped artifact.
    * The delivery contract: a consumer re-derives the manifest from
    * the data files and rejects the delivery on any mismatch —
    * ShardWriterSpec does exactly that round-trip. At scale the data
    * write is one shuffle by shard (the assignment's own global sort,
    * paid ONCE — both the data write and the manifest aggregate scan
    * the same assigned relation, which [[globalIndex]] pins with its
    * internal persist, so they cannot observe different assignments
    * even under a non-deterministic input). */
  def writeShards(
      df: DataFrame, outDir: String, shardSize: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val assigned = shuffleShards(df, shardSize, idCol)
    assigned.write.partitionBy("shard_id").mode("overwrite")
      .parquet(s"$outDir/data")
    manifestAgg(assigned, idCol, textCol)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/manifest")
    df.sparkSession.read.parquet(s"$outDir/manifest")
  }

  /** CORPUS DELTA AUDIT — the delivery-diff step: given two versions of
    * a corpus, classify every document id as `added` (new only),
    * `removed` (old only), `changed` (both sides, content hash moved),
    * or `unchanged`. What a 100 TB re-crawl actually ships downstream
    * is this delta, not the full corpus — and the audit is what lets a
    * consumer invalidate exactly the dedup/index state the change
    * touches.
    *
    * Scale shape: each side collapses to (id, md5) AT THE SCAN (16-byte
    * hash, text never shuffles), then ONE full-outer sort-merge join on
    * the id. No windows, no collects. */
  def deltaAudit(oldDf: DataFrame, newDf: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // dirty-input guard: a duplicated id row would otherwise emit one
    // status row per copy-pair. Collapsing to max(md5) per id is
    // DETERMINISTIC (unlike a dropDuplicates pick) and rides the same
    // shuffle as the join; conflicting duplicate ids audit as the
    // lexicographically-greatest content hash on each side.
    val o = oldDf.select(col(idCol), md5(col(textCol)).as("_h_old"))
      .groupBy(idCol).agg(max("_h_old").as("_h_old"))
    val n = newDf.select(col(idCol), md5(col(textCol)).as("_h_new"))
      .groupBy(idCol).agg(max("_h_new").as("_h_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("_h_old").isNull, lit("added"))
          .when(col("_h_new").isNull, lit("removed"))
          .when(col("_h_old") =!= col("_h_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Deterministic WEIGHTED MIXTURE ORDER — the training-schedule step:
    * each stratum's documents (in their own hash-shuffled order) are
    * interleaved so that after any prefix of the output, every stratum
    * has contributed in proportion to its weight. The standard
    * data-mixture scheduler (T5/Pile-style proportional sampling) made
    * deterministic: a stratum-s document with within-stratum ordinal r
    * (1-based) gets virtual position (r − ½) / weight(s), and the
    * output is the total order by (position, stratum, id). A weight-2
    * stratum appears twice as often as a weight-1 stratum at every
    * scale of the prefix.
    *
    * Scale shape: BOTH ranks come from [[globalIndex]] — within-stratum
    * ordinals are the global (stratum, draw, id) index minus the
    * stratum's first index (one tiny groupBy-min, broadcast back), so
    * no per-stratum window ever funnels a billion-doc stratum through
    * one task; the final order is a second globalIndex. Output adds
    * `train_rank` (0-based). */
  def interleaveByWeight(
      df: DataFrame,
      strataCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0,
      idCol: String = "doc_id",
      numPartitions: Option[Int] = None): DataFrame = {
    require(defaultWeight > 0, "defaultWeight must be positive")
    require(weights.values.forall(_ > 0), "weights must be positive")
    val w = weights.foldLeft(lit(defaultWeight): org.apache.spark.sql.Column) {
      case (acc, (s, v)) => when(col(strataCol) === s, lit(v)).otherwise(acc)
    }
    val keyed = df.withColumn("_draw", md5(col(idCol).cast("string")))
    val indexed = globalIndex(keyed,
      Seq(col(strataCol), col("_draw"), col(idCol)), "_gr", numPartitions)
    // null-SAFE stratum equality (same row-loss class fixed in
    // quotaPack/greedyPackChunked: a USING join's EqualTo silently
    // drops NULL-stratum rows, and NULL is a legitimate stratum)
    val firstPerStratum = indexed.groupBy(col(strataCol))
      .agg(min(col("_gr")).as("_g0"))
      .withColumnRenamed(strataCol, "_s0")
    val positioned = indexed
      .join(broadcast(firstPerStratum), col(strataCol) <=> col("_s0"))
      .drop("_s0")
      // 1-based within-stratum ordinal, exact in double to 2^52 docs
      .withColumn("_pos", (col("_gr") - col("_g0") + 0.5) / w)
    globalIndex(positioned.drop("_draw"),
      Seq(col("_pos"), col(strataCol), col(idCol)), "train_rank", numPartitions)
      .drop("_gr", "_g0", "_pos")
  }

  /** TRUE greedy packing (close-on-overflow): within each stratum, docs
    * in id order are appended while they fit; a doc that would overflow
    * CLOSES the current pack and opens the next, so no pack ever
    * exceeds `budgetTokens` — except a single document that alone
    * exceeds the budget, which gets a pack to itself.
    *
    * Greedy bin state is inherently sequential PER STRATUM, so the plan
    * is `repartition(stratum)` + `sortWithinPartitions(stratum, id)` +
    * one `mapPartitions` scan: strata pack in parallel across the
    * cluster, each stratum in one streamed pass (no window buffering,
    * no driver involvement). The closed-form [[quotaPack]] stays the
    * shuffle-light default when tail-overflow is acceptable.
    *
    * SCALE WARNING: parallelism here is bounded by the number of
    * strata — one task streams an ENTIRE stratum. With few strata
    * (source/lang) over a 100 TB corpus that is a terabytes-long
    * single task. At that scale use [[greedyPackChunked]] (bounded
    * task size, same no-overflow guarantee), [[quotaPack]] (closed
    * form, at-most-one-doc tail overflow), or
    * `PackingStream.greedyPackStream` (O(strata) state, incremental).
    * This exact mode remains the reference semantics for oracles and
    * for modest stratum sizes. */
  def greedyPack(
      df: DataFrame,
      strataCol: String,
      tokensCol: Column,
      budgetTokens: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val withTok = df.withColumn("_n_tok", tokensCol.cast("long"))
    val si = withTok.schema.fieldIndex(strataCol)
    val stType = withTok.schema(strataCol).dataType
    val ti = withTok.schema.fieldIndex("_n_tok")
    // INTERNAL-ROW pass (optimization round 18) — see quotaPack
    org.apache.spark.sql.graft.InternalRowOps.appendLongs(
      withTok
        .repartition(col(strataCol))
        .sortWithinPartitions(col(strataCol), col(idCol)),
      Seq("pack_id", "pack_offset")) { () =>
      val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToScalaConverter(stType)
      var stratum: Any = null
      var first = true
      var pack = 0L
      var fill = 0L
      val out = new Array[Long](2)
      (r: org.apache.spark.sql.catalyst.InternalRow) => {
        val s = eqKey(conv(r.get(si, stType))) // value equality for binary strata
        if (first || s != stratum) { stratum = s; first = false; pack = 0L; fill = 0L }
        val n = r.getLong(ti)
        if (fill > 0 && fill + n > budgetTokens) { pack += 1; fill = 0L }
        out(0) = pack
        out(1) = fill
        fill += n
        out
      }
    }
      .drop("_n_tok")
  }

  /** Scale-safe greedy packing: [[greedyPack]]'s close-on-overflow
    * semantics with BOUNDED task size. Each stratum is sub-split into
    * deterministic chunks of `chunkRows` consecutive docs (by
    * within-stratum id order); the greedy scan runs per (stratum,
    * chunk) and the open pack CLOSES at every chunk boundary. Packs
    * therefore never exceed `budgetTokens` (same guarantee as
    * [[greedyPack]], same single-oversize-doc exception), at the cost
    * of at most one under-filled pack per chunk — the deterministic,
    * auditable trade that makes the scan parallel.
    *
    * Pack ids are unique and monotone within a stratum but SPARSE:
    * chunk c's packs are numbered from c × chunkRows (a chunk of
    * chunkRows docs can open at most chunkRows packs), so no
    * cross-chunk coordination — and no second pass — is needed.
    *
    * Scale shape: within-stratum ordinals come from [[globalIndex]]
    * (range partition + two jobs, no per-stratum window), then one
    * shuffle on (stratum, chunk) — a key whose group size is ≤
    * chunkRows BY CONSTRUCTION, immune to stratum skew. A half-corpus
    * stratum becomes corpus/chunkRows parallel tasks instead of one.
    * globalIndex persists its input across its two jobs (module cache
    * contract — caller clearCache after consuming). */
  def greedyPackChunked(
      df: DataFrame,
      strataCol: String,
      tokensCol: Column,
      budgetTokens: Int,
      chunkRows: Int,
      idCol: String = "doc_id",
      numPartitions: Option[Int] = None): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(chunkRows > 0, "chunkRows must be positive")
    val withTok = df.withColumn("_n_tok", tokensCol.cast("long"))
    val indexed = globalIndex(withTok,
      Seq(col(strataCol), col(idCol)), "_gr", numPartitions)
    // null-SAFE stratum equality: a USING join's EqualTo would silently
    // drop NULL-stratum rows (the quotaPack regression ADVICE caught,
    // same class here) — NULL is a legitimate stratum of its own
    val firstPerStratum = indexed.groupBy(col(strataCol))
      .agg(min(col("_gr")).as("_g0"))
      .withColumnRenamed(strataCol, "_s0")
    val chunked = indexed
      .join(broadcast(firstPerStratum), col(strataCol) <=> col("_s0"))
      .withColumn("_chunk", ((col("_gr") - col("_g0")) / chunkRows).cast("long"))
      .drop("_gr", "_g0", "_s0")
    val si = chunked.schema.fieldIndex(strataCol)
    val stType = chunked.schema(strataCol).dataType
    val ci = chunked.schema.fieldIndex("_chunk")
    val ti = chunked.schema.fieldIndex("_n_tok")
    // INTERNAL-ROW pass (optimization round 18) — see quotaPack
    org.apache.spark.sql.graft.InternalRowOps.appendLongs(
      chunked
        .repartition(col(strataCol), col("_chunk"))
        .sortWithinPartitions(col(strataCol), col("_chunk"), col(idCol)),
      Seq("pack_id", "pack_offset")) { () =>
      val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
        .createToScalaConverter(stType)
      var stratum: Any = null
      var chunk = -1L
      var first = true
      var pack = 0L
      var fill = 0L
      val out = new Array[Long](2)
      (r: org.apache.spark.sql.catalyst.InternalRow) => {
        val s = eqKey(conv(r.get(si, stType))) // value equality for binary strata
        val c = r.getLong(ci)
        if (first || s != stratum || c != chunk) {
          stratum = s; chunk = c; first = false
          pack = c * chunkRows; fill = 0L
        }
        val n = r.getLong(ti)
        if (fill > 0 && fill + n > budgetTokens) { pack += 1; fill = 0L }
        out(0) = pack
        out(1) = fill
        fill += n
        out
      }
    }
      .drop("_n_tok", "_chunk")
  }

  /** TEMPERATURE-scaled mixture sampling — the GPT-3/LLaMA source-
    * mixing rule made deterministic: stratum s receives a quota
    * ∝ count(s)^alpha of a `totalN`-document budget (alpha = 1 →
    * proportional, alpha → 0 → uniform per stratum; 0 < alpha < 1
    * upweights tail sources, the published mixing trick), and the
    * members are the quota-many smallest md5 draws within the stratum
    * (the [[stratifiedTopK]] draw — partition-independent, displacement
    * -only growth).
    *
    * ORACLE-EXACT by integer arithmetic: weights are
    * floor(count^alpha · 2^20) as big integers, quotas are
    * floor(totalN·w/W) plus a largest-remainder bonus (ties by the
    * stratum's string form, ascending), each capped at the stratum's
    * count — every step exact, so an independent engine (HUGEINT SQL)
    * reproduces the sample bit-for-bit at alpha = 0.5, where x^alpha
    * is IEEE `sqrt` (correctly rounded everywhere; `pow` is not, so
    * other alphas are spec-gated rather than oracled). Capping can
    * leave the sample below `totalN` when a stratum's quota exceeds
    * its population — deliberate: silent redistribution would change
    * the published rule.
    *
    * Scale shape: one strata-bounded groupBy-count collect (guarded by
    * `maxStrata`), driver-local exact quota arithmetic, a broadcast
    * null-SAFE quota join, and the two-phase salted top-k draw — no
    * per-stratum single-task window. Output adds `draw_rank`
    * (1-based within stratum). */
  def temperatureSample(
      df: DataFrame,
      strataCol: String,
      alpha: Double,
      totalN: Long,
      idCol: String = "doc_id",
      maxStrata: Int = 100000): DataFrame = {
    require(totalN > 0, "totalN must be positive")
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1] (got $alpha)")
    val spark = df.sparkSession
    val counts0 = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_n"))
      .limit(maxStrata + 1).collect()
    require(counts0.length <= maxStrata,
      s"temperatureSample: more than maxStrata=$maxStrata strata in '$strataCol' — " +
        "coarsen the stratum column or raise maxStrata deliberately")
    // floor(n^alpha · 2^20) as exact integers; sqrt for alpha=0.5 is
    // IEEE-correctly-rounded (pow is not), which is what makes the
    // HUGEINT oracle reproducible
    def wt(n: Long): BigInt = {
      val x = if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
      BigInt(math.floor(x * (1L << 20)).toLong)
    }
    val cs = counts0.map(r => (r.get(0), r.getLong(1)))
    val bigW = cs.map(c => wt(c._2)).sum
    require(bigW > 0, "temperatureSample: zero total weight")
    val tn = BigInt(totalN)
    val base = cs.map { case (sv, n) =>
      val w = wt(n)
      (sv, n, (tn * w) / bigW, (tn * w) % bigW)
    }
    val bonus = (tn - base.map(_._3).sum).toLong max 0L
    val bonusSet = base
      .sortBy { case (sv, _, _, rem) => (-rem, String.valueOf(sv)) }
      .take(bonus.toInt).map(t => String.valueOf(t._1)).toSet
    val quota = base.map { case (sv, n, q, _) =>
      (sv, ((q + (if (bonusSet(String.valueOf(sv))) 1 else 0)) min BigInt(n)).toLong)
    }
    val sField = df.schema(strataCol)
    val qSchema = StructType(Seq(
      StructField("_s0", sField.dataType, nullable = true),
      StructField("_k", LongType, nullable = false)))
    val quotaDf = spark.createDataFrame(
      spark.sparkContext.parallelize(quota.map(t => Row(t._1, t._2)).toSeq, 1), qSchema)
    // null-SAFE stratum equality: NULL is a legitimate stratum (same
    // contract as quotaPack/greedyPackChunked/interleaveByWeight)
    val joined = df.join(broadcast(quotaDf), col(strataCol) <=> col("_s0"))
    val draw = md5(col(idCol).cast("string"))
    val local = Window.partitionBy(col(strataCol), col("_salt"))
      .orderBy(draw.asc, col(idCol).asc)
    val global = Window.partitionBy(col(strataCol))
      .orderBy(draw.asc, col(idCol).asc)
    // two-phase salted draw (see stratifiedTopK): no stratum ever
    // funnels through one task's sort
    joined.withColumn("_salt", spark_partition_id())
      .withColumn("_lr", row_number().over(local))
      .filter(col("_lr") <= col("_k"))
      .withColumn("draw_rank", row_number().over(global).cast("long"))
      .filter(col("draw_rank") <= col("_k"))
      .drop("_salt", "_lr", "_s0", "_k")
  }

  /** CONCAT-AND-CHUNK sequence packing — the standard LLM-pretraining
    * prep: all documents, in id order, are concatenated into one token
    * stream and cut into fixed `seqTokens`-token training sequences.
    * Unlike the pack family above ([[quotaPack]]/[[greedyPack]]), a
    * document CROSSES sequence boundaries: each output row is one
    * (sequence, document-piece) assignment —
    *
    *   seq_id    = which training sequence the piece lands in
    *   seq_off   = the piece's first token position within the sequence
    *   doc_off   = how far into the document the piece starts
    *   piece_len = tokens of this doc in this sequence
    *
    * so Σ piece_len per seq_id = seqTokens (except the final partial
    * sequence), and Σ piece_len per doc = the doc's token count —
    * exactly the layout a sequence-builder needs to emit input_ids plus
    * attention-boundary (doc-separator) masks.
    *
    * Scale shape: the running token offset is the [[quotaPack]]
    * two-phase prefix sum WITHOUT strata — range-partition on id,
    * O(partitions) per-partition totals collected and folded
    * driver-side (exact long arithmetic, order-independent), broadcast
    * back, partition-local cumsum window. The boundary-crossing
    * explode emits `ceil(tok/seqTokens)+1` rows per doc — bounded by
    * the DOCUMENT's size, never the corpus — via `sequence()` over the
    * [first_seq, last_seq] span. No global window, no sequential state;
    * results are bit-identical under any partitioning.
    *
    * Zero-token docs (empty text under the caller's tokenizer) occupy
    * no stream positions and emit no rows. Input is persisted across
    * the two jobs (module cache contract — caller clearCache after
    * consuming, or use the returned frame promptly). */
  def packSequences(
      df: DataFrame,
      tokensCol: Column,
      seqTokens: Int,
      idCol: String = "doc_id",
      numPartitions: Option[Int] = None): DataFrame = {
    require(seqTokens > 0, "seqTokens must be positive")
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val keyed = df
      .withColumn("_tok", tokensCol.cast("long"))
      .filter(col("_tok") > 0)
      .repartitionByRange(n, col(idCol))
      .sortWithinPartitions(col(idCol))
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partials = keyed.groupBy(col("_pid")).agg(sum(col("_tok")).as("_t"))
      .orderBy(col("_pid").asc).collect()
    var acc = 0L
    val offMap = partials.map { r =>
      val row = (r.getInt(0), acc); acc += r.getLong(1); row
    }.toMap
    // positional prefix sum over the cached sort order (optimization
    // round 17): the partition-local cumsum WINDOW could never reuse
    // the range partitioning (it needs hashpartitioning(_pid)), so it
    // re-exchanged and re-sorted the whole relation and joined the
    // offsets back in. The cached partitions are already in id order —
    // one streaming mapPartitions carries the running token total,
    // exact long arithmetic, bit-identical _start values.
    val offBc = spark.sparkContext.broadcast(offMap)
    val tokIdx = keyed.schema.fieldIndex("_tok")
    val pidIdx = keyed.schema.fieldIndex("_pid")
    val b = lit(seqTokens.toLong)
    // INTERNAL-ROW pass (optimization round 18) — see quotaPack: no
    // external-Row codec over the text payload, one UnsafeProjection
    org.apache.spark.sql.graft.InternalRowOps.appendLongs(keyed, Seq("_start")) { () =>
      var run = -1L
      val out = new Array[Long](1)
      (r: org.apache.spark.sql.catalyst.InternalRow) => {
        if (run < 0) run = offBc.value.getOrElse(r.getInt(pidIdx), 0L)
        out(0) = run
        run += r.getLong(tokIdx)
        out
      }
    }
      // `div` = exact long division (Column./ is double — unsafe past 2^53)
      .withColumn("seq_id",
        explode(sequence(expr(s"_start div ${seqTokens}L"),
          expr(s"(_start + _tok - 1) div ${seqTokens}L"))))
      .withColumn("_pstart", greatest(col("_start"), col("seq_id") * b))
      .withColumn("seq_off", (col("_pstart") - col("seq_id") * b).cast("long"))
      .withColumn("doc_off", (col("_pstart") - col("_start")).cast("long"))
      .withColumn("piece_len",
        (least(col("_start") + col("_tok"), (col("seq_id") + 1) * b) - col("_pstart"))
          .cast("long"))
      .drop("_tok", "_pid", "_opid", "_off", "_start", "_pstart")
  }

  /** Exact GLOBAL row_number without a single-partition window — the
    * [[packSequences]] two-phase shape generalized to ranking: range-
    * partition on the sort order (a distributed sort, every partition
    * holding a contiguous key range), collect O(partitions) per-
    * partition COUNTS, fold exclusive offsets driver-side, broadcast
    * them back, and add a partition-LOCAL row_number. Bit-identical to
    * `row_number() OVER (ORDER BY …)` under a total order (pass a
    * tie-break column), but the sort and the numbering both stay at
    * full parallelism — the naive global window funnels the corpus
    * through ONE task. Input is persisted across the two jobs (module
    * cache contract). `order` must be deterministic and total. */
  def globalRank(df: DataFrame, order: Seq[Column],
      rankCol: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val keyed = df
      .repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val partials = keyed.groupBy(col("_pid")).agg(count(lit(1)).as("_c"))
      .orderBy(col("_pid").asc).collect()
    var acc = 0L
    val offMap = partials.map { r =>
      val row = (r.getInt(0), acc); acc += r.getLong(1); row
    }.toMap
    // POSITIONAL local numbering over the already-sorted cached
    // partitions (optimization round 17): the partition-local window
    // this replaces could never reuse the range partitioning (a window
    // needs hashpartitioning(_pid)), so it re-exchanged and re-sorted
    // the whole relation and joined the offsets back in. The low 33
    // bits of monotonically_increasing_id ARE the record position
    // within the evaluating partition (documented layout: partition
    // index high, record number low), evaluated directly over the
    // cached sort order — so rank = offset(_pid) + position + 1 with
    // ZERO additional exchange, sort, or join; the offsets ride as one
    // n-element literal array indexed by _pid. Determinism is the
    // window's own contract: `order` must be total, and positions are
    // recomputed from the same sort on cache eviction.
    val offArr = array((0 until n).map(p => lit(offMap.getOrElse(p, 0L))): _*)
    keyed
      .withColumn(rankCol,
        element_at(offArr, col("_pid") + 1)
          + monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1))
          + lit(1L))
      .drop("_pid")
  }

  /** The BOUNDED head of [[globalRank]]: the top-`k` rows under a total
    * `order`, each with its exact global row_number (optimization
    * round 18). When a caller keeps only `rank <= k`, ranking the whole
    * relation pays a corpus-wide range exchange + sort + cache + a
    * per-partition-counts collect for rows the filter then throws away;
    * `orderBy().limit(k)` instead plans `TakeOrderedAndProject` — every
    * scan task keeps a k-row heap, the driver merges O(k·partitions)
    * rows, nothing corpus-shaped shuffles or persists — and the
    * row_number window then runs over ≤ k rows, where its
    * SinglePartition exchange (the very thing [[globalRank]] exists to
    * avoid on corpus-sized input) is exactly right. Bit-identical to
    * `globalRank(df, order).filter(rank <= k)` under a total order. */
  def rankedHead(df: DataFrame, order: Seq[Column], k: Int,
      rankCol: String = "rank"): DataFrame =
    df.orderBy(order: _*).limit(k)
      .withColumn(rankCol,
        row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(order: _*))
          .cast("long"))
}
