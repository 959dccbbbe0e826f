package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Incremental near-dup detection on ingest — the streaming form of the
  * MinHash-LSH sweep. A batch pipeline re-scans the whole corpus per
  * dedup run; an INCREMENTAL corpus build must answer "is this new
  * document a near-dup of anything already ingested?" per micro-batch,
  * touching state proportional to the batch, not the corpus.
  *
  * Per micro-batch of documents:
  *   1. shingle → MinHash signatures (same hash family as the batch
  *      operator, so incremental and batch sweeps agree);
  *   2. LSH band buckets of the NEW docs join the persisted bucket
  *      index on (band, bucket) — candidates are new×new and new×old,
  *      never old×old (no re-pairing of history);
  *   3. candidates verify against the signature store with the
  *      standard MinHash estimate (fraction of agreeing components
  *      ≥ `minAgree` ≈ Jaccard threshold) — exact shingle sets are
  *      NOT retained, signatures are the state;
  *   4. verified pairs append to `pairsDir`; the batch's buckets and
  *      signatures append to the store.
  *
  * State size: (bands + numHashes) longs per document — at 10⁹ docs and
  * 64 hashes / 16 bands, ~640 GB spread across a parquet table that
  * every batch reads ONLY via the (band, bucket) hash join's pushed
  * bucket keys. The shuffle per tick carries the batch's buckets, not
  * the store. Replay safety: every store commit is keyed by the
  * micro-batch id (`batch=<id>` dir, overwrite mode), so re-processing
  * a batch rewrites its own directories instead of appending duplicate
  * signature rows — duplicates would multiplicatively re-emit every
  * future pair touching those ids. Pair emission is idempotent the
  * same way (same contract as the reference's idempotent ingest).
  *
  * reference analog: none — the reference re-queries Postgres per tick;
  * this is the training-data extension of its observe-loop shape
  * (backend/bin/deal-observer-backend.js:43-74).
  */
object DedupStream {

  final case class Config(
      n: Int = 2,
      numHashes: Int = 64,
      bands: Int = 16,
      minAgree: Double = 0.5,
      seed: Long = 42L)

  private def sigSchema(cfg: Config): StructType =
    StructType(StructField("id", LongType, nullable = false) +:
      (0 until cfg.numHashes).map(i => StructField(s"mh_$i", LongType, nullable = true)))

  private val bucketSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("band", IntegerTypeAlias, nullable = false),
    StructField("bucket", IntegerTypeAlias, nullable = false)))

  private def IntegerTypeAlias = org.apache.spark.sql.types.IntegerType

  private def readOrEmpty(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // batch=<id> subdirs: list them explicitly so the read needs no
    // partition discovery and an empty/missing store stays a clean miss
    val parts = if (fs.exists(p)) fs.listStatus(p).filter(_.isDirectory) else Array.empty[org.apache.hadoop.fs.FileStatus]
    if (parts.nonEmpty)
      spark.read.schema(schema).parquet(parts.map(_.getPath.toString).toIndexedSeq: _*)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** One micro-batch step, exposed for batch-mode reuse and tests:
    * emits verified (id1, id2, est) pairs for `batch` against (and
    * within) the store at `storeDir`, then folds the batch in.
    *
    * `batchTag` names the store sub-directory this batch commits to
    * (`buckets/batch=<tag>`, `sigs/batch=<tag>`), written with
    * OVERWRITE: a foreachBatch replay of the same micro-batch id
    * rewrites the same directories instead of appending duplicate
    * rows — duplicated signatures would multiplicatively re-emit every
    * future pair touching those ids, so the store write must be
    * idempotent, not merely append-safe. */
  def step(batch: DataFrame, storeDir: String, cfg: Config = Config(),
      batchTag: String = java.util.UUID.randomUUID().toString): DataFrame = {
    val spark = batch.sparkSession
    val sigs = Dedup.minhashSignatures(
      Dedup.shingles(batch, cfg.n)
        .select(col("id"), xxhash64(col("shingle")).as("sh")),
      cfg.numHashes, cfg.seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newBuckets = Dedup.bandBuckets(sigs, cfg.numHashes, cfg.bands)
    val oldBuckets = readOrEmpty(spark, s"$storeDir/buckets", bucketSchema)
    val oldSigs = readOrEmpty(spark, s"$storeDir/sigs", sigSchema(cfg))

    // candidates: every bucket-mate of a NEW doc (new×new once via the
    // id order; new×old in either id order), history never self-pairs
    val allBuckets = newBuckets.unionByName(oldBuckets)
    val cand = newBuckets.select(col("band"), col("bucket"), col("id").as("nid"))
      .join(allBuckets.select(col("band"), col("bucket"), col("id").as("oid")),
        Seq("band", "bucket"))
      .filter(col("nid") =!= col("oid"))
      .select(least(col("nid"), col("oid")).as("id1"),
        greatest(col("nid"), col("oid")).as("id2"))
      .distinct()

    // signature-estimate verify: agreeing components / numHashes is the
    // standard unbiased MinHash estimate of Jaccard
    val allSigs = sigs.unionByName(oldSigs)
    val s1 = allSigs.toDF(allSigs.columns.map(c => if (c == "id") "id1" else s"a_$c"): _*)
    val s2 = allSigs.toDF(allSigs.columns.map(c => if (c == "id") "id2" else s"b_$c"): _*)
    val agree = (0 until cfg.numHashes)
      .map(i => when(col(s"a_mh_$i") === col(s"b_mh_$i"), 1).otherwise(0))
      .reduce(_ + _)
    val pairs = cand.join(s1, "id1").join(s2, "id2")
      .withColumn("est", agree.cast("double") / cfg.numHashes)
      .filter(col("est") >= cfg.minAgree)
      .select(col("id1"), col("id2"), col("est"))

    // emit BEFORE folding the batch into the store (pairs computed from
    // in-memory relations; the store append is the batch's commit point)
    val out = pairs.cache()
    out.count()
    newBuckets.write.mode("overwrite").parquet(s"$storeDir/buckets/batch=$batchTag")
    sigs.write.mode("overwrite").parquet(s"$storeDir/sigs/batch=$batchTag")
    sigs.unpersist()
    out
  }

  /** Streaming wrapper: documents arrive as parquet files in
    * `docsPath`; verified near-dup pairs append to `pairsDir`. */
  def start(
      spark: SparkSession,
      docsPath: String,
      docsSchema: StructType,
      storeDir: String,
      pairsDir: String,
      checkpoint: String,
      cfg: Config = Config(),
      trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery = {
    spark.readStream.schema(docsSchema).parquet(docsPath)
      .writeStream
      .queryName("dedup-on-ingest")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batchId keys the store commit: a replayed micro-batch
        // overwrites its own directories (idempotent), and its pairs
        // land in a batch=<id> dir so the replayed emit is too
        val pairs = step(batch, storeDir, cfg, batchTag = batchId.toString)
        pairs.write.mode("overwrite").parquet(s"$pairsDir/batch=$batchId")
        pairs.unpersist()
        ()
      }
      .start()
  }
}
