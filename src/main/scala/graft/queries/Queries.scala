package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.EpochFunctions

/** The SURVEY §2 operator inventory restated as named queries over the
  * driver's TPC-H-ish testdata, each with a DuckDB oracle (SparkEntry).
  *
  * Numeric discipline for oracle hash-matching: every floating-point
  * aggregate is computed over `decimal(12,2)`-cast inputs (exact
  * arithmetic, deterministic in both engines regardless of summation
  * order) and surfaced as double only through an exact decimal→double
  * final cast. No raw double sums, no double division, deterministic
  * ORDER BY tiebreaks on unique keys everywhere a LIMIT appears.
  */
object Queries {

  /** Memoized per (session, path): `spark.read.parquet` pays a file
    * listing + footer schema read EVERY call, which at a 57-query
    * suite is pure per-query floor. A DataFrame is an immutable plan —
    * reusing one across queries is exactly how Spark expects tables to
    * be shared. The file-index snapshot assumes the table DIRECTORY is
    * immutable for the life of the session (the driver's testdata is;
    * a test that rewrites a directory mid-session must read it
    * directly, not through this cache, or it gets the stale listing).
    * Keyed by the SESSION OBJECT (reference identity — SparkSession
    * doesn't override equals), so two sessions never collide. */
  private val tableCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // a stopped session's plans (and their file-index snapshots) are
    // dead weight — drop them here rather than pinning the session
    // until a size backstop fires
    evictDead()
    // backstop for a pathological many-path session; clearing is safe
    // (a cleared entry just re-reads) so losing a concurrent insert to
    // this check-then-clear costs one extra listing, never correctness
    if (tableCache.size > 256) tableCache.clear()
    tableCache.computeIfAbsent(
      (spark, s"$dir/$name.parquet"),
      key => key._1.read.parquet(key._2))
  }

  /** Eviction seam, run on every [[table]] call: drops entries whose
    * session is dead. The predicate is injectable ONLY for the spec —
    * one local JVM allows one SparkContext, so a genuinely stopped
    * session cannot coexist with the suite's live one. */
  private[graft] def evictDead(
      isDead: SparkSession => Boolean = _.sparkContext.isStopped): Unit =
    tableCache.keySet.removeIf(k => isDead(k._1))

  private[graft] def cachedTableCount: Int = tableCache.size

  /** The events table's `ts` column has shipped in three parquet
    * encodings across testdata regenerations, and the loader adapts to
    * whichever is on disk (the reference parses every ingest boundary
    * defensively — backend/lib/rpc-service/data-types.js:3-46 — and a
    * hard-coded encoding here broke 17 queries when the export format
    * drifted):
    *
    *   - INT64 TIMESTAMP(NANOS): Spark reads it only under the
    *     `nanosAsLong` legacy conf (as a raw long), so the footer probe
    *     below decides whether to set that conf BEFORE the first read;
    *     normalized with exact integer arithmetic (`div`, not double
    *     division — ns-since-epoch exceeds double's 2^53 exact range).
    *   - TIMESTAMP(MICROS/MILLIS, isAdjustedToUTC=false): reads as
    *     TIMESTAMP_NTZ; cast to session-tz TimestampType (every entry
    *     point pins the session to UTC, so the instant is preserved and
    *     matches DuckDB's `epoch(ts)` naive-as-UTC semantics).
    *   - TIMESTAMP(isAdjustedToUTC=true): already TimestampType.
    *
    * The probe memoizes per path (one footer read, not one per query)
    * and the conf is only ever set when the file really is nanos. */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(eventsRaw(spark, dir))

  /** Un-normalized events read (`ts` still in its on-disk type), with
    * the nanos conf side-effect applied when needed. Streaming specs use
    * this for `readStream.schema(...)` and then [[normalizeTs]]. */
  private[graft] def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    if (tsIsNanos(spark, s"$dir/events.parquet"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
  }

  /** Normalize whatever `ts` type the reader produced to TimestampType.
    * Works on batch and streaming DataFrames alike (pure column algebra). */
  private[graft] def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other; expected INT64-nanos, " +
          "TIMESTAMP_NTZ, or TIMESTAMP (see SchemaContractSpec)")
    }
  }

  private val tsNanosCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Footer probe: is the parquet `ts` column annotated TIMESTAMP(NANOS)?
    * Reads ONE footer (first data file if `path` is a directory) so the
    * global `nanosAsLong` conf is only set when genuinely required —
    * setting it unconditionally would silently read any OTHER nanos
    * column in the session as a raw long. */
  private def tsIsNanos(spark: SparkSession, path: String): Boolean =
    tsNanosCache.computeIfAbsent(path, { p =>
      import org.apache.parquet.schema.LogicalTypeAnnotation
      val hconf = spark.sessionState.newHadoopConf()
      val root = new org.apache.hadoop.fs.Path(p)
      val fs = root.getFileSystem(hconf)
      val file =
        if (fs.getFileStatus(root).isDirectory)
          fs.listStatus(root).map(_.getPath)
            .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName).head
        else root
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, hconf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        schema.containsField("ts") &&
          (schema.getType(schema.getFieldIndex("ts")).getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
            case _ => false
          })
      } finally reader.close()
    })

  /** Minimum map-side parallelism for compute-heavy per-row stages.
    *
    * A small corpus often arrives as ONE parquet row group, and a row
    * group is Spark's minimum split: the scan yields one task no matter
    * how many cores the session has. For scan-cheap queries that is
    * irrelevant, but operators whose cost is per-character work INSIDE
    * the scan stage (shingle explodes, rolling window hashes, substring
    * chunking) then run serially on one core — measured 3.5× wall on
    * q73's CDC chunking at sf0.1 (one 0.6 MB row group) vs the same
    * operator over a 32-file input 10× the size.
    *
    * No-op when the scan already yields >= defaultParallelism splits —
    * the 100 TB case, where adding a corpus-wide text shuffle would be
    * exactly wrong — so the floor only pays (one tiny shuffle) where it
    * buys whole-cluster parallelism. */
  private[graft] def parallelFloor(df: DataFrame): DataFrame = {
    val floor = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < floor) df.repartition(floor) else df
  }

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))

  /** A1/A5 + F-pushdown — pricing summary (TPC-H Q1 shape).
    * reference analog: the COUNT/MAX telemetry aggregates
    * (backend/lib/deal-observer.js:46-60). */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_discount"))).cast("double").as("sum_disc"),
        count(lit(1)).as("count_order"))

  /** W1 — top-1 by event time with unique-key tiebreak
    * (reference: fetchDealWithHighestActivatedEpoch,
    * backend/lib/deal-observer.js:46-50). Plans as TakeOrderedAndProject. */
  def q02LatestEventTop1(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(1)
      .select(col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_unix"))

  /** W2+F2 — oldest-first bounded work queue
    * (reference: fetchDealsWithUnresolvedPayloadCid,
    * backend/lib/resolve-payload-cids.js:63-66). */
  def q03WorkQueue(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .filter(col("event_type").isin("click", "error") && col("value") > 50)
      .orderBy(col("ts").asc, col("event_id").asc)
      .limit(1000)
      .select(col("event_id"), col("user_id"), col("event_type"))

  /** A4 — one grouped count replacing four per-state scans
    * (reference: countStoredActiveDealsWithPayloadState,
    * backend/lib/resolve-payload-cids.js:93-97). */
  def q04StateCounts(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))

  /** A2/A3 — filtered counts in one pass
    * (reference: countStoredActiveDealsWithUnresolvedPayloadCid /
    * countRevertedActiveDeals, resolve-payload-cids.js:72-86). */
  def q05FilteredCounts(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).agg(
      count(lit(1)).as("n_total"),
      count(when(col("event_type") === "error", 1)).as("n_error"),
      count(when(col("value") > 90, 1)).as("n_high_value"),
      count(when(col("event_type") === "error" && col("value") > 90, 1))
        .as("n_error_high"))

  /** J1 — left-anti "insert dedup": orders with no high-quantity line
    * (reference: ON CONFLICT DO NOTHING restated as an anti-join,
    * backend/lib/deal-observer.js:102). */
  def q06AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    // The probe side prunes to one selective column before the anti-join;
    // broadcast it (same shape as the ingest dedup: the small filtered
    // side broadcasts, the big side never shuffles).
    val l = table(spark, dir, "lineitem")
      .filter(col("l_quantity") > 45).select("l_orderkey")
    o.join(broadcast(l), o("o_orderkey") === l("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_orderstatus"))
  }

  /** J2 — broadcast dimension join chain: revenue per nation
    * (reference: the minerId→peerId broadcast dimension,
    * backend/lib/resolve-payload-cids.js:162-181). */
  def q07DimJoinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer")
    val o = table(spark, dir, "orders")
    val n = table(spark, dir, "nation")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  /** U1/U2 — Filecoin epoch column algebra over event time
    * (reference: db/migrations/005/006 SQL UDFs → pure expressions). */
  def q08EpochBuckets(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("epoch", EpochFunctions.timestampToEpoch(col("ts")))
      .withColumn("epoch_day", floor(col("epoch") / 2880).cast("long"))
      .groupBy("epoch_day")
      .agg(count(lit(1)).as("n"),
        min("epoch").cast("long").as("first_epoch"),
        max("epoch").cast("long").as("last_epoch"))

  /** F3 — the submit-eligibility predicate shape: time-delayed lower
    * bound + not-yet-expired upper bound
    * (reference: backend/lib/spark-api-submit-deals.js:53-72). */
  def q09Eligibility(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .filter(col("o_orderstatus") === "O" &&
        col("o_orderdate") < lit("1998-01-01") &&
        col("o_totalprice") > 50000)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))

  /** Window ranking — latest event per user (the per-key top-1 the
    * reference does as ORDER BY…LIMIT 1, generalized per key). */
  def q10LatestPerUser(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ts_unix"))
  }

  /** ST-analog in batch — tumbling 1-hour window aggregation
    * (Structured Streaming's windowed agg, run over bounded input). */
  def q11TumblingWindow(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .select(unix_timestamp(col("hour_ts")).as("hour_unix"),
        col("n"), col("sum_value"))

  /** T5/T6 — external payload rendering: f0 prefixing + numeric→string
    * (reference: spark-api-submit-deals.js:119-126). */
  def q12SubmitPayload(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .filter(col("o_orderkey") <= 100)
      .select(
        concat(lit("f0"), col("o_custkey")).as("miner_id"),
        col("o_orderkey").cast("string").as("order_key_str"),
        dec(col("o_totalprice")).cast("string").as("total_price_str"))
}
