package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table sink: the write-side half of shuffle-free joins.
  *
  * A 100 TB fact table that is joined on the same key every day should
  * pay its shuffle ONCE, at write time: `bucketBy(n, key)` hash-splits
  * each output partition into n bucket files and records the layout in
  * the catalog, so a later equi-join (or aggregation) on the bucket key
  * satisfies the join's distribution requirement from METADATA — the
  * plan contains no Exchange on either bucketed side (and with
  * `sortBy`, no Sort). This is Spark's native answer to "co-located
  * joins" — the same contract a Hive-bucketed warehouse or a
  * pre-partitioned Kafka topic gives a streaming join.
  *
  * Caveats encoded here rather than left to callers:
  *   - bucket counts on the two sides must match (or divide evenly
  *     with `spark.sql.bucketing.coalesceBucketsInJoin.enabled`);
  *   - bucketed writes require a catalog table (`saveAsTable`) — a
  *     bare `parquet(path)` write silently drops the bucket spec; the
  *     helper takes an explicit external-table path to keep data out
  *     of the default warehouse;
  *   - one file per (task, bucket) is written — repartition by the
  *     bucket key first so each task holds whole buckets.
  *
  * reference analog: none (Postgres indexes play this role at the
  * reference's scale); this is 100 TB layout discipline.
  */
object BucketedSink {

  /** Write `df` as an external bucketed+sorted catalog table at `path`. */
  def saveBucketed(
      df: DataFrame, table: String, path: String,
      bucketCol: String, nBuckets: Int): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(nBuckets, org.apache.spark.sql.functions.col(bucketCol))
      .write
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata flows from the
    * catalog, not the files — `spark.read.parquet(path)` would lose
    * it). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
