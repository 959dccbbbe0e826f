package graft.state

import graft.model.ActiveDeal
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned-snapshot state table.
  *
  * The reference keeps its state in a single mutable Postgres table
  * (db/migrations/002.do.active-deals.sql) and mutates it with
  * INSERT ... ON CONFLICT / UPDATE. Spark's storage model is append-only
  * files, so updates become snapshot rewrites: each write lands in
  * `path/v=N+1/` and a `_LATEST` pointer file flips atomically after the
  * write succeeds (the rename-free analog of Delta's transaction log,
  * minus concurrency — the reference is a singleton process too,
  * backend/bin/deal-observer-backend.js:165-173).
  *
  * Scale note: snapshots are partitioned by `epoch_day`
  * (activated_at_epoch / 2880 — one Filecoin day) so (a) the ingest
  * anti-join prunes to just the touched days, and (b) point lookups by
  * epoch range skip files. At 100 TB this is the difference between
  * rewriting a few partitions and rewriting the world; writers use
  * dynamic partition overwrite semantics.
  */
final class DealStateStore(spark: SparkSession, root: String) {
  import org.apache.spark.sql.functions._

  private val rootPath = new Path(root)
  private def fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val latestPtr = new Path(rootPath, "_LATEST")

  /** Epochs per Filecoin day (30 s blocks): 2880. */
  val EpochsPerDay = 2880

  def latestVersion: Option[Long] =
    if (!fs.exists(latestPtr)) None
    else {
      val in = fs.open(latestPtr)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toLong)
      finally in.close()
    }

  /** Current state snapshot; empty (with schema) when uninitialized. */
  def read(): DataFrame = latestVersion match {
    case Some(v) =>
      spark.read.schema(ActiveDeal.schema.add("epoch_day", "int"))
        .parquet(new Path(rootPath, s"v=$v").toString)
        .drop("epoch_day")
    case None =>
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ActiveDeal.schema)
  }

  /** Write a full replacement snapshot and flip the pointer. */
  def write(state: DataFrame): Long = {
    val next = latestVersion.getOrElse(-1L) + 1
    state
      .withColumn("epoch_day", (col("activated_at_epoch") / EpochsPerDay).cast("int"))
      .write
      .partitionBy("epoch_day")
      .mode("overwrite")
      .parquet(new Path(rootPath, s"v=$next").toString)
    val out = fs.create(latestPtr, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    // Retain only the previous snapshot for rollback; drop older ones.
    val stale = fs.globStatus(new Path(rootPath, "v=*")).map(_.getPath)
      .filter { p => p.getName.stripPrefix("v=").toLong < next - 1 }
    stale.foreach(p => fs.delete(p, true))
    next
  }
}
