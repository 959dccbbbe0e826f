package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the attribution shape (impression
  * stream ⋈ click stream) every event pipeline eventually needs, and
  * the one Structured Streaming surface whose STATE SIZE is governed
  * entirely by the join's time bounds: without an event-time range
  * condition on both watermarked inputs, Spark must buffer both
  * streams forever; with one, each side's state evicts as the
  * watermark passes `ts + maxDelay`.
  *
  * Scale shape: state per side ≈ rate × (watermark + maxDelay), hash-
  * partitioned on the join key across executors — independent of total
  * history. The inner form drops unmatched rows; the `leftOuter` form
  * emits (impression, null) once the watermark proves no click can
  * arrive, which is the trained-model-needs-negatives variant.
  *
  * reference analog: none — the reference's three loops never join two
  * live streams; this is part of the extended streaming surface
  * (SURVEY §2.9's "streams are views over event time" premise taken to
  * its two-stream conclusion).
  */
object StreamJoin {

  /** Join two event streams on `key` where the right event lands in
    * `[left.ts, left.ts + maxDelay]` (attribution window).
    *
    * Both inputs MUST be streaming DataFrames with columns
    * (`key`, `ts`: timestamp, payload...); watermarks are applied here
    * so state eviction is part of the operator's contract, not the
    * caller's discipline.
    *
    * @param leftDelay  watermark slack for the left stream
    * @param rightDelay watermark slack for the right stream
    * @param maxDelay   attribution horizon (right.ts − left.ts ≤ this)
    * @param joinType   "inner" or "leftOuter" (outer emits nulls only
    *                   after the watermark closes the window) */
  def attributionJoin(
      left: DataFrame, right: DataFrame,
      key: String, maxDelay: String,
      leftDelay: String = "30 seconds", rightDelay: String = "30 seconds",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", leftDelay)
      .select(col(key).as("k"), col("ts").as("l_ts"),
        struct(left.columns.map(col): _*).as("l"))
    val r = right.withWatermark("ts", rightDelay)
      .select(col(key).as("r_k"), col("ts").as("r_ts"),
        struct(right.columns.map(col): _*).as("r"))
    l.join(r,
      col("k") === col("r_k") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $maxDelay"),
      joinType)
      .select(col("k"), col("l_ts"), col("r_ts"), col("l"), col("r"))
  }
}
