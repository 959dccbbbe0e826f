package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable point-in-interval (range) join.
  *
  * The naive formulation — equi-join on keys, then `point BETWEEN start
  * AND end` — gives Catalyst nothing hashable beyond the keys: with a
  * hot key (or no key) the plan degrades to BroadcastNestedLoopJoin,
  * the classic range-join cliff. The standard fix, used by every
  * warehouse engine that lacks a native interval index, is BINNING:
  * chop time into fixed `binSeconds` buckets, explode each interval
  * onto every bucket it overlaps, map each point to its single bucket,
  * and equi-join on (keys..., bin) — a plain shuffled hash join whose
  * per-bucket fan-out is bounded by interval length / bin width. The
  * residual BETWEEN filter restores exactness; a point joins at most
  * once per interval because it lives in exactly one bin.
  *
  * Bin width is the one tuning knob: too narrow and long intervals
  * explode into many rows; too wide and each bin's hash bucket carries
  * unrelated intervals that the residual filter discards. Set it near
  * the median interval length.
  */
object RangeJoin {

  /** Join `points` to every row of `intervals` (same `keys`) whose
    * `[startCol, endCol]` contains `pointCol` — timestamps compared
    * exactly, binned on epoch seconds for the equi-join.
    *
    * Output: point columns + interval columns (minus the join keys'
    * duplicates), one row per containing interval. */
  def binnedIntervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointCol: String,
      startCol: String,
      endCol: String,
      binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    // "point columns + interval columns" is only well-defined when the
    // non-key names are disjoint; a collision would emit ambiguous
    // duplicate columns and break the residual filter
    val overlap = (points.columns.toSet & intervals.columns.toSet) -- keys.toSet
    require(overlap.isEmpty,
      s"points and intervals share non-key columns ${overlap.mkString(", ")} — " +
        "rename one side before joining")
    val iv = intervals.withColumn("_bin",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / binSeconds),
        floor(unix_timestamp(col(endCol)) / binSeconds))))
    val p = points.withColumn("_bin",
      floor(unix_timestamp(col(pointCol)) / binSeconds))
    p.join(iv, keys :+ "_bin")
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("_bin")
  }
}
