package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join composed from built-ins — preference tier (a) of the
  * custom-operator ladder: no Catalyst extension needed because a
  * union + ordered window expresses the semantics exactly, and Catalyst
  * plans it as one shuffle on (key) + one sort, the same physical shape
  * a dedicated AsOfJoinExec would produce.
  *
  * For each left row, attach the most recent right row of the same key
  * with right.ts <= left.ts (the "last known value as of" join used for
  * event-state lookups and slowly-changing enrichment).
  *
  * Scale: one shuffle of left ∪ right on the key, one within-partition
  * sort on (ts, side) — no range cross-product, no per-row probing.
  * Skewed keys go through SkewJoin.saltedJoin first if a single key
  * dominates.
  */
object AsOfJoin {

  /** leftDf(keyCol, tsCol, leftIdCol) ⟕asof rightDf(keyCol, tsCol,
    * rightIdCol): emits (leftId, key, ts, asof_right_id), inner
    * semantics (left rows with no prior right row are dropped).
    * Ties (equal ts) resolve to the right row (right sorts first). */
  def lastRightAsOfLeft(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String,
      leftIdCol: String, rightIdCol: String): DataFrame = {
    val l = left.select(col(keyCol).as("k"), col(tsCol).as("t"),
      col(leftIdCol).as("lid"), lit(null).cast("long").as("rid"),
      lit(1).as("side"))
    val r = right.select(col(keyCol).as("k"), col(tsCol).as("t"),
      lit(null).cast("long").as("lid"), col(rightIdCol).cast("long").as("rid"),
      lit(0).as("side"))
    // right rows sort before left at equal ts → right row at ts == left
    // ts is visible to the left row (ASOF <= semantics)
    val w = Window.partitionBy("k").orderBy(col("t").asc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("asof_rid", last(col("rid"), ignoreNulls = true).over(w))
      .filter(col("lid").isNotNull && col("asof_rid").isNotNull)
      .select(col("lid"), col("k"), col("t"), col("asof_rid"))
  }
}
