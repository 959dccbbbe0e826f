package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salting utilities for skewed keys — the manual complement to AQE's
  * skew-join splitting, for the cases AQE can't fix: a skewed
  * aggregation (one hot group swamping a task) and a skewed
  * shuffle join where the hot side can't broadcast.
  *
  * AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default) already
  * splits oversized sort-merge partitions at runtime; use these only
  * when a single *key* (not partition) is hot enough to bound a stage
  * on one task — the classic power-law shingle/user/null-key cases.
  */
object SkewJoin {

  /** Two-phase aggregation for skewed group keys: group on
    * (key, salt) first — spreading each hot key over `salts` tasks —
    * then merge the partials. Works for any algebraic aggregate; the
    * caller supplies both phases.
    *
    * saltedAggSum(df, key, valueCol, 32): count/sum-style example. */
  def saltedSum(df: DataFrame, key: Column, value: Column, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(sum(value).as("_partial"), count(lit(1)).as("_pcount"))
      .groupBy(col("key"))
      .agg(sum("_partial").as("sum"), sum("_pcount").as("count"))

  /** Salted inner equi-join for a skewed LEFT side against a small-ish
    * (but not broadcastable) RIGHT side: the left gets a random salt in
    * [0, salts), the right is replicated `salts` times, and the join key
    * becomes (key, salt) — the hot key's rows now land on `salts`
    * tasks instead of one.
    *
    * Replication multiplies the right side's shuffle volume by
    * `salts`: pick the smallest factor that flattens the skew
    * (task-time histogram, not a guess). */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicatedRight = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }
}
