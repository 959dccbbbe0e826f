package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
    * One window cumsum per stratum — no sequential bin state, so the
    * window parallelizes across strata (and Spark's window spills per
    * partition at scale). This is the quota variant of greedy packing:
    * a pack may overflow by at most one document tail instead of
    * closing early — the standard trade for a closed-form, shuffle-once
    * formulation. (True greedy close-on-overflow needs per-row
    * sequential state: that is `flatMapGroupsWithState` territory, not
    * a window function.)
    */
  def quotaPack(
      df: DataFrame,
      strataCol: String,
      tokensCol: Column,
      budgetTokens: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy(col(strataCol)).orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // running token count BEFORE this doc; exact in double far past any
    // real corpus (< 2^53 tokens per stratum)
    val start = coalesce(sum(tokensCol).over(w), lit(0L))
    df.withColumn("pack_id", floor(start / budgetTokens).cast("long"))
      .withColumn("pack_offset", (start % budgetTokens).cast("long"))
  }
}
