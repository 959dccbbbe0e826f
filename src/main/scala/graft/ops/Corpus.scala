package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
    * shuffle-light default when tail-overflow is acceptable. */
  def greedyPack(
      df: DataFrame,
      strataCol: String,
      tokensCol: Column,
      budgetTokens: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val withTok = df.withColumn("_n_tok", tokensCol.cast("long"))
    val schema = StructType(withTok.schema.fields ++ Seq(
      StructField("pack_id", LongType, nullable = false),
      StructField("pack_offset", LongType, nullable = false)))
    val si = withTok.schema.fieldIndex(strataCol)
    val ti = withTok.schema.fieldIndex("_n_tok")
    withTok
      .repartition(col(strataCol))
      .sortWithinPartitions(col(strataCol), col(idCol))
      .mapPartitions { it =>
        var stratum: Any = null
        var first = true
        var pack = 0L
        var fill = 0L
        it.map { r =>
          val s = r.get(si)
          if (first || s != stratum) { stratum = s; first = false; pack = 0L; fill = 0L }
          val n = r.getLong(ti)
          if (fill > 0 && fill + n > budgetTokens) { pack += 1; fill = 0L }
          val out = Row.fromSeq(r.toSeq :+ pack :+ fill)
          fill += n
          out
        }
      }(Encoders.row(schema))
      .drop("_n_tok")
  }
}
