package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}

/** Physical-plan regression guards: the plan SHAPES the scale story
  * depends on, asserted against the real sf0.001 tables so a future
  * refactor that silently loses a pushdown, broadcasts the wrong side,
  * funnels a global sort, or nested-loops a range join fails CI — not
  * a 100 TB run. */
class PlanGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): SparkPlan = df.queryExecution.executedPlan

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    // walk into AQE wrappers: executedPlan hides the real operators
    // behind AdaptiveSparkPlanExec until execution
    val self = pf.lift(p).toSeq
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.initialPlan)
      case other => other.children
    }
    self ++ kids.flatMap(collectAll(_)(pf))
  }

  test("q01: the shipdate filter reaches the parquet scan (pushdown + pruning)") {
    val q = Queries.q01PricingSummary(spark, dir)
    val scans = collectAll(planOf(q)) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.metadata("PushedFilters").contains("l_shipdate"),
      s"no pushed filter: ${scan.metadata("PushedFilters")}")
    // column pruning: the 16-column lineitem scan reads only what q01 uses
    assert(scan.schema.fieldNames.length <= 7,
      s"scan reads too much: ${scan.schema.fieldNames.mkString(",")}")
  }

  test("q07: dimension joins broadcast (no shuffle of the fact side)") {
    val joins = collectAll(planOf(Queries.q07DimJoinRevenue(spark, dir))) {
      case j: BroadcastHashJoinExec => j
    }
    assert(joins.nonEmpty, "dimension join must be a BroadcastHashJoin")
  }

  test("q49: global shard assignment contains no GLOBAL sort") {
    val sorts = collectAll(planOf(OpsQueries.q49ShuffleShards(spark, dir))) {
      case s: SortExec if s.global => s
    }
    assert(sorts.isEmpty, "shuffle-sharding must never sort globally")
  }

  test("q55: the binned range join is a hash join, never a nested loop") {
    val p = planOf(OpsQueries.q55SessionRangeJoin(spark, dir))
    val loops = collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }
    assert(loops.isEmpty, "range join degenerated to BroadcastNestedLoopJoin")
  }

  test("q60: the PII regex chain is one scan + projection — zero exchanges, zero UDFs") {
    val p = planOf(OpsQueries.q60PiiScrub(spark, dir))
    val exchanges = collectAll(p) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "a per-row string transform must not shuffle")
    val planStr = p.toString
    assert(!planStr.contains("BatchEvalPython") && !planStr.contains("ScalaUDF"),
      "scrub must stay in codegen'd built-ins")
  }

  test("q62: the CSV config dimension broadcasts; the corpus side never does") {
    val joins = collectAll(planOf(OpsQueries.q62CsvDim(spark, dir))) {
      case j: BroadcastHashJoinExec => j
    }
    assert(joins.nonEmpty, "config dim join must be a BroadcastHashJoin")
  }

  test("q61: BM25 never shuffles document text") {
    val p = planOf(OpsQueries.q61Bm25(spark, dir))
    val exchanges = collectAll(p) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty) // tf/df aggregations do shuffle — (id, word) pairs
    exchanges.foreach { e =>
      assert(!e.child.schema.fieldNames.contains("text"),
        s"an exchange carries raw text: ${e.child.schema.fieldNames.mkString(",")}")
    }
  }

  test("q48: span dedup scans only (doc_id, text)") {
    val scans = collectAll(planOf(OpsQueries.q48SpanDedup(spark, dir))) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(s.schema.fieldNames.toSet.subsetOf(Set("doc_id", "text")),
        s"span dedup reads extra columns: ${s.schema.fieldNames.mkString(",")}")
    }
  }

  test("q78: k-means assignment is map-side argmin — no joins, one aggregate exchange") {
    val p = planOf(OpsQueries.q78KmeansAssign(spark, dir))
    val joins = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.isEmpty,
      "broadcast-literal centroids must never become a join")
    val exchanges = collectAll(p) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 1,
      s"assignment should shuffle once (the k-key aggregate), got ${exchanges.size}")
  }

  test("q77: trigram LM is join-free; no KEYED shuffle carries raw text") {
    val p = planOf(OpsQueries.q77TrigramLm(spark, dir))
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty,
      "context totals are a window over c3 — a join here means the " +
        "aggregate-and-join-back shape regressed")
    collectAll(p) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.foreach { e =>
      // parallelFloor's small-corpus round-robin repartition legitimately
      // moves text (and is a no-op at scale); a HASH-keyed exchange
      // carrying text would be a real plan regression
      val roundRobin = e.outputPartitioning
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning]
      assert(roundRobin || !e.child.schema.fieldNames.contains("text"),
        s"a keyed exchange carries raw text: ${e.child.schema.fieldNames.mkString(",")}")
    }
  }

  test("q80: the PCA moment pass never joins and never shuffles the corpus") {
    val p = planOf(OpsQueries.q80EmbMoments(spark, dir))
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, "momentStats is a single aggregation — no joins")
    collectAll(p) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.foreach { e =>
      val roundRobin = e.outputPartitioning
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning]
      // the only keyed exchange is the tiny (i, j)-keyed partial-agg
      // output; an exchange still carrying the vector column means the
      // partial aggregation stopped happening map-side
      assert(roundRobin || !e.child.schema.fieldNames.exists(
          n => n == "embedding" || n == "xq"),
        s"a keyed exchange carries the embedding column: " +
          e.child.schema.fieldNames.mkString(","))
    }
    val keyed = collectAll(p) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if !e.outputPartitioning.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning] => e
    }
    assert(keyed.size <= 1,
      s"one (i,j)-keyed aggregate exchange expected, got ${keyed.size}")
  }

  test("q82: the Gopher rule gate is one scan + projection — zero exchanges, zero joins") {
    val p = planOf(OpsQueries.q82GopherRules(spark, dir))
    assert(collectAll(p) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, "per-doc rule algebra must not shuffle")
    assert(collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, "the stopword set is a broadcast literal, never a join")
  }

  test("q88: the small-S direct path prunes to (source, text) and never nested-loops") {
    // the cost gate routes the sf-fixture source counts (≤ 64) to the
    // direct formulation — its plan must stay one pruned scan feeding
    // hash joins (the routed path's bounded broadcast-nested-loops
    // must NOT appear below the gate). Guarded on the COMPUTE plan
    // (the registered query materializes it into a temp store and
    // returns a lineage-free read — see the cache-contract test below)
    val (matrix, release) = graft.ops.Dedup.sourceOverlapWithRelease(
      Queries.parallelFloor(Queries.table(spark, dir, "documents")), n = 2)
    val p = planOf(matrix)
    // the shingle relation is persisted (the cost-gate count
    // materializes it), so the plan reads the cache, not parquet: the
    // cached relation itself must already be pruned to (src, sh)
    val cached = collectAll(p) {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s
    }
    assert(cached.nonEmpty, "expected the persisted (src, sh) relation")
    cached.foreach { s =>
      // branches alias src → s1/s2 and some read src alone (the sizes
      // aggregate); the invariant is WIDTH — never text or doc_id
      assert(s.output.size <= 2,
        s"cached relation carries too much: ${s.output.map(_.name).mkString(",")}")
    }
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      "the direct path must not contain the routed plan's cross joins")
    release()
  }

  test("q98/q99: container bytes never cross an exchange (multimodal scale contract)") {
    // the multimodal pillar's 100 TB contract: per-row codec work is
    // mapPartitions over the binary column, aggregates are map-side
    // combined BEFORE the shuffle, and joins carry only metadata — a
    // refactor that lets a BinaryType column into a shuffle (e.g.
    // aggregating frame bytes after the exchange) ships container
    // payloads across the cluster and must fail here
    Seq(
      OpsQueries.q98MetaPlan(spark, dir),
      OpsQueries.q99MetaPlan(spark, dir)
    ).foreach { case (meta, assets) =>
      val exchanges = collectAll(planOf(meta)) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty, "expected the frame-aggregate exchange")
      exchanges.foreach { e =>
        val binCols = e.output.filter(
          _.dataType == org.apache.spark.sql.types.BinaryType).map(_.name)
        assert(binCols.isEmpty, s"binary columns in a shuffle: $binCols")
      }
      assets.unpersist()
    }
  }

  test("q88/q98 cache contract: no persisted blocks outlive the query") {
    // both queries persist intermediates (postings / synthesized
    // container bytes); the registered forms must release them before
    // returning — a bench loop repeating them must not accrete blocks
    val before = spark.sparkContext.getPersistentRDDs.keySet
    assert(OpsQueries.q88SourceOverlap(spark, dir).count() > 0)
    assert(OpsQueries.q98MultimodalMeta(spark, dir).count() > 0)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"persisted RDDs outlived the queries: ${leaked.mkString(",")}")
  }

  test("q96: the sparse decontaminator scans only (doc_id, text) on both sides") {
    val p = planOf(OpsQueries.q96SparseContamination(spark, dir))
    val scans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(s.schema.fieldNames.toSet.subsetOf(Set("doc_id", "text")),
        s"scan reads too much: ${s.schema.fieldNames.mkString(",")}")
    }
  }
}
