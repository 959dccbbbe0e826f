package graft.streaming

import graft.SparkSpec
import graft.ops.SimilaritySearch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** The round-14 scale contracts of [[AnnStream]], pinned:
  *
  *   - the candidate-generation BROADCAST carries only int probe keys —
  *     never a vector column (at the advertised maxQueries=100k bound a
  *     vector-bearing broadcast is nq·tables·(planes+1)·dim floats:
  *     ~2 GB at dim 64, past Spark's 8 GB hard limit at dim 768);
  *   - an upsert reads its source exactly ONCE (the old limit-count
  *     routing pre-pass re-scanned every input file of the tick);
  *   - a searcher running CONCURRENTLY with upserts + compactions sees
  *     every read complete and correct — never a torn generation, a
  *     missing file, or a half-published commit. */
class AnnStreamScaleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def emb: DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet").select("vec_id", "embedding")

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val self = pf.lift(p).toSeq
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.initialPlan)
      case other => other.children
    }
    self ++ kids.flatMap(collectAll(_)(pf))
  }

  test("searchStore ships no per-candidate vector: array columns never cross a post-scoring exchange (dim 256)") {
    // dim 256 (≥ the directive's bound) via 4× tiling of the sf0.001
    // embeddings; maxQueries stays the 100k default — the guard is the
    // PLAN SHAPE, which does not depend on the actual query count.
    // Round 15: scoring is a bucket-indexed mapPartitions pass, so the
    // SQL plan has NO broadcast relation at all carrying vectors, and
    // every exchange ABOVE the store scan (dedup agg, window) moves
    // only (query_id, neighbor_id, cos) rows. The one array-bearing
    // exchange allowed is the rebalance REPARTITION directly over the
    // pruned scan — store-row-proportional, not candidate-proportional.
    val wide = emb.select(col("vec_id"),
      flatten(array_repeat(col("embedding"), 4)).as("embedding"))
    val store = java.nio.file.Files.createTempDirectory("annbg").toString
    AnnStream.upsertStep(wide, store, dim = 256, planes = 6, tables = 4,
      batchTag = "b0")
    val out = AnnStream.searchStore(spark, store, wide.filter(col("vec_id") < 10), k = 5)
    assertNoCandidateVectorExchange(out.queryExecution.executedPlan)
    // and the result is still the one-shot answer
    val got = out.select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = SimilaritySearch.lshTopK(
        wide.filter(col("vec_id") < 10), wide, dim = 256, k = 5,
        planes = 6, seed = 7L, tables = 4)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  /** Every broadcast relation must be vector-free, and every shuffle
    * exchange that carries an array column must sit on the STREAMED
    * path directly over the store scan (the rebalance repartition) —
    * never above the scoring map, where row count is
    * candidate-proportional. Aggregates reached only THROUGH a
    * broadcast exchange are exempt: the round-17 supersede mask is a
    * broadcast left-join below the rebalance whose build side is a
    * groupBy-max over tick-sized delta commits — it filters the
    * streamed store rows (shuffle input shrinks or stays equal), so
    * the exchange stays store-row-proportional. An aggregate on the
    * streamed path itself still fails: that's a scoring/dedup agg
    * whose output is candidate-proportional. */
  private def assertNoCandidateVectorExchange(p: SparkPlan): Unit = {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    def hasScan(n: SparkPlan): Boolean =
      collectAll(n) { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }.nonEmpty
    def streamedAggs(n: SparkPlan): Seq[SparkPlan] = {
      val self: Seq[SparkPlan] = n match {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => Seq(a)
        case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => Seq(a)
        case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec => Seq(a)
        case _ => Nil
      }
      val kids = n match {
        case _: BroadcastExchangeExec => Nil // build side: bounded mask relation
        case a: AdaptiveSparkPlanExec => Seq(a.initialPlan)
        case other => other.children
      }
      self ++ kids.flatMap(streamedAggs)
    }
    val broadcasts = collectAll(p) { case b: BroadcastExchangeExec => b }
    broadcasts.foreach(b => assert(
      !b.output.exists(_.dataType.isInstanceOf[ArrayType]),
      s"broadcast relation carries a vector column: ${b.output.map(_.name)}"))
    val arrayShuffles = collectAll(p) {
      case s: ShuffleExchangeExec
          if s.output.exists(_.dataType.isInstanceOf[ArrayType]) => s
    }
    arrayShuffles.foreach { s =>
      val overScanOnly = hasScan(s.child) && streamedAggs(s.child).isEmpty
      assert(overScanOnly,
        s"array column crosses a post-scoring exchange: ${s.output.map(_.name)}")
    }
  }

  test("IvfStream.searchStore ships no per-candidate vector either") {
    val store = java.nio.file.Files.createTempDirectory("ivfbg").toString
    IvfStream.upsertStep(emb, store, dim = 64, nlist = 16, seed = 13L,
      batchTag = "b0")
    val out = IvfStream.searchStore(spark, store,
      emb.filter(col("vec_id") < 10), k = 5, nprobe = 8)
    assertNoCandidateVectorExchange(out.queryExecution.executedPlan)
  }

  // one single-scan exercise per commit layout (l0Bound = 0 forces the
  // hash-partitioned branch)
  Seq(("L0 single-file", 1 << 16), ("hash-partitioned", 0)).foreach {
    case (label, l0) =>
      test(s"upsertStep reads its source exactly once ($label commits)") {
        val acc = spark.sparkContext.longAccumulator(s"ann-scan-$label")
        val tap = udf { (v: Seq[Float]) => acc.add(1L); v }
        val batch = emb.withColumn("embedding", tap(col("embedding")))
        val n = emb.count()
        val store = java.nio.file.Files.createTempDirectory("annsc").toString
        AnnStream.upsertStep(batch, store, dim = 64, planes = 6, tables = 8,
          batchTag = "b0", l0Bound = l0)
        assert(acc.value == n,
          s"source evaluated ${acc.value} rows for $n input rows — " +
            "the upsert must scan its batch exactly once")
      }
  }

  test("concurrent searcher during upserts + compactions: every read complete and correct") {
    // planted corpus: the top-5 is the 5 planted copies (cos ≥ 0.9987)
    // per query, and every writer batch below duplicates DISTRACTOR
    // vectors (ceiling ≤ 0.61) under fresh ids — so the correct answer
    // is INVARIANT across the writer's whole run, and any torn read,
    // missed commit, or deleted-file race shows up as a wrong set or a
    // thrown IO error in the searcher thread
    val corpus = SimilaritySearch.plantedNeighborCorpus(emb)
    val store = java.nio.file.Files.createTempDirectory("anncc").toString
    (0 until 3).foreach { c =>
      AnnStream.upsertStep(corpus.filter(pmod(col("vec_id"), lit(3)) === c),
        store, dim = 64, planes = 6, seed = 7L, tables = 8, batchTag = s"b$c")
    }
    AnnStream.compactStore(spark, store)
    val queries = corpus.filter(col("vec_id") < 10)
    def read(): Set[(Long, Long, Int)] =
      AnnStream.searchStore(spark, store, queries, k = 5)
        .select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = read()
    assert(expected.size == 50, s"10 queries × top-5, got ${expected.size}")

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var searcherFailure: Option[Throwable] = None
    val searcher = new Thread(() =>
      try while (!stop.get()) {
        val got = read()
        if (got != expected)
          throw new AssertionError(
            s"concurrent read diverged: ${got.diff(expected).take(3)} / " +
              s"${expected.diff(got).take(3)}")
        reads.incrementAndGet(); ()
      } catch { case t: Throwable => searcherFailure = Some(t) })
    searcher.setDaemon(true)
    searcher.start()
    try {
      val distractors = emb.filter(col("vec_id") >= 20 && col("vec_id") < 120)
      (0 until 6).foreach { i =>
        AnnStream.upsertStep(
          distractors.select((col("vec_id") + lit((i + 1) * 1000000L)).as("vec_id"),
            col("embedding")),
          store, dim = 64, planes = 6, seed = 7L, tables = 8, batchTag = s"w$i")
        if (i % 2 == 1) AnnStream.compactStore(spark, store)
      }
    } finally {
      // liveness floor under suite load (the IvfStreamSpec rationale):
      // wait bounded for the reads instead of racing the scheduler
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (reads.get() < 3 && searcherFailure.isEmpty &&
          System.nanoTime() < deadline) Thread.sleep(200)
      stop.set(true); searcher.join(120000)
    }
    searcherFailure.foreach(t => fail(s"searcher failed mid-write: $t", t))
    println(s"ANN_CONCURRENT reads=${reads.get()} writes=6 compactions=3 " +
      "all_correct=true")
    assert(reads.get() >= 3, s"searcher completed only ${reads.get()} reads")
    assert(read() == expected, "post-write answer must still be the planted top-5")
  }
}
