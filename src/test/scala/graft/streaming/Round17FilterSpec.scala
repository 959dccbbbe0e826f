package graft.streaming

import graft.SparkSpec
import graft.ops.SimilaritySearch
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FILTERED store search (round 17): `candidateFilter` on the four
  * durable stores' `searchStore` is PRE-filtering — the predicate
  * applies to the pruned scan before scoring (and the re-rank where
  * one exists), so the answer is the exact top-k over the qualifying
  * subset. Parity oracle per store: brute force over the FILTERED
  * corpus on the planted structure (k = 2 keeps the answer provably
  * all-planted under the parity predicate — even qids keep copies
  * c ∈ {2,4}, odd keep {1,3,5}, floor ≥ 0.99 vs distractor ceiling
  * 0.61 — so cell/bucket pruning is exact). The gate twin is q113
  * (IVF-SQ8 store, DuckDB oracle); this spec covers the other three
  * stores and the no-filter-unchanged property. */
class Round17FilterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def corpus: DataFrame =
    SimilaritySearch.plantedNeighborCorpus(
      spark.read.parquet(s"$dir/embeddings.parquet")
        .select("vec_id", "embedding"))

  private val even: Column = pmod(col("neighbor_id"), lit(2)) === 0

  private def rset(df: DataFrame): Set[(Long, Long, Int)] =
    df.select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("filtered searchStore = brute force over the filtered corpus (all four stores)") {
    val c = corpus.persist()
    val queries = c.filter(col("vec_id") < 10)
    val want = rset(SimilaritySearch.bruteForceTopK(
      queries, c.filter(pmod(col("vec_id"), lit(2)) === 0), k = 2))
    val wantUnfiltered = rset(SimilaritySearch.bruteForceTopK(queries, c, k = 2))
    // the filter must CHANGE the answer (even qids lose c=1) — else
    // the parity assertions below couldn't detect an ignored filter
    assert(want != wantUnfiltered, "filter must be load-bearing")

    val root = java.nio.file.Files.createTempDirectory("filtstores").toString
    def ticks(up: (DataFrame, String) => Unit): Unit =
      (0 until 3).foreach(t =>
        up(c.filter(pmod(col("vec_id"), lit(3)) === t), s"t$t"))

    // LSH store
    val ann = s"$root/ann"
    ticks((b, t) => { AnnStream.upsertStep(b, ann, dim = 64, planes = 6,
      tables = 8, batchTag = t); () })
    assert(rset(AnnStream.searchStore(spark, ann, queries, k = 2,
      candidateFilter = Some(even))) == want, "AnnStream filtered")
    assert(rset(AnnStream.searchStore(spark, ann, queries, k = 2))
      == wantUnfiltered, "AnnStream unfiltered unchanged")

    // IVF store
    val ivf = s"$root/ivf"
    ticks((b, t) => { IvfStream.upsertStep(b, ivf, dim = 64, nlist = 16,
      seed = 13L, batchTag = t); () })
    assert(rset(IvfStream.searchStore(spark, ivf, queries, k = 2, nprobe = 8,
      candidateFilter = Some(even))) == want, "IvfStream filtered")

    // IVF-PQ store (fused: the filter must also govern the re-rank)
    val pq = s"$root/pq"
    ticks((b, t) => { IvfPqStream.upsertStep(b, pq, dim = 64, nlist = 16,
      m = 8, seed = 37L, batchTag = t); () })
    assert(rset(IvfPqStream.searchStore(spark, pq, queries, k = 2,
      nprobe = 10, rerank = 192, candidateFilter = Some(even))) == want,
      "IvfPqStream filtered")

    // and the filter composes with COMPACTION (election + physical fold)
    AnnStream.compactStore(spark, ann)
    assert(rset(AnnStream.searchStore(spark, ann, queries, k = 2,
      candidateFilter = Some(even))) == want, "AnnStream filtered post-compaction")
    c.unpersist()
  }
}
