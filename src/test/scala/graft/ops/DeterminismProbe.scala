package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical determinism evidence for the round-11 re-specs that turn
  * the approximate queries (q17/q20/q30/q45/q53/q65) hash-checkable:
  *
  *  - q17: does the LSH-verified pair set EQUAL the exact
  *    bigram-Jaccard ≥ 0.5 sweep on this corpus (i.e. banding recall
  *    exactly 1), and how far is the nearest true pair from the 0.5
  *    decision boundary?
  *  - ANN tiers: over [[SimilaritySearch.plantedNeighborCorpus]], does
  *    each tier's top-5 EQUAL brute force (pair-identical, ranks
  *    included)? What is the distractor-cosine ceiling vs the planted
  *    floor (the margin that makes the equality robust)?
  *  - q53: does semanticNearDupPairs at minCos 0.92 over the planted
  *    relation EQUAL the exact all-pairs sweep (every family
  *    cell-pure, no distractor pair above threshold)?
  *
  * Run: sbt "Test/runMain graft.ops.DeterminismProbe /root/testdata/sf0.01"
  */
object DeterminismProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.queries.Queries.parallelFloor(
      spark.read.parquet(s"$dir/documents.parquet"))
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")

    def diff(tag: String, a: DataFrame, b: DataFrame): Unit = {
      val cols = a.columns.toSeq
      val missing = b.select(cols.map(col): _*).exceptAll(a.select(cols.map(col): _*)).count()
      val extra = a.select(cols.map(col): _*).exceptAll(b.select(cols.map(col): _*)).count()
      println(f"PROBE $tag%-28s rows=${a.count()}%5d oracleRows=${b.count()}%5d missing=$missing extra=$extra " +
        (if (missing == 0 && extra == 0) "IDENTICAL" else "*** MISMATCH ***"))
    }

    // ---- q17: LSH-verified pairs vs exact global sweep
    val exact = Dedup.ngramJaccardPairs(docs, n = 2, minIntersect = 1)
      .filter(col("inter_n") >= col("union_n") * 0.5)
      .select("id1", "id2", "inter_n", "union_n")
    val lsh = Dedup.minhashDedupPairs(docs, n = 2, numHashes = 64,
      bands = 32, minJaccard = 0.5, minBandCollisions = 2)
      .select("id1", "id2", "inter_n", "union_n")
    diff("q17 lsh-vs-exact", lsh, exact)
    val margins = exact
      .withColumn("j", col("inter_n").cast("double") / col("union_n"))
      .agg(min("j").as("min_j"), max("j").as("max_j")).collect()(0)
    println(s"PROBE q17 true-pair jaccard range: [${margins.get(0)}, ${margins.get(1)}]")
    // near-boundary density: pairs the oracle would flip on tiny drift
    val near = Dedup.ngramJaccardPairs(docs, n = 2, minIntersect = 1)
      .withColumn("j", col("inter_n").cast("double") / col("union_n"))
      .filter(col("j") >= 0.45 && col("j") < 0.5).count()
    println(s"PROBE q17 pairs in [0.45,0.5): $near")
    spark.catalog.clearCache()

    // ---- ANN tiers on the planted corpus
    val corpus = SimilaritySearch.plantedNeighborCorpus(emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = corpus.filter(col("vec_id") < 10)
    val brute = SimilaritySearch.bruteForceTopK(queries, corpus, k = 5)
      .select("query_id", "neighbor_id", "rank")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // margin evidence: planted floor vs distractor ceiling per query
    val q = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val scored = corpus.join(broadcast(q), col("qid") =!= col("vec_id"))
      .withColumn("cos", Dedup.cosine(col("qv"), col("embedding")))
      .withColumn("planted", col("vec_id") >= (1L << 40))
    val m = scored.groupBy("qid", "planted").agg(min("cos"), max("cos"))
      .orderBy("planted", "qid")
    println("PROBE planted margins (qid, planted, minCos, maxCos):")
    m.collect().foreach(r => println(f"PROBE   ${r.getLong(0)}%3d ${r.getBoolean(1)}%5s ${r.getDouble(2)}%.4f ${r.getDouble(3)}%.4f"))

    def tier(tag: String, res: DataFrame): Unit =
      diff(tag, res.select("query_id", "neighbor_id", "rank"), brute)
    tier("q20 lsh planted", SimilaritySearch.lshTopK(queries, corpus, dim = 64, k = 5,
      planes = 6, tables = 8))
    tier("q30 ivf planted", SimilaritySearch.ivfTopK(queries, corpus, k = 5, nprobe = 8))
    tier("q45 pq planted", SimilaritySearch.pqTopK(queries, corpus, dim = 64, k = 5, rerank = 200))
    tier("q65 ivfpq planted", SimilaritySearch.ivfPqTopK(queries, corpus, dim = 64, k = 5,
      nprobe = 10, rerank = 192))

    // ---- q53 over planted: cell-blocked sweep vs exact all-pairs
    val a = corpus.select(col("vec_id").as("id1"), col("embedding").as("v1"))
    val b = corpus.select(col("vec_id").as("id2"), col("embedding").as("v2"))
    val exactPairs = a.join(b, col("id1") < col("id2"))
      .withColumn("cos", Dedup.cosine(col("v1"), col("v2")))
      .filter(col("cos") >= 0.92)
      .select("id1", "id2")
    val sem = SimilaritySearch.semanticNearDupPairs(corpus, minCos = 0.92, nlist = 8)
      .select("id1", "id2")
    diff("q53 planted sem-vs-exact", sem, exactPairs)
    val distractorMax = a.join(b, col("id1") < col("id2"))
      .filter(col("id2") < (1L << 40))
      .withColumn("cos", Dedup.cosine(col("v1"), col("v2")))
      .agg(max("cos")).collect()(0).getDouble(0)
    println(f"PROBE q53 max distractor-pair cosine: $distractorMax%.4f")

    spark.stop()
  }
}
