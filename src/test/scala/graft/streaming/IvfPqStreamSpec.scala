package graft.streaming

import graft.SparkSpec
import graft.ops.SimilaritySearch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The durable incremental IVF-PQ store ([[IvfPqStream]]) against the
  * batch build/search split it must equal: accretion under pinned dual
  * quantizers answers identically to a one-shot store under the same
  * pins AND to the batch [[SimilaritySearch.ivfPqTopK]] gate on the
  * planted corpus; codeword order round-trips through the marker;
  * replay is idempotent; config drift dies loudly; compaction (grace
  * GC) and refit are answer-transparent on the planted structure. */
class IvfPqStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def emb: DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet").select("vec_id", "embedding")

  private def resultSet(df: DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def searchSet(store: String, queries: DataFrame): Set[(Long, Long, Int)] =
    resultSet(IvfPqStream.searchStore(spark, store, queries, k = 5,
        nprobe = 10, rerank = 192)
      .select("query_id", "neighbor_id", "rank"))

  test("3-tick accretion = one-shot store = batch ivfPqTopK on the planted corpus") {
    val corpus = SimilaritySearch.plantedNeighborCorpus(emb)
    val queries = corpus.filter(col("vec_id") < 10)
    val storeA = java.nio.file.Files.createTempDirectory("pqa").toString
    (0 until 3).foreach { c =>
      IvfPqStream.upsertStep(corpus.filter(pmod(col("vec_id"), lit(3)) === c),
        storeA, dim = 64, nlist = 16, m = 8, seed = 37L, batchTag = s"a$c")
    }
    // one-shot store under the SAME pinned models: copy the marker
    val storeB = java.nio.file.Files.createTempDirectory("pqb").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$storeA/_IVFPQ"),
      java.nio.file.Paths.get(s"$storeB/_IVFPQ"))
    IvfPqStream.upsertStep(corpus, storeB, dim = 64, nlist = 16, m = 8,
      seed = 37L, batchTag = "all")
    val a = searchSet(storeA, queries)
    val b = searchSet(storeB, queries)
    assert(a == b && a.size == 50, s"accreted ${a.size} != one-shot ${b.size}")
    // the q65 gate: on the planted corpus the top-5 equals brute force
    val brute = resultSet(SimilaritySearch.bruteForceTopK(queries, corpus, k = 5)
      .select("query_id", "neighbor_id", "rank"))
    assert(a == brute, "planted top-5 must equal brute force")
  }

  test("replay idempotence, config drift, compaction grace, refit transparency") {
    val corpus = SimilaritySearch.plantedNeighborCorpus(emb)
    val queries = corpus.filter(col("vec_id") < 10)
    val store = java.nio.file.Files.createTempDirectory("pqc").toString
    val mon = (0 until 3).map { c =>
      IvfPqStream.upsertStep(corpus.filter(pmod(col("vec_id"), lit(3)) === c),
        store, dim = 64, nlist = 16, m = 8, seed = 37L, batchTag = s"b$c")
    }
    val m0 = mon.head.collect()
    assert(m0.map(_.getLong(1)).sum > 0, "occupancy monitor")
    assert(m0.forall(r => r.getDouble(2) > 0.0 && r.getDouble(2) < 2.0),
      "mean_code_err must be a positive sub-unit L2 on unit vectors")
    val expected = searchSet(store, queries)
    assert(expected.size == 50)

    def commits = new java.io.File(s"$store/pqvecs").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch=")).map(_.getName).toSet
    val before = commits
    IvfPqStream.upsertStep(corpus.filter(pmod(col("vec_id"), lit(3)) === 1L),
      store, dim = 64, nlist = 16, m = 8, seed = 37L, batchTag = "b1")
    assert(commits == before, "replay must not add a commit")
    assert(searchSet(store, queries) == expected)

    intercept[IllegalArgumentException] {
      IvfPqStream.upsertStep(corpus.limit(1), store,
        dim = 64, nlist = 8, m = 8, seed = 37L, batchTag = "drift")
    }
    intercept[IllegalArgumentException] {
      IvfPqStream.searchStore(spark, "/tmp/not-a-pq-store", queries, k = 5)
    }

    IvfPqStream.compactStore(spark, store, gcGraceMs = 0L)
    assert(commits.size == 4 && commits.exists(_.startsWith("batch=compact-")),
      "generation GC grace")
    assert(searchSet(store, queries) == expected)
    IvfPqStream.compactStore(spark, store, gcGraceMs = 0L)
    assert(commits.size == 1, "second compaction collects the prior generation")
    assert(searchSet(store, queries) == expected)

    // refit: new models, re-encoded rows, pending promoted, answers
    // preserved on the planted structure
    IvfPqStream.compactStore(spark, store, refit = true)
    assert(!new java.io.File(s"$store/_IVFPQ.pending").exists(),
      "pending must promote after the swap")
    assert(searchSet(store, queries) == expected, "refit is answer-transparent")
    // post-refit upserts encode under the NEW models
    IvfPqStream.upsertStep(
      emb.filter(col("vec_id") >= 20 && col("vec_id") < 120)
        .select((col("vec_id") + lit(7000000L)).as("vec_id"), col("embedding")),
      store, dim = 64, nlist = 16, m = 8, seed = 37L, batchTag = "post")
    assert(searchSet(store, queries) == expected,
      "distractor duplicates must not perturb the planted top-5")
  }

  test("start: vector files in, durable searchable compressed index (AvailableNow)") {
    val root = java.nio.file.Files.createTempDirectory("pqw").toString
    val vecsDir = s"$root/vecs"
    new java.io.File(vecsDir).mkdirs()
    val corpus = SimilaritySearch.plantedNeighborCorpus(emb).cache()
    def stage(name: String, c: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(name).toString
      corpus.filter(pmod(col("vec_id"), lit(3)) === c)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$vecsDir/$name.parquet"))
      ()
    }
    val schema = corpus.schema
    def tick(): Unit = {
      val q = IvfPqStream.start(spark, vecsDir, schema, s"$root/store",
        s"$root/ckpt", dim = 64, nlist = 16, m = 8, seed = 37L,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
        compactEvery = 2)
      q.awaitTermination()
    }
    stage("v0", 0L); tick()
    stage("v1", 1L); stage("v2", 2L); tick()
    val queries = corpus.filter(col("vec_id") < 10)
    val streamed = searchSet(s"$root/store", queries)
    val brute = resultSet(SimilaritySearch.bruteForceTopK(queries, corpus, k = 5)
      .select("query_id", "neighbor_id", "rank"))
    assert(streamed == brute, "files-in stream must serve the planted top-5")
    corpus.unpersist()
  }

  test("marker round-trip preserves codeword order (codes index into it)") {
    val corpus = SimilaritySearch.plantedNeighborCorpus(emb)
    val store = java.nio.file.Files.createTempDirectory("pqm").toString
    IvfPqStream.upsertStep(corpus, store, dim = 64, nlist = 16, m = 8,
      seed = 37L, batchTag = "all")
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$store/_IVFPQ")), "UTF-8")
    val lines = text.split('\n')
    assert(lines.head == "64/16/8/37")
    assert(lines.count(_.startsWith("coarse ")) == 16)
    (0 until 8).foreach { j =>
      assert(lines.count(_.startsWith(s"cb$j ")) >= 2, s"subspace $j codewords")
    }
    // q104: the registered query equals the q65 one-shot gate
    val a = resultSet(graft.queries.OpsQueries.q104IvfPqStream(spark, dir)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("int")))
    val b = resultSet(graft.queries.OpsQueries.q65IvfPqTopK(spark, dir)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("int")))
    assert(a == b && a.nonEmpty, s"q104 ${a.size} != q65 ${b.size}")
  }
}
