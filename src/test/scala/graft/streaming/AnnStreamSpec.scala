package graft.streaming

import graft.SparkSpec
import graft.ops.SimilaritySearch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The durable incremental LSH store ([[AnnStream]]) against the batch
  * build/search split it must equal: stream=batch equivalence on the
  * real sf0.001 embeddings in BOTH commit layouts (L0 single-file and
  * hash-partitioned), replay idempotence, hyperplane-family drift
  * guard, and compaction transparency over mixed layouts. */
class AnnStreamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def emb: DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet").select("vec_id", "embedding")

  private def resultSet(df: DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def batchAnswer(corpus: DataFrame, queries: DataFrame): Set[(Long, Long, Int)] =
    resultSet(SimilaritySearch.lshTopK(
        queries, corpus, dim = 64, k = 5, planes = 6, seed = 7L, tables = 8)
      .select("query_id", "neighbor_id", "rank"))

  // one equivalence exercise per commit layout: l0Bound = 0 forces the
  // hash-partitioned write, the default takes the L0 single-file path
  // (the sf0.001 batches are tick-sized)
  Seq(("L0 single-file", 1 << 16), ("hash-partitioned", 0)).foreach {
    case (label, l0) =>
      test(s"3-batch upsert + pruned search = one-shot build ($label commits)") {
        val store = java.nio.file.Files.createTempDirectory("annst").toString
        val corpus = emb
        (0 until 3).foreach { c =>
          AnnStream.upsertStep(corpus.filter(pmod(col("vec_id"), lit(3)) === c),
            store, dim = 64, planes = 6, seed = 7L, tables = 8,
            batchTag = s"b$c", l0Bound = l0)
        }
        // structural check: the layout actually taken is the one under test
        val subdirs = new java.io.File(s"$store/annvecs/batch=b0").listFiles()
          .exists(f => f.isDirectory && f.getName.startsWith("ab="))
        assert(subdirs == (l0 == 0), s"wrong commit layout for $label")
        val queries = corpus.filter(col("vec_id") < 10)
        val streamed = resultSet(AnnStream.searchStore(spark, store, queries, k = 5)
          .select("query_id", "neighbor_id", "rank"))
        val batch = batchAnswer(corpus, queries)
        assert(streamed == batch, s"stream ${streamed.size} != batch ${batch.size}")
        assert(streamed.nonEmpty)
      }
  }

  test("replay, family drift, and mixed-layout compaction") {
    val store = java.nio.file.Files.createTempDirectory("annst2").toString
    val corpus = emb
    // MIXED layouts: batch 0 partitioned, batches 1-2 L0
    AnnStream.upsertStep(corpus.filter(pmod(col("vec_id"), lit(3)) === 0L),
      store, dim = 64, planes = 6, seed = 7L, tables = 8, batchTag = "b0",
      l0Bound = 0)
    (1 until 3).foreach { c =>
      AnnStream.upsertStep(corpus.filter(pmod(col("vec_id"), lit(3)) === c),
        store, dim = 64, planes = 6, seed = 7L, tables = 8, batchTag = s"b$c")
    }
    val queries = corpus.filter(col("vec_id") < 10)
    val batch = batchAnswer(corpus, queries)

    // replay of a tick: same answers, no new commit dir
    def commits = new java.io.File(s"$store/annvecs").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch=")).map(_.getName).toSet
    val before = commits
    AnnStream.upsertStep(corpus.filter(pmod(col("vec_id"), lit(3)) === 1L),
      store, dim = 64, planes = 6, seed = 7L, tables = 8, batchTag = "b1")
    assert(commits == before, "replay must not add a commit")
    assert(resultSet(AnnStream.searchStore(spark, store, queries, k = 5)
      .select("query_id", "neighbor_id", "rank")) == batch)

    // hyperplane-family drift dies loudly (a silent mismatch would
    // just miss neighbors)
    intercept[IllegalArgumentException] {
      AnnStream.upsertStep(corpus.limit(1), store,
        dim = 64, planes = 4, seed = 7L, tables = 8, batchTag = "drift")
    }
    intercept[IllegalArgumentException] {
      AnnStream.searchStore(spark, "/tmp/not-an-ann-store", queries, k = 5)
    }

    // compaction folds BOTH layouts into one partitioned commit and
    // changes no answer; a replay AFTER compaction is suppressed by
    // the _FOLDED ledger
    // gcGraceMs = 0 pins the deterministic generation-count path (the
    // production default defers physical deletion by a time grace —
    // Round17GcGraceSpec)
    AnnStream.compactStore(spark, store, gcGraceMs = 0L)
    // GENERATION GRACE: the replaced commits survive the manifest
    // swap (an in-flight reader of the prior generation finishes its
    // lazy read); only the compact- commit is manifest-visible, and the
    // NEXT compaction physically GCs the prior generation
    val afterFold = commits
    assert(afterFold.size == 4 && afterFold.exists(_.startsWith("batch=compact-")),
      afterFold)
    assert(resultSet(AnnStream.searchStore(spark, store, queries, k = 5)
      .select("query_id", "neighbor_id", "rank")) == batch,
      "stale-but-graced dirs must stay invisible to a fresh reader")
    AnnStream.compactStore(spark, store, gcGraceMs = 0L)
    val folded = commits
    assert(folded.size == 1 && folded.head.startsWith("batch=compact-"), folded)
    val compacted = new java.io.File(s"$store/annvecs/${folded.head}").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("ab="))
    assert(compacted, "compaction must restore the hash-partitioned layout")
    assert(resultSet(AnnStream.searchStore(spark, store, queries, k = 5)
      .select("query_id", "neighbor_id", "rank")) == batch)
    AnnStream.upsertStep(corpus.filter(pmod(col("vec_id"), lit(3)) === 0L),
      store, dim = 64, planes = 6, seed = 7L, tables = 8, batchTag = "b0",
      l0Bound = 0)
    AnnStream.compactStore(spark, store, gcGraceMs = 0L) // GC the invisible rewrite
    assert(resultSet(AnnStream.searchStore(spark, store, queries, k = 5)
      .select("query_id", "neighbor_id", "rank")) == batch,
      "replay behind compaction must not duplicate or change answers")
  }

  test("start: vector files in, durable searchable index maintained (AvailableNow)") {
    val root = java.nio.file.Files.createTempDirectory("annw").toString
    val vecsDir = s"$root/vecs"
    new java.io.File(vecsDir).mkdirs()
    val corpus = emb.cache()
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
      val q = AnnStream.start(spark, vecsDir, schema, s"$root/store",
        s"$root/ckpt", dim = 64, planes = 6, seed = 7L, tables = 8,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow(),
        compactEvery = 2)
      q.awaitTermination()
    }
    stage("v0", 0L); tick()
    stage("v1", 1L); stage("v2", 2L); tick()
    val queries = corpus.filter(col("vec_id") < 10)
    val streamed = resultSet(AnnStream.searchStore(spark, s"$root/store", queries, k = 5)
      .select("query_id", "neighbor_id", "rank"))
    assert(streamed == batchAnswer(corpus, queries),
      "files-in stream must equal the one-shot build")
    corpus.unpersist()
  }

  test("q101: the registered incremental-ANN query equals the q20 one-shot build") {
    val a = resultSet(graft.queries.OpsQueries.q101AnnStream(spark, dir)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("int")))
    val b = resultSet(graft.queries.OpsQueries.q20LshTopK(spark, dir)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("int")))
    assert(a == b && a.nonEmpty, s"q101 ${a.size} != q20 ${b.size}")
  }
}
