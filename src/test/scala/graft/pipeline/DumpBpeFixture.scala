package graft.pipeline

import graft.TestSpark
import graft.ops.Bpe
import graft.queries.Queries
import org.apache.spark.sql.functions._

/** Regenerates `fixtures/bpe_word_tokens.parquet` (and the provenance
  * table `fixtures/bpe_merges.parquet`): the q63 BPE model trained on
  * the sf0.01 `documents` corpus, materialized as ONE parquet file per
  * table committed to the repo.
  *
  * Purpose: the DuckDB oracle for q63_bpe_tokens. BPE training/encoding
  * is not SQL-expressible, but it is a pure deterministic function of
  * the corpus — so the per-WORD encoding (word → token count under the
  * trained merges) is dumped here, and the oracle SQL independently
  * re-derives the per-DOC counts in ANSI SQL (split text, join the word
  * table, sum). A regression in training (merge order, tie-break),
  * encoding (greedy rank application), or the doc-level aggregation all
  * break the hash match; only the word-level encoding itself is
  * fixture-trusted, and that is exactly the part covered by BpeSpec's
  * determinism + exact-roundtrip gates.
  *
  * MUST be retrained whenever Bpe.train/encodeWord semantics or the
  * q63 merge budget (50) change. Run:
  * `sbt "Test/runMain graft.pipeline.DumpBpeFixture"`.
  */
object DumpBpeFixture {
  val SfDir = "/root/testdata/sf0.01"
  val NumMerges = 50 // keep in sync with OpsQueries.q63BpeTokens

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Queries.table(spark, SfDir, "documents")
    val merges = Bpe.train(docs, numMerges = NumMerges)
    val ranks = merges.zipWithIndex.toMap

    // every distinct word of the corpus, encoded once on the driver —
    // bounded by vocabulary (the same bound train() itself relies on)
    val words = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .distinct().as[String].collect().sorted
    val wordTokens = words.toSeq
      .map(w => (w, Bpe.encodeWord(w, ranks).length.toLong))
      .toDF("word", "n_tokens")

    val mergeTable = merges.zipWithIndex
      .map { case ((l, r), i) => (i.toLong, l, r) }
      .toDF("rank", "left", "right")

    writeOne(wordTokens, "bpe_word_tokens.parquet")
    writeOne(mergeTable, "bpe_merges.parquet")
    println(s"trained ${merges.size} merges over ${words.length} distinct words")
    spark.stop()
  }

  private def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("bpe-fixture").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error("no part file written"))
    val dest = java.nio.file.Paths.get(s"${TestSpark.fixtures}/$name")
    java.nio.file.Files.copy(part.toPath, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote $dest (${java.nio.file.Files.size(dest)} bytes)")
  }
}
