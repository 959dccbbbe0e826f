package graft.pipeline

import graft.TestSpark
import graft.ops.Bpe
import graft.queries.Queries
import org.apache.spark.sql.functions._

/** Regenerates `fixtures/bpe_word_tokens.parquet` (and the provenance
  * table `fixtures/bpe_merges.parquet`): the q63 BPE model trained
  * PER SCALE FACTOR on the sf0.01 AND sf0.1 `documents` corpora,
  * materialized as ONE parquet file per table committed to the repo.
  * Rows are tagged with `corpus_n` (the training corpus's document
  * count — 500 / 5000), and the oracle SQL selects the slice whose
  * tag equals `(SELECT count(*) FROM documents)`, so the SAME static
  * SQL hash-matches at every oracle-swept scale factor (the model is
  * a function of the training corpus; a per-SF model is the honest
  * per-SF oracle).
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
  val SfDirs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
  val NumMerges = 50 // keep in sync with OpsQueries.q63BpeTokens

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val (wordTables, mergeTables) = SfDirs.map { sfDir =>
      val docs = Queries.table(spark, sfDir, "documents")
      val corpusN = docs.count()
      val merges = Bpe.train(docs, numMerges = NumMerges)
      val ranks = merges.zipWithIndex.toMap

      // every distinct word of the corpus, encoded once on the driver —
      // bounded by vocabulary (the same bound train() itself relies on)
      val words = docs
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .distinct().as[String].collect().sorted
      val wordTokens = words.toSeq
        .map(w => (w, Bpe.encodeWord(w, ranks).length.toLong, corpusN))
        .toDF("word", "n_tokens", "corpus_n")
      val mergeTable = merges.zipWithIndex
        .map { case ((l, r), i) => (i.toLong, l, r, corpusN) }
        .toDF("rank", "left", "right", "corpus_n")
      println(s"$sfDir: ${merges.size} merges over ${words.length} distinct " +
        s"words (corpus_n=$corpusN)")
      (wordTokens, mergeTable)
    }.unzip

    writeOne(wordTables.reduce(_ unionByName _), "bpe_word_tokens.parquet")
    writeOne(mergeTables.reduce(_ unionByName _), "bpe_merges.parquet")
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
