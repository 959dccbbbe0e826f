package graft.pipeline

import graft.TestSpark
import graft.ops.QualityClassifier
import graft.queries.Queries
import org.apache.spark.sql.functions._

/** Regenerates `fixtures/quality_weights.parquet`: the q64 quality
  * classifier trained PER SCALE FACTOR (sf0.01 AND sf0.1, label =
  * lang='en'), dumped as the (word, weight, corpus_n) table plus an
  * `__INTERCEPT__` sentinel row per slice. The oracle SQL selects the
  * slice whose `corpus_n` equals `(SELECT count(*) FROM documents)`,
  * so the same static SQL hash-matches at every oracle-swept SF.
  *
  * Purpose: the DuckDB oracle for q64_quality_score. The LBFGS fit is
  * not SQL-expressible but is deterministic; the SCORING — explode
  * words, join weights, sum, sigmoid — is re-derived independently in
  * the oracle SQL, so only the fitted weights are fixture-trusted (and
  * those are determinism/separation spec-gated in
  * QualityClassifierSpec).
  *
  * MUST be retrained whenever QualityClassifier.fit semantics, the q64
  * label rule, or the vocab budget (1024) change. Run:
  * `sbt "Test/runMain graft.pipeline.DumpQualityFixture"`.
  */
object DumpQualityFixture {
  val SfDirs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val table = SfDirs.map { sfDir =>
      val docs = Queries.table(spark, sfDir, "documents")
      val corpusN = docs.count()
      // keep in sync with OpsQueries.q64QualityScore
      val m = QualityClassifier.fit(
        docs.withColumn("label", (col("lang") === "en").cast("double")),
        "label", vocabSize = 1024)
      println(s"$sfDir: ${m.vocab.length} words, intercept=${m.intercept} " +
        s"(corpus_n=$corpusN)")
      m.weightTable(spark)
        .unionByName(Seq(("__INTERCEPT__", m.intercept)).toDF("word", "weight"))
        .withColumn("corpus_n", lit(corpusN))
        .orderBy("word")
    }.reduce(_ unionByName _)

    val tmp = java.nio.file.Files.createTempDirectory("quality-fixture").toString
    table.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error("no part file written"))
    val dest = java.nio.file.Paths.get(s"${TestSpark.fixtures}/quality_weights.parquet")
    java.nio.file.Files.copy(part.toPath, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote $dest (${java.nio.file.Files.size(dest)} bytes)")
    spark.stop()
  }
}
