package graft.pipeline

import graft.TestSpark
import graft.ops.QualityClassifier
import graft.queries.Queries
import org.apache.spark.sql.functions._

/** Regenerates `fixtures/quality_weights.parquet`: the q64 quality
  * classifier trained on the sf0.01 `documents` corpus (label =
  * lang='en'), dumped as the (word, weight) table plus an
  * `__INTERCEPT__` sentinel row.
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
  val SfDir = "/root/testdata/sf0.01"

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = Queries.table(spark, SfDir, "documents")
    // keep in sync with OpsQueries.q64QualityScore
    val m = QualityClassifier.fit(
      docs.withColumn("label", (col("lang") === "en").cast("double")),
      "label", vocabSize = 1024)
    val table = m.weightTable(spark)
      .unionByName(Seq(("__INTERCEPT__", m.intercept)).toDF("word", "weight"))
      .orderBy("word")

    val tmp = java.nio.file.Files.createTempDirectory("quality-fixture").toString
    table.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error("no part file written"))
    val dest = java.nio.file.Paths.get(s"${TestSpark.fixtures}/quality_weights.parquet")
    java.nio.file.Files.copy(part.toPath, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote $dest (${java.nio.file.Files.size(dest)} bytes, " +
      s"${m.vocab.length} words, intercept=${m.intercept})")
    spark.stop()
  }
}
