package graft.pipeline

import graft.TestSpark
import graft.ops.Pca
import graft.queries.Queries
import org.apache.spark.sql.functions._

/** Regenerates `fixtures/pca_components.parquet`: the q83 rotation —
  * [[Pca.fitExact]] (k=8) PER SCALE FACTOR on the sf0.01 AND sf0.1
  * `embeddings` corpora, dumped as rows (c, ws, corpus_n): c = -1
  * carries the feature means, c = 0..7 the unit-norm components in
  * eigenvalue-descending order. The oracle SQL selects the slice
  * whose `corpus_n` equals `(SELECT count(*) FROM embeddings)`, so
  * the same static SQL hash-matches at every oracle-swept SF.
  *
  * Purpose: the DuckDB oracle for q83_pca_project. The eigensolve is
  * not SQL-expressible but BIT-deterministic (integer moment pass +
  * fixed-order Jacobi — see Pca.fitExact); the PROJECTION — center,
  * multiply, sequential sum — is re-derived independently in the
  * oracle SQL, so only the rotation is fixture-trusted (and that is
  * property-gated in PcaSpec).
  *
  * MUST be re-dumped whenever Pca.fitExact semantics, the q83 k/scale,
  * or the testdata embeddings change. Run:
  * `sbt "Test/runMain graft.pipeline.DumpPcaFixture"`.
  */
object DumpPcaFixture {
  val SfDirs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val table = SfDirs.map { sfDir =>
      val emb = Queries.table(spark, sfDir, "embeddings")
      val corpusN = emb.count()
      // keep in sync with OpsQueries.q83PcaProject
      val m = Pca.fitExact(emb, k = 8)
      println(s"$sfDir: k=${m.k}, varianceExplained=${m.varianceExplained} " +
        s"(corpus_n=$corpusN)")
      ((-1, m.mean.toSeq) +:
        m.components.toSeq.zipWithIndex.map { case (w, c) => (c, w.toSeq) })
        .toDF("c", "ws")
        .withColumn("corpus_n", lit(corpusN))
    }.reduce(_ unionByName _)

    val tmp = java.nio.file.Files.createTempDirectory("pca-fixture").toString
    table.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error("no part file written"))
    val dest = java.nio.file.Paths.get(s"${TestSpark.fixtures}/pca_components.parquet")
    java.nio.file.Files.copy(part.toPath, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote $dest (${java.nio.file.Files.size(dest)} bytes)")
    spark.stop()
  }
}
