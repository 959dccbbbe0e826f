package graft.pipeline

import graft.TestSpark
import graft.ops.Pca
import graft.queries.Queries

/** Regenerates `fixtures/pca_components.parquet`: the q83 rotation —
  * [[Pca.fitExact]] (k=8) on the sf0.01 `embeddings` corpus, dumped as
  * rows (c, ws): c = -1 carries the feature means, c = 0..7 the
  * unit-norm components in eigenvalue-descending order.
  *
  * Purpose: the DuckDB oracle for q83_pca_project. The eigensolve is
  * not SQL-expressible but BIT-deterministic (integer moment pass +
  * fixed-order Jacobi — see Pca.fitExact); the PROJECTION — center,
  * multiply, sequential sum — is re-derived independently in the
  * oracle SQL, so only the rotation is fixture-trusted (and that is
  * property-gated in PcaSpec).
  *
  * MUST be re-dumped whenever Pca.fitExact semantics, the q83 k/scale,
  * or the sf0.01 embeddings change. Run:
  * `sbt "Test/runMain graft.pipeline.DumpPcaFixture"`.
  */
object DumpPcaFixture {
  val SfDir = "/root/testdata/sf0.01"

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val emb = Queries.table(spark, SfDir, "embeddings")
    // keep in sync with OpsQueries.q83PcaProject
    val m = Pca.fitExact(emb, k = 8)
    val rows = ((-1, m.mean.toSeq) +:
      m.components.toSeq.zipWithIndex.map { case (w, c) => (c, w.toSeq) })
    val table = rows.toDF("c", "ws")

    val tmp = java.nio.file.Files.createTempDirectory("pca-fixture").toString
    table.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error("no part file written"))
    val dest = java.nio.file.Paths.get(s"${TestSpark.fixtures}/pca_components.parquet")
    java.nio.file.Files.copy(part.toPath, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote $dest (${java.nio.file.Files.size(dest)} bytes, " +
      s"k=${m.k}, varianceExplained=${m.varianceExplained})")
    spark.stop()
  }
}
