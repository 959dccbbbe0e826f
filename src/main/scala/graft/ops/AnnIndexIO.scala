package graft.ops

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence for the built ANN indexes ([[SimilaritySearch.LshIndex]],
  * [[SimilaritySearch.IvfIndex]], [[SimilaritySearch.PqIndex]],
  * [[SimilaritySearch.IvfPqIndex]]): an index is a production asset
  * that outlives the session that built it — build once on the
  * cluster, save, serve query batches from any later session.
  *
  * Layout under `path/`: `meta.json` (integer/string params only —
  * exact by construction) plus parquet relations for everything
  * numeric: model vectors round-trip through parquet DOUBLE/FLOAT
  * columns (bit-exact, unlike a JSON text encoding) and the big keyed/
  * assigned/encoded relation is stored as ordinary parquet — at scale
  * it IS the index, so it loads partitioned and pruned like any table.
  *
  * Loaded indexes are persisted (MEMORY_AND_DISK) like their built
  * twins; the release handles apply unchanged. PQ/IVF-PQ loads take
  * the raw corpus as a parameter — the re-rank stage reads raw vectors
  * from the CALLER's data, which is not the index's to copy.
  */
object AnnIndexIO {
  import SimilaritySearch._

  private val mapper = new ObjectMapper()

  private def writeMeta(spark: SparkSession, path: String, kv: (String, Any)*): Unit = {
    val node = mapper.createObjectNode()
    kv.foreach {
      case (k, v: Int) => node.put(k, v)
      case (k, v: String) => node.put(k, v)
      case (k, v) => node.put(k, v.toString)
    }
    // through the Hadoop FS API so path schemes (hdfs://, s3a://…)
    // work the same as the parquet writes beside it
    val p = new org.apache.hadoop.fs.Path(path, "meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
  }

  private def readMeta(spark: SparkSession, path: String): com.fasterxml.jackson.databind.JsonNode = {
    val p = new org.apache.hadoop.fs.Path(path, "meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try mapper.readTree(in) finally in.close()
  }

  private def saveMatrix(spark: SparkSession, path: String, name: String,
      rows: Seq[(Int, Seq[Double])]): Unit = {
    import spark.implicits._
    rows.toDF("i", "vec").coalesce(1).write.mode("overwrite")
      .parquet(s"$path/$name")
  }

  private def loadMatrix(spark: SparkSession, path: String, name: String): Array[Array[Double]] =
    spark.read.parquet(s"$path/$name")
      .collect().sortBy(_.getInt(0))
      .map(_.getSeq[Double](1).toArray)

  private def persisted(df: DataFrame): DataFrame =
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  // ------------------------------------------------------------- LSH

  def lshSave(index: LshIndex, path: String): Unit = {
    val spark = index.keyed.sparkSession
    writeMeta(spark, path, "kind" -> "lsh", "planes" -> index.planes,
      "dim" -> index.dim, "tables" -> index.tables,
      "idCol" -> index.idCol, "vecCol" -> index.vecCol)
    import spark.implicits._
    index.planesFlat.zipWithIndex.map { case (v, i) => (i, v) }
      .toDF("i", "v").coalesce(1).write.mode("overwrite").parquet(s"$path/planes")
    index.keyed.write.mode("overwrite").parquet(s"$path/keyed")
  }

  def lshLoad(spark: SparkSession, path: String): LshIndex = {
    val m = readMeta(spark, path)
    require(m.get("kind").asText == "lsh", s"not an LSH index at $path")
    val planesFlat = spark.read.parquet(s"$path/planes")
      .collect().sortBy(_.getInt(0)).map(_.getFloat(1)).toSeq
    new LshIndex(persisted(spark.read.parquet(s"$path/keyed")), planesFlat,
      m.get("idCol").asText, m.get("vecCol").asText,
      m.get("planes").asInt, m.get("dim").asInt, m.get("tables").asInt)
  }

  // ------------------------------------------------------------- IVF

  def ivfSave(index: IvfIndex, path: String): Unit = {
    val spark = index.assigned.sparkSession
    writeMeta(spark, path, "kind" -> "ivf", "nlist" -> index.nlist)
    saveMatrix(spark, path, "centroids",
      index.centroids.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq)
    index.assigned.write.mode("overwrite").parquet(s"$path/assigned")
  }

  def ivfLoad(spark: SparkSession, path: String): IvfIndex = {
    val m = readMeta(spark, path)
    require(m.get("kind").asText == "ivf", s"not an IVF index at $path")
    new IvfIndex(loadMatrix(spark, path, "centroids"),
      persisted(spark.read.parquet(s"$path/assigned")), m.get("nlist").asInt)
  }

  // -------------------------------------------------------------- PQ

  def pqSave(index: PqIndex, path: String): Unit = {
    val spark = index.encoded.sparkSession
    writeMeta(spark, path, "kind" -> "pq", "m" -> index.m, "dim" -> index.dim,
      "idCol" -> index.idCol, "vecCol" -> index.vecCol)
    saveMatrix(spark, path, "codebook",
      index.codebook.zipWithIndex.flatMap { case (cents, j) =>
        cents.zipWithIndex.map { case (v, ci) => (j * 10000 + ci, v.toSeq) }
      }.toSeq)
    index.encoded.write.mode("overwrite").parquet(s"$path/encoded")
  }

  /** `corpus` supplies raw vectors for the exact re-rank stage — the
    * index stores only the compressed codes. */
  def pqLoad(spark: SparkSession, path: String, corpus: DataFrame): PqIndex = {
    val m = readMeta(spark, path)
    require(m.get("kind").asText == "pq", s"not a PQ index at $path")
    val mm = m.get("m").asInt
    val flat = spark.read.parquet(s"$path/codebook")
      .collect().sortBy(_.getInt(0)).map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val codebook = Array.tabulate(mm)(j =>
      flat.filter(_._1 / 10000 == j).sortBy(_._1).map(_._2))
    new PqIndex(codebook, persisted(spark.read.parquet(s"$path/encoded")),
      corpus, m.get("idCol").asText, m.get("vecCol").asText,
      mm, m.get("dim").asInt)
  }

  // ---------------------------------------------------------- IVF-PQ

  def ivfPqSave(index: IvfPqIndex, path: String): Unit = {
    val spark = index.encoded.sparkSession
    writeMeta(spark, path, "kind" -> "ivfpq", "nlist" -> index.nlist,
      "m" -> index.m, "dim" -> index.dim,
      "idCol" -> index.idCol, "vecCol" -> index.vecCol)
    saveMatrix(spark, path, "coarse",
      index.coarse.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq)
    saveMatrix(spark, path, "codebook",
      index.codebook.zipWithIndex.flatMap { case (cents, j) =>
        cents.zipWithIndex.map { case (v, ci) => (j * 10000 + ci, v.toSeq) }
      }.toSeq)
    index.encoded.write.mode("overwrite").parquet(s"$path/encoded")
  }

  // ---------------------------------------------------------- IVF-SQ8

  def ivfSqSave(index: IvfSqIndex, path: String): Unit = {
    val spark = index.encoded.sparkSession
    writeMeta(spark, path, "kind" -> "ivfsq", "nlist" -> index.nlist,
      "dim" -> index.dim, "idCol" -> index.idCol, "vecCol" -> index.vecCol)
    saveMatrix(spark, path, "coarse",
      index.coarse.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq)
    // row 0 = per-dim residual minima, row 1 = per-dim step sizes —
    // bit-exact through parquet DOUBLE like every other model matrix
    saveMatrix(spark, path, "bounds",
      Seq((0, index.vmin.toSeq), (1, index.vstep.toSeq)))
    index.encoded.write.mode("overwrite").parquet(s"$path/encoded")
  }

  /** `corpus` supplies raw vectors for the exact re-rank stage — the
    * index stores only the byte codes. */
  def ivfSqLoad(spark: SparkSession, path: String, corpus: DataFrame): IvfSqIndex = {
    val m = readMeta(spark, path)
    require(m.get("kind").asText == "ivfsq", s"not an IVF-SQ index at $path")
    val bounds = loadMatrix(spark, path, "bounds")
    new IvfSqIndex(loadMatrix(spark, path, "coarse"), bounds(0), bounds(1),
      persisted(spark.read.parquet(s"$path/encoded")),
      corpus, m.get("idCol").asText, m.get("vecCol").asText,
      m.get("nlist").asInt, m.get("dim").asInt)
  }

  // ------------------------------------------------------------- PCA

  /** A fitted [[Pca.Model]] is the same kind of asset as an ANN
    * index's model matrices: O(d²) numbers that outlive the fitting
    * session — fit once on the cluster, save, project any later
    * corpus without repeating the moment pass. Bit-exact round-trip
    * through parquet DOUBLE columns (same rationale as the ANN
    * codebooks: never JSON-text floats). */
  def pcaSave(spark: SparkSession, model: Pca.Model, path: String): Unit = {
    writeMeta(spark, path, "kind" -> "pca",
      "k" -> model.k, "dim" -> model.dim)
    saveMatrix(spark, path, "mean", Seq((0, model.mean.toSeq)))
    saveMatrix(spark, path, "components",
      model.components.toSeq.zipWithIndex.map { case (v, i) => (i, v.toSeq) })
    saveMatrix(spark, path, "eigenvalues", Seq((0, model.eigenvalues.toSeq)))
  }

  def pcaLoad(spark: SparkSession, path: String): Pca.Model = {
    val m = readMeta(spark, path)
    require(m.get("kind").asText == "pca", s"not a PCA model at $path")
    Pca.Model(loadMatrix(spark, path, "mean").head,
      loadMatrix(spark, path, "components"),
      loadMatrix(spark, path, "eigenvalues").head)
  }

  /** `corpus` supplies raw vectors for the exact re-rank stage. */
  def ivfPqLoad(spark: SparkSession, path: String, corpus: DataFrame): IvfPqIndex = {
    val m = readMeta(spark, path)
    require(m.get("kind").asText == "ivfpq", s"not an IVF-PQ index at $path")
    val mm = m.get("m").asInt
    val flat = spark.read.parquet(s"$path/codebook")
      .collect().sortBy(_.getInt(0)).map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val codebook = Array.tabulate(mm)(j =>
      flat.filter(_._1 / 10000 == j).sortBy(_._1).map(_._2))
    new IvfPqIndex(loadMatrix(spark, path, "coarse"), codebook,
      persisted(spark.read.parquet(s"$path/encoded")),
      corpus, m.get("idCol").asText, m.get("vecCol").asText,
      m.get("nlist").asInt, mm, m.get("dim").asInt)
  }
}
