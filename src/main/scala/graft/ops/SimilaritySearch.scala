package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *   - brute-force cosine top-k: broadcast the (small) query set, one
  *     pass over the corpus, per-query top-k — the exact baseline;
  *   - LSH-bucketed (random hyperplane signs): corpus and queries share
  *     sign-pattern buckets with multi-probe (flip one bit), so each
  *     query scores only its bucket neighborhood — the 100 TB path,
  *     where the corpus side stays partitioned by bucket and never
  *     broadcasts or cross-joins.
  */
object SimilaritySearch {

  /** Deterministic pseudo-random projection vectors (seeded). */
  private def planeVectors(dim: Int, planes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-pattern LSH key: bit b = sign(vec · plane_b). Each dot is one
    * native VectorDot against a literal plane vector — 8 fused loops,
    * not an 8×dim element_at expression tree (which made janino compile
    * time the dominant cost). */
  def hyperplaneKey(vec: Column, dim: Int, planes: Int, seed: Long): Column = {
    val pvs = planeVectors(dim, planes, seed)
    val bits = pvs.zipWithIndex.map { case (pv, b) =>
      val plane = typedLit[Seq[Float]](pv.map(_.toFloat).toSeq)
      val dot = graft.functions.VectorExpressions.vectorDot(vec, plane)
      when(dot >= 0, shiftleft(lit(1), b)).otherwise(0)
    }
    bits.reduce(_.bitwiseOR(_)).cast("int")
  }

  /** Exact brute-force cosine top-k. `queries` is expected to be small
    * (it is broadcast); the corpus is streamed once. Output:
    * (query_id, neighbor_id, rank) with rank 1..k, self-matches
    * excluded, ties broken by neighbor id. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Dedup.cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** IVF (inverted-file) ANN top-k: a KMeans coarse quantizer assigns
    * every corpus vector to its nearest of `nlist` centroids; each
    * query scores only the vectors in its `nprobe` closest cells. The
    * index build is one KMeans fit + one assignment pass; the search
    * shuffle is bounded by cell membership, never the corpus square.
    * Deterministic via fixed seed. */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 3, seed: Long = 13L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.linalg.Vector

    val train = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cvec"),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    // random init, not k-means||: the parallel init runs ~2 jobs per
    // init round over the corpus, and a coarse IVF quantizer doesn't
    // need init quality — Lloyd iterations converge it regardless
    // (recall is gated by the spec either way)
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .setInitMode("random")
      .fit(train.select("features"))
    val assigned = model.transform(train)
      .select(col("neighbor_id"), col("cvec"), col("prediction").as("cell"))

    val centroids = model.clusterCenters.zipWithIndex
    // nprobe nearest cells per query, computed driver-side per row via a
    // UDF over the tiny centroid set (nlist × dim doubles, broadcast)
    val probeCells = udf { (v: Seq[Float]) =>
      centroids.map { case (c: Vector, i: Int) =>
        var d = 0.0
        var j = 0
        while (j < c.size) { val t = c(j) - v(j); d += t * t; j += 1 }
        (i, d)
      }.sortBy(_._2).take(nprobe).map(_._1)
    }
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      explode(probeCells(col(vecCol))).as("cell"))

    val scored = assigned.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Dedup.cosine(col("qvec"), col("cvec")))
      .select("query_id", "neighbor_id", "cos").distinct()
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** LSH-bucketed ANN top-k with one-bit multi-probe: each query probes
    * its own bucket plus the `planes` single-bit-flip neighbors, then
    * scores only those corpus rows. Recall < 1 by construction; the
    * bench pairing is recall vs the brute-force baseline. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
      planes: Int = 8, seed: Long = 7L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
      hyperplaneKey(col(vecCol), dim, planes, seed).as("bucket"))
    val qKey = hyperplaneKey(col(vecCol), dim, planes, seed)
    val probes = array((lit(0) +: (0 until planes).map(b => shiftleft(lit(1), b))): _*)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        explode(transform(probes, m => qKey.bitwiseXOR(m))).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Dedup.cosine(col("qvec"), col("cvec")))
      .select("query_id", "neighbor_id", "cos").distinct()
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }
}
