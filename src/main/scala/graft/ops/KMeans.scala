package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means over an embedding column.
  *
  * Two surfaces:
  *   - [[assignToSeeds]] — ONE exact assignment pass against
  *     deterministic integer-quantized seed centroids. All arithmetic
  *     is BIGINT (squared L2 over round(x·1000) components), so the
  *     argmin is bit-deterministic in any engine — this is the
  *     oracle-gated kernel that proves the distributed assignment
  *     machinery (broadcast-literal centroids, struct-min argmin, one
  *     k-key aggregate) against DuckDB.
  *   - [[lloydWithRelease]] — full Lloyd's iteration in double
  *     arithmetic: assignment is the same broadcast-literal kernel;
  *     the centroid update is a (cluster, dim) aggregation whose
  *     result (k×dim rows) is the only driver state. Spec-gated
  *     (floating point; summation order makes cross-engine hashing
  *     meaningless) by determinism + inertia-descent properties.
  *
  * Scale shape: centroids ride into the plan as literals (k×dim
  * doubles — broadcast-sized by construction); assignment is
  * map-side-only column algebra inside whole-stage codegen (zip_with +
  * aggregate, no UDF); the per-iteration shuffle is the (cluster, dim)
  * partial-aggregated sum — k×dim final rows however large the corpus.
  * Nothing corpus-sized is ever collected.
  *
  * The coarse quantizers in [[SimilaritySearch]] (IVF/SemDeDup) fit on
  * a bounded driver-side sample by design; this operator is the
  * full-corpus refinement path for when cluster quality justifies the
  * extra passes (cf. Lloyd 1982; Bahmani et al., VLDB'12 on why
  * sample-then-refine is the scalable formulation).
  */
object KMeans {

  /** Integer-quantized copy of a float-vector column: round(x·1000) per
    * component as BIGINT. The cast to double happens BEFORE the
    * multiply so every engine sees the same IEEE product, making the
    * rounded grid — and everything computed from it — exact. */
  def quantized(vec: Column, scale: Int = 1000): Column =
    transform(vec, x => round(x.cast("double") * scale).cast("long"))

  /** Squared L2 distance between an integer vector column and a literal
    * integer centroid — BIGINT-exact, codegen-friendly array algebra. */
  private def sqDistInt(xq: Column, cq: Seq[Long]): Column =
    aggregate(zip_with(xq, typedlit(cq), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, v) => acc + v)

  /** Exact one-pass assignment of every vector to its nearest seed
    * centroid (seeds = the k vectors with the smallest ids, quantized
    * like everything else; ties on distance break to the lower
    * centroid id via struct-lexicographic min). Output one row per
    * centroid: (centroid_id, n_members, inertia, min_member) — all
    * BIGINT.
    *
    * The only non-scan jobs are the k-row seed collect (bounded by
    * construction) and the final k-key aggregate; the distance argmin
    * is a map-side projection over broadcast-literal centroids. */
  def assignToSeeds(
      emb: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = emb.select(col(idCol).cast("long").as("id"),
      quantized(col(vecCol)).as("xq"))
    val seeds = e.filter(col("id") < k).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq))
    require(seeds.length == k,
      s"assignToSeeds: expected the $k smallest ids below $k, found ${seeds.length}")
    val dists = seeds.map { case (cid, cq) =>
      struct(sqDistInt(col("xq"), cq).as("dist"), lit(cid).as("cid"))
    }
    val best = array_min(array(dists.toIndexedSeq: _*))
    e.select(col("id"), best.getField("cid").as("cid"), best.getField("dist").as("dist"))
      .groupBy(col("cid").as("centroid_id"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("dist")).as("inertia"),
        min(col("id")).as("min_member"))
  }

  /** Nearest-centroid struct (dist, cluster) for double centroids. */
  private def nearest(v: Column, cents: Array[Array[Double]]): Column =
    array_min(array(cents.zipWithIndex.map { case (c, i) =>
      struct(
        aggregate(zip_with(v, typedlit(c.toIndexedSeq), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("dist"),
        lit(i).as("cluster"))
    }.toIndexedSeq: _*))

  /** Full Lloyd's iteration: init from the k smallest ids, then `iters`
    * rounds of (broadcast-literal assignment → (cluster, dim) mean).
    * Deterministic given the input (init is id-ordered, argmin ties
    * break to the lower cluster index, the per-dim mean is a Spark
    * aggregate). A cluster that loses all members keeps its previous
    * centroid. Returns (assignments (id, cluster, dist), centroids,
    * release) — the input projection is persisted across iterations;
    * call release after consuming the assignments. */
  def lloydWithRelease(
      emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, Array[Array[Double]], () => Unit) = {
    require(k > 0 && iters >= 0, s"lloyd: need k>0, iters>=0 (got $k, $iters)")
    val e = emb.select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), _.cast("double")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents: Array[Array[Double]] = e.filter(col("id") < k).orderBy("id")
      .collect().map(_.getSeq[Double](1).toArray)
    require(cents.length == k,
      s"lloyd: expected the $k smallest ids below $k, found ${cents.length}")
    for (_ <- 0 until iters) {
      // centroid update: partial-aggregated (cluster, dim) sums — the
      // collect is k×dim rows, independent of corpus size
      // two projections: a Generate (posexplode) in the same select as
      // the argmin struct makes the analyzer re-derive the struct type
      // with positional field names, breaking the getField
      val stats = e.select(nearest(col("v"), cents).getField("cluster").as("cluster"),
          col("v"))
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cluster", "dim")
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      stats.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
      }
      cents = next
    }
    val fin = e.select(col("id"), nearest(col("v"), cents).as("best"))
      .select(col("id"), col("best.cluster").as("cluster"), col("best.dist").as("dist"))
    (fin, cents, () => { e.unpersist(blocking = false); () })
  }

  def lloyd(emb: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, Array[Array[Double]]) = {
    val (a, c, _) = lloydWithRelease(emb, k, iters, idCol, vecCol)
    (a, c)
  }
}
