package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column, organized the
  * only way that survives 100 TB: the corpus pass reduces to the
  * d(d+1)/2 second-moment sufficient statistics (a tiny-keyed partial
  * aggregation — each scan task holds one ~d²-entry hash map, the
  * exchange moves ~d² rows per task, the corpus itself never
  * shuffles), the d×d symmetric eigenproblem is solved on the driver
  * (d is small by construction — 64 here; O(d³) is microseconds), and
  * the projection back over the corpus is a broadcast-literal map-side
  * product with no shuffle at all. This is the covariance-method PCA
  * every distributed ML stack uses (MLlib's `RowMatrix
  * .computePrincipalComponents` has the same shape); re-derived here as
  * pure DataFrame algebra so the moment pass stays inside whole-stage
  * codegen and the statistic itself is oracle-checkable.
  *
  * Two precision regimes, deliberately separate:
  *   - [[momentStats]] is INTEGER-exact on the round(x·1000) grid
  *     (same quantization recipe as [[KMeans.quantized]]) — the
  *     cross-engine-checkable artifact (q80's DuckDB oracle).
  *   - [[fit]]/[[project]] run in full double precision — the model
  *     quality path, property-gated by PcaSpec (orthonormality, eigen
  *     residual, variance accounting) rather than a SQL oracle.
  *
  * reference analog: none — embedding-space corpus curation
  * (SemDeDup-style clustering, whitening before ANN) is part of the
  * extended training-data surface.
  */
object Pca {

  /** Integer-exact PCA sufficient statistics in ONE corpus pass via the
    * homogeneous-coordinate trick: append a constant 1 to the
    * quantized vector, then the upper-triangle products of the
    * (d+1)-vector contain every statistic at once —
    *   - (i, j) with i ≤ j < d:  Σ xq_i·xq_j  (second moments)
    *   - (i, d):                 Σ xq_i       (first moments)
    *   - (d, d):                 n            (row count)
    * Output: (i BIGINT, j BIGINT, s BIGINT), (d+1)(d+2)/2 rows.
    *
    * The double explode looks corpus-sized but never materializes: the
    * partial hash aggregate consumes it in the same codegen stage, so
    * each task emits ≤ (d+1)(d+2)/2 rows regardless of input size. */
  def momentStats(emb: DataFrame, vecCol: String = "embedding",
      dim: Int = 64): DataFrame = {
    val d1 = dim + 1
    // fail loudly on a dim mismatch: slice() below would otherwise
    // silently DROP (i, j) pairs with j > i + dim on longer vectors
    val checked = when(size(col(vecCol)) === dim, col(vecCol))
      .otherwise(raise_error(concat(
        lit(s"momentStats: embedding length "),
        size(col(vecCol)).cast("string"), lit(s" != dim=$dim"))))
    val base = emb.select(
      concat(KMeans.quantized(checked), array(lit(1L))).as("xq"))
    val e1 = base.select(col("xq"), posexplode(col("xq")).as(Seq("i", "xi")))
    // slice is 1-based: start i+1 keeps 0-based elements i..d, so the
    // inner posexplode position jj maps to column j = i + jj
    val e2 = e1.select(col("i"), col("xi"),
      posexplode(slice(col("xq"), col("i") + 1, lit(d1))).as(Seq("jj", "xj")))
    e2.select(col("i").cast("long").as("i"),
        (col("i") + col("jj")).cast("long").as("j"),
        (col("xi") * col("xj")).as("p"))
      .groupBy("i", "j").agg(sum(col("p")).as("s"))
  }

  /** Fitted model: feature means, top-k components (rows, unit-norm,
    * eigenvalue-descending), and ALL d eigenvalues of the covariance
    * (the tail is what variance-explained accounting needs). Driver
    * state is O(d²) — broadcastable by construction. */
  final case class Model(mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double]) {
    def k: Int = components.length
    def dim: Int = mean.length
    def varianceExplained: Double = {
      val tot = eigenvalues.sum
      if (tot == 0.0) 0.0 else eigenvalues.take(k).sum / tot
    }
  }

  /** Covariance-method fit: one double-precision moment pass (same
    * single-aggregation shape as [[momentStats]], homogeneous trick
    * included), then a driver-side Jacobi eigensolve of the d×d
    * covariance. Deterministic up to float-sum merge order (the
    * distributed double sum's combine order can vary with scheduling
    * at the last-ulp level — harmless for model quality; use
    * [[fitExact]] when bit-reproducibility across runs matters). */
  def fit(emb: DataFrame, k: Int, vecCol: String = "embedding",
      dim: Int = 64): Model = {
    val d1 = dim + 1
    val base = emb.select(concat(
      transform(col(vecCol), x => x.cast("double")), array(lit(1.0))).as("x"))
    val e1 = base.select(col("x"), posexplode(col("x")).as(Seq("i", "xi")))
    val e2 = e1.select(col("i"), col("xi"),
      posexplode(slice(col("x"), col("i") + 1, lit(d1))).as(Seq("jj", "xj")))
    val rows = e2.select(col("i"), (col("i") + col("jj")).as("j"),
        (col("xi") * col("xj")).as("p"))
      .groupBy("i", "j").agg(sum(col("p")).as("s"))
      .collect() // bounded: (d+1)(d+2)/2 rows ≤ 2145 at d=64
    val sums = Array.ofDim[Double](d1, d1)
    rows.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1); val s = r.getDouble(2)
      sums(i)(j) = s; sums(j)(i) = s
    }
    fitFromSums(sums, k, dim)
  }

  /** BIT-deterministic fit: the moment pass is [[momentStats]]'s
    * integer aggregation on the round(x·scale) grid, so the covariance
    * fed to the eigensolve is derived from EXACT integers by a fixed
    * formula — the fitted model is byte-identical across runs,
    * schedulers, and partitionings (the double path's sum-merge order
    * is not). The grid costs ~1/scale quantization noise on the input,
    * irrelevant beside sampling noise for any real corpus.
    *
    * Overflow bound: n · (scale · max|x|)² must stay below 2⁶³ —
    * 9·10¹⁸ gives ~10¹² rows of unit-norm-ish vectors at scale=1000.
    * Past that, lower `scale` (the product shrinks quadratically) or
    * accept the double path. */
  def fitExact(emb: DataFrame, k: Int, vecCol: String = "embedding",
      dim: Int = 64, scale: Int = 1000): Model = {
    val d1 = dim + 1
    val rows = momentStats(emb, vecCol, dim).collect()
    val s2 = scale.toDouble * scale
    val sums = Array.ofDim[Double](d1, d1)
    rows.foreach { r =>
      val i = r.getLong(0).toInt; val j = r.getLong(1).toInt
      // de-quantize: raw products carry scale² (both factors), first
      // moments carry scale (the homogeneous 1 is unscaled), n carries 1
      val v =
        if (i == dim && j == dim) r.getLong(2).toDouble
        else if (j == dim) r.getLong(2) / scale.toDouble
        else r.getLong(2) / s2
      sums(i)(j) = v; sums(j)(i) = v
    }
    fitFromSums(sums, k, dim)
  }

  private def fitFromSums(
      sums: Array[Array[Double]], k: Int, dim: Int): Model = {
    require(k >= 1 && k <= dim, s"k=$k out of range 1..$dim")
    val n = sums(dim)(dim)
    require(n > 0, "PCA fit on an empty relation")
    val mean = Array.tabulate(dim)(i => sums(i)(dim) / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      sums(i)(j) / n - mean(i) * mean(j)
    }
    val (eigVals, eigVecs) = jacobiEigen(cov)
    val order = eigVals.indices.sortBy(i => -eigVals(i))
    val comps = order.take(k).map { c =>
      val v = Array.tabulate(dim)(r => eigVecs(r)(c))
      // sign convention: largest-|coord| entry positive → deterministic
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(pivot) < 0) v.map(-_) else v
    }.toArray
    Model(mean, comps, order.map(eigVals).toArray)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: returns
    * (eigenvalues, eigenvector-columns). Classic textbook form
    * (Golub & Van Loan §8.5) — O(d³) per sweep, converges
    * quadratically; plenty below d ≈ 10³ driver-side. */
  private[ops] def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (off > 1e-12 && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // tan of the annihilating rotation; theta=0 → 45° (t=1)
            val sgn = if (theta >= 0.0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  /** Project the corpus onto the fitted components: for each component
    * c, y_c = Σ_i (x_i − mean_i)·w_ci. Broadcast-literal mean/rotation,
    * pure codegen array algebra, zero shuffles — appendable to any
    * downstream pipeline (ANN over the reduced space, whitened
    * clustering) without a corpus pass of its own. */
  def project(emb: DataFrame, model: Model,
      vecCol: String = "embedding", outCol: String = "pc"): DataFrame = {
    val centered = zip_with(col(vecCol),
      typedlit(model.mean.toSeq), (x, mu) => x.cast("double") - mu)
    val pcs = model.components.map { w =>
      aggregate(zip_with(centered, typedlit(w.toSeq), (xc, wi) => xc * wi),
        lit(0.0), (acc, p) => acc + p)
    }
    emb.withColumn(outCol, array(pcs.toIndexedSeq: _*))
  }
}
