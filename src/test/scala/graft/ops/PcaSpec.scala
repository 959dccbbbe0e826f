package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PCA gates: the Jacobi eigensolver against hand-solvable matrices,
  * momentStats against a brute-force local computation, and fit/project
  * as properties (orthonormality, eigen residual, planted-direction
  * recovery, variance accounting, determinism). */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def close(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol

  test("jacobiEigen: hand-solvable 2x2") {
    // [[2,1],[1,2]] -> eigenvalues 3 (v=(1,1)/sqrt2) and 1 (v=(1,-1)/sqrt2)
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val order = vals.indices.sortBy(i => -vals(i))
    assert(close(vals(order(0)), 3.0, 1e-10) && close(vals(order(1)), 1.0, 1e-10))
    val v0 = Array(vecs(0)(order(0)), vecs(1)(order(0)))
    assert(close(math.abs(v0(0)), math.sqrt(0.5), 1e-10))
    assert(close(v0(0), v0(1), 1e-10)) // (1,1) direction
  }

  test("jacobiEigen: diagonal matrix is its own spectrum") {
    val (vals, _) = Pca.jacobiEigen(
      Array(Array(5.0, 0.0, 0.0), Array(0.0, -2.0, 0.0), Array(0.0, 0.0, 0.5)))
    assert(vals.sorted.sameElements(Array(-2.0, 0.5, 5.0)))
  }

  // planted anisotropic cloud: dominant direction u, strong sigma along
  // u, weak isotropic noise; ids fixed -> fully deterministic
  private val dim = 8
  private lazy val planted = {
    val rnd = new scala.util.Random(7)
    val u = Array.tabulate(dim)(i => if (i == 2) 0.8 else if (i == 5) 0.6 else 0.0)
    (0L until 400L).map { id =>
      val t = rnd.nextGaussian() * 5.0
      val x = Array.tabulate(dim)(i =>
        (t * u(i) + rnd.nextGaussian() * 0.2 + (if (i == 0) 3.0 else 0.0)).toFloat)
      (id, x.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("momentStats matches a brute-force local computation") {
    val local = planted.select("embedding").as[Seq[Float]].collect()
      .map(_.map(x => math.round(x.toDouble * 1000)).toArray :+ 1L)
    val expect = (for {
      i <- 0 to dim; j <- i to dim
    } yield (i.toLong, j.toLong) ->
      local.map(x => x(i) * x(j)).sum).toMap
    val got = Pca.momentStats(planted, dim = dim).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expect)
    assert(got((dim.toLong, dim.toLong)) == 400L) // homogeneous count cell
  }

  test("fit: orthonormal components, descending eigenvalues, eigen residual") {
    val m = Pca.fit(planted, k = 4, dim = dim)
    // orthonormality
    for (a <- m.components.indices; b <- a until m.components.length) {
      val dot = m.components(a).zip(m.components(b)).map { case (x, y) => x * y }.sum
      assert(close(dot, if (a == b) 1.0 else 0.0, 1e-8),
        s"components $a,$b dot=$dot")
    }
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // residual ||C v - lambda v|| via the local covariance
    val xs = planted.select("embedding").as[Seq[Float]].collect()
      .map(_.map(_.toDouble).toArray)
    val n = xs.length.toDouble
    val mean = Array.tabulate(dim)(i => xs.map(_(i)).sum / n)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      xs.map(x => (x(i) - mean(i)) * (x(j) - mean(j))).sum / n)
    val v = m.components(0); val l = m.eigenvalues(0)
    val res = Array.tabulate(dim)(i =>
      cov(i).zip(v).map { case (c, vi) => c * vi }.sum - l * v(i))
    assert(math.sqrt(res.map(r => r * r).sum) < 1e-6)
    // mean recovered (dim 0 offset 3.0)
    assert(close(m.mean(0), 3.0, 0.1))
  }

  test("fit recovers the planted direction and its variance share") {
    val m = Pca.fit(planted, k = 2, dim = dim)
    val u = Array.tabulate(dim)(i => if (i == 2) 0.8 else if (i == 5) 0.6 else 0.0)
    val cos = m.components(0).zip(u).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.999, s"top component misaligned: cos=$cos")
    // sigma^2=25 along u vs 0.04 noise -> dominant share
    assert(m.varianceExplained > 0.9)
  }

  test("project: per-component variance equals the eigenvalue; determinism") {
    val m = Pca.fit(planted, k = 3, dim = dim)
    val pcs = Pca.project(planted, m).select("pc").as[Seq[Double]].collect()
    val n = pcs.length.toDouble
    for (c <- 0 until 3) {
      val ys = pcs.map(_(c))
      val mu = ys.sum / n
      val varc = ys.map(y => (y - mu) * (y - mu)).sum / n
      assert(math.abs(varc - m.eigenvalues(c)) < 1e-6 * math.max(1.0, m.eigenvalues(c)),
        s"component $c variance $varc vs eigenvalue ${m.eigenvalues(c)}")
      assert(close(mu, 0.0, 1e-9)) // centered projections
    }
    val m2 = Pca.fit(planted, k = 3, dim = dim)
    assert(m.components.flatMap(_.toSeq).sameElements(m2.components.flatMap(_.toSeq)))
  }

  test("fitExact is bit-identical across partitionings (integer moment pass)") {
    val a = Pca.fitExact(planted, k = 4, dim = dim)
    val b = Pca.fitExact(planted.repartition(7), k = 4, dim = dim)
    assert(a.mean.sameElements(b.mean))
    assert(a.eigenvalues.sameElements(b.eigenvalues))
    for (c <- a.components.indices)
      assert(a.components(c).sameElements(b.components(c)))
    // and it agrees with the double-path fit up to the 1/scale grid
    val d = Pca.fit(planted, k = 4, dim = dim)
    val cos = a.components(0).zip(d.components(0)).map { case (x, y) => x * y }.sum
    assert(math.abs(cos) > 0.9999, s"grid fit diverged from double fit: cos=$cos")
  }

  test("momentStats overflow fails loudly (ANSI), never silently wraps") {
    // quantized values ~3e9 → a single product ~9e18 crosses 2^63;
    // the documented bound n·(scale·max|x|)² < 2^63 is enforced by
    // ANSI arithmetic, not by luck
    val huge = Seq((0L, Seq(3.0e6f, 0f)), (1L, Seq(3.0e6f, 0f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Pca.momentStats(huge, dim = 2).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("overflow") ||
      ex.getCause != null && ex.getCause.getMessage.toLowerCase.contains("overflow"),
      s"expected a loud overflow, got: ${ex.getMessage}")
  }

  test("momentStats rejects a dim mismatch instead of silently truncating") {
    // a 4-dim vector against dim=2 used to drop the (i, j) pairs with
    // j > i + 2 without error — now it must raise
    val wide = Seq((0L, Seq(1f, 2f, 3f, 4f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Pca.momentStats(wide, dim = 2).collect()
    }
    val msg = ex.getMessage +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("momentStats") && msg.contains("dim=2"),
      s"expected the dim-mismatch raise, got: ${ex.getMessage}")
  }

  test("pcaSave/pcaLoad round-trips the model bit-exactly") {
    val m = Pca.fit(planted, k = 3, dim = dim)
    val path = java.nio.file.Files.createTempDirectory("pca-io").toString
    AnnIndexIO.pcaSave(spark, m, path)
    val l = AnnIndexIO.pcaLoad(spark, path)
    assert(l.mean.sameElements(m.mean))
    assert(l.eigenvalues.sameElements(m.eigenvalues))
    assert(l.components.length == m.components.length)
    for (c <- m.components.indices)
      assert(l.components(c).sameElements(m.components(c)))
    // a non-PCA dir fails loudly
    val other = java.nio.file.Files.createTempDirectory("pca-io2").toString
    AnnIndexIO.pcaSave(spark, m, other)
    val metaPath = new org.apache.hadoop.fs.Path(other, "meta.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(metaPath, true)
    out.write("""{"kind":"lsh"}""".getBytes); out.close()
    val ex = intercept[IllegalArgumentException](AnnIndexIO.pcaLoad(spark, other))
    assert(ex.getMessage.contains("not a PCA model"))
  }

  test("full-rank projection is an isometry of the centered cloud") {
    val m = Pca.fit(planted, k = dim, dim = dim)
    val rows = Pca.project(planted, m)
      .select(col("vec_id"), col("embedding"), col("pc"))
      .as[(Long, Seq[Float], Seq[Double])].collect().sortBy(_._1).take(20)
    for (w <- rows.sliding(2)) {
      val (_, xa, pa) = w(0); val (_, xb, pb) = w(1)
      val dx = xa.zip(xb).map { case (a, b) => (a - b).toDouble }
      val dOrig = math.sqrt(dx.map(d => d * d).sum)
      val dp = pa.zip(pb).map { case (a, b) => a - b }
      val dProj = math.sqrt(dp.map(d => d * d).sum)
      assert(math.abs(dOrig - dProj) < 1e-6 * math.max(1.0, dOrig))
    }
  }
}
