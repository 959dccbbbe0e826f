package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMeans gates: the integer assignment kernel against a hand-computed
  * reference, and Lloyd's refinement as properties (determinism,
  * inertia descent, cluster recovery, empty-cluster survival). */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("assignToSeeds: hand-computed integer argmin, ties break to the lower seed") {
    // seeds: v0=(0,0), v1=(1,0); v2 nearer v1, v3 equidistant -> v0
    val e = emb(
      0L -> Seq(0f, 0f), 1L -> Seq(1f, 0f),
      2L -> Seq(0.9f, 0f), 3L -> Seq(0.5f, 0f))
    val out = KMeans.assignToSeeds(e, k = 2)
      .orderBy("centroid_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // quantized grid: (0,0) (1000,0) (900,0) (500,0)
    // v2: d0 = 810000, d1 = 10000 -> c1 ; v3: d0 = d1 = 250000 -> c0 (tie)
    assert(out.toSeq == Seq(
      (0L, 2L, 250000L, 0L), // members v0 (0) + v3 (250000)
      (1L, 2L, 10000L, 1L))) // members v1 (0) + v2 (10000)
  }

  test("assignToSeeds: missing seed ids fail loudly") {
    val e = emb(5L -> Seq(0f), 6L -> Seq(1f))
    val ex = intercept[IllegalArgumentException](KMeans.assignToSeeds(e, k = 2))
    assert(ex.getMessage.contains("smallest ids"))
  }

  // three well-separated planted clusters, ids arranged so the three
  // seeds (smallest ids) start one per cluster region after a few docs
  private lazy val clustered = {
    val rnd = new scala.util.Random(11)
    val centers = Seq(Seq(10f, 0f, 0f), Seq(0f, 10f, 0f), Seq(0f, 0f, 10f))
    val rows = (0 until 90).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(x => x + rnd.nextFloat() * 0.5f))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("lloyd recovers planted clusters, deterministically") {
    val (a1, c1, rel1) = KMeans.lloydWithRelease(clustered, k = 3, iters = 5)
    val got1 = a1.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rel1()
    val (a2, c2, rel2) = KMeans.lloydWithRelease(clustered, k = 3, iters = 5)
    val got2 = a2.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rel2()
    assert(got1 == got2, "assignments must be deterministic")
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq, "centroids must be deterministic")
    // planted purity: every vec_id % 3 class maps to exactly one cluster
    val byClass = got1.groupBy(_._1 % 3).map { case (k, m) => k -> m.values.toSet }
    assert(byClass.values.forall(_.size == 1), s"clusters not pure: $byClass")
    assert(byClass.values.flatten.toSet.size == 3, "three distinct clusters expected")
  }

  test("lloyd iterations do not increase inertia") {
    def inertia(iters: Int): Double = {
      val (a, _, rel) = KMeans.lloydWithRelease(clustered, k = 3, iters = iters)
      val v = a.agg(sum(col("dist"))).collect()(0).getDouble(0)
      rel(); v
    }
    val seq = Seq(inertia(0), inertia(1), inertia(3), inertia(5))
    assert(seq.sliding(2).forall { case Seq(a, b) => b <= a + 1e-9 },
      s"inertia must be non-increasing: $seq")
  }

  test("lloyd: a cluster that loses all members keeps its centroid, k stays k") {
    // all mass near (10,0); seeds 0,1,2 all start there, clusters 1/2
    // may drain to empty — must not crash or shrink k
    val rnd = new scala.util.Random(3)
    val e = (0 until 30).map(i =>
      (i.toLong, Seq(10f + rnd.nextFloat() * 0.1f, 0f))).toDF("vec_id", "embedding")
    val (a, cents, rel) = KMeans.lloydWithRelease(e, k = 3, iters = 4)
    assert(cents.length == 3)
    assert(a.count() == 30)
    rel()
  }
}
