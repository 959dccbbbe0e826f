package graft.ops

import graft.SparkSpec
import graft.streaming.StoreCommits
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-16: the five batch ANN operators fold bounded per-query top-K
  * accumulators INSIDE the scoring mapPartitions
  * ([[graft.streaming.StoreCommits.TopKMap]], the round-15 stream
  * rework) instead of emitting one row per scored pair and ranking
  * with a window over the candidate-proportional pair relation.
  *
  *   - the `emitted` probe counts exactly the rows each scoring
  *     partition sends to the exchange: the specs assert it is bounded
  *     by partitions × nq × cap and far below the pair count — the
  *     per-pair shape the streams measured at 130–630 s at nq=10k–50k
  *     cannot reappear without tripping this;
  *   - bruteForceTopK must still equal the per-pair broadcast-join +
  *     window reference BIT-EXACTLY (ids, ranks, and cosine values) —
  *     the proof the fold changed the plan, not the answer;
  *   - TopK's large-cap hash membership path (cap > 64, the deep
  *     re-rank shortlist regime) must order and dedup exactly like the
  *     small-cap linear path and a naive max-per-id reference. */
class Round16BatchAnnSpec extends SparkSpec {

  private val nCorpus = 8000
  private val nq = 100

  /** Clustered synthetic corpus (16 centers, 64-dim) — non-degenerate
    * LSH buckets / IVF cells so every tier exercises its real pruned
    * path. */
  private lazy val corpus: DataFrame = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(16)
    val centers = Array.fill(16)(Array.fill(64)(rnd.nextGaussian()))
    (0 until nCorpus).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => (x + 0.5 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }
  private lazy val queries: DataFrame = corpus.filter(col("vec_id") < nq)

  // generous partition ceiling for the emitted bound (local[4] plans
  // 4–8 scoring tasks; rebalance can lift small inputs to
  // defaultParallelism, never past the session parallelism × a few)
  private val partCeil = 32

  private def acc() = spark.sparkContext.longAccumulator

  test("bruteForceTopK: bounded survivors reach the exchange; result equals the per-pair window reference bit-exactly") {
    val em = acc()
    val got = SimilaritySearch.bruteForceTopK(queries, corpus, k = 5, emitted = Some(em))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val pairs = nq.toLong * (nCorpus - 1)
    assert(em.value <= partCeil.toLong * nq * 5,
      s"emitted=${em.value} exceeds the partitions×nq×k bound")
    assert(em.value * 10 <= pairs,
      s"emitted=${em.value} is pair-proportional (pairs=$pairs)")

    // the old shape, verbatim: broadcast join + cosine expression + window
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Dedup.cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    val ref = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rank"), r.getAs[Double]("cos"))).toSet
    assert(got == ref, "fold must change the plan, not the answer")
  }

  test("lshSearch / ivfSearch: bucket/cell-indexed scoring emits only bounded survivors") {
    val emLsh = acc()
    val lsh = SimilaritySearch.lshBuild(corpus, dim = 64, planes = 6, tables = 4)
    val lshRows = SimilaritySearch.lshSearch(lsh, queries, k = 5, emitted = Some(emLsh)).count()
    lsh.release()
    assert(lshRows > 0)
    assert(emLsh.value <= partCeil.toLong * nq * 5,
      s"LSH emitted=${emLsh.value} exceeds the partitions×nq×k bound")

    val emIvf = acc()
    val ivf = SimilaritySearch.ivfBuild(corpus, nlist = 16)
    val ivfRows = SimilaritySearch.ivfSearch(ivf, queries, k = 5, nprobe = 8,
      emitted = Some(emIvf)).count()
    ivf.release()
    assert(ivfRows > 0)
    assert(emIvf.value <= partCeil.toLong * nq * 5,
      s"IVF emitted=${emIvf.value} exceeds the partitions×nq×k bound")
  }

  test("pqSearch / ivfPqSearch: the ADC fold emits only the shortlist-bounded survivors") {
    val emPq = acc()
    val pq = SimilaritySearch.pqBuild(corpus, dim = 64)
    val pqRows = SimilaritySearch.pqSearch(pq, queries, k = 5, rerank = 30,
      emitted = Some(emPq)).count()
    pq.release()
    assert(pqRows > 0)
    assert(emPq.value <= partCeil.toLong * nq * 30,
      s"PQ emitted=${emPq.value} exceeds the partitions×nq×cap bound")
    assert(emPq.value * 5 <= nq.toLong * (nCorpus - 1),
      s"PQ emitted=${emPq.value} is pair-proportional")

    val emFused = acc()
    val touches = acc()
    val fused = SimilaritySearch.ivfPqBuild(corpus, dim = 64, nlist = 16)
    val fusedRows = SimilaritySearch.ivfPqSearch(fused, queries, k = 5,
      nprobe = 8, rerank = 20, touches = Some(touches), emitted = Some(emFused)).count()
    fused.release()
    assert(fusedRows > 0)
    assert(emFused.value <= partCeil.toLong * nq * 20,
      s"IVF-PQ emitted=${emFused.value} exceeds the partitions×nq×cap bound")
    // the emitted survivors are also far below the probed candidates
    assert(emFused.value * 3 <= touches.value,
      s"IVF-PQ emitted=${emFused.value} tracks the candidate count (${touches.value})")
  }

  test("ivfSqSearch: byte-per-dim codes, one-step quantization error, bounded survivors") {
    val sq = SimilaritySearch.ivfSqBuild(corpus, dim = 64, nlist = 16)
    // the memory claim: dim bytes per vector (vs 4·dim raw float32)
    val codeLens = sq.encoded.select(length(col("code")).as("l"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(codeLens == Set(64), s"code lengths $codeLens != {dim}")

    // in-sample quantization error ≤ half a step per dimension: the
    // whole 8k corpus is inside the 20k fit sample, so no clamping —
    // reconstruct residuals and compare against the exact unit vector
    val coarse = sq.coarse
    val vmin = sq.vmin
    val vstep = sq.vstep
    val raw = corpus.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    sq.encoded.collect().take(500).foreach { r =>
      val id = r.getLong(0)
      val cell = r.getInt(1)
      val code = r.getAs[Array[Byte]](2)
      val vf = raw(id)
      var s = 0.0; vf.foreach(x => s += x.toDouble * x)
      val inv = if (s == 0) 0.0 else 1.0 / math.sqrt(s)
      val unit = vf.map(x => (x * inv).toFloat)
      var t = 0
      while (t < 64) {
        val resid = unit(t).toDouble - coarse(cell)(t)
        val decoded = vmin(t) + (code(t) & 0xff) * vstep(t)
        assert(math.abs(decoded - resid) <= vstep(t) / 2 + 1e-9,
          s"id=$id dim=$t error ${math.abs(decoded - resid)} > step/2 ${vstep(t) / 2}")
        t += 1
      }
    }

    // the fold bound: only shortlist survivors reach the exchange,
    // and per-row work is O(queries-probing-cell)
    val em = acc()
    val touches = acc()
    val rows = SimilaritySearch.ivfSqSearch(sq, queries, k = 5, nprobe = 8,
      rerank = 20, touches = Some(touches), emitted = Some(em)).count()
    sq.release()
    assert(rows > 0)
    assert(em.value <= partCeil.toLong * nq * 20,
      s"IVF-SQ emitted=${em.value} exceeds the partitions×nq×cap bound")
    assert(em.value * 3 <= touches.value,
      s"IVF-SQ emitted=${em.value} tracks the candidate count (${touches.value})")
  }

  test("ivfSqTopK: exact re-rank equals brute force on the planted corpus") {
    val planted = SimilaritySearch.plantedNeighborCorpus(corpus)
    val qs = planted.filter(col("vec_id") < 10)
    val got = SimilaritySearch.ivfSqTopK(qs, planted, dim = 64, k = 5,
        nprobe = 10, rerank = 192)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ref = SimilaritySearch.bruteForceTopK(qs, planted, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == ref, "SQ8 + exact re-rank must equal brute force on planted structure")
  }

  test("TopK large-cap hash membership orders and dedups exactly like the linear path") {
    val rnd = new scala.util.Random(1616)
    // duplicate-heavy insert stream: ids re-appear with different scores
    val inserts = Array.fill(5000)((rnd.nextInt(400).toLong, rnd.nextInt(1000) / 997.0))
    def drained(cap: Int): List[(Long, Long, Double)] = {
      val t = new StoreCommits.TopK(cap)
      inserts.foreach { case (nid, sc) => t.insert(nid, sc) }
      t.drain(7L).toList
    }
    def naive(cap: Int): List[(Long, Long, Double)] =
      inserts.groupBy(_._1).map { case (nid, arr) => (nid, arr.map(_._2).max) }
        .toList.sortBy { case (nid, sc) => (-sc, nid) }
        .take(cap).map { case (nid, sc) => (7L, nid, sc) }
    assert(drained(50) == naive(50), "small-cap linear path vs naive reference")
    assert(drained(200) == naive(200), "large-cap hash path vs naive reference")
    // the two paths agree on their common prefix
    assert(drained(200).take(50) == drained(50))
  }
}
