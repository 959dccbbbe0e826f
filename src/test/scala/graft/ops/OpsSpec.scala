package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic gates for the approximate operators: planted near-duplicates
  * must be found, exact baselines must bound the approximations. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  // 30 base docs of 60 random words from a 50-word vocab, plus planted
  // near-dups: one word changed (high jaccard), and one full copy.
  lazy val docs = {
    val rnd = new scala.util.Random(7)
    // vocab large enough that unrelated docs share few words — with a
    // tiny vocab every pair is genuinely similar and near-dup separation
    // doesn't exist in the data itself
    val vocab = (0 until 2000).map(i => s"w$i")
    val base = (0 until 30).map { id =>
      (id.toLong, (0 until 60).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val nearDup = {
      val (_, t) = base(3)
      val words = t.split(" "); words(10) = "CHANGED"
      (100L, words.mkString(" "))
    }
    val exactDup = (101L, base(5)._2)
    (base :+ nearDup :+ exactDup).toDF("doc_id", "text")
  }

  test("exact dedup collapses the planted copy") {
    val groups = Dedup.exactDedup(docs)
    assert(groups.count() == 31) // 32 docs, one exact dup
    assert(groups.filter(col("n_copies") === 2).count() == 1)
    val reps = Dedup.exactDedupRows(docs)
    assert(reps.count() == 31)
    assert(reps.filter(col("doc_id") === 101L).count() == 0) // rep is id 5
  }

  test("ngram jaccard finds the planted near-dup with high similarity") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 2, minIntersect = 2)
      .withColumn("j", col("inter_n").cast("double") / col("union_n"))
    val planted = pairs.filter(col("id1") === 3 && col("id2") === 100).collect()
    assert(planted.length == 1)
    assert(planted(0).getAs[Double]("j") > 0.8, s"jaccard=${planted(0)}")
    val copy = pairs.filter(col("id1") === 5 && col("id2") === 101).collect()
    assert(copy(0).getAs[Double]("j") == 1.0)
  }

  test("packed-key pair aggregate equals the generic path (wide ids, int ids, string ids)") {
    // The packed path fires when the id span fits 32 bits (the `docs`
    // fixture). Re-running the same corpus with ids spread past 2^32
    // forces the generic two-key aggregate; with string ids it must
    // also fall back; with int ids it must pack AND keep the int
    // schema. All four must emit the identical edge set.
    def edges(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
      Dedup.ngramJaccardPairs(df, n = 2, minIntersect = 2)
        .select(col("id1").cast("long"), col("id2").cast("long"), col("inter_n"), col("union_n"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val packed = edges(docs)
    val spread = 1L << 33
    val wide = edges(docs.withColumn("doc_id", col("doc_id") * spread))
      .map { case (a, b, i, u) => (a / spread, b / spread, i, u) }
    assert(packed == wide, s"packed vs wide diff: ${(packed -- wide) ++ (wide -- packed)}")
    val intDf = docs.withColumn("doc_id", col("doc_id").cast("int"))
    val intPairs = Dedup.ngramJaccardPairs(intDf, n = 2, minIntersect = 2)
    assert(intPairs.schema("id1").dataType == org.apache.spark.sql.types.IntegerType)
    assert(edges(intDf) == packed)
    val strPairs = Dedup.ngramJaccardPairs(
      docs.withColumn("doc_id", concat(lit("d"), col("doc_id"))), n = 2, minIntersect = 2)
      .select(substring(col("id1"), 2, 10).cast("long"), substring(col("id2"), 2, 10).cast("long"),
        col("inter_n"), col("union_n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .map { case (a, b, i, u) => if (a < b) (a, b, i, u) else (b, a, i, u) }.toSet
    assert(strPairs == packed)
    // the two cases the "bijective across the sign bit" claim lives on:
    // NEGATIVE ids (base < 0) and offsets crossing 2^31 (packed long
    // goes negative via shiftleft; span still < 2^32 so it must pack)
    val neg = edges(docs.withColumn("doc_id", col("doc_id") - lit(1000000L)))
      .map { case (a, b, i, u) => (a + 1000000L, b + 1000000L, i, u) }
    assert(neg == packed, "negative-id packed path diverged")
    val stretch = 97000000L // 101 ids * 97e6 ≈ 3.1e9 < 2^32: packable, crosses 2^31
    val wideOff = edges(docs.withColumn("doc_id", col("doc_id") * stretch))
      .map { case (a, b, i, u) => (a / stretch, b / stretch, i, u) }
    assert(wideOff == packed, "sign-bit-crossing packed path diverged")
  }

  test("minhash LSH recovers every high-jaccard pair the exact scan finds") {
    val exact = Dedup.ngramJaccardPairs(docs, n = 2, minIntersect = 2)
      .filter(col("inter_n") >= col("union_n") * 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashDedupPairs(docs, n = 2, numHashes = 64, bands = 32,
      minJaccard = 0.5).select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "planted pairs should exist at jaccard >= 0.5")
    // verification step makes precision exact; banding 64/16 at j>=0.5
    // has >99.9% per-pair recall — planted pairs must all surface
    assert(exact.subsetOf(lsh), s"missed: ${exact -- lsh}")
    assert(lsh.subsetOf(exact), s"false positives survived verify: ${lsh -- exact}")

    // the one-call recipe contracts those same pairs to clusters:
    // every pair endpoint is labelled, pair members share a component,
    // and the component is the cluster's minimum id
    val clusters = Dedup.minhashClusters(docs, n = 2, numHashes = 64,
      bands = 32, minJaccard = 0.5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
      assert(clusters(a) <= math.min(a, b))
    }
    assert(clusters.keySet == exact.flatMap(p => Set(p._1, p._2)))
  }

  test("hot-bucket cap drops degenerate buckets and reports them") {
    // 40 identical docs: every band bucket holds all 40 members
    val identical = (0 until 40).map(i => (i.toLong, "same words every time here"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingles(identical, 2).withColumn("sh", xxhash64(col("shingle")))
      .drop("shingle")
    val sigs = Dedup.minhashSignatures(sh, 64)
    // uncapped: quadratic candidates
    assert(Dedup.lshCandidatePairs(sigs, 64, 16).count() == 40L * 39 / 2)
    // capped below the bucket size: all buckets dropped, zero candidates
    assert(Dedup.lshCandidatePairs(sigs, 64, 16, hotBucketCap = 10).count() == 0)
    val hot = Dedup.hotBuckets(sigs, 64, 16, hotBucketCap = 10)
    assert(hot.count() == 16) // one hot bucket per band
    assert(hot.agg(max("members")).collect()(0).getLong(0) == 40)
  }

  test("label-blocked all-pairs: finds planted pair, guards oversized blocks") {
    val rnd = new scala.util.Random(11)
    def vec(seed: Int) = Array.fill(8)((rnd.nextInt(100) + seed).toFloat)
    val base = vec(0)
    val near = base.clone(); near(0) += 0.5f
    val emb = (Seq((1L, base, 0), (2L, near, 0), (3L, vec(500), 1)) ++
      (4L to 20L).map(i => (i, vec(i.toInt * 37), (i % 3).toInt)))
      .toDF("vec_id", "embedding", "label")
    val pairs = Dedup.labelBlockedNearDupPairs(emb, "label", minCosine = 0.999)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"planted pair missing from $pairs")
    // cross-label pair must never appear even if cosine-close
    assert(pairs.forall { case (a, b) => !(a == 1L && b == 3L) })
    // the guard: a block over the cap fails fast with the routing message
    val e = intercept[IllegalArgumentException] {
      Dedup.labelBlockedNearDupPairs(emb, "label", 0.9, maxBlockRows = 3)
    }
    assert(e.getMessage.contains("embeddingNearDupPairs"),
      s"guard message must route to the LSH path: ${e.getMessage}")
  }

  test("simhash: near-dup within small hamming distance, random docs far") {
    val fps = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val planted = ham(fps(3L), fps(100L))
    assert(ham(fps(5L), fps(101L)) == 0)
    val others = for (i <- 0 until 30 if i != 3; j <- i + 1 until 30 if j != 3)
      yield ham(fps(i.toLong), fps(j.toLong))
    // the planted near-dup must be strictly separated from unrelated pairs
    assert(planted < others.min,
      s"no separation: planted=$planted unrelated_min=${others.min}")
  }

  test("simhashPairs surfaces exactly the planted pairs at maxDist 3") {
    val pairs = Dedup.simhashPairs(Dedup.simhash(docs), maxDist = 3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((5L, 101L)))
    assert(pairs.forall { case (a, b) => Set((5L, 101L), (3L, 100L)).contains((a, b)) })
  }

  test("simhashPairs: a degenerate fingerprint mass is capped, reported, and cold pairs survive") {
    import spark.implicits._
    // 5000 identical fingerprints (boilerplate corpus) would emit ~12.5M
    // pairs through four chunk buckets — the cap must bound the sweep
    val mass = (0L until 5000L).map(i => (i, 0x0123456789abcdefL))
    // planted cold near-dup: distinct fingerprint pair 1 bit apart
    val planted = Seq((9001L, 0x7777000011112222L), (9002L, 0x7777000011112223L))
    val fps = (mass ++ planted).toDF("id", "simhash")
    val pairs = Dedup.simhashPairs(fps, maxDist = 3, hotChunkCap = 100)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((9001L, 9002L)),
      s"only the cold planted pair may survive the cap: ${pairs.take(5)}")
    // the drop is observable: all four chunk buckets of the mass report hot
    val hot = Dedup.hotChunks(fps, hotChunkCap = 100).collect()
    assert(hot.length == 4 && hot.forall(_.getLong(2) == 5000L),
      s"got ${hot.mkString(",")}")
    // and without a degenerate mass the cap changes nothing
    val uncapped = Dedup.simhashPairs(fps.filter(col("id") >= 9000L), maxDist = 3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped == pairs)
    spark.catalog.clearCache()
  }

  test("embedding LSH cap: a vector point mass is excluded, reported, and cold pairs survive") {
    import spark.implicits._
    val v = Array.tabulate(64)(i => (0.1f * (i % 7 + 1)))
    val neg = v.map(x => -x)
    // 1000 copies of -v (mode collapse); its bucket is the exact sign
    // complement of v's, so the planted v-pair is cold by construction
    val mass = (0L until 1000L).map(i => (i, neg.toSeq))
    val planted = Seq((9001L, v.toSeq), (9002L, v.toSeq))
    val emb = (mass ++ planted).toDF("vec_id", "embedding")
    var dropped: (Long, Long) = null
    val capped = Dedup.embeddingNearDupPairs(
        emb, dim = 64, minCosine = 0.9, hotBucketCap = 100,
        onDrop = (b, m) => dropped = (b, m))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((9001L, 9002L)),
      s"only the cold planted pair may survive: ${capped.take(5)}")
    assert(dropped == ((1L, 1000L)), s"onDrop saw $dropped")
    val hot = Dedup.embeddingHotBuckets(emb, dim = 64, hotBucketCap = 100).collect()
    assert(hot.length == 1 && hot.head.getLong(1) == 1000L, s"got ${hot.mkString(",")}")
    // the DEFAULT cap (100k) binds nothing on a bounded corpus: full
    // within-bucket recall, the mass pairs exist
    val full = Dedup.embeddingNearDupPairs(
      emb.filter(col("vec_id").isin(0L, 1L, 9001L, 9002L)), dim = 64, minCosine = 0.9)
    assert(full.count() == 2L)
  }

  test("SemDeDup cell cap: a collapsed cell is excluded, reported, and cold pairs survive") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    val v = Array.tabulate(64)(i => 0.1f * (i % 7 + 1))
    val neg = v.map(x => -x)
    // 400 near-copies of -v (one collapsed k-means cell) + 3 near-copies
    // of v (a small cold cell) — antipodal, so k=2 separates them
    val mass = (0L until 400L).map(i =>
      (i, neg.map(x => x + 0.001f * rnd.nextGaussian().toFloat).toSeq))
    val cold = (9001L to 9003L).map(i =>
      (i, v.map(x => x + 0.001f * rnd.nextGaussian().toFloat).toSeq))
    val emb = (mass ++ cold).toDF("vec_id", "embedding")
    var dropped: (Long, Long) = null
    val capped = SimilaritySearch.semanticNearDupPairs(
        emb, minCos = 0.9, nlist = 2, cellCap = 100,
        onDrop = (c, m) => dropped = (c, m))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((9001L, 9002L), (9001L, 9003L), (9002L, 9003L)),
      s"only the cold cell's pairs may survive: ${capped.take(5)}")
    assert(dropped == ((1L, 400L)), s"onDrop saw $dropped")
    // the drop is observable at the same (nlist, seed): one hot cell of 400
    val hot = SimilaritySearch.cellSizes(emb, nlist = 2)
      .filter(col("n") > 100).collect()
    assert(hot.length == 1 && hot.head.getLong(1) == 400L, s"got ${hot.mkString(",")}")
  }

  test("release-handle twins free their persisted relations, sparing unrelated cache") {
    import spark.implicits._
    spark.catalog.clearCache()
    val other = Seq((1, 2)).toDF("a", "b").cache()
    other.count()

    def drain(expectAtMost: Int, what: String): Unit = {
      // unpersist is async (blocking=false): poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (spark.sparkContext.getPersistentRDDs.size > expectAtMost &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(spark.sparkContext.getPersistentRDDs.size <= expectAtMost,
        s"$what left ${spark.sparkContext.getPersistentRDDs.size} cached relations")
    }
    val baseline = spark.sparkContext.getPersistentRDDs.size

    val corpus = Seq(
      (1L, ("alpha " * 30).trim), (2L, ("alpha " * 30).trim),
      (3L, "unique words only here with no repeats at all whatsoever now"))
      .toDF("doc_id", "text")
    val (spans, relSpans) = Dedup.exactSubstrSpansWithRelease(corpus)
    assert(spans.count() > 0)
    relSpans()
    drain(baseline, "exactSubstrSpansWithRelease")

    val fps = Dedup.simhash(corpus)
    val (sim, relSim) = Dedup.simhashPairsWithRelease(fps)
    sim.count()
    relSim()
    drain(baseline, "simhashPairsWithRelease")

    val rnd = new scala.util.Random(5)
    val emb = (0L until 50L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian().toFloat).toSeq)).toDF("vec_id", "embedding")
    val (ep, relEmb) = Dedup.embeddingNearDupPairsWithRelease(emb, dim = 64, minCosine = 0.9)
    ep.count()
    relEmb()
    drain(baseline, "embeddingNearDupPairsWithRelease")

    val (sp, relSem) = SimilaritySearch.semanticNearDupPairsWithRelease(emb, minCos = 0.9, nlist = 2)
    sp.count()
    relSem()
    drain(baseline, "semanticNearDupPairsWithRelease")

    assert(other.storageLevel.useMemory, "unrelated cache entries must survive")
    other.unpersist()
  }

  test("ANN build-search splits (LSH/IVF/PQ/IVF-PQ) equal the one-shot tiers; repeated batches reuse the index") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = (0 until 240).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + 0.3 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val qA = vecs.filter(col("vec_id") < 5)
    val qB = vecs.filter(col("vec_id").between(5, 9))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    spark.catalog.clearCache()
    val baseline = spark.sparkContext.getPersistentRDDs.size
    val ivf = SimilaritySearch.ivfBuild(vecs, nlist = 8)
    assert(rows(SimilaritySearch.ivfSearch(ivf, qA, k = 5, nprobe = 3)) ==
      rows(SimilaritySearch.ivfTopK(qA, vecs, k = 5, nlist = 8, nprobe = 3)),
      "index search must equal the one-shot plan")
    // a second, different batch runs against the SAME persisted index
    assert(rows(SimilaritySearch.ivfSearch(ivf, qB, k = 5, nprobe = 3)).nonEmpty)
    assert(ivf.cellSizes.agg(sum("members")).collect()(0).getLong(0) == 240L)
    ivf.release()

    val pq = SimilaritySearch.pqBuild(vecs, dim = 64)
    assert(rows(SimilaritySearch.pqSearch(pq, qA, k = 5, rerank = 30)) ==
      rows(SimilaritySearch.pqTopK(qA, vecs, dim = 64, k = 5, rerank = 30)),
      "PQ index search must equal the one-shot plan")
    assert(rows(SimilaritySearch.pqSearch(pq, qB, k = 5)).nonEmpty)
    pq.release()

    val lsh = SimilaritySearch.lshBuild(vecs, dim = 64, tables = 4)
    assert(rows(SimilaritySearch.lshSearch(lsh, qA, k = 5)) ==
      rows(SimilaritySearch.lshTopK(qA, vecs, dim = 64, k = 5, tables = 4)),
      "LSH index search must equal the one-shot plan")
    assert(rows(SimilaritySearch.lshSearch(lsh, qB, k = 5)).nonEmpty)
    assert(lsh.bucketSizes.agg(sum("members")).collect()(0).getLong(0) == 240L * 4)
    lsh.release()

    val fused = SimilaritySearch.ivfPqBuild(vecs, dim = 64, nlist = 8)
    assert(rows(SimilaritySearch.ivfPqSearch(fused, qA, k = 5, nprobe = 4, rerank = 30)) ==
      rows(SimilaritySearch.ivfPqTopK(qA, vecs, dim = 64, k = 5,
        nlist = 8, nprobe = 4, rerank = 30)),
      "IVF-PQ index search must equal the one-shot plan")
    assert(rows(SimilaritySearch.ivfPqSearch(fused, qB, k = 5)).nonEmpty)
    assert(fused.cellSizes.agg(sum("members")).collect()(0).getLong(0) == 240L)
    fused.release()

    // releases drain back to the baseline (async unpersist)
    val deadline = System.currentTimeMillis() + 10000
    while (spark.sparkContext.getPersistentRDDs.size > baseline &&
      System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(spark.sparkContext.getPersistentRDDs.size <= baseline)
  }

  test("ANN indexes save/load: a loaded index searches identically to the one that built it") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    val centers = Array.fill(8)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = (0 until 200).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + 0.3 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 6)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

    val lsh = SimilaritySearch.lshBuild(vecs, dim = 64, tables = 3)
    val lshExpect = rows(SimilaritySearch.lshSearch(lsh, q, k = 5))
    val lshPath = tmp("lsh-idx")
    AnnIndexIO.lshSave(lsh, lshPath)
    lsh.release(); spark.catalog.clearCache()
    val lsh2 = AnnIndexIO.lshLoad(spark, lshPath)
    assert(rows(SimilaritySearch.lshSearch(lsh2, q, k = 5)) == lshExpect)
    lsh2.release()

    val ivf = SimilaritySearch.ivfBuild(vecs, nlist = 8)
    val ivfExpect = rows(SimilaritySearch.ivfSearch(ivf, q, k = 5, nprobe = 3))
    val ivfPath = tmp("ivf-idx")
    AnnIndexIO.ivfSave(ivf, ivfPath)
    ivf.release(); spark.catalog.clearCache()
    val ivf2 = AnnIndexIO.ivfLoad(spark, ivfPath)
    assert(rows(SimilaritySearch.ivfSearch(ivf2, q, k = 5, nprobe = 3)) == ivfExpect)
    ivf2.release()

    val pq = SimilaritySearch.pqBuild(vecs, dim = 64)
    val pqExpect = rows(SimilaritySearch.pqSearch(pq, q, k = 5, rerank = 30))
    val pqPath = tmp("pq-idx")
    AnnIndexIO.pqSave(pq, pqPath)
    pq.release(); spark.catalog.clearCache()
    val pq2 = AnnIndexIO.pqLoad(spark, pqPath, vecs)
    assert(rows(SimilaritySearch.pqSearch(pq2, q, k = 5, rerank = 30)) == pqExpect)
    pq2.release()

    val fp = SimilaritySearch.ivfPqBuild(vecs, dim = 64, nlist = 8)
    val fpExpect = rows(SimilaritySearch.ivfPqSearch(fp, q, k = 5, nprobe = 4, rerank = 30))
    val fpPath = tmp("ivfpq-idx")
    AnnIndexIO.ivfPqSave(fp, fpPath)
    fp.release(); spark.catalog.clearCache()
    val fp2 = AnnIndexIO.ivfPqLoad(spark, fpPath, vecs)
    assert(rows(SimilaritySearch.ivfPqSearch(fp2, q, k = 5, nprobe = 4, rerank = 30)) == fpExpect)
    fp2.release()

    val sq = SimilaritySearch.ivfSqBuild(vecs, dim = 64, nlist = 8)
    val sqExpect = rows(SimilaritySearch.ivfSqSearch(sq, q, k = 5, nprobe = 4, rerank = 30))
    val sqPath = tmp("ivfsq-idx")
    AnnIndexIO.ivfSqSave(sq, sqPath)
    sq.release(); spark.catalog.clearCache()
    val sq2 = AnnIndexIO.ivfSqLoad(spark, sqPath, vecs)
    assert(rows(SimilaritySearch.ivfSqSearch(sq2, q, k = 5, nprobe = 4, rerank = 30)) == sqExpect)
    sq2.release()

    // a wrong-kind load fails loudly, not with a shape error downstream
    val ex = intercept[IllegalArgumentException] { AnnIndexIO.ivfLoad(spark, lshPath) }
    assert(ex.getMessage.contains("not an IVF index"))
    spark.catalog.clearCache()
  }

  test("LSH ANN achieves high recall vs brute force on clustered vectors") {
    val rnd = new scala.util.Random(11)
    // 10 cluster centers, 30 points each = 300 vectors with real structure
    val centers = Array.fill(10)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = (0 until 300).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.map(x => (x + 0.3 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 10)
    val exact = SimilaritySearch.bruteForceTopK(queries, vecs, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SimilaritySearch.lshTopK(queries, vecs, dim = 64, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")

    // multi-table LSH (E2LSH layout): independent tables OR their
    // candidates, so recall is monotone-ish in tables — 4 tables must
    // do at least as well as the single-table run on the same data
    val multi = SimilaritySearch.lshTopK(queries, vecs, dim = 64, k = 10, tables = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallMulti = (exact intersect multi).size.toDouble / exact.size
    assert(recallMulti >= recall - 0.05, s"multi=$recallMulti single=$recall")
    assert(recallMulti >= 0.8, s"recall=$recallMulti")
  }

  test("IVF ANN achieves high recall vs brute force on clustered vectors") {
    val rnd = new scala.util.Random(23)
    val centers = Array.fill(10)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = (0 until 300).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.map(x => (x + 0.3 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 10)
    val exact = SimilaritySearch.bruteForceTopK(queries, vecs, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilaritySearch.ivfTopK(queries, vecs, k = 10, nlist = 10, nprobe = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall")
  }

  test("SemDeDup pairs: exact subset of the all-pairs sweep, high recall, deterministic") {
    val rnd = new scala.util.Random(41)
    val centers = Array.fill(10)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = (0 until 300).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.map(x => (x + 0.3 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.select("id1", "id2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact reference: full all-pairs cosine at the same threshold
    val a = vecs.select(col("vec_id").as("id1"), col("embedding").as("v1"))
    val b = vecs.select(col("vec_id").as("id2"), col("embedding").as("v2"))
    val exact = pairSet(a.crossJoin(b).filter(col("id1") < col("id2"))
      .withColumn("cos", Dedup.cosine(col("v1"), col("v2")))
      .filter(col("cos") >= 0.8))
    val sem = pairSet(SimilaritySearch.semanticNearDupPairs(vecs, minCos = 0.8, nlist = 10))
    assert(sem.subsetOf(exact), "cluster blocking must not invent pairs")
    assert(exact.nonEmpty)
    val recall = (exact intersect sem).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall")
    // deterministic: same seed, same clusters, same pairs
    val again = pairSet(SimilaritySearch.semanticNearDupPairs(vecs, minCos = 0.8, nlist = 10))
    assert(sem == again)
    // the monitor accounts for every vector exactly once
    val sizes = SimilaritySearch.cellSizes(vecs, nlist = 10)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(sizes == 300L)
  }

  test("ANN query-side contract: an oversized query set fails loudly, not by driver OOM") {
    val rnd = new scala.util.Random(5)
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat).toSeq))
      .toDF("vec_id", "embedding")
    // every top-k tier collects/broadcasts the query side by design;
    // passing a corpus there must die in the require, before any collect
    def oversized(f: => org.apache.spark.sql.DataFrame): Unit = {
      val e = intercept[IllegalArgumentException](f.collect())
      assert(e.getMessage.contains("maxQueries"), e.getMessage)
    }
    oversized(SimilaritySearch.bruteForceTopK(vecs, vecs, k = 3, maxQueries = 10))
    oversized(SimilaritySearch.lshTopK(vecs, vecs, dim = 64, k = 3, maxQueries = 10))
    oversized(SimilaritySearch.ivfTopK(vecs, vecs, k = 3, maxQueries = 10))
    oversized(SimilaritySearch.pqTopK(vecs, vecs, dim = 64, k = 3, maxQueries = 10))
    oversized(SimilaritySearch.ivfPqTopK(vecs, vecs, dim = 64, k = 3, maxQueries = 10))
    // and a bounded query set is untouched
    assert(SimilaritySearch.bruteForceTopK(
      vecs.filter(col("vec_id") < 5), vecs, k = 3, maxQueries = 10).count() == 15L)
  }

  test("IVF-PQ fused ANN achieves high recall vs brute force on clustered vectors") {
    val rnd = new scala.util.Random(47)
    val centers = Array.fill(10)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = (0 until 300).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.map(x => (x + 0.3 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 10)
    val exact = SimilaritySearch.bruteForceTopK(queries, vecs, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fused = SimilaritySearch.ivfPqTopK(
        queries, vecs, dim = 64, k = 10, nlist = 10, nprobe = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect fused).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall")
    // determinism: fixed seeds, fixed sample order, exact re-rank
    val again = SimilaritySearch.ivfPqTopK(
        queries, vecs, dim = 64, k = 10, nlist = 10, nprobe = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fused == again)
  }

  test("PQ ANN achieves reasonable recall vs brute force on clustered vectors") {
    val rnd = new scala.util.Random(31)
    val centers = Array.fill(10)(Array.fill(64)(rnd.nextGaussian()))
    val vecs = (0 until 300).map { i =>
      val c = centers(i % 10)
      (i.toLong, c.map(x => (x + 0.3 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 10)
    val exact = SimilaritySearch.bruteForceTopK(queries, vecs, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // raw ADC path: quantization can't order near-equal cluster
    // siblings, so the gate is CLUSTER recall — every retrieved
    // neighbor must come from the query's own cluster (i % 10)
    val adc = SimilaritySearch.pqTopK(queries, vecs, dim = 64, k = 10, m = 16)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusterOk = adc.count { case (q, n) => q % 10 == n % 10 }
    assert(clusterOk.toDouble / adc.length >= 0.9,
      s"cluster recall=${clusterOk.toDouble / adc.length}")

    // two-stage (ADC shortlist + exact re-rank): near-exact top-k
    val reranked = SimilaritySearch.pqTopK(
      queries, vecs, dim = 64, k = 10, m = 16, rerank = 50)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect reranked).size.toDouble / exact.size
    assert(recall >= 0.9, s"reranked recall=$recall")

    // determinism: same seed, same codes, same ranking
    val again = SimilaritySearch.pqTopK(
      queries, vecs, dim = 64, k = 10, m = 16, rerank = 50)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reranked == again)
  }

  test("language ID recognizes real multilingual text") {
    // public-domain sentence fragments, one per supported language
    val samples = Seq(
      ("en", "the quick brown fox jumps over the lazy dog and then it runs into the hills where the other animals are waiting"),
      ("de", "der schnelle braune fuchs springt über den faulen hund und die anderen tiere warten in den bergen auf ihn und sie schauen zu"),
      ("fr", "le renard brun rapide saute par dessus le chien paresseux et les autres animaux attendent dans les montagnes en le regardant"),
      ("es", "el rápido zorro marrón salta sobre el perro perezoso y los demás animales esperan en las montañas mirando la escena"),
      ("it", "la rapida volpe marrone salta sopra il cane pigro e gli altri animali aspettano nelle montagne guardando la scena"))
    samples.foreach { case (lang, text) =>
      assert(TextAnalysis.detectLanguage(text) == lang, s"misclassified $lang")
    }
    assert(TextAnalysis.detectLanguage("") == "und")
    assert(TextAnalysis.detectLanguage("12345 67890") == "und")
  }

  test("fingerprint is deterministic, order-sensitive, distinct on corpus") {
    assert(TextAnalysis.fingerprint64("hello world") ==
      TextAnalysis.fingerprint64("hello world"))
    assert(TextAnalysis.fingerprint64("hello world") !=
      TextAnalysis.fingerprint64("world hello"))
    val fps = docs.select(TextAnalysis.fingerprint(col("text"))).distinct().count()
    assert(fps == 31) // 32 docs, 1 exact dup
  }

  test("pagerank: star graph concentrates rank on the hub, fixed point is exact") {
    import spark.implicits._
    // 4 spokes each pointing at hub 0, hub pointing back at every spoke
    val edges = ((1L to 4L).map(s => (s, 0L)) ++ (1L to 4L).map(s => (0L, s)))
      .toDF("src", "dst")
    // contraction factor is d^2 = 0.7225 per round-trip: 150 iterations
    // leave ~2e-11 of the initial error
    val r = PageRank.pageRank(edges, iters = 150)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // analytic fixed point: hub = 0.15 + 0.85*4*spoke, spoke = 0.15 + 0.85*hub/4
    // => hub = (0.15 + 0.6*0.85) / (1 - 0.85*0.85)
    val hub = (0.15 + 4 * 0.85 * 0.15) / (1 - 0.85 * 0.85)
    val spoke = 0.15 + 0.85 * hub / 4
    assert(math.abs(r(0L) - hub) < 1e-9, s"hub ${r(0L)} vs $hub")
    (1L to 4L).foreach(s => assert(math.abs(r(s) - spoke) < 1e-9))
    // total mass conserved at the fixed point: n*(1-d) + d*n = n
    assert(math.abs(r.values.sum - 5.0) < 1e-9)
  }

  test("pagerank: dangling nodes receive but never emit mass") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst")
    val r = PageRank.pageRank(edges, iters = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 0.15) < 1e-12 && math.abs(r(3L) - 0.15) < 1e-12)
    assert(math.abs(r(2L) - (0.15 + 0.85 * 0.3)) < 1e-12)
  }

  test("PII scrub masks emails, IPs and digit runs; counts audit the raw text") {
    import spark.implicits._
    val rows = Seq(
      (1L, "contact jane.doe+spam@mail.example.org or call 5551234567"),
      (2L, "server at 192.168.1.200 port 8080"),
      (3L, "no pii here at all"),
      (4L, "two mails: a@b.co x@y.io and ip 10.0.0.1")).toDF("id", "text")
    val out = rows.select(
        (Seq(col("id"), TextAnalysis.scrubPii(col("text")).as("s")) ++
          TextAnalysis.piiCounts(col("text")).map { case (n, c) => c.as(n) }): _*)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L)._1 == "contact <EMAIL> or call <NUM>")
    assert(out(1L)._2 == 1L && out(1L)._4 == 1L)
    assert(out(2L)._1 == "server at <IP> port <NUM>")
    assert(out(2L)._3 == 1L)
    assert(out(3L)._1 == "no pii here at all")
    assert(out(3L) == (("no pii here at all", 0L, 0L, 0L)))
    assert(out(4L)._1 == "two mails: <EMAIL> <EMAIL> and ip <IP>")
  }

  test("BM25 ranks the term-dense short doc above the diluted long one") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark hash"), // short, dense in query terms
      (2L, "spark " + Seq.fill(200)("filler").mkString(" ")), // long, diluted
      (3L, "window table row"),
      (4L, Seq.fill(50)("noise").mkString(" "))).toDF("doc_id", "text")
    val s = TextAnalysis.bm25(docs, Seq("spark", "hash", "window"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(!s.contains(4L), "doc with no query terms must not score")
    assert(s(1L)._2 == 2L && s(3L)._2 == 1L)
    assert(s(1L)._1 > s(2L)._1, s"dense ${s(1L)} must beat diluted ${s(2L)}")
    assert(s(1L)._1 > s(3L)._1)
  }

  test("unigram log-perplexity: hand-computed values, rare words cost more, OOV needs alpha") {
    import spark.implicits._
    // corpus: "a" x6, "b" x2 → p(a)=0.75, p(b)=0.25
    val tiny = Seq(
      (1L, "a a a a"),        // all common: -ln(0.75)
      (2L, "a a b b")         // half rare: (2·-ln .75 + 2·-ln .25)/4
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogPerplexity(tiny)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L)._1 == 4L)
    assert(math.abs(got(1L)._2 - (-math.log(0.75))) < 1e-12)
    val exp2 = (2 * -math.log(0.75) + 2 * -math.log(0.25)) / 4
    assert(math.abs(got(2L)._2 - exp2) < 1e-12)
    assert(got(2L)._2 > got(1L)._2, "rare words must raise perplexity")

    // foreign reference corpus: OOV scoring requires smoothing, and an
    // OOV-heavy doc must score worse than an in-domain doc
    val ref = Seq((10L, "a a a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.unigramLogPerplexity(tiny, ref = ref).collect()
    }
    val smoothed = TextAnalysis.unigramLogPerplexity(
        Seq((1L, "a a a a"), (2L, "z z z z")).toDF("doc_id", "text"),
        ref = ref, alpha = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(smoothed(2L) > smoothed(1L), s"OOV doc must cost more: $smoothed")
  }

  test("token counting matches a reference split on the test corpus") {
    val got = docs.select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.collect().foreach { r =>
      val expected = r.getString(1).split(" ").length.toLong
      assert(got(r.getLong(0)) == expected)
    }
  }

  test("second-vote candidate gate (minBandCollisions=2) keeps the verified pair set") {
    def pairs(mbc: Int) =
      Dedup.minhashDedupPairs(docs, n = 2, numHashes = 64, bands = 32,
          minJaccard = 0.5, minBandCollisions = mbc)
        .select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = pairs(1)
    assert(base.nonEmpty, "fixture must plant at least one high-jaccard pair")
    assert(pairs(2) == base,
      "the second-vote gate must not change the verified output on high-J pairs")
  }

  test("simhashPortable matches a direct char-fold reference (bigram features)") {
    val fps = Dedup.simhashPortable(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.collect().foreach { r =>
      val votes = new Array[Int](64)
      val ws = r.getString(1).split(" ", -1)
      ws.zip(ws.drop(1)).map { case (a, b) => s"$a $b" }.distinct.foreach { g =>
        val h = TextAnalysis.fingerprint64(g)
        (0 until 64).foreach { b =>
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        }
      }
      var exp = 0L
      (0 until 64).foreach(b => if (votes(b) > 0) exp |= 1L << b)
      assert(fps(r.getLong(0)) == exp, s"doc ${r.getLong(0)}")
    }
  }

  test("balanced pigeonhole: exact same pairs as contiguous chunks and brute force") {
    val fps = Dedup.simhashPortable(docs).persist()
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val contiguous = pairSet(Dedup.simhashPairs(fps, maxDist = 3))
    val balanced = pairSet(Dedup.simhashPairsBalanced(fps, maxDist = 3))
    val local = fps.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (i1, s1) <- local; (i2, s2) <- local
      if i1 < i2 && java.lang.Long.bitCount(s1 ^ s2) <= 3
    } yield (i1, i2)).toSet
    fps.unpersist()
    assert(balanced == brute, "balanced blocking lost or invented pairs")
    assert(contiguous == brute, "contiguous blocking lost or invented pairs")
    // partition sanity: the data-dependent blocks still cover 0-63 once
    val blocks = Dedup.balancedBitBlocks(Dedup.simhashPortable(docs))
    assert(blocks.flatten.sorted == (0 until 64))
    assert(blocks.size == 4)
  }

  test("balancedBlocksProbe: fused collect equals its unfused parts") {
    // the round-18 one-collect fusion must return exactly what the
    // separate probes would: same blocks, same pack base, exact count
    val fps = Dedup.simhashPortable(docs).persist()
    val (blocks, pack, n) = Dedup.balancedBlocksProbe(fps, 4)
    assert(blocks == Dedup.balancedBitBlocks(fps, 4))
    assert(pack == Dedup.pairPackBase(fps))
    assert(n == fps.count())
    fps.unpersist()
    // wide ids (span >= 2^32) must still refuse the pack in the fused
    // form — the packed single-long distinct would sign-bleed otherwise
    val wide = Seq((0L, 1L), (1L << 33, 2L)).toDF("id", "simhash")
    assert(Dedup.balancedBlocksProbe(wide, 4)._2.isEmpty)
    assert(Dedup.pairPackBase(wide).isEmpty)
  }

  test("windowChunks: hand-computed geometry, overlap, short tail") {
    // 10 words, window 4, stride 3 -> starts 0,3,6,9
    val tiny = Seq((1L, (0 until 10).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Cdc.windowChunks(tiny, windowWords = 4, strideWords = 3)
      .orderBy("chunk_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L), (3L, 9L, 1L)))
    // md5 of a full window equals md5 of the joined words
    val h = Cdc.windowChunks(tiny, 4, 3).filter(col("chunk_id") === 1)
      .select("chunk_md5").collect()(0).getString(0)
    val exp = java.security.MessageDigest.getInstance("MD5")
      .digest("w3 w4 w5 w6".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(h == exp)
    // every word position is covered by at least one chunk
    val cover = Cdc.windowChunks(tiny, 4, 3).collect()
      .flatMap(r => r.getLong(2) until (r.getLong(2) + r.getLong(3))).toSet
    assert(cover == (0L until 10L).toSet)
  }

  test("trigramCounts: hand-computed counts and context totals") {
    val tiny = Seq((1L, "a b a b a"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val got = TextAnalysis.trigramCounts(tiny)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    // doc1 trigrams: (a,b,a) (b,a,b) (a,b,a); docs 2-3 too short
    assert(got == Map(
      ("a", "b", "a") -> ((2L, 2L)),
      ("b", "a", "b") -> ((1L, 1L))))
  }
}
