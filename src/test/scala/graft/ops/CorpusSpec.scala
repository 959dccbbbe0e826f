package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-assembly (hash sampling, quota packing) + TF-IDF invariants. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()

  test("hash sample is deterministic, partition-independent, and quota-monotone") {
    val q = Map("src0" -> 600)
    val s1 = Corpus.hashSample(docs, "source", q, 250).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val s2 = Corpus.hashSample(docs.repartition(13), "source", q, 250).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "membership must not depend on partitioning")

    // a doc kept at 250 permille stays kept at every higher quota
    val at250 = Corpus.hashSample(docs, "source", Map.empty, 250)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val at600 = Corpus.hashSample(docs, "source", Map.empty, 600)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(at250.subsetOf(at600))
    assert(at250.nonEmpty && at600.size < docs.count())

    // growing the corpus never flips an existing decision
    val half = docs.filter(col("doc_id") < 250)
    val fromHalf = Corpus.hashSample(half, "source", Map.empty, 250)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fromHalf == at250.filter(_ < 250))
  }

  test("stratified top-k: exact count per stratum, deterministic, displacement-only growth") {
    val k = 20
    val picked = Corpus.stratifiedTopK(docs, "source", k)
    val perStratum = picked.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val available = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perStratum.foreach { case (s, n) => assert(n == math.min(k.toLong, available(s))) }
    assert(perStratum.keySet == available.keySet)

    // partition-independent
    val ids1 = picked.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Corpus.stratifiedTopK(docs.repartition(17), "source", k)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)

    // growing the corpus can only DISPLACE picks (new smaller hashes),
    // never reshuffle survivors' relative order: picks from a subset
    // that survive in the full draw keep their relative rank order
    def draws(df: org.apache.spark.sql.DataFrame): Map[String, Seq[(Long, Long)]] =
      Corpus.stratifiedTopK(df, "source", k)
        .select("source", "doc_id", "draw_rank").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toSeq).toMap
    val half = draws(docs.filter(col("doc_id") % 2 === 0))
    val full = draws(docs)
    half.foreach { case (src, hd) =>
      val fullRank = full(src).toMap
      val survivors = hd.filter { case (id, _) => fullRank.contains(id) }
      val byHalf = survivors.sortBy(_._2).map(_._1)
      val byFull = survivors.sortBy { case (id, _) => fullRank(id) }.map(_._1)
      assert(byHalf == byFull, s"relative draw order must be stable under growth ($src)")
    }
  }

  test("quota packing: contiguous packs, offsets within budget, token-exact layout") {
    val budget = 2048
    val packed = Corpus.quotaPack(docs, "source",
      TextAnalysis.bpeTokenEstimate(col("text")), budget)
      .withColumn("n_tok", TextAnalysis.bpeTokenEstimate(col("text")))
      .select("source", "doc_id", "pack_id", "pack_offset", "n_tok")
      .collect()
      .groupBy(_.getString(0))

    packed.foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getLong(1))
      var running = 0L
      ordered.foreach { r =>
        assert(r.getLong(2) == running / budget, "pack = floor(start/budget)")
        assert(r.getLong(3) == running % budget, "offset = start % budget")
        running += r.getLong(4)
      }
      // pack ids are contiguous from 0
      val ids = ordered.map(_.getLong(2)).distinct
      assert(ids.head == 0L && ids.toList == (ids.head to ids.last).toList)
    }

    // the two-phase prefix sum is partition-count and input-layout
    // invariant: forcing many range partitions (strata split across
    // partitions, offsets genuinely cross partition boundaries) and a
    // scrambled input layout must not move a single pack assignment
    def layout(df: org.apache.spark.sql.DataFrame, n: Option[Int]) =
      Corpus.quotaPack(df, "source",
        TextAnalysis.bpeTokenEstimate(col("text")), budget, numPartitions = n)
        .select("doc_id", "pack_id", "pack_offset").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val base = layout(docs, None)
    assert(layout(docs.repartition(13), Some(17)) == base,
      "pack layout must be partition-independent")
    assert(layout(docs, Some(1)) == base,
      "single-partition degenerate case agrees")
  }

  test("greedy packing: budget never exceeded, oversized docs isolated, partition-independent") {
    val budget = 2048
    def check(input: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] = {
      val rows = Corpus.greedyPack(input, "source",
        TextAnalysis.bpeTokenEstimate(col("text")), budget)
        .withColumn("n_tok", TextAnalysis.bpeTokenEstimate(col("text")))
        .select("source", "doc_id", "pack_id", "pack_offset", "n_tok")
        .collect()
      rows.groupBy(r => (r.getString(0), r.getLong(2))).map { case (key, members) =>
        val total = members.map(_.getLong(4)).sum
        // a pack larger than budget must be a single oversized doc
        assert(total <= budget || members.length == 1,
          s"pack $key holds $total tokens over ${members.length} docs")
        // offsets are the exact head-to-tail layout within the pack
        val ordered = members.sortBy(_.getLong(1))
        var fill = 0L
        ordered.foreach { m => assert(m.getLong(3) == fill); fill += m.getLong(4) }
        key -> total
      }
    }
    val a = check(docs)
    val b = check(docs.repartition(17)) // layout must not depend on partitioning
    assert(a == b)
    assert(a.keys.map(_._1).toSet == Set((0 until 20).map(i => s"src$i"): _*))

    // oversized single doc gets its own pack; neighbors pack normally
    import spark.implicits._
    val tiny = Seq(
      (1L, "srcX", "a " * 100),     // ~50 BPE tokens
      (2L, "srcX", "b " * 20000),   // ~10000 tokens > budget
      (3L, "srcX", "c " * 100)
    ).toDF("doc_id", "source", "text")
    val packed = Corpus.greedyPack(tiny, "source",
      TextAnalysis.bpeTokenEstimate(col("text")), budget)
      .select("doc_id", "pack_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(packed(1L) == 0L && packed(2L) == 1L && packed(3L) == 2L)
  }

  test("quota packing keeps NULL-stratum rows (null-safe offset join)") {
    import spark.implicits._
    val tiny = Seq(
      (1L, Option("srcA"), 100L),
      (2L, Option("srcA"), 100L),
      (3L, Option.empty[String], 100L),
      (4L, Option.empty[String], 100L)
    ).toDF("doc_id", "source", "n")
    val packed = Corpus.quotaPack(tiny, "source", col("n"), budgetTokens = 150)
    assert(packed.count() == 4, "NULL-stratum rows must survive the offset join")
    val got = packed.select("doc_id", "pack_id", "pack_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // NULL is its own stratum: docs 3/4 lay out head-to-tail from 0,
    // independent of srcA's layout
    assert(got == Set((1L, 0L, 0L), (2L, 0L, 100L), (3L, 0L, 0L), (4L, 0L, 100L)))
    spark.catalog.clearCache()

    // same row-loss class in the chunked variant: its first-row-per-
    // stratum join must be null-safe too
    val chunkPacked = Corpus.greedyPackChunked(
      tiny, "source", col("n"), budgetTokens = 150, chunkRows = 10)
    assert(chunkPacked.count() == 4,
      "NULL-stratum rows must survive the chunk-base join")
    val gotC = chunkPacked.select("doc_id", "pack_id", "pack_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotC == Set((1L, 0L, 0L), (2L, 1L, 0L), (3L, 0L, 0L), (4L, 1L, 0L)))
    spark.catalog.clearCache()
  }

  test("quotaPack offsets collect is bounded: over-fine strata fail fast, defaults unaffected") {
    // one stratum per row → offsets rows ≈ row count, over the tiny bound
    val fine = docs.withColumn("s", col("doc_id").cast("string"))
    val ex = intercept[IllegalArgumentException] {
      Corpus.quotaPack(fine, "s", lit(10L), budgetTokens = 100, maxOffsetRows = 16)
    }
    assert(ex.getMessage.contains("maxOffsetRows"))
    // the same shape passes under the default bound (correctness of the
    // fold itself is q42's oracle + the tests above)
    assert(Corpus.quotaPack(fine, "s", lit(10L), budgetTokens = 100).count() == docs.count())
    spark.catalog.clearCache()
  }

  test("chunked greedy packing: budget kept, packs never span chunks, partition-independent") {
    val budget = 2048
    val chunkRows = 32
    def collectOut(input: org.apache.spark.sql.DataFrame, np: Option[Int]) =
      Corpus.greedyPackChunked(input, "source",
        TextAnalysis.bpeTokenEstimate(col("text")), budget, chunkRows,
        numPartitions = np)
        .withColumn("n_tok", TextAnalysis.bpeTokenEstimate(col("text")))
        .select("source", "doc_id", "pack_id", "pack_offset", "n_tok")
        .collect()
    val out = collectOut(docs, None)
    assert(out.length == docs.count())
    // greedy guarantees hold per pack: budget kept (single-oversize-doc
    // exception), offsets are the exact head-to-tail layout
    out.groupBy(r => (r.getString(0), r.getLong(2))).foreach { case (key, members) =>
      val total = members.map(_.getLong(4)).sum
      assert(total <= budget || members.length == 1,
        s"pack $key holds $total tokens over ${members.length} docs")
      val ordered = members.sortBy(_.getLong(1))
      var fill = 0L
      ordered.foreach { m => assert(m.getLong(3) == fill); fill += m.getLong(4) }
    }
    // packs never span a chunk boundary: pack_id / chunkRows recovers
    // the member's within-stratum chunk for every member
    out.groupBy(_.getString(0)).foreach { case (_, members) =>
      val ordinal = members.map(_.getLong(1)).sorted.zipWithIndex.toMap
      members.foreach { r =>
        assert(ordinal(r.getLong(1)) / chunkRows == r.getLong(2) / chunkRows,
          s"pack ${r.getLong(2)} crosses a chunk boundary")
      }
    }
    // pure function of (ids, tokens): partitioning never moves a row
    val a = out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val b = collectOut(docs.repartition(17), Some(7))
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(a == b, "chunked layout must be partition-count invariant")
    spark.catalog.clearCache()
  }

  test("temperature sampling: exact quotas by alpha, deterministic, NULL strata kept") {
    import spark.implicits._
    // skewed corpus: 160 / 36 / 4 docs across three sources
    val skewed = ((0 until 160).map(i => (i.toLong, "big")) ++
      (200 until 236).map(i => (i.toLong, "mid")) ++
      (300 until 304).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    def quotas(alpha: Double, n: Long) =
      Corpus.temperatureSample(skewed, "source", alpha, n)
        .groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap

    // alpha=1: proportional largest remainder of 50 over (160,36,4):
    // exact shares 40 / 9 / 1
    assert(quotas(1.0, 50) == Map("big" -> 40L, "mid" -> 9L, "small" -> 1L))
    // alpha=0: uniform weights — equal split, capped by the small stratum
    val u = quotas(0.0, 30)
    assert(u("small") == 4L && u("big") == 10L && u("mid") == 10L, s"got $u")
    // alpha=0.5 sits between: tail upweighted vs proportional — and the
    // 'small' stratum's sqrt-boosted quota (≈4.8) caps at its 4 docs,
    // so the total is 49, NOT silently redistributed (the documented
    // no-redistribution rule: capping must not change other quotas)
    val t = quotas(0.5, 50)
    assert(t("small") == 4L && t("big") < 40L, s"got $t")
    assert(t.values.sum == 49L, s"got $t")

    // deterministic and partition-invariant (same rows, any layout)
    val a = Corpus.temperatureSample(skewed, "source", 0.5, 50)
      .select("doc_id").as[Long].collect().toSet
    val b = Corpus.temperatureSample(skewed.repartition(13), "source", 0.5, 50)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)

    // NULL is a legitimate stratum (null-safe quota join)
    val withNull = skewed.union(Seq((400L, null.asInstanceOf[String]),
      (401L, null.asInstanceOf[String])).toDF("doc_id", "source"))
    val nulled = Corpus.temperatureSample(withNull, "source", 1.0, 100)
    assert(nulled.filter(col("source").isNull).count() > 0,
      "NULL-stratum rows must be sampleable")

    // over-fine strata fail fast like quotaPack
    val fine = skewed.withColumn("s", col("doc_id").cast("string"))
    val ex = intercept[IllegalArgumentException] {
      Corpus.temperatureSample(fine, "s", 0.5, 10, maxStrata = 16)
    }
    assert(ex.getMessage.contains("maxStrata"))
  }

  test("interleaveByWeight keeps NULL-stratum rows (null-safe first-index join)") {
    import spark.implicits._
    val tiny = Seq((1L, Option("a")), (2L, Option("a")),
      (3L, Option.empty[String]), (4L, Option.empty[String]))
      .toDF("doc_id", "source")
    val out = Corpus.interleaveByWeight(tiny, "source", weights = Map("a" -> 2.0))
    assert(out.count() == 4, "NULL-stratum rows must survive the mixture order")
    assert(out.filter(col("source").isNull).count() == 2)
    spark.catalog.clearCache()
  }

  test("chunked greedy packing equals a pure-Scala greedy reference run per chunk") {
    // independent differential oracle: replay the declared semantics —
    // within each stratum (id order), chunk every `chunkRows` docs,
    // then close-on-overflow greedily inside the chunk with pack ids
    // based at chunk × chunkRows — and demand bit-equality
    val budget = 2048
    val chunkRows = 7 // deliberately unaligned with pack sizes
    val tok = TextAnalysis.bpeTokenEstimate(col("text"))
    val rows = docs.select(col("source"), col("doc_id"), tok.as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = rows.groupBy(_._1).flatMap { case (_, members) =>
      val ordered = members.sortBy(_._2)
      ordered.grouped(chunkRows).zipWithIndex.flatMap { case (chunk, ci) =>
        var pack = ci.toLong * chunkRows
        var fill = 0L
        chunk.map { case (_, id, n) =>
          if (fill > 0 && fill + n > budget) { pack += 1; fill = 0L }
          val r = (id, pack, fill)
          fill += n
          r
        }
      }
    }.toSet
    val got = Corpus.greedyPackChunked(docs, "source", tok, budget, chunkRows)
      .select("doc_id", "pack_id", "pack_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect,
      s"diff: missing=${(expect -- got).take(3)} extra=${(got -- expect).take(3)}")
    spark.catalog.clearCache()
  }

  test("chunked greedy packing bounds task input under a planted half-corpus stratum") {
    val chunkRows = 16
    // plant the skew greedyPack cannot parallelize: one stratum = half the corpus
    val skewed = docs.withColumn("source",
      when(col("doc_id") % 2 === 0, lit("whale")).otherwise(col("source")))
    val out = Corpus.greedyPackChunked(skewed, "source",
      TextAnalysis.bpeTokenEstimate(col("text")), 2048, chunkRows)
    // the shuffle key is (stratum, chunk) and pack_id / chunkRows == chunk,
    // so every task's group is ≤ chunkRows rows BY CONSTRUCTION — the
    // whale stratum becomes n/chunkRows parallel groups, not one task
    val groups = out
      .withColumn("chunk", floor(col("pack_id") / chunkRows).cast("long"))
      .groupBy("source", "chunk").count()
    val maxGroup = groups.agg(max("count")).head().getLong(0)
    assert(maxGroup <= chunkRows, s"a (stratum, chunk) group holds $maxGroup rows")
    val whaleGroups = groups.filter(col("source") === "whale").count()
    assert(whaleGroups >= 10, "the whale stratum must split into many bounded groups")
    spark.catalog.clearCache()
  }

  test("repetition metrics flag degenerate docs and agree with hand counts") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "spam spam spam spam"),
      (2L, "four distinct healthy words")).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(tiny).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(m(1L) == ((4L, 1L, 4L, 16L))) // 4 words, 1 distinct, top=4, 4*4 chars
    assert(m(2L) == ((4L, 4L, 1L, 24L)))
    // the repetition ratio separates the degenerate doc
    assert(m(1L)._2 * 2 < m(1L)._1 && m(2L)._2 == m(2L)._1)
  }

  test("contamination check surfaces a planted benchmark passage") {
    import spark.implicits._
    val passage = "the quick brown fox jumps over the lazy dog again"
    val benchmark = Seq(
      (1000L, passage),
      (1001L, "completely unrelated benchmark question here")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"intro text $passage trailing words"),        // contaminated
      (2L, "clean document about something else entirely"),
      (3L, "quick brown material but only a fox fragment") // below threshold
    ).toDF("doc_id", "text")
    val hits = Dedup.contaminationPairs(corpus, benchmark, n = 2, minIntersect = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(hits.map(h => (h._1, h._2)).toSet == Set((1L, 1000L)))
    val (_, _, inter, benchN) = hits.head
    // the full passage is contained: overlap equals the benchmark size
    assert(inter == benchN)

    // dirty input: duplicated rows on either side must not double-count
    // shingles (set semantics — otherwise the threshold silently halves)
    val dirty = Dedup.contaminationPairs(
      corpus.union(corpus), benchmark.union(benchmark), n = 2, minIntersect = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(dirty.toSet == hits.toSet)
  }

  test("HLL distinct-vocab sketch lands within 5% of the exact count") {
    val words = docs.select(col("source"), explode(split(col("text"), " ")).as("word"))
    val both = words.groupBy("source")
      .agg(count_distinct(col("word")).as("exact"),
        approx_count_distinct(col("word"), 0.02).as("approx"))
      .collect()
    both.foreach { r =>
      val (exact, approx) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.05).toLong),
        s"${r.getString(0)}: exact=$exact approx=$approx")
    }
  }

  test("bloom-prefiltered contamination equals the exact sweep bit-for-bit") {
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val bench = docs.filter(col("doc_id") % 50 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val exact = rows(Dedup.contaminationPairs(corpus, bench, n = 2, minIntersect = 4))
    val viaBloom = rows(Dedup.contaminationPairsBloom(corpus, bench, n = 2, minIntersect = 4))
    assert(viaBloom == exact, "bloom prefilter must not change the exact answer")
    assert(exact.nonEmpty)

    // dirty-input parity (round 16: the bloom path's guard moved from
    // a pre-explode max_by shuffle to a posting-level max-md5-version
    // election; both must keep electing the SAME row): duplicate ids
    // with CONFLICTING texts and ids duplicated as IDENTICAL rows must
    // still produce the exact sweep's answer bit-for-bit
    import spark.implicits._
    val conflict = corpus.limit(30).collect().map(r =>
      (r.getLong(0), "planted conflicting text that matches nothing"))
      .toSeq.toDF("doc_id", "text")
    val identical = corpus.limit(20)
      .select(col("doc_id"), col("text").cast("string").as("text"))
    val dirty = corpus.select(col("doc_id"), col("text"))
      .unionByName(conflict).unionByName(identical)
    val exactD = rows(Dedup.contaminationPairs(dirty, bench, n = 2, minIntersect = 4))
    val bloomD = rows(Dedup.contaminationPairsBloom(dirty, bench, n = 2, minIntersect = 4))
    assert(bloomD == exactD,
      "bloom path must reproduce the exact sweep's dirty-input election")
  }

  test("ngram doc-frequency cap drops exactly what hotShingles reports") {
    import spark.implicits._
    // 6 docs sharing one boilerplate bigram; 2 docs sharing a rare one
    val boiler = "common header text"
    val tiny = (1 to 6).map(i => (i.toLong, s"$boiler unique$i filler$i")) ++
      Seq((7L, "rare pair alpha"), (8L, "rare pair beta"))
    val docs8 = tiny.toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(docs8, n = 2).count()
    val capped = Dedup.ngramJaccardPairs(docs8, n = 2, maxDocFrequency = Some(4))
    // the 6-doc boilerplate shingles die; the rare 2-doc pair survives
    assert(capped.filter(col("id1") === 7 && col("id2") === 8).count() == 1)
    assert(capped.count() < uncapped)
    val hot = Dedup.hotShingles(docs8, n = 2, maxDocFrequency = 4).collect()
    assert(hot.nonEmpty && hot.forall(_.getLong(2) > 4))
  }

  test("tfidf: rarer terms score higher at equal tf; distinctiveTerms agrees") {
    val tiny = Seq(
      (1L, "alpha beta beta"),
      (2L, "alpha gamma"),
      (3L, "alpha delta")).toDF("doc_id", "text")
    val scores = TextAnalysis.tfidf(tiny).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("word")) ->
        r.getAs[Double]("tfidf")).toMap
    // 'alpha' is in every doc (df=3), 'gamma' in one (df=1): same tf=1
    assert(scores((2L, "gamma")) > scores((2L, "alpha")))
    // tf dominates at equal df: beta(tf=2,df=1) > gamma(tf=1,df=1)
    assert(scores((1L, "beta")) > scores((2L, "gamma")))

    val top = TextAnalysis.distinctiveTerms(tiny, k = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top(1L) == "beta") // highest tf wins
    assert(top(2L) == "gamma" && top(3L) == "delta") // rarest wins over alpha
  }

  test("shuffle shards: exact sizes, total permutation, partition-count invariant") {
    val shardSize = 64
    val out = Corpus.shuffleShards(docs, shardSize).cache()
    val n = docs.count()
    try {
      // ranks form a permutation: every (shard, pos) unique, sizes exact
      assert(out.count() == n)
      assert(out.select("shard_id", "pos_in_shard").distinct().count() == n)
      val sizes = out.groupBy("shard_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val lastShard = (n - 1) / shardSize
      sizes.foreach { case (shard, size) =>
        if (shard < lastShard) assert(size == shardSize, s"shard $shard size $size")
        else assert(size == n - lastShard * shardSize)
      }
      // the global order IS (md5(id), id): pos 0 of shard 0 has the
      // smallest draw overall
      val first = out.filter(col("shard_id") === 0 && col("pos_in_shard") === 0)
        .select("doc_id").collect()(0).getLong(0)
      val expectFirst = docs.select(col("doc_id"))
        .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
        .limit(1).collect()(0).getLong(0)
      assert(first == expectFirst)
      // the assignment is a pure function of the ids: parallelism and
      // input partitioning must not move a single row
      val again = Corpus.shuffleShards(docs.repartition(7), shardSize,
        numPartitions = Some(3))
      val a = out.select("doc_id", "shard_id", "pos_in_shard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val b = again.select("doc_id", "shard_id", "pos_in_shard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(a == b, "shard assignment must be partition-count invariant")
    } finally { out.unpersist(); spark.catalog.clearCache() }
  }

  test("weighted interleave: proportional at every prefix, partition-count invariant") {
    val out = Corpus.interleaveByWeight(docs, "source",
      weights = Map("src0" -> 4.0), defaultWeight = 1.0).cache()
    try {
      val n = docs.count()
      assert(out.count() == n)
      assert(out.select("train_rank").distinct().count() == n) // total order
      // src0 (25 docs at weight 4) exhausts within the first ~25/4 of
      // the virtual axis: every prefix until then carries ~4 src0 docs
      // per 1 doc of any single other stratum
      val first40 = out.filter(col("train_rank") < 40)
        .groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val src0 = first40.getOrElse("src0", 0L)
      val others = first40.filter(_._1 != "src0").values
      assert(src0 >= 6, s"weight-4 stratum underrepresented: $first40")
      others.foreach(c => assert(c <= src0,
        s"weight-1 stratum outpaced the weight-4 one: $first40"))
      // pure function of (id, stratum, weight): partitioning never moves a row
      val again = Corpus.interleaveByWeight(docs.repartition(7), "source",
        weights = Map("src0" -> 4.0), numPartitions = Some(3))
      val a = out.select("doc_id", "train_rank").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val b = again.select("doc_id", "train_rank").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(a == b, "train order must be partition-count invariant")
    } finally { out.unpersist(); spark.catalog.clearCache() }
  }

  test("span dedup: duplicated document keeps nothing, unique spans all kept") {
    val tiny = Seq(
      // 1 and 2 share identical text (2 keeps 0 spans); 3 is unique
      (1L, Array.fill(25)("w").zipWithIndex.map(p => s"t${p._2}").mkString(" ")),
      (2L, Array.fill(25)("w").zipWithIndex.map(p => s"t${p._2}").mkString(" ")),
      (3L, (0 until 25).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(tiny, windowWords = 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // 25 words → spans of 10/10/5 words
    assert(out(1L) == ((3L, 3L, Seq("t0 t1 t2 t3 t4 t5 t6 t7 t8 t9",
      "t10 t11 t12 t13 t14 t15 t16 t17 t18 t19",
      "t20 t21 t22 t23 t24").map(_.length).sum.toLong)))
    assert(out(2L)._1 == 3L && out(2L)._2 == 0L && out(2L)._3 == 0L)
    assert(out(3L)._1 == 3L && out(3L)._2 == 3L)

    // corpus-level conservation: every distinct span hash kept exactly once
    val full = Dedup.spanDedup(docs, windowWords = 10)
    val keptTotal = full.agg(sum("n_kept")).collect()(0).getLong(0)
    val distinctSpans = docs.select(explode(split(col("text"), " ")).as("w"))
      .count() // sanity only: forces the same scan
    assert(distinctSpans > 0)
    val expectDistinct = Dedup.spanDedup(docs.select(col("doc_id") + 1000000L as "doc_id",
      col("text")), windowWords = 10).agg(sum("n_kept")).collect()(0).getLong(0)
    assert(keptTotal == expectDistinct, "kept-span total is id-shift invariant")
  }

  test("exact-substring spans: any-alignment repeats found, islands merged, planted offsets exact") {
    // doc 2 repeats doc 1's words 6..20 starting at ITS position 4 — a
    // chunk-aligned spanDedup misses this (no 10-word chunk matches);
    // alignment-free stride-1 windows must find it
    val w1 = (0 until 30).map(i => s"a$i")
    val d2 = (0 until 3).map(i => s"x$i") ++ w1.slice(5, 20) ++ (0 until 5).map(i => s"y$i")
    val tiny = Seq(
      (1L, w1.mkString(" ")),
      (2L, d2.mkString(" ")),
      (3L, (0 until 30).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstrSpans(tiny, windowWords = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 2's tokens 4..18 (1-based) copy doc 1's a5..a19: 15 duplicated
    // tokens → stride-1 window starts 4..9 (6 overlapping windows merge
    // into ONE island), span [4, 18]; docs 1 (first occurrence) and 3
    // (unique) emit none
    assert(out.toSeq == Seq((2L, 4L, 18L, 6L)), s"got ${out.mkString(",")}")

    // islands: two SEPARATE repeats in one doc stay two spans (the
    // overlapping-window merge is covered above)
    val far = (0 until 3).map(i => s"p$i") ++ w1.slice(0, 10) ++
      (0 until 7).map(i => s"q$i") ++ w1.slice(15, 25)
    val spans = Dedup.exactSubstrSpans(
        Seq((1L, w1.mkString(" ")), (9L, far.mkString(" "))).toDF("doc_id", "text"),
        windowWords = 10).filter(col("id") === 9L)
      .orderBy("span_start").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(spans.toSeq == Seq((4L, 13L), (21L, 30L)), s"got ${spans.mkString(",")}")

    // full corpus: id-shifted rerun produces identical spans (the
    // operator is a pure function of (order, content))
    val a = Dedup.exactSubstrSpans(docs, windowWords = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Dedup.exactSubstrSpans(
        docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")),
        windowWords = 10).collect()
      .map(r => (r.getLong(0) - 1000000L, r.getLong(1), r.getLong(2))).toSet
    assert(a == b, "spans are id-shift invariant")
  }

  test("property: exactSubstrSpans equals a brute-force reference on random repeat-heavy corpora (seeded)") {
    // tiny vocab + short windows force dense repetition at every
    // alignment; the reference compares WINDOW TEXT directly (no
    // hashing, no Spark) so the two implementations share no code path
    val rnd = new scala.util.Random(97)
    val L = 3
    (0 until 8).foreach { trial =>
      val vocab = (0 until 5).map(i => s"v$i")
      val corpus = (1L to 5L).map { id =>
        (id, (0 until (10 + rnd.nextInt(15)))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val toks = corpus.map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty) }.toMap
      val wins = corpus.flatMap { case (id, _) =>
        val w = toks(id)
        (1 to w.length - L + 1).map(p => (id, p, w.slice(p - 1, p - 1 + L).mkString(" ")))
      }
      val firstOf = scala.collection.mutable.HashMap[String, (Long, Int)]()
      wins.sortBy { case (id, p, _) => (id, p) }.foreach { case (id, p, t) =>
        if (!firstOf.contains(t)) firstOf(t) = (id, p)
      }
      val expected = wins
        .filter { case (id, p, t) => firstOf(t) != ((id, p)) }
        .groupBy(_._1).flatMap { case (id, ws) =>
          val spans = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
          ws.map(_._2).sorted.foreach { p =>
            if (spans.nonEmpty && p <= spans.last._2 + L) {
              val (s, _, c) = spans.last
              spans(spans.size - 1) = (s, p, c + 1)
            } else spans += ((p, p, 1))
          }
          spans.map { case (s, last, c) =>
            (id, s.toLong, (last + L - 1).toLong, c.toLong) }
        }.toSet
      val got = Dedup.exactSubstrSpans(corpus.toDF("doc_id", "text"), windowWords = L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expected,
        s"trial $trial: got ${got.toSeq.sorted} expected ${expected.toSeq.sorted}")

      // the xxhash64 production twin (8-byte shuffle keys) emits
      // identical spans on the same repeat-heavy corpus
      val xx = Dedup.exactSubstrSpans(corpus.toDF("doc_id", "text"), windowWords = L,
          hashMode = "xxhash64")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(xx == expected, s"trial $trial: xxhash64 mode diverged")
    }
  }

  test("exactDedupRows keeper election prunes map-side via WindowGroupLimit") {
    // rn === 1 is a rank limit: Spark's InferWindowGroupLimit must
    // push a per-partition top-1 ahead of the exchange, so a content
    // hash with 10^8 copies reaches the window sort as <= one row per
    // map task, never the full occurrence list
    val plan = Dedup.exactDedupRows(docs).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"plan lost the group-limit pushdown:\n${plan.take(1500)}")
    // and the result is the exact per-hash min-id representative set
    val reps = Dedup.exactDedupRows(docs).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val expected = Dedup.exactDedup(docs).select("rep_id").collect()
      .map(_.getLong(0)).toSet
    assert(reps == expected)
  }

  test("exactSubstrSpans election is skew-tolerant: no per-hash window sort; a 100k-repeat boilerplate gram completes") {
    // the first-occurrence election must be a min-aggregation (partial
    // aggregation absorbs hot hashes map-side; a skewed join partition
    // is AQE-splittable), never a row_number window partitioned by the
    // hash (one task sorts ALL occurrences of a boilerplate gram)
    val plan = Dedup.exactSubstrSpans(docs, windowWords = 10)
      .queryExecution.optimizedPlan
    val windowSpecs = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.partitionSpec.map(_.toString).mkString(",")
    }
    assert(windowSpecs.nonEmpty, "sanity: the per-doc islands window exists")
    assert(windowSpecs.forall(s => !s.startsWith("h#") && !s.contains(",h#")),
      s"election must not window-partition by the hash: $windowSpecs")

    // degenerate corpus: ONE 10-gram repeated across 100k docs — every
    // window shares a single hash (the 100 TB license-header shape)
    val gram = (0 until 10).map(i => s"b$i").mkString(" ")
    val boiler = spark.range(100000L)
      .select(col("id").as("doc_id"), lit(gram).as("text"))
    val out = Dedup.exactSubstrSpans(boiler, windowWords = 10)
    // every doc except the first occurrence (doc 0) is one full span
    assert(out.count() == 99999L)
    assert(out.filter(col("span_start") === 1L && col("span_end") === 10L &&
      col("n_windows") === 1L).count() == 99999L)
  }

  test("applySubstrSpans cuts exactly the duplicated regions; the cleaned corpus is substr-clean") {
    // planted shape from the spans test: doc 2's tokens 4..18 copy doc 1
    val w1 = (0 until 30).map(i => s"a$i")
    val d2 = (0 until 3).map(i => s"x$i") ++ w1.slice(5, 20) ++ (0 until 5).map(i => s"y$i")
    val tiny = Seq(
      (1L, w1.mkString(" ")),
      (2L, d2.mkString(" ")),
      (3L, (0 until 30).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val cleaned = Dedup.applySubstrSpans(tiny,
      Dedup.exactSubstrSpans(tiny, windowWords = 10))
    val byId = cleaned.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(byId(1L) == ((w1.mkString(" "), 0L)), "first occurrence survives verbatim")
    assert(byId(2L) == ((((0 until 3).map(i => s"x$i") ++
      (0 until 5).map(i => s"y$i")).mkString(" "), 15L)), s"got ${byId(2L)}")
    assert(byId(3L)._2 == 0L, "unique doc untouched")

    // the real corpus: spans applied → re-running the generator on the
    // cleaned text finds nothing (Lee et al.'s fixpoint property), and
    // removal totals reconcile with the span lengths
    val spans = Dedup.exactSubstrSpans(docs, windowWords = 10)
    val clean = Dedup.applySubstrSpans(docs, spans)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val removedTotal = clean.agg(sum("n_removed")).collect()(0).getLong(0)
    val spanTotal = spans.agg(sum(col("span_end") - col("span_start") + 1))
      .collect()(0).getLong(0)
    assert(removedTotal == spanTotal,
      s"removed $removedTotal tokens but spans cover $spanTotal")
    val residual = Dedup.exactSubstrSpans(
      clean.select(col("id").as("doc_id"), col("clean_text").as("text")),
      windowWords = 10)
    assert(residual.count() == 0L, "cleaned corpus must contain no duplicate windows")
    clean.unpersist()
  }
}
