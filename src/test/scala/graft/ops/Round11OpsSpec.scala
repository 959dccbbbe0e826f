package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 robustness gates: sourceOverlap's exact hot/cold density
  * routing, the levVerifiedPairs broadcast bound, updateComponents'
  * id-universe completeness, and the deterministic dirty-input
  * contracts on prefixDedup / deltaAudit / contaminationPairs. */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  test("sourceOverlap: ubiquitous shingle routes to the complement path, matrix stays exact") {
    // one bigram ("the corpus") in EVERY source — the no-signal
    // boilerplate case whose direct self-join would emit S² rows per
    // shingle — plus per-source unique bigrams and one A∩B-only bigram
    val srcs = (0 until 12).map(i => s"s$i")
    val docs = srcs.zipWithIndex.flatMap { case (s, i) =>
      Seq((i.toLong, s"the corpus unique$i tail$i", s)) ++
        (if (s == "s0" || s == "s1") Seq((100L + i, "shared pair", s)) else Nil)
    }.toDF("doc_id", "text", "source")
    // routing: exactly the ubiquitous bigram is hot (c = 12 > S/2 = 6)
    val hot = Dedup.sourceHotShingles(docs, n = 2)
      .collect().map(r => r.getLong(1)).toSeq
    assert(hot == Seq(12L), s"expected one hot shingle at c=12, got $hot")
    // exactness: every source pair shares "the corpus" (inter 1);
    // s0-s1 additionally share "shared pair" (inter 2). Set sizes:
    // s0/s1 have 4 distinct bigrams, the rest 3.
    // routeMinSources = 0 forces the density-routed plan (12 sources
    // would otherwise take the small-S direct formulation)
    val got = Dedup.sourceOverlap(docs, n = 2, routeMinSources = 0)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    // the engine orders pairs by STRING comparison (s10 < s2)
    val size = srcs.zipWithIndex.map { case (s, i) =>
      s -> (if (i <= 1) 4L else 3L) }.toMap
    val expected = (for {
      i <- srcs.indices; j <- srcs.indices if i < j
    } yield {
      val (a, b) =
        if (srcs(i) < srcs(j)) (srcs(i), srcs(j)) else (srcs(j), srcs(i))
      val inter = if (i == 0 && j == 1) 2L else 1L
      (a, b, inter, size(srcs(i)) + size(srcs(j)) - inter)
    }).toSet
    assert(got == expected, s"matrix mismatch: ${got.diff(expected)} / ${expected.diff(got)}")
  }

  test("sourceOverlap: all-identical sources (every shingle hot, cold join empty)") {
    val docs = (0 until 5).map(i => (i.toLong, "a b c d e", s"s$i"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.sourceOverlap(docs, n = 2, routeMinSources = 0)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    // 4 bigrams shared by every pair; union also 4
    val expected = (for (i <- 0 until 5; j <- 0 until 5 if i < j)
      yield (s"s$i", s"s$j", 4L, 4L)).toSet
    assert(got == expected)
    assert(Dedup.sourceHotShingles(docs, n = 2).count() == 4L)
  }

  test("levVerifiedPairs: candidate set past maxBroadcastIds fails loudly, not with an OOM") {
    val docs = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "totally different words here now ok fine yes"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.levVerifiedPairs(docs, maxDist = 3, maxLev = 16, maxBroadcastIds = 1L).count()
    }
    assert(e.getMessage.contains("maxBroadcastIds"), e.getMessage)
    // default bound: same fixture verifies the exact-copy pair
    val ok = Dedup.levVerifiedPairs(docs, maxDist = 3, maxLev = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ok == Set((1L, 2L)))
  }

  test("updateComponents: caller-supplied labelling with component not in id column survives") {
    val labels = Seq((5L, 99L)).toDF("id", "component")
    val batch = Seq((1L, 2L)).toDF("id1", "id2")
    val got = ConnectedComponents.updateComponents(labels, batch)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the labelling IS an edge (5,99): both ids must appear, labelled
    // with the component minimum; the batch edge is independent
    assert(got == Map(5L -> 5L, 99L -> 5L, 1L -> 1L, 2L -> 1L), got.toString)
  }

  test("prefixDedup: duplicated doc ROW does not inflate n_copies") {
    val docs = Seq((1L, "short doc"), (1L, "short doc"), (2L, "short doc"))
      .toDF("doc_id", "text")
    val got = Dedup.prefixDedup(docs, prefixWords = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L)), got.toString)
  }

  test("deltaAudit: duplicated id rows collapse to one deterministic status row") {
    val old = Seq((1L, "t1"), (1L, "t1"), (2L, "t2")).toDF("doc_id", "text")
    val nw = Seq((1L, "t1"), (2L, "t2")).toDF("doc_id", "text")
    val got = Corpus.deltaAudit(old, nw)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "unchanged"), got.toString)
    assert(Corpus.deltaAudit(old, nw).count() == 2L)
  }

  test("contaminationPairs: conflicting duplicate corpus ids resolve deterministically (max md5)") {
    // id 1 appears twice with different texts; the kept row is the one
    // with the LARGER md5(text) — fixed by data, not by partitioning
    val tA = "alpha beta gamma delta epsilon"
    val tB = "one two three four five"
    val keep = Seq(tA, tB).maxBy(t => java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    val corpus = Seq((1L, tA), (1L, tB)).toDF("doc_id", "text")
    val bench = Seq((9L, keep)).toDF("doc_id", "text")
    val got = Dedup.contaminationPairs(corpus, bench, n = 2, minIntersect = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // kept text shares all 4 bigrams with the benchmark doc; the
    // discarded text would have shared none
    assert(got == Set((1L, 9L, 4L)), s"kept=$keep got=$got")
  }

  test("sourceOverlap: randomized corpora match driver-side set arithmetic (both routes engaged)") {
    // Property gate on the hot/cold inclusion–exclusion assembly: for
    // seeded random corpora spanning dense (tiny vocab → shingles past
    // the S/2 threshold) and sparse regimes, the routed matrix must
    // equal plain pairwise set intersection/union computed from the
    // SAME per-source shingle sets. Isolates everything downstream of
    // the (src, sh) explode — the routing math, complement postings,
    // and grid assembly — against an oracle with no joins at all.
    val rnd = new scala.util.Random(911L)
    var hotTrials = 0
    var coldPairsSeen = 0L
    for (trial <- 0 until 8) {
      val nSrc = 2 + rnd.nextInt(9)
      // even trials: tiny vocab → bigrams land in most sources (dense,
      // hot shingles exist); odd trials: wide vocab → each bigram hits
      // few sources (sparse, cold-only)
      val vocabN = if (trial % 2 == 0) 3 + rnd.nextInt(6) else 30 + rnd.nextInt(30)
      val vocab = (0 until vocabN).map(i => s"w$i")
      val docs = (0 until nSrc).flatMap { s =>
        (0 until (1 + rnd.nextInt(4))).map { d =>
          val len = 2 + rnd.nextInt(8)
          val text = (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
          ((s * 100 + d).toLong, text, s"s$s")
        }
      }.toDF("doc_id", "text", "source")
      // per-source distinct shingle sets via the operator's own gram
      // definition (select/explode/distinct is not under test; the
      // routed assembly is)
      val sets = docs
        .select(col("source").as("src"),
          explode(Dedup.gramHashArray(col("text"), 2)).as("sh"))
        .distinct().collect()
        .groupBy(_.getString(0)).map { case (s, rs) => s -> rs.map(_.getLong(1)).toSet }
      val expected = (for {
        a <- sets.keys; b <- sets.keys if a < b
        inter = (sets(a) & sets(b)).size.toLong if inter >= 1
      } yield (a, b, inter, (sets(a) | sets(b)).size.toLong)).toSet
      // both formulations must match the set arithmetic: the routed
      // plan (forced) AND the small-S direct plan (default gate)
      val routed = Dedup.sourceOverlap(docs, n = 2, routeMinSources = 0)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet
      val direct = Dedup.sourceOverlap(docs, n = 2)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2), r.getLong(3))).toSet
      assert(routed == expected,
        s"ROUTED trial=$trial nSrc=$nSrc vocab=${vocab.size}: " +
          s"extra=${routed.diff(expected)} missing=${expected.diff(routed)}")
      assert(direct == expected,
        s"DIRECT trial=$trial nSrc=$nSrc vocab=${vocab.size}: " +
          s"extra=${direct.diff(expected)} missing=${expected.diff(direct)}")
      if (Dedup.sourceHotShingles(docs, n = 2).count() > 0) hotTrials += 1
      coldPairsSeen += expected.size
    }
    // the sweep must actually exercise both routes, not vacuously pass
    assert(hotTrials >= 1, "no trial produced a hot shingle — widen the dense regime")
    assert(hotTrials < 8, "every trial was dense — widen the sparse regime")
    assert(coldPairsSeen > 0)
  }
}
