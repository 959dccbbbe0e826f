package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed gates for the round-10 operators: length histogram,
  * OOV stats, prefix dedup, source overlap, edit-distance-verified
  * near-dup pairs, and the corpus delta audit. */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  test("lengthHistogram: hand-computed buckets, masses and cumulative docs") {
    val docs = Seq(
      (1L, "a b c d e", "en"),                       // 5 tokens  -> bucket 0
      (2L, (1 to 17).map(_ => "w").mkString(" "), "en"), // 17 -> bucket 16
      (3L, (1 to 20).map(_ => "w").mkString(" "), "en"), // 20 -> bucket 16
      (4L, (1 to 33).map(_ => "w").mkString(" "), "fr")  // 33 -> bucket 32
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.lengthHistogram(docs, bucketWidth = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      ("en", 0L, 1L, 5L, 1L),
      ("en", 16L, 2L, 37L, 3L),
      ("fr", 32L, 1L, 33L, 1L)))
  }

  test("oovStats: occurrences outside the deterministic top-k vocabulary") {
    // counts: a=3, b=3, c=1, d=1 -> top-2 (count desc, word asc) = {a, b}
    val docs = Seq((1L, "a a b c"), (2L, "a b b d")).toDF("doc_id", "text")
    val got = TextAnalysis.oovStats(docs, vocabSize = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((4L, 1L)), 2L -> ((4L, 1L))))
  }

  test("prefixDedup: shared 8-token head collapses, short docs key on full text") {
    val head = "the same eight word head repeats here verbatim"
    val docs = Seq(
      (1L, s"$head tail one"),
      (2L, s"$head a completely different continuation"),
      (3L, "short doc"),
      (4L, "short doc"),
      (5L, "unrelated words entirely of another kind altogether now ok")
    ).toDF("doc_id", "text")
    val groups = Dedup.prefixDedup(docs, prefixWords = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(groups == Set((1L, 2L), (3L, 2L), (5L, 1L)))
  }

  test("sourceOverlap: hand-computed bigram intersection/union per pair") {
    val docs = Seq(
      (1L, "x y z", "A"), (2L, "x y", "A"),   // A bigrams: {x y, y z}
      (3L, "x y q", "B"),                      // B bigrams: {x y, y q}
      (4L, "p q", "C")                         // C bigrams: {p q}
    ).toDF("doc_id", "text", "source")
    val got = Dedup.sourceOverlap(docs, n = 2)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    // pairs with zero intersection emit no row (inner join on shingle)
    assert(got == Set(("A", "B", 1L, 3L)))
  }

  test("levVerifiedPairs: exact copy at lev 0, one-word edit small, rest absent") {
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 2000).map(i => s"w$i")
    val base = (0 until 30).map { id =>
      (id.toLong, (0 until 60).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val nearDup = {
      val words = base(3)._2.split(" "); words(10) = "CHANGED"
      (100L, words.mkString(" "))
    }
    val exactDup = (101L, base(5)._2)
    val docs = (base :+ nearDup :+ exactDup).toDF("doc_id", "text")
    val got = Dedup.levVerifiedPairs(docs, maxDist = 3, maxLev = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got.contains((5L, 101L)) && got((5L, 101L)) == 0L,
      s"exact copy must verify at lev 0: $got")
    assert(got.contains((3L, 100L)) && got((3L, 100L)) <= 16L,
      s"one-word edit must verify under the lev cap: $got")
    assert(got.keySet == Set((5L, 101L), (3L, 100L)),
      s"random pairs must not pass the verify stage: $got")
  }

  test("deltaAudit: added/removed/changed/unchanged all classified") {
    val old = Seq((1L, "t1"), (2L, "t2"), (3L, "t3")).toDF("doc_id", "text")
    val nw = Seq((2L, "t2"), (3L, "t3 modified"), (4L, "t4")).toDF("doc_id", "text")
    val got = Corpus.deltaAudit(old, nw)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }
}
