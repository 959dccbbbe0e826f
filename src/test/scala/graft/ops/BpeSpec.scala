package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trained-BPE gates: merge order on a known corpus, exact
  * detokenization roundtrip, determinism, compression sanity. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("most frequent pair merges first; ties break lexicographically") {
    // 'ab' appears 12x (6 per word type x counts), dominating all pairs
    val docs = Seq.fill(6)("abcd abef").mkString(" ").split(" ").toSeq
      .toDF("text")
    val merges = Bpe.train(docs, numMerges = 1)
    assert(merges == Vector(("a", "b")), s"got $merges")
  }

  test("training is deterministic and encoding roundtrips the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m1 = Bpe.train(docs, numMerges = 150)
    val m2 = Bpe.train(docs, numMerges = 150)
    assert(m1 == m2, "same corpus + same budget must learn identical merges")
    // the tiny test vocabulary exhausts its pairs before the budget —
    // training stops when every word type is a single symbol
    assert(m1.nonEmpty && m1.size <= 150)

    val enc = Bpe.encoderUdf(spark, m1)
    val out = docs.select(col("doc_id"), col("text"), enc(col("text")).as("toks"))
      .collect()
    out.foreach { r =>
      val text = r.getString(1)
      val toks = r.getSeq[String](2)
      assert(Bpe.decode(toks) == text, s"roundtrip broke for doc ${r.getLong(0)}")
      // sanity: subword tokens compress chars but can't beat words
      val nWords = text.split(" ").count(_.nonEmpty)
      assert(toks.size >= nWords, "at least one token per word")
      assert(toks.size <= text.length, "no worse than character-level")
    }
  }

  test("roundtrip survives sentinel-forging text and non-BMP codepoints") {
    val tricky = Seq(
      (1L, "plain text here"),
      (2L, "html-ish </w> tags </w> inside"), // would forge a "</w>" sentinel
      (3L, "emoji 😀 and 🤖 words"), // surrogate pairs
      (4L, "😀😀 doubled")).toDF("doc_id", "text")
    val merges = Bpe.train(tricky, numMerges = 30)
    val enc = Bpe.encoderUdf(spark, merges)
    tricky.select(col("doc_id"), col("text"), enc(col("text")).as("toks"))
      .collect().foreach { r =>
        assert(Bpe.decode(r.getSeq[String](2)) == r.getString(1),
          s"roundtrip broke for doc ${r.getLong(0)}: '${r.getString(1)}'")
      }
  }

  test("two encoders in one JVM never serve each other's tokenizations") {
    val corpusA = Seq.fill(20)("aaaa").toDF("text")
    val corpusB = Seq.fill(20)("aa bb").toDF("text")
    val encA = Bpe.encoderUdf(spark, Bpe.train(corpusA, numMerges = 10))
    val encB = Bpe.encoderUdf(spark, Bpe.train(corpusB, numMerges = 10))
    val probe = Seq("aaaa").toDF("text")
    val a = probe.select(encA(col("text"))).head().getSeq[String](0)
    val b = probe.select(encB(col("text"))).head().getSeq[String](0)
    // A fully merged 'aaaa'; B only learned 'aa' — the memo must not
    // cross-contaminate (it is keyed per encoder, not per broadcast id)
    assert(a == Seq("aaaa" + Bpe.EndOfWord), s"got $a")
    assert(a != b, s"encoder B leaked encoder A's memo: $b")
  }

  test("a word frequent enough becomes a single token") {
    val docs = (Seq.fill(50)("spark") ++ Seq("a", "b", "c")).toDF("text")
    val merges = Bpe.train(docs, numMerges = 20)
    val toks = Bpe.encodeWord("spark", merges.zipWithIndex.toMap)
    assert(toks == List("spark" + Bpe.EndOfWord), s"got $toks")
  }
}
