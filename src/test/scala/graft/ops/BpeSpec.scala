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

  test("a word frequent enough becomes a single token") {
    val docs = (Seq.fill(50)("spark") ++ Seq("a", "b", "c")).toDF("text")
    val merges = Bpe.train(docs, numMerges = 20)
    val toks = Bpe.encodeWord("spark", merges.zipWithIndex.toMap)
    assert(toks == List("spark" + Bpe.EndOfWord), s"got $toks")
  }
}
