package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer, trained on the corpus itself — the
  * real version of [[TextAnalysis.bpeTokenEstimate]]'s chars/4 proxy
  * (Sennrich et al. 2016, the standard subword algorithm behind GPT/
  * Llama-family vocabularies).
  *
  * Training: ONE distributed aggregation produces the distinct-word
  * frequency table (bounded by vocabulary, not corpus size — the top
  * `maxDistinctWords` by frequency, deterministic tie-break); the
  * merge loop then runs on the driver over that table, which is the
  * standard formulation — pair statistics are a reduction over word
  * types × counts, so a 100 TB corpus contributes exactly one row per
  * distinct word. Same bounded-sample argument as the PQ codebook fit:
  * a vocab-sized model cannot absorb corpus-sized training state.
  *
  * Encoding: merge ranks broadcast to executors; each word encodes by
  * repeatedly applying the lowest-rank merge present (greedy BPE), with
  * a per-executor memo so repeated words (Zipf says: most of them)
  * encode once. Deterministic — same text + same merges = same tokens
  * everywhere.
  *
  * End-of-word is modeled with a private-use sentinel codepoint so
  * detokenization is exact: `decode(encode(text)) == text` for any
  * single-space-separated text free of U+E000 (spec-gated roundtrip —
  * and unlike the classic "</w>" sentinel, ordinary text cannot forge
  * it by concatenation).
  */
object Bpe {

  /** End-of-word sentinel: U+E000 (private use) rather than the
    * classic "</w>" — a multi-char sentinel is forgeable by ordinary
    * text ("</w>" in an HTML-ish document would concatenate into a
    * fake sentinel and break decode), while PUA codepoints do not
    * occur in real corpora. A text that DOES contain U+E000 is outside
    * the exact-roundtrip domain (documented, not silently corrupted:
    * encode treats it as an ordinary symbol, only decode's
    * sentinel→space mapping is ambiguous then). */
  val EndOfWord = "\uE000"

  /** Split on CODE POINTS, not UTF-16 chars — per-char splitting would
    * cut surrogate pairs (emoji, CJK extensions) into lone surrogates,
    * which Catalyst's UTF8String conversion then mangles. */
  private def symbolsOf(word: String): Array[String] =
    word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** Train `numMerges` merge rules. Deterministic: the most frequent
    * pair wins each round, ties broken by the lexicographically
    * smallest (left, right). */
  def train(
      df: DataFrame, numMerges: Int,
      textCol: String = "text",
      maxDistinctWords: Int = 1000000): Vector[(String, String)] = {
    val wordCounts: Array[(String, Long)] = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxDistinctWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // word type -> (symbol sequence, corpus count)
    var vocab: Array[(Array[String], Long)] = wordCounts.map { case (w, c) =>
      (symbolsOf(w) :+ EndOfWord, c)
    }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val pairCounts = new scala.collection.mutable.HashMap[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // most frequent pair; ties break on the lexicographically
        // smallest (left, right) so training is order-independent
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val (l, r) = best
        val joined = l + r
        vocab = vocab.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                out += joined; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, c)
          }
        }
        round += 1
      }
    }
    merges.result()
  }

  /** Greedy BPE encode of one word (no sentinel in the input; the
    * [[EndOfWord]] sentinel is appended here and stays on the final
    * token). */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): List[String] = {
    var syms: List[String] = symbolsOf(word).toList ::: List(EndOfWord)
    var improved = true
    while (improved && syms.lengthCompare(1) > 0) {
      // find the lowest-rank adjacent pair
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      var cur = syms
      while (cur.nonEmpty && cur.tail.nonEmpty) {
        val rank = ranks.getOrElse((cur.head, cur.tail.head), Int.MaxValue)
        if (rank < bestRank) { bestRank = rank; bestIdx = i }
        cur = cur.tail; i += 1
      }
      if (bestIdx < 0) improved = false
      else {
        val (pre, rest) = syms.splitAt(bestIdx)
        syms = pre ::: ((rest.head + rest.tail.head) :: rest.tail.tail)
      }
    }
    syms
  }

  /** Distributed encoder: merge ranks broadcast once, per-executor word
    * memo (Zipf: the hot words dominate, each encodes once per JVM).
    * The memo key is a fresh UUID per encoder — broadcast ids are a
    * per-SparkContext counter, so keying on them would serve a STALE
    * merge table after a context restart recycled an id. The broadcast
    * itself is reclaimed by the ContextCleaner once the returned UDF
    * is unreachable. */
  def encoderUdf(spark: SparkSession, merges: Seq[(String, String)]): UserDefinedFunction = {
    val ranks = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val encoderId = java.util.UUID.randomUUID().toString
    udf((text: String) => {
      if (text == null) null
      else {
        val memo = Bpe.memoCache
        // bounded: a new encoder generation (or a pathological vocab)
        // must not grow the JVM-global memo without limit
        if (memo.size() > MemoMaxEntries) memo.clear()
        text.split(" ").iterator.filter(_.nonEmpty).flatMap { w =>
          memo.computeIfAbsent(
            (encoderId, w),
            _ => encodeWord(w, bc.value)).iterator
        }.toArray
      }
    })
  }

  /** Exact inverse of the encoder for single-space text free of the
    * U+E000 sentinel: tokens concat, sentinel → space, trailing space
    * trimmed. */
  def decode(tokens: Seq[String]): String =
    tokens.mkString("").replace(EndOfWord, " ").stripSuffix(" ")

  // (encoder UUID, word) -> tokens; size-capped (blunt clear) so stale
  // encoder generations cannot grow the JVM-global map without bound
  private val MemoMaxEntries = 1 << 20
  private lazy val memoCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), List[String]]()
}
