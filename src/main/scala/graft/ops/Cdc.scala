package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CONTENT-DEFINED CHUNKING (CDC) dedup — the insertion-robust member
  * of the dedup matrix. Fixed-window dedup (exactSubstrSpans) and
  * span dedup shift every boundary when one character is inserted;
  * CDC cuts where the CONTENT says so (a window hash hitting a
  * modulus), so an edit disturbs only the chunk it lands in and every
  * other chunk still dedups against the rest of the corpus — the
  * LBFS/FastCDC principle (Muthitacharoen et al., SOSP'01) restated
  * as column algebra.
  *
  * A breakpoint falls after text position `p + windowChars - 1` when
  * the first 32 bits of md5 of the window starting at p land on
  * `bucket % modulus == 0`; expected chunk length ≈ modulus chars.
  * md5 keeps the arithmetic engine-portable (the DuckDB oracle
  * replays it exactly); a production twin on xxhash64 would halve the
  * hash cost at identical plan shape (same trade as the exact-substr
  * pair, Dedup.scala).
  *
  * Scale shape: breakpoint discovery is per-row array algebra —
  * O(len) window hashes computed inside one projection, no shuffle,
  * no corpus-sized position explode (positions never leave their
  * row). Only CHUNKS (≈ len/modulus rows per doc) are exploded, and
  * the cross-doc sweep shuffles 32-hex chunk hashes: the distinct-doc
  * count groups on (hash, id) first — balanced under boilerplate-
  * chunk skew the same way the exact-substr election is.
  */
object Cdc {

  private def bucket32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** The chunk relation: (id, chunk_idx, chunk_start, chunk_len,
    * chunk_hash), 1-based start positions, chunk_idx 0-based in
    * document order. Empty texts emit no chunks; a text shorter than
    * `windowChars` is one whole-text chunk. */
  def cdcChunks(
      df: DataFrame,
      windowChars: Int = 12,
      modulus: Int = 32,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(windowChars > 0, "windowChars must be positive")
    require(modulus > 0, "modulus must be positive")
    val text = col(textCol)
    val len = length(text)
    val k = lit(windowChars)
    // guard: sequence(1, n) REVERSES when n < 1 — empty array instead
    val positions = when(len >= k, sequence(lit(1), len - k + 1))
      .otherwise(array().cast("array<int>"))
    val ends = transform(
      filter(positions, p => bucket32(text.substr(p, k)) % modulus === 0),
      p => p + k - 1)
    // `ends` is BOUND once before fanning into starts/ends2: HOFs
    // evaluate interpreted without subexpression elimination, and an
    // unbound `ends` re-runs the bucket32 window scan per reference
    // (the round-16 q96 finding — 2× the rolling-hash work per row)
    val chunks = filter(
      element_at(transform(array(ends), es =>
        zip_with(
          concat(array(lit(1)), transform(es, e => e + 1)),
          concat(es, array(len)),
          (s, e) => struct(s.as("s"), e.as("e")))), 1),
      c => c("s") <= c("e"))
    df.select(col(idCol).as("id"), text.as("_t"),
        posexplode(chunks).as(Seq("chunk_idx", "_c")))
      .select(col("id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("_c")("s").cast("long").as("chunk_start"),
        (col("_c")("e") - col("_c")("s") + 1).cast("long").as("chunk_len"),
        md5(col("_t").substr(col("_c")("s"), col("_c")("e") - col("_c")("s") + 1))
          .as("chunk_hash"))
  }

  /** Cross-document CDC dedup stats per doc: total chunks, chunks
    * whose content appears in ≥ `minDocs` DISTINCT documents, and the
    * characters those duplicated chunks cover — the "how much of this
    * doc is boilerplate shared elsewhere" score that drives chunk-
    * level dedup decisions. Docs with no chunks (empty text) emit no
    * row. */
  def cdcDedupStats(
      df: DataFrame,
      windowChars: Int = 12,
      modulus: Int = 32,
      minDocs: Int = 2,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(minDocs >= 2, "minDocs must be at least 2")
    val chunks = cdcChunks(df, windowChars, modulus, idCol, textCol)
    // distinct-doc count per chunk hash: dedup on (hash, id) first —
    // the hot-key-safe two-phase shape (partial agg absorbs skew)
    val dup = chunks.select(col("chunk_hash"), col("id")).distinct()
      .groupBy(col("chunk_hash")).agg(count(lit(1)).as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select(col("chunk_hash"))
    chunks.join(dup.withColumn("_dup", lit(1L)), Seq("chunk_hash"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("_dup").isNotNull, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when(col("_dup").isNotNull, col("chunk_len")).otherwise(0L)).as("dup_chars"))
      .withColumnRenamed("id", idCol)
  }

  /** FIXED-window chunking with overlap — the retrieval/RAG chunker
    * beside [[cdcChunks]]'s dedup chunker: every document becomes
    * windows of `windowWords` words starting every `strideWords`
    * (overlap = windowWords − strideWords), the shape embedding
    * pipelines index. Deterministic, integer-exact, md5-portable —
    * oracle-gated (q79), unlike CDC whose virtue is boundary
    * stability rather than fixed geometry.
    *
    * Scale shape: starts are generated per-row with `sequence` (≈
    * len/stride values, never a corpus-sized position explode), the
    * window text never leaves the projection (only its md5 does), and
    * there is NO shuffle at all — chunking is embarrassingly parallel
    * over documents. The final chunk is the one containing the tail
    * and may be short; `chunk_id` = start/stride.
    *
    * Output: (id, chunk_id, start_word, n_words, chunk_md5). */
  def windowChunks(
      df: DataFrame,
      windowWords: Int = 64,
      strideWords: Int = 48,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(windowWords > 0 && strideWords > 0 && strideWords <= windowWords,
      s"need 0 < strideWords <= windowWords (got $strideWords, $windowWords)")
    val words = split(col(textCol), " ")
    df.select(col(idCol).as("id"), words.as("ws"))
      .select(col("id"), col("ws"),
        explode(sequence(lit(0), size(col("ws")) - 1, lit(strideWords))).as("s"))
      .select(col("id"),
        (col("s") / strideWords).cast("long").as("chunk_id"),
        col("s").cast("long").as("start_word"),
        size(slice(col("ws"), col("s") + 1, lit(windowWords))).cast("long").as("n_words"),
        md5(concat_ws(" ", slice(col("ws"), col("s") + 1, lit(windowWords)))).as("chunk_md5"))
  }
}
