package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators for a training-data pipeline: token counting,
  * quality scoring, document fingerprinting, language ID.
  *
  * Everything oracle-checkable is pure column algebra (portable integer
  * arithmetic — identical semantics in DuckDB); the two genuinely
  * procedural pieces (rolling-hash fingerprint, n-gram language ID) are
  * deterministic Scala functions exposed as UDFs with their own specs.
  */
object TextAnalysis {

  /** Whitespace token count as portable arithmetic: for single-space
    * separated text, tokens = spaces + 1. (A regex split would differ
    * between engines on edge cases; this is exact in both.) */
  def tokenCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, " ", "")) + 1).cast("long")

  /** BPE-ish token estimate: ~4 chars/token, ceiling division. */
  def bpeTokenEstimate(text: Column): Column =
    ceil(length(text).cast("double") / 4).cast("long")

  /** Occurrences of a word (non-overlapping, space-delimited semantics
    * via replace-length arithmetic — portable to ANSI SQL). */
  def wordOccurrences(text: Column, word: String): Column = {
    val needle = " " + word + " "
    val padded = concat(lit(" "), text, lit(" "))
    ((length(padded) - length(regexp_replace(padded, needle, " ")))
      / (needle.length - 1)).cast("long")
  }

  /** Quality metrics per document — integer-exact, oracle-friendly. */
  def qualityMetrics(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_chars_actual", length(t).cast("long"))
      .withColumn("n_tokens", tokenCount(t))
      .withColumn("n_bpe_tokens", bpeTokenEstimate(t))
      .withColumn("n_stopword_the", wordOccurrences(t, "the"))
      .withColumn("n_stopword_a", wordOccurrences(t, "a"))
  }

  /** Sequence-length distribution per language — the telemetry a
    * packing/truncation decision reads (what share of the corpus fits a
    * context window, where the mass sits). Fixed-width buckets of the
    * whitespace token count (`bucket_lo = n_tokens - n_tokens mod
    * width`), per bucket the doc count + token mass, plus the running
    * doc total within each language (ordered by bucket).
    *
    * Scale shape: ONE partial-aggregating shuffle on (lang, bucket) —
    * cardinality ≈ languages × (max_len / width), tiny at any corpus
    * size — and the cumulative window runs over that tiny aggregate,
    * never over documents. */
  def lengthHistogram(df: DataFrame, bucketWidth: Int = 16,
      langCol: String = "lang", textCol: String = "text"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val n = tokenCount(col(textCol))
    val agg = df
      .groupBy(col(langCol).as("lang"),
        (n - n % bucketWidth).as("bucket_lo"))
      .agg(count(lit(1)).as("n_docs"), sum(n).as("sum_tokens"))
    agg.withColumn("cum_docs",
      sum(col("n_docs")).over(
        Window.partitionBy("lang").orderBy("bucket_lo")))
  }

  /** Per-document out-of-vocabulary statistics against the corpus's own
    * top-`vocabSize` words (count-desc, word-asc tie-break — fully
    * deterministic): token total and the number of token OCCURRENCES
    * outside the head vocabulary. The classic cheap quality/language
    * drift signal (a doc full of tail tokens is boilerplate, code, or
    * another language).
    *
    * Scale shape: the vocabulary is ONE word-keyed count aggregate
    * followed by a driver-side top-k (TakeOrdered — k rows cross the
    * driver, never the vocabulary), then a BROADCAST semi-join back
    * onto the exploded token stream; the only corpus-sized shuffle is
    * the per-doc count aggregate. */
  def oovStats(df: DataFrame, vocabSize: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val words = df.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
    val vocab = words.groupBy("w").agg(count(lit(1)).as("_n"))
      .orderBy(col("_n").desc, col("w").asc).limit(vocabSize)
      .select(col("w"), lit(true).as("_in_vocab"))
    words.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
  }

  /** The exploded (id, word, tf) term-frequency relation plus corpus
    * document frequency per word — the base relation for TF-IDF and
    * vocabulary analytics. Two aggregations, both on the hashed word
    * shuffle key. */
  def termStats(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val words = df.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("word"))
    val tf = words.groupBy("id", "word").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("word").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "word")
  }

  /** Word-trigram language-model counts: every trigram's corpus count
    * `n3` with its (w1, w2) context total `ctx_n` — the sufficient
    * statistics for an MLE trigram model (p̂(w3|w1,w2) = n3/ctx_n; the
    * division is left to the caller so the relation stays
    * integer-exact and cross-engine hash-gated). Context totals come
    * from re-aggregating the trigram counts, never a second corpus
    * pass, so the plan is one scan + two hashed-key shuffles (the
    * second over the already-aggregated trigram relation). The n-gram
    * explode is array algebra in the scan projection — no UDF, no
    * pre-materialized n-gram table. */
  def trigramCounts(df: DataFrame, textCol: String = "text"): DataFrame = {
    val words = split(col(textCol), " ")
    // word array BOUND once as a lambda variable (one-element array
    // wrapper): higher-order functions evaluate interpreted with no
    // common-subexpression elimination, so an unbound `words` would
    // re-split the text per element_at/size reference — 3 full
    // re-splits per word position (the round-16 q96 finding)
    val tri = df.select(explode(filter(element_at(
        transform(array(words), ws => transform(ws, (w, i) =>
          when(i < size(ws) - 2,
            struct(w.as("w1"),
              element_at(ws, i + lit(2)).as("w2"),
              element_at(ws, i + lit(3)).as("w3"))))), 1),
      t => t.isNotNull)).as("t"))
      .select(col("t.w1"), col("t.w2"), col("t.w3"))
    val c3 = tri.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("n3"))
    // context totals as a window over the (already compact) trigram
    // relation: one exchange on (w1, w2) + sort, where the agg-and-
    // join-back alternative pays a second exchange of c3 plus the join
    val w = org.apache.spark.sql.expressions.Window.partitionBy("w1", "w2")
    c3.withColumn("ctx_n", sum(col("n3")).over(w))
      .select(col("w1"), col("w2"), col("w3"), col("n3"), col("ctx_n"))
  }

  /** Stupid-backoff trigram LM document scoring (Brants et al.,
    * EMNLP '07 — the web-scale LM score that deliberately skips
    * normalized smoothing): train counts on a trusted REFERENCE
    * subset, score every document as Σ over its trigram instances of
    *   ln(n3/ctx_n)                  trigram seen in the reference
    *   ln(α · n2(w2,w3)/n1(w2))      else, bigram seen
    *   ln(α² · n1(w3)/N)             else, word seen
    *   ln(α² / N)                    else (OOV floor — a fixed,
    *                                 documented choice; stupid backoff
    *                                 leaves OOV to the consumer)
    * with α = 0.4 (the paper's constant). The higher-order companion
    * to [[unigramLogPerplexity]] (q67): a CCNet-style quality signal
    * where burstiness and local word order matter.
    *
    * Scale shape: reference statistics are `trigramCounts` + two
    * smaller aggregations (all keyed by words, partial-agg friendly);
    * scoring is three left joins of the corpus trigram instances
    * against those stats — each keyed on words, never on documents, so
    * skew follows vocabulary (bounded) not corpus size. N is the one
    * driver scalar (same contract as BM25's corpus constants). */
  def stupidBackoffScores(
      df: DataFrame, ref: DataFrame, alpha: Double = 0.4,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val words = split(col(textCol), " ")
    // per-doc trigram INSTANCES (multiplicity kept), same array-algebra
    // explode as trigramCounts
    // bound-variable form — the trigramCounts rationale
    val docTris = df.select(col(idCol), explode(filter(element_at(
        transform(array(words), ws => transform(ws, (w, i) =>
          when(i < size(ws) - 2,
            struct(w.as("w1"),
              element_at(ws, i + lit(2)).as("w2"),
              element_at(ws, i + lit(3)).as("w3"))))), 1),
      t => t.isNotNull)).as("t"))
      .select(col(idCol), col("t.w1"), col("t.w2"), col("t.w3"))
    // ONE scan + split of `ref` (optimization round 18): the reference
    // statistics needed four separate passes over the reference text —
    // trigram counts, bigram counts, unigram counts, and the N scalar —
    // each re-reading and re-splitting every document. The split word
    // arrays are persisted once; all four statistics derive from the
    // cached arrays (plain column references inside the HOFs — the
    // array is materialized, so repeated references are attribute
    // reads, not re-splits). The N job doubles as the cache
    // materialization. Module cache contract: caller clearCache after
    // consuming.
    val refWs = ref.select(split(col(textCol), " ").as("ws"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bigN = refWs.agg(coalesce(sum(size(col("ws"))), lit(0L)).as("n"))
      .collect()(0).getLong(0).toDouble
    val triRef = refWs.select(explode(filter(
        transform(col("ws"), (w, i) =>
          when(i < size(col("ws")) - 2,
            struct(w.as("w1"),
              element_at(col("ws"), i + lit(2)).as("w2"),
              element_at(col("ws"), i + lit(3)).as("w3")))),
        t => t.isNotNull)).as("t"))
      .select(col("t.w1"), col("t.w2"), col("t.w3"))
    val c3 = triRef.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("n3"))
    // context totals over the compact trigram relation — the
    // trigramCounts shape (one exchange + sort on (w1, w2))
    val tri3 = c3.withColumn("ctx_n",
      sum(col("n3")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("w1", "w2")))
      .select(col("w1"), col("w2"), col("w3"), col("n3"), col("ctx_n"))
    val bigr = refWs.select(explode(filter(
        transform(col("ws"), (w, i) =>
          when(i < size(col("ws")) - 1,
            struct(w.as("w2"), element_at(col("ws"), i + lit(2)).as("w3")))),
        t => t.isNotNull)).as("t"))
      .select(col("t.w2"), col("t.w3"))
      .groupBy("w2", "w3").agg(count(lit(1)).as("n2"))
    val uni = refWs.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n1"))
    val scored = docTris
      .join(tri3, Seq("w1", "w2", "w3"), "left")
      .join(bigr, Seq("w2", "w3"), "left")
      .join(uni.select(col("w").as("w2"), col("n1").as("n1_w2")), Seq("w2"), "left")
      .join(uni.select(col("w").as("w3"), col("n1").as("n1_w3")), Seq("w3"), "left")
      .withColumn("term",
        when(col("n3").isNotNull,
          log(col("n3").cast("double") / col("ctx_n")))
        .when(col("n2").isNotNull,
          log(lit(alpha) * col("n2").cast("double") / col("n1_w2")))
        .when(col("n1_w3").isNotNull,
          log(lit(alpha * alpha) * col("n1_w3").cast("double") / lit(bigN)))
        .otherwise(log(lit(alpha * alpha) / lit(bigN))))
    val perDoc = scored.groupBy(idCol)
      .agg(count(lit(1)).as("n_trigrams"), sum(col("term")).as("score"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        round(coalesce(col("score"), lit(0.0)), 6).as("score"))
  }

  /** Smoothed TF-IDF score per (doc, term): `tf × (ln((N+1)/(df+1))+1)`.
    * Library surface for ranking/weighting; floating-point, so spec-
    * gated rather than cross-engine hash-gated. */
  def tfidf(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val n = df.count()
    termStats(df, idCol, textCol)
      .withColumn("tfidf",
        col("tf") * (log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0))
  }

  /** Top-k distinctive terms per document, ranked by (tf DESC, df ASC,
    * word ASC) — highest-frequency rarest-in-corpus terms first. The
    * ordering is pure integer lexicographic comparison, so the result
    * is hash-identical across engines (the float-free companion of
    * [[tfidf]] for the oracle gate). */
  def distinctiveTerms(
      df: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy("id")
      .orderBy(col("tf").desc, col("df").asc, col("word").asc)
    termStats(df, idCol, textCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id").as(idCol), col("word"), col("tf"), col("df"),
        col("rank").cast("long").as("rank"))
  }

  /** Gopher-style repetition/quality signals, all integer-exact column
    * algebra (portable to ANSI SQL for the oracle gate):
    *   - `n_words` / `n_distinct_words`: a low distinct ratio flags
    *     degenerate repetition;
    *   - `top_word_n`: occurrences of the single most frequent word
    *     (boilerplate/spam indicator);
    *   - `sum_word_len`: total characters across words (mean word
    *     length = sum/n in the caller's precision).
    * The thresholding itself is left to the caller — cut-offs are
    * corpus policy, the signals are the operator. */
  /** Top word frequency = longest equal run of the sorted array:
    * O(n log n) per row, where the naive per-distinct-word rescan is
    * O(distinct × n) — quadratic on exactly the long boilerplate
    * documents repetition filtering exists to flag. */
  private[ops] def topWordRun(words: Column): Column =
    aggregate(
      array_sort(words),
      struct(lit("").as("prev"), lit(0L).as("cur"), lit(0L).as("best")),
      (acc, w) => {
        val cur = when(w === acc.getField("prev"), acc.getField("cur") + 1L)
          .otherwise(lit(1L))
        struct(w.as("prev"), cur.as("cur"),
          greatest(acc.getField("best"), cur).as("best"))
      },
      acc => acc.getField("best"))

  private[ops] def sumWordLen(words: Column): Column =
    aggregate(transform(words, w => length(w).cast("long")),
      lit(0L), (acc, x) => acc + x)

  def repetitionMetrics(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // word array BOUND once as a column alias (optimization round 17):
    // four references in one projection re-ran the split 4x per row
    // (the metric expressions are interpreted HOFs — no CSE);
    // CollapseProject keeps an expensive multi-referenced alias in its
    // own project, so the split now runs once
    df.select(col(idCol), split(col(textCol), " ").as("_ws"))
      .select(
        col(idCol),
        size(col("_ws")).cast("long").as("n_words"),
        size(array_distinct(col("_ws"))).cast("long").as("n_distinct_words"),
        topWordRun(col("_ws")).as("top_word_n"),
        sumWordLen(col("_ws")).as("sum_word_len"))
  }

  /** Gopher-style rule filter (Rae et al. 2021, Appendix A1.1,
    * restated as integer-exact predicates so every engine agrees
    * bit-for-bit — no float ratios, thresholds cross-multiplied):
    *   - `r_word_count`: minWords ≤ n_words ≤ maxWords
    *   - `r_mean_len`:   mean word length in [3, 10] characters,
    *                     i.e. 3·n_words ≤ Σ len(w) ≤ 10·n_words
    *   - `r_stop`:       ≥ 2 distinct stopwords present
    *   - `r_rep`:        most frequent word ≤ 20% of the document,
    *                     i.e. 5·top_word_n ≤ n_words
    * `kept` = all four. One map-side projection, no shuffle, no UDF —
    * the rule bundle composes the [[repetitionMetrics]] column algebra
    * with an `array_intersect` against the broadcast-literal stopword
    * set. The standard first-stage corpus gate (cheap, rule-based)
    * ahead of the LEARNED classifier ([[QualityClassifier]], q64). */
  def gopherRules(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minWords: Long = 20, maxWords: Long = 100000,
      stopwords: Seq[String] =
        Seq("the", "a", "of", "and", "to", "in", "is", "that")): DataFrame = {
    // word array BOUND once (optimization round 17): six references
    // in one projection re-ran split+filter 6x per row
    val base = df
      .select(col(idCol),
        filter(split(col(textCol), " "), w => length(w) > 0).as("_ws"))
      .select(
      col(idCol),
      size(col("_ws")).cast("long").as("n_words"),
      sumWordLen(col("_ws")).as("sum_word_len"),
      size(array_distinct(col("_ws"))).cast("long").as("n_distinct_words"),
      topWordRun(col("_ws")).as("top_word_n"),
      size(array_intersect(array_distinct(col("_ws")),
        typedlit(stopwords))).cast("long").as("n_stop_distinct"))
    base.select(col(idCol), col("n_words"), col("sum_word_len"),
        col("n_distinct_words"), col("top_word_n"), col("n_stop_distinct"),
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .as("r_word_count"),
        (lit(3L) * col("n_words") <= col("sum_word_len") &&
          col("sum_word_len") <= lit(10L) * col("n_words")).as("r_mean_len"),
        (col("n_stop_distinct") >= 2L).as("r_stop"),
        (lit(5L) * col("top_word_n") <= col("n_words")).as("r_rep"))
      .withColumn("kept",
        col("r_word_count") && col("r_mean_len") && col("r_stop") && col("r_rep"))
  }

  // ------------------------------------------------------------ PII scrub

  /** PII masking patterns. Deliberately a portable regex subset — no
    * lookarounds, no named classes — so the identical pattern string
    * runs under Java regex (Spark codegen'd regexp_replace) and RE2
    * (the DuckDB oracle). */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  def digitRunPattern(minRun: Int): String = {
    // {0,} matches empty at every boundary (silently shredding all
    // text); negative values are a regex syntax error at execution
    require(minRun >= 1, s"minDigitRun must be >= 1, got $minRun")
    s"\\d{$minRun,}"
  }

  /** The (pattern, mask) chain, in application order — the single
    * source of truth for [[scrubPii]] AND the SQL `scrub_pii`
    * registration (GraftFunctions), which folds the same list into a
    * Catalyst RegExpReplace tree. Order is load-bearing: the email
    * local part and the IP octets contain digit runs, so the digit
    * pass must run last or it would shred the structured tokens the
    * earlier passes key on. */
  def piiPatternChain(minDigitRun: Int): Seq[(String, String)] = Seq(
    emailPattern -> "<EMAIL>",
    ipv4Pattern -> "<IP>",
    digitRunPattern(minDigitRun) -> "<NUM>")

  /** Masks emails, then IPv4 addresses, then digit runs of ≥
    * `minDigitRun`. Pure `regexp_replace` chain — codegen'd, no UDF. */
  def scrubPii(text: Column, minDigitRun: Int = 4): Column =
    piiPatternChain(minDigitRun).foldLeft(text) {
      case (c, (pattern, mask)) => regexp_replace(c, pattern, mask)
    }

  /** Per-pattern match counts on the RAW text (before any masking) —
    * the audit companion to [[scrubPii]]. */
  def piiCounts(text: Column, minDigitRun: Int = 4): Seq[(String, Column)] = Seq(
    "n_email" -> regexp_count(text, lit(emailPattern)).cast("long"),
    "n_ip" -> regexp_count(text, lit(ipv4Pattern)).cast("long"),
    "n_num" -> regexp_count(text, lit(digitRunPattern(minDigitRun))).cast("long"))

  // ----------------------------------------------------------------- BM25

  /** Unigram language-model scoring — the LM-perplexity quality filter
    * of a CCNet-style pipeline (Wenzek et al. 2020 score documents with
    * a KenLM 5-gram; the order-1 form keeps the selection semantics
    * with a model that is exactly SQL-restatable, so the operator is
    * DuckDB-oracle-gated rather than fixture-trusted). Per document:
    * `logppl = avg over tokens of −ln p(w)`, with `p(w)` the MLE
    * unigram probability on `ref` (default: the scored corpus itself).
    * Low score = looks like the reference corpus; filter by quantile.
    *
    * `alpha` > 0 adds Laplace smoothing — REQUIRED when `ref` is a
    * different corpus, or an OOV word would have p = 0 (the join is
    * left + coalesce to the smoothed OOV mass, so unseen words cost
    * the most, as they should).
    *
    * Scale shape: one aggregation builds the (word, count) model —
    * word-type-bounded, not corpus-bounded; scoring is a shuffle join
    * of the exploded corpus against the model on `word` plus one
    * per-doc aggregation. No UDF, no broadcast of an unbounded vocab. */
  def unigramLogPerplexity(
      df: DataFrame, ref: DataFrame = null, alpha: Double = 0.0,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val refDf = Option(ref).getOrElse(df)
    val refWords = refDf.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val model = refWords.groupBy("word").agg(count(lit(1)).as("c"))
    val stats = model.agg(
      sum(col("c")).as("total"), count(lit(1)).as("vocab")).collect()(0)
    val total = stats.getLong(0).toDouble
    val vocab = stats.getLong(1).toDouble
    require(alpha > 0.0 || refDf.eq(df),
      "scoring against a foreign reference corpus needs alpha > 0 (OOV mass)")
    val denom = total + alpha * vocab
    val p = (coalesce(col("c"), lit(0L)).cast("double") + alpha) / denom
    df.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(model, Seq("word"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), avg(-log(p)).as("logppl"))
  }

  /** Okapi BM25 relevance of every document against a fixed query term
    * set: `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl))` with
    * `idf = ln((N-df+0.5)/(df+0.5) + 1)`. Document frequency is
    * corpus-wide (computed BEFORE the term filter), so scores match a
    * full-index engine. One scalar stats job (N, total length), then
    * one pass over the term-filtered tf/df relation — the corpus text
    * is never shuffled, only (id, word, tf) rows for the query terms.
    * Doubles: the oracle rounds to 6 dp on both sides. */
  def bm25(
      df: DataFrame, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val lens = df.select(col(idCol).as("id"), tokenCount(col(textCol)).as("dl"))
    val meta = lens.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot")).head()
    val n = meta.getLong(0)
    if (n == 0) // empty corpus in, empty scores out (sum(dl) is null here)
      return lens.select(col("id"), lit(0.0).as("score"),
        lit(0L).as("n_terms_hit")).limit(0)
    val avgdl = meta.getLong(1).toDouble / n
    val t = termStats(df, idCol, textCol).filter(col("word").isin(queryTerms: _*))
    val idf = log((lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val score = idf * (col("tf") * lit(k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / lit(avgdl)))
    t.join(lens, "id")
      .withColumn("term_score", score)
      .groupBy("id")
      .agg(sum(col("term_score")).as("score"), count(lit(1)).as("n_terms_hit"))
  }

  /** 64-bit Karp-Rabin rolling-hash fingerprint of a string. The same
    * polynomial (base 257, implicit mod 2^64) evaluated left-to-right —
    * deterministic, order-sensitive, collision-resistant enough for
    * content fingerprinting at 100 TB (birthday bound ~2^32 docs). */
  def fingerprint64(s: String): Long = {
    var h = 1125899906842597L // large prime seed
    var i = 0
    while (i < s.length) { h = h * 257 + s.charAt(i); i += 1 }
    h
  }

  private val fingerprintUdf = udf((s: String) => if (s == null) null else Long.box(fingerprint64(s)))

  def fingerprint(text: Column): Column = fingerprintUdf(text)

  /** Character-bigram language profiles for the n-gram language-ID
    * heuristic. Profiles are the highest-frequency bigrams of each
    * language (derived from public Universal Declaration of Human Rights
    * translations — common knowledge n-gram statistics). */
  private[graft] val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("th", "he", "in", "er", "an", "re", "nd", "on", "en", "at",
      "ou", "ed", "ha", "to", "or", "it", "is", "hi", "es", "ng"),
    "de" -> Seq("en", "er", "ch", "de", "ei", "nd", "te", "in", "ie", "ge",
      "un", "he", "st", "be", "sc", "an", "di", "ic", "es", "ne"),
    "fr" -> Seq("es", "le", "de", "en", "on", "nt", "re", "ou", "ai", "ti",
      "an", "it", "qu", "la", "et", "io", "ns", "ur", "em", "us"),
    "es" -> Seq("de", "es", "en", "el", "la", "os", "ar", "ue", "ra", "re",
      "er", "as", "on", "st", "ad", "al", "or", "ta", "ci", "io"),
    "it" -> Seq("di", "to", "er", "re", "la", "on", "co", "ti", "no", "le",
      "in", "ne", "ri", "el", "ta", "al", "en", "io", "an", "il"))

  /** Score a text against each profile: sum of (rank weight) for each
    * profile bigram occurrence; highest score wins. Deterministic;
    * ties broken by language code order. */
  def detectLanguage(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    // Locale.ROOT: default-locale lowercasing diverges under tr/az
    // (dotless ı) and would break the q21 oracle's lower() parity
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val bigrams = new scala.collection.mutable.HashMap[String, Int]()
    var i = 0
    while (i < lower.length - 1) {
      val b = lower.substring(i, i + 2)
      if (b.forall(c => c.isLetter)) bigrams.update(b, bigrams.getOrElse(b, 0) + 1)
      i += 1
    }
    if (bigrams.isEmpty) return "und"
    val scored = langProfiles.toSeq.map { case (lang, profile) =>
      val score = profile.zipWithIndex.map { case (bg, rank) =>
        bigrams.getOrElse(bg, 0).toLong * (profile.size - rank)
      }.sum
      (lang, score)
    }
    val best = scored.maxBy { case (lang, s) => (s, lang) }
    if (best._2 == 0L) "und" else best._1
  }

  private val langUdf = udf((s: String) => detectLanguage(s))

  def languageId(text: Column): Column = langUdf(text)

  /** Hashed word unigrams + bigrams of a document, bucketed into
    * `nBuckets` by the first 32 bits of md5 — the DSIR feature map
    * (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"), engine-portable (DuckDB replays the same
    * md5 arithmetic). One array expression per row — no shuffle, no
    * per-index allocation beyond the feature array itself. */
  /** The raw unigram+bigram FEATURE STRINGS of a document — the md5
    * bucketing deliberately does NOT happen in here (optimization
    * round 18): higher-order-function lambdas evaluate INTERPRETED, so
    * an md5-per-feature inside the transform paid the interpreted
    * expression path on every feature instance; callers explode this
    * array and bucket the exploded column with a plain (whole-stage
    * codegen) md5 expression instead — same strings, same buckets,
    * bit-identical weights. */
  private[ops] def dsirFeatureStrings(text: Column): Column =
    // bound-variable form (the gramArray idiom): HOFs evaluate
    // INTERPRETED with no CSE, so an unbound `words` re-evaluates the
    // split per reference — 4 splits of the text per row here
    // (optimization round 17: 1)
    element_at(
      transform(array(split(text, " ")), ws => {
        val bigrams = filter(
          zip_with(ws, slice(ws, lit(2), size(ws)),
            (a, b) => when(b.isNotNull, concat(a, lit(" "), b))),
          g => g.isNotNull)
        concat(ws, bigrams)
      }),
      1)

  /** md5-hash bucket of one feature string — the DSIR bucketing
    * arithmetic as a flat (codegen-friendly) expression over an
    * exploded feature column. */
  private[ops] def dsirBucketOf(feature: Column, nBuckets: Int): Column =
    conv(substring(md5(feature), 1, 8), 16, 10).cast("long") % nBuckets


  /** DSIR importance weights: every document scored by how much more
    * likely its hashed-n-gram features are under a TARGET bag-of-
    * features model than under the RAW-corpus model —
    *
    *   w(doc) = Σ_features  ln p̂_target(bucket) − ln p̂_raw(bucket)
    *
    * with add-one-smoothed bucket probabilities fit by counting feature
    * INSTANCES over the target subset and the whole input. High-weight
    * documents are the ones importance resampling keeps when curating
    * raw web data toward a target domain; the caller selects with
    * [[Corpus.hashSample]]-style machinery or a top-k on the weight.
    *
    * Scale shape: the only corpus-sized shuffle is the per-(doc,
    * bucket) count (key includes the id — balanced regardless of
    * bucket skew); the two models reduce to ≤ nBuckets rows via
    * map-side partial counts and join back as a broadcast. The final
    * weight is a sum of ≤ nBuckets doubles per doc, each term a
    * count × log-ratio — cross-engine agreement far inside ROUND(,6).
    *
    * Returns (idCol, n_feats, dsir_weight), one row per input doc.
    * Docs sharing every bucket with the raw model by construction —
    * every feature's bucket exists in the raw counts — so the join
    * never drops a doc. */
  def dsirWeights(
      df: DataFrame,
      isTarget: Column,
      nBuckets: Int = 512,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    // explode the feature STRINGS, bucket the exploded column: the md5
    // runs as a flat codegen expression per feature row instead of an
    // interpreted per-element lambda (optimization round 18 — guide §4;
    // same strings, same buckets). The bucket projection evaluates
    // BEFORE any exchange, so nothing wider than (id, bucket) ever
    // shuffles.
    def feats(cols: Column*): DataFrame =
      df.select(cols :+ explode(dsirFeatureStrings(col(textCol))).as("f"): _*)
        .withColumn("b", dsirBucketOf(col("f"), nBuckets)).drop("f")
    // ONE feature pass (optimization round 17): the bucket models used
    // to aggregate the raw feature explode a second time — a second
    // full scan re-running the interpreted md5 HOF over every feature.
    // Both models are exact sums over the per-(doc, bucket) counts, so
    // fold per-doc first (the corpus-sized shuffle, keyed by id —
    // balanced whatever the bucket skew), persist that bounded
    // relation (≤ nBuckets rows per doc), and derive the models from
    // it (module cache contract — caller clearCache after consuming).
    // DRIVER-SIDE bucket models from one bounded collect (optimization
    // round 18): the models are ≤ nBuckets rows, yet the round-17 shape
    // derived them through a persisted per-(doc, bucket) relation (a
    // corpus-sized shuffle + cache — the driver-measured q72
    // regression), a totals broadcast, a model broadcast, and a
    // broadcast join. Pass 1 now map-side-aggregates the exploded
    // features straight to ≤ nBuckets rows (the shuffle carries
    // ≤ nBuckets × partitions tiny rows) and folds the log-ratios
    // driver-side with StrictMath.log — the exact function Spark's
    // `log` expression evaluates. Pass 2 re-explodes and aggregates by
    // doc with the ratios as a literal array: map-side combine emits
    // ~one row per doc per partition, so neither pass shuffles
    // anything corpus-shaped and nothing persists. Two text scans
    // instead of one scan + corpus-wide (id, bucket) shuffle + cache —
    // strictly fewer bytes moved once the bucketing is flat codegen
    // (a feature row shuffled as (id, tgt, bucket) outweighs the
    // second read of the text it came from). Per-doc weights sum the
    // same per-instance terms; ROUND(,6) on the caller side absorbs
    // summation-order last bits (the documented q61/q64 contract).
    val bc = feats(isTarget.as("_tgt")).groupBy(col("b")).agg(
      sum(when(col("_tgt"), 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cr")).collect()
    var tT = 0L; var tR = 0L
    bc.foreach { r => tT += r.getLong(1); tR += r.getLong(2) }
    val lr = new Array[Double](nBuckets)
    bc.foreach { r =>
      lr(r.getLong(0).toInt) =
        StrictMath.log((r.getLong(1) + 1.0) / (tT + nBuckets.toDouble)) -
          StrictMath.log((r.getLong(2) + 1.0) / (tR + nBuckets.toDouble))
    }
    val lrArr = array(lr.toIndexedSeq.map(lit(_)): _*)
    feats(col(idCol).as("id")).groupBy(col("id"))
      .agg(count(lit(1)).as("n_feats"),
        sum(element_at(lrArr, (col("b") + 1).cast("int")))
          .as("dsir_weight"))
      .withColumnRenamed("id", idCol)
  }
}
