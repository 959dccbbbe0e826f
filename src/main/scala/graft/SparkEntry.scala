package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{DealQueries, OpsQueries, Queries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Queries.q01PricingSummary _),
    "q02_latest_event_top1" -> (Queries.q02LatestEventTop1 _),
    "q03_work_queue" -> (Queries.q03WorkQueue _),
    "q04_state_counts" -> (Queries.q04StateCounts _),
    "q05_filtered_counts" -> (Queries.q05FilteredCounts _),
    "q06_anti_join" -> (Queries.q06AntiJoin _),
    "q07_dim_join_revenue" -> (Queries.q07DimJoinRevenue _),
    "q08_epoch_buckets" -> (Queries.q08EpochBuckets _),
    "q09_eligibility" -> (Queries.q09Eligibility _),
    "q10_latest_per_user" -> (Queries.q10LatestPerUser _),
    "q11_tumbling_window" -> (Queries.q11TumblingWindow _),
    "q12_submit_payload" -> (Queries.q12SubmitPayload _),
    "q13_doc_tokens" -> (OpsQueries.q13DocTokens _),
    "q14_text_quality" -> (OpsQueries.q14TextQuality _),
    "q15_exact_dedup" -> (OpsQueries.q15ExactDedup _),
    "q16_ngram_jaccard" -> (OpsQueries.q16NgramJaccard _),
    "q17_minhash_pairs" -> (OpsQueries.q17MinhashPairs _),
    "q18_simhash" -> (OpsQueries.q18Simhash _),
    "q19_cosine_topk" -> (OpsQueries.q19CosineTopK _),
    "q20_lsh_topk" -> (OpsQueries.q20LshTopK _),
    "q21_langid" -> (OpsQueries.q21LangId _),
    "q22_fingerprint" -> (OpsQueries.q22Fingerprint _),
    "q23_embedding_neardup" -> (OpsQueries.q23EmbeddingNearDup _),
    "q30_ivf_topk" -> (OpsQueries.q30IvfTopK _),
    "q31_asof_join" -> (OpsQueries.q31AsofJoin _),
    "q32_sessionize" -> (OpsQueries.q32Sessionize _),
    "q34_heavy_hitters" -> (OpsQueries.q34HeavyHitters _),
    "q35_returned_revenue" -> (OpsQueries.q35ReturnedRevenue _),
    "q37_running_sum" -> (OpsQueries.q37RunningSum _),
    "q39_sliding_window" -> (OpsQueries.q39SlidingWindow _),
    "q38_pivot" -> (OpsQueries.q38Pivot _),
    "q36_above_avg_orders" -> (OpsQueries.q36AboveAvgOrders _),
    "q33_percentiles" -> (OpsQueries.q33Percentiles _),
    "q27_vocab_topk" -> (OpsQueries.q27VocabTopK _),
    "q28_rollup" -> (OpsQueries.q28Rollup _),
    "q29_set_ops" -> (OpsQueries.q29SetOps _),
    "q40_distinctive_terms" -> (OpsQueries.q40DistinctiveTerms _),
    "q41_hash_sample" -> (OpsQueries.q41HashSample _),
    "q42_quota_pack" -> (OpsQueries.q42QuotaPack _),
    "q43_contamination" -> (OpsQueries.q43Contamination _),
    "q44_repetition" -> (OpsQueries.q44Repetition _),
    "q45_pq_topk" -> (OpsQueries.q45PqTopK _),
    "q46_dup_clusters" -> (OpsQueries.q46DupClusters _),
    "q47_stratified_topk" -> (OpsQueries.q47StratifiedTopK _),
    "q48_span_dedup" -> (OpsQueries.q48SpanDedup _),
    "q49_shuffle_shards" -> (OpsQueries.q49ShuffleShards _),
    "q50_cube" -> (OpsQueries.q50Cube _),
    "q51_lag_delta" -> (OpsQueries.q51LagDelta _),
    "q52_greedy_pack" -> (OpsQueries.q52GreedyPack _),
    "q53_semantic_dedup" -> (OpsQueries.q53SemanticDedup _),
    "q54_vocab_by_source" -> (OpsQueries.q54VocabBySource _),
    "q55_session_range_join" -> (OpsQueries.q55SessionRangeJoin _),
    "q56_json_extract" -> (OpsQueries.q56JsonExtract _),
    "q57_deduped_corpus" -> (OpsQueries.q57DedupedCorpus _),
    "q58_mixture_order" -> (OpsQueries.q58MixtureOrder _),
    "q59_pagerank" -> (OpsQueries.q59PageRank _),
    "q60_pii_scrub" -> (OpsQueries.q60PiiScrub _),
    "q61_bm25" -> (OpsQueries.q61Bm25 _),
    "q62_csv_dim" -> (OpsQueries.q62CsvDim _),
    "q63_bpe_tokens" -> (OpsQueries.q63BpeTokens _),
    "q64_quality_score" -> (OpsQueries.q64QualityScore _),
    "q65_ivfpq_topk" -> (OpsQueries.q65IvfPqTopK _),
    "q66_exact_substr" -> (OpsQueries.q66ExactSubstr _),
    "q67_unigram_ppl" -> (OpsQueries.q67UnigramPpl _),
    "q68_clean_corpus" -> (OpsQueries.q68CleanCorpus _),
    "q69_greedy_pack_chunked" -> (OpsQueries.q69GreedyPackChunked _),
    "q70_temperature_sample" -> (OpsQueries.q70TemperatureSample _),
    "q71_pack_sequences" -> (OpsQueries.q71PackSequences _),
    "q72_dsir_weights" -> (OpsQueries.q72DsirWeights _),
    "q73_cdc_chunks" -> (OpsQueries.q73CdcStats _),
    "q74_novelty" -> (OpsQueries.q74Novelty _),
    "q75_bloom_clean" -> (OpsQueries.q75BloomClean _),
    "q76_simhash_neardup" -> (OpsQueries.q76SimhashNearDup _),
    "q77_trigram_lm" -> (OpsQueries.q77TrigramLm _),
    "q78_kmeans_assign" -> (OpsQueries.q78KmeansAssign _),
    "q79_window_chunks" -> (OpsQueries.q79WindowChunks _),
    "q80_emb_moments" -> (OpsQueries.q80EmbMoments _),
    "q81_cluster_keeper" -> (OpsQueries.q81ClusterKeeper _),
    "q82_gopher_rules" -> (OpsQueries.q82GopherRules _),
    "q83_pca_project" -> (OpsQueries.q83PcaProject _),
    "q84_backoff_lm" -> (OpsQueries.q84BackoffLm _),
    "q85_shard_manifest" -> (OpsQueries.q85ShardManifest _),
    "q86_corpus_pipeline" -> (OpsQueries.q86CorpusPipeline _),
    "q87_len_histogram" -> (OpsQueries.q87LenHistogram _),
    "q88_source_overlap" -> (OpsQueries.q88SourceOverlap _),
    "q89_oov_rate" -> (OpsQueries.q89OovRate _),
    "q90_lev_neardup" -> (OpsQueries.q90LevNeardup _),
    "q91_prefix_dedup" -> (OpsQueries.q91PrefixDedup _),
    "q92_corpus_delta" -> (OpsQueries.q92CorpusDelta _),
    "q93_salted_sum" -> (OpsQueries.q93SaltedSum _),
    "q94_salted_join" -> (OpsQueries.q94SaltedJoin _),
    "q95_incremental_cc" -> (OpsQueries.q95IncrementalCc _),
    "q96_sparse_contamination" -> (OpsQueries.q96SparseContamination _),
    "q97_cluster_store" -> (OpsQueries.q97ClusterStore _),
    "q98_multimodal_meta" -> (OpsQueries.q98MultimodalMeta _),
    "q99_multimodal_ext" -> (OpsQueries.q99MultimodalExt _),
    "q100_multimodal_img" -> (OpsQueries.q100MultimodalImg _),
    "q103_multimodal_audio" -> (OpsQueries.q103MultimodalAudio _),
    "q105_multimodal_ogg" -> (OpsQueries.q105MultimodalOgg _),
    "q106_multimodal_m4a" -> (OpsQueries.q106MultimodalM4a _),
    "q107_multimodal_adts" -> (OpsQueries.q107MultimodalAdts _),
    "q108_ivfsq_topk" -> (OpsQueries.q108IvfSqTopK _),
    "q110_multimodal_tiff" -> (OpsQueries.q110MultimodalTiff _),
    "q111_multimodal_avif" -> (OpsQueries.q111MultimodalAvif _),
    "q101_ann_stream" -> (OpsQueries.q101AnnStream _),
    "q102_ivf_stream" -> (OpsQueries.q102IvfStream _),
    "q104_ivfpq_stream" -> (OpsQueries.q104IvfPqStream _),
    "q109_ivfsq_stream" -> (OpsQueries.q109IvfSqStream _),
    "q112_upsert_churn" -> (OpsQueries.q112UpsertChurn _),
    "q113_filtered_ann" -> (OpsQueries.q113FilteredAnn _),
    "q114_multimodal_aiff" -> (OpsQueries.q114MultimodalAiff _),
    "q115_hybrid_rrf" -> (OpsQueries.q115HybridRrf _),
    "q116_mmr_rerank" -> (OpsQueries.q116MmrRerank _),
    "q117_store_corpus" -> (OpsQueries.q117StoreCorpus _),
    "q24_deal_decode" -> (DealQueries.q24DealDecode _),
    "q25_deal_state_counts" -> (DealQueries.q25DealStateCounts _),
    "q26_deal_submittable" -> (DealQueries.q26DealSubmittable _)
  )

  // q59: the same five power iterations the engine runs, unrolled as
  // chained CTEs (identical arithmetic shape; ROUND(,6) on both sides
  // absorbs summation-order ulps)
  private val q59Sql: String = {
    val base =
      """WITH e0 AS (SELECT DISTINCT CAST(l_partkey * 2 AS BIGINT) AS src,
        |  CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst FROM lineitem),
        |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
        |n AS (SELECT DISTINCT node FROM
        |  (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
        |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS r FROM n)""".stripMargin
    val iterations = (1 to 5).map { i =>
      s"""r$i AS (SELECT n.node, (1 - 0.85) + 0.85 * COALESCE(c.c, CAST(0.0 AS DOUBLE)) AS r
         |  FROM n LEFT JOIN (
         |    SELECT e.dst AS node, SUM(r${i - 1}.r / deg.deg) AS c
         |    FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node
         |    JOIN deg ON e.src = deg.src
         |    GROUP BY e.dst) c ON n.node = c.node)""".stripMargin
    }.mkString(",\n")
    s"$base,\n$iterations\nSELECT node, ROUND(r, 6) AS pr FROM r5"
  }

  // q76's portable-simhash fingerprint chain (words → distinct bigram
  // shingles → Karp-Rabin HUGEINT hashes → majority bit votes → signed
  // 64-bit fingerprint), shared verbatim by q86's composed pipeline so
  // the near-dup stage cannot drift from the standalone query
  // Planted-neighbor ANN corpus (OpsQueries.annCorpus /
  // SimilaritySearch.plantedNeighborCorpus) restated in SQL: copy c of
  // query q is (1 − c·0.01)·q + c·0.01·u computed in DOUBLE and
  // rounded ONCE to FLOAT32 — bit-identical to the Spark side from the
  // same parquet floats, so the tiers' (query, neighbor, rank) output
  // hash-matches the brute-force oracle below. Planted ids start at
  // 2^40 (disjoint from real corpus ids).
  private val plantedCtes: String =
    """pq AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
      |pu AS (SELECT vec_id - 10 AS qid, embedding AS uv FROM embeddings
      |       WHERE vec_id >= 10 AND vec_id < 20),
      |planted AS (
      |  SELECT 1099511627776 + pq.qid * 5 + c AS vec_id,
      |    list_transform(range(1, len(qv) + 1), i ->
      |      CAST((CAST(1.0 AS DOUBLE) - CAST(c AS DOUBLE) * CAST(0.01 AS DOUBLE))
      |             * CAST(qv[i] AS DOUBLE)
      |           + CAST(c AS DOUBLE) * CAST(0.01 AS DOUBLE)
      |             * CAST(uv[i] AS DOUBLE) AS FLOAT)) AS embedding
      |  FROM pq JOIN pu USING (qid), (SELECT unnest(range(1, 6)) AS c) cs),
      |pcorpus AS (SELECT vec_id, embedding FROM embeddings
      |            UNION ALL SELECT vec_id, embedding FROM planted)""".stripMargin

  // The four approximate ANN tiers (q20 LSH, q30 IVF, q45 PQ, q65
  // IVF-PQ) share ONE oracle: over the planted corpus each tier's
  // top-5 provably equals brute force (planted cosine floor 0.9987 vs
  // distractor ceiling 0.61 — DeterminismProbe verified pair-identity
  // at sf0.01/sf0.1), so the exact formulation is the hash reference
  // for all of them. The oracle is deliberately blind to buckets /
  // cells / codes — it gates the no-lost-neighbor guarantee end-to-end.
  private val annPlantedTopkSql: String =
    s"""WITH $plantedCtes,
      |s AS (SELECT pq.qid, c.vec_id AS nid,
      |        list_cosine_similarity(CAST(pq.qv AS DOUBLE[]),
      |          CAST(c.embedding AS DOUBLE[])) AS cos
      |      FROM pcorpus c, pq WHERE c.vec_id <> pq.qid)
      |SELECT qid AS query_id, nid AS neighbor_id, rank FROM (
      |  SELECT qid, nid,
      |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
      |  FROM s)
      |WHERE rank <= 5""".stripMargin

  private val simhashCtes: String =
    """words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |idx AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM words),
      |occ AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS w FROM idx),
      |wh AS (
      |  SELECT doc_id, list_reduce(
      |    list_prepend(CAST(1125899906842597 AS HUGEINT),
      |      list_transform(string_split(w, ''), c -> CAST(unicode(c) AS HUGEINT))),
      |    (acc, x) -> (acc * 257 + x) % 18446744073709551616::HUGEINT) AS h
      |  FROM occ),
      |bits AS (
      |  SELECT doc_id, b, sum(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS s
      |  FROM wh, (SELECT unnest(range(0, 64)) AS b) t GROUP BY 1, 2),
      |sims AS (
      |  SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (1::HUGEINT << b)
      |    ELSE 0::HUGEINT END) AS HUGEINT) AS simu FROM bits GROUP BY 1),
      |s64 AS (
      |  SELECT doc_id, CAST(CASE WHEN simu >= 9223372036854775808::HUGEINT
      |    THEN simu - 18446744073709551616::HUGEINT ELSE simu END AS BIGINT) AS sim
      |  FROM sims)""".stripMargin

  // q46's transitive-closure oracle, shared verbatim by q57 (the kept
  // projection) so the two can never drift on pair threshold or
  // shingle construction
  private val q46Sql: String =
    """WITH RECURSIVE
      |words AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
      |idx AS (SELECT doc_id, source, ws, unnest(range(1, len(ws))) AS i FROM words),
      |grams AS (SELECT DISTINCT doc_id, source, ws[i] || ' ' || ws[i+1] AS shingle FROM idx),
      |pairs AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2
      |  FROM grams a JOIN grams b
      |    ON a.source = b.source AND a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 8),
      |edges AS (SELECT id1 AS a, id2 AS b FROM pairs UNION SELECT id2, id1 FROM pairs),
      |reach AS (
      |  SELECT doc_id AS a, doc_id AS b FROM documents
      |  UNION
      |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
      |SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a""".stripMargin

  // q66/q68 share the span-derivation CTE chain verbatim so the span
  // generator and the span-apply oracle can never drift on window
  // hashing, first-occurrence election, or islands merging
  private val substrSpanCtes: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), w -> length(w) > 0) AS ws
      |  FROM documents),
      |wins AS (
      |  SELECT doc_id, p, md5(array_to_string(ws[p:p+9], ' ')) AS h
      |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 8)) AS p
      |        FROM toks WHERE len(ws) >= 10) t),
      |dups AS (
      |  SELECT doc_id, p FROM (
      |    SELECT doc_id, p,
      |      row_number() OVER (PARTITION BY h ORDER BY doc_id, p) AS rn
      |    FROM wins) r
      |  WHERE rn > 1),
      |g AS (
      |  SELECT doc_id, p,
      |    sum(CASE WHEN prev IS NULL OR p > prev + 10 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY doc_id ORDER BY p) AS grp
      |  FROM (SELECT doc_id, p,
      |          lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
      |        FROM dups) d)""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_latest_event_top1" ->
      """SELECT event_id, event_type,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_unix
        |FROM events ORDER BY ts DESC, event_id DESC LIMIT 1""".stripMargin,
    "q03_work_queue" ->
      """SELECT event_id, user_id, event_type FROM (
        |  SELECT * FROM events
        |  WHERE event_type IN ('click','error') AND value > 50
        |  ORDER BY ts ASC, event_id ASC LIMIT 1000)""".stripMargin,
    "q04_state_counts" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type""".stripMargin,
    "q05_filtered_counts" ->
      """SELECT count(*) AS n_total,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
        |  count(CASE WHEN value > 90 THEN 1 END) AS n_high_value,
        |  count(CASE WHEN event_type = 'error' AND value > 90 THEN 1 END) AS n_error_high
        |FROM events""".stripMargin,
    "q06_anti_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)""".stripMargin,
    "q07_dim_join_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q08_epoch_buckets" ->
      """WITH e AS (SELECT CAST(floor((floor(epoch(ts)) - 1598306400) / 30.0) AS INT) AS epoch
        |           FROM events)
        |SELECT CAST(floor(epoch / 2880.0) AS BIGINT) AS epoch_day,
        |  count(*) AS n,
        |  CAST(min(epoch) AS BIGINT) AS first_epoch,
        |  CAST(max(epoch) AS BIGINT) AS last_epoch
        |FROM e GROUP BY 1""".stripMargin,
    "q09_eligibility" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders
        |WHERE o_orderstatus = 'O' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND o_totalprice > 50000""".stripMargin,
    "q10_latest_per_user" ->
      """SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_unix
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) WHERE rn = 1""".stripMargin,
    "q11_tumbling_window" ->
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_unix,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1""".stripMargin,
    "q12_submit_payload" ->
      """SELECT 'f0' || CAST(o_custkey AS VARCHAR) AS miner_id,
        |  CAST(o_orderkey AS VARCHAR) AS order_key_str,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS total_price_str
        |FROM orders WHERE o_orderkey <= 100""".stripMargin,
    "q13_doc_tokens" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_actual,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
        |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_bpe_tokens
        |FROM documents""".stripMargin,
    "q14_text_quality" ->
      """SELECT doc_id,
        |  CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' the ', ' '))) / 4 AS BIGINT) AS n_stopword_the,
        |  CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' a ', ' '))) / 2 AS BIGINT) AS n_stopword_a,
        |  CAST((length(' '||text||' ') - length(replace(' '||text||' ', ' spark ', ' '))) / 6 AS BIGINT) AS n_word_spark
        |FROM documents""".stripMargin,
    "q15_exact_dedup" ->
      """SELECT md5(text) AS content_md5, min(doc_id) AS rep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "q16_ngram_jaccard" ->
      """WITH words AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
        |idx AS (SELECT doc_id, source, ws, unnest(range(1, len(ws))) AS i FROM words),
        |grams AS (SELECT DISTINCT doc_id, source, ws[i] || ' ' || ws[i+1] AS shingle FROM idx),
        |sizes AS (SELECT doc_id, count(*) AS set_n FROM grams GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter_n
        |  FROM grams a JOIN grams b
        |    ON a.source = b.source AND a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 8)
        |SELECT id1, id2, inter_n, s1.set_n + s2.set_n - inter_n AS union_n
        |FROM pairs
        |JOIN sizes s1 ON pairs.id1 = s1.doc_id
        |JOIN sizes s2 ON pairs.id2 = s2.doc_id""".stripMargin,
    // q17: the EXACT global bigram-Jaccard ≥ 0.5 sweep (q16's shape
    // without source blocking). The engine's LSH candidates are
    // exact-verified (precision 1) and banding recall is exactly 1 on
    // this corpus (true pairs at J ≥ 0.82, none in [0.45, 0.5) —
    // DeterminismProbe), so the approximate path hash-matches the
    // exact oracle; deliberately blind to bands/signatures.
    "q17_minhash_pairs" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |idx AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM words),
        |grams AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS shingle FROM idx),
        |sizes AS (SELECT doc_id, count(*) AS set_n FROM grams GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter_n
        |  FROM grams a JOIN grams b
        |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT id1, id2, inter_n, s1.set_n + s2.set_n - inter_n AS union_n
        |FROM pairs
        |JOIN sizes s1 ON pairs.id1 = s1.doc_id
        |JOIN sizes s2 ON pairs.id2 = s2.doc_id
        |WHERE inter_n >= (s1.set_n + s2.set_n - inter_n) * 0.5""".stripMargin,
    "q20_lsh_topk" -> annPlantedTopkSql,
    "q30_ivf_topk" -> annPlantedTopkSql,
    "q45_pq_topk" -> annPlantedTopkSql,
    "q65_ivfpq_topk" -> annPlantedTopkSql,
    // q108 shares the planted-ANN oracle VERBATIM: the scalar-quantized
    // IVF tier (byte codes + exact re-rank) must answer exactly like
    // the q30/q65 builds on the planted corpus
    "q108_ivfsq_topk" -> annPlantedTopkSql,
    // q101 shares the planted-ANN oracle VERBATIM: the durable
    // incremental LSH store (AnnStream: 3 upsert commits + pruned
    // search) must answer exactly like the one-shot q20 build
    "q101_ann_stream" -> annPlantedTopkSql,
    // q102 likewise: the durable incremental IVF store (IvfStream:
    // first-tick quantizer fit + pin, 3 assignment commits, nprobe-
    // pruned search) must answer exactly like q30's one-shot build
    "q102_ivf_stream" -> annPlantedTopkSql,
    // q104: the durable incremental IVF-PQ store (IvfPqStream: dual
    // quantizer pinned on first contact, residual codes per commit,
    // cell-pruned ADC + exact re-rank) against q65's one-shot gate
    "q104_ivfpq_stream" -> annPlantedTopkSql,
    // q109 shares the planted-ANN oracle VERBATIM: the durable
    // incremental IVF-SQ8 store must answer exactly like q108's
    // one-shot build
    "q109_ivfsq_stream" -> annPlantedTopkSql,
    // q112 (round 17): the upsert-CHURN gate — brute force over the
    // LATEST corpus (two of each query's five planted copies
    // re-upserted as a 0.5/0.5 mix), doubled across both store states.
    // Under max-over-versions the stale v1 rows (cos ≥ 0.98) would
    // outrank and the hash would mismatch; under latest-wins the store
    // must serve the v2 ranking pre- AND post-compaction.
    "q112_upsert_churn" ->
      s"""WITH $plantedCtes,
        |churned AS (
        |  SELECT 1099511627776 + pq.qid * 5 + c AS vec_id,
        |    list_transform(range(1, len(qv) + 1), i ->
        |      CAST(CAST(0.5 AS DOUBLE) * CAST(qv[i] AS DOUBLE)
        |         + CAST(0.5 AS DOUBLE) * CAST(uv[i] AS DOUBLE) AS FLOAT)) AS embedding
        |  FROM pq JOIN pu USING (qid), (SELECT unnest(range(1, 3)) AS c) cs),
        |latest AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id, embedding FROM planted
        |    WHERE (vec_id - 1099511627776) % 5 NOT IN (1, 2)
        |  UNION ALL SELECT vec_id, embedding FROM churned),
        |s AS (SELECT pq.qid, c.vec_id AS nid,
        |        list_cosine_similarity(CAST(pq.qv AS DOUBLE[]),
        |          CAST(c.embedding AS DOUBLE[])) AS cos
        |      FROM latest c, pq WHERE c.vec_id <> pq.qid),
        |topk AS (SELECT qid AS query_id, nid AS neighbor_id, rank FROM (
        |  SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
        |  FROM s)
        |  WHERE rank <= 5)
        |SELECT query_id, neighbor_id, rank, state
        |FROM topk, (SELECT unnest(['pre', 'post']) AS state) st""".stripMargin,
    // q113 (round 17): FILTERED ANN — the planted brute-force oracle
    // with the same candidate predicate the store search carries
    // (neighbor_id % 2 = 0). The filter removes 2-3 of each query's 5
    // planted copies, so an unfiltered or post-filtered implementation
    // hash-mismatches immediately.
    "q113_filtered_ann" ->
      s"""WITH $plantedCtes,
        |s AS (SELECT pq.qid, c.vec_id AS nid,
        |        list_cosine_similarity(CAST(pq.qv AS DOUBLE[]),
        |          CAST(c.embedding AS DOUBLE[])) AS cos
        |      FROM pcorpus c, pq
        |      WHERE c.vec_id <> pq.qid AND c.vec_id % 2 = 0)
        |SELECT qid AS query_id, nid AS neighbor_id, rank FROM (
        |  SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
        |  FROM s)
        |WHERE rank <= 2""".stripMargin,
    // q53: exact all-pairs cosine ≥ 0.92 over the planted corpus — the
    // threshold regime where the k-means cell blocking provably loses
    // nothing (family diameter ≤ 0.05 rad, distractor ceiling 0.61)
    "q53_semantic_dedup" ->
      s"""WITH $plantedCtes
        |SELECT a.vec_id AS id1, b.vec_id AS id2
        |FROM pcorpus a JOIN pcorpus b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |        CAST(b.embedding AS DOUBLE[])) >= 0.92""".stripMargin,
    "q19_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
        |s AS (SELECT qid, vec_id AS nid,
        |        list_cosine_similarity(CAST(qv AS DOUBLE[]), CAST(embedding AS DOUBLE[])) AS cos
        |      FROM embeddings, q WHERE vec_id <> qid)
        |SELECT qid AS query_id, nid AS neighbor_id, rank FROM (
        |  SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rank
        |  FROM s)
        |WHERE rank <= 5""".stripMargin,
    "q23_embedding_neardup" ->
      """SELECT a.vec_id AS id1, b.vec_id AS id2
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |        CAST(b.embedding AS DOUBLE[])) >= 0.45""".stripMargin,
    // q22's Karp-Rabin polynomial (base 257, implicit mod 2^64) restated
    // over HUGEINT: prepend the seed, fold `(acc*257 + codepoint) % 2^64`,
    // then two's-complement back to signed BIGINT. Exact for this data:
    // Java charAt (UTF-16 units) == unicode() (codepoints) on ASCII text.
    // NULL → NULL and '' → bare seed mirror the UDF exactly (DuckDB's
    // string_split('','') is [''] with unicode('') = -1, so the empty
    // case must bypass the fold).
    "q22_fingerprint" ->
      """WITH h AS (
        |  SELECT doc_id, CASE
        |    WHEN text IS NULL THEN NULL
        |    WHEN length(text) = 0 THEN 1125899906842597::HUGEINT
        |    ELSE list_reduce(
        |      list_prepend(CAST(1125899906842597 AS HUGEINT),
        |        list_transform(string_split(text, ''), c -> CAST(unicode(c) AS HUGEINT))),
        |      (acc, x) -> (acc * 257 + x) % 18446744073709551616::HUGEINT) END AS h
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
        |       THEN h - 18446744073709551616::HUGEINT ELSE h END AS BIGINT) AS fp64
        |FROM h""".stripMargin,
    // q21's n-gram heuristic: overlapping letter-bigram counts joined to
    // the SAME profile table the Scala scorer uses (interpolated below,
    // so the two sides cannot drift), weight = 20−rank, winner by
    // (score DESC, lang DESC), zero score → 'und'.
    "q21_langid" -> {
      val prof = graft.ops.TextAnalysis.langProfiles.toSeq.sortBy(_._1)
        .flatMap { case (lang, bgs) =>
          bgs.zipWithIndex.map { case (bg, r) => s"('$lang','$bg',${bgs.size - r})" }
        }.mkString(",")
      s"""WITH chars AS (SELECT doc_id, string_split(lower(text), '') AS cs FROM documents),
         |idx AS (SELECT doc_id, cs, unnest(range(1, len(cs))) AS i FROM chars),
         |bg AS (SELECT doc_id, cs[i] || cs[i+1] AS b FROM idx
         |       WHERE regexp_matches(cs[i] || cs[i+1], '^[a-z][a-z]$$')),
         |cnt AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY 1, 2),
         |prof(lang, b, w) AS (VALUES $prof),
         |sc AS (SELECT doc_id, lang, sum(n * w) AS score
         |       FROM cnt JOIN prof ON cnt.b = prof.b GROUP BY 1, 2),
         |best AS (SELECT doc_id, lang, score, row_number() OVER (
         |           PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
         |         FROM sc)
         |SELECT d.doc_id,
         |  CASE WHEN b.score IS NULL OR b.score = 0 THEN 'und' ELSE b.lang END AS lang_pred
         |FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)""".stripMargin
    },
    "q27_vocab_topk" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY n DESC, word ASC LIMIT 100""".stripMargin,
    "q28_rollup" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "q29_set_ops" ->
      """SELECT o_custkey AS cust_key FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 300000""".stripMargin,
    "q31_asof_join" ->
      """SELECT e.event_id AS error_id, e.user_id,
        |  c.event_id AS last_click_id
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id AND c.ts <= e.ts""".stripMargin,
    "q32_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |s AS (SELECT user_id,
        |        sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC) AS session_id
        |      FROM g)
        |SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id""".stripMargin,
    "q33_percentiles" ->
      """SELECT event_type,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.95) AS p95
        |FROM events GROUP BY event_type""".stripMargin,
    "q34_heavy_hitters" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |SELECT word, count(*) AS n FROM w
        |GROUP BY word HAVING count(*) * 50 >= (SELECT count(*) FROM w)""".stripMargin,
    "q35_returned_revenue" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |           (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin,
    "q36_above_avg_orders" ->
      """WITH ca AS (
        |  SELECT o_custkey AS ck,
        |    sum(CAST(o_totalprice AS DECIMAL(12,2))) AS sum_price,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_orderkey, o_custkey
        |FROM orders JOIN ca ON o_custkey = ck
        |WHERE CAST(o_totalprice AS DECIMAL(14,2)) * n_orders > sum_price * 2""".stripMargin,
    "q37_running_sum" ->
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events""".stripMargin,
    "q38_pivot" ->
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY user_id""".stripMargin,
    "q40_distinctive_terms" ->
      """WITH tf AS (
        |  SELECT doc_id AS id, word, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |  GROUP BY doc_id, word),
        |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word)
        |SELECT id AS doc_id, word, tf, df, rank FROM (
        |  SELECT tf.id, tf.word, tf.tf, dfreq.df,
        |    row_number() OVER (PARTITION BY tf.id
        |      ORDER BY tf.tf DESC, dfreq.df ASC, tf.word ASC) AS rank
        |  FROM tf JOIN dfreq ON tf.word = dfreq.word)
        |WHERE rank <= 3""".stripMargin,
    "q41_hash_sample" ->
      """SELECT doc_id, source FROM documents
        |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000
        |  < CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 600 ELSE 250 END""".stripMargin,
    "q42_quota_pack" ->
      """WITH toks AS (
        |  SELECT doc_id, source, CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tok
        |  FROM documents),
        |laid AS (
        |  SELECT doc_id, source,
        |    CAST(COALESCE(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
        |  FROM toks)
        |SELECT doc_id, source, CAST(start // 2048 AS BIGINT) AS pack_id,
        |  CAST(start % 2048 AS BIGINT) AS pack_offset
        |FROM laid""".stripMargin,
    "q47_stratified_topk" ->
      """SELECT doc_id, source, rn AS draw_rank FROM (
        |  SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
        |  FROM documents)
        |WHERE rn <= 20""".stripMargin,
    // q48: spans = consecutive 10-word windows (1-based inclusive list
    // slice, like Spark's slice(ws, i*10+1, 10)); keeper of a span hash
    // = the lowest doc_id containing it.
    "q48_span_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |e AS (SELECT doc_id, ws,
        |        unnest(range(CAST(ceil(len(ws) / 10.0) AS BIGINT))) AS i
        |      FROM w),
        |c AS (SELECT doc_id,
        |        array_to_string(ws[i * 10 + 1 : i * 10 + 10], ' ') AS span
        |      FROM e),
        |f AS (SELECT doc_id, md5(span) AS h, length(span) AS plen
        |      FROM c WHERE length(span) > 0),
        |d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans FROM f GROUP BY 1),
        |k AS (SELECT h, min(doc_id) AS doc_id, max(plen) AS plen FROM f GROUP BY 1),
        |kd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |         CAST(sum(plen) AS BIGINT) AS kept_chars FROM k GROUP BY 1)
        |SELECT d.doc_id, d.n_spans,
        |  coalesce(kd.n_kept, 0) AS n_kept,
        |  coalesce(kd.kept_chars, 0) AS kept_chars
        |FROM d LEFT JOIN kd USING (doc_id)""".stripMargin,
    // q49: the engine's range-partitioned two-phase global index equals
    // one total-order row_number by construction
    "q49_shuffle_shards" ->
      """SELECT doc_id,
        |  CAST((rn - 1) // 64 AS BIGINT) AS shard_id,
        |  CAST((rn - 1) % 64 AS BIGINT) AS pos_in_shard
        |FROM (SELECT doc_id, row_number() OVER (
        |        ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
        |      FROM documents)""".stripMargin,
    // q85: q49's shard assignment re-derived, then per-shard counts,
    // ceil(len/4) token totals, the order-insensitive Σ md5-prefix
    // checksum, and arg_min-by-pos first doc (pos*2^32+id linearizes
    // the tie-free (pos, id) order like q78/q81)
    "q85_shard_manifest" ->
      """WITH sh AS (SELECT doc_id,
        |    CAST((rn - 1) // 64 AS BIGINT) AS shard_id,
        |    CAST((rn - 1) % 64 AS BIGINT) AS pos
        |  FROM (SELECT doc_id, row_number() OVER (
        |          ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
        |        FROM documents)),
        |j AS (SELECT sh.shard_id, sh.pos, d.doc_id, d.text
        |  FROM sh JOIN documents d ON sh.doc_id = d.doc_id)
        |SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT) AS sum_tokens,
        |  CAST(sum(CAST('0x' || substr(md5(text), 1, 8) AS BIGINT)) AS BIGINT)
        |    AS content_sum,
        |  CAST(arg_min(doc_id, pos * 4294967296 + doc_id) AS BIGINT) AS first_doc
        |FROM j GROUP BY 1""".stripMargin,
    "q50_cube" ->
      """SELECT source, lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(grouping(source) AS BIGINT) AS g_source,
        |  CAST(grouping(lang) AS BIGINT) AS g_lang
        |FROM documents GROUP BY CUBE (source, lang)""".stripMargin,
    "q54_vocab_by_source" ->
      """SELECT source,
        |  CAST(count(DISTINCT word) AS BIGINT) AS n_distinct_words,
        |  CAST(count(*) AS BIGINT) AS n_tokens
        |FROM (SELECT source, unnest(string_split(text, ' ')) AS word
        |      FROM documents)
        |GROUP BY source""".stripMargin,
    // q55: sessions re-derived with q32's recurrence, then a plain
    // BETWEEN join — the engine's binned equi-join must agree exactly
    "q55_session_range_join" ->
      """WITH g AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |s AS (SELECT user_id, ts,
        |        sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC) AS session_id
        |      FROM g),
        |iv AS (SELECT user_id, session_id, min(ts) AS start_ts, max(ts) AS end_ts
        |       FROM s GROUP BY user_id, session_id)
        |SELECT e.event_id, e.user_id, CAST(iv.session_id AS BIGINT) AS session_id
        |FROM events e JOIN iv ON e.user_id = iv.user_id
        |  AND e.ts BETWEEN iv.start_ts AND iv.end_ts""".stripMargin,
    "q56_json_extract" ->
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(min(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(max(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    // q52: greedy close-on-overflow is a per-stratum recurrence —
    // state (pack, fill) before doc i, overflow ⇒ pack+1/fill 0, then
    // offset = fill, fill += tok. The CTE replays it row-by-row in
    // (source, doc_id) order; recursion depth = max docs per stratum.
    "q52_greedy_pack" ->
      """WITH RECURSIVE ordered AS (
        |  SELECT doc_id, source,
        |    CAST(ceil(length(text) / 4.0) AS BIGINT) AS tok,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id ASC) AS rn
        |  FROM documents),
        |rec AS (
        |  SELECT source, rn, doc_id, tok,
        |    CAST(0 AS BIGINT) AS pack_id, CAST(0 AS BIGINT) AS pack_offset,
        |    tok AS fill
        |  FROM ordered WHERE rn = 1
        |  UNION ALL
        |  SELECT o.source, o.rn, o.doc_id, o.tok,
        |    CASE WHEN r.fill > 0 AND r.fill + o.tok > 2048
        |      THEN r.pack_id + 1 ELSE r.pack_id END,
        |    CASE WHEN r.fill > 0 AND r.fill + o.tok > 2048
        |      THEN CAST(0 AS BIGINT) ELSE r.fill END,
        |    CASE WHEN r.fill > 0 AND r.fill + o.tok > 2048
        |      THEN o.tok ELSE r.fill + o.tok END
        |  FROM rec r JOIN ordered o ON o.source = r.source AND o.rn = r.rn + 1)
        |SELECT doc_id, source, pack_id, pack_offset FROM rec""".stripMargin,
    // q69: q52's recurrence replayed per (source, chunk-of-32) with the
    // open pack closed at each chunk boundary; pack ids sparse at
    // chunk*32 — exactly the engine's bounded-task scale mode
    "q69_greedy_pack_chunked" ->
      """WITH RECURSIVE ordered AS (
        |  SELECT doc_id, source,
        |    CAST(ceil(length(text) / 4.0) AS BIGINT) AS tok,
        |    row_number() OVER (PARTITION BY source ORDER BY doc_id ASC) AS rn
        |  FROM documents),
        |chunked AS (
        |  SELECT doc_id, source, tok,
        |    CAST((rn - 1) // 32 AS BIGINT) AS chunk,
        |    CAST((rn - 1) % 32 + 1 AS BIGINT) AS crn
        |  FROM ordered),
        |rec AS (
        |  SELECT source, chunk, crn, doc_id, tok,
        |    CAST(chunk * 32 AS BIGINT) AS pack_id,
        |    CAST(0 AS BIGINT) AS pack_offset,
        |    tok AS fill
        |  FROM chunked WHERE crn = 1
        |  UNION ALL
        |  SELECT o.source, o.chunk, o.crn, o.doc_id, o.tok,
        |    CASE WHEN r.fill > 0 AND r.fill + o.tok > 2048
        |      THEN r.pack_id + 1 ELSE r.pack_id END,
        |    CASE WHEN r.fill > 0 AND r.fill + o.tok > 2048
        |      THEN CAST(0 AS BIGINT) ELSE r.fill END,
        |    CASE WHEN r.fill > 0 AND r.fill + o.tok > 2048
        |      THEN o.tok ELSE r.fill + o.tok END
        |  FROM rec r JOIN chunked o
        |    ON o.source = r.source AND o.chunk = r.chunk AND o.crn = r.crn + 1)
        |SELECT doc_id, source, pack_id, pack_offset FROM rec""".stripMargin,
    // q70: temperature mixing quotas in EXACT integer arithmetic —
    // weights floor(sqrt(n)*2^20) (sqrt is correctly rounded, pow is
    // not), floor quotas + largest-remainder bonus (ties by source
    // ASC) in HUGEINT, capped at the stratum count; members = the
    // quota-many smallest md5 draws per source (the q47 draw).
    "q70_temperature_sample" ->
      """WITH c AS (
        |  SELECT source AS s, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY source),
        |w AS (SELECT s, n,
        |  CAST(floor(sqrt(n) * 1048576) AS HUGEINT) AS wt FROM c),
        |t AS (SELECT sum(wt) AS tw FROM w),
        |q0 AS (SELECT s, n, wt,
        |    (CAST(200 AS HUGEINT) * wt) // tw AS fq,
        |    (CAST(200 AS HUGEINT) * wt) % tw AS rem
        |  FROM w, t),
        |b AS (SELECT s, n, fq, rem,
        |    row_number() OVER (ORDER BY rem DESC, s ASC) AS rr
        |  FROM q0),
        |e AS (SELECT 200 - sum(fq) AS extra FROM q0),
        |k AS (SELECT s,
        |    least(CAST(n AS HUGEINT),
        |      fq + CASE WHEN rr <= (SELECT extra FROM e) THEN 1 ELSE 0 END) AS kk
        |  FROM b),
        |r AS (SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
        |  FROM documents)
        |SELECT r.doc_id, r.source, CAST(r.rn AS BIGINT) AS draw_rank
        |FROM r JOIN k ON r.source = k.s WHERE r.rn <= kk""".stripMargin,
    // q71: the engine's two-phase prefix sum collapses to one window
    // cumsum single-node; boundary pieces replayed via generate_series
    "q71_pack_sequences" ->
      """WITH toks AS (
        |  SELECT doc_id, CAST(ceil(length(text) / 4.0) AS BIGINT) AS n
        |  FROM documents),
        |pre AS (
        |  SELECT doc_id, n,
        |    CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS st
        |  FROM toks WHERE n > 0),
        |pieces AS (
        |  SELECT doc_id, n, st,
        |    unnest(generate_series(st // 512, (st + n - 1) // 512)) AS seq_id
        |  FROM pre)
        |SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id,
        |  CAST(GREATEST(st, seq_id * 512) - seq_id * 512 AS BIGINT) AS seq_off,
        |  CAST(GREATEST(st, seq_id * 512) - st AS BIGINT) AS doc_off,
        |  CAST(LEAST(st + n, (seq_id + 1) * 512)
        |    - GREATEST(st, seq_id * 512) AS BIGINT) AS piece_len
        |FROM pieces""".stripMargin,
    // q72: DSIR bucket models re-derived in SQL; ROUND(,6) both sides
    "q72_dsir_weights" ->
      """WITH ws AS (SELECT doc_id, lang, string_split(text, ' ') AS w
        |  FROM documents),
        |uni AS (SELECT doc_id, lang, unnest(w) AS f FROM ws),
        |bi AS (SELECT doc_id, lang, w[i] || ' ' || w[i + 1] AS f
        |  FROM ws, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) t),
        |feats AS (SELECT doc_id, lang,
        |    CAST('0x' || substr(md5(f), 1, 8) AS BIGINT) % 512 AS b
        |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
        |bc AS (SELECT b,
        |    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct,
        |    COUNT(*) AS cr
        |  FROM feats GROUP BY b),
        |tot AS (SELECT SUM(ct) AS t, SUM(cr) AS r FROM bc),
        |model AS (SELECT b,
        |    ln((ct + 1.0) / (t + 512.0)) - ln((cr + 1.0) / (r + 512.0)) AS lr
        |  FROM bc, tot),
        |pd AS (SELECT doc_id, b, COUNT(*) AS n FROM feats GROUP BY doc_id, b)
        |SELECT pd.doc_id, CAST(SUM(pd.n) AS BIGINT) AS n_feats,
        |  ROUND(SUM(pd.n * model.lr), 6) AS dsir_weight
        |FROM pd JOIN model USING (b)
        |GROUP BY pd.doc_id""".stripMargin,
    // q73: CDC breakpoints replayed per position via list_filter; chunk
    // boundaries from lag() over cut ends + one trailing chunk per doc
    "q73_cdc_chunks" ->
      """WITH base AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |cutends AS (SELECT doc_id, e0 + 11 AS e FROM (
        |  SELECT doc_id,
        |    unnest(list_filter(generate_series(1, greatest(n - 11, 0)),
        |      p -> CAST('0x' || substr(md5(substr(text, p, 12)), 1, 8) AS BIGINT)
        |        % 32 = 0)) AS e0
        |  FROM base)),
        |bounds AS (
        |  SELECT doc_id,
        |    COALESCE(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0) + 1 AS s, e
        |  FROM cutends
        |  UNION ALL
        |  SELECT b.doc_id, COALESCE(m.mx, 0) + 1 AS s, b.n AS e
        |  FROM base b LEFT JOIN (
        |    SELECT doc_id, max(e) AS mx FROM cutends GROUP BY doc_id) m
        |    USING (doc_id)),
        |chunks AS (
        |  SELECT bo.doc_id, bo.e - bo.s + 1 AS l,
        |    md5(substr(ba.text, bo.s, bo.e - bo.s + 1)) AS h
        |  FROM bounds bo JOIN base ba USING (doc_id) WHERE bo.s <= bo.e),
        |dup AS (SELECT h FROM chunks GROUP BY h
        |  HAVING COUNT(DISTINCT doc_id) >= 2)
        |SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |  CAST(SUM(CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_chunks,
        |  CAST(SUM(CASE WHEN d.h IS NOT NULL THEN c.l ELSE 0 END) AS BIGINT)
        |    AS dup_chars
        |FROM chunks c LEFT JOIN dup d USING (h)
        |GROUP BY c.doc_id""".stripMargin,
    // q74: first-occurrence election grouped straight to per-doc counts
    "q74_novelty" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i + 1] AS s
        |  FROM ws, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) t),
        |tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
        |  FROM sh GROUP BY doc_id),
        |firsts AS (SELECT s, min(doc_id) AS fid FROM sh GROUP BY s),
        |nov AS (SELECT fid AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_novel
        |  FROM firsts GROUP BY fid)
        |SELECT tot.doc_id, tot.n_shingles,
        |  COALESCE(nov.n_novel, CAST(0 AS BIGINT)) AS n_novel
        |FROM tot LEFT JOIN nov USING (doc_id)""".stripMargin,
    // q75: bloom-prefiltered decontamination must equal the plain
    // exact anti-join — the oracle IS the no-sketch formulation, so a
    // single false-negative-shaped bug in the bloom path hash-fails
    "q75_bloom_clean" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |idx AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM words),
        |grams AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS shingle FROM idx),
        |bench AS (SELECT * FROM grams WHERE doc_id % 50 = 0),
        |corp AS (SELECT * FROM grams WHERE doc_id % 50 <> 0),
        |dirty AS (
        |  SELECT c.doc_id FROM corp c JOIN bench b ON c.shingle = b.shingle
        |  GROUP BY c.doc_id, b.doc_id HAVING count(*) >= 4)
        |SELECT d.doc_id, d.source FROM documents d
        |WHERE d.doc_id % 50 <> 0
        |  AND d.doc_id NOT IN (SELECT doc_id FROM dirty)""".stripMargin,
    // q76: brute-force all-pairs Hamming over SQL-restated portable
    // fingerprints (the same 257-polynomial char fold as q22, per
    // DISTINCT word bigram, ±1 votes per bit, sign → bit) —
    // deliberately blind to the engine's pigeonhole blocking, so it
    // gates the no-lost-pairs guarantee end-to-end
    // q18: the fingerprint relation itself (q76's input) — every
    // 64-bit simhash checked bit-for-bit via the same shared CTE chain
    "q18_simhash" ->
      s"""WITH $simhashCtes
        |SELECT doc_id AS id, sim AS simhash FROM s64""".stripMargin,
    "q76_simhash_neardup" ->
      s"""WITH $simhashCtes
        |SELECT a.doc_id AS id1, b.doc_id AS id2,
        |  CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
        |FROM s64 a JOIN s64 b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sim, b.sim)) <= 3""".stripMargin,
    // q86: the composed clean-corpus pipeline — every stage's CTE is
    // the (shared or verbatim) oracle of its standalone query, so the
    // composition cannot drift from the pieces: exact keepers (q15),
    // SimHash pairs (q76 chain, shared) + transitive closure (q46's
    // recursion shape), contamination suspects (q43), Gopher gate (q82)
    "q86_corpus_pipeline" ->
      s"""WITH RECURSIVE $simhashCtes,
        |ex AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |sp AS (SELECT a.doc_id AS id1, b.doc_id AS id2 FROM s64 a JOIN s64 b
        |  ON a.doc_id < b.doc_id WHERE bit_count(xor(a.sim, b.sim)) <= 3),
        |edges AS (SELECT id1 AS a, id2 AS b FROM sp UNION SELECT id2, id1 FROM sp),
        |reach AS (SELECT doc_id AS a, doc_id AS b FROM documents
        |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |comp AS (SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a),
        |grams AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS shingle FROM idx),
        |bench AS (SELECT * FROM grams WHERE doc_id % 50 = 0),
        |corp AS (SELECT * FROM grams WHERE doc_id % 50 <> 0),
        |sus AS (SELECT DISTINCT corpus_id FROM (
        |  SELECT c.doc_id AS corpus_id, b.doc_id AS bid FROM corp c JOIN bench b
        |    ON c.shingle = b.shingle GROUP BY 1, 2 HAVING count(*) >= 4)),
        |gw AS (SELECT doc_id, list_filter(ws, x -> len(x) > 0) AS fws FROM words),
        |gm AS (SELECT doc_id, CAST(len(fws) AS BIGINT) AS n_words,
        |  CAST(coalesce(list_sum(list_transform(fws, x -> len(x))), 0) AS BIGINT) AS swl
        |  FROM gw),
        |gx AS (SELECT doc_id, unnest(fws) AS word FROM gw),
        |gtop AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS topn FROM
        |  (SELECT doc_id, word, count(*) AS c FROM gx GROUP BY 1, 2) GROUP BY 1),
        |gstop AS (SELECT doc_id, CAST(count(DISTINCT word) AS BIGINT) AS nstop
        |  FROM gx WHERE word IN ('the','a','of','and','to','in','is','that') GROUP BY 1),
        |gok AS (SELECT gm.doc_id,
        |  (gm.n_words BETWEEN 20 AND 100000
        |   AND 3 * gm.n_words <= gm.swl AND gm.swl <= 10 * gm.n_words
        |   AND coalesce(gstop.nstop, 0) >= 2
        |   AND 5 * coalesce(gtop.topn, 0) <= gm.n_words) AS r_quality
        |  FROM gm LEFT JOIN gtop ON gm.doc_id = gtop.doc_id
        |  LEFT JOIN gstop ON gm.doc_id = gstop.doc_id)
        |SELECT d.doc_id,
        |  (ex.doc_id IS NOT NULL) AS r_exact,
        |  (coalesce(comp.component, d.doc_id) = d.doc_id) AS r_neardup,
        |  (d.doc_id % 50 <> 0 AND sus.corpus_id IS NULL) AS r_clean,
        |  gok.r_quality,
        |  ((ex.doc_id IS NOT NULL)
        |    AND coalesce(comp.component, d.doc_id) = d.doc_id
        |    AND d.doc_id % 50 <> 0 AND sus.corpus_id IS NULL
        |    AND gok.r_quality) AS kept
        |FROM documents d
        |LEFT JOIN ex ON d.doc_id = ex.doc_id
        |LEFT JOIN comp ON d.doc_id = comp.doc_id
        |LEFT JOIN sus ON d.doc_id = sus.corpus_id
        |JOIN gok ON d.doc_id = gok.doc_id""".stripMargin,
    "q77_trigram_lm" ->
      """WITH words AS (SELECT string_split(text, ' ') AS ws FROM documents),
        |idx AS (SELECT ws, unnest(range(1, len(ws) - 1)) AS i FROM words),
        |tri AS (SELECT ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS w3 FROM idx),
        |c3 AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS n3 FROM tri GROUP BY 1, 2, 3),
        |c2 AS (SELECT w1, w2, CAST(sum(n3) AS BIGINT) AS ctx_n FROM c3 GROUP BY 1, 2)
        |SELECT c3.w1, c3.w2, c3.w3, n3, ctx_n
        |FROM c3 JOIN c2 USING (w1, w2) WHERE n3 >= 2""".stripMargin,
    // q84: stupid-backoff restated — reference (src0) trigram/bigram/
    // unigram counts, then per-doc trigram instances CASE through the
    // backoff chain; ln + sum + ROUND 6 absorbs engine sum-order ulps
    "q84_backoff_lm" ->
      """WITH rw AS (SELECT string_split(text, ' ') AS ws FROM documents WHERE source = 'src0'),
        |runi AS (SELECT w, CAST(count(*) AS BIGINT) AS n1
        |  FROM (SELECT unnest(ws) AS w FROM rw) GROUP BY 1),
        |rn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM (SELECT unnest(ws) AS w FROM rw)),
        |rbig AS (SELECT ws[i] AS w2, ws[i+1] AS w3, CAST(count(*) AS BIGINT) AS n2
        |  FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM rw) GROUP BY 1, 2),
        |rtri AS (SELECT ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS w3,
        |    CAST(count(*) AS BIGINT) AS n3
        |  FROM (SELECT ws, unnest(range(1, len(ws) - 1)) AS i FROM rw) GROUP BY 1, 2, 3),
        |rctx AS (SELECT w1, w2, CAST(sum(n3) AS BIGINT) AS ctx_n FROM rtri GROUP BY 1, 2),
        |dw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |dtri AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS w3
        |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i FROM dw)),
        |terms AS (SELECT d.doc_id,
        |    CASE
        |      WHEN t.n3 IS NOT NULL THEN ln(CAST(t.n3 AS DOUBLE) / c.ctx_n)
        |      WHEN b.n2 IS NOT NULL THEN ln(CAST(0.4 AS DOUBLE) * CAST(b.n2 AS DOUBLE) / u2.n1)
        |      WHEN u3.n1 IS NOT NULL THEN ln((CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE)) * CAST(u3.n1 AS DOUBLE) / rn.n)
        |      ELSE ln((CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE)) / rn.n)
        |    END AS term
        |  FROM dtri d
        |  LEFT JOIN rtri t ON d.w1 = t.w1 AND d.w2 = t.w2 AND d.w3 = t.w3
        |  LEFT JOIN rctx c ON d.w1 = c.w1 AND d.w2 = c.w2
        |  LEFT JOIN rbig b ON d.w2 = b.w2 AND d.w3 = b.w3
        |  LEFT JOIN runi u2 ON d.w2 = u2.w
        |  LEFT JOIN runi u3 ON d.w3 = u3.w
        |  CROSS JOIN rn),
        |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
        |    sum(term) AS score FROM terms GROUP BY 1)
        |SELECT d.doc_id, COALESCE(per.n_trigrams, 0) AS n_trigrams,
        |  ROUND(COALESCE(per.score, 0.0), 6) AS score
        |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id""".stripMargin,
    // q78: integer-exact argmin — dist*8+cid linearizes the
    // (dist, cid) lexicographic tie-break for arg_min (cid < 8)
    "q78_kmeans_assign" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS xq
        |  FROM embeddings),
        |cent AS (SELECT vec_id AS cid, xq AS cq FROM e WHERE vec_id < 8),
        |d AS (SELECT e.vec_id, c.cid,
        |    CAST(list_sum(list_transform(range(1, 65),
        |      i -> (xq[i] - cq[i]) * (xq[i] - cq[i]))) AS BIGINT) AS dist
        |  FROM e, cent c),
        |a AS (SELECT vec_id, CAST(arg_min(cid, dist * 8 + cid) AS BIGINT) AS cid,
        |    min(dist) AS mind FROM d GROUP BY 1)
        |SELECT cid AS centroid_id, CAST(count(*) AS BIGINT) AS n_members,
        |  CAST(sum(mind) AS BIGINT) AS inertia, min(vec_id) AS min_member
        |FROM a GROUP BY 1""".stripMargin,
    "q79_window_chunks" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |st AS (SELECT doc_id, ws, unnest(range(0, len(ws), 48)) AS s FROM words)
        |SELECT doc_id, CAST(s // 48 AS BIGINT) AS chunk_id,
        |  CAST(s AS BIGINT) AS start_word,
        |  CAST(len(ws[s+1 : s+64]) AS BIGINT) AS n_words,
        |  md5(array_to_string(ws[s+1 : s+64], ' ')) AS chunk_md5
        |FROM st""".stripMargin,
    // q80: the homogeneous-coordinate trick — xq ++ [1] makes the
    // upper-triangle products carry second moments (i,j<64), first
    // moments (j=64), and the row count (64,64) in one aggregation
    "q80_emb_moments" ->
      """WITH e AS (SELECT list_concat(list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
        |    [CAST(1 AS BIGINT)]) AS xq FROM embeddings),
        |ei AS (SELECT xq, unnest(range(0, 65)) AS i FROM e),
        |eij AS (SELECT xq, i, unnest(range(i, 65)) AS j FROM ei)
        |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |  CAST(sum(xq[i + 1] * xq[j + 1]) AS BIGINT) AS s
        |FROM eij GROUP BY 1, 2""".stripMargin,
    // q81: q46's component closure + per-component argmax(n_chars,
    // tie min doc_id) via the same key-arithmetic arg_min as q78
    "q81_cluster_keeper" ->
      s"""SELECT component,
         |  CAST(arg_min(c.doc_id, (-d.n_chars) * 4294967296 + c.doc_id) AS BIGINT)
         |    AS keeper_id,
         |  CAST(count(*) AS BIGINT) AS n_members,
         |  CAST(sum(d.n_chars) AS BIGINT) AS total_chars
         |FROM ($q46Sql) c JOIN documents d ON c.doc_id = d.doc_id
         |GROUP BY 1""".stripMargin,
    // q83: the rotation is fixture-pinned (DumpPcaFixture — fitExact
    // is bit-deterministic, so the runtime fit reproduces it exactly);
    // the projection algebra (center, multiply, sequential sum over i)
    // is re-derived here in list arithmetic
    "q83_pca_project" ->
      """WITH fx AS (SELECT * FROM read_parquet(
        |  '/root/repo/src/test/resources/fixtures/pca_components.parquet')
        |  WHERE corpus_n = (SELECT count(*) FROM embeddings)),
        |mn AS (SELECT ws FROM fx WHERE c = -1),
        |comp AS (SELECT c, ws FROM fx WHERE c >= 0)
        |SELECT e.vec_id, CAST(comp.c AS BIGINT) AS component,
        |  ROUND(list_sum(list_transform(range(1, 65),
        |    i -> (CAST(e.embedding[i] AS DOUBLE) - mn.ws[i]) * comp.ws[i])), 6) AS y
        |FROM embeddings e, mn, comp""".stripMargin,
    "q82_gopher_rules" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS ws
        |  FROM documents),
        |m AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(ws, x -> len(x))), 0) AS BIGINT)
        |      AS sum_word_len,
        |    CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words
        |  FROM w),
        |wx AS (SELECT doc_id, unnest(ws) AS word FROM w),
        |top AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_word_n FROM
        |  (SELECT doc_id, word, count(*) AS c FROM wx GROUP BY 1, 2) GROUP BY 1),
        |stopn AS (SELECT doc_id, CAST(count(DISTINCT word) AS BIGINT) AS n_stop_distinct
        |  FROM wx WHERE word IN ('the','a','of','and','to','in','is','that')
        |  GROUP BY 1)
        |SELECT m.doc_id, m.n_words, m.sum_word_len, m.n_distinct_words,
        |  coalesce(top.top_word_n, 0) AS top_word_n,
        |  coalesce(stopn.n_stop_distinct, 0) AS n_stop_distinct,
        |  m.n_words BETWEEN 20 AND 100000 AS r_word_count,
        |  (3 * m.n_words <= m.sum_word_len AND m.sum_word_len <= 10 * m.n_words)
        |    AS r_mean_len,
        |  coalesce(stopn.n_stop_distinct, 0) >= 2 AS r_stop,
        |  5 * coalesce(top.top_word_n, 0) <= m.n_words AS r_rep,
        |  (m.n_words BETWEEN 20 AND 100000
        |    AND 3 * m.n_words <= m.sum_word_len AND m.sum_word_len <= 10 * m.n_words
        |    AND coalesce(stopn.n_stop_distinct, 0) >= 2
        |    AND 5 * coalesce(top.top_word_n, 0) <= m.n_words) AS kept
        |FROM m LEFT JOIN top ON m.doc_id = top.doc_id
        |  LEFT JOIN stopn ON m.doc_id = stopn.doc_id""".stripMargin,
    "q51_lag_delta" ->
      """SELECT event_id, user_id,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |    AS prev_value,
        |  value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |    AS value_delta,
        |  CAST(epoch_us(lead(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
        |    - epoch_us(ts) AS BIGINT) AS next_gap_us
        |FROM events""".stripMargin,
    // q46: the q16 pair graph (≥8 shared bigrams per source block)
    // closed transitively with a recursive CTE; component = min
    // reachable id. Matches the engine's large-star/small-star
    // contraction exactly (both compute min-labelled components).
    "q46_dup_clusters" -> q46Sql,
    // q58: virtual position (rn − ½)/weight per stratum; the engine's
    // two-pass global index equals these windows by construction
    "q58_mixture_order" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, source,
        |    (rn - 0.5) / (CASE source WHEN 'src0' THEN 4.0
        |                              WHEN 'src1' THEN 2.0
        |                              ELSE 1.0 END) AS pos
        |  FROM r)
        |SELECT doc_id, source,
        |  CAST(row_number() OVER (ORDER BY pos ASC, source ASC, doc_id ASC) - 1
        |    AS BIGINT) AS train_rank
        |FROM p""".stripMargin,
    // q57: the kept side of q46 — docs that are their own cluster min
    "q57_deduped_corpus" ->
      s"SELECT doc_id FROM ($q46Sql) WHERE component = doc_id",
    "q43_contamination" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |idx AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM words),
        |grams AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] AS shingle FROM idx),
        |bench AS (SELECT * FROM grams WHERE doc_id % 50 = 0),
        |corp AS (SELECT * FROM grams WHERE doc_id % 50 <> 0),
        |sizes AS (SELECT doc_id AS bench_id, count(*) AS bench_n FROM bench GROUP BY 1),
        |pairs AS (
        |  SELECT c.doc_id AS corpus_id, b.doc_id AS bench_id, count(*) AS inter_n
        |  FROM corp c JOIN bench b ON c.shingle = b.shingle
        |  GROUP BY 1, 2 HAVING count(*) >= 4)
        |SELECT corpus_id, bench_id, inter_n, bench_n
        |FROM pairs JOIN sizes USING (bench_id)""".stripMargin,
    // q96: q43's exact formulation at 8-gram order — the oracle is
    // deliberately blind to the Bloom prefilter, so a false-negative-
    // shaped bug in the sketch path (a dropped genuine suspect)
    // hash-fails. 8-gram windows: i ranges to len(ws) - 7.
    "q96_sparse_contamination" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |idx AS (SELECT doc_id, ws, unnest(range(1, len(ws) - 6)) AS i FROM words),
        |grams AS (SELECT DISTINCT doc_id,
        |  ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]||' '||
        |  ws[i+5]||' '||ws[i+6]||' '||ws[i+7] AS shingle FROM idx),
        |bench AS (SELECT * FROM grams WHERE doc_id % 50 = 0),
        |corp AS (SELECT * FROM grams WHERE doc_id % 50 <> 0),
        |sizes AS (SELECT doc_id AS bench_id, count(*) AS bench_n FROM bench GROUP BY 1),
        |pairs AS (
        |  SELECT c.doc_id AS corpus_id, b.doc_id AS bench_id, count(*) AS inter_n
        |  FROM corp c JOIN bench b ON c.shingle = b.shingle
        |  GROUP BY 1, 2 HAVING count(*) >= 4)
        |SELECT corpus_id, bench_id, inter_n, bench_n
        |FROM pairs JOIN sizes USING (bench_id)""".stripMargin,
    "q44_repetition" ->
      """SELECT doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_words,
        |  CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct_words,
        |  CAST(list_max(list_transform(list_distinct(ws),
        |    w -> len(list_filter(ws, x -> x = w)))) AS BIGINT) AS top_word_n,
        |  CAST(list_sum(list_transform(ws, w -> len(w))) AS BIGINT) AS sum_word_len
        |FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)""".stripMargin,
    "q24_deal_decode" ->
      """SELECT activated_at_epoch, miner_id, client_id, piece_cid,
        |  piece_size, term_start_epoch, sector_id, reverted
        |FROM read_parquet('/root/repo/src/test/resources/fixtures/decoded_deals.parquet')""".stripMargin,
    "q25_deal_state_counts" ->
      """WITH deals AS (SELECT * FROM read_parquet('/root/repo/src/test/resources/fixtures/decoded_deals.parquet')),
        |peer AS (SELECT minerId, peerId FROM read_json('/root/repo/src/test/resources/fixtures/minerPeerIds.json')),
        |pay AS (SELECT peerId, pieceCid, payloadCid FROM read_json('/root/repo/src/test/resources/fixtures/payloadCids.json')),
        |resolved AS (
        |  SELECT d.*, y.payloadCid AS found
        |  FROM deals d
        |  LEFT JOIN peer p ON p.minerId = 'f0' || CAST(d.miner_id AS VARCHAR)
        |  LEFT JOIN pay y ON y.peerId = p.peerId AND y.pieceCid = d.piece_cid)
        |SELECT CASE WHEN found IS NOT NULL THEN 'PAYLOAD_CID_RESOLVED'
        |            ELSE 'PAYLOAD_CID_UNRESOLVED' END AS payload_retrievability_state,
        |  count(*) AS count
        |FROM resolved GROUP BY 1""".stripMargin,
    "q26_deal_submittable" ->
      """WITH deals AS (SELECT * FROM read_parquet('/root/repo/src/test/resources/fixtures/decoded_deals.parquet')),
        |peer AS (SELECT minerId, peerId FROM read_json('/root/repo/src/test/resources/fixtures/minerPeerIds.json')),
        |pay AS (SELECT peerId, pieceCid, payloadCid FROM read_json('/root/repo/src/test/resources/fixtures/payloadCids.json')),
        |resolved AS (
        |  SELECT d.*, y.payloadCid AS found
        |  FROM deals d
        |  LEFT JOIN peer p ON p.minerId = 'f0' || CAST(d.miner_id AS VARCHAR)
        |  LEFT JOIN pay y ON y.peerId = p.peerId AND y.pieceCid = d.piece_cid)
        |SELECT 'f0' || CAST(miner_id AS VARCHAR) AS minerId,
        |  'f0' || CAST(client_id AS VARCHAR) AS clientId,
        |  piece_cid AS pieceCid,
        |  CAST(piece_size AS VARCHAR) AS pieceSize,
        |  found AS payloadCid,
        |  CAST(term_start_epoch + term_min AS BIGINT) * 30 + 1598306400 AS expires_at_unix
        |FROM resolved
        |WHERE found IS NOT NULL
        |  AND activated_at_epoch <
        |    CAST(floor((epoch(TIMESTAMP '2025-06-13 00:00:00') - 1598306400) / 30.0) AS INT)
        |  AND CAST(term_start_epoch + term_min AS BIGINT) * 30 + 1598306400 >
        |    epoch(TIMESTAMP '2025-06-15 00:00:00')""".stripMargin,
    "q59_pagerank" -> q59Sql,
    // q60: identical composite string on both sides, then the same
    // portable regex chain (Java regex in Spark, RE2 in DuckDB — the
    // patterns avoid constructs the two dialects disagree on)
    "q60_pii_scrub" ->
      """WITH raw AS (
        |  SELECT event_id,
        |    'user' || user_id || '@example.com ip=10.0.' || (user_id % 256)
        |      || '.' || (event_id % 256) || ' note='
        |      || json_extract_string(props, '$.k') AS s
        |  FROM events)
        |SELECT event_id,
        |  regexp_replace(regexp_replace(regexp_replace(s,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |      '\d{2,}', '<NUM>', 'g') AS scrubbed,
        |  CAST(len(regexp_extract_all(s,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(len(regexp_extract_all(s,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
        |  CAST(len(regexp_extract_all(s, '\d{2,}')) AS BIGINT) AS n_num
        |FROM raw""".stripMargin,
    // q61: BM25 with the engine's exact arithmetic shape; ROUND(,6)
    // absorbs ln()/summation-order ulps
    "q61_bm25" ->
      """WITH words AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |tf AS (SELECT id, word, CAST(count(*) AS BIGINT) AS tf FROM words GROUP BY 1, 2),
        |dfreq AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |lens AS (SELECT doc_id AS id,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS dl
        |  FROM documents),
        |meta AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS tot
        |  FROM lens),
        |t AS (SELECT tf.id, tf.word, tf.tf, dfreq.df FROM tf JOIN dfreq USING (word)
        |  WHERE tf.word IN ('spark', 'hash', 'window')),
        |scored AS (
        |  SELECT t.id,
        |    SUM(ln((meta.n - t.df + 0.5) / (t.df + 0.5) + 1.0)
        |      * (t.tf * (1.2 + 1))
        |      / (t.tf + 1.2 * ((1 - 0.75) + 0.75 * lens.dl
        |          / (CAST(meta.tot AS DOUBLE) / meta.n)))) AS score,
        |    CAST(count(*) AS BIGINT) AS n_terms_hit
        |  FROM t JOIN lens ON t.id = lens.id CROSS JOIN meta
        |  GROUP BY t.id)
        |SELECT id AS doc_id, n_terms_hit, ROUND(score, 6) AS score FROM scored""".stripMargin,
    "q62_csv_dim" ->
      """WITH dim AS (SELECT source, weight, active FROM
        |  read_csv('/root/repo/src/test/resources/fixtures/source_weights.csv',
        |    header = true)),
        |d AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY source)
        |SELECT d.source, d.n_docs, dim.weight, d.n_docs * dim.weight AS weighted_docs
        |FROM d JOIN dim ON d.source = dim.source WHERE dim.active""".stripMargin,
    "q39_sliding_window" ->
      """WITH starts AS (
        |  SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start,
        |         value FROM events
        |  UNION ALL
        |  SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) - 3600 AS window_start,
        |         value FROM events)
        |SELECT window_start, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM starts GROUP BY window_start""".stripMargin,
    // q63: BPE encoding itself is not SQL-expressible, but it IS a pure
    // deterministic function of the corpus — the per-WORD token counts
    // under the trained merges live in a committed fixture (regenerate:
    // `sbt "Test/runMain graft.pipeline.DumpBpeFixture"` after any
    // Bpe/merge-budget change), and the per-DOC aggregation is
    // re-derived here in ANSI SQL: split text, join the word table,
    // sum. Left join + COALESCE keeps empty-text docs at 0/0, matching
    // the engine's size(enc(text)) = 0 convention.
    "q63_bpe_tokens" ->
      """WITH words AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
        |  WHERE length(w) > 0),
        |wt AS (SELECT * FROM read_parquet(
        |  '/root/repo/src/test/resources/fixtures/bpe_word_tokens.parquet')
        |  WHERE corpus_n = (SELECT count(*) FROM documents)),
        |agg AS (
        |  SELECT words.doc_id, sum(wt.n_tokens) AS n_bpe, count(*) AS n_ws
        |  FROM words JOIN wt ON words.w = wt.word GROUP BY words.doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(agg.n_bpe, 0) AS BIGINT) AS n_bpe_tokens,
        |  CAST(COALESCE(agg.n_ws, 0) AS BIGINT) AS n_ws_tokens
        |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin,
    // q64: the LBFGS fit is fixture-pinned (DumpQualityFixture —
    // regenerate on any QualityClassifier/label/vocab change); the
    // SCORING is re-derived here: same join + occurrence-sum + sigmoid
    // arithmetic shape as the Spark side, ROUND(,6) on both sides
    // (summation order differs, exp amplifies nothing at 6 dp). The
    // __INTERCEPT__ sentinel row is filtered OUT of the join side —
    // the engine never joins it as a word, so a document containing
    // the literal token must not pick up the intercept twice.
    "q64_quality_score" ->
      """WITH wtall AS (SELECT * FROM read_parquet(
        |  '/root/repo/src/test/resources/fixtures/quality_weights.parquet')
        |  WHERE corpus_n = (SELECT count(*) FROM documents)),
        |wt AS (SELECT * FROM wtall WHERE word <> '__INTERCEPT__'),
        |words AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
        |  WHERE length(w) > 0),
        |z AS (
        |  SELECT words.doc_id, sum(wt.weight) AS z
        |  FROM words JOIN wt ON words.w = wt.word GROUP BY words.doc_id)
        |SELECT d.doc_id,
        |  ROUND(1.0 / (1.0 + exp(-(COALESCE(z.z, 0) +
        |    (SELECT weight FROM wtall WHERE word = '__INTERCEPT__')))), 6) AS quality
        |FROM documents d LEFT JOIN z ON d.doc_id = z.doc_id""".stripMargin,
    // q66: same stride-1 md5-window + first-occurrence + islands-merge
    // recurrence as the engine (md5 over identical window text is
    // engine-portable; DuckDB list slice is 1-based inclusive, range()
    // end-exclusive)
    "q66_exact_substr" ->
      s"""$substrSpanCtes
        |SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
        |  CAST(max(p) + 9 AS BIGINT) AS span_end, count(*) AS n_windows
        |FROM g GROUP BY doc_id, grp""".stripMargin,
    // q68: q66's spans (shared CTE chain — the generator and the apply
    // cannot drift) cut out of the text: kept tokens = positions no
    // span covers, rejoined with single spaces; per-doc spans are
    // disjoint by construction (islands merge), so the anti range-join
    // cannot duplicate a token row
    "q68_clean_corpus" ->
      s"""$substrSpanCtes,
        |spans AS (SELECT doc_id, min(p) AS s, max(p) + 9 AS e
        |          FROM g GROUP BY doc_id, grp),
        |tok AS (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS p FROM toks),
        |kept AS (
        |  SELECT t.doc_id, t.p, t.ws[t.p] AS w
        |  FROM tok t LEFT JOIN spans s
        |    ON s.doc_id = t.doc_id AND t.p BETWEEN s.s AND s.e
        |  WHERE s.doc_id IS NULL),
        |clean AS (
        |  SELECT doc_id, array_to_string(list(w ORDER BY p), ' ') AS ct,
        |    count(*) AS n_kept
        |  FROM kept GROUP BY doc_id)
        |SELECT t.doc_id,
        |  COALESCE(c.ct, '') AS clean_text,
        |  CAST(len(t.ws) - COALESCE(c.n_kept, 0) AS BIGINT) AS n_removed
        |FROM toks t LEFT JOIN clean c USING (doc_id)""".stripMargin,
    // q67: self-contained oracle (no fixture) — the unigram MLE model
    // IS SQL. Same arithmetic shape: c::DOUBLE / total, -ln, avg,
    // ROUND(,6) both sides (summation order differs; ln is natural
    // log in DuckDB)
    "q67_unigram_ppl" ->
      """WITH words AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
        |  WHERE length(w) > 0),
        |model AS (SELECT w AS word, count(*) AS c FROM words GROUP BY 1),
        |tot AS (SELECT sum(c) AS total FROM model)
        |SELECT words.doc_id, count(*) AS n_tokens,
        |  ROUND(avg(-ln(CAST(model.c AS DOUBLE) / (SELECT total FROM tot))), 6) AS logppl
        |FROM words JOIN model ON words.w = model.word
        |GROUP BY words.doc_id""".stripMargin,
    // q87: width-16 token-length buckets per lang; tokenCount restated
    // as the same space-counting arithmetic; cumulative docs via a
    // window over the tiny aggregate
    "q87_len_histogram" ->
      """WITH t AS (SELECT lang,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n
        |  FROM documents),
        |b AS (SELECT lang, n - n % 16 AS bucket_lo,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n) AS BIGINT) AS sum_tokens
        |  FROM t GROUP BY 1, 2)
        |SELECT lang, bucket_lo, n_docs, sum_tokens,
        |  CAST(sum(n_docs) OVER (PARTITION BY lang ORDER BY bucket_lo) AS BIGINT)
        |    AS cum_docs
        |FROM b""".stripMargin,
    // q88: source-pair distinct-bigram overlap — the q16 gram CTE
    // collapsed to (source, shingle); engine-side xxhash64 keys vs
    // string shingles here give identical COUNTS (the q16 equivalence)
    "q88_source_overlap" ->
      """WITH words AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
        |idx AS (SELECT source, ws, unnest(range(1, len(ws))) AS i FROM words),
        |grams AS (SELECT DISTINCT source, ws[i] || ' ' || ws[i+1] AS shingle FROM idx),
        |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS set_n
        |  FROM grams GROUP BY 1),
        |inter AS (SELECT a.source AS s1, b.source AS s2,
        |    CAST(count(*) AS BIGINT) AS inter_n
        |  FROM grams a JOIN grams b
        |    ON a.shingle = b.shingle AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT s1, s2, inter_n, x.set_n + y.set_n - inter_n AS union_n
        |FROM inter JOIN sizes x ON s1 = x.source JOIN sizes y ON s2 = y.source""".stripMargin,
    // q89: OOV occurrences vs the top-16 vocabulary (count desc, word
    // asc — deterministic); left join marks in-vocab tokens
    "q89_oov_rate" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |vocab AS (SELECT tok AS vw FROM (
        |  SELECT tok, count(*) AS n FROM toks GROUP BY tok
        |  ORDER BY n DESC, tok ASC LIMIT 16))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN vw IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        |FROM toks LEFT JOIN vocab ON tok = vw
        |GROUP BY doc_id""".stripMargin,
    // q90: the q76 SimHash chain (shared verbatim) as candidates, then
    // Levenshtein-verified at <= 16 — classic edit distance, identical
    // in both engines on this ASCII corpus
    "q90_lev_neardup" ->
      s"""WITH $simhashCtes,
        |cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
        |    CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
        |  FROM s64 a JOIN s64 b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.sim, b.sim)) <= 3)
        |SELECT id1, id2, hamming,
        |  CAST(levenshtein(d1.text, d2.text) AS BIGINT) AS lev
        |FROM cand
        |JOIN documents d1 ON id1 = d1.doc_id
        |JOIN documents d2 ON id2 = d2.doc_id
        |WHERE levenshtein(d1.text, d2.text) <= 16""".stripMargin,
    // q91: q15's keeper election on the first-8-token prefix key;
    // list_slice/array_to_string restate Spark's slice/concat_ws
    "q91_prefix_dedup" ->
      """SELECT md5(array_to_string(
        |    list_slice(string_split(text, ' '), 1, 8), ' ')) AS prefix_md5,
        |  min(doc_id) AS rep_id, CAST(count(*) AS BIGINT) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    // q92: full-outer delta between the two synthetic corpus versions
    // (old drops id%13=5; new drops id%17=3 and rewrites id%11=0)
    "q92_corpus_delta" ->
      """WITH o AS (SELECT doc_id, md5(text) AS h FROM documents
        |  WHERE doc_id % 13 <> 5),
        |n AS (SELECT doc_id,
        |    md5(CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END) AS h
        |  FROM documents WHERE doc_id % 17 <> 3)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.h <> n.h THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin,
    // q93: the UNSALTED group-by — salting must reshape only the plan.
    // round(value*100) on positive doubles: identical grid both engines
    "q93_salted_sum" ->
      """SELECT event_type,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    // q94: the plain join — the salted inner join is salt-invariant
    "q94_salted_join" ->
      """WITH d AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_user_events
        |  FROM events GROUP BY 1)
        |SELECT event_id, events.user_id, n_user_events
        |FROM events JOIN d USING (user_id)""".stripMargin,
    // q95: the oracle is the BATCH transitive closure over the whole
    // SimHash pair set (q76 chain + q86's recursion shape) — the
    // incremental half-then-update path must converge to it exactly
    "q95_incremental_cc" -> simhashClosureSql,
    // q97 shares q95's oracle VERBATIM: the store-backed clusterStep
    // accretion and the in-memory incremental fold must both land on
    // the transitive closure over all Hamming ≤ 3 pairs — one SQL
    // string so the two gates cannot drift
    "q97_cluster_store" -> simhashClosureSql,
    // q98: the engine synthesizes REAL container bytes per doc id
    // (MediaSynth: BMP / PCM16 WAV / MJPEG-shaped AVI) and recovers
    // every column through the real codec walks; the oracle restates
    // the synthesis arithmetic from doc_id alone — dims, frame clock
    // (40 ms × nf), WAV duration floor(n·1000/8000), window count
    // ceil(n/4), Σ|s| = n·mag (alternating ±mag samples), demuxed
    // frame-byte totals, and exact container sizes (54+w·h BMP,
    // 44+2n WAV, 100+nf·(8+L) AVI; all chunks even → pad-free)
    "q98_multimodal_meta" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CASE doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'wav' ELSE 'avi' END AS fmt,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 1 + doc_id % 31 WHEN 1 THEN 0
        |    ELSE 16 + doc_id % 9 END AS INT) AS width,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 1 + doc_id % 17 WHEN 1 THEN 0
        |    ELSE 9 + doc_id % 7 END AS INT) AS height,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 0
        |    WHEN 1 THEN ((8 + doc_id % 33) * 1000) // 8000
        |    ELSE 40 * (1 + doc_id % 5) END AS BIGINT) AS duration_ms,
        |  CAST(CASE doc_id % 3 WHEN 1 THEN 8000 ELSE 0 END AS INT) AS sample_rate,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 0
        |    WHEN 1 THEN (8 + doc_id % 33 + 3) // 4
        |    ELSE 1 + doc_id % 5 END AS BIGINT) AS n_units,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 0
        |    WHEN 1 THEN (8 + doc_id % 33) * (50 + doc_id % 50)
        |    ELSE (1 + doc_id % 5) * (64 + 2 * (doc_id % 32)) END AS BIGINT) AS payload,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 54 + (1 + doc_id % 31) * (1 + doc_id % 17)
        |    WHEN 1 THEN 44 + 2 * (8 + doc_id % 33)
        |    ELSE 100 + (1 + doc_id % 5) * (72 + 2 * (doc_id % 32)) END AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,
    // q99: the second container trio (MediaSynth.extAssetFor: baseline
    // JFIF JPEG / ISO-BMFF MP4 with explicit stsz/stco/stsc tables /
    // Matroska-EBML with one Xiph-laced SimpleBlock), recovered via the
    // JPEG marker scan, the MP4 chunk walk, and the MKV lacing demux.
    // Arithmetic (Round13OpsSpec asserts the writers): frame f of nf is
    // L+2f bytes → Σ = nf·L + nf·(nf−1); byte totals 45+n JPEG,
    // 196+4·nf+Σ MP4, 78+nf+Σ MKV; frame clock 40 ms both videos
    "q99_multimodal_ext" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' ELSE 'video' END AS kind,
        |  CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'isom' ELSE 'matroska' END AS fmt,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 8 + doc_id % 63 WHEN 1 THEN 0
        |    ELSE 16 + doc_id % 9 END AS INT) AS width,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 8 + doc_id % 47 WHEN 1 THEN 0
        |    ELSE 9 + doc_id % 7 END AS INT) AS height,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 0
        |    WHEN 1 THEN 40 * (1 + doc_id % 5)
        |    ELSE 40 * (1 + doc_id % 4) END AS BIGINT) AS duration_ms,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 0
        |    WHEN 1 THEN 1 + doc_id % 5
        |    ELSE 1 + doc_id % 4 END AS BIGINT) AS n_units,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 0
        |    WHEN 1 THEN (1 + doc_id % 5) * (32 + 2 * (doc_id % 20)) + (1 + doc_id % 5) * (doc_id % 5)
        |    ELSE (1 + doc_id % 4) * (24 + 2 * (doc_id % 40)) + (1 + doc_id % 4) * (doc_id % 4)
        |    END AS BIGINT) AS payload,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 45 + 10 + doc_id % 40
        |    WHEN 1 THEN 196 + 4 * (1 + doc_id % 5)
        |      + (1 + doc_id % 5) * (32 + 2 * (doc_id % 20)) + (1 + doc_id % 5) * (doc_id % 5)
        |    ELSE 78 + (1 + doc_id % 4)
        |      + (1 + doc_id % 4) * (24 + 2 * (doc_id % 40)) + (1 + doc_id % 4) * (doc_id % 4)
        |    END AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,
    // q100: the third trio (MediaSynth.imgAssetFor: real-CRC PNG /
    // GIF89a / WebP-VP8L) closes ImageCodecs' last spec-only parsers;
    // byte totals 57+n PNG, 18+n GIF, 25+n WebP (Round13OpsSpec
    // asserts the writers)
    "q100_multimodal_img" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif' ELSE 'webp' END AS fmt,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 1 + doc_id % 50 WHEN 1 THEN 1 + doc_id % 30
        |    ELSE 1 + doc_id % 20 END AS INT) AS width,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 1 + doc_id % 40 WHEN 1 THEN 1 + doc_id % 25
        |    ELSE 1 + doc_id % 15 END AS INT) AS height,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 57 + 8 + doc_id % 32
        |    WHEN 1 THEN 18 + 4 + doc_id % 16
        |    ELSE 25 + 7 + 2 * (doc_id % 12) END AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,
    // q110: baseline TIFF in BOTH byte orders (MediaSynth.tiffAssetFor:
    // II by even id / MM by odd), recovered via the real IFD walk
    // (ImageCodecs.decodeTiff). Arithmetic: w = 1+id%60, h = 1+id%45,
    // n_bytes = 74 + id%24 (8 header + 2 count + 5 entries x 12 + 4
    // next-IFD + pad)
    "q110_multimodal_tiff" ->
      """SELECT doc_id, 'tiff' AS fmt,
        |  CAST(1 + doc_id % 60 AS INT) AS width,
        |  CAST(1 + doc_id % 45 AS INT) AS height,
        |  CAST(74 + doc_id % 24 AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,
    // q111: AVIF/HEIC still images (MediaSynth.avifAssetFor: brand by
    // id parity), recovered via the meta->iprp->ipco->ispe box-spine
    // walk (ImageCodecs.decodeAvif). Arithmetic: w = 1+id%64,
    // h = 1+id%48, n_bytes = 113 + id%20 (ftyp 24 + meta 81 + mdat
    // 8+pad)
    "q111_multimodal_avif" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'avif' ELSE 'heic' END AS fmt,
        |  CAST(1 + doc_id % 64 AS INT) AS width,
        |  CAST(1 + doc_id % 48 AS INT) AS height,
        |  CAST(113 + doc_id % 20 AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,
    // q103: the AUDIO trio beyond WAV (MediaSynth.audioAssetFor: MPEG-1
    // Layer III with an ID3v2 tag / FLAC with STREAMINFO + PADDING
    // blocks), recovered via the frame-header sync walk over the
    // published bitrate/samplerate tables and the metadata-block walk.
    // Arithmetic: MP3 frameLen = 144·kbps·1000/sr (integer), duration =
    // frames·1152·1000/sr, bytes = 10 + tag + nf·frameLen; FLAC
    // duration = samples·1000/sr, bytes = 46 + pad + audio =
    // 66 + id%10 + id%64
    "q103_multimodal_audio" ->
      """WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
        |mp3 AS (
        |  SELECT id, CAST(1 + (id // 2) % 2 AS BIGINT) AS channels,
        |    CAST(([44100,48000,32000])[CAST(id % 3 AS INT) + 1] AS BIGINT) AS sr,
        |    CAST(1 + id % 5 AS BIGINT) AS nf,
        |    CAST(([32,40,48,56,64,80,96,112,128,160,192,224,256,320])[CAST(id % 14 AS INT) + 1]
        |      AS BIGINT) AS kbps
        |  FROM ids WHERE id % 2 = 0)
        |SELECT id AS doc_id, 'mp3' AS fmt, channels, sr AS sample_rate,
        |  nf AS n_units,
        |  nf * 1152 * 1000 // sr AS duration_ms,
        |  10 + id % 17 + nf * (144 * kbps * 1000 // sr) AS n_bytes
        |FROM mp3
        |UNION ALL
        |SELECT id AS doc_id, 'flac' AS fmt,
        |  CAST(1 + (id // 2) % 2 AS BIGINT) AS channels,
        |  CAST(8000 + 100 * (id % 40) AS BIGINT) AS sample_rate,
        |  CAST(1000 + id % 5000 AS BIGINT) AS n_units,
        |  (1000 + id % 5000) * 1000 // (8000 + 100 * (id % 40)) AS duration_ms,
        |  CAST(66 + id % 10 + id % 64 AS BIGINT) AS n_bytes
        |FROM ids WHERE id % 2 = 1"""
      .stripMargin,
    // q105: the OGG container pair (MediaSynth.oggAssetFor: RFC 3533
    // pages with REAL page CRCs carrying a Vorbis I id header / an
    // RFC 7845 OpusHead + OpusTags), recovered via the page walk +
    // first-packet codec dispatch + last-page granule. Arithmetic:
    // Vorbis n_units = totalSamples (the granule), duration =
    // samples·1000//sr, bytes = 86 + payload = 106 + id%50; Opus
    // n_units = preSkip + 48·durMs (the 48 kHz granule), duration =
    // durMs exactly, bytes = 123 + payload = 139 + id%40
    "q105_multimodal_ogg" ->
      """WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents)
        |SELECT id AS doc_id, 'vorbis' AS fmt,
        |  CAST(1 + (id // 2) % 2 AS BIGINT) AS channels,
        |  CAST(8000 + 100 * (id % 40) AS BIGINT) AS sample_rate,
        |  CAST(2000 + id % 3000 AS BIGINT) AS n_units,
        |  (2000 + id % 3000) * 1000 // (8000 + 100 * (id % 40)) AS duration_ms,
        |  CAST(106 + id % 50 AS BIGINT) AS n_bytes
        |FROM ids WHERE id % 2 = 0
        |UNION ALL
        |SELECT id AS doc_id, 'opus' AS fmt,
        |  CAST(1 + (id // 2) % 2 AS BIGINT) AS channels,
        |  CAST(([8000,12000,16000,24000,48000])[CAST(id % 5 AS INT) + 1] AS BIGINT)
        |    AS sample_rate,
        |  CAST(312 + id % 100 + 48 * (10 + id % 200) AS BIGINT) AS n_units,
        |  CAST(10 + id % 200 AS BIGINT) AS duration_ms,
        |  CAST(139 + id % 40 AS BIGINT) AS n_bytes
        |FROM ids WHERE id % 2 = 1"""
      .stripMargin,
    // q106: the M4A/AAC container (MediaSynth.m4aAssetFor: ISO-BMFF
    // q115 (round 17): hybrid RRF — BM25 leg (the q61 SQL, rounded to
    // 6 places before ranking), vector leg (cosine vs vec 0 over the
    // doc-embedding join), both rank-windowed with id tie-breaks, fused
    // as 1/(60+r) + 1/(60+r), top 20
    "q115_hybrid_rrf" ->
      """WITH words AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |tf AS (SELECT id, word, CAST(count(*) AS BIGINT) AS tf FROM words GROUP BY 1, 2),
        |dfreq AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |lens AS (SELECT doc_id AS id,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS dl
        |  FROM documents),
        |meta AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS tot
        |  FROM lens),
        |t AS (SELECT tf.id, tf.word, tf.tf, dfreq.df FROM tf JOIN dfreq USING (word)
        |  WHERE tf.word IN ('spark', 'hash', 'window')),
        |scored AS (
        |  SELECT t.id,
        |    ROUND(SUM(ln((meta.n - t.df + 0.5) / (t.df + 0.5) + 1.0)
        |      * (t.tf * (1.2 + 1))
        |      / (t.tf + 1.2 * ((1 - 0.75) + 0.75 * lens.dl
        |          / (CAST(meta.tot AS DOUBLE) / meta.n)))), 6) AS ls
        |  FROM t JOIN lens ON t.id = lens.id CROSS JOIN meta
        |  GROUP BY t.id),
        |lex AS (SELECT id AS doc_id,
        |  row_number() OVER (ORDER BY ls DESC, id ASC) AS lex_rank FROM scored),
        |qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
        |vecs AS (SELECT d.doc_id,
        |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |      CAST(qv.q AS DOUBLE[])) AS cs
        |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id, qv),
        |vec AS (SELECT doc_id,
        |  row_number() OVER (ORDER BY cs DESC, doc_id ASC) AS vec_rank FROM vecs),
        |fused AS (
        |  SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
        |    lex.lex_rank, vec.vec_rank,
        |    COALESCE(1.0 / (60 + lex.lex_rank), 0.0)
        |      + COALESCE(1.0 / (60 + vec.vec_rank), 0.0) AS rrf
        |  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
        |SELECT doc_id, COALESCE(lex_rank, -1) AS lex_rank,
        |  COALESCE(vec_rank, -1) AS vec_rank, ROUND(rrf, 6) AS rrf, rank
        |FROM (SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rank
        |      FROM fused)
        |WHERE rank <= 20""".stripMargin,
    // q116 (round 17): MMR selection-sequence oracle — the five greedy
    // steps UNROLLED as chained CTEs (the q59 PageRank idiom) over the
    // exact top-20 shortlist and its pairwise-sim relation; every
    // argmax is a rank-1 window with the id tie-break
    "q116_mmr_rerank" ->
      s"""WITH $plantedCtes,
        |s AS (SELECT pq.qid, c.vec_id AS nid, c.embedding AS emb,
        |        list_cosine_similarity(CAST(pq.qv AS DOUBLE[]),
        |          CAST(c.embedding AS DOUBLE[])) AS rel
        |      FROM pcorpus c, pq WHERE c.vec_id <> pq.qid),
        |cand AS (SELECT qid, nid, emb, rel FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid ASC) AS rn
        |  FROM s) WHERE rn <= 20),
        |sims AS (SELECT a.qid, a.nid AS an, b.nid AS bn,
        |    list_cosine_similarity(CAST(a.emb AS DOUBLE[]),
        |      CAST(b.emb AS DOUBLE[])) AS sim
        |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.nid <> b.nid),
        |p1 AS (SELECT qid, nid AS s1 FROM (
        |  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid ASC) AS rn
        |  FROM cand) WHERE rn = 1),
        |sc2 AS (SELECT c.qid, p1.s1, c.nid,
        |    0.5 * c.rel - 0.5 * x1.sim AS score
        |  FROM cand c JOIN p1 ON c.qid = p1.qid AND c.nid <> p1.s1
        |   JOIN sims x1 ON x1.qid = c.qid AND x1.an = c.nid AND x1.bn = p1.s1),
        |p2 AS (SELECT qid, s1, nid AS s2 FROM (
        |  SELECT qid, s1, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rn
        |  FROM sc2) WHERE rn = 1),
        |sc3 AS (SELECT c.qid, p2.s1, p2.s2, c.nid,
        |    0.5 * c.rel - 0.5 * greatest(x1.sim, x2.sim) AS score
        |  FROM cand c JOIN p2 ON c.qid = p2.qid AND c.nid <> p2.s1 AND c.nid <> p2.s2
        |   JOIN sims x1 ON x1.qid = c.qid AND x1.an = c.nid AND x1.bn = p2.s1
        |   JOIN sims x2 ON x2.qid = c.qid AND x2.an = c.nid AND x2.bn = p2.s2),
        |p3 AS (SELECT qid, s1, s2, nid AS s3 FROM (
        |  SELECT qid, s1, s2, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rn
        |  FROM sc3) WHERE rn = 1),
        |sc4 AS (SELECT c.qid, p3.s1, p3.s2, p3.s3, c.nid,
        |    0.5 * c.rel - 0.5 * greatest(x1.sim, x2.sim, x3.sim) AS score
        |  FROM cand c JOIN p3 ON c.qid = p3.qid AND c.nid <> p3.s1 AND c.nid <> p3.s2 AND c.nid <> p3.s3
        |   JOIN sims x1 ON x1.qid = c.qid AND x1.an = c.nid AND x1.bn = p3.s1
        |   JOIN sims x2 ON x2.qid = c.qid AND x2.an = c.nid AND x2.bn = p3.s2
        |   JOIN sims x3 ON x3.qid = c.qid AND x3.an = c.nid AND x3.bn = p3.s3),
        |p4 AS (SELECT qid, s1, s2, s3, nid AS s4 FROM (
        |  SELECT qid, s1, s2, s3, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rn
        |  FROM sc4) WHERE rn = 1),
        |sc5 AS (SELECT c.qid, p4.s1, p4.s2, p4.s3, p4.s4, c.nid,
        |    0.5 * c.rel - 0.5 * greatest(x1.sim, x2.sim, x3.sim, x4.sim) AS score
        |  FROM cand c JOIN p4 ON c.qid = p4.qid AND c.nid <> p4.s1 AND c.nid <> p4.s2 AND c.nid <> p4.s3 AND c.nid <> p4.s4
        |   JOIN sims x1 ON x1.qid = c.qid AND x1.an = c.nid AND x1.bn = p4.s1
        |   JOIN sims x2 ON x2.qid = c.qid AND x2.an = c.nid AND x2.bn = p4.s2
        |   JOIN sims x3 ON x3.qid = c.qid AND x3.an = c.nid AND x3.bn = p4.s3
        |   JOIN sims x4 ON x4.qid = c.qid AND x4.an = c.nid AND x4.bn = p4.s4),
        |p5 AS (SELECT qid, s1, s2, s3, s4, nid AS s5 FROM (
        |  SELECT qid, s1, s2, s3, s4, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid ASC) AS rn
        |  FROM sc5) WHERE rn = 1)
        |SELECT qid AS query_id, s1 AS neighbor_id, CAST(1 AS BIGINT) AS mmr_rank FROM p5
        |UNION ALL SELECT qid AS query_id, s2 AS neighbor_id, CAST(2 AS BIGINT) AS mmr_rank FROM p5
        |UNION ALL SELECT qid AS query_id, s3 AS neighbor_id, CAST(3 AS BIGINT) AS mmr_rank FROM p5
        |UNION ALL SELECT qid AS query_id, s4 AS neighbor_id, CAST(4 AS BIGINT) AS mmr_rank FROM p5
        |UNION ALL SELECT qid AS query_id, s5 AS neighbor_id, CAST(5 AS BIGINT) AS mmr_rank FROM p5""".stripMargin,
    // q117 (round 17): the store-as-corpus read — the latest corpus
    // (q112's churned CTEs) minus the tombstoned id, doubled across
    // both store states; vector values compared through the first
    // component (the plantedCtes float discipline)
    "q117_store_corpus" ->
      s"""WITH $plantedCtes,
        |churned AS (
        |  SELECT 1099511627776 + pq.qid * 5 + c AS vec_id,
        |    list_transform(range(1, len(qv) + 1), i ->
        |      CAST(CAST(0.5 AS DOUBLE) * CAST(qv[i] AS DOUBLE)
        |         + CAST(0.5 AS DOUBLE) * CAST(uv[i] AS DOUBLE) AS FLOAT)) AS embedding
        |  FROM pq JOIN pu USING (qid), (SELECT unnest(range(1, 3)) AS c) cs),
        |latest AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL SELECT vec_id, embedding FROM planted
        |    WHERE (vec_id - 1099511627776) % 5 NOT IN (1, 2)
        |  UNION ALL SELECT vec_id, embedding FROM churned),
        |live AS (SELECT vec_id,
        |    ROUND(CAST(embedding[1] AS DOUBLE), 6) AS c1
        |  FROM latest WHERE vec_id <> 1099511627779)
        |SELECT vec_id, c1, state
        |FROM live, (SELECT unnest(['pre', 'post']) AS state) st""".stripMargin,
    // q114 (round 17): AIFF/AIFF-C — the big-endian IFF mirror of WAV;
    // COMM fields + the 80-bit extended-float sample rate recovered
    // only by the real chunk walk. Arithmetic: sr table by id%5,
    // channels = 1+id%2, n_units = 1000+id%9000 sample frames,
    // duration = n_units·1000//sr, bytes = 54 + n_units·channels·2
    "q114_multimodal_aiff" ->
      """WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents)
        |SELECT id AS doc_id, 'aiff' AS fmt,
        |  CAST(1 + id % 2 AS BIGINT) AS channels,
        |  CAST(CASE id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 11025 WHEN 2 THEN 16000
        |       WHEN 3 THEN 22050 ELSE 44100 END AS BIGINT) AS sample_rate,
        |  CAST(1000 + id % 9000 AS BIGINT) AS n_units,
        |  (1000 + id % 9000) * 1000 // (CASE id % 5 WHEN 0 THEN 8000 WHEN 1 THEN 11025
        |    WHEN 2 THEN 16000 WHEN 3 THEN 22050 ELSE 44100 END) AS duration_ms,
        |  CAST(54 + (1000 + id % 9000) * (1 + id % 2) * 2 AS BIGINT) AS n_bytes
        |FROM ids""".stripMargin,
    // ftyp/moov/trak/mdia with a real esds descriptor chain), recovered
    // via the box walk's soun-hdlr dispatch + mp4a sample entry + mdhd
    // sample clock. Arithmetic: sr table by id%5, channels =
    // 1+(id//2)%2, n_units = 4000+id%9000 (mdhd duration at timescale
    // sr), duration = n_units·1000//sr, bytes = 332 + id%32 (ftyp 20 +
    // moov 304 + mdat 8+pad)
    "q106_multimodal_m4a" ->
      """WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents)
        |SELECT id AS doc_id, 'm4a' AS fmt,
        |  CAST(1 + (id // 2) % 2 AS BIGINT) AS channels,
        |  CAST(([48000,44100,32000,16000,8000])[CAST(id % 5 AS INT) + 1] AS BIGINT)
        |    AS sample_rate,
        |  CAST(4000 + id % 9000 AS BIGINT) AS n_units,
        |  (4000 + id % 9000) * 1000 //
        |    ([48000,44100,32000,16000,8000])[CAST(id % 5 AS INT) + 1] AS duration_ms,
        |  CAST(332 + id % 32 AS BIGINT) AS n_bytes
        |FROM ids"""
      .stripMargin,
    // q107: raw ADTS-AAC transport streams (MediaSynth.adtsAssetFor),
    // recovered via the 0xFFF-sync frame-length walk
    // (AudioCodecs.decodeAdts). Arithmetic: sr table by id%5, channels
    // = 1+(id//2)%2, frames = 20+id%80 (one 1024-sample raw data block
    // each), payload = 5+id%20, header = 9 when id%3=0 (CRC form) else
    // 7 → n_bytes = frames·(header+payload)
    "q107_multimodal_adts" ->
      """WITH ids AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents)
        |SELECT id AS doc_id, 'aac' AS fmt,
        |  CAST(1 + (id // 2) % 2 AS BIGINT) AS channels,
        |  CAST(([48000,44100,32000,16000,8000])[CAST(id % 5 AS INT) + 1] AS BIGINT)
        |    AS sample_rate,
        |  CAST((20 + id % 80) * 1024 AS BIGINT) AS n_units,
        |  (20 + id % 80) * 1024 * 1000 //
        |    ([48000,44100,32000,16000,8000])[CAST(id % 5 AS INT) + 1] AS duration_ms,
        |  CAST((20 + id % 80) *
        |    (CASE WHEN id % 3 = 0 THEN 9 ELSE 7 END + 5 + id % 20) AS BIGINT)
        |    AS n_bytes
        |FROM ids"""
      .stripMargin
  )

  private lazy val simhashClosureSql: String =
    s"""WITH RECURSIVE $simhashCtes,
      |sp AS (SELECT a.doc_id AS id1, b.doc_id AS id2 FROM s64 a JOIN s64 b
      |  ON a.doc_id < b.doc_id WHERE bit_count(xor(a.sim, b.sim)) <= 3),
      |edges AS (SELECT id1 AS a, id2 AS b FROM sp UNION SELECT id2, id1 FROM sp),
      |reach AS (SELECT doc_id AS a, doc_id AS b FROM documents
      |  UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
      |SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a""".stripMargin
}
