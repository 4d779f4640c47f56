"""Regenerate PLANS.md: formatted physical plans of headline queries
with the scale-relevant properties annotated."""

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from kafka_spark_streaming_app_spark import registry
from kafka_spark_streaming_app_spark.session import get_spark

NOTES = {
    "windowed_agg_approx": "Production flagship. One Exchange (partial+final hash agg); HLL++ keeps distinct-user state O(kB)/group.",
    "q1_pricing_summary": "Scan-bound: shipdate filter in PushedFilters, ReadSchema pruned to 7 columns, partial+final agg.",
    "q3_shipping_priority": "Dims broadcast (no fact shuffle for the join), top-10 via TakeOrderedAndProject (no global sort).",
    "q5_supplier_nation_revenue": "Fact-fact shuffle join (lineitem-orders) + broadcast dim chain.",
    "dedup_minhash_lsh": "Signatures partial-aggregate map-side (shuffle = 1 row/doc); band self-join shuffles signatures, not documents; Jaccard verify on candidates only.",
    "similarity_ann_srp_lsh": "Bucket equi-join replaces the cross join; query side broadcast.",
    "sessionize_users": "session_window merge inside a single keyed aggregation.",
    "fraud_alerts": "Stateless scan-stage filter+classify, zero shuffle, unused columns pruned.",
    "q7_nation_volume_shipping": "Nation broadcast into both dim sides BEFORE the fact joins; single lineitem-orders shuffle; pair disjunction post-join.",
    "q21_waiting_suppliers": "EXISTS/NOT-EXISTS rewritten to ONE lineitem scan: per-supplier agg + order-partitioned window share the orderkey exchange.",
    "q17_small_quantity_revenue": "Brand semi-join BEFORE the per-part average; window-over-slice avoids the agg-then-join-back second scan.",
    "chunk_documents": "Row-local bounded explode, zero shuffle — chunking is a pure scan projection.",
    "dedup_clusters": "Per-superstep join+agg on the edge list; labels localCheckpoint'ed to cut iterative lineage.",
    "repetition_metrics": "ONE corpus scan; doc-level token stats ride the groupBy keys, so there is no join back (partial+final agg twice on the same doc key).",
    "contamination_check": "Gram sets meet on the 60-bit hash; benchmark gram table is the build side (AQE broadcast here, shuffle at adversarial scale).",
    "dedup_incremental": "Exact-hash semi-join kills cheap dups before the fuzzy stage; LSH candidates filtered to cross pairs so verify cost tracks the NEW batch only.",
    "line_dedup_clean": "Line explode -> hot-line count on the 64-bit hash -> equi-join back -> per-doc reassembly; barrier stops the explode re-expanding per branch.",
    "global_shuffle_shards": "Two-level prefix sum: range partition by hash key, per-partition rank, one-row-per-partition offset window — no single-task global sort.",
    "quality_classifier": "Zero-shuffle codegen scan projection — features and the linear logit fuse into one stage.",
    "similarity_sq8_rerank": "1-row scale broadcast onto the scan; integer-dot candidates with query batch broadcast; exact cosine only on rerank rows.",
    "bigram_fluency_score": "One explode behind a barrier; per-gram counts attach via a single gram-key window shuffle (no aggregate-then-self-join); 1-row total broadcast; integer aggregates end-to-end, one final division.",
    "semantic_dedup": "SemDeDup: k-means assignment (broadcast centroids, shuffle = corpus x k distance rows), clustered corpus barriered, pairwise cosine only WITHIN cid blocks — pair cost sum(|cluster|^2), never corpus^2.",
    "multimodal_image_decode": "Real PNG decode (inflate + unfilter) inside one Arrow-batched mapInPandas stage over the pruned (id, payload) projection — zero shuffle; stats leave Python as 6 scalars/row.",
    "scd2_dimension_join": "Versioned dim broadcast onto the fact join (equi + range residual); global total as a 1-row agg broadcast back — no single-partition window.",
    "incremental_rollup_merge": "Partial aggregates per partition-branch union-merged by re-aggregation; decimal partial sums add exactly.",
    "window_range_frame": "Per-customer RANGE frame — one shuffle+sort partitioned by the key, both frame aggregates share it.",
    "copurchase_pagerank": "Order-keyed self-join builds the edge list (fan-out ~ order size); per-iteration join+agg on edges with floor-scaled int64 contributions; ranks barriered per iteration.",
    "anomaly_trailing_zscore": "One shuffle+sort per customer; count and both integer-cents power sums share the same RANGE frame.",
    "funnel_conversion": "Three keyed aggregations co-partitioned on user_id; left joins reuse the exchange.",
    "text_hashing_topk": "Explode -> (doc,bucket) count agg -> row-local array assembly; scoring broadcast-joins only the query batch.",
    "time_spine_gap_fill": "In-plan spine (sequence explode) + as-of range join; ranked dedup per spine row.",
    "cms_heavy_hitters": "d bucketed counts off one barriered token explode; heavy candidates probe the 4096-counter sketch via broadcast joins.",
    "bloom_membership_audit": "bit_or build -> one packed-array row broadcast onto the probe scan; membership check is row-local bit math.",
    "data_quality_audit": "Union of independent per-table aggregates/anti-joins — each check scans its table once.",
    "text_bm25_topk": "Inverted-index retrieval: postings (tf) barriered and joined by TERM key; query terms, df, and the 1-row N/L stats broadcast; scoring is exact-integer div, top-5 via per-query window.",
    "winnow_fingerprints": "One shingle explode -> pack hash+pos into one int64 -> BOTH window functions (min, count) share a single doc-keyed shuffle+sort -> distinct. No joins, no corpus-wide state.",
    "triangle_count": "Edge list built once behind a barrier; id-oriented two-hop equi-join enumerates each triangle once; wedges from exact integer degree math; 1-row branches broadcast-crossed.",
    "zorder_layout": "20 shift-mask-add Morton terms fuse into the codegen'd scan projection; single bucket aggregation is the only shuffle.",
    "grouped_wavg_pandas": "GROUPED_AGG pandas_udf plans as a regular partial/final hash aggregate with Arrow batches through Python; inputs pre-cast to exact int64 on the scan.",
    "multimodal_audio_decode": "Real RIFF/WAV PCM decode inside one Arrow-batched mapInPandas over the pruned (id, payload) projection — zero shuffle; exact integer stats leave Python.",
    "winsorize_values": "One window pass ranks per group; the tiny bounds table broadcasts back onto the fact scan; the clip is row-local codegen.",
    "source_token_kl": "One token explode behind a barrier; per-token corpus totals attach by token key; scalar totals broadcast; the only order-sensitive sum adds floor-quantized int64 terms.",
    "bpe_train_merges": "Corpus collapses to (word, freq) FIRST so per-iteration cost is vocab-sized; each merge step = explode + one agg + 1-row broadcast argmax + string-replace merge; vocab barriered per step.",
    "entity_match_fuzzy": "Prefix blocking with broadcast hot-block cap; length-difference bound prunes BEFORE thresholded levenshtein; block equi-join, never a cross product.",
    "range_join_bucketed": "Keyless interval join rewritten to a bucket EQUI join (facts x exploded interval buckets, broadcast) + exact range residual — no nested loop.",
    "ols_regression": "Single scan-bound partial+final agg on a 3-value key; all five exact decimal power sums ride ONE shuffle; regression stats are row-local arithmetic on the 3-row result.",
    "welch_ttest": "One corpus scan: per-type sums barriered, grand totals FOLD the per-group partials (re-aggregation, no second scan) and broadcast back — 'the rest' = total − group.",
    "mad_outliers": "Canonical two-pass MAD: pass-1 group medians broadcast back onto the scan; deviation percentiles and the robust-z threshold counts share pass 2; integer cents end-to-end.",
    "knn_classify": "Brute-force cosine with the query batch broadcast; per-query top-k window; voting is a (query,label) count + argmax window with label/truth lookups broadcast.",
    "partition_prune_scan": "PartitionFilters directory pruning — only the two matching event_type partitions are listed; the rollup is a plain partial+final agg over the pruned scan.",
    "bucketed_join_segments": "Co-bucketed SMJ: Sort sits directly on the bucketed scans (Bucketed: true, SelectedBucketsCount 8/8) with ZERO Exchange below the join; only the post-join agg shuffles.",
    "split_leakage_audit": "The banded LSH pipeline unchanged (capped buckets, candidate-restricted verify); split labels are pure functions of doc_id joined on the pair keys.",
    "label_propagation_communities": "Per superstep: edge⋈label equi-join, (node,label) vote count, argmax window — one edge-keyed shuffle each; labels barriered per superstep.",
    "cdc_upsert_latest": "Latest-change window and the full-outer merge share the merge-key partitioning; merge semantics are row-local CASE logic, delete-filter included.",
    "dedup_keep_best": "Cluster stage = banded LSH + barriered iterative CC; the keep policy adds one cluster-keyed argmax window over the (doc, quality) join.",
    "quality_percentile_filter": "Zero-shuffle quality-logit projection, then a single lang-keyed window for percent_rank — per-group relative thresholds without a global sort.",
    "hll_mergeable_rollup": "Per-day DataSketches HLL sketches (one agg) UNIONED to weekly by a second agg over sketch state — raw rows touched once; the exact twin exists only to check the error contract.",
    "ewma_daily_revenue": "Daily integer-cents agg is the only data-sized shuffle; the EWMA fold is a row-local aggregate over the day-ordered series array.",
    "correlation_matrix": "ONE scan, one aggregation carrying all 14 power sums; six correlations derive from the 1-row result and explode row-locally.",
    "xml_roundtrip_extract": "to_xml/from_xml both row-local in the scan stage — zero shuffle; the XML wire path costs no distribution.",
    "event_transition_matrix": "One user-keyed window yields successor pairs; row totals FOLD from the pair counts (barriered) and broadcast back — no second scan.",
    "rfm_segmentation": "Per-customer agg is the only data shuffle; quintile thresholds are ONE exact-percentile row broadcast back — scoring is row-local, never a global ntile window.",
    "phrase_search_positional": "Postings barriered; adjacency equi-joins share the doc key; the mined 1-row phrase broadcasts onto the token filters before the join.",
    "scd2_build_versions": "One merge-key window produces effective ranges and version numbers — the same shuffle the latest-wins merge uses, yielding history instead of the tip.",
    "content_chunk_dedup": "One posexplode; boundary flags row-local from the gram hash; chunk ids + reassembly share one doc-keyed shuffle; dedup counts shuffle on the chunk hash.",
    "decision_stump_train": "Histogram aggregation is the only stage that sees data; the cumulative gain scan runs over the 50-row histogram (tiny global window by design).",
    "dedup_prefix_filter": "Rare-first global shingle order; only prefixes join (hot shingles fall OUT of prefixes); verify restricted to candidates — zero false negatives by pigeonhole.",
    "join_cardinality_estimate": "Two fixed 4x1024 sketches price the join; per-row inner products fold bucket-locally; the exact twin folds from per-key counts — no join executes.",
    "bootstrap_ci_mean": "All 32 Poisson replicate sums ride ONE scan as extra aggregates (row-local hash weights); replicate means sort row-locally into order-statistic CIs.",
    "ks_test_two_sample": "Rows collapse to a distinct-value histogram first; the ECDF cumulative scan is bounded by distinct cents values, not row count.",
    "km_survival_gaps": "Gap histogram first; at-risk and quantized-log survival telescoping run over distinct gap values; the heavy stage is the per-customer lead window.",
    "acf_daily_revenue": "Calendar-bounded: everything after the daily aggregation is days-sized; per-lag self-joins on the barriered indexed series.",
    "link_prediction_aa": "Shared edge builder barriered; wedge join anti-joined against edges; 1/ln(deg) terms floor-quantized to exact int64 sums.",
    "cohort_ltv_curve": "First-order cohort table barriered and broadcast; cumulative LTV window runs over the cohorts x 12 grid only.",
    "attribution_linear": "User-keyed equi join + time-range residual bounds fan-out by per-user activity; credit is exact integer division in micro-cents.",
    "seasonal_decompose_daily": "Days-sized after the daily agg: centered 7-day MA window, weekday-mean seasonal broadcast back onto the barriered detrended series.",
    "holt_forecast_daily": "Coupled (level, trend) smoothing as a row-local struct-state fold over the day-ordered series — adds and halvings only, bit-exact cross-engine.",
    "gradient_boost_stumps": "Per round: one histogram aggregation over raw rows, criterion scan over the 50-row histogram, 1-row model broadcast back for exact integer residuals.",
    "mann_whitney_u": "Histogram-first midranks; doubled rank sums keep every intermediate an exact integer until the two display divisions.",
    "kfold_ols_cv": "One scan builds per-fold sufficient statistics; training sums = total − fold; 5 models + 5 held-out MSEs are arithmetic over a 5-row table.",
    "dedup_simhash_hamming": "Signature scan barriered; 4 band-keyed equi-joins replace the all-pairs hamming comparison; bit_count(xor) verifies row-locally.",
    "pareto_skyline_parts": "Per-part aggregation is the data pass; the dominance sweep is one window over the aggregated parts relation.",
    # round-5 additions
    "reservoir_sample_exact": "Exact-k sample = TakeOrderedAndProject over Carter-Wegman keys: per-partition k-row heaps, k-row driver merge — no global sort, no corpus shuffle.",
    "stratified_sample_neyman": "One corpus scan for stratum power sums (barriered, broadcast back); allocation arithmetic on the stratum-count table; per-stratum WindowGroupLimit partial top-k — never a full stratum sort.",
    "ranking_metrics_eval": "Truth set barriered (brute pipeline runs once); both index outputs union, relevance attaches by left join on the pair key; metric sums are exact int64 with literal discount weights.",
    "roc_auc_quality": "Score histogram agg is the only data-sized stage; the midrank cumulative window runs over distinct quantized scores (SinglePartition by design, histogram cardinality); no row_number anywhere.",
    "spearman_correlation": "Two value-histogram windows (50-row quantity / distinct-cents price); rank join back to rows (quantity side broadcast); DECIMAL(38,0) power sums in one aggregation.",
    "kcore_membership": "4 peel rounds, each a semi-join-restricted degree count over the barriered symmetric edge list; convergence flag = two 1-row counts broadcast.",
    "item_item_cosine": "Degree table + edge list barriered (each feeds two branches); similarity join keyed by item; top-3 via WindowGroupLimit.",
    "logrank_test": "Gap histogram barriered; cumulative at-risk windows over distinct gap values; quantized hypergeometric terms sum in DECIMAL(38,0) in one aggregation.",
    "cusum_changepoint": "Daily integer-cents agg barriered (feeds totals and the cumulative scan); day-ordered window over ~2.4k rows; totals and argmax row attach by broadcast.",
    "streaming_matview_join": "foreachBatch: batch rows broadcast-join the dim, merge latest-wins into bucket-partitioned state (partition-pruned read, staged write + per-bucket rename promotion, replay markers); final read is the serving view.",
    "multimodal_video_fingerprint_dedup": "Real Y4M decode in Arrow-batched mapInPandas; 4x16-bit band equi-joins over DISTINCT fingerprint values (bucket sizes bounded by hash diversity, not corpus), popcount verify on value pairs, member expansion output-proportional (hot-band cap available).",
    "cohens_kappa": "Single codegen scan-aggregation: the whole 2x2 confusion table as four int64 sums; kappa is one division of exact operands.",
    "benford_digit_audit": "Leading digit from the decimal string of exact cents (no float log); one scan to a 9-row histogram; literal Benford expectations; totals broadcast.",
    "naive_bayes_language": "Training = two aggregations over the barriered train-token explode; dense vocab x class table broadcast-assembled; scoring joins on token, aggregates on (doc, class); quantized int64 scores make the argmax exact.",
    "span_dedup_exact": "Window explode barriered; hot 20-grams by xxhash64 key count; occurrences semi-join the hot set; island merge is one doc-keyed window pair — gram- and doc-keyed shuffles only.",
    "theil_sen_trend": "Day-pair table is calendar-squared (bounded at any fact scale); each slope one IEEE division of exact cents; exact median via the two middle order statistics.",
    "mann_kendall_trend": "Same day-pair table; S is a pure integer sign sum; tie-corrected variance from exact value-histogram counts; z = one sqrt + one division.",
    "sssp_weighted_bounded": "12 delta-frontier Bellman-Ford rounds (only improved nodes re-propose), each a frontier-join + per-node min with lazy-checkpoint barriers; integer distances engine-exact; hashed settled flag proves the fixpoint.",
    "streaming_cms_heavy_hitters": "foreachBatch folds single-scan (row, bucket) counts (explode d hashes per event) into the 4x1024 compact sketch state (one-job whole-state swap, replay markers); probes broadcast sketch-row slices; heavy set exact and scale-free.",
    "weighted_sample_es": "Weighted exact-k sampling compiles to TakeOrderedAndProject: per-partition k-row heaps, n_tasks*k-row driver merge, no global sort.",
    "kruskal_wallis_test": "Histogram-first rank test: one vc-keyed shuffle + one ordered window over the distinct-value histogram; H is a scalar over exact aggregates.",
    "logistic_irls": "Two lineitem scans, each a partial+final HashAggregate of 9 quantized DECIMAL sums; the Cramer solves are 1-row projections.",
    "isotonic_calibration": "One corpus scan to the 50-bin histogram; the O(k^2) minimax pair/window work runs on the tiny binned table.",
    "trigram_perplexity": "One doc-keyed lag window + five gram-count windows exchanging int64 hash keys; final per-doc agg is map-side combinable.",
    "similarity_ann_pq": "Codebook and ADC LUT enter every join as broadcasts; corpus-sized relations never shuffle for the encode/ADC stages.",
    "rrf_hybrid_retrieval": "Two 20-row-per-query rank lists full-outer-joined; fusion cost is independent of corpus size (scale lives in the legs).",
    "grid_density_clusters": "One groupBy onto the bounded cell table; components run on cells, never points; final labels attach by cell equi-join.",
    # round-6 continuation waves
    "anova_oneway": "Single codegen scan-aggregation: 15 pivoted integer-cents sufficient statistics in ONE row; SSB/SSW/F are fixed-order scalar expressions — no second pass, no window.",
    "jarque_bera_test": "One scan to 5 groups x 4 exact DECIMAL power sums (map-side combined); central moments and JB are per-row scalar math.",
    "gini_concentration": "Per-customer revenue agg (one fact shuffle), per-nation rank window, DECIMAL(38,0) rank-weighted sums; nation dim broadcast at the end.",
    "tokenizer_fertility": "BPE train collapses to the vocab-sized (word,freq) table; corpus cost is one explode + one BROADCAST word-join + a 5-row lang agg.",
    "fim_transform": "Scan -> project only (higher-order slice/concat): zero Exchange in the plan — streams at input bandwidth.",
    "mixture_sampling_weights": "Row-local token counts (no explode), 20-row source agg, two 1-row broadcast folds for the exact integer normalizers.",
    "ngram_novelty": "Inverted-index shape: distinct (doc,shingle) -> one shingle-keyed count + one doc-keyed fold; LEFT join keeps short docs.",
    "colbert_maxsim_topk": "8x token explode, 40-row query side BROADCAST onto it; two shuffles on collapsing keys (max then sum); top-10 window per query.",
    "multimodal_spectral_hash_dedup": "Real PNG decode in Arrow mapInPandas; integer WHT signs per image; four 5-bit band equi-joins over DISTINCT hash values (<= 2^15 per band regardless of corpus), member expansion output-proportional.",
    "multimodal_audio_vad": "Codec-boundary mapInPandas to frame energies; totals join back per media; voiced/segment logic is one media-keyed window chain.",
    "streaming_reservoir_sample": "foreachBatch: batch-local per-day top-20 (TakeOrdered bounds state writes to k rows/day) merged into compact sketch state (one-job whole-state swap) by idempotent top-k union.",
    "dataset_datasheet": "ONE scan expanded to four grouping sets sharing partial aggregates (Expand + HashAggregate) — four reporting levels, one pass.",
    "contrastive_pairs": "Crops are scan-local slice arithmetic; hard negatives via the shingle inverted index (shingle-keyed pair counts, per-doc rank-1 window).",
    "bleu_rouge_eval": "ONE tagged explode (4 n-gram sizes x both sides) -> one (source,doc,gram) shuffle -> per-source pivot; denominators fold into the lengths scan.",
    "wasserstein_length_drift": "Distinct-length grid (histogram-bounded) cross sources; two cumulative windows; DECIMAL |area| sums with one final division.",
    "cuped_variance_reduction": "Two shuffles total: per-user exact-cents (X,Y), then ONE pivoted row of per-arm sufficient statistics; theta and variances are scalar expressions.",
    "msprt_always_valid": "One scan to day x arm integer sums, day-ordered cumulative window (30 rows), scalar likelihood-ratio math + running max.",
    "srm_check": "Per-user arm table (one shuffle), 2-count pivot, scalar chi-square — the cheapest query in the registry by design.",
    "quantile_treatment_effect": "Single scan into two percentile aggregates on the integer-cents grid; QTEs are scalar differences of the two arrays.",
    "lsa_top_terms": "Matrix-free power iteration: each half-multiply is one equi-join of the barriered weight relation with the current iterate + one agg; normalizing maxes are 1-row broadcasts.",
    "kneser_ney_perplexity": "Bigram TYPE relation (one explode + lag window), four type-keyed aggs, three joins back; ln runs |types| times, weighted by exact counts.",
    "multimodal_image_resize": "Real PNG decode + integer index-map resample in Arrow mapInPandas; zero shuffle; output serializes every pixel.",
    "grouped_median_center_arrow": "Grouped applyInArrow: one event_type shuffle, whole group as a pyarrow Table, exact 2v-(m_lo+m_hi) integer contract.",
    "ips_offline_eval": "One scan, one aggregation row: per-row importance ratios are exact int64 products quantized once; no joins at all.",
    "fellegi_sunter_linkage": "Nation-blocked pair join (the quadratic-killer), 1-row m/u estimate broadcast back as weights; score>0 filter before output.",
    "forecast_backtest_rolling": "One scan to the calendar-bounded day table; three lag/frame windows; 1-row verdict with the argmin winner in-plan.",
    "uplift_qini_deciles": "User-keyed (X,Y) agg, one global ntile over users (equidepth-histogram rank at 100 TB), 10-row cumulative window.",
    "shapley_ols_attribution": "Two scans: exact DECIMAL covariance row (broadcast), then per-row quantized |phi| folded per flag — explainability at scan cost.",
    "did_estimator": "Single codegen scan-aggregation: all four arm x period cells' exact sufficient statistics in ONE row; estimate/SE/z are scalar expressions.",
    "shapley_channel_attribution": "Two user-keyed aggs (first purchase, 4-bit mask); ALL coalition work runs on the 16-row mask table — exact enumeration, no sampling.",
    "skipgram_negative_sampling": "Token explode + broadcast vocab joins; context pairs by (doc,pos) equi-join; negatives map through a broadcast cumulative-range join — bucketed range join at web-scale vocab.",
    "iv_2sls_wald": "User-keyed agg + ONE pivoted sufficient-statistics row; Wald ratio, first-stage F, and the naive OLS contrast are scalar expressions.",
    "rdd_sharp_local_linear": "Bandwidth filter on the user-keyed scan, two-side pivoted statistics in one row, closed-form local-linear fits; NULL guards for degenerate sides.",
    "propensity_matching_att": "Caliper band join treated x control (bucketed-range join at scale), rank-1 window per treated, 1-row ATT + balance diagnostics.",
    "bh_fdr_daily_shifts": "Cell sufficient statistics (one shuffle), pooled stats broadcast back; the ordered-p BH window runs over the m-row HYPOTHESIS table, never data.",
    "empirical_bayes_shrinkage": "Two-level hierarchy in two aggregations; ensemble stats are integer sums of quantized per-cell terms; shrinkage applies row-locally on the join back.",
    "texttiling_segmentation": "One explode -> (doc,block,token) counts -> adjacent-block equi-join -> doc-keyed cummax windows; every stage sharded by doc_id.",
    "markov_stationary_distribution": "lead() window builds transitions once; all three power steps run on the 25-entry pair table with per-term-quantized integer sums.",
    "dedup_pr_threshold_sweep": "Exact relation (hashed shingles, floored at the sweep min) + md5 signatures + band join; per-threshold counts from ONE conditional-aggregation scan per pair table - zero threshold expansion.",
    "vocab_coverage_estimate": "One explode, one (lang,word) count, a 5-row fold — the cheapest corpus-wide estimator family in the registry.",
    "streaming_srm_monitor": "foreachBatch min-merges per-user enrollment days into bucket-partitioned state (batch-order independent BY ALGEBRA); the cumulative chi-square reads day-level counts.",
    "multimodal_motion_vectors": "Real Y4M decode + exhaustive 9-candidate block search in Arrow mapInPandas; zero shuffle; exact integer SAD argmin.",
    # round-7 additions
    "colbert_maxsim_ivf": "Doc-level IVF routing (broadcast centroids, argmax assignment, 2-probe) prunes the corpus BEFORE the 8x token explode; MaxSim shuffles only candidate tokens; exact colbert arithmetic.",
    "matryoshka_prefix_recall": "One corpus scan explodes 4 prefix lengths; 20 query slices broadcast; per-(query,dim) top-10 windows; overlap join is top-10-sized.",
    "hilbert_layout": "10 unrolled xy2d rotation steps fuse into the codegen'd scan projection (integer CASE arithmetic, no XOR operator divergence); single bucket-ledger aggregation is the only shuffle.",
    "dsir_importance_weights": "Scan-local bigram slices hashed to 1024 buckets; per-feature smoothed log-ratio computed once per bucket and BROADCAST back; per-doc weights are exact int64 sums; LEFT join keeps no-bigram docs.",
    "hll_audience_overlap": "Per-type HLL sketches (one distinct agg); every pair overlap from hll_union at sketch cost; the exact self-join ground truth runs only for the tolerance contract.",
    "source_overlap_kmv": "One (source, shingle-hash) DISTINCT, then two-level exact bottom-k (salted pre-rank caps any reducer at 32k rows); all pair logic on n_sources*k sketch rows — corpus-size-independent after the scan.",
    "pagerank_personalized": "Per iteration one edges-ranks equi-join + aggregation; seed flag broadcast onto the rank state; teleport mass only on seeds; 2^40 fixed-point integer sums.",
    "similarity_mmr_rerank": "Pool generation is the broadcast-query corpus scan; the K-1 greedy steps and the pairwise-sim table are pool-sized (queries x 12) — no collect, no corpus re-scan.",
    "gmm_em_1d": "Two scans total: each EM cycle is ONE partial+final aggregation of quantized sufficient statistics; M-step arithmetic on a 1-row table.",
    "wordpiece_greedy_tokenize": "Corpus collapses to (word, freq) first; candidate pieces one explode+agg; vocab broadcast into max-word-length frontier join steps; the vocab-ranking window is piece-cardinality-sized.",
    "embedding_hard_negatives": "Broadcast anchors against the corpus scan with the label-mismatch predicate fused into the join; per-partition top-k so only k rows per anchor leave each partition.",
    "rocchio_prf_rerank": "Two corpus scans (first-pass rank, rerank); feedback centroid pivoted to rank columns and summed as a fixed expression on queries x dims rows; expanded queries broadcast into pass 2.",
    "dp_noisy_release": "One aggregation to cells, then per-cell scalar noise arithmetic — release cost proportional to released cells, not table size.",
    "k_anonymity_audit": "Single groupBy over the quasi-identifier cell computing size and distinct sensitive bands together — one shuffle.",
    "group_fairness_metrics": "Quality logit stays a codegen scan projection; one cells aggregation per language; the overall rate is a broadcast one-row cross join.",
    "ab_interleaving_eval": "Two ranking scans produce top-10 lists; the 5 draft rounds are anti-join + top-1 windows over candidate-depth rows per query — corpus-size-independent after the scans.",
    "hill_tail_index": "Top-101 via TakeOrderedAndProject (per-partition top-k merge, never a global sort); rank window and quantized log sum on 101 rows.",
    "semantic_contamination": "Broadcast-benchmark corpus scan with per-partition top-1; the contaminated flag is scan-local arithmetic.",
    "markov_removal_attribution": "One window pass builds journeys; the chain + ALL removal variants form a channels-sized table iterated with tiny barriered joins — 20 fixed-point steps, corpus-size-independent.",
    "huber_irls_regression": "Two partial+final aggregations of quantized sufficient statistics; both solves are 1-row arithmetic.",
    "textrank_keywords": "Row-local adjacent-token zip, one distinct-pair aggregation, then the fixed-point pagerank iterations (edge-join + agg per step).",
    "dedup_fastss_ed1": "Variant explode (N*(L+1) rows) -> equi-join on the variant key -> distinct candidate pairs -> one Levenshtein verify per candidate; no all-pairs term anywhere.",
    "ams_f2_sketch": "ONE h60 per row, 60 bit-derived sign sums in a single partial+final aggregation (60 int64 cells, map-side combinable); exact twin is one keyed groupBy.",
    "als_rank1_implicit": "Ratings collapse to (u,k,count) once behind a barrier; each half-step is ratings-join-factors + keyed agg (shuffle = observed triples), barriered per iteration.",
    "doubly_robust_eval": "One scan; reward model is a 5-cell agg broadcast back as a 1-row pivot; every sum rides per-row decimal casts.",
    "dedup_clusters_star": "Alternating large-star/small-star rounds: keyed min + join over the CURRENT edge set, barriered; O(log^2 n) rounds on any topology vs min-label's O(diameter).",
    "out_of_order_profile": "One keyed window pass (running event-time max in jittered arrival order) + one aggregation; lateness sums per-row decimal-cast.",
    "orc_roundtrip_agg": "Partition filter resolves at ORC file listing (one status directory read); partial+final agg over the pruned splits.",
    "csv_ingest_audit": "Schema-explicit single-pass CSV parse (no inferSchema pre-scan); corrupt rows quarantined per-row; one partial+final agg.",
    "similarity_binary_hamming": "Sign bits pack to ONE int64/vector; candidates via xor+bit_count against the broadcast query batch (scan-local); exact cosine only on the 32*Q rerank rows.",
    "shuffle_skew_audit": "One scan barriered, two keyed aggregations folded to 1-row diagnostics; the audit itself is skew-free.",
    "kmeans_parallel_init": "Per round: broadcast-centers assignment scan + 1-row phi broadcast + filter; center set O(l*rounds) behind barriers.",
    "spatial_radius_join": "Grid-cell blocking: 9-way neighbor explode on the probe side, ONE equi-join on the cell key, exact verify on candidates — density-bounded, never N^2.",
    "max_concurrent_intervals": "Corpus scan -> +/-1 day deltas -> day-keyed net agg; the running-sum window runs over the calendar-bounded day table only.",
    "rolling_distinct_users": "Coverage explode (x7, row-local) + distinct + per-day count; no window-distinct workaround joins.",
    "multimodal_jpeg_entropy_decode": "Fixture encode + Huffman/dequant/dezigzag decode are two chained Arrow mapInPandas stages over doc_id only (ReadSchema pruned to 1 column); zero shuffle before the final agg-free emit.",
    "multimodal_jpeg_color_decode": "Interleaved 4:2:0 MCU walk per payload inside one Arrow stage; per-(media, component) rows emit without exploding coefficients into Spark.",
    "blocklist_multipattern_scan": "ONE automaton pass per doc (O(corpus + matches), pattern-count-independent) in a single mapInPandas stage; the (source, pattern) grid aggregates with partial+final hash agg.",
    "streaming_scd2_build": "Version-table state: per trigger the touched buckets re-derive their keys' lead/row_number chains inside the bucket-pruned read; serving is a plain state scan, no window at query time.",
    "pii_luhn_audit": "Checksum as a pure Catalyst sequence->transform->aggregate chain inside whole-stage codegen; one scan, per-source partial+final agg, zero-candidate sources kept by the broadcast-left grid join.",
    "bitmap_distinct_rollup": "One fact scan materializes the (segment, bucket, bitmap) table behind a barrier; per-segment counts and the OR-merged ALL row both read ExistingRDD — the reusable exact-distinct rollup shape.",
    "table_integrity_digest": "One scan per table, digest sums/xors combine map-side (partial+final agg); no joins, no windows — the replica-verification pass streams at scan speed.",
    "hll_datasketches_rollup": "Per-segment DataSketches HLL sketches built in one barriered scan; the ALL row re-unions the same sketch bytes (hll_union_agg) — the cross-system mergeable-sketch interchange shape.",
    "phonetic_blocking_soundex": "soundex() runs in the scan projection (codegen); block stats are one partial+final agg over the distinct word set.",
}


def main():
    spark = get_spark(app_name="plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    sf = "/root/testdata/sf0.001"
    out = ["# PLANS — physical plans of headline queries (sf0.001, local)",
           "",
           "Regenerate with `python scripts/dump_plans.py`. The properties",
           "called out per plan are asserted in `tests/test_plans.py`.",
           ""]
    for name, note in NOTES.items():
        df = registry.QUERIES[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the tree + scan details, trim the long operator details
        tree = plan.split("\n\n")[0]
        details = "\n\n".join(
            s for s in plan.split("\n\n")[1:]
            if s.startswith("(1)") or "PushedFilters" in s or "ReadSchema" in s
        )
        out.append(f"## {name}\n\n**{note}**\n\n```\n{tree}\n")
        if details:
            out.append(f"\n{details}\n")
        out.append("```\n")
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
