"""Adversarial randomized oracle gate: synthesize a RANDOM events table
(seeded; deliberately nasty distributions) alongside the fixed sf0.001
tables, then run the same engine-vs-DuckDB comparison as
tools/check_oracle.py over every events-centric oracle query.

Guards against overfitting to the driver testdata's tame distributions.
The generated table stresses exactly the spots where distributed
implementations silently diverge from SQL:

- duplicate timestamps (sort / as-of tie-breaks)
- values exactly ON the band edges 5.0 / 10.0 / 20.0 (< vs <=)
- negative zero (-0.0) and repeated identical values (hash bucketing,
  quantile mass points)
- one dominant event_type (hot-key skew) + a type with a single row
- a user with one event (session edge) + a user with hundreds
- sub-second timestamp ties across users, events out of event_id order

Usage:  python tools/fuzz_oracle.py [seed] [n_rows]          # events mode
        python tools/fuzz_oracle.py --docs [seed] [n_docs]   # documents mode
        python tools/fuzz_oracle.py --emb [seed] [n_vecs]    # embeddings mode

The --docs mode synthesizes an adversarial documents table (empty /
whitespace-only docs, punctuation floods, giant unbroken tokens,
control characters, planted duplicate clusters and near-dup pairs) and
replays every documents-centric oracle query. It caught a real recall
gap on day one: verified_neardup_pairs kept J>=0.5 while its 16-band
LSH missed ~35% of borderline pairs.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.001"

# every oracle-checked query whose inputs are events only
EVENT_QUERIES = [
    "ohlc_resample_events", "event_cube_stats",
    "ntile_value_bands_per_type", "winsorized_value_mean_per_type",
    "weekly_median_value_per_type",
    "events_by_type", "distinct_users_per_type", "hourly_event_counts",
    "psi_events_value", "ks_events_value", "chi2_events_type",
    "js_hellinger_events_value", "wasserstein_events_value",
    "anderson_darling_events", "value_quantiles_per_type",
    "sliding_4h_event_stats", "user_session_stats", "event_gap_stats",
    "events_value_band_counts", "windowed_accuracy_events",
    "trend_hourly_slope", "users_in_click_and_error",
    "corr_slope_value_hour_per_type", "first_event_counts_per_type",
    "top_user_by_value_per_type", "type_pair_user_jaccard",
    "mad_value_per_type", "asof_click_before_error", "asof_next_purchase_after_signup", "hash_split_counts",
    "events_type_hour_pivot", "kmv_distinct_audit",
    "kmv_intersection_audit", "kmv_difference_audit",
    "join_size_estimate_audit",
    "dgim_window_count_audit", "mannwhitney_drift_events",
    "per_type_sample_events", "holt_linear_hourly",
    "holt_winters_hourly",
    "binseg_changepoints_hourly", "moods_median_drift",
    "assoc_rules_event_types", "cramers_v_type_band",
    "seasonal_strength_hourly", "pagerank_transitions",
    "type_hour_information_gain", "gap_burstiness_per_type",
    "k_anonymity_report", "concept_drift_struct_audit",
    # session-3: full-outer join, JSON extraction, ROWS window, string_agg
    "active_user_outer_counts", "props_json_field_stats",
    "user_value_moving_avg", "user_event_sequences",
    # session-4: mode/entropy/union-dedup/banding/retention/rolling
    # distinct/funnel/skew/transitions
    "mode_value_band_per_type", "hourly_type_entropy",
    "amended_events_latest_dedup", "value_quartile_band_counts",
    "weekly_user_retention", "rolling_7d_distinct_users",
    "session_funnel_counts", "key_skew_stats", "event_type_transitions", "event_type_trigrams",
    "impute_missing_values", "k_anonymity_events", "late_events_report",
    "hot_user_enriched_revenue", "daily_psi_timeline",
    "cusum_hourly_mean", "ewma_stream_value", "user_ewma_stats",
    "outlier_counts_per_type",
    # round-4: exact/sketch sandwich
    "approx_distinct_users_per_type", "kll_quantile_audit",
    "tdigest_quantile_audit", "ddsketch_quantile_audit",
    # round-4: global rank transform (ties-min over mass points + NaN)
    "global_value_rank_sample",
    # round-4 session 4: band join (edge values / mass points / NaN)
    "value_band_pair_stats",
    # round-5 session 7-8: robust slopes / rank correlation / ECDF-L2,
    # Kuiper, ordinal effect size, energy distance
    "theil_sen_hourly_slope", "spearman_value_hour",
    "cvm_drift_events", "kuiper_drift_events", "cliffs_delta_events",
    "energy_distance_events", "page_hinkley_hourly",
    "hodges_lehmann_shift_hourly", "kendall_tau_value_hour",
    "quantile_shift_drift_events", "gini_value_per_type",
    "benford_first_digit_audit", "acf_hourly_means",
    "prop_drift_per_type", "cuped_variance_reduction",
    # session-9: classical two-sample / trend statistics completion
    "welch_t_drift_events", "brown_forsythe_variance_drift",
    "tv_overlap_drift_events", "runs_test_hourly",
    "mann_kendall_hourly", "jarque_bera_hourly",
    "durbin_watson_hourly", "grubbs_hourly",
    "zero_share_drift_events", "cochran_armitage_error_trend",
    "poisson_dispersion_hourly", "hod_uniformity_chi2",
    "sign_test_hourly", "wilcoxon_signed_rank_hourly",
    "benford_second_digit_audit", "weekday_weekend_drift",
    "kruskal_wallis_types", "anova_f_types", "friedman_hourly_types",
    "ordinal_assoc_value_hour", "bowley_moors_shape_events",
    "trimmed_mean_drift_events",
    # session-11: rank-based scale tests + the survival tier
    "rank_scale_drift_events", "kaplan_meier_gaps", "logrank_gap_drift",
    # session-11: sequence alignment, serial dependence, 2x2 panel
    "dtw_daily_types", "pacf_hourly_means", "xcorr_hourly_types",
    "fourfold_flag_drift",
    # session-13: inter-rater agreement panel
    "cohen_kappa_flags",
    # session-14: stationarity + multiresolution tiers
    "dickey_fuller_hourly", "haar_energy_hourly",
    # session-15: isotonic regression + winsorized drift
    "isotonic_hourly_trend", "winsorized_drift_events",
    # session-16: inequality curve + long-memory diagnostic
    "lorenz_curve_events", "hurst_rs_hourly",
    # session-17: segmented scan + monitoring classics
    "type_run_length_stats", "control_chart_hourly",
    "turning_points_hourly", "record_count_hourly",
    # session-18: funnel, Markov information, G-test
    "funnel_conversion_stats", "markov_entropy_rate",
    "g_test_types",
    # session-19: cohort retention, exact mode, funnel latency
    "cohort_retention_matrix", "value_mode_events",
    "funnel_latency_quantiles",
    # session-21: spectral seasonality
    "daily_harmonic_power",
    # session-22: temporal self-join + capture-recapture
    "burst_pair_counts", "lincoln_petersen_users",
    # session-23: affinity, fences, regression influence
    "bhattacharyya_types", "tukey_fences_events",
    "ols_influence_hourly",
    # session-24: L-moment ratios, successive-difference dispersion,
    # Hampel census
    "lmoments_events", "vonneumann_allan_hourly",
    "hampel_outliers_per_type", "sigma_coverage_events",
    "pot_mean_excess_events", "transition_drift_chi2",
    "drawdown_hourly", "sample_entropy_hourly",
    "classical_decomposition_hourly", "gumbel_daily_max_fit",
    "session_duration_quantiles", "bartlett_variance_types",
    "ams_f2_audit", "last_digit_uniformity_events",
    "hill_tail_index_events", "arch_effect_hourly",
    "type_pair_overlap_cosine", "seasonal_naive_error_hourly",
    "hoover_index_per_type", "rayleigh_hod_uniformity",
    "gini_split_gain_events", "benford_two_digit_audit",
    "western_electric_rules_hourly", "hits_transitions",
    "transition_graph_stats", "lorenz_asymmetry_events",
    "full_spectrum_hourly", "type_evenness_events",
    "ewma_control_chart_hourly", "hourly_load_panel",
    "greenwood_km_variance", "above_mean_spells_hourly",
    "expected_shortfall_events", "intersession_gap_quantiles",
    "error_mtbf_stats", "band_transition_matrix",
    "new_user_daily_counts", "kupiec_var_backtest",
]  # (priority_week_independence is orders-only — outside fuzz axes)  # (qty_discount_independence is lineitem-only — outside fuzz axes)

# NOTE: embedding_norm_band_counts / embedding_sign_census join
# EMB_QUERIES below; charset_hygiene_docs joins DOC_QUERIES.


def synth_events(seed: int, n: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    types = np.array(["click", "view", "purchase", "error", "signup",
                      "lonely"])
    # hot-key skew + a single-row type
    p = np.array([0.55, 0.2, 0.1, 0.08, 0.07, 0.0])
    event_type = rng.choice(types[:5], n, p=p[:5] / p[:5].sum())
    event_type[n - 1] = "lonely"
    # one power user, one single-event user, the rest zipf-ish
    user_id = rng.zipf(1.5, n).astype(np.int64) % 97
    user_id[: n // 5] = 7          # power user
    user_id[n - 2] = 9999          # single-event user
    # timestamps: coarse grid -> many exact ties; shuffled vs event_id
    base = pd.Timestamp("2024-01-01")
    step = rng.integers(0, 6 * 3600, n) * 1_000_000  # whole seconds, 6h span
    ts = base + pd.to_timedelta(step, unit="us")
    # values: band edges, -0.0, repeats, negatives, huge
    value = np.round(rng.exponential(8.0, n), 2)
    edge_idx = rng.choice(n, n // 10, replace=False)
    value[edge_idx] = rng.choice([0.0, 5.0, 10.0, 20.0, -0.0], n // 10)
    value[rng.choice(n, n // 20, replace=False)] = -3.5
    value[rng.choice(n, 3, replace=False)] = 1e9
    value[rng.choice(n, n // 15, replace=False)] = 42.42  # mass point
    # dyadic values (odd k / 2^10): after any exact integer arithmetic
    # their decimal expansion terminates with a 5 at the 10th digit —
    # the trailing-5 half-case where np.round (half-even) and DuckDB
    # round() (half-away) disagree. Gates the round_half_away contract
    # (caught live on quality_docs by --docs seed 5).
    value[rng.choice(n, n // 25, replace=False)] = (
        2 * rng.integers(0, 2 ** 9, n // 25) + 1) / 1024.0
    # ties-heavy discrete plateau: ~25% of rows quantized to integers
    # 0..4 — stresses rank-based statistics (Anderson-Darling's
    # Scholz-Stephens tie correction, KS step alignment, quantile mass)
    tie_idx = rng.choice(n, n // 4, replace=False)
    value[tie_idx] = rng.integers(0, 5, n // 4).astype(np.float64)
    # missing data: true float NaN AND SQL NULL (distinct index sets) —
    # every value-consuming query must apply the shared contract
    # 'exclude null/NaN on both sides' (pandas cannot tell them apart;
    # DuckDB can — isnan() vs IS NULL)
    value[rng.choice(n, n // 30, replace=False)] = np.nan
    null_mask = np.zeros(n, dtype=bool)
    null_mask[rng.choice(n, n // 30, replace=False)] = True
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts.values.astype("datetime64[us]"),
        "user_id": user_id,
        "event_type": event_type,
        "value": value,
        "props": ['{"k": %d}' % k for k in rng.integers(0, 100, n)],
    })
    df.attrs["value_null_mask"] = null_mask
    return df


# documents-centric oracle queries (the --docs mode); verified_neardup's
# ground-truth SQL is O(n^2), so keep n modest (<= ~600)
DOC_QUERIES = [
    "paragraph_dedup_stats", "tokenizer_fertility_by_lang",
    "ngram_decontamination_stats", "cms_token_counts_audit",
    "dsir_hashed_ngram_features", "image_bucketing_audit",
    "image_pixel_fidelity_audit", "image_feature_drift_audit",
    "lang_counts", "doc_token_stats", "langid_docs", "quality_docs",
    "doc_fingerprints", "bpe_token_stats", "top_tokens_docs",
    "exact_dup_docs", "pii_redacted_docs", "curated_training_split",
    "verified_neardup_pairs", "decontaminate_docs",
    # session-4: normalization, doc-frequency, pattern profiling
    "normalized_docs", "doc_frequency_top_terms", "pattern_profile_docs",
    "tfidf_top_terms_per_doc", "bigram_counts_docs", "doc_sentences",
    "inverted_index_tokens",
    # round-4: invariant audits (sketch guarantee / bin packing /
    # fingerprint determinism)
    "heavy_hitter_tokens_verified", "packed_sequence_audit",
    "rolling_fingerprint_audit",
    # round-4 session 2: Gopher-style repetition metrics
    "doc_repetition_stats", "simhash_dup_audit",
    "incremental_dedup_docs",
    # round-4 session 3: exact-substring (dup 8-gram span) dedup
    "dup_ngram_grams", "doc_dup_span_coverage", "doc_dup_span_stats",
    # round-4 session 4: bigram-LM count-space quality scoring + BPE
    # merge learning (full merge-loop parity vs the unrolled SQL)
    "bigram_lm_doc_scores", "bpe_merge_table", "bpe_tokenized_doc_stats",
    "shingle_cosine_pairs", "neardup_triangle_stats",
    "token_source_drift", "trending_tokens_daily", "snapshot_diff_docs",
    "curation_funnel_report",
    # session-7: RAG chunking, readability, vocabulary coverage, PMI
    "doc_chunking_stats", "readability_docs", "vocab_coverage_topk",
    "pmi_top_bigrams", "textrank_keywords",
    "image_patch_stats_audit", "image_channel_stats_audit",
    "image_flip_crop_audit",
    # session-9: corpus vocabulary / shape statistics
    "hapax_vocab_stats", "token_burstiness_stats",
    "doc_length_gini", "source_lang_cramers_v",
    "ttr_by_source",
    # session-13: image feature-extraction anchors + Zipf power law
    "image_conv_edge_audit", "image_downsample_audit",
    "zipf_token_slope",
    # session-14: intensity histogram + rotation arrangement anchors
    "image_gray_hist_audit", "image_rot90_audit",
    # session-15: species richness / unseen-mass estimation
    "chao1_vocab_estimate",
    # session-16: CutMix + photometric augmentation anchors
    "image_cutmix_audit", "image_brightness_audit",
    # session-18: contrast normalization anchor
    "image_contrast_norm_audit",
    # session-20: Otsu threshold, integral image, source HHI
    "image_otsu_threshold_audit", "image_integral_audit",
    "source_concentration_hhi",
    # session-21: equalization + 2D Haar anchors
    "image_equalize_audit", "image_haar2d_audit",
    # session-24: lexical concentration + GLCM texture + mixup +
    # stylometry + solarize/posterize
    "yule_k_docs", "image_glcm_audit", "image_mixup_audit",
    "burrows_delta_docs", "image_solarize_posterize_audit",
    "image_grayworld_audit", "bigram_novelty_docs",
    "image_laplacian_audit", "image_nn_resize_audit",
    "image_orientation_hist_audit", "image_luma_audit",
    "char_trigram_js_halves", "image_morphology_audit",
    "charset_hygiene_docs", "image_run_length_audit",
    "rbo_token_halves", "image_bayer_audit",
    "image_palette_audit", "minhash_halves_jaccard_audit",
    "langid_confusion_matrix", "doc_length_w1_halves",
    "image_zigzag_audit", "countsketch_token_audit",
    "image_symmetry_audit", "keyness_top_tokens",
    "image_moments_audit", "char_entropy_conditional",
    "image_ring_profile_audit", "image_exposure_audit",
    "image_entropy_audit", "casing_profile_docs",
    "reading_ease_docs", "smog_index_docs",
    "image_ordered_dither_audit", "heaps_exponent_halves",
    "image_rgb565_audit", "markdown_structure_docs",
    "line_dedup_stats", "word_entropy_conditional",
    "digit_run_stats", "image_quadrant_audit",
    "quote_ratio_docs",
]


def synth_docs(seed: int, n: int) -> pd.DataFrame:
    """Adversarial documents table: the tokenization / quality / dedup
    edge cases tame corpora never hit — empty and whitespace-only docs,
    punctuation floods, one giant unbroken token, control characters
    (tab / embedded NUL), quote+apostrophe soup, extreme repetition,
    planted exact-duplicate clusters and near-duplicate (one-suffix)
    pairs."""
    rng = np.random.default_rng(seed)
    vocab = np.array(["data", "table", "row", "scan", "the", "a", "fast",
                      "slow", "query", "spark", "hash", "merge", "sort",
                      "key", "value", "don't", "it's"])
    texts: list[str] = []
    for _ in range(n):
        kind = int(rng.integers(0, 10))
        if kind == 0:
            t = ""
        elif kind == 1:
            t = "   \t  \n "
        elif kind == 2:
            t = "!!!???;;;///***" * int(rng.integers(1, 30))
        elif kind == 3:
            t = "x" * int(rng.integers(1000, 5000))
        elif kind == 4:
            t = " ".join(rng.choice(vocab, 200))
        elif kind == 5:
            t = "Tab\there Null\x00inside end"
        elif kind == 6:
            t = '"quoted" \'apostrophes\' -- dashes'
        elif kind == 7:
            t = " ".join(rng.choice(vocab, int(rng.integers(1, 8))))
        elif kind == 8:
            t = ("repeat me " * 50).strip()
        else:
            t = " ".join(rng.choice(vocab, int(rng.integers(20, 120))))
        texts.append(t)
    for i in range(n // 10):                 # exact-duplicate clusters
        texts[n - 1 - i] = texts[i]
    # power-of-2 char lengths: ratios like punct/1024 are dyadic
    # trailing-5 half-cases for any round(9) contract (the quality_docs
    # class caught by seed 5) — plant them deterministically
    for j, ln2 in enumerate((256, 1024, 2048)):
        base = ("ab c! " * (ln2 // 6 + 1))[:ln2]
        texts[(n // 2 + j) % n] = base
    for i in range(n // 10, n // 10 + n // 20):   # near-dup pairs
        base = " ".join(rng.choice(vocab, 60))
        texts[i] = base
        texts[i + n // 3] = base + " extra"
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(["en", "de", "fr", "xx"], n),
        "source": rng.choice(["web", "book", "code"], n),
        "n_chars": pd.Series([len(t) for t in texts], dtype="int64"),
    })


# embeddings-centric oracle queries (the --emb mode). The rows-only ANN
# queries are deliberately EXCLUDED: their recall>=0.6 self-assert is a
# statistical bound that adversarial geometry may legitimately break.
EMB_QUERIES = [
    "label_cosine_pairs", "embedding_neardup", "ann_topk_embeddings",
    "embedding_dim_stats", "embedding_covariance",
    "embedding_dim_medians", "semantic_dedup_audit",
    # Lloyd monotonicity holds for ANY input; the ANN recall audit is
    # excluded for the same statistical-bound reason as ivf/lsh_topk
    "kmeans_invariant_audit", "embedding_quantization_audit",
    "pq_codebook_audit", "drift_kernel_struct_audit",
    # session-24: vector hygiene censuses
    "embedding_norm_band_counts", "embedding_sign_census",
    "embedding_clip_census", "jl_projection_audit",
]


def synth_embeddings(seed: int, n: int, d: int = 16) -> pd.DataFrame:
    """Adversarial embeddings table: zero vectors (norm handling),
    exact-duplicate vectors (cosine exactly 1.0, dedup keepers),
    antipodal pairs (cosine -1), tiny-norm vectors (float-precision
    stress), one huge-magnitude vector, axis-aligned one-hot rows
    (sparse dims) and duplicate labels across clusters."""
    rng = np.random.default_rng(seed)
    m = rng.normal(0, 1, (n, d))
    m[: n // 20] = 0.0                          # zero vectors
    for i in range(n // 20, n // 10):           # exact duplicates
        m[n - 1 - i] = m[i]
    m[n // 10] = -m[n // 10 + 1]                # antipodal pair
    m[n // 8] *= 1e-12                          # tiny norm
    # large-but-bounded magnitude: covariance's 6-decimal oracle
    # contract absorbs summation-order ulps only within a moderate
    # dynamic range (1e9 would make double-sum association visible
    # ABOVE 1e-6 — a float fact, not an engine bug)
    m[n // 7] *= 1e3
    for i in range(n // 6, n // 6 + d):         # one-hot axis rows
        m[i] = 0.0
        m[i, (i - n // 6) % d] = 1.0
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [r.astype(np.float32).tolist() for r in m],
        "label": rng.integers(0, 6, n).astype(np.int32),
    })


def main_emb(seed: int = 0, n: int = 400) -> None:
    work = f"/tmp/fuzz_emb_seed{seed}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    for f in os.listdir(BASE):
        if f.endswith(".parquet") and f != "embeddings.parquet":
            os.symlink(os.path.join(BASE, f), os.path.join(work, f))
    df = synth_embeddings(seed, n)
    tbl = pa.table({
        "vec_id": pa.array(df.vec_id.to_numpy()),
        "embedding": pa.array(df.embedding.tolist(),
                              type=pa.list_(pa.float32())),
        "label": pa.array(df.label.to_numpy(), pa.int32()),
    })
    pq.write_table(tbl, os.path.join(work, "embeddings.parquet"),
                   row_group_size=64)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import check_oracle  # noqa: E402

    check_oracle.main(work, EMB_QUERIES)


def main_docs(seed: int = 0, n: int = 400) -> None:
    work = f"/tmp/fuzz_docs_seed{seed}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    for f in os.listdir(BASE):
        if f.endswith(".parquet") and f != "documents.parquet":
            os.symlink(os.path.join(BASE, f), os.path.join(work, f))
    tbl = pa.Table.from_pandas(synth_docs(seed, n), preserve_index=False)
    pq.write_table(tbl.replace_schema_metadata(None),
                   os.path.join(work, "documents.parquet"),
                   row_group_size=64)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import check_oracle  # noqa: E402

    check_oracle.main(work, DOC_QUERIES)


def main(seed: int = 0, n: int = 4000) -> None:
    work = f"/tmp/fuzz_oracle_seed{seed}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    for f in os.listdir(BASE):
        if f.endswith(".parquet") and f != "events.parquet":
            os.symlink(os.path.join(BASE, f), os.path.join(work, f))
    df = synth_events(seed, n)
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    # from_pandas turns NaN into NULL; rebuild the value column so true
    # NaN survives as NaN and only value_null_mask positions are NULL
    vcol = pa.array(df.value.to_numpy(np.float64),
                    mask=df.attrs["value_null_mask"])
    tbl = tbl.set_column(tbl.schema.get_field_index("value"), "value", vcol)
    pq.write_table(tbl.replace_schema_metadata(None),
                   os.path.join(work, "events.parquet"),
                   row_group_size=512)  # many row groups -> many blocks

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import check_oracle  # noqa: E402

    check_oracle.main(work, EVENT_QUERIES)


if __name__ == "__main__":
    args = sys.argv[1:]
    flags = [a for a in args if a.startswith("--")]
    rest = [a for a in args if not a.startswith("--")]
    unknown = [f for f in flags if f not in ("--docs", "--emb")]
    if unknown:
        sys.exit(f"fuzz_oracle: unknown flag(s) {unknown}")
    seed = int(rest[0]) if rest else 0
    if "--docs" in flags:
        main_docs(seed, int(rest[1]) if len(rest) > 1 else 400)
    elif "--emb" in flags:
        main_emb(seed, int(rest[1]) if len(rest) > 1 else 400)
    else:
        main(seed, int(rest[1]) if len(rest) > 1 else 4000)
