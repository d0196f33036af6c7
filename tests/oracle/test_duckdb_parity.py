"""DuckDB oracle equivalence (SURVEY.md §5 layer 2): every queries()
entry with an oracle_sql() twin must match on row count, column names,
and order-insensitive values — the same comparison the driver runs at
sf0.01 (here at sf0.001 for speed).
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as m

    return m


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


# THE comparison helpers — shared with maestro_ray.validate (the
# full-contract CLI) so pytest and CLI verdicts can never drift.
from maestro_ray.oracle_compare import kinds, normalize, to_df  # noqa: E402


def _all_names(entry_mod):
    return sorted(entry_mod.oracle_sql().keys())


# keep in sync with oracle_sql() (asserted by
# test_param_list_covers_all_oracles); static for -k selection
ORACLE_NAMES = [
    "link_graph", "triangle_count", "classification_report",
    "html_meta", "dedup_window", "common_neighbors", "winsorize",
    "cusum_anomaly", "skyline", "interval_merge", "bigram_top",
    "calibration_curve", "dataset_split", "window_moving_corr",
    "read_pages", "read_changelog", "clean_fields", "validate_rows",
    "filter_rows", "project", "key_gen", "json_extract", "explode",
    "scalar_string", "scalar_date", "scalar_math", "scalar_null",
    "agg_global", "agg_grouped", "distinct", "sort", "topk",
    "join_broadcast", "join_hash", "join_asof", "join_semi", "join_anti",
    "union_all", "intersect", "except_", "dedup_exact", "upsert_lww",
    "window_tumbling", "sessionize", "stateful_scorer", "token_count",
    "quality_score", "knn_brute", "window_sliding", "scalar_array",
    "pipeline_topk_revenue", "pipeline_nation_revenue", "model_score",
    "checksum", "approx_distinct", "fingerprint", "approx_distinct_grouped",
    "simhash", "lang_detect", "multimodal_decode", "audio_features",
    "video_meta", "dedup_near_clusters", "dedup_ngram",
    "pipeline_corpus_curation",
    "grouped_topk", "quantiles", "embedding_dup_exact",
    "window_lag", "pivot", "text_normalize", "rdbms_import", "video_frames",
    "video_pixels", "video_mjpeg",
    "join_range", "join_band", "window_rank", "rollup", "string_agg",
    "quantiles_cont", "join_skew", "grouped_quantiles", "histogram",
    "grouped_quantiles_cont", "intersect_all", "except_all",
    "sample_exact_k", "count_distinct_grouped", "window_distinct",
    "pivot_sum", "distinct_on",
    "heavy_hitters", "chunk_documents", "sample_hash", "sample_stratified",
    "term_stats", "tfidf", "window_moving",
    "corr_grouped", "mode_grouped", "cube", "window_analytic",
    "join_bloom",
    "url_parse", "domain_stats", "pii_redact", "repetition_stats",
    "dedup_lines", "entropy_grouped", "unpivot", "join_outer",
    "skew_kurt_grouped", "grouping_sets", "window_moving_range",
    "ffill", "gap_fill", "mad_grouped", "argmax_grouped", "window_ntile",
    "boilerplate_remove", "blocklist_count",
    "linreg_grouped", "bitbool_grouped", "perplexity_score",
    "warc_import", "avro_import", "orc_import", "watermark_late",
    "funnel",
    "cohort_retention",
    "window_lag_n",
    "weighted_avg", "decontaminate", "pack_sequences",
    "graph_components", "pipeline_pretrain_pack", "join_cross",
    "window_row_number_global", "vector_mean_grouped", "join_fuzzy",
    "pipeline_quality_gate",
    "scd2_history", "bm25_search", "covariance_matrix", "mixture_sample",
    "join_asof_near", "window_ewma", "merge_into", "explode_pos",
    "edit_distance", "knn_filtered", "window_running",
    "window_moving_median", "standardize", "one_hot", "categorical_encode",
    "ohlc", "interp_fill", "tfidf_topk",
    "window_moving_std", "outlier_iqr", "agg_filtered",
    "heavy_hitters_grouped", "url_canonical",
    "dedup_substring", "zorder_key", "zorder_cluster", "xml_import",
    "search_index",
    "markov_transitions", "sequence_gaps", "token_explode", "user_rfm",
    "table_diff", "attribution", "chi2_independence", "profile_table",
    "sample_weighted", "quantile_exact_big",
    "spearman_corr", "grouped_topk_ties", "ratio_to_report",
    "dedup_consecutive", "ab_test", "power_means", "weighted_median",
    "running_distinct", "autocorr", "sample_group_k", "pct_change",
    "group_rank",
    "gini_grouped", "trimmed_mean", "benford_digits", "drift_psi",
    "anomaly_zscore", "bin_equal_width", "target_encode",
    "sqlite_import", "readability",
    "auc_score", "twap", "market_basket", "jaccard_sets", "bfs_levels",
    "assoc_rules", "gain_curve", "top_paths", "histogram2d",
    "interval_overlap", "mutual_info", "item_cf", "kaplan_meier",
    "spatial_join", "data_quality", "zipf_fit",
    "ks_test", "mann_whitney", "cramers_v", "collocations",
    "active_users", "lagged_corr", "naive_bayes",
    "bin_equal_depth", "decision_stump", "link_jaccard",
    "seasonal_decompose",
    "holt_winters", "outlier_mad", "assortativity", "funnel_time",
    "robust_scale", "quantile_transform",
    "kendall_trend", "window_moving_slope", "clustering_coeff",
    "join_jaro", "ngram_diversity", "anova_oneway", "dbscan",
    "jaro_scalar", "theil_sen",
    "sssp", "label_propagation", "stem_top", "isotonic_calibration",
    "sssp_partitioned", "cliffs_delta", "hill_tail",
    "holt_winters_seasonal", "dag_layers",
    "state_durations", "cohen_kappa", "reciprocity",
]


def test_param_list_covers_all_oracles(entry_mod):
    assert sorted(ORACLE_NAMES) == _all_names(entry_mod)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(entry_mod, con, sf_dir, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got_raw = to_df(q(sf_dir))
    exp_raw = con.execute(sql).fetch_df()
    got = normalize(got_raw)
    exp = normalize(exp_raw)
    if len(exp) == 0 and len(got) == 0:
        return  # empty both sides: schema of an empty Ray result may be lost
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert kinds(got_raw) == kinds(exp_raw), (
        f"{name}: dtype-kind drift (engine vs oracle) — "
        f"{kinds(got_raw)} != {kinds(exp_raw)}"
    )
    assert len(got) == len(exp), f"{name}: {len(got)} rows != {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True,
                                  obj=name)


def test_every_oracle_key_has_query(entry_mod):
    qs = entry_mod.queries()
    for name in entry_mod.oracle_sql():
        assert name in qs, f"oracle_sql key {name} missing from queries()"


def test_rows_only_queries_run(entry_mod, sf_dir):
    """Entries without SQL twins must still run and return rows."""
    qs = entry_mod.queries()
    oracle = entry_mod.oracle_sql()
    for name in set(qs) - set(oracle):
        res = qs[name](sf_dir)
        df = normalize(res)
        assert len(df) >= 0, name
