"""Driver-contract conformance: every queries() entry with an
oracle_sql() twin must match DuckDB exactly (row count + schema +
order-insensitive values) at sf0.001 — the same comparison the driver
runs at sf0.01."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"

# SQL-backed queries (cheap subset runs per-test for precise failure
# attribution; the full sweep is tools/check_oracle.py)
SQL_BACKED = [
    "doc_corpus_stats",
    "doc_n50",
    "doc_quality_flags",
    "length_bin_profile",
    "source_lang_profile",
    "control_anti_join",
    "sample_semi_join",
    "user_sessions",
    "top_docs",
    "cohort_union",
    "deterministic_sample",
    "stratified_sample_docs",
    "pack_docs",
    "pricing_summary",
    "nation_revenue",
    "order_revenue_join",
    "windowed_event_stats",
    "purchase_click_asof",
    "event_window_range_join",
    "user_rolling_value",
    "value_quantiles",
    "user_occupancy",
    "user_gap_profile",
    "user_activity_intervals",
    "approx_distinct_users",
    "approx_users_by_type",
    "top_events_per_user",
    "user_value_lag",
    "funnel_conversion",
    "corr_quantity_price",
    "event_props_extract",
    "event_value_quantiles_by_type",
    "parts_never_bulk_ordered",
    "dedup_exact",
    "dedup_minhash",
    "ngram_jaccard_pairs",
    "simhash_docs",
    "simhash_near_dups",
    "contamination_docs",
    "chunk_dedup_docs",
    "vocab_top_tokens",
    "bigram_collocations",
    "repetition_docs",
    "user_retention",
    "salient_terms_per_source",
    "fuzzy_span_docs",
    "embedding_near_dups",
    "ann_topk",
    "token_stats",
    "quality_scores",
    "doc_fingerprints",
    "pii_scrub_docs",
    "toxicity_docs",
    # round-3 twins: generated SQL (planes as literals, k-means
    # unrolled into MATERIALIZED CTEs, footer-vs-data cross-check)
    "ann_lsh",
    "ann_ivf",
    "embedding_clusters",
    "file_footer_profile",
    "dup_components",
    "shipping_priority",
    "returned_item_revenue",
    "hopping_window_stats",
    "weighted_sample_docs",
    "embedding_near_dups_lsh",
]


@pytest.fixture(scope="module")
def sql_keys():
    import __ray_entry__ as entrymod

    return set(entrymod.oracle_sql()), set(entrymod.queries())


def test_oracle_keys_subset_of_queries(sql_keys):
    sqls, qs = sql_keys
    assert sqls <= qs, f"oracle_sql keys missing from queries: {sqls - qs}"
    assert set(SQL_BACKED) == sqls


@pytest.mark.parametrize("name", SQL_BACKED)
def test_query_matches_duckdb(name):
    from tools.check_oracle import run_checks

    res = run_checks(SF_DIR, only={name}, verbose=False)
    assert res[name] == [], f"{name}: {res[name]}"


def test_rows_only_queries_run():
    """Rows-only ops must at least execute and return a stable schema."""
    import __ray_entry__ as entrymod
    from tools.check_oracle import to_pandas

    qs = entrymod.queries()
    rows_only = set(qs) - set(entrymod.oracle_sql())
    # cheap subset (model-scorer pipelines are covered by e2e tests)
    for name in ["lang_id_docs", "file_attributes"]:
        assert name in rows_only
        df = to_pandas(qs[name](SF_DIR))
        assert len(df.columns) >= 2
