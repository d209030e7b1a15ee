"""t2 mirror: every registry query vs its DuckDB oracle at small scale."""

from __future__ import annotations

import pytest

from energy_datalake_solution_spark.plans.registry import QUERIES, get_queries

from .conftest import SF_ORACLE
from .oracle_harness import compare, duck_connection

get_queries()  # populate registry
ALL = sorted(QUERIES)
WITH_ORACLE = [n for n in ALL if QUERIES[n].oracle is not None]
ROWS_ONLY = [n for n in ALL if QUERIES[n].oracle is None]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    spark_df = spec.fn(spark, SF_ORACLE)
    duck_df = duck.execute(spec.oracle).fetchdf()
    problems = compare(spark_df, duck_df, name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"customer_id", "customer_name", "total_revenue"} == set(df.columns)


def test_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 10


# ---------------------------------------------------------------------------
# Driver-gate freshness guard. The driver writes CORRECTNESS_r{N}.json at
# the repo root each round (committed with the round's bookkeeping); those
# artifacts are the single source of truth for what has actually been
# driver-checked. Two verification tiers matter:
#   * HASH-green: a round where hash_match was True — the full value-level
#     oracle comparison. Required once for every ORACLED query.
#   * rows-seen: the query ran and returned rows (hash_match null for
#     rows-only queries). Sufficient only for oracle=None queries.
# The round-7/8 blind spot this structure closes: a query whose oracle
# GRADUATES (rows-only -> oracled) has rows-seen history but no hash-green
# row, and the old has-any-driver-row set treated it as covered — its
# oracle could sit unchecked forever. Splitting the tiers forces it into
# the active window until a hash-green row lands.
# ---------------------------------------------------------------------------


def _driver_history(root):
    """(hash_green, rows_seen) name-sets from CORRECTNESS_r*.json files."""
    import json

    hash_green, rows_seen = set(), set()
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(f.read_text()).items():
            rows_seen.add(name)
            if row.get("hash_match"):
                hash_green.add(name)
    return hash_green, rows_seen


def _unverified_outside_window(queries, hash_green, rows_seen, window):
    """Names that the active gate window MUST contain but doesn't:
    oracled queries with no hash-green row, and rows-only queries the
    driver has never even run."""
    need = {
        n
        for n, spec in queries.items()
        if (n not in hash_green)
        if (spec.oracle is not None or n not in rows_seen)
    }
    return sorted(need - set(window))


# Legacy frozen union (rounds 1-6, has-any-driver-row) — kept only as a
# floor for test_surface fallback when artifacts are absent (fresh clone).
DRIVER_GREEN = frozenset({
    # --- round 6 rows (CORRECTNESS_r06.json; the 6 round-6-born
    #     queries — the other 44 r06 rows re-greened earlier entries) ---
    "multimodal_jpeg_pixel_stats", "snapshot_zorder_rect_read",
    "docs_more_like_this", "snapshot_schema_evolution_read",
    "snapshot_mor_delete_read", "snapshot_change_feed_orders",
    # --- round 5 rows (CORRECTNESS_r05.json; the 23 round-5-born
    #     queries — the other 27 r05 rows re-greened earlier entries) ---
    "docs_bm25_decontam_report", "docs_bm25_probe", "docs_bm25_topk",
    "docs_curation_scorecard", "docs_dedup_keep_best", "docs_dsir_weights",
    "docs_epoch_shuffle", "docs_length_bucket_batches",
    "docs_ngram_novelty", "docs_normalize_text", "docs_source_budget_cap",
    "docs_temperature_sample", "embeddings_clustered_exact_topk",
    "embeddings_clustered_ivf_probe", "embeddings_ivf_probe",
    "embeddings_lsh_probe", "events_resample_hourly_ffill_sharded",
    "events_user_heavy_hitters", "multimodal_gif_pixel_stats",
    "multimodal_png_pixel_stats", "snapshot_bloom_point_lookup_orders",
    "snapshot_pruned_range_read", "snapshot_retention_delete_orders",
    # --- round 4 rows (CORRECTNESS_r04.json; the 19 round-4-born queries —
    #     the other 31 r04 rows re-greened earlier rounds' entries) ---
    "multimodal_wav_pcm_stats", "tpch_q2_min_cost_supplier",
    "tpch_q9_product_type_profit", "tpch_q11_important_part_stock",
    "embeddings_int8_quantization", "docs_sequence_packing",
    "docs_sequence_packing_stats", "multimodal_bmp_pixel_stats",
    "docs_pii_redaction", "docs_pii_report", "star_integrity_audit",
    "orders_cdc_snapshot_diff", "events_value_approx_percentiles",
    "orders_scd2_temporal_join", "window_function_suite",
    "docs_split_token_drift", "events_resample_hourly_ffill",
    "snapshot_versioned_orders", "docs_feature_hash_vectors",
    # --- round 3 rows (CORRECTNESS_r03.json) ---
    "embeddings_knn_graph", "docs_bpe_encode", "lineitem_zorder_layout",
    "docs_incremental_simhash_dedup", "knn_graph_indegree",
    "knn_graph_pagerank", "parts_fuzzy_name_pairs",
    "events_value_iqr_udaf", "docs_chunk_udtf", "knn_label_consistency",
    "scd2_customer_dim", "docs_dup_rate_by_source",
    "docs_duplicate_span_pairs", "docs_duplicate_span_stats",
    "docs_chunk_fixed_tokens", "docs_multitier_dup_pairs",
    "docs_bigram_lm_score", "docs_lm_quality_buckets",
    "docs_lm_score_pandas_kernel", "corpus_bigram_merge_candidates",
    "corpus_bpe_merges", "corpus_vocabulary", "docs_repetition_stats",
    "docs_tfidf_top_terms", "docs_stratified_sample",
    "docs_domain_mix_weights", "events_value_percentiles",
    "events_value_histogram", "events_funnel_view_click_purchase",
    "events_weekly_cohort_retention", "embeddings_semantic_dedup",
    "multimodal_header_sniff", "unpivot_nation_balances",
    "profile_lineitem_numeric", "full_outer_spend_activity_reconciliation",
    "window_rolling_7day_customer_spend", "basket_part_pairs",
    "source_quality_dashboard", "orders_monthly_growth",
    "customer_rfm_segments",
    # --- rounds 1+2 rows ---
    "anti_join_parts_never_shipped", "approx_distinct_parts",
    "audit_enrichment", "conditional_agg_filter_clause",
    "correlated_subquery_above_avg_size", "count_customers",
    "cube_order_counts", "customer_category", "date_function_suite",
    "dedup_latest_order_per_customer", "derived_line_revenue",
    "distinct_counts", "docs_bpe_token_counts", "docs_dedup_clusters",
    "docs_deterministic_split", "docs_exact_dedup", "docs_fingerprint",
    "docs_lang_id", "docs_minhash_lsh_pairs", "docs_ngram_jaccard_pairs",
    "docs_pack_sequences", "docs_quality_score", "docs_simhash",
    "docs_simhash_near_dups", "docs_split_contamination",
    "docs_token_stats", "docs_training_corpus",
    "docs_winnowed_fingerprints", "embeddings_cosine_near_dups",
    "embeddings_cosine_topk", "embeddings_ivf_ann", "embeddings_lsh_ann",
    "embeddings_norm_stats", "events_asof_error_to_click",
    "events_daily_user_activity", "events_json_props",
    "events_range_join_error_click_pairs", "events_sessionization",
    "events_sliding_30m", "events_tumbling_hourly",
    "events_value_outliers", "fixtures_etl_curated",
    "grouping_sets_revenue", "hashed_customer_id",
    "lateral_explode_tokens", "left_join_customer_order_counts",
    "merge_upsert_orders", "multimodal_frame_counts",
    "multimodal_payload_stats", "multimodal_resize_stats", "null_filter",
    "pivot_quantity_by_status", "rollup_revenue",
    "scalar_subquery_max_order", "semi_join_customers_with_orders",
    "setop_segments", "skew_salted_agg_event_types",
    "skew_salted_join_event_enrich", "star_join_lineitem",
    "stats_quantity_by_flag", "string_function_suite",
    "suppliers_per_nation", "top_customers_by_revenue",
    "tpch_q10_returned_items", "tpch_q12_priority_classes",
    "tpch_q13_customer_distribution", "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier", "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity_revenue", "tpch_q18_large_orders",
    "tpch_q19_disjunctive_revenue", "tpch_q1_pricing_summary",
    "tpch_q20_heavy_red_part_suppliers", "tpch_q21_waiting_suppliers",
    "tpch_q22_dormant_customers", "tpch_q3_shipping_priority",
    "tpch_q4_order_priority", "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue", "tpch_q7_volume_shipping",
    "tpch_q8_market_share", "typed_projection", "window_order_gap_days",
    "window_running_customer_spend", "window_top3_orders_per_customer",
})

GATE_WINDOW = 50  # the driver's correctness gate samples this many entries


def test_surface_orders_name_registered_queries():
    """Every name in the gate-ordering tuples must be a registered query —
    a rename that orphans an entry would silently shrink the driver's
    checked window."""
    from energy_datalake_solution_spark.plans.registry import SURFACE_ORDER

    for name in SURFACE_ORDER:
        assert name in QUERIES, name
    assert len(set(SURFACE_ORDER)) == len(SURFACE_ORDER)


def test_never_checked_queries_sit_inside_gate_window():
    """Every ORACLED query without a driver HASH-green row in the
    committed CORRECTNESS history, and every rows-only query the driver
    has never run, must appear in the first GATE_WINDOW entries of the
    ACTIVE surface order — registering (or GRADUATING the oracle of) a
    query outside the window fails CI instead of silently deferring its
    verification to a future rotation."""
    from pathlib import Path

    from energy_datalake_solution_spark.plans.registry import SURFACE_ORDER

    root = Path(__file__).resolve().parents[1]
    hash_green, rows_seen = _driver_history(root)
    if not rows_seen:  # fresh clone without driver artifacts: legacy floor
        hash_green = rows_seen = DRIVER_GREEN
    outside = _unverified_outside_window(
        QUERIES, hash_green, rows_seen, SURFACE_ORDER[:GATE_WINDOW]
    )
    assert not outside, (
        f"{len(outside)} queries whose oracle has never been driver-hash-"
        f"checked sit outside the first {GATE_WINDOW} entries of "
        f"SURFACE_ORDER: {outside}. Add them to the window prefix."
    )

    green_frozen_but_unregistered = sorted(DRIVER_GREEN - set(QUERIES))
    assert not green_frozen_but_unregistered, green_frozen_but_unregistered


def test_gate_guard_catches_rows_only_to_oracle_graduation():
    """The round-7/8 blind spot, synthetically: a query with rows-seen
    history but no hash-green row that ACQUIRES an oracle must be flagged
    when left outside the window — rows-only history must not satisfy an
    oracled query's verification requirement."""
    from types import SimpleNamespace

    queries = {
        "graduated": SimpleNamespace(oracle="SELECT 1 AS one"),
        "still_rows_only": SimpleNamespace(oracle=None),
        "hash_checked": SimpleNamespace(oracle="SELECT 2 AS two"),
    }
    hash_green = {"hash_checked"}
    rows_seen = {"graduated", "still_rows_only", "hash_checked"}
    # graduated is outside the window: MUST be flagged
    out = _unverified_outside_window(
        queries, hash_green, rows_seen, window=["hash_checked"]
    )
    assert out == ["graduated"]
    # inside the window: clean
    out = _unverified_outside_window(
        queries, hash_green, rows_seen, window=["graduated"]
    )
    assert out == []
    # a rows-only query with rows-seen history needs no window slot, but
    # a NEVER-run rows-only query does
    out = _unverified_outside_window(
        queries, hash_green, rows_seen=set(), window=["graduated"]
    )
    assert out == ["still_rows_only"]


def test_registry_counts_are_what_the_docs_claim():
    """One authority for the registry's size: the registry itself. README's
    operator-surface header must carry the live counts (total / oracled /
    rows-only), so adding a query without updating the docs fails here
    instead of drifting (round-4 verdict caught three stale counts)."""
    from pathlib import Path

    total = len(QUERIES)
    oracled = sum(1 for s in QUERIES.values() if s.oracle)
    rows_only = total - oracled
    readme = (Path(__file__).resolve().parent.parent / "README.md").read_text()
    expected = (
        f"{total} registered queries — {oracled} DuckDB-oracle-gated, "
        f"{rows_only} rows-only"
    )
    assert expected in readme, (
        f"README operator-surface header out of date: expected {expected!r}"
    )
    # the newest SCALING fleet-audit section must be pinned to the live
    # registry size too (round-5 verdict caught the sweep recorded at a
    # stale count — the audit is only evidence if it covered everything)
    scaling = (Path(__file__).resolve().parent.parent / "SCALING.md").read_text()
    last_audit = scaling.rfind("## Fleet-wide plan audit")
    assert last_audit >= 0
    assert f"all **{total}** registered queries" in scaling[last_audit:], (
        f"latest SCALING.md fleet-audit section not pinned to {total} queries"
    )
