"""Named-query registry — the engine's query surface.

The reference drives its analytics through a name -> SQL-file registry
executed in a loop (reference: scripts/main_analytics.py:26-43). Here the
same idea is a decorator registry mapping a query name to:

  * ``fn(spark, sf_dir) -> DataFrame`` — the PySpark implementation
    (DataFrame API, Catalyst-optimized), and
  * ``oracle`` — an equivalent ANSI-SQL string runnable by DuckDB over the
    same parquet tables, used as an independent correctness oracle.

Queries with no SQL-expressible equivalent (approximate LSH joins, seeded
ML models) register ``oracle=None`` and get a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str] = None  # ANSI SQL for DuckDB; None => rows-only check
    headline: bool = False        # include in bench.py timing loop
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: Optional[str] = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
):
    """Decorator: add a query to the engine's registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            headline=headline,
            tags=tuple(tags),
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def _load_all() -> None:
    """Import operator modules for their registration side effects."""
    from ..operators import (  # noqa: F401
        ann_index,
        corpus,
        dedup,
        events,
        fixtures,
        fuzzy,
        graph,
        integrity,
        layout,
        lm,
        multimodal,
        packing,
        pii,
        pq_index,
        quantize,
        relational,
        relational_ext,
        retrieval,
        similarity,
        skew,
        spans,
        temporal,
        text,
        tpch,
        udx,
    )


# Explicit surface order — ROUND-13 ACTIVE WINDOW. External harnesses that
# sample a prefix of the query surface (a correctness gate bounded to the
# first ~50 entries) see this ordering. Composition rule (enforced by
# tests/test_queries_oracle.py's guard, which reads the committed
# CORRECTNESS_r*.json artifacts directly): (1) queries BORN this round
# lead (5: identity, maintenance fixture, lifecycle fixture, Adam7
# PNG, multi-strip TIFF);
# (2) anti_join_parts_never_shipped follows — hash-green in history but
# RE-TARGETED this round (the old 0-row form verified nothing), so it
# counts as never-checked in its current semantics; (3) the 5 rows the
# r12 window displaced (latest green r8); (4) the stalest remaining
# cohort — the 50-query r9-green set, of which 39 fit; its alphabetical
# tail (star_integrity_audit .. window_running_customer_spend, 11
# rows) leads the r14 rotation. All stay continuously DuckDB-oracled by
# tests/test_queries_oracle.py regardless.
SURFACE_ORDER: tuple[str, ...] = (
    # --- born round 13, never driver-checked (new queries go HERE, at
    #     the top, so the gate window always sees them first) ---
    "snapshot_identity_read",
    "snapshot_maintenance_read",
    "snapshot_lifecycle_read",
    "multimodal_png_adam7_stats",
    "multimodal_tiff_multistrip_stats",
    # --- re-targeted this round (0-row gate de-vacuated) ---
    "anti_join_parts_never_shipped",
    # --- displaced from the r12 window: latest hash-green round 8 ---
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "unpivot_nation_balances",
    "window_rolling_7day_customer_spend",
    # --- latest hash-green round 9: the stalest cohort (first 39) ---
    "conditional_agg_filter_clause",
    "docs_bm25_decontam_report",
    "docs_bm25_probe",
    "docs_bm25_topk",
    "docs_bpe_token_counts",
    "docs_curation_scorecard",
    "docs_dedup_keep_best",
    "docs_deterministic_split",
    "docs_dsir_weights",
    "docs_epoch_shuffle",
    "docs_fingerprint",
    "docs_lang_id",
    "docs_length_bucket_batches",
    "docs_minhash_lsh_pairs",
    "docs_ngram_novelty",
    "docs_normalize_text",
    "docs_pack_sequences",
    "embeddings_clustered_exact_topk",
    "events_sliding_30m",
    "grouping_sets_revenue",
    "hashed_customer_id",
    "left_join_customer_order_counts",
    "multimodal_bmp_pixel_stats",
    "multimodal_frame_counts",
    "multimodal_jpeg_color_pixel_stats",
    "multimodal_video_container_stats",
    "multimodal_wav_pcm_stats",
    "null_filter",
    "orders_cdc_snapshot_diff",
    "orders_scd2_temporal_join",
    "pivot_quantity_by_status",
    "rollup_revenue",
    "scalar_subquery_max_order",
    "semi_join_customers_with_orders",
    "setop_segments",
    "snapshot_cdf_updates_read",
    "snapshot_type_widening_read",
    "snapshot_versioned_orders",
    "snapshot_zorder3_box_read",
)


def _ordered() -> dict[str, QuerySpec]:
    """Registry in surface order: SURFACE_ORDER first, the rest in
    registration order."""
    out: dict[str, QuerySpec] = {}
    for name in SURFACE_ORDER:
        if name in QUERIES:
            out[name] = QUERIES[name]
    for name, spec in QUERIES.items():
        if name not in out:
            out[name] = spec
    return out


def get_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in _ordered().items()}


def get_oracles() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None}


def get_headliners() -> dict[str, QuerySpec]:
    _load_all()
    return {name: spec for name, spec in QUERIES.items() if spec.headline}
