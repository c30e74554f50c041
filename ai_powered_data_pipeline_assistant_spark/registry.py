"""Central query registry: every implemented operator exposed as a named
(spark, sf_dir) -> DataFrame callable, with its DuckDB oracle SQL when the
semantics are ANSI-SQL-expressible.

This is the engine's public API surface — the analogue of the reference's
tool registry (reference backend/tools/tool_registry.py:79-316), with tools
replaced by DataFrame pipelines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ai_powered_data_pipeline_assistant_spark.operators import (
    aggregates,
    batching,
    behavior,
    clustering,
    corpus,
    curation,
    dedup,
    diagnostics,
    embedding_pipeline,
    embedding_stats,
    entity,
    graphs,
    incremental,
    joins,
    market,
    multimodal,
    neardup_cluster,
    packing,
    pipeline,
    relational,
    repetition,
    scalar_ops,
    scoring,
    surface_audits,
    text_analysis,
    tpch,
    vector,
    webcorpus,
    windows,
)
from ai_powered_data_pipeline_assistant_spark.sources import formats, layout

_MODULES = [
    relational,
    aggregates,
    batching,
    behavior,
    joins,
    vector,
    dedup,
    text_analysis,
    curation,
    clustering,
    pipeline,
    repetition,
    neardup_cluster,
    diagnostics,
    corpus,
    webcorpus,
    packing,
    scoring,
    surface_audits,
    windows,
    scalar_ops,
    incremental,
    entity,
    graphs,
    market,
    multimodal,
    embedding_pipeline,
    embedding_stats,
    tpch,
    formats,
    layout,
]

QueryFn = Callable[[SparkSession, str], DataFrame]

# The correctness driver checks the FIRST 50 registry entries per round, so
# ordering decides which queries get a driver verdict. Round-3 window:
# (a) every round-1/2 red row re-landed with its representation fix
# (HUGEINT sums CAST AS BIGINT; array outputs scalarized) or replaced by
# its driver-scorable twin (recall/accuracy audits for the no-oracle
# approx/LSH rows), (b) the new §2 surface twins, and (c) never-checked
# high-value families (TPC-H tail, curation/neardup, family
# representatives). Remaining never-checked queries rotate per the pools
# in ROADMAP.md; run scripts/next_window.py before each rotation.
_DRIVER_WINDOW: tuple[str, ...] = (
    # -- round-1/2 red rows, fixed this round (HUGEINT casts / scalarized) --
    "validation_rules",
    "json_extract_agg",
    "sessionize",
    "salted_skew_join",
    "media_summary",
    "tpch_q12",
    "winnow_fingerprints",
    "map_column_ops",
    "pivot_counts",
    "top_users_collected",
    "repetition_stats",
    # -- round-1 nanos-blocked, never re-checked --
    "chat_display_page",
    "cube_counts",
    "value_percentiles",
    # -- driver-scorable replacements for the permanently-no_oracle reds
    # (ann_lsh_topk/embedding_neardup_lsh/quality_metrics_approx/... moved to
    # the library surface; these twins pin the same behavior with oracles) --
    "ann_ivf_topk",
    "ann_lsh_recall",
    "embedding_neardup_lsh_recall",
    "quality_metrics_approx_audit",
    "distinct_users_approx_audit",
    "value_percentiles_approx_audit",
    # -- §2 surfaces previously pytest-only, now driver-scorable twins
    # (P9/O9, F3, S12, S9/S10, A5, U5, U6 — operators/surface_audits.py) --
    "sql_gate_audit",
    "log_scrub",
    "update_by_id",
    "insert_append_audit",
    "cache_hit_simulation",
    "nl2sql_audit",
    "tool_registry_audit",
    # -- never driver-checked: TPC-H tail --
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q11",
    "tpch_q13",
    "tpch_q15",
    "tpch_q17",
    "tpch_q20",
    "tpch_q22",
    # -- never checked: curation / dedup-at-scale family --
    "curate_corpus",
    "curation_funnel",
    "token_budget",
    "decontaminate",
    "span_dedup",
    "bloom_dedup_gate",
    "neardup_clusters",
    "neardup_keep_best",
    "ann_ivf_pruned",
    # -- never checked: family representatives (rest rotate round 4) --
    "funnel_counts",
    "cohort_retention",
    "corrupt_records_audit",
    "scd2_apply",
    # -- never checked: packing (distributed prefix-sum) --
    "pack_sequences",
)
# Rotated out to round 4 (driver caps at 50): neardup_degree_stats,
# daily_counts_gapfill, event_gaps, activity_heatmap, event_transitions,
# value_anomalies, chars_histogram, top_docs_per_lang, jsonl_roundtrip_agg,
# csv_roundtrip_agg, orc_roundtrip_agg, incremental_daily_rollup,
# snapshot_diff, train_test_split, stratified_sample — same query classes
# as retained window members.


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _MODULES:
        for name, fn in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name {name!r}")
            out[name] = fn
    missing = [n for n in _DRIVER_WINDOW if n not in out]
    if missing:
        raise ValueError(f"_DRIVER_WINDOW names unknown queries: {missing}")
    ordered = {name: out[name] for name in _DRIVER_WINDOW}
    ordered.update((n, f) for n, f in out.items() if n not in ordered)
    return ordered


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        for name, sql in getattr(mod, "ORACLES", {}).items():
            if sql is not None:
                out[name] = sql
    return out
