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
    stream_parity,
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
    stream_parity,
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
# ordering decides which queries get a driver verdict. Round-4 window:
# (a) re-checks for every operator whose code changed this round (guarded
# label broadcasts, salted batch top-k, the insertion-anchored cache
# policy rewrite), (b) the four new driver-scorable twins (embedder golden
# checksums + the three streaming-vs-batch parity rows), and (c)
# never-checked entries, graph/entity/market families first per the
# round-3 verdict. Remaining never-checked queries rotate per the pools
# in ROADMAP.md; run scripts/next_window.py before each rotation.
_DRIVER_WINDOW: tuple[str, ...] = (
    # -- re-checks: code changed in round 4, r3-green rows must stay green --
    "cluster_safe_split",
    "neardup_keep_best",
    "ann_brute_topk",
    "ann_ivf_topk",
    "cache_hit_simulation",
    # -- new this round: U2 golden-checksum twin + streaming parity rows --
    "embedder_probe_audit",
    "cdc_stream_parity",
    "funnel_stream_parity",
    "session_stream_parity",
    # -- never checked: graph / entity / market families --
    "event_pagerank",
    "markov_prediction_audit",
    "event_trigrams",
    "entity_match_pairs",
    "entity_clusters",
    "entity_canonical_rollup",
    "basket_pairs",
    "item_recommendations",
    "knn_join",
    "weighted_median",
    # -- never checked: semantic / incremental dedup tail --
    "semantic_dedup",
    "semantic_decontaminate",
    "containment_pairs",
    "crosscorpus_neardup",
    "daily_dedup_ledger",
    "split_contamination_audit",
    "neardup_triangles",
    "neardup_cluster_sizes",
    "minhash_calibration_audit",
    "doc_duplication_share",
    "lsh_parameter_plan",
    "dedup_method_report",
    # -- never checked: retrieval quality --
    "hybrid_search_rrf",
    "retrieval_ndcg",
    "ivf_balance_report",
    "ivf_probe_recall_sweep",
    # -- never checked: formats round-trips + physical layout --
    "jsonl_roundtrip_agg",
    "csv_roundtrip_agg",
    "orc_roundtrip_agg",
    "bucketed_join_rollup",
    "events_partition_pruned",
    "zorder_pruning_audit",
    # -- never checked: diagnostics (salting_plan changed this round) --
    "salting_plan",
    "key_skew_stats",
    "column_profile",
    "table_inventory",
    # -- never checked: text / corpus quality --
    "normalize_text",
    "readability_scores",
    "lexical_diversity",
    # -- never checked: splits --
    "train_test_split",
    "temporal_split",
)
# Still never-checked after this window (~85 names; rotate round 5+):
# behavior tail (stickiness/churn/cohort variants, ab tests, forecasting),
# sampling (stratified/weighted/source_mix), embedding stats (pca/quantize/
# drift), revenue analytics, scoring tail, remaining diagnostics — run
# scripts/next_window.py for the authoritative set.


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
