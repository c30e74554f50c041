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
    bpe,
    clustering,
    corpus,
    curation,
    data_selection,
    dedup,
    diagnostics,
    embedding_pipeline,
    embedding_stats,
    entity,
    graphs,
    incremental,
    ivfpq,
    joins,
    market,
    multimodal,
    neardup_cluster,
    packing,
    pipeline,
    pq,
    quality_trainer,
    relational,
    repetition,
    scalar_ops,
    scoring,
    sharding,
    stream_parity,
    substring,
    surface_audits,
    text_analysis,
    tpch,
    unigram,
    vector,
    webcorpus,
    windows,
)
from ai_powered_data_pipeline_assistant_spark.sources import formats, layout

_MODULES = [
    quality_trainer,
    relational,
    aggregates,
    batching,
    behavior,
    bpe,
    unigram,
    joins,
    vector,
    pq,
    ivfpq,
    dedup,
    text_analysis,
    curation,
    data_selection,
    clustering,
    pipeline,
    repetition,
    neardup_cluster,
    substring,
    diagnostics,
    corpus,
    webcorpus,
    packing,
    scoring,
    sharding,
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

# Queries whose BUILDER executes distributed work (streaming runs,
# iterative trainers with driver round-trips) before returning a — then
# trivial — result frame. Plan-shape sweeps (plan_shuffle_census,
# tests/test_plans.py cartesian sweep) skip these: censusing a literal
# projection is worthless and pays the whole run; their inner plans are
# covered by the batch twins / single-round counting queries they wrap.
EXECUTES_AT_BUILD: frozenset[str] = frozenset(
    {
        "cdc_stream_parity",
        "funnel_stream_parity",
        "session_stream_parity",
        "job_stream_parity",
        "channel_fanout_parity",
        "trigger_cadence_audit",
        "neardup_stream_parity",
        "neardup_cluster_stream_parity",
        "substring_stream_parity",
        "substring_state_report",
        "substring_k_plan",
        "substring_rewrite_apply",
        "bpe_merge_table",
        "bpe_token_counts",
        "bpe_probe_audit",
        "bpe_encode_probe_audit",
        "unigram_vocab_table",
        "unigram_token_counts",
        "unigram_probe_audit",
        "unigram_encode_probe_audit",
        "tokenizer_fertility_report",
        "quality_trainer_report",
        "logreg_probe_audit",
        "ann_ivf_autotuned",
        "pq_encode",
        "pq_codebooks",
        "pq_recall_audit",
        "pq_probe_audit",
        "ann_ivfpq_topk",
        "ann_ivfpq_pruned",
        "ivfpq_recall_audit",
        "ivfpq_nprobe_recall_audit",
        "ivfpq_probe_audit",
        "ivfpq_incremental_parity",
        "ivfpq_delete_audit",
        "ivfpq_drift_audit",
        "ann_ingest_stream_parity",
        "crawl_pipeline_parity",
        "crawl_steady_batch",
        "neardup_state_report",
        "cluster_state_report",
        "media_phash_stream_parity",
        "phash_state_report",
    }
)

# The correctness driver checks the FIRST 50 registry entries per round, so
# ordering decides which queries get a driver verdict. Round-11 window
# (VERDICT r10 task #1 — drain ALL remaining r4 staleness; the pre-rotation
# record is 21 names at r4, 44 at r5, everything else >= r6):
# (a) the seven NEW round-11 operators, windowed on arrival:
# cluster_state_report (the cluster-stream compactor's driver-scorable
# accounting, r10 task #3) and media_phash_neardup /
# media_phash_probe_audit / media_phash_keep_best /
# media_phash_stream_parity / phash_state_report /
# media_phash_band_stats (the perceptual media near-dup tier, r10 task
# #4, its streaming ingest twin, and the tier's two ops views) — all
# value-verified MATCH by targeted
# driver_sim at sf0.01 at their landing commits, but the driver is the
# arbiter;
# (b) insurance re-checks for every name whose implementing module
# changed materially this round: operators/curation.py (skew-safe
# keeper_ids first-wins replaced the sha2(text) row_number windows — all
# 4 curation names), operators/multimodal.py (media_dedup keeper
# aggregate; media_probe_audit rides along — both are ALSO r5
# staleness), streaming/neardup.py (doc_id re-arrival enforcement +
# shared compaction core: both neardup parity/report names),
# streaming/cluster_stream.py (compactor + flatten-divergence guard),
# streaming/substring_stream.py (compactor on the shared core),
# sources/layout.py (maybe_rebuild batchedness introspection) and the
# crawl pipeline that composes layout + neardup per batch;
# (c) ALL 21 remaining r4-greens (exactly ROADMAP's "Round-11 window
# plan" list, value-verified by r9's 296/296 and r10's 297/297 full
# sweeps) — after this window lands the oldest non-window green is r5;
# (d) 7 alphabetically-first r5-greens (44 at round start; with
# media_dedup/media_probe_audit above that covers 9;
# compression_ratio_audit, cluster_safe_split, churn_risk_flags and
# channel_fanout_parity were displaced by the four late perceptual-tier
# arrivals, leaving 35 for the r12 plan in ROADMAP).
# Every slot carries an oracle AND is driver-representable — both halves
# enforced on every pytest by tests/test_driver_sim_hardening.py
# (oracle presence + driver_representable over the built window frames).
# Rows-only entries (bpe_merge_table, kmeans_embeddings, compression_ratio,
# embed_*, quality_trainer_report, bpe_token_counts, scan_file_stats,
# unigram_vocab_table, unigram_token_counts, tokenizer_fertility_report)
# are NEVER windowed — their currency is their scalarized audit twins.
_DRIVER_WINDOW: tuple[str, ...] = (
    # -- NEW round-11 operators, windowed on arrival (media_phash_keep_best
    # and media_phash_stream_parity displaced the two youngest r5 fills,
    # compression_ratio_audit and cluster_safe_split — both rotate in
    # r12, see ROADMAP) --
    "cluster_state_report",
    "media_phash_neardup",
    "media_phash_probe_audit",
    "media_phash_keep_best",
    "media_phash_stream_parity",
    "phash_state_report",
    "media_phash_band_stats",
    # -- changed-module insurance (operators/curation.py: skew-safe
    # keeper_ids exact-dedup replaced the content-hash windows) --
    "curate_corpus",
    "curation_funnel",
    "curation_dropped_audit",
    "gate_overlap_matrix",
    # -- changed-module insurance (operators/multimodal.py: media_dedup
    # keeper aggregate + the new pHash tier; both also r5 staleness) --
    "media_dedup",
    "media_probe_audit",
    # -- changed-module insurance (streaming/neardup.py: doc_id
    # re-arrival enforcement + shared compaction core) --
    "neardup_stream_parity",
    "neardup_state_report",
    # -- changed-module insurance (streaming/cluster_stream.py: compactor
    # + flatten-divergence guard) --
    "neardup_cluster_stream_parity",
    # -- changed-module insurance (streaming/substring_stream.py:
    # compactor refactored onto the shared core) --
    "substring_stream_parity",
    "substring_state_report",
    # -- changed-module insurance (sources/layout.py: maybe_rebuild
    # batchedness introspection; crawl pipeline composes both) --
    "ivfpq_drift_audit",
    "ivfpq_incremental_parity",
    "crawl_pipeline_parity",
    "crawl_steady_batch",
    # -- staleness: ALL 21 remaining r4-greens (ROADMAP r11 window plan;
    # after this window lands the oldest non-window green is r5) --
    "event_trigrams",
    "hybrid_search_rrf",
    "ivf_balance_report",
    "ivf_probe_recall_sweep",
    "jsonl_roundtrip_agg",
    "knn_join",
    "lexical_diversity",
    "lsh_parameter_plan",
    "markov_prediction_audit",
    "minhash_calibration_audit",
    "neardup_triangles",
    "normalize_text",
    "orc_roundtrip_agg",
    "readability_scores",
    "retrieval_ndcg",
    "semantic_decontaminate",
    "semantic_dedup",
    "table_inventory",
    "temporal_split",
    "train_test_split",
    "weighted_median",
    # -- staleness: 7 alphabetically-first r5-greens (44 remained at
    # round start; media_dedup/media_probe_audit above cover 2 more, and
    # 4 of the intended 11 — compression_ratio_audit, cluster_safe_split,
    # churn_risk_flags, channel_fanout_parity — were displaced by the
    # four late perceptual-tier arrivals, leaving 35 for r12) --
    "ab_test_report",
    "ann_brute_topk",
    "bigram_logprob",
    "brand_revenue_share",
    "cache_hit_simulation",
    "cdc_apply",
    "cdc_stream_parity",
)



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
