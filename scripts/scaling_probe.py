"""Scaling probe: time representative queries at two scale factors and
report the runtime ratio vs the 10× data ratio — the local evidence that a
plan's cost grows (sub)linearly with input, i.e. that the same shape
survives a 100× cluster scale-up.

Usage: python scripts/scaling_probe.py [small_sf_dir big_sf_dir]
Prints one markdown table row per query: t_small, t_big (best-of-3 each),
and the ratio. Ratios well under the 10× data ratio mean fixed overheads
dominate locally; ratios near 10× are linear; anything far above flags a
superlinear plan.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from ai_powered_data_pipeline_assistant_spark.registry import all_queries  # noqa: E402
from ai_powered_data_pipeline_assistant_spark.session import get_spark  # noqa: E402

PROBES = [
    "tpch_q1",            # scan-heavy aggregate
    "tpch_q9",            # multi-join
    "minhash_lsh_pairs",  # shingle/LSH dedup
    "ngram_jaccard_pairs",  # capped postings self-join
    "sessionize",         # key-window
    "funnel_counts",      # conditional-min groupBy
    "basket_pairs",       # in-row pair explode
    "knn_join",           # broadcast batch + salted top-k
    "cosine_topk",        # TakeOrdered scan
    "curate_corpus",      # composed gates
    "neardup_triangles",  # oriented wedge join over the dup graph
    "retrieval_ndcg",     # two retrievers + driver-scale eval
    "cache_hit_simulation",  # per-key fold (adaptive chain path past guard)
    # round-5 touched / new surfaces
    "neardup_keep_best",  # LSH + counted CC + guarded label join
    "user_activity_pareto",  # pinned two-phase bucketed prefix sums
    "watermark_planner",  # adaptive running max (plain vs bucketed)
    "media_dedup",        # sha256 digest shuffle, payloads stay in scan
    "embedding_quantize_audit",  # JVM array HOFs + checksums
    "pca_project",        # two-level moment reduce + Arrow projection
    # round-7 data-selection family
    "dsir_importance_weights",  # bounded-bucket model + broadcast scoring
    "dsir_gumbel_resample",     # same + deterministic Gumbel top-k
    "ngram_novelty_report",     # hashed 5-gram distinct/anti-join
    "temperature_mix_plan",     # |sources|-row mixture reduction
    # late round-7 surfaces
    "perplexity_buckets",       # per-lang LM + two-phase rank cut
    "calibration_report",       # decile reliability groupBy
    # round-8 index-maintenance surfaces (each builds its index in tmp —
    # the ratio shows maintenance cost tracks corpus size sublinearly)
    "ivfpq_incremental_parity",  # append: route+encode arrivals only
    "ivfpq_delete_audit",        # delete: victim-list partition rewrite
    # round-9 surfaces
    "ivfpq_drift_audit",         # rebuild decision: skewed append + stats
    "crawl_steady_batch",        # composed per-batch steady-state latency
    # late round-9 surfaces
    "substring_dedup",           # dense K-gram explode + content-key shuffle
    "substring_rewrite",         # same front half + in-row span excision
    "unigram_seed_counts",       # bounded-substring explode + groupBy
    # round-10 surfaces
    "substring_k_plan",          # single-pass all-K sweep (was per-K loop)
    "substring_rewrite_apply",   # rewrite + table swap + merge + fingerprint
]


def best_of(fn, n=3) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    big = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    # warm shared infra (JVM, parquet stack, python workers)
    spark.range(1000).count()
    for sf in (small, big):
        qs["tpch_q1"](spark, sf).count()

    print("| query | t_sf0.01 (s) | t_sf0.1 (s) | ratio (data=10x) |")
    print("|---|---|---|---|")
    for name in PROBES:
        t_small = best_of(lambda: qs[name](spark, small).count())
        t_big = best_of(lambda: qs[name](spark, big).count())
        print(
            f"| {name} | {t_small:.3f} | {t_big:.3f} | "
            f"{t_big / t_small:.2f}x |"
        )


if __name__ == "__main__":
    main()
