"""Semantic invariants for the round-3 operator families (oracle parity is
covered by test_oracle_parity; these pin the math/shape properties)."""

from __future__ import annotations

from ai_powered_data_pipeline_assistant_spark.operators import (
    behavior,
    clustering,
    entity,
    incremental,
    market,
    windows,
)
from ai_powered_data_pipeline_assistant_spark.sources import layout


def test_entity_clusters_are_canonical_and_closed(spark, sf_dir):
    """Every member maps to a cluster whose canonical id is itself a member
    with the minimum entity id (CC min-label invariant)."""
    rows = entity.entity_clusters(spark, sf_dir).collect()
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        ids = [m["entity_id"] for m in members]
        assert min(ids) == cid  # canonical = min member id
        canon_names = {m["canonical_name"] for m in members}
        assert len(canon_names) == 1


def test_entity_pairs_within_threshold(spark, sf_dir):
    rows = entity.entity_match_pairs(spark, sf_dir).collect()
    for r in rows:
        assert 1 <= r["lev"] <= entity.MAX_LEV
        assert r["a_name"] != r["b_name"]


def test_basket_lift_consistency(spark, sf_dir):
    """lift must equal support·N / (s_a·s_b) and support can't exceed
    either item support."""
    rows = market.basket_pairs(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["support"] >= market.MIN_SUPPORT
        assert r["support"] <= min(r["s_a"], r["s_b"])
        assert r["lift"] > 0


def test_cdc_apply_no_tombstones_and_unique_keys(spark, sf_dir):
    rows = incremental.cdc_apply(spark, sf_dir).collect()
    keys = [r["user_id"] for r in rows]
    assert len(keys) == len(set(keys))
    assert all(r["last_op"] != incremental.CDC_DELETE_TYPE for r in rows)


def test_rfm_scores_bounded_and_partition_users(spark, sf_dir):
    rows = windows.rfm_segments(spark, sf_dir).collect()
    assert rows
    for r in rows:
        for c in ("r_score", "f_score", "m_score"):
            assert 1 <= r[c] <= windows.RFM_BANDS
    # segment rollup partitions the customer base
    n_customers = sum(r["n_customers"] for r in rows)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert n_customers == orders.select("o_custkey").distinct().count()


def test_ab_reports_have_both_arms(spark, sf_dir):
    rows = behavior.ab_test_report(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_a"] > 0 and r["n_b"] > 0
    funnel = behavior.ab_funnel_report(spark, sf_dir).collect()
    assert len(funnel) == 1
    f = funnel[0]
    assert 0 <= f["conv_a"] <= f["n_a"]
    assert 0 <= f["conv_b"] <= f["n_b"]


def test_zorder_beats_linear_on_the_unsorted_dimension(spark, sf_dir):
    rows = {r["layout"]: r for r in layout.zorder_pruning_audit(spark, sf_dir).collect()}
    lin, z = rows["linear"], rows["zorder"]
    # linear layout cannot prune the time predicate at all
    assert lin["time_scan_frac"] == 1.0
    # z-order prunes substantially on BOTH dimensions
    assert z["time_scan_frac"] < 0.5
    assert z["user_scan_frac"] < 0.5
