"""Connected-components unit tests on hand-built graphs — parity of the
full neardup_clusters / neardup_keep_best pipelines with the recursive-CTE
oracle is covered by test_oracle_parity; these pin the component semantics
on shapes the corpus graph may not contain (chains, isolated pairs, empty)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.operators.neardup_cluster import (
    connected_components,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    rows = connected_components(df).collect()
    return {r["node"]: r["label"] for r in rows}


def test_single_edge(spark):
    assert _cc(spark, [(1, 2)]) == {1: 1, 2: 1}


def test_chain_propagates_past_direct_neighbors(spark):
    # 1-2-3-4-5: 5 never shares an edge with 1 but lands in 1's cluster.
    assert _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]) == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
    }


def test_two_components_stay_separate(spark):
    got = _cc(spark, [(10, 20), (20, 30), (7, 8)])
    assert got == {10: 10, 20: 10, 30: 10, 7: 7, 8: 7}


def test_edge_order_is_irrelevant(spark):
    # min id sits at the "far" end and arrives via the high end of each edge
    assert _cc(spark, [(4, 5), (3, 4), (2, 3), (1, 2)]) == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
    }


def test_empty_edge_list(spark):
    df = spark.createDataFrame([], "a_id long, b_id long")
    assert connected_components(df).count() == 0


def test_cc_chain_converges_logarithmically(spark):
    """Pointer doubling: a 64-node path graph must resolve to one component
    in ~log rounds, not ~diameter rounds (min-label alone needs 63)."""
    from pyspark.sql import functions as F

    from ai_powered_data_pipeline_assistant_spark.operators.neardup_cluster import (
        connected_components,
    )

    edges = spark.range(63).select(
        F.col("id").alias("a_id"), (F.col("id") + 1).alias("b_id")
    )
    labels = connected_components(edges)
    rows = labels.collect()
    assert len(rows) == 64
    assert all(r["label"] == 0 for r in rows), rows[:5]
    assert connected_components.last_rounds <= 12, (
        f"pointer doubling ineffective: {connected_components.last_rounds} rounds"
    )


def test_cluster_safe_split_families_never_straddle(spark, sf_dir):
    """The whole point of the operator: every near-dup family maps to
    exactly one split, and every document is assigned exactly once."""
    from ai_powered_data_pipeline_assistant_spark.catalog import load_table
    from ai_powered_data_pipeline_assistant_spark.operators.neardup_cluster import (
        cluster_safe_split,
    )

    out = cluster_safe_split(spark, sf_dir)
    straddlers = (
        out.groupBy("group_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddlers == 0
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs


def test_cc_two_components_and_isolated_pair(spark):
    from pyspark.sql import functions as F

    from ai_powered_data_pipeline_assistant_spark.operators.neardup_cluster import (
        connected_components,
    )

    data = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)]
    edges = spark.createDataFrame(data, "a_id long, b_id long")
    labels = {r["node"]: r["label"] for r in connected_components(edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_cc_matches_union_find_on_random_graphs(spark):
    """Randomized cross-check of the distributed components against a pure
    Python union-find over the same edges — catches propagation bugs hand
    graphs miss (dense + chain + isolated mixtures)."""
    import random

    def union_find(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # resolve to component minimum
        return {n: find(n) for n in parent}

    rng = random.Random(23)
    for trial in range(3):
        n_nodes = rng.randrange(20, 80)
        n_edges = rng.randrange(10, 120)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        want = union_find(edges)
        got = _cc(spark, edges)
        assert got == want, f"trial {trial}: {len(edges)} edges"


def test_triangle_census_known_graph(spark):
    """K4 plus a pendant edge: 4 triangles, clustering coeff known exactly.
    K4 wedges: each of 4 nodes deg 3 → 4·3 = 12; pendant adds node 3→deg 4
    (3 extra wedges) and leaf deg 1 → 15 wedges total, 4 triangles."""
    from ai_powered_data_pipeline_assistant_spark.operators.neardup_cluster import (
        triangle_census,
    )

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)],
        "a_id long, b_id long",
    )
    row = triangle_census(edges).first()
    assert row["n_nodes"] == 5
    assert row["n_edges"] == 7
    assert row["n_wedges"] == 15
    assert row["n_triangles"] == 4
    assert abs(row["clustering_coeff"] - round(12 / 15, 6)) < 1e-9


def test_triangle_census_triangle_free(spark):
    """A path graph has wedges but zero triangles; coefficient is 0."""
    from ai_powered_data_pipeline_assistant_spark.operators.neardup_cluster import (
        triangle_census,
    )

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "a_id long, b_id long"
    )
    row = triangle_census(edges).first()
    assert row["n_triangles"] == 0
    assert row["n_wedges"] == 2
    assert row["clustering_coeff"] == 0.0


def test_label_broadcast_guard_flips_join_strategy(spark):
    """The membership-label broadcast is size-guarded: under
    BROADCAST_MAX_EDGES the hint forces a BroadcastHashJoin; above it (a
    30-50%-duplicate web corpus, labels corpus-order) the hint is dropped
    and the join falls back to a shuffle join — no forced driver OOM.
    The count is an explicit parameter (no global state)."""
    from ai_powered_data_pipeline_assistant_spark.operators.neardup_cluster import (
        BROADCAST_MAX_EDGES,
        _labels_maybe_broadcast,
    )

    labels = spark.range(64).select(
        F.col("id").alias("doc_id"), F.col("id").alias("family_id")
    )
    docs = spark.range(256).select(F.col("id").alias("doc_id"))
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable size-based auto-broadcast so the HINT is the only thing
        # that can pick the strategy — the flip is then observable
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        small = docs.join(
            _labels_maybe_broadcast(labels, BROADCAST_MAX_EDGES), "doc_id", "left"
        )
        small_plan = small._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in small_plan, small_plan

        big = docs.join(
            _labels_maybe_broadcast(labels, BROADCAST_MAX_EDGES + 1), "doc_id", "left"
        )
        big_plan = big._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in big_plan, big_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_counted_components_interleaved_runs_use_own_edge_counts(spark):
    """Two back-to-back connected_components_counted runs of very different
    sizes each report THEIR OWN edge count — the broadcast guard decision
    for one graph can never be made on the other's count (the round-4
    function-attribute side channel, removed in round 5)."""
    from ai_powered_data_pipeline_assistant_spark.operators.neardup_cluster import (
        connected_components_counted,
    )

    tiny_edges = spark.createDataFrame([(0, 1)], "a_id long, b_id long")
    big_edges = spark.range(500).select(
        F.col("id").alias("a_id"), (F.col("id") + 1).alias("b_id")
    )
    tiny_labels, tiny_n = connected_components_counted(tiny_edges)
    big_labels, big_n = connected_components_counted(big_edges)
    # counts are the symmetrized edge-list sizes of EACH graph
    assert tiny_n == 2
    assert big_n == 1000
    # the earlier (tiny) result's count is untouched by the later run
    assert tiny_labels.count() == 2
    assert big_labels.count() == 501
