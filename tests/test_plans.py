"""Physical-plan regression tests — the scale contract.

Correctness says an operator returns the right rows at sf0.001; these tests
pin the PLAN properties that make the same operator survive a 100 TB scan:
filters reaching the parquet reader, projections pruning columns, dimension
joins broadcasting, top-k compiling to TakeOrderedAndProject instead of a
global sort, and whole-stage codegen covering the hot path.
"""

from __future__ import annotations

from ai_powered_data_pipeline_assistant_spark.registry import all_queries

QUERIES = all_queries()


def _initial_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """P1-P4: the status/priority equality filters must appear as parquet
    PushedFilters, not post-scan Filter-only."""
    plan = _formatted(QUERIES["filter_eq"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip(), f"no filters pushed to scan:\n{plan}"


def test_projection_prunes_scan_columns(spark, sf_dir):
    """S1/S4: a narrow projection must prune the parquet ReadSchema — a scan
    reading every column for a 2-column projection breaks at 100 TB."""
    plan = _formatted(QUERIES["status_counts"](spark, sf_dir))
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "o_orderstatus" in read_schema
    assert "o_totalprice" not in read_schema, read_schema
    assert "o_orderdate" not in read_schema, read_schema


def test_topk_uses_take_ordered(spark, sf_dir):
    """O5/J3: orderBy(desc).limit(k) must compile to TakeOrderedAndProject
    (per-partition heaps + driver merge), never a global Sort."""
    plan = _initial_plan(QUERIES["cosine_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_dim_joins_broadcast(spark, sf_dir):
    """Rollup over customer⋈nation⋈region must broadcast the dimension
    tables — shuffling the fact side on dim keys is the scale killer."""
    plan = _initial_plan(QUERIES["rollup_counts"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_tpch_q3_joins_are_hash_joins(spark, sf_dir):
    """Q3's selective customer filter should broadcast; no cartesian or
    nested-loop join may appear in an equi-join pipeline."""
    plan = _initial_plan(QUERIES["tpch_q3"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_agg_is_whole_stage_codegen(spark, sf_dir):
    """tpch_q1's scan→filter→partial-agg must sit inside WholeStageCodegen
    (Tungsten), not fall back to interpreted evaluation. Under AQE the
    codegen spans only appear in the final plan after execution — the
    `*(n)` stage markers in simpleString."""
    df = QUERIES["tpch_q1"](spark, sf_dir)
    df.collect()  # count() would plan a new query; collect finalizes THIS one
    plan = df._jdf.queryExecution().simpleString()
    assert "isFinalPlan=true" in plan
    assert "*(" in plan, f"no WholeStageCodegen stage markers:\n{plan}"
    assert "HashAggregate" in _initial_plan(df)


def test_exact_dedup_partial_aggregates(spark, sf_dir):
    """Hash-groupBy dedup must show a two-phase HashAggregate (map-side
    partial + final) — the map-side combine is what bounds the shuffle."""
    plan = _initial_plan(QUERIES["exact_dedup"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2, plan


def test_jaccard_selfjoin_has_shingle_df_cap(spark, sf_dir):
    """The postings self-join must be preceded by a document-frequency drop
    (window count over h, filtered before the join) — without it one hot
    stop-word shingle makes the join Σ posting² at web scale."""
    # pin=False: the production localCheckpoint barrier hides upstream
    # operators from the plan string; the pipeline is otherwise identical.
    from ai_powered_data_pipeline_assistant_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    plan = _initial_plan(ngram_jaccard_pairs(spark, sf_dir, pin=False))
    # the cap: a per-h window count whose filter runs BEFORE the self-join
    assert "windowspecdefinition(h#" in plan.lower() or "Window" in plan, plan
    assert "_df" in plan, plan
    # and the postings build itself is map-only: no exchange keyed on the
    # (doc_id, h) posting pair (the old explode→distinct shuffle)
    import re

    assert not re.search(r"hashpartitioning\(doc_id#\d+L?, h#", plan), plan


def test_no_cartesian_products_anywhere(spark, sf_dir):
    """No oracle-checked operator may contain a CartesianProduct — every
    join is either keyed or an intentional broadcast of a tiny side.
    EXECUTES_AT_BUILD harnesses are skipped for the same reason as in
    plan_shuffle_census: building their trivial result frame executes
    whole streaming jobs / training loops, and their inner plans are
    covered by the batch twins / single-round queries they wrap."""
    from ai_powered_data_pipeline_assistant_spark.registry import EXECUTES_AT_BUILD

    offenders = []
    for name, fn in QUERIES.items():
        if name in EXECUTES_AT_BUILD:
            continue
        try:
            plan = _initial_plan(fn(spark, sf_dir))
        except Exception:
            continue
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian products in: {offenders}"


def test_q7_nation_filters_reach_broadcast(spark, sf_dir):
    """Q7: both nation dims are pre-filtered 2-row broadcasts — the pair
    condition must NOT appear as a row-multiplying join. All joins hash."""
    plan = _initial_plan(QUERIES["tpch_q7"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_q15_scalar_max_broadcasts(spark, sf_dir):
    """Q15/Q11/Q22 family: the 1-row scalar aggregate joins back as a
    broadcast (Catalyst even rewrites the equality filter into a
    BroadcastHashJoin key), never a CartesianProduct, and the revenue agg
    partial-aggregates map-side."""
    plan = _initial_plan(QUERIES["tpch_q15"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "partial_sum" in plan, plan


def test_q17_window_decorrelation_single_scan(spark, sf_dir):
    """Q17: the correlated AVG must decorrelate to window sums — exactly
    one lineitem scan, no self-join re-scan of the fact table."""
    plan = _initial_plan(QUERIES["tpch_q17"](spark, sf_dir))
    assert plan.count("Scan parquet") <= 2, plan  # lineitem + part only
    assert "Window" in plan, plan


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    """Decontamination: the eval/benchmark postings are thousands of docs,
    not billions — they must broadcast into the corpus probe, never force a
    shuffle of the full corpus postings on the probe join."""
    plan = _initial_plan(QUERIES["decontaminate"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_neardup_keep_best_broadcasts_clusters(spark, sf_dir):
    """Keep-best: the clustered subset (docs with ≥1 near-dup) is tiny next
    to the corpus — the quality lookup must broadcast it rather than
    shuffle the documents scan."""
    plan = _initial_plan(QUERIES["neardup_keep_best"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_source_mix_resample_broadcasts_rates(spark, sf_dir):
    """Mixture resampling: per-source keep rates are |distinct sources|
    rows — the membership filter must be a broadcast join + pushed filter,
    with no shuffle of the corpus scan."""
    plan = _initial_plan(QUERIES["source_mix_resample"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_repetition_stats_partial_aggregates(spark, sf_dir):
    """Gopher repetition profile: the gram count must partial-aggregate
    map-side (partial_count) so repeated grams collapse BEFORE the shuffle
    — that pre-shuffle collapse is the whole scale story of the operator."""
    plan = _initial_plan(QUERIES["repetition_stats"](spark, sf_dir))
    assert "partial_count" in plan or "partial count" in plan.lower(), plan


def test_pack_sequences_prefix_sum_is_partitioned(spark, sf_dir):
    """Sequence packing: the corpus-sized running sum must be a window
    PARTITIONED by range bucket (two-phase prefix sum); only the per-bucket
    totals frame — one row per bucket — may use the global ordered window.
    A windowspec over n_tokens without a partition column would funnel the
    whole corpus through one partition."""
    import re

    plan = _initial_plan(QUERIES["pack_sequences"](spark, sf_dir))
    assert re.search(
        r"Window \[sum\(n_tokens#\d+\) windowspecdefinition\(bucket#\d+L, doc_id",
        plan,
    ), plan


def test_funnel_counts_has_no_joins(spark, sf_dir):
    """Funnel: stage mins must come from ONE conditional-aggregate pass —
    the naive per-stage self-join (events ⋈ events per step) is the scale
    killer this formulation avoids."""
    plan = _initial_plan(QUERIES["funnel_counts"](spark, sf_dir))
    assert "Join" not in plan, plan
    assert "partial_min" in plan, plan  # map-side combined stage mins


def test_gapfill_joins_are_broadcast(spark, sf_dir):
    """Calendar gap-fill: the grid and per-day counts are days × types
    rows — every join must broadcast; shuffling the facts against a
    30-row calendar would be absurd at scale."""
    plan = _initial_plan(QUERIES["daily_counts_gapfill"](spark, sf_dir))
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan


def test_pareto_prefix_sum_is_partitioned(spark, sf_dir):
    """Pareto accounting: the per-user running sum must be windowed BY
    BUCKET (two-phase prefix sum over the range-partitioned aggregate);
    only the per-bucket offsets frame may use the global ordered window."""
    import re

    plan = _initial_plan(QUERIES["user_activity_pareto"](spark, sf_dir))
    assert re.search(
        r"windowspecdefinition\(bucket#\d+", plan
    ), plan


def test_bucketed_join_no_exchange(spark, sf_dir):
    """customer ⋈ orders over 8-bucket layouts must plan with ZERO Exchange:
    not on either join side (bucket layout replaces the shuffle) and not for
    the per-customer aggregate (groupBy key == bucket column)."""
    plan = _initial_plan(QUERIES["bucketed_join_rollup"](spark, sf_dir))
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan


def test_partition_pruned_read(spark, sf_dir):
    """The (event_type, day) point read must prune at the scan: the
    partition predicate shows up as PartitionFilters, and no post-scan
    Filter re-checks the partition columns."""
    df = QUERIES["events_partition_pruned"](spark, sf_dir)
    plan = _formatted(df)
    assert "PartitionFilters" in plan, plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0], plan


def test_winsorized_stats_single_hash_shuffle(spark, sf_dir):
    """The rank window and the follow-up groupBy share one event_type hash
    partitioning — a second hash Exchange would double the shuffle volume
    of every robust-stats run at scale. (The only other Exchange allowed is
    the final presentation orderBy's range partitioning.)"""
    plan = _initial_plan(QUERIES["winsorized_stats"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_bm25_topk_is_take_ordered(spark, sf_dir):
    """BM25 retrieval must compile its top-k to TakeOrderedAndProject —
    a global sort of per-doc scores is the anti-pattern at corpus scale."""
    plan = _initial_plan(QUERIES["bm25_search"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_oov_rate_vocab_head_broadcasts(spark, sf_dir):
    """The top-K vocab head must broadcast into the token stream — a
    shuffle join on `term` would re-shuffle the whole exploded corpus."""
    plan = _initial_plan(QUERIES["oov_rate"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_fk_integrity_parents_broadcast(spark, sf_dir):
    """Every FK check must run as a broadcast left-anti join (dimension key
    sets are tiny at any scale after distinct-projection)."""
    plan = _initial_plan(QUERIES["fk_integrity_audit"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 5, plan
    assert "SortMergeJoin" not in plan, plan


def test_boilerplate_prefixes_single_shuffle(spark, sf_dir):
    """(source, prefix) aggregate and the per-source window share work; the
    corpus itself must shuffle exactly once (fixed-width prefixes, never
    document bodies)."""
    plan = _initial_plan(QUERIES["boilerplate_prefixes"](spark, sf_dir))
    # aggregate exchange on (source, prefix) + window exchange on source:
    # the frames after the first aggregate are distinct-prefix sized
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_basket_pairs_no_selfjoin_on_facts(spark, sf_dir):
    """Pair generation must be the in-row explode over collect_set baskets —
    one Exchange for the basket build, one for the pair aggregate, and NO
    join anywhere before the (tiny) lift lookups, which must broadcast."""
    plan = _initial_plan(QUERIES["basket_pairs"](spark, sf_dir))
    assert "SortMergeJoin" not in plan, plan
    assert "Generate explode" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_pagerank_iterations_broadcast_node_count(spark, sf_dir):
    """The fixed power iteration must keep every node-count entry a
    broadcast (BroadcastNestedLoopJoin over the 1-row aggregate), never a
    shuffled cross product."""
    plan = _initial_plan(QUERIES["event_pagerank"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    # 4 crossJoins (init + 3 iterations) all against the broadcast 1-row agg
    assert plan.count("BroadcastNestedLoopJoin") >= 4, plan


def test_markov_audit_predictions_broadcast(spark, sf_dir):
    """Scoring joins the per-prev prediction table (≤ |event types| rows)
    broadcast — the fact-side pairs never shuffle for the join."""
    plan = _initial_plan(QUERIES["markov_prediction_audit"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_entity_matching_runs_on_vocab_aggregate(spark, sf_dir):
    """Blocking must self-join the distinct-name AGGREGATE (HashAggregate
    below the join), never the raw part scan against itself."""
    plan = _initial_plan(QUERIES["entity_match_pairs"](spark, sf_dir))
    assert "levenshtein" in plan.lower(), plan
    join_pos = min(
        (plan.find(j) for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
         if plan.find(j) >= 0),
        default=-1,
    )
    assert join_pos >= 0, plan
    assert "HashAggregate" in plan[join_pos:], plan


def test_cdc_apply_single_key_shuffle(spark, sf_dir):
    """Compaction is ONE hash Exchange on the key feeding the window —
    no joins at all."""
    plan = _initial_plan(QUERIES["cdc_apply"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert j not in plan, plan


def test_plan_shuffle_census_within_budget(spark, sf_dir):
    """Fleet-wide plan budget: every registered query must build a physical
    plan with no cartesian products and a bounded Exchange count — the
    regression gate for accidentally quadratic or shuffle-happy rewrites.
    (The most exchange-heavy queries are multi-method comparison REPORTS —
    dedup_method_report runs four dedup strategies — and the unrolled
    3-iteration PageRank DAG; 30 is headroom above today's max of 27.)"""
    from ai_powered_data_pipeline_assistant_spark.operators.diagnostics import (
        plan_shuffle_census,
    )

    rows = plan_shuffle_census(spark, sf_dir).collect()
    errors = [r["query"] for r in rows if r["error"]]
    assert not errors, errors
    cart = [r["query"] for r in rows if r["n_cartesian"] > 0]
    assert not cart, cart
    heavy = [(r["query"], r["n_exchanges"]) for r in rows if r["n_exchanges"] > 30]
    assert not heavy, heavy


def test_curation_exact_dedup_no_content_window(spark, sf_dir):
    """VERDICT r10 task #2: curation's exact-dup stage must be the
    skew-safe keeper aggregate (two-phase HashAggregate — map-side partial
    before its Exchange) joined back on doc_id, never a row_number window
    partitioned by the content hash (the most-duplicated text would
    serialize into ONE unsplittable window partition at 100 TB)."""
    from ai_powered_data_pipeline_assistant_spark.catalog import load_table
    from ai_powered_data_pipeline_assistant_spark.operators.curation import (
        exact_keep_first,
    )

    docs = load_table(spark, sf_dir, "documents")
    plan = _initial_plan(exact_keep_first(docs))
    assert "Window" not in plan, plan
    # map-side partial + final aggregate around the keeper Exchange
    assert plan.count("HashAggregate") >= 2, plan
    assert "Exchange hashpartitioning" in plan, plan


def test_family_keyed_keepers_have_no_window(spark, sf_dir):
    """Round 12: the two remaining family/content-keyed first-wins ops —
    neardup_keep_best (per-cluster keeper) and span_dedup (first
    occurrence per chunk hash) — must use the skew-safe min/max-struct
    keeper aggregate (map-side-combined HashAggregates), never a
    row_number window partitioned by the family/content key: a
    template-spam cluster or a boilerplate chunk is exactly the hot
    partition such a window serializes into one task at 100 TB."""
    for name in ("neardup_keep_best", "span_dedup"):
        plan = _initial_plan(QUERIES[name](spark, sf_dir))
        assert "Window" not in plan, (name, plan)
        # two-phase aggregate with a map-side partial before the family
        # Exchange (struct-buffered keepers compile to SortAggregate, not
        # HashAggregate — the partial_ prefix is the skew-safety witness)
        assert "partial_" in plan, (name, plan)
        assert plan.count("Aggregate") >= 2, (name, plan)
