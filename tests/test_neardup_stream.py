"""Streaming incremental near-dup (streaming/neardup.py) ≡ batch LSH.

The parity operator itself is oracle-checked (test_oracle_parity); this
pins the semantics that make it non-vacuous (pairs are actually flagged,
both across batches and within one batch) plus the SCALE properties of
the bucketed state design: the band join reads the accumulated state with
no Exchange, state appends are replay-idempotent, a fresh session
re-registers surviving state files instead of wiping them, and compaction
shrinks the file count without changing rows or the Exchange-free plan."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.operators.stream_parity import (
    NEARDUP_STREAM_BATCHES,
    neardup_stream_parity,
)


def test_stream_matches_batch_and_is_nonvacuous(spark, sf_dir):
    row = neardup_stream_parity(spark, sf_dir).collect()[0]
    assert row.n_batches == NEARDUP_STREAM_BATCHES
    assert row.stream_equals_batch and row.n_mismatches == 0
    # non-vacuous: the corpus contains near-dups under the arrival rule,
    # the stream found every one of them
    assert row.n_pairs_stream == row.n_pairs_batch > 0


def test_pairing_rule_covers_within_batch(spark, sf_dir):
    """The within-batch leg must contribute real pairs on this corpus —
    otherwise the extended rule (ADVICE r7: same-batch near-dups were
    permanently invisible) is vacuously tested."""
    from ai_powered_data_pipeline_assistant_spark.catalog import load_table
    from ai_powered_data_pipeline_assistant_spark.operators.dedup import (
        minhash_lsh_pairs_for,
    )

    nb = NEARDUP_STREAM_BATCHES
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    within = minhash_lsh_pairs_for(
        docs, pair_cond=lambda a, b: ((a % nb) == (b % nb)) & (a > b)
    ).count()
    assert within > 0


def _run_stream_once(spark, sf_dir, tmp):
    """Replay the corpus as ordered single-file micro-batches through the
    real stream (the parity twin's harness) and leave state/pairs under
    ``tmp`` for the scale-property assertions."""
    from ai_powered_data_pipeline_assistant_spark.catalog import load_table
    from ai_powered_data_pipeline_assistant_spark.streaming.neardup import (
        run_neardup_stream,
    )

    nb = NEARDUP_STREAM_BATCHES
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = f"{tmp}/src"
    os.makedirs(src)
    for i in range(nb):
        part_dir = f"{tmp}/part{i}"
        docs.filter(F.col("doc_id") % nb == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(part_dir)
        part = next(f for f in os.listdir(part_dir) if f.endswith(".parquet"))
        dst = f"{src}/batch{i:03d}.parquet"
        shutil.copyfile(f"{part_dir}/{part}", dst)
        os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = run_neardup_stream(stream, f"{tmp}/state", f"{tmp}/pairs", f"{tmp}/ckpt")
    assert q.awaitTermination(300), "stream did not finish in 300 s"


def test_state_layout_scale_properties(spark, sf_dir):
    """One stream lifecycle, four scale pins:
    1. the band join against accumulated state runs with the Exchange on
       the BATCH side only — the bucketed state scan re-shuffles nothing;
    2. a replayed state insert (crash between state commit and checkpoint
       commit) overwrites its own batch partition — no duplicate rows;
    3. a fresh session (catalog entry gone, files alive) re-registers the
       state instead of wiping it;
    4. compaction reduces the file count, preserves rows, and keeps the
       Exchange-free join plan."""
    from ai_powered_data_pipeline_assistant_spark.streaming.neardup import (
        NEARDUP_STATE_BUCKETS,
        _create_state,
        _insert_dynamic,
        _state_tables,
        compact_neardup_state,
        drop_state,
    )

    tmp = tempfile.mkdtemp(prefix="neardup_layout_")
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        _run_stream_once(spark, sf_dir, tmp)
        state_dir = f"{tmp}/state"
        tables = _state_tables(state_dir)
        bands_t = tables["bands"]
        n_bands = spark.table(bands_t).count()
        assert n_bands > 0

        # --- 1. Exchange only on the probe/batch side (force SMJ so the
        # assertion is about the bucket layout, not a broadcast) ---
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def _probe():
            # keep the table's exact column types: a probe-side type cast
            # would land on the STATE side and disable the bucketed scan
            rows = [
                (r["doc_id"], r["band"], r["band_key"])
                for r in spark.table(bands_t).limit(50).collect()
            ]
            return spark.createDataFrame(
                rows, "a_id long, band int, band_key string"
            )

        j = _probe().join(
            spark.table(bands_t).select(
                F.col("doc_id").alias("b_id"), "band", "band_key"
            ),
            ["band", "band_key"],
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        # limit() materialization aside, the STATE side scan must feed the
        # join without an Exchange: exactly one hash Exchange (probe side)
        assert plan.count("Exchange hashpartitioning") == 1, plan
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)

        # --- 2. replay idempotency ---
        before = {k: spark.table(n).count() for k, n in tables.items()}
        last_batch = spark.table(bands_t).agg(F.max("batch_id")).collect()[0][0]
        replay = spark.table(bands_t).filter(F.col("batch_id") == last_batch)
        cols = [c for c in replay.columns if c != "batch_id"] + ["batch_id"]
        _insert_dynamic(replay.select(*cols), bands_t)
        assert spark.table(bands_t).count() == before["bands"]

        # --- 3. fresh-session re-registration ---
        for name in tables.values():
            spark.sql(f"DROP TABLE {name}")
        _create_state(spark, state_dir, tables)
        assert spark.table(bands_t).count() == before["bands"]
        assert spark.table(tables["postings"]).count() == before["postings"]

        # --- 4. compaction ---
        rows_before = sorted(
            map(tuple, spark.table(bands_t).drop("batch_id").collect())
        )
        files_before = sum(
            len([f for f in fs if f.endswith(".parquet")])
            for _, _, fs in os.walk(state_dir)
        )
        files_after_map = compact_neardup_state(spark, state_dir)
        files_after = sum(files_after_map.values())
        assert files_after < files_before
        # one partition, pre-shuffled to the bucket layout → ≤ buckets per table
        assert files_after_map["bands"] <= NEARDUP_STATE_BUCKETS
        rows_after = sorted(
            map(tuple, spark.table(bands_t).drop("batch_id").collect())
        )
        assert rows_after == rows_before
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # rebuild the probe: the pre-compaction DataFrame is bound to the
        # dropped table's files
        j2 = _probe().join(
            spark.table(bands_t).select(
                F.col("doc_id").alias("b_id"), "band", "band_key"
            ),
            ["band", "band_key"],
        )
        plan2 = j2._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan2, plan2
        assert plan2.count("Exchange hashpartitioning") == 1, plan2
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
        drop_state(spark, f"{tmp}/state")
        shutil.rmtree(tmp, ignore_errors=True)


def test_batch_replay_reproduces_identical_pairs_and_state(spark, sf_dir):
    """The crash window, executed: after the stream completes (state
    already contains every batch), re-processing the LAST batch — exactly
    what a checkpoint replay does — must leave pairs AND state
    byte-identical. Pre-fix, the replay read its own rows back from state
    and emitted self-pairs / both-orientation duplicates into its pairs
    partition; the strictly-pre-batch state filter pins that closed."""
    from ai_powered_data_pipeline_assistant_spark.catalog import load_table
    from ai_powered_data_pipeline_assistant_spark.streaming.neardup import (
        _state_tables,
        drop_state,
        process_neardup_batch,
    )

    nb = NEARDUP_STREAM_BATCHES
    tmp = tempfile.mkdtemp(prefix="neardup_replay_")
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        _run_stream_once(spark, sf_dir, tmp)
        pairs_dir = f"{tmp}/pairs"
        state_dir = f"{tmp}/state"
        tables = _state_tables(state_dir)
        pairs_before = sorted(
            map(tuple, spark.read.parquet(pairs_dir).collect())
        )
        state_before = {
            k: sorted(map(tuple, spark.table(n).collect()))
            for k, n in tables.items()
        }
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        last = nb - 1
        process_neardup_batch(
            docs.filter(F.col("doc_id") % nb == last), last, state_dir, pairs_dir
        )
        pairs_after = sorted(map(tuple, spark.read.parquet(pairs_dir).collect()))
        assert pairs_after == pairs_before
        for k, n in tables.items():
            assert sorted(map(tuple, spark.table(n).collect())) == state_before[k], k
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        drop_state(spark, f"{tmp}/state")
        shutil.rmtree(tmp, ignore_errors=True)
