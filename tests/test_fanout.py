"""Federated ingest fan-out: retry/backoff/jitter, semaphores, per-source
failure isolation, deterministic DataFrame landing."""

from __future__ import annotations

import threading

import pytest

from ai_powered_data_pipeline_assistant_spark.sources.fanout import (
    RetryPolicy,
    SourceClient,
    federated_fetch,
)


def _docs(prefix, n):
    return [
        {"title": f"{prefix}-{i}", "content": f"content {prefix} {i}",
         "source_url": f"https://example.test/{prefix}/{i}"}
        for i in range(n)
    ]


def test_retry_recovers_then_gives_up():
    calls = {"n": 0}
    slept = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise IOError("boom")
        return "ok"

    policy = RetryPolicy(max_attempts=3, base_delay_s=1.0, max_delay_s=10.0)
    assert policy.run(flaky, key="k", sleep=slept.append) == "ok"
    assert calls["n"] == 3 and len(slept) == 2
    # exponential with deterministic jitter in [0.5, 1.0) × base
    assert 0.5 <= slept[0] < 1.0
    assert 1.0 <= slept[1] < 2.0
    # same key → identical schedule (reproducible)
    assert policy.delay(0, "k") == slept[0]

    with pytest.raises(IOError):
        policy.run(lambda: (_ for _ in ()).throw(IOError("always")),
                   sleep=lambda s: None)


def test_semaphore_bounds_concurrency():
    active, peak = [0], [0]
    lock = threading.Lock()
    release = threading.Event()

    def fetch(query, n):
        with lock:
            active[0] += 1
            peak[0] = max(peak[0], active[0])
        release.wait(2)
        with lock:
            active[0] -= 1
        return _docs("x", 1)

    client = SourceClient("so", fetch, max_concurrency=2)
    threads = [
        threading.Thread(target=client.search, args=("q", 1)) for _ in range(5)
    ]
    for t in threads:
        t.start()
    import time

    time.sleep(0.3)
    release.set()
    for t in threads:
        t.join()
    assert peak[0] <= 2, f"semaphore leaked: peak concurrency {peak[0]}"


def test_federated_fetch_isolates_failures(spark):
    ok = SourceClient("stackoverflow", lambda q, n: _docs("so", 3))
    also_ok = SourceClient("github", lambda q, n: _docs("gh", 2))

    def broken(q, n):
        raise ConnectionError("api down")

    bad = SourceClient(
        "docs", broken,
        retry=RetryPolicy(max_attempts=2, base_delay_s=0.0, max_delay_s=0.0),
    )
    df = federated_fetch(spark, [ok, also_ok, bad], "query",
                         max_results_per_source=10, sleep=lambda s: None)
    rows = df.collect()
    assert len(rows) == 5  # failed source contributes zero rows, batch survives
    assert {r["source_type"] for r in rows} == {"stackoverflow", "github"}
    assert [r["rank"] for r in sorted(rows, key=lambda r: (r["source_type"], r["rank"]))
            ] == [0, 1, 0, 1, 2]
