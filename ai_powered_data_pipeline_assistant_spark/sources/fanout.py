"""Driver-side federated ingest: concurrent fan-out with semaphores and
retry, landing in a DataFrame micro-batch.

Parity targets (SURVEY §3.2, §4):
- concurrent multi-source fan-out: reference
  backend/services/search_service.py:154-170 (asyncio.gather over 4 clients)
- per-source concurrency semaphores (SO 5 / GH 3 / docs 4): reference
  backend/services/search_clients.py:81, :157, :274
- retry w/ exponential backoff + deterministic jitter: reference
  backend/services/retry.py:18-185 (3 attempts, 1→10 s, jitter 0.5-1.0×)

External-API I/O is inherently driver-side (SURVEY §4 "external-API calls
stay driver-side with the same semaphore pattern"): Spark parallelism starts
where the fetched documents become a DataFrame. The fan-out result feeds
`spark.createDataFrame` with an explicit schema (never inferred), then the
standard union→dedup→limit→embed→upsert pipeline (operators/pipeline.py).

Tests inject deterministic fake clients and a virtual clock; sleeping and
randomness are injectable so behavior is reproducible.
"""

from __future__ import annotations

import hashlib
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCUMENT_SCHEMA = StructType(
    [
        StructField("title", StringType()),
        StructField("content", StringType()),
        StructField("source_type", StringType()),
        StructField("source_url", StringType()),
        StructField("rank", LongType()),
    ]
)


@dataclass
class RetryPolicy:
    """Exponential backoff with deterministic jitter (reference
    backend/services/retry.py:18-185; jitter 0.5-1.0× the delay).

    Jitter is hash-derived from (attempt, key) instead of random() so retry
    schedules are reproducible in tests and across reruns."""

    max_attempts: int = 3
    base_delay_s: float = 1.0
    max_delay_s: float = 10.0

    def delay(self, attempt: int, key: str = "") -> float:
        raw = min(self.base_delay_s * (2 ** attempt), self.max_delay_s)
        h = int(hashlib.md5(f"{attempt}|{key}".encode()).hexdigest()[:8], 16)
        jitter = 0.5 + (h % 1000) / 2000.0  # deterministic in [0.5, 1.0)
        return raw * jitter

    def run(
        self,
        fn: Callable[[], Any],
        *,
        key: str = "",
        sleep: Callable[[float], None] = time.sleep,
        retry_on: type[Exception] = Exception,
    ) -> Any:
        last: Exception | None = None
        for attempt in range(self.max_attempts):
            try:
                return fn()
            except retry_on as exc:  # noqa: PERF203 — retry loop
                last = exc
                if attempt < self.max_attempts - 1:
                    sleep(self.delay(attempt, key))
        raise last  # type: ignore[misc]


@dataclass
class SourceClient:
    """One external source: a fetch callable bounded by its own semaphore
    (the reference's per-client asyncio.Semaphore) and wrapped in retry."""

    name: str
    fetch: Callable[[str, int], Sequence[dict]]
    max_concurrency: int = 4
    retry: RetryPolicy = field(default_factory=RetryPolicy)
    _sem: threading.Semaphore = field(init=False)

    def __post_init__(self) -> None:
        self._sem = threading.Semaphore(self.max_concurrency)

    def search(self, query: str, max_results: int,
               sleep: Callable[[float], None] = time.sleep) -> list[dict]:
        with self._sem:
            rows = self.retry.run(
                lambda: self.fetch(query, max_results),
                key=f"{self.name}|{query}",
                sleep=sleep,
            )
        out = []
        for rank, row in enumerate(rows[:max_results]):
            out.append(
                {
                    "title": row.get("title", ""),
                    "content": row.get("content", ""),
                    "source_type": self.name,
                    "source_url": row.get("source_url", ""),
                    "rank": rank,
                }
            )
        return out


def federated_fetch(
    spark: SparkSession,
    clients: Sequence[SourceClient],
    query: str,
    max_results_per_source: int = 10,
    sleep: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """Fan out to every client concurrently (reference asyncio.gather ≙ a
    thread pool here — the work is I/O-bound), collect per-source rows, and
    land ONE DataFrame with an explicit schema. Failed sources contribute
    zero rows instead of failing the batch (the reference logs-and-continues
    per source)."""
    rows: list[dict] = []
    with ThreadPoolExecutor(max_workers=max(len(clients), 1)) as pool:
        futures = {
            pool.submit(c.search, query, max_results_per_source, sleep): c.name
            for c in clients
        }
        for fut in futures:
            try:
                rows.extend(fut.result())
            except Exception:  # noqa: BLE001 — per-source isolation
                continue
    return spark.createDataFrame(rows, schema=DOCUMENT_SCHEMA)
