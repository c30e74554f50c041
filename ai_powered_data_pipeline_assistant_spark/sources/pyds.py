"""Custom Python DataSources (Spark 4 DataSource API) for the reference's
external connectors.

The reference reaches StackOverflow/GitHub through HTTP clients with
paging (reference backend/services/search_clients.py:84-180); the
Spark-idiomatic port is a first-class *data source*: pages become input
partitions, so the scan itself is distributed, prunable, and shows up in
`spark.read.format(...)` like any other connector — not a driver-side
loop that collects pages. Content is deterministic (seeded from ids, no
network) per SURVEY §7.4's mock rule.

Batch: ``stackoverflow_mock`` — one InputPartition per page; each
executor materializes only its page.
Streaming: ``request_stream_mock`` — an offset-tracked micro-batch source
(SimpleDataSourceStreamReader): offsets are request sequence numbers, so
replay of a batch is exact (the reader regenerates the same rows for the
same offset range), giving end-to-end exactly-once with the idempotent
sink.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_TAGS = ("pyspark", "sql", "optimization", "streaming", "arrow")


def _question_row(qid: int) -> tuple:
    h = hashlib.md5(f"so-{qid}".encode()).hexdigest()
    return (
        qid,
        qid // 1_000,
        f"How do I fix issue {h[:8]} in Spark?",
        (qid * 37) % 500,
        _TAGS[qid % len(_TAGS)],
        f"https://stackoverflow.example/q/{h[:12]}",
    )


class _SOPartition(InputPartition):
    def __init__(self, page: int, per_page: int):
        self.page = page
        self.per_page = per_page


class _SOReader(DataSourceReader):
    def __init__(self, options: dict):
        self.pages = int(options.get("pages", 4))
        self.per_page = int(options.get("per_page", 50))

    def partitions(self):
        return [_SOPartition(p, self.per_page) for p in range(self.pages)]

    def read(self, partition: _SOPartition) -> Iterator[tuple]:
        base = partition.page * 1_000
        for i in range(partition.per_page):
            yield _question_row(base + i)


class StackOverflowMockDataSource(DataSource):
    """`spark.read.format("stackoverflow_mock").option("pages", 8).load()`"""

    @classmethod
    def name(cls) -> str:
        return "stackoverflow_mock"

    def schema(self) -> str:
        return (
            "question_id bigint, page bigint, title string, score bigint, "
            "tag string, link string"
        )

    def reader(self, schema):  # noqa: ANN001 — Spark API signature
        return _SOReader(self.options)


class _RequestStreamReader(SimpleDataSourceStreamReader):
    """Offset = next request sequence number. Each micro-batch serves at
    most ``batch_size`` deterministic requests up to ``max_requests``;
    ``readBetweenOffsets`` regenerates an identical range on replay."""

    def __init__(self, options: dict):
        self.batch_size = int(options.get("batch_size", 20))
        self.max_requests = int(options.get("max_requests", 100))

    def initialOffset(self) -> dict:
        return {"seq": 0}

    @staticmethod
    def _rows(start: int, end: int) -> list[tuple]:
        return [
            (
                f"req-{i}",
                i % 20,
                f"query about job {i % 20}",
                1_700_000_000 + i * 2,
            )
            for i in range(start, end)
        ]

    def read(self, start: dict):
        lo = start["seq"]
        hi = min(lo + self.batch_size, self.max_requests)
        return iter(self._rows(lo, hi)), {"seq": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["seq"], end["seq"]))


class RequestStreamMockDataSource(DataSource):
    """`spark.readStream.format("request_stream_mock").load()` — bounded
    deterministic request stream for exactly-once pipeline tests."""

    @classmethod
    def name(cls) -> str:
        return "request_stream_mock"

    def schema(self) -> str:
        return "request_id string, job_id bigint, query string, epoch_s bigint"

    def simpleStreamReader(self, schema):  # noqa: ANN001 — Spark API signature
        return _RequestStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register both mock data sources on a session."""
    spark.dataSource.register(StackOverflowMockDataSource)
    spark.dataSource.register(RequestStreamMockDataSource)
