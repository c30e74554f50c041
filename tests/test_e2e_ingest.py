"""End-to-end federated ingest lifecycle (SURVEY §3.2 in one test):

fan-out to mock sources → union → first-wins dedup by URL → limit →
deterministic embedding → content-hash MERGE into a knowledge table →
cosine top-k read-back — the reference's smart_search write path plus its
search_by_embedding read path, composed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.functions.embedder import (
    _embed_one,
    embedding_column,
)
from ai_powered_data_pipeline_assistant_spark.functions.vector_math import (
    cosine_similarity,
)
from ai_powered_data_pipeline_assistant_spark.sources.fanout import (
    SourceClient,
    federated_fetch,
)
from ai_powered_data_pipeline_assistant_spark.sources.sinks import ParquetTable


def _client(name, n, shared_url_every=4):
    def fetch(query, max_results):
        return [
            {
                "title": f"{name} result {i} for {query}",
                "content": f"{name} body {i}: spark partitions and shuffles",
                # every 4th url collides across sources → dedup must fire
                "source_url": (
                    f"https://shared.test/{i}" if i % shared_url_every == 0
                    else f"https://{name}.test/{i}"
                ),
            }
            for i in range(n)
        ]

    return SourceClient(name, fetch)


def test_full_ingest_lifecycle(spark, tmp_path):
    clients = [_client("stackoverflow", 8), _client("github", 8), _client("docs", 4)]
    fetched = federated_fetch(spark, clients, "spark shuffle", sleep=lambda s: None)
    assert fetched.count() == 20

    # D2 first-wins dedup by URL: deterministic arrival order = (rank, source)
    from pyspark.sql import Window

    w = Window.partitionBy("source_url").orderBy("rank", "source_type")
    deduped = (
        fetched.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .limit(15)
    )
    n_unique = fetched.select("source_url").distinct().count()
    assert deduped.count() == min(15, n_unique)

    # embed + content hash, MERGE into the knowledge table (S11: upsert on
    # content_hash), twice — second merge must be all updates, no inserts
    docs = deduped.select(
        F.sha2("content", 256).alias("content_hash"),
        "title",
        "content",
        "source_type",
        "source_url",
        embedding_column(F.col("content")).alias("embedding"),
    )
    kb = ParquetTable(spark, str(tmp_path / "kb"))
    kb.init(docs)
    first = kb.read().count()
    stats = kb.merge(docs, key="content_hash")
    assert kb.read().count() == first  # idempotent re-merge
    assert stats.get("inserted", 0) == 0

    # read path: embed the query driver-side, cosine top-k over the table
    qvec = _embed_one("spark shuffle partitions")
    qlit = F.array(*[F.lit(float(v)) for v in qvec])
    top = (
        kb.read()
        .select(
            "source_url",
            cosine_similarity(F.col("embedding"), qlit).alias("similarity"),
        )
        .orderBy(F.desc("similarity"), "source_url")
        .limit(5)
        .collect()
    )
    assert len(top) == 5
    sims = [r["similarity"] for r in top]
    assert sims == sorted(sims, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in sims)
