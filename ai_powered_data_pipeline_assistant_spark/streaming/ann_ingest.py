"""Streaming ANN index ingest — the embedding-side twin of the streaming
near-dup crawler (streaming/neardup.py): each arriving micro-batch of
(vec_id, embedding) rows is routed through the persisted IVF-PQ index's
STORED coarse centroids, residual-encoded with its STORED codebooks, and
landed in the codes layout — so the similarity-search index keeps up with
the crawl without rebuilds.

Extension lineage: the reference upserts embeddings into pgvector as they
arrive (reference backend/services/vector_service.py:87 — embed + upsert
to the knowledge base, indexed by the ivfflat DDL in reference
Supabase/knowledge_base-RAG.sql:31-33, which Postgres maintains
row-at-a-time); this is the lakehouse maintenance discipline for the same
index
at crawl scale — FAISS add() semantics (codebooks fixed after training,
arrivals encoded against them; drift handled by periodic full rebuild via
the write-once `ensure_ivfpq_layout` path).

Exactly-once: the stream targets the BATCHED layout flavor
(`write_ivfpq_layout_for(batched=True)` — codes partitioned by
(list_id, batch_id), base build at batch_id=-1). Each micro-batch lands
via `append_ivfpq_layout(batch_id=N)` — a DYNAMIC overwrite of its own
(list, batch) partitions — so a batch replayed after a crash between the
parquet commit and the checkpoint commit REPLACES its output instead of
duplicating codes. Probe pruning is unchanged: ``list_id`` stays the
leading partition column.

Per-batch cost is one broadcast-route + encode pass over the ARRIVING
rows; the existing index is never read (the sidecars are broadcast-sized).
`ann_ingest_stream_parity` (operators/stream_parity.py) pins the
multi-batch replay: streamed index ≡ one-pass encode of the full corpus
against the same artifacts, and the probe query over the streamed index
returns row-for-row the logical search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def run_ann_ingest_stream(
    emb_stream: DataFrame, layout_path: str, checkpoint: str
):
    """Wire the index-ingest stream over a (vec_id, embedding) source
    against a BATCHED IVF-PQ layout. Returns the started StreamingQuery
    (availableNow)."""
    from ai_powered_data_pipeline_assistant_spark.sources.layout import (
        append_ivfpq_layout,
    )

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        append_ivfpq_layout(
            batch_df.sparkSession,
            layout_path,
            batch_df.select("vec_id", "embedding"),
            batch_id=batch_id,
        )

    return (
        emb_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_handle)
        .trigger(availableNow=True)
        .start()
    )
