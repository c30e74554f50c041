"""Deterministic local embedder — the U2 batch-inference stage.

Parity target: reference backend/services/vector_service.py:41-84 — OpenAI
`text-embedding-3-small`, batched 100 texts per call. Here the model call is
replaced by a deterministic hash-projection embedding (seeded fake, SURVEY
§7.4 "nondeterminism sources to mock"), but the Spark-side shape is the real
one: an Arrow-batched iterator-of-series pandas UDF, so swapping in a real
model client touches only `_embed_texts`.

Scale notes: iterator-of-series form amortizes per-batch model setup across
the whole partition. At dim=1536 a row is ~6 KB of float32 — the session
caps `spark.sql.execution.arrow.maxRecordsPerBatch` at 1024 so an Arrow
batch stays ~6 MB (the default 10k would make 60 MB batches and spike the
Python-worker RSS); the reference's batch-100 model-API micro-batching
would live INSIDE `_embed_texts`, slicing each Arrow batch per call.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

# Reference parity: text-embedding-3-small is 1536-dim (reference
# backend/services/vector_service.py:26, Supabase/knowledge_base-RAG.sql:6).
EMBED_DIM = 1536


def _embed_one(text: str) -> np.ndarray:
    """Deterministic unit-norm vector: md5(text) seeds a PCG64 stream that
    fills all 1536 dims in one vectorized draw (one hash + one RNG fill per
    row — not 96 chained digests)."""
    seed = int.from_bytes(hashlib.md5(text.encode()).digest()[:8], "little")
    v = np.random.Generator(np.random.PCG64(seed)).standard_normal(EMBED_DIM)
    norm = np.sqrt((v * v).sum())
    return (v / norm).astype(np.float32)


def _embed_texts(texts: pd.Series) -> pd.Series:
    # a real model client would slice `texts` into batch-100 API calls here
    return texts.map(lambda t: _embed_one(t or ""))


@pandas_udf(ArrayType(FloatType()))
def embed_text(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    # per-partition "model" setup would go here (client, session, weights)
    for texts in batches:
        yield _embed_texts(texts)


def embedding_column(text_col: Column) -> Column:
    """Attach a deterministic embedding for a text column (J2: the safe
    replacement for the reference's positional zip-join of docs↔embeddings)."""
    return embed_text(text_col)


def cosine_to_query(qvec: np.ndarray):
    """Vectorized cosine scorer against one fixed query vector.

    At dim=1536 the element-wise `zip_with`/`aggregate` HOF cosine is
    interpreted per element (no codegen for lambda bodies) — ~23M lambda
    evals for 5k docs. This scorer does one (batch × dim) @ (dim,) matmul
    per Arrow batch instead. Chained directly onto `embed_text`, Spark
    collapses both UDFs into ONE ArrowEvalPython pass — embeddings never
    round-trip through the JVM between embed and score.
    """
    q = np.asarray(qvec, dtype=np.float64)
    qn = np.sqrt((q * q).sum())

    @pandas_udf("double")
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for embs in batches:
            m = np.stack(embs.to_numpy()).astype(np.float64)
            sims = (m @ q) / (np.sqrt((m * m).sum(axis=1)) * qn)
            yield pd.Series(np.round(sims, 6))

    return score
