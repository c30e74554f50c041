"""Deterministic local embedder — the U2 batch-inference stage.

Parity target: reference backend/services/vector_service.py:41-84 — OpenAI
`text-embedding-3-small`, batched 100 texts per call. Here the model call is
replaced by a deterministic hash-projection embedding (seeded fake, SURVEY
§7.4 "nondeterminism sources to mock"), but the Spark-side shape is the real
one: an Arrow-batched iterator-of-series pandas UDF, so swapping in a real
model client touches only `_embed_texts`.

Scale notes: iterator-of-series form amortizes per-batch model setup across
the whole partition; `spark.sql.execution.arrow.maxRecordsPerBatch` plays
the role of the reference's batch size 100.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

EMBED_DIM = 64


def _embed_one(text: str) -> np.ndarray:
    """Deterministic unit-norm vector from md5-seeded byte expansion."""
    out = np.empty(EMBED_DIM, dtype=np.float64)
    raw = b""
    i = 0
    while len(raw) < EMBED_DIM:
        raw += hashlib.md5(f"{i}|{text}".encode()).digest()
        i += 1
    buf = np.frombuffer(raw[:EMBED_DIM], dtype=np.uint8).astype(np.float64)
    out = (buf - 127.5) / 127.5
    norm = np.sqrt((out * out).sum())
    return (out / norm).astype(np.float32)


def _embed_texts(texts: pd.Series) -> pd.Series:
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
