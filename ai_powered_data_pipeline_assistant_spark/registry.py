"""Central query registry: every implemented operator exposed as a named
(spark, sf_dir) -> DataFrame callable, with its DuckDB oracle SQL when the
semantics are ANSI-SQL-expressible.

This is the engine's public API surface — the analogue of the reference's
tool registry (reference backend/tools/tool_registry.py:79-316), with tools
replaced by DataFrame pipelines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ai_powered_data_pipeline_assistant_spark.operators import (
    aggregates,
    dedup,
    embedding_pipeline,
    joins,
    multimodal,
    pipeline,
    relational,
    scalar_ops,
    text_analysis,
    tpch,
    vector,
    windows,
)

_MODULES = [
    relational,
    aggregates,
    joins,
    vector,
    dedup,
    text_analysis,
    pipeline,
    windows,
    scalar_ops,
    multimodal,
    embedding_pipeline,
    tpch,
]

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _MODULES:
        for name, fn in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name {name!r}")
            out[name] = fn
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        for name, sql in getattr(mod, "ORACLES", {}).items():
            if sql is not None:
                out[name] = sql
    return out
