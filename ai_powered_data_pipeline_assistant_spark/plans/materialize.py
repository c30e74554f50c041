"""Materialized results over registry queries with freshness tracking.

The reference maintains precomputed summary tables refreshed by cron SQL
(reference Supabase/knowledge_base_Maintenance.sql); the engine-side
equivalent is a materialized-view manager: a registered query's result is
persisted as parquet once, served from disk while its SOURCE files are
unchanged, and rebuilt when they drift. Freshness is judged by source
file (path, mtime, size) fingerprints — the same invalidation contract a
lakehouse MV (Databricks MV / Snowflake dynamic table) implements with
table versions.

Scale notes: the materialization IS a normal distributed write (the
query's own plan + a parquet sink); serving is a plain parquet scan, so
downstream pruning/pushdown still applies. The manifest is a tiny JSON —
no driver state beyond it.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def _source_fingerprint(sf_dir: str) -> list[list]:
    out = []
    for p in sorted(Path(sf_dir).glob("*.parquet")):
        st = p.stat()
        out.append([p.name, int(st.st_mtime_ns), st.st_size])
    return out


class MaterializedViews:
    """Manage parquet-backed materializations of registry queries."""

    def __init__(self, spark: SparkSession, sf_dir: str, cache_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self.cache_dir = Path(cache_dir)
        self.cache_dir.mkdir(parents=True, exist_ok=True)
        self.rebuilds = 0  # observability/test hook

    def _paths(self, name: str) -> tuple[Path, Path]:
        return self.cache_dir / name, self.cache_dir / f"{name}.manifest.json"

    def is_fresh(self, name: str) -> bool:
        data_dir, manifest = self._paths(name)
        if not (data_dir.exists() and manifest.exists()):
            return False
        recorded = json.loads(manifest.read_text())
        return recorded["sources"] == _source_fingerprint(self.sf_dir)

    def read(self, name: str, build_fn) -> DataFrame:
        """Serve ``name`` from the materialization, rebuilding first if the
        sources drifted (or it never materialized). ``build_fn`` is a
        (spark, sf_dir) -> DataFrame registry callable."""
        data_dir, manifest = self._paths(name)
        if not self.is_fresh(name):
            df = build_fn(self.spark, self.sf_dir)
            df.write.mode("overwrite").parquet(str(data_dir))
            manifest.write_text(
                json.dumps({"sources": _source_fingerprint(self.sf_dir)})
            )
            self.rebuilds += 1
        return self.spark.read.parquet(str(data_dir))

    def invalidate(self, name: str) -> None:
        _, manifest = self._paths(name)
        if manifest.exists():
            os.remove(manifest)
