"""Write-path sinks: append, update-by-key, MERGE upsert, delete-where.

Parity targets (SURVEY §2.1):
- S9/S10 insert sinks (tasks/logs/chat appends): reference
  backend/api/routes/tasks.py:105, backend/utils/logging_helpers.py:108
- S11 upsert on conflict key: reference backend/services/vector_service.py:117-133
- S12 partial update by id: reference backend/api/routes/tasks.py:155
- S13 DELETE WHERE expires_at < now: reference
  Supabase/knowledge_base_Maintenance.sql:6-12
- S14 counter increment: reference Supabase/knowledge_base_Maintenance.sql:15-22

This environment has no Delta/Iceberg, so the table format is plain parquet
and MERGE/UPDATE/DELETE are implemented as read → full-outer-join/anti-join
→ atomic directory swap. On a lakehouse deployment every function here
collapses to one `MERGE INTO` / `UPDATE` / `DELETE` statement against a
Delta table — the join shapes below are exactly what Delta executes
underneath (its merge is a full-outer join on the key + file rewrite), so
the shuffle profile at 100 TB is the same; what Delta adds is snapshot
isolation and file-level pruning of untouched data.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark import hadoop_fs


class ParquetTable:
    """A tiny managed parquet table with append / merge / update / delete.

    Writes go to a fresh directory then swap in (last-writer-wins, atomic at
    the directory-rename level — the single-writer subset of what a real
    table format provides).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def exists(self) -> bool:
        return hadoop_fs.has_parquet(self.spark, self.path)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def init(self, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self.path)

    def append(self, df: DataFrame) -> None:
        """S9/S10: plain insert."""
        df.write.mode("append").parquet(self.path)

    def _rewrite(self, df: DataFrame) -> None:
        """Write-new-then-swap via ``hadoop_fs.swap_dirs``: the staging
        dir lives NEXT TO the table (same filesystem — a /tmp staging dir
        could not be renamed onto an s3a:// table); the helper checks
        both renames, rolls back a half-done swap, and deletes the old
        copy only after the swap fully succeeded."""
        tmp = f"{self.path}.tmp_{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(tmp)
        hadoop_fs.swap_dirs(self.spark, self.path, tmp)

    def merge(self, source: DataFrame, key: str) -> dict[str, int]:
        """S11: MERGE — matched rows replaced by source, unmatched inserted.

        Equivalent Delta statement:
            MERGE INTO target t USING source s ON t.{key} = s.{key}
            WHEN MATCHED THEN UPDATE SET *  WHEN NOT MATCHED THEN INSERT *
        """
        src_total = source.count()
        src_keys = source.select(key).distinct().count()
        if src_keys != src_total:
            # Delta/ANSI MERGE errors when multiple source rows match one
            # target row; failing early keeps the stats below meaningful.
            raise ValueError(
                f"MERGE source has duplicate {key!r} values "
                f"({src_total} rows, {src_keys} distinct keys)"
            )
        target = self.read()
        matched = target.join(source.select(key), key, "left_semi").count()
        inserted = source.join(target.select(key), key, "left_anti").count()
        kept = target.join(source.select(key), key, "left_anti")
        merged = kept.unionByName(source)
        self._rewrite(merged)
        return {"updated": matched, "inserted": inserted}

    def update_where(self, predicate, assignments: dict[str, "F.Column"]) -> int:
        """S12/S14: UPDATE SET ... WHERE predicate (predicate = Column)."""
        target = self.read()
        n = target.filter(predicate).count()
        updated = target
        for col_name, expr in assignments.items():
            updated = updated.withColumn(
                col_name, F.when(predicate, expr).otherwise(F.col(col_name))
            )
        self._rewrite(updated)
        return n

    def delete_where(self, predicate) -> int:
        """S13: DELETE WHERE predicate; returns deleted row count.

        SQL DELETE semantics: rows where the predicate evaluates to NULL are
        retained, so survivors are ``NOT coalesce(pred, false)`` — a bare
        ``~predicate`` would silently drop NULL-predicate rows.
        """
        target = self.read()
        pred = F.coalesce(predicate, F.lit(False))
        n = target.filter(pred).count()
        self._rewrite(target.filter(~pred))
        return n
