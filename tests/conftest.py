from __future__ import annotations

import math
import os

import duckdb
import pytest

from ai_powered_data_pipeline_assistant_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    """Normalize a cell for cross-engine comparison (mirrors the driver's
    order-insensitive value hashing: sort columns by name, stringify)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    try:  # Decimal → float-ish normal form
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.9g}"
    except Exception:
        pass
    return str(v)


def assert_frames_match(spark_df, duck_rel, name=""):
    """Compare a Spark DataFrame against a DuckDB relation: same columns
    (sorted by name), same multiset of rows."""
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_rel.columns)
    assert s_cols == d_cols, f"{name}: columns differ: {s_cols} vs {d_cols}"
    s_rows = sorted(
        tuple(_norm(row[c]) for c in s_cols) for row in spark_df.collect()
    )
    cols = duck_rel.columns
    idx = [cols.index(c) for c in d_cols]
    d_rows = sorted(tuple(_norm(r[i]) for i in idx) for r in duck_rel.fetchall())
    assert len(s_rows) == len(d_rows), (
        f"{name}: row counts differ: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )
