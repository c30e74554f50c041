"""Local mirror of the driver's correctness gate: run every entry in
__spark_entry__.queries() at sf0.01 and compare against oracle_sql() via
DuckDB (sorted columns, normalized values, row multisets).

Usage: python scripts/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import decimal
import math
import sys

import duckdb

sys.path.insert(0, ".")

from ai_powered_data_pipeline_assistant_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.9g}"
    return str(v)


def driver_representable(df, rel) -> list[str]:
    """Reject the two classes the real driver cannot hash even when values
    are identical (both shipped red rows in round 2 while this sim said
    FAILS: [] — see VERDICT round 2 'What's wrong' #3):

    1. DuckDB HUGEINT result columns — ``sum()`` over integers returns
       HUGEINT, which the driver renders differently from Spark's BIGINT.
       Oracles must ``CAST(sum(...) AS BIGINT)`` (the SUM itself, windowed
       sums included; casting the argument does not help).
    2. Array/map/struct-typed Spark OUTPUT columns — the driver's pandas
       canonicalizer ``sort_values`` dies with ``unhashable type: 'list'``.
       Driver-facing projections must be scalars (concat_ws / to_json).
    """
    from pyspark.sql import types as T

    problems = []
    for col, dtype in zip(rel.columns, rel.types):
        if str(dtype).upper() in ("HUGEINT", "INT128", "UHUGEINT"):
            problems.append(f"oracle column '{col}' is {dtype} (wrap in CAST(... AS BIGINT))")
    for field in df.schema.fields:
        if isinstance(field.dataType, (T.ArrayType, T.MapType, T.StructType)):
            problems.append(
                f"spark column '{field.name}' is {field.dataType.simpleString()}"
                " (driver canonicalizer cannot hash it; scalarize)"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = get_spark("driver-sim")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    fails: list[str] = []
    for name in sorted(queries):
        if only is not None and name not in only:
            continue
        df = queries[name](spark, sf_dir)
        if name not in oracles:
            print(f"{name}: rows-only rows={df.count()}")
            continue
        rel = con.sql(oracles[name])
        rep = driver_representable(df, rel)
        if rep:
            print(f"{name}: NOT-DRIVER-REPRESENTABLE {'; '.join(rep)}")
            fails.append(name)
            continue
        s_cols = sorted(df.columns)
        s_rows = sorted(tuple(norm(r[c]) for c in s_cols) for r in df.collect())
        cols = rel.columns
        idx = [cols.index(c) for c in sorted(cols)]
        d_rows = sorted(tuple(norm(r[i]) for i in idx) for r in rel.fetchall())
        ok = s_cols == sorted(cols) and s_rows == d_rows
        print(f"{name}: {'MATCH' if ok else 'MISMATCH'} rows={len(s_rows)}/{len(d_rows)}")
        if not ok:
            fails.append(name)
    print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
