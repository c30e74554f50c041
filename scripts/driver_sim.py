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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("driver-sim")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    fails: list[str] = []
    for name in sorted(queries):
        df = queries[name](spark, sf_dir)
        if name not in oracles:
            print(f"{name}: rows-only rows={df.count()}")
            continue
        s_cols = sorted(df.columns)
        s_rows = sorted(tuple(norm(r[c]) for c in s_cols) for r in df.collect())
        rel = con.sql(oracles[name])
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
