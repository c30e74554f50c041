"""Dump `.explain("formatted")` for headline queries into plans/<tag>/.

Usage:
    python scripts/dump_plans.py <out_dir> <suffix> [only_csv]

Writes ``<out_dir>/<query>_<suffix>.txt`` for every bench HEADLINE query
(or the ``only_csv`` subset). Queries whose BUILDER executes pipelines
(registry.EXECUTES_AT_BUILD) are skipped unless explicitly named in
``only_csv`` — their plan is the plan of the final summary frame, which
is cheap, but building it runs the whole pipeline.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from ai_powered_data_pipeline_assistant_spark.registry import (  # noqa: E402
    EXECUTES_AT_BUILD,
    all_queries,
)
from ai_powered_data_pipeline_assistant_spark.session import get_spark  # noqa: E402


def main() -> int:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    import bench

    names = list(bench.HEADLINE) if only is None else sorted(only)
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    import contextlib
    import io

    for name in names:
        if only is None and name in EXECUTES_AT_BUILD:
            continue
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name](spark, sf_dir).explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(name, "ok")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
