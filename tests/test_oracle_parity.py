"""The local mirror of the driver's t2 gate: every registered query with an
oracle must match DuckDB exactly (columns sorted by name, row multiset,
normalized values) at the test scale factor."""

from __future__ import annotations

import pytest

from ai_powered_data_pipeline_assistant_spark.registry import all_oracles, all_queries
from tests.conftest import assert_frames_match

QUERIES = all_queries()
ORACLES = all_oracles()


def test_every_oracle_has_a_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    rel = duck.sql(ORACLES[name])
    assert_frames_match(df, rel, name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_no_oracle_queries_run(name, spark, sf_dir):
    """Rows-only check for non-SQL-expressible ops (mirrors driver)."""
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
