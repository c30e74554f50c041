"""Tool-registry API surface (U6) + admission control + TTL cache."""

from __future__ import annotations

from ai_powered_data_pipeline_assistant_spark.api.tools import RateLimiter, ToolRegistry
from ai_powered_data_pipeline_assistant_spark.catalog import load_tables
from ai_powered_data_pipeline_assistant_spark.functions.caching import TTLCache, cache_key

import pytest


@pytest.fixture(scope="module")
def registry(spark, sf_dir):
    load_tables(spark, sf_dir, register_views=True)
    return ToolRegistry(spark, sf_dir)


def test_list_tools_role_gated(registry):
    general = registry.list_tools("general")
    engineer = registry.list_tools("data_engineer")
    assert "smart_search" in general
    assert "analyze_data_quality" not in general
    assert "analyze_data_quality" in engineer


def test_execute_tool(registry):
    res = registry.execute("get_task_stats")
    assert res.success and len(res.data) == 3  # three order statuses
    assert {"status", "cnt"} <= set(res.data[0])


def test_unknown_and_forbidden(registry):
    assert not registry.execute("nope").success
    res = registry.execute("analyze_data_quality", role="general")
    assert not res.success and "not permitted" in res.error


def test_sql_tool_gated(registry):
    ok = registry.execute("generate_sql_query",
                          {"query": "SELECT count(*) AS c FROM orders"},
                          role="data_engineer")
    assert ok.success and ok.data[0]["c"] > 0
    bad = registry.execute("generate_sql_query",
                           {"query": "DROP TABLE orders"}, role="data_engineer")
    assert not bad.success


def test_cache_hit_faster_second_time(registry):
    r1 = registry.execute("query_knowledge_base", {"k": 5}, identifier="cachetest")
    r2 = registry.execute("query_knowledge_base", {"k": 5}, identifier="cachetest")
    assert r1.success and r2.success and r1.data == r2.data
    assert registry.cache.stats.hits >= 1


def test_rate_limiter_window():
    rl = RateLimiter(limit=3, window_s=60)
    t = 1000.0
    assert all(rl.allow("u", t + i) for i in range(3))
    assert not rl.allow("u", t + 3)          # 4th in window rejected
    assert rl.allow("other", t + 3)          # other identifier unaffected
    assert rl.allow("u", t + 61)             # window slid → allowed again


def test_ttl_cache_expiry():
    c = TTLCache(ttl_s=10)
    k = cache_key("f", 1, x=2)
    assert k == cache_key("f", 1, x=2)
    c.put(k, "v", now=0.0)
    assert c.get(k, now=5.0) == "v"
    assert c.get(k, now=11.0) is None        # expired
    assert c.stats.hits == 1 and c.stats.misses == 1 and c.stats.evictions == 1
    assert 0 < c.stats.hit_rate < 1


def test_generate_sql_templates(registry):
    """U5: NL→SQL template generation, gated by the P9 safety validator."""
    res = registry.execute(
        "generate_sql", {"request": "count orders by o_orderstatus"},
        role="data_engineer",
    )
    assert res.success and len(res.data) == 3
    top = registry.execute(
        "generate_sql", {"request": "top 5 customer by c_acctbal"},
        role="data_engineer",
    )
    assert top.success and len(top.data) == 5
    bals = [r["c_acctbal"] for r in top.data]
    assert bals == sorted(bals, reverse=True)
    bad = registry.execute(
        "generate_sql", {"request": "drop everything please"},
        role="data_engineer",
    )
    assert not bad.success and "no SQL template" in bad.error


def test_schedule_pipeline_tool(registry):
    res = registry.execute("schedule_pipeline", role="data_engineer")
    assert res.success and len(res.data) > 0


def test_run_query_tool_dispatches_registry(registry):
    res = registry.execute(
        "run_query", {"name": "status_counts", "max_rows": 10},
        role="data_engineer",
    )
    assert res.success and 0 < len(res.data) <= 10

    bad = registry.execute(
        "run_query", {"name": "import os; os.system('x')"},
        role="data_engineer",
    )
    assert not bad.success and "unknown query" in bad.error

    gated = registry.execute("run_query", {"name": "status_counts"}, role="general")
    assert not gated.success and "not permitted" in gated.error


def test_explain_query_tool_returns_plan(registry):
    res = registry.execute(
        "explain_query", {"name": "status_counts", "max_rows": 100},
        role="data_engineer",
    )
    assert res.success, res.error
    plan = "\n".join(r["line"] for r in res.data)
    assert "Physical Plan" in plan
    assert "HashAggregate" in plan

    bad = registry.execute(
        "explain_query", {"name": "nope"}, role="data_engineer"
    )
    assert not bad.success and "unknown query" in bad.error

    gated = registry.execute("explain_query", {"name": "status_counts"})
    assert not gated.success and "not permitted" in gated.error


def test_list_queries_tool(registry):
    res = registry.execute(
        "list_queries", {"max_rows": 500}, role="general"
    )
    assert res.success, res.error
    names = {r["name"] for r in res.data}
    assert "status_counts" in names and "bm25_search" in names
    by_name = {r["name"]: r for r in res.data}
    assert by_name["status_counts"]["has_oracle"] is True
    assert by_name["pca_project"]["has_oracle"] is False

    filtered = registry.execute(
        "list_queries", {"prefix": "tpch_", "max_rows": 500}, role="general"
    )
    assert filtered.success
    assert all(r["name"].startswith("tpch_") for r in filtered.data)
    assert len(filtered.data) >= 22


def test_execution_log_records_every_call(spark, sf_dir):
    from ai_powered_data_pipeline_assistant_spark.api.tools import ToolRegistry

    reg = ToolRegistry(spark, sf_dir)
    reg.execute("get_task_stats", role="general")
    reg.execute("nope", role="general")  # unknown tool → failed entry
    reg.execute("analyze_data_quality", role="general")  # role denied
    log = reg.execution_log()
    rows = {(r["tool_name"], r["success"]) for r in log.collect()}
    assert ("get_task_stats", True) in rows
    assert ("nope", False) in rows
    assert ("analyze_data_quality", False) in rows
    assert log.filter("execution_time_ms >= 0").count() == log.count()


def test_chat_handler_routes_gates_and_persists(spark, sf_dir):
    from ai_powered_data_pipeline_assistant_spark.api.tools import (
        ChatHandler,
        ToolRegistry,
    )

    chat = ChatHandler(ToolRegistry(spark, sf_dir))
    ok = chat.handle("please search for spark joins", role="general")
    assert ok.success and ok.tool == "smart_search"
    routed = chat.handle("what are my task stats?", role="general")
    assert routed.tool == "get_task_stats"
    default = chat.handle("tell me about watermarking", role="general")
    assert default.tool == "query_knowledge_base"
    profane = chat.handle("damn this pipeline", role="general")
    assert not profane.success and "profanity" in profane.error
    pii = chat.handle("my email is a@b.com, search docs", role="general")
    assert not pii.success and "PII" in pii.error
    hist = chat.history()
    assert hist.count() == 5
    assert hist.filter("NOT success").count() == 2
    # gated messages never reach a tool (journal shows only routed calls)
    journal = chat.registry.execution_log()
    assert journal.filter("tool_name = 'chat'").count() == 0
