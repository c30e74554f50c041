"""The engine's tool-registry-shaped public API.

Parity target (SURVEY U6): reference backend/tools/tool_registry.py:86-251 +
executor.py:92-139 — 8 named tools with JSON-schema'd parameters, role
gating, and a uniform ToolResult envelope. Here each tool dispatches to a
DataFrame pipeline; results are returned as a small dict envelope with the
DataFrame (lazy) or collected rows (for point tools).

Admission control mirrors the reference's chat path (§3.1): profanity/PII
gates as column predicates on the input, then a per-identifier sliding-window
rate limit (TTLCache-backed counter, 40/60 s default).
"""

from __future__ import annotations

import json
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

import re

from ai_powered_data_pipeline_assistant_spark.functions.caching import TTLCache, cache_key
from ai_powered_data_pipeline_assistant_spark.operators import (
    aggregates,
    relational,
    scalar_ops,
    vector,
)
from ai_powered_data_pipeline_assistant_spark.operators.pipeline import search_pipeline
from ai_powered_data_pipeline_assistant_spark.plans.sql_gate import safe_sql

RATE_LIMIT = 40  # reference guardrails.py:40
RATE_WINDOW_S = 60.0


@dataclass
class ToolResult:
    """Uniform result envelope (reference backend/tools/base.py:15-49)."""

    tool: str
    success: bool
    data: Any = None
    error: str | None = None
    execution_time_ms: float = 0.0

    def to_dict(self) -> dict:
        return {
            "tool": self.tool,
            "success": self.success,
            "data": self.data,
            "error": self.error,
            "execution_time_ms": round(self.execution_time_ms, 3),
        }


@dataclass
class RateLimiter:
    """Per-identifier sliding window (reference guardrails.py:23-37)."""

    limit: int = RATE_LIMIT
    window_s: float = RATE_WINDOW_S
    _seen: dict[str, deque] = field(default_factory=dict)

    def allow(self, identifier: str, now: float | None = None) -> bool:
        now = time.monotonic() if now is None else now
        q = self._seen.setdefault(identifier, deque())
        while q and now - q[0] > self.window_s:
            q.popleft()
        if len(q) >= self.limit:
            return False
        q.append(now)
        return True


class ToolRegistry:
    """Named tools over DataFrame pipelines, with role gating and TTL cache."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self.cache = TTLCache()
        self.rate_limiter = RateLimiter()
        # execution journal — the reference persists every tool call with
        # args/success/latency (reference Supabase/tool_executions.sql:2-12,
        # executor backend/tools/executor.py:92-139); here it's an
        # in-process ring buffer exposed as a DataFrame via execution_log()
        self._journal: list[dict] = []
        # tool → (fn(args) -> DataFrame, allowed roles)
        self._tools = {
            "query_data_source": (self._query_data_source, {"general", "data_engineer"}),
            "analyze_data_quality": (self._data_quality, {"data_engineer"}),
            "get_task_stats": (self._task_stats, {"general", "data_engineer"}),
            "smart_search": (self._smart_search, {"general", "data_engineer"}),
            "query_knowledge_base": (self._kb_search, {"general", "data_engineer"}),
            "read_chat_history": (self._chat_history, {"general", "data_engineer"}),
            "generate_sql_query": (self._run_sql, {"data_engineer"}),
            "generate_sql": (self._generate_sql, {"data_engineer"}),
            "schedule_pipeline": (self._schedule_pipeline, {"data_engineer"}),
            "run_query": (self._run_registered_query, {"data_engineer"}),
            "explain_query": (self._explain_query, {"data_engineer"}),
            "list_queries": (self._list_queries, {"general", "data_engineer"}),
        }

    def list_tools(self, role: str = "general") -> list[str]:
        return sorted(t for t, (_, roles) in self._tools.items() if role in roles)

    def execute(self, tool: str, args: dict | None = None, *, role: str = "general",
                identifier: str = "anon") -> ToolResult:
        args = args or {}
        t0 = time.perf_counter()
        if tool not in self._tools:
            return self._record(args, ToolResult(tool, False, error=f"unknown tool {tool!r}"))
        fn, roles = self._tools[tool]
        if role not in roles:
            return self._record(args, ToolResult(tool, False, error=f"role {role!r} not permitted"))
        if not self.rate_limiter.allow(identifier):
            return self._record(args, ToolResult(tool, False, error="rate limit exceeded"))
        key = cache_key(tool, args)
        cached = self.cache.get(key)
        if cached is not None:
            return self._record(args, ToolResult(
                tool, True, data=cached,
                execution_time_ms=(time.perf_counter() - t0) * 1e3))
        try:
            df: DataFrame = fn(args)
            rows = [r.asDict() for r in df.limit(args.get("max_rows", 100)).collect()]
            self.cache.put(key, rows)
            return self._record(args, ToolResult(
                tool, True, data=rows,
                execution_time_ms=(time.perf_counter() - t0) * 1e3))
        except Exception as exc:  # noqa: BLE001 — uniform error envelope
            return self._record(args, ToolResult(
                tool, False, error=str(exc)[:500],
                execution_time_ms=(time.perf_counter() - t0) * 1e3))

    _JOURNAL_CAP = 10_000  # bounded: old entries roll off

    def _record(self, args: dict, result: ToolResult) -> ToolResult:
        self._journal.append(
            {
                "tool_name": result.tool,
                "arguments": json.dumps(args, sort_keys=True, default=str),
                "success": result.success,
                "error": result.error,
                "execution_time_ms": float(round(result.execution_time_ms, 3)),
            }
        )
        if len(self._journal) > self._JOURNAL_CAP:
            del self._journal[: -self._JOURNAL_CAP]
        return result

    def execution_log(self) -> DataFrame:
        """The tool_executions audit table (reference
        Supabase/tool_executions.sql:2-12) as a DataFrame — queryable with
        the same engine it audits."""
        from pyspark.sql.types import (
            BooleanType,
            DoubleType,
            StringType,
            StructField,
            StructType,
        )

        schema = StructType(
            [
                StructField("tool_name", StringType()),
                StructField("arguments", StringType()),
                StructField("success", BooleanType()),
                StructField("error", StringType()),
                StructField("execution_time_ms", DoubleType()),
            ]
        )
        return self.spark.createDataFrame(self._journal, schema=schema)

    # ---- tool implementations (thin adapters over operators) ----
    def _query_data_source(self, args: dict) -> DataFrame:
        return relational.scan_project(self.spark, self.sf_dir)

    def _data_quality(self, args: dict) -> DataFrame:
        return aggregates.quality_metrics(self.spark, self.sf_dir)

    def _task_stats(self, args: dict) -> DataFrame:
        return aggregates.status_counts(self.spark, self.sf_dir)

    def _smart_search(self, args: dict) -> DataFrame:
        return search_pipeline(self.spark, self.sf_dir,
                               max_results=args.get("max_results", 100))

    def _kb_search(self, args: dict) -> DataFrame:
        return vector.cosine_topk(self.spark, self.sf_dir, k=args.get("k", 10))

    def _chat_history(self, args: dict) -> DataFrame:
        return relational.newest_n(self.spark, self.sf_dir, n=args.get("n", 100))

    def _run_sql(self, args: dict) -> DataFrame:
        return safe_sql(self.spark, args["query"])

    # NL→SQL templates (U5, reference backend/tools/data_tools.py:120-195 —
    # there a prompt template + LLM; here deterministic rule templates, so
    # the output is testable. Every generated statement still passes the P9
    # safety gate before execution.)
    _NL_RULES = [
        (
            re.compile(r"^count (\w+) by (\w+)$", re.I),
            lambda m: f"SELECT {m.group(2)}, count(*) AS cnt FROM {m.group(1)} GROUP BY {m.group(2)}",  # noqa: E501
        ),
        (
            re.compile(r"^top (\d+) (\w+) by (\w+)$", re.I),
            lambda m: f"SELECT * FROM {m.group(2)} ORDER BY {m.group(3)} DESC LIMIT {m.group(1)}",  # noqa: E501
        ),
        (
            re.compile(r"^show (\w+(?:, ?\w+)*) from (\w+)$", re.I),
            lambda m: f"SELECT {m.group(1)} FROM {m.group(2)}",
        ),
    ]

    def _generate_sql(self, args: dict) -> DataFrame:
        request = args["request"].strip()
        for pattern, template in self._NL_RULES:
            m = pattern.match(request)
            if m:
                return safe_sql(self.spark, template(m))
        raise ValueError(
            f"no SQL template matches {request!r}; supported shapes: "
            "'count <table> by <col>', 'top <n> <table> by <col>', "
            "'show <cols> from <table>'"
        )

    def _schedule_pipeline(self, args: dict) -> DataFrame:
        return scalar_ops.schedule_arithmetic(self.spark, self.sf_dir)

    def _list_queries(self, args: dict) -> DataFrame:
        """Discovery surface for `run_query` / `explain_query`: every
        registered query with whether it carries a DuckDB oracle (i.e. is
        value-verified, not just rows-checked) and its defining module.
        Optional `prefix` filters by name."""
        from ai_powered_data_pipeline_assistant_spark.registry import (
            all_oracles,
            all_queries,
        )

        qs = all_queries()
        oracles = all_oracles()
        prefix = args.get("prefix", "")
        rows = [
            (name, name in oracles, fn.__module__.rsplit(".", 1)[-1])
            for name, fn in sorted(qs.items())
            if name.startswith(prefix)
        ]
        return self.spark.createDataFrame(
            rows, "name string, has_oracle boolean, module string"
        )

    def _explain_query(self, args: dict) -> DataFrame:
        """EXPLAIN surface: the formatted physical plan of any registered
        query as (line_no, line) rows — the observability endpoint a data
        engineer uses to confirm pushdown/broadcast/codegen before running a
        query at scale, without executing it. Plan modes mirror
        DataFrame.explain (`formatted` default, `simple`, `extended`,
        `cost`, `codegen`)."""
        from ai_powered_data_pipeline_assistant_spark.registry import all_queries

        name = args.get("name", "")
        qs = all_queries()
        if name not in qs:
            raise KeyError(f"unknown query {name!r}; see list_queries")
        df = qs[name](self.spark, self.sf_dir)
        mode = args.get("mode", "formatted")
        text = self.spark._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), mode
        )
        rows = [(i, line) for i, line in enumerate(text.splitlines())]
        return self.spark.createDataFrame(rows, "line_no int, line string")

    def _run_registered_query(self, args: dict) -> DataFrame:
        """Expose the FULL operator registry through the gated tool surface
        (the engine-native analogue of the reference's tool dispatch,
        backend/tools/tool_registry.py:79-316): any named query runs under
        the same role gate, rate limit, TTL cache, and row cap as the
        built-in tools. Names are validated against the registry — no
        arbitrary code or SQL path (ad-hoc SQL stays behind
        generate_sql_query's P9 gate)."""
        from ai_powered_data_pipeline_assistant_spark.registry import all_queries

        name = args.get("name", "")
        qs = all_queries()
        if name not in qs:
            raise KeyError(f"unknown query {name!r}; see list_queries")
        return qs[name](self.spark, self.sf_dir)


# ---------------------------------------------------------------- chat path
_INTENT_ROUTES: tuple[tuple[str, str], ...] = (
    # first matching pattern wins — mirrors the reference's chat
    # orchestration deciding which tool a message needs (§3.1,
    # reference backend/main.py chat endpoint → tool_executor)
    (r"(?i)\b(search|find|look up)\b", "smart_search"),
    (r"(?i)\b(quality|complete|valid)\b", "analyze_data_quality"),
    (r"(?i)\b(history|conversation)\b", "read_chat_history"),
    (r"(?i)\b(select|sql|query table)\b", "generate_sql_query"),
    (r"(?i)\b(task|job|stats)\b", "get_task_stats"),
)
_CHAT_DEFAULT_TOOL = "query_knowledge_base"


class ChatHandler:
    """§3.1 end-to-end chat entry: admission gates → intent route → tool
    execution → session history append. The reference's POST /chat/
    lifecycle (gate, orchestrate, persist chat_history) with the LLM
    replaced by deterministic intent routing per SURVEY §7.4.
    """

    def __init__(self, registry: ToolRegistry):
        self.registry = registry
        self._history: list[dict] = []

    def handle(self, message: str, *, session_id: str = "s0",
               role: str = "general", identifier: str = "anon") -> ToolResult:
        from ai_powered_data_pipeline_assistant_spark.functions.text import PII_PATTERN

        if re.search(r"(?i)\b(damn|hell|crap)\b", message):
            result = ToolResult("chat", False, error="message rejected: profanity")
        elif re.search(PII_PATTERN, message):
            result = ToolResult("chat", False, error="message rejected: PII detected")
        else:
            tool = _CHAT_DEFAULT_TOOL
            for pattern, routed in _INTENT_ROUTES:
                if re.search(pattern, message):
                    tool = routed
                    break
            result = self.registry.execute(
                tool, {"q": message}, role=role, identifier=identifier
            )
        self._history.append(
            {
                "session_id": session_id,
                "role": "user",
                "content": message,
                "tool_used": result.tool,
                "success": result.success,
            }
        )
        return result

    def history(self) -> DataFrame:
        """The chat_history table (reference Supabase/chat_history.sql:2-16)
        as a DataFrame."""
        from pyspark.sql.types import (
            BooleanType,
            StringType,
            StructField,
            StructType,
        )

        schema = StructType(
            [
                StructField("session_id", StringType()),
                StructField("role", StringType()),
                StructField("content", StringType()),
                StructField("tool_used", StringType()),
                StructField("success", BooleanType()),
            ]
        )
        return self.registry.spark.createDataFrame(self._history, schema=schema)
