"""Driver-scorable batch twins for the §2 surfaces previously verified
only by pytest: the SQL-safety gate (P9/O9), log-injection scrub (F3),
UPDATE-by-id (S12), INSERT sinks (S9/S10), TTL-cache stats (A5), NL→SQL
templates (U5), and the tool registry itself (U6).

Each operator projects the surface's *deterministic decision function*
onto a DataFrame the correctness driver can hash against a DuckDB oracle:
gate verdicts over a fixed probe set, the scrub transform over synthesized
injection-bearing lines, the UPDATE/INSERT relational algebra applied
batch-side, a distributed replay of the TTL cache's hit/miss policy, and
the registry's tool/role table. The probe sets are FIXED and tiny (≤8
entries), so the per-probe driver-side loop is bounded by construction —
the corpus-sized work stays in DataFrame plans.

Parity targets:
- sql_gate_audit: reference backend/utils/sql_safety.py:51-231 (SELECT-only,
  keyword deny, join/subquery/length caps, row cap) via plans/sql_gate.py.
- log_scrub: reference backend/utils/sanitization.py:74-114 (newline/CR
  injection scrub before log emission) via functions/text.scrub_log_line.
- update_by_id: reference backend/db/optimized_queries.py UPDATE-by-id shape
  (sinks.ParquetTable.update_where applies the same WHEN/OTHERWISE algebra
  to the stored table; this twin scores the algebra without the file swap).
- insert_append_audit: reference insert paths (S9/S10) — post-INSERT state
  as UNION ALL with the incoming batch.
- cache_hit_simulation: reference backend/utils/caching.py TTL policy
  (functions/caching.TTLCache) replayed distributedly: insertion-anchored
  expiry — an access hits iff its time since the last MISS for the key
  (the insertion) is ≤ TTL, no refresh-on-read.
- nl2sql_audit: the deterministic NL→SQL templates (api/tools._NL_RULES,
  reference backend/tools/data_tools.py:120-195) executed through the
  public ToolRegistry.execute path, gate included.
- tool_registry_audit: the tool/role capability matrix
  (api/tools.ToolRegistry._tools, reference backend/tools/tool_registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table, load_tables
from ai_powered_data_pipeline_assistant_spark.execution import materialize
from ai_powered_data_pipeline_assistant_spark.functions.text import scrub_log_line
from ai_powered_data_pipeline_assistant_spark.plans.sql_gate import (
    UnsafeQueryError,
    safe_sql,
)

# ---------------------------------------------------------------------------
# P9/O9 — SQL-safety gate verdicts over a fixed probe set
# ---------------------------------------------------------------------------

_SIX_JOIN = (
    "SELECT a.r_regionkey FROM region a"
    + "".join(
        f" JOIN region {c} ON a.r_regionkey = {c}.r_regionkey"
        for c in "bcdefg"
    )
)
_FOUR_SUBQ = (
    "SELECT"
    + ", ".join(
        f" (SELECT max(r_regionkey) + {i} FROM region) AS s{i}" for i in range(4)
    )
)

# (probe_id, sql) — fixed, ≤8 entries; verdicts are data-independent and the
# two allowed probes return sf-independent row counts (region is 5 rows at
# every TPC-H sf; the row cap clamps lineitem to MAX_ROWS=1000).
GATE_PROBES: list[tuple[str, str]] = [
    ("select_ok", "SELECT r_name FROM region ORDER BY r_name"),
    ("row_cap", "SELECT l_orderkey FROM lineitem"),
    ("not_select", "INSERT INTO region VALUES (9, 'X', 'x')"),
    ("keyword", "SELECT r_name FROM region; DROP TABLE region"),
    ("too_long", "SELECT 1 -- " + "x" * 5001),
    ("joins", _SIX_JOIN),
    ("subqueries", _FOUR_SUBQ),
    ("reflect", "SELECT reflect('java.lang.System', 'getenv', 'HOME')"),
]

_REASON_CLASSES = [
    ("longer than", "too_long"),
    ("only SELECT", "not_select"),
    ("forbidden keyword", "keyword"),
    ("forbidden operation", "plan_deny"),
    ("too many joins", "joins"),
    ("too many subqueries", "subqueries"),
]


def sql_gate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per gate probe: (probe, allowed, reason, rows).

    `rows` is the post-row-cap count for allowed probes (the cap is part of
    the contract being scored) and 0 for denied ones. The loop runs over
    the FIXED 8-probe set — gate validation is a planning-time decision, so
    per-probe driver-side dispatch is the honest cost model; each allowed
    probe's count() is a distributed action.
    """
    load_tables(spark, sf_dir, register_views=True)
    rows = []
    for probe_id, sql in GATE_PROBES:
        try:
            df = safe_sql(spark, sql)
            rows.append((probe_id, True, "ok", df.count()))
        except UnsafeQueryError as exc:
            reason = next(
                (cls for needle, cls in _REASON_CLASSES if needle in str(exc)),
                "denied",
            )
            rows.append((probe_id, False, reason, 0))
    return spark.createDataFrame(
        rows, "probe string, allowed boolean, reason string, rows bigint"
    )


# ---------------------------------------------------------------------------
# F3 — log-injection scrub over synthesized injection-bearing log lines
# ---------------------------------------------------------------------------


def log_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble a log line per event with embedded newline/CR injection
    (the corpus itself has none), scrub it, and report the scrubbed line
    plus how many injection characters were neutralized. Pure column
    expressions — one projection, no shuffle."""
    events = load_table(spark, sf_dir, "events")
    raw = F.concat(
        F.lit("user="),
        F.col("user_id").cast("string"),
        F.lit("\n"),
        F.lit("type="),
        F.col("event_type"),
        F.lit("\r"),
        F.lit("msg="),
        F.col("props"),
    )
    stripped = F.regexp_replace(raw, r"[\r\n]", "")
    return events.select(
        "event_id",
        scrub_log_line(raw).alias("scrubbed"),
        (F.length(raw) - F.length(stripped)).alias("n_injected"),
    )


# ---------------------------------------------------------------------------
# S12 — UPDATE-by-id relational algebra (sinks.update_where's WHEN/OTHERWISE)
# ---------------------------------------------------------------------------

UPDATE_ID_MOD = 97


def update_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-UPDATE state of `documents` for
    ``UPDATE documents SET lang = 'und' WHERE doc_id % 97 = 0`` — the same
    WHEN(predicate, expr).OTHERWISE(col) algebra `ParquetTable.update_where`
    writes back (sources/sinks.py), scored without the file swap. The
    `updated` flag carries the affected-row count the sink API returns."""
    docs = load_table(spark, sf_dir, "documents")
    pred = F.col("doc_id") % UPDATE_ID_MOD == 0
    return docs.select(
        "doc_id",
        F.when(pred, F.lit("und")).otherwise(F.col("lang")).alias("lang"),
        pred.alias("updated"),
    )


# ---------------------------------------------------------------------------
# S9/S10 — INSERT sink post-state (append as UNION ALL with the batch)
# ---------------------------------------------------------------------------

_INSERT_BATCH = [
    (9_000_001, "manual ingest one", "en", "manual", 17),
    (9_000_002, "manual ingest two", "en", "manual", 17),
    (9_000_003, "manual ingest three", "de", "manual", 19),
]


def insert_append_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source row counts AFTER appending a fixed 3-row batch — the
    observable post-state of `ParquetTable.append` (INSERT) without writing
    files. The batch is a constant; the count is one map-side-combined
    groupBy over the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    batch = spark.createDataFrame(
        _INSERT_BATCH, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    return (
        docs.select("source")
        .unionAll(batch.select("source"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# A5/F11 — TTL cache hit/miss policy replayed distributedly
# ---------------------------------------------------------------------------

CACHE_TTL_US = 600 * 1_000_000  # 10-minute TTL, integer microseconds

# Above this measured max-accesses-per-key, the in-row `aggregate` fold
# (which materializes one key's whole access history as a single array row)
# gives way to the pointer-doubling chain walk — O(1) state per ROW, exact
# same verdicts. 250k struct entries ≈ 10 MB per row: a safe upper bite.
CACHE_FOLD_MAX_KEY_ACCESSES = 250_000


def cache_hit_simulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay the EXACT TTLCache policy (functions/caching.TTLCache.get,
    reference backend/utils/caching.py:50-251) over the event stream:
    key = user_id, entries expire from INSERTION time with no
    refresh-on-read — an access HITS iff its time since the last MISS
    (= the insertion that populated the entry) is ≤ TTL; a miss re-inserts
    and restarts the epoch. This is NOT a sliding (refresh-on-access)
    window: accesses at 0/9/18 min with a 10-min TTL are miss, hit, MISS —
    the 18-min access is 18 min after the insertion even though only 9 min
    after the previous access. Per event_type hit/miss totals and hit rate.

    Scale design — measure, then pick (the repo-standard adaptive guard):
    - While the measured max accesses-per-key fits an in-row array
      (CACHE_FOLD_MAX_KEY_ACCESSES), the epoch fold runs as the
      `aggregate` higher-order function over each key's sorted access
      array: ONE hash shuffle on the key, all arithmetic JVM-side.
    - Past it (a hot key with 10⁸ accesses would be one giant row), the
      replay switches to `_cache_verdicts_chain`: gap-sessionize, then
      pointer-double the greedy miss chain — O(1) state per row, O(log
      misses-per-session) join rounds, exact same verdicts (docstring
      there has the proof sketch).
    Timestamps compare as integer microseconds (unix_micros vs DuckDB
    epoch_us) so the TTL boundary is exact, never a float tolerance."""
    events = load_table(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ off parquet; session tz is UTC, so the cast is the
    # identity conversion that makes unix_micros applicable (same convention
    # as behavior.event_gaps).
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    acc = events.select("user_id", us.alias("ts_us"), "event_id", "event_type")
    max_per_key = (
        acc.groupBy("user_id").agg(F.count("*").alias("c")).agg(F.max("c")).first()[0]
    )
    if max_per_key is not None and max_per_key > CACHE_FOLD_MAX_KEY_ACCESSES:
        folded = _cache_verdicts_chain(acc)
    else:
        folded = _cache_verdicts_fold(acc)
    hits = F.sum(F.when(F.col("hit"), 1).otherwise(0))
    total = F.count("*")
    return (
        folded.groupBy("event_type")
        .agg(
            hits.alias("hits"),
            (total - hits).alias("misses"),
            F.round(hits / total.cast("double"), 6).alias("hit_rate"),
        )
        .orderBy("event_type")
    )


def _cache_verdicts_fold(acc: DataFrame) -> DataFrame:
    """(event_type, hit) per access via the in-row sequential fold — the
    small-key path: each key's history becomes one sorted array row."""
    per_key = (
        # sort_array orders the struct lexicographically → (ts_us, event_id)
        # is the same total order as the oracle's ORDER BY ts, event_id
        acc.groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("ts_us", "event_id", "event_type"))
            ).alias("acc")
        )
    )
    # Fold state = (epoch = ts of the last miss, out = per-access verdicts).
    # Seed epoch at -2^62 so the first access is always a miss (and the
    # subtraction stays inside int64).
    return per_key.select(
        F.explode(
            F.expr(
                f"""
                aggregate(
                  acc,
                  struct(CAST(-4611686018427387904 AS BIGINT) AS epoch,
                         CAST(array() AS
                              array<struct<event_type: string, hit: boolean>>)
                             AS out),
                  (s, x) -> struct(
                      CASE WHEN x.ts_us - s.epoch <= {CACHE_TTL_US}
                           THEN s.epoch ELSE x.ts_us END AS epoch,
                      array_append(
                          s.out,
                          struct(x.event_type AS event_type,
                                 x.ts_us - s.epoch <= {CACHE_TTL_US} AS hit))
                          AS out),
                  s -> s.out)
                """
            )
        ).alias("a")
    ).select("a.event_type", "a.hit")


def _cache_verdicts_chain(acc: DataFrame) -> DataFrame:
    """(event_type, hit) per access with O(1) state per ROW — the hot-key
    path. Exact, not approximate:

    1. Gap-sessionize each key at inter-access gaps > TTL. The access that
       opens a session is provably a MISS regardless of prior state (epoch
       ≤ previous access ts, so its age > gap > TTL), so sessions replay
       independently — this is the only boundary at which the sequential
       policy actually decouples (fixed time-bucket splits do NOT: an
       epoch-alignment shift cascades arbitrarily far past a boundary).
    2. Within a session (all gaps ≤ TTL) the misses form the greedy chain
       m₀ = first access, m_{k+1} = first access with ts > ts(m_k) + TTL.
       `g(i)` = that jump target's intra-session index = the count of
       in-session accesses with ts ≤ ts_i + TTL — ONE rangeBetween window
       sharing the sessionization shuffle. The chain = the orbit of index
       0 under g, computed by pointer doubling (reach ∪ jump(reach), jump
       squared each round — connected_components' trick applied to a
       functional graph): O(log misses-per-session) equi-join rounds,
       every frame row-per-access, never row-per-key.
    3. hit(i) ⇔ i not in the orbit.
    """
    order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_reset = F.when(
        F.col("ts_us") - F.lag("ts_us").over(order) > CACHE_TTL_US, 1
    ).otherwise(0)
    with_sess = acc.withColumn("sess", F.sum(gap_reset).over(order))
    sess_w = Window.partitionBy("user_id", "sess").orderBy("ts_us", "event_id")
    range_w = (
        Window.partitionBy("user_id", "sess")
        .orderBy("ts_us")
        .rangeBetween(Window.unboundedPreceding, CACHE_TTL_US)
    )
    n_w = Window.partitionBy("user_id", "sess")
    base = with_sess.select(
        "user_id",
        "sess",
        "event_type",
        (F.row_number().over(sess_w) - 1).alias("idx"),
        # g(idx): ties in ts_us all count (≤ bound), matching the policy's
        # hit-iff-age-≤-TTL with the (ts, event_id) total order
        F.count("*").over(range_w).alias("g"),
        F.count("*").over(n_w).alias("n_sess"),
        # per-session miss-chain length bound: one miss per TTL of span
        (
            (F.max("ts_us").over(n_w) - F.min("ts_us").over(n_w))
            / F.lit(CACHE_TTL_US)
        ).alias("span_ttls"),
    ).transform(materialize)
    max_chain = base.agg(F.max("span_ttls")).first()[0]
    if max_chain is None:  # no accesses at all
        return base.select("event_type", F.lit(True).alias("hit"))
    rounds = max(1, int(max_chain + 1).bit_length())
    jump = base.filter(F.col("g") < F.col("n_sess")).select(
        "user_id", "sess", "idx", "g"
    )
    reach = base.filter(F.col("idx") == 0).select("user_id", "sess", "idx")
    for k in range(rounds):
        # reach covers chain distances < 2^k; jump spans 2^k steps → after
        # this round reach covers < 2^{k+1}. Distances are unique along a
        # chain, so no dedup shuffle is needed.
        reach = reach.union(
            reach.join(jump, ["user_id", "sess", "idx"]).select(
                "user_id", "sess", F.col("g").alias("idx")
            )
        ).transform(materialize)
        if k < rounds - 1:
            j2 = jump.select(
                F.col("user_id"),
                F.col("sess"),
                F.col("g").alias("idx"),
                F.col("idx").alias("_src"),
            )
            jump = (
                j2.join(jump, ["user_id", "sess", "idx"])
                .select(
                    "user_id", "sess", F.col("_src").alias("idx"), "g"
                )
                .transform(materialize)
            )
    misses = reach.withColumn("is_miss", F.lit(True))
    return (
        base.join(misses, ["user_id", "sess", "idx"], "left")
        .select(
            "event_type",
            F.coalesce(~F.col("is_miss"), F.lit(True)).alias("hit"),
        )
    )


# ---------------------------------------------------------------------------
# U5 — NL→SQL templates through the public ToolRegistry.execute path
# ---------------------------------------------------------------------------

NL_PROBES = [
    "count nation by n_regionkey",
    "top 3 region by r_regionkey",
    "show r_name from region",
    "drop all the tables",  # no template → matched=false, gate never reached
]


def nl2sql_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per fixed NL request: did a template match, and how many
    rows did the generated (gate-validated) SQL return. Probes target
    `region`/`nation` so counts are sf-independent."""
    from ai_powered_data_pipeline_assistant_spark.api.tools import ToolRegistry

    load_tables(spark, sf_dir, register_views=True)
    reg = ToolRegistry(spark, sf_dir)
    rows = []
    for request in NL_PROBES:
        res = reg.execute("generate_sql", {"request": request}, role="data_engineer")
        rows.append((request, res.success, len(res.data) if res.success else 0))
    return spark.createDataFrame(rows, "request string, matched boolean, n_rows bigint")


# ---------------------------------------------------------------------------
# U6 — tool/role capability matrix
# ---------------------------------------------------------------------------


def tool_registry_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tool, roles_csv, engineer_only) for every registered tool — the
    golden capability matrix of the API surface (role gating is part of the
    contract; a silently widened role set should fail the driver hash)."""
    from ai_powered_data_pipeline_assistant_spark.api.tools import ToolRegistry

    reg = ToolRegistry(spark, sf_dir)
    rows = [
        (tool, ",".join(sorted(roles)), roles == {"data_engineer"})
        for tool, (_, roles) in sorted(reg._tools.items())
    ]
    return spark.createDataFrame(
        rows, "tool string, roles_csv string, engineer_only boolean"
    )


QUERIES = {
    "sql_gate_audit": sql_gate_audit,
    "log_scrub": log_scrub,
    "update_by_id": update_by_id,
    "insert_append_audit": insert_append_audit,
    "cache_hit_simulation": cache_hit_simulation,
    "nl2sql_audit": nl2sql_audit,
    "tool_registry_audit": tool_registry_audit,
}

# The gate/NL/registry oracles are constant VALUES tables: the *expected*
# verdicts are the specification, so the oracle states them outright and the
# driver hash fails if the engine's decisions drift.
ORACLES = {
    "sql_gate_audit": """
        SELECT * FROM (VALUES
            ('select_ok',  true,  'ok',         CAST(5 AS BIGINT)),
            ('row_cap',    true,  'ok',         CAST(1000 AS BIGINT)),
            ('not_select', false, 'not_select', CAST(0 AS BIGINT)),
            ('keyword',    false, 'keyword',    CAST(0 AS BIGINT)),
            ('too_long',   false, 'too_long',   CAST(0 AS BIGINT)),
            ('joins',      false, 'joins',      CAST(0 AS BIGINT)),
            ('subqueries', false, 'subqueries', CAST(0 AS BIGINT)),
            ('reflect',    false, 'keyword',    CAST(0 AS BIGINT))
        ) AS t(probe, allowed, reason, rows)
    """,
    "log_scrub": """
        SELECT event_id,
               regexp_replace(
                   'user=' || CAST(user_id AS VARCHAR) || chr(10) ||
                   'type=' || event_type || chr(13) || 'msg=' || props,
                   '[\r\n]', ' ', 'g') AS scrubbed,
               CAST(2 AS BIGINT) AS n_injected
        FROM events
    """,
    "update_by_id": """
        SELECT doc_id,
               CASE WHEN doc_id % 97 = 0 THEN 'und' ELSE lang END AS lang,
               doc_id % 97 = 0 AS updated
        FROM documents
    """,
    "insert_append_audit": """
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        FROM (
            SELECT source FROM documents
            UNION ALL SELECT 'manual'
            UNION ALL SELECT 'manual'
            UNION ALL SELECT 'manual'
        )
        GROUP BY source ORDER BY source
    """,
    # Insertion-anchored TTL walked per key by a recursive CTE: epoch = ts
    # of the last miss; hit iff ts - epoch <= TTL (TTLCache.get's `now -
    # insert > ttl` miss test, boundary inclusive).
    "cache_hit_simulation": """
        WITH RECURSIVE ordered AS (
            SELECT user_id, event_type, epoch_us(ts) AS ts_us,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events),
        walk AS (
            SELECT user_id, rn, event_type, ts_us,
                   ts_us AS epoch, false AS hit
            FROM ordered WHERE rn = 1
            UNION ALL
            SELECT o.user_id, o.rn, o.event_type, o.ts_us,
                   CASE WHEN o.ts_us - w.epoch <= 600000000
                        THEN w.epoch ELSE o.ts_us END,
                   o.ts_us - w.epoch <= 600000000
            FROM walk w JOIN ordered o
                 ON o.user_id = w.user_id AND o.rn = w.rn + 1)
        SELECT event_type,
               CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS hits,
               CAST(count(*) - sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
                   AS misses,
               round(CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
                     / CAST(count(*) AS DOUBLE), 6) AS hit_rate
        FROM walk GROUP BY event_type ORDER BY event_type
    """,
    "nl2sql_audit": """
        SELECT * FROM (VALUES
            ('count nation by n_regionkey', true,  CAST(5 AS BIGINT)),
            ('top 3 region by r_regionkey', true,  CAST(3 AS BIGINT)),
            ('show r_name from region',     true,  CAST(5 AS BIGINT)),
            ('drop all the tables',         false, CAST(0 AS BIGINT))
        ) AS t(request, matched, n_rows)
    """,
    "tool_registry_audit": """
        SELECT * FROM (VALUES
            ('analyze_data_quality', 'data_engineer', true),
            ('explain_query', 'data_engineer', true),
            ('generate_sql', 'data_engineer', true),
            ('generate_sql_query', 'data_engineer', true),
            ('get_task_stats', 'data_engineer,general', false),
            ('list_queries', 'data_engineer,general', false),
            ('query_data_source', 'data_engineer,general', false),
            ('query_knowledge_base', 'data_engineer,general', false),
            ('read_chat_history', 'data_engineer,general', false),
            ('run_query', 'data_engineer', true),
            ('schedule_pipeline', 'data_engineer', true),
            ('smart_search', 'data_engineer,general', false)
        ) AS t(tool, roles_csv, engineer_only)
    """,
}
