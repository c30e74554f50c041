"""Graph & sequence analytics over the event stream: PageRank on the
event-transition graph, a Markov next-event prediction audit, and frequent
event trigrams.

The reference models user behavior only as flat counters (reference
backend/db/optimized_queries.py:118-150); these operators add the standard
sequence-mining layer a training-data pipeline uses to understand and
re-weight behavioral corpora.

Scale design:
- ``event_pagerank``: the rank vector lives on the NODE set (distinct
  event/page types — orders of magnitude smaller than the event log), and
  each of the fixed ITERATIONS is one equi-join + one map-side-combined
  groupBy on the edge list. No driver-side loop state: the whole 3-step
  power iteration is a single declarative DAG (the node count enters as a
  broadcast 1-row aggregate, never a collect), so Catalyst sees and
  pipelines all of it. For web-scale node sets the same DAG holds — rank
  and edges shuffle on the node key.
- ``markov_prediction_audit``: the temporal split point is a broadcast
  1-row min/max aggregate; training counts and test scoring are two
  map-side-combined groupBys over one lag window (one user_id shuffle,
  shared by both phases).
- ``event_trigrams``: two leads over the same user_id window (one shuffle),
  then a groupBy on the trigram key with a bounded top-N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table

DAMPING = 0.85
PAGERANK_ITERATIONS = 3
TRAIN_PCT = 70  # markov audit: first 70% of the time range trains
TOP_TRIGRAMS = 10


def _transition_pairs(events: DataFrame) -> DataFrame:
    """(prev_type, next_type, next_es) for consecutive events per user.

    next_es (epoch seconds of the LATER event) decides train/test
    membership in the markov audit; integer seconds so Spark and DuckDB
    agree exactly.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
            F.unix_timestamp("ts").alias("next_es"),
        )
        .filter(F.col("prev_type").isNotNull())
    )


def event_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the event-type transition graph (damping 0.85, fixed
    3 power iterations, uniform init).

    Nodes are distinct event types; edge weight u→v is the row-normalized
    transition probability (share of u's outgoing transitions that go to
    v). Rank is computed fully declaratively: the node count N enters as a
    broadcast one-row aggregate, and each iteration is
    ``rank' = (1-d)/N + d * Σ_u rank(u)·p(u→v)`` — one join + groupBy on
    the edges, a left join back to nodes so sink-only nodes keep the
    teleport mass.
    """
    events = load_table(spark, sf_dir, "events")
    pairs = _transition_pairs(events)
    counts = pairs.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    out_w = Window.partitionBy("prev_type")
    edges = counts.select(
        F.col("prev_type").alias("src"),
        F.col("next_type").alias("dst"),
        (F.col("n") / F.sum("n").over(out_w).cast("double")).alias("p"),
    )
    nodes = events.select(F.col("event_type").alias("v")).distinct()
    n_nodes = nodes.agg(F.count("*").cast("double").alias("n_nodes"))
    rank = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "v", (F.lit(1.0) / F.col("n_nodes")).alias("r")
    )
    for _ in range(PAGERANK_ITERATIONS):
        contrib = (
            edges.join(rank.withColumnRenamed("v", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("p")).alias("inflow"))
        )
        rank = (
            nodes.crossJoin(F.broadcast(n_nodes))
            .join(contrib.withColumnRenamed("dst", "v"), "v", "left")
            .select(
                "v",
                (
                    (F.lit(1.0) - F.lit(DAMPING)) / F.col("n_nodes")
                    + F.lit(DAMPING) * F.coalesce("inflow", F.lit(0.0))
                ).alias("r"),
            )
        )
    return rank.select(
        F.col("v").alias("event_type"), F.round("r", 6).alias("pagerank")
    ).orderBy("event_type")


def markov_prediction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test audit of a first-order Markov next-event model.

    Transitions whose LATER event falls in the first TRAIN_PCT% of the
    table's time range train the model (argmax next per prev, count desc /
    name asc tie-break); the rest are scored top-1. Reports per-prev test
    volume, hits, and accuracy — the model-eval shape every behavioral
    corpus re-weighting job needs.
    """
    events = load_table(spark, sf_dir, "events")
    pairs = _transition_pairs(events)
    bounds = events.agg(
        F.min(F.unix_timestamp("ts")).alias("mn"),
        F.max(F.unix_timestamp("ts")).alias("mx"),
    ).select(
        # integer DIV on both engines — double-division-then-cast rounds in
        # DuckDB but truncates in Spark
        F.expr(f"mn + ((mx - mn) * {TRAIN_PCT}) DIV 100").alias("cutoff")
    )
    tagged = pairs.crossJoin(F.broadcast(bounds)).select(
        "prev_type", "next_type", (F.col("next_es") < F.col("cutoff")).alias("is_train")
    )
    # ONE pass over the transition pairs (round 13, guide §2.4): train
    # counting and test scoring both reduce to the tiny
    # (prev, next, is_train) count cube — the old shape filtered `tagged`
    # twice, re-running the lag window (the expensive user_id shuffle+sort)
    # once per side. The cube is |event types|²·2 rows; materialized so its
    # two consumers don't recompute the window either.
    from ai_powered_data_pipeline_assistant_spark.execution import materialize

    counts = (
        tagged.groupBy("prev_type", "next_type", "is_train")
        .agg(F.count("*").alias("n"))
        .transform(materialize)
    )
    train_counts = counts.filter("is_train").select("prev_type", "next_type", "n")
    pick = Window.partitionBy("prev_type").orderBy(F.desc("n"), F.asc("next_type"))
    predicted = (
        train_counts.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select("prev_type", F.col("next_type").alias("predicted_next"))
    )
    test_counts = counts.filter(~F.col("is_train")).select(
        "prev_type", "next_type", "n"
    )
    return (
        test_counts.join(F.broadcast(predicted), "prev_type", "left")
        .groupBy("prev_type", "predicted_next")
        .agg(
            F.sum("n").alias("n_test"),
            # when(...).otherwise(0) (not a bare cast) so a NULL prediction
            # counts as a miss on both engines
            F.sum(
                F.when(
                    F.col("next_type") == F.col("predicted_next"), F.col("n")
                ).otherwise(0)
            ).alias("n_correct"),
        )
        .select(
            "prev_type",
            "predicted_next",
            "n_test",
            "n_correct",
            F.round(F.col("n_correct") / F.col("n_test").cast("double"), 6).alias(
                "accuracy"
            ),
        )
        .orderBy("prev_type")
    )


def event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N most frequent 3-event sequences (per-user consecutive runs)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        events.select(
            F.col("event_type").alias("t1"),
            F.lead("event_type", 1).over(w).alias("t2"),
            F.lead("event_type", 2).over(w).alias("t3"),
        )
        .filter(F.col("t3").isNotNull())
    )
    return (
        tri.groupBy("t1", "t2", "t3")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "t1", "t2", "t3")
        .limit(TOP_TRIGRAMS)
    )


_PAIRS_CTE = """
    pairs AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type,
               event_type AS next_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS next_es
        FROM events
        QUALIFY prev_type IS NOT NULL)
"""

_PAGERANK_ITER = """
        r{k} AS (
            SELECT n.v,
                   (1 - {d}) / nn.n_nodes
                   + {d} * coalesce(sum(r{prev}.r * e.p), 0) AS r
            FROM nodes n
            CROSS JOIN ncount nn
            LEFT JOIN e ON e.dst = n.v
            LEFT JOIN r{prev} ON r{prev}.v = e.src
            GROUP BY n.v, nn.n_nodes)
"""


def _pagerank_oracle() -> str:
    iters = ",".join(
        _PAGERANK_ITER.format(k=k, prev=k - 1, d=DAMPING)
        for k in range(1, PAGERANK_ITERATIONS + 1)
    )
    return f"""
        WITH {_PAIRS_CTE.strip().rstrip()},
        counts AS (
            SELECT prev_type, next_type, count(*) AS n
            FROM pairs GROUP BY 1, 2),
        e AS (
            SELECT prev_type AS src, next_type AS dst,
                   n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
            FROM counts),
        nodes AS (SELECT DISTINCT event_type AS v FROM events),
        ncount AS (SELECT CAST(count(*) AS DOUBLE) AS n_nodes FROM nodes),
        r0 AS (
            SELECT v, 1.0 / nn.n_nodes AS r
            FROM nodes CROSS JOIN ncount nn),
        {iters}
        SELECT v AS event_type, round(r, 6) AS pagerank
        FROM r{PAGERANK_ITERATIONS}
        ORDER BY event_type
    """


ORACLES: dict[str, str] = {
    "event_pagerank": _pagerank_oracle(),
    "markov_prediction_audit": f"""
        WITH {_PAIRS_CTE.strip().rstrip()},
        bounds AS (
            SELECT min(CAST(floor(epoch(ts)) AS BIGINT))
                   + (max(CAST(floor(epoch(ts)) AS BIGINT))
                      - min(CAST(floor(epoch(ts)) AS BIGINT)))
                     * {TRAIN_PCT} // 100 AS cutoff
            FROM events),
        tagged AS (
            SELECT prev_type, next_type, next_es < cutoff AS is_train
            FROM pairs CROSS JOIN bounds),
        train_counts AS (
            SELECT prev_type, next_type, count(*) AS n
            FROM tagged WHERE is_train GROUP BY 1, 2),
        predicted AS (
            SELECT prev_type, next_type AS predicted_next
            FROM train_counts
            QUALIFY row_number() OVER (PARTITION BY prev_type
                                       ORDER BY n DESC, next_type ASC) = 1)
        SELECT t.prev_type, p.predicted_next,
               count(*) AS n_test,
               CAST(sum(CASE WHEN t.next_type = p.predicted_next
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
               round(CAST(sum(CASE WHEN t.next_type = p.predicted_next
                                   THEN 1 ELSE 0 END) AS BIGINT)
                     / CAST(count(*) AS DOUBLE), 6) AS accuracy
        FROM tagged t
        LEFT JOIN predicted p USING (prev_type)
        WHERE NOT t.is_train
        GROUP BY 1, 2
        ORDER BY prev_type
    """,
    "event_trigrams": f"""
        WITH tri AS (
            SELECT event_type AS t1,
                   lead(event_type, 1) OVER w AS t2,
                   lead(event_type, 2) OVER w AS t3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            QUALIFY t3 IS NOT NULL)
        SELECT t1, t2, t3, count(*) AS n
        FROM tri
        GROUP BY 1, 2, 3
        ORDER BY n DESC, t1, t2, t3
        LIMIT {TOP_TRIGRAMS}
    """,
}

QUERIES = {
    "event_pagerank": event_pagerank,
    "markov_prediction_audit": markov_prediction_audit,
    "event_trigrams": event_trigrams,
}
