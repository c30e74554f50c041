"""The federated search/ingest pipeline and maintenance operators.

Parity targets (SURVEY §3.2, §2.1):
- smart_search pipeline: fan-out → union → dedup-by-url (first wins) →
  limit → content-hash → upsert: reference
  backend/services/search_service.py:118-217
- source result shaping (per-source metadata): reference
  backend/services/search_clients.py:100-312
- expiry sweep (DELETE WHERE expires_at < now): reference
  Supabase/knowledge_base_Maintenance.sql:2-12
- access-counter update: reference Supabase/knowledge_base_Maintenance.sql:15-22

The external HTTP sources are deterministic synthetic frames here (the
reference's docs client is itself a deterministic placeholder,
search_clients.py:276-312): three differently-shaped "sources" are derived
from slices of `documents`, shaped like each client's output, then pushed
through the same union → first-wins dedup → limit → hash pipeline.

Scale notes: unionByName is a zero-shuffle concat; first-wins dedup is one
hash shuffle on the dedup key with an arrival-order row_number (Spark's
dropDuplicates is nondeterministic — this is not); the global limit after an
explicit order is a TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table


def _source_frames(spark: SparkSession, sf_dir: str) -> list[DataFrame]:
    """Three synthetic per-source result frames (stackoverflow/github/docs),
    each shaped like its reference client's Document output."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.withColumn("shard", F.col("doc_id") % 3)
    so = base.filter(F.col("shard") == 0).select(
        F.concat(F.lit("StackOverflow question: "), F.col("text")).alias("content"),
        F.concat(F.lit("SO-"), F.col("doc_id").cast("string")).alias("title"),
        F.lit("stackoverflow").alias("source_type"),
        # url collides across sources for doc_id % 5 == 0 → exercises dedup
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("https://shared/"), (F.col("doc_id") / 15).cast("long").cast("string")),
        )
        .otherwise(F.concat(F.lit("https://stackoverflow.test/q/"), F.col("doc_id").cast("string")))
        .alias("source_url"),
        F.col("doc_id").alias("arrival_rank"),
    )
    gh = base.filter(F.col("shard") == 1).select(
        F.concat(F.lit("GitHub result: "), F.col("text")).alias("content"),
        F.concat(F.lit("GH-"), F.col("doc_id").cast("string")).alias("title"),
        F.lit("github").alias("source_type"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("https://shared/"), (F.col("doc_id") / 15).cast("long").cast("string")),
        )
        .otherwise(F.concat(F.lit("https://github.test/"), F.col("doc_id").cast("string")))
        .alias("source_url"),
        F.col("doc_id").alias("arrival_rank"),
    )
    dc = base.filter(F.col("shard") == 2).select(
        F.concat(F.lit("Documentation: "), F.col("text")).alias("content"),
        F.concat(F.lit("DOC-"), F.col("doc_id").cast("string")).alias("title"),
        F.lit("official_doc").alias("source_type"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("https://shared/"), (F.col("doc_id") / 15).cast("long").cast("string")),
        )
        .otherwise(F.concat(F.lit("https://docs.test/"), F.col("doc_id").cast("string")))
        .alias("source_url"),
        F.col("doc_id").alias("arrival_rank"),
    )
    return [so, gh, dc]


def search_pipeline(spark: SparkSession, sf_dir: str, max_results: int = 100) -> DataFrame:
    """The full smart_search batch pipeline: union → first-wins URL dedup →
    deterministic limit → snippet + content hash."""
    frames = _source_frames(spark, sf_dir)
    unioned = frames[0]
    for f in frames[1:]:
        unioned = unioned.unionByName(f)
    w = Window.partitionBy("source_url").orderBy("arrival_rank", "source_type")
    deduped = (
        unioned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    limited = deduped.orderBy("arrival_rank", "source_type").limit(max_results)
    return limited.select(
        "title",
        "source_type",
        "source_url",
        F.when(
            F.length("content") > 500,
            F.concat(F.substring("content", 1, 500), F.lit("...")),
        )
        .otherwise(F.col("content"))
        .alias("snippet"),
        F.sha2("content", 256).alias("content_hash"),
    )


def github_union(spark: SparkSession, sf_dir: str, max_results: int = 60) -> DataFrame:
    """S7: the GitHub client's three sub-searches (code / repositories /
    issues), each with a different result shape, merged with
    unionByName(allowMissingColumns=True) and globally limited — the
    heterogeneous-schema union the reference builds by hand."""
    docs = load_table(spark, sf_dir, "documents")
    code = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("result_id"),
        F.lit("code").alias("result_type"),
        F.concat(F.lit("repo-"), (F.col("doc_id") % 20).cast("string")).alias("repo"),
        F.concat(F.lit("src/file_"), F.col("doc_id").cast("string"), F.lit(".py")).alias("path"),
    )
    repos = docs.filter(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").alias("result_id"),
        F.lit("repository").alias("result_type"),
        F.concat(F.lit("repo-"), (F.col("doc_id") % 20).cast("string")).alias("repo"),
        (F.col("doc_id") % 5000).alias("stars"),
    )
    issues = docs.filter(F.col("doc_id") % 3 == 2).select(
        F.col("doc_id").alias("result_id"),
        F.lit("issue").alias("result_type"),
        F.when(F.col("doc_id") % 2 == 0, "open").otherwise("closed").alias("state"),
    )
    merged = code.unionByName(repos, allowMissingColumns=True).unionByName(
        issues, allowMissingColumns=True
    )
    return merged.orderBy("result_id").limit(max_results)


def expiry_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S13/T6: TTL expiry — rows surviving `ts >= cutoff`, counted per type.

    (Batch form of DELETE WHERE expires_at < NOW(); the survivors frame is
    what a Delta `DELETE WHERE` would retain.)"""
    events = load_table(spark, sf_dir, "events")
    cutoff = "2024-01-15 00:00:00"
    return (
        events.filter(F.col("ts") >= F.lit(cutoff))
        .groupBy("event_type")
        .agg(F.count("*").alias("surviving_cnt"))
    )


def access_counter_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S14: access_count increment — docs joined to an access-event stream
    (events routed to docs by event_id % |docs|), new count = hits."""
    docs = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events")
    n_docs = docs.count()  # tiny dim; at scale this is a known catalog size
    hits = (
        events.filter(F.col("event_type") == "view")
        .groupBy((F.col("event_id") % n_docs).alias("doc_id"))
        .agg(F.count("*").alias("hits"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select("doc_id", F.coalesce("hits", F.lit(0)).alias("access_count"))
    )


ORACLES: dict[str, str] = {
    "search_pipeline": """
        WITH unioned AS (
            SELECT 'StackOverflow question: ' || text AS content,
                   'SO-' || CAST(doc_id AS VARCHAR) AS title,
                   'stackoverflow' AS source_type,
                   CASE WHEN doc_id % 5 = 0
                        THEN 'https://shared/' || CAST(doc_id // 15 AS VARCHAR)
                        ELSE 'https://stackoverflow.test/q/' || CAST(doc_id AS VARCHAR) END AS source_url,
                   doc_id AS arrival_rank
            FROM documents WHERE doc_id % 3 = 0
            UNION ALL
            SELECT 'GitHub result: ' || text,
                   'GH-' || CAST(doc_id AS VARCHAR),
                   'github',
                   CASE WHEN doc_id % 5 = 0
                        THEN 'https://shared/' || CAST(doc_id // 15 AS VARCHAR)
                        ELSE 'https://github.test/' || CAST(doc_id AS VARCHAR) END,
                   doc_id
            FROM documents WHERE doc_id % 3 = 1
            UNION ALL
            SELECT 'Documentation: ' || text,
                   'DOC-' || CAST(doc_id AS VARCHAR),
                   'official_doc',
                   CASE WHEN doc_id % 5 = 0
                        THEN 'https://shared/' || CAST(doc_id // 15 AS VARCHAR)
                        ELSE 'https://docs.test/' || CAST(doc_id AS VARCHAR) END,
                   doc_id
            FROM documents WHERE doc_id % 3 = 2),
        deduped AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY source_url
                                             ORDER BY arrival_rank, source_type) AS rn
                FROM unioned) WHERE rn = 1),
        limited AS (
            SELECT * FROM deduped ORDER BY arrival_rank, source_type LIMIT 100)
        SELECT title, source_type, source_url,
               CASE WHEN length(content) > 500 THEN substr(content, 1, 500) || '...'
                    ELSE content END AS snippet,
               sha256(content) AS content_hash
        FROM limited
    """,
    "github_union": """
        WITH merged AS (
            SELECT doc_id AS result_id, 'code' AS result_type,
                   'repo-' || CAST(doc_id % 20 AS VARCHAR) AS repo,
                   'src/file_' || CAST(doc_id AS VARCHAR) || '.py' AS path,
                   CAST(NULL AS BIGINT) AS stars,
                   CAST(NULL AS VARCHAR) AS state
            FROM documents WHERE doc_id % 3 = 0
            UNION ALL
            SELECT doc_id, 'repository',
                   'repo-' || CAST(doc_id % 20 AS VARCHAR),
                   NULL, doc_id % 5000, NULL
            FROM documents WHERE doc_id % 3 = 1
            UNION ALL
            SELECT doc_id, 'issue', NULL, NULL, NULL,
                   CASE WHEN doc_id % 2 = 0 THEN 'open' ELSE 'closed' END
            FROM documents WHERE doc_id % 3 = 2)
        SELECT * FROM merged ORDER BY result_id LIMIT 60
    """,
    "expiry_sweep": """
        SELECT event_type, count(*) AS surviving_cnt
        FROM events
        WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
        GROUP BY 1
    """,
    "access_counter_update": """
        WITH hits AS (
            SELECT event_id % (SELECT count(*) FROM documents) AS doc_id,
                   count(*) AS hits
            FROM events WHERE event_type = 'view' GROUP BY 1)
        SELECT d.doc_id, coalesce(h.hits, 0) AS access_count
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
}

QUERIES = {
    "search_pipeline": search_pipeline,
    "github_union": github_union,
    "expiry_sweep": expiry_sweep,
    "access_counter_update": access_counter_update,
}
