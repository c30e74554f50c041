"""Entity resolution over the part-name vocabulary: blocking +
edit-distance refine + connected-component canonicalization.

The reference dedupes only on exact content hashes (reference
backend/services/vector_service.py:105-116); record linkage — "are these
two differently-spelled rows the same real-world entity?" — is the fuzzy
counterpart every catalog/CRM-scale pipeline needs. The classic scalable
shape (Fellegi-Sunter blocking) is used here:

1. **Resolve over the DISTINCT vocabulary, not raw rows.** Matching runs
   on `groupBy(p_name)` output — duplicates of the same spelling collapse
   before any pairing, so pair volume scales with vocabulary size, not
   table size (at 100 TB the vocabulary is typically 4-6 orders of
   magnitude smaller than the fact table).
2. **Blocking.** Candidate pairs come from an equi-join on a cheap
   blocking key (the head noun of the name); only within-block pairs are
   scored. Blocks are DF-capped (MAX_BLOCK) like every other
   candidate-generation join in this repo — a degenerate key (empty
   string, "unknown") cannot quadratically explode the join.
3. **Refine.** `levenshtein` (JVM builtin, whole-stage codegen) scores
   each candidate; pairs at distance ≤ MAX_LEV are accepted.
4. **Canonicalize.** Connected components over accepted pairs
   (`neardup_cluster.connected_components` — pointer-doubled min-label
   propagation) give each spelling family a canonical id; unmatched
   spellings stay their own singleton cluster.

The DuckDB oracle mirrors all four stages exactly (recursive-CTE closure
for the components), so the whole pipeline is value-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table
from ai_powered_data_pipeline_assistant_spark.operators.neardup_cluster import (
    connected_components,
)

MAX_LEV = 2
MAX_BLOCK = 10_000  # blocking-key DF cap: quadratic-blowup guard


def _name_vocab(parts: DataFrame) -> DataFrame:
    """Distinct name vocabulary: (p_name, entity_id = min part key carrying
    the spelling, n_rows = how many part rows use it)."""
    return parts.groupBy("p_name").agg(
        F.min("p_partkey").alias("entity_id"), F.count("*").alias("n_rows")
    )


def _match_pairs(parts: DataFrame) -> DataFrame:
    vocab = _name_vocab(parts).withColumn(
        "block", F.split_part(F.col("p_name"), F.lit(" "), F.lit(2))
    )
    # DF cap on the blocking key — same single-pass window trick as
    # dedup._pair_jaccard (no extra groupBy+semi-join pass)
    from pyspark.sql import Window

    vocab = (
        vocab.withColumn("_bn", F.count("*").over(Window.partitionBy("block")))
        .filter(F.col("_bn") <= MAX_BLOCK)
        .drop("_bn")
    )
    a = vocab.select(
        F.col("p_name").alias("a_name"),
        F.col("entity_id").alias("a_id"),
        F.col("n_rows").alias("a_rows"),
        "block",
    )
    b = vocab.select(
        F.col("p_name").alias("b_name"),
        F.col("entity_id").alias("b_id"),
        F.col("n_rows").alias("b_rows"),
        "block",
    )
    return (
        a.join(b, "block")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("lev", F.levenshtein("a_name", "b_name"))
        .filter(F.col("lev") <= MAX_LEV)
    )


def entity_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accepted fuzzy-match pairs over the part-name vocabulary."""
    parts = load_table(spark, sf_dir, "part")
    return _match_pairs(parts).select(
        "a_name", "b_name", "a_id", "b_id", "a_rows", "b_rows", "lev"
    ).orderBy("a_id", "b_id")


def entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalized spelling families: every vocabulary entry mapped to
    its cluster id (min entity id reachable through accepted matches) and
    the cluster's canonical spelling; singletons map to themselves."""
    parts = load_table(spark, sf_dir, "part")
    vocab = _name_vocab(parts)
    pairs = _match_pairs(parts).select("a_id", "b_id")
    labels = connected_components(pairs)
    assigned = (
        vocab.join(
            labels.withColumnRenamed("node", "entity_id"), "entity_id", "left"
        )
        .withColumn("cluster_id", F.coalesce("label", "entity_id"))
    )
    canon = vocab.select(
        F.col("entity_id").alias("cluster_id"),
        F.col("p_name").alias("canonical_name"),
    )
    return (
        assigned.join(canon, "cluster_id")
        .select("cluster_id", "canonical_name", "p_name", "entity_id", "n_rows")
        .orderBy("cluster_id", "entity_id")
    )


_VOCAB_CTE = f"""
    vocab AS (
        SELECT p_name, min(p_partkey) AS entity_id, count(*) AS n_rows
        FROM part GROUP BY 1),
    blocked AS (
        SELECT *, split_part(p_name, ' ', 2) AS block
        FROM vocab
        QUALIFY count(*) OVER (PARTITION BY split_part(p_name, ' ', 2))
                 <= {MAX_BLOCK}),
    matched AS (
        SELECT a.p_name AS a_name, b.p_name AS b_name,
               a.entity_id AS a_id, b.entity_id AS b_id,
               a.n_rows AS a_rows, b.n_rows AS b_rows,
               levenshtein(a.p_name, b.p_name) AS lev
        FROM blocked a JOIN blocked b
             ON a.block = b.block AND a.entity_id < b.entity_id
        WHERE levenshtein(a.p_name, b.p_name) <= {MAX_LEV})
"""

ORACLES: dict[str, str] = {
    "entity_match_pairs": f"""
        WITH {_VOCAB_CTE.strip()}
        SELECT a_name, b_name, a_id, b_id, a_rows, b_rows, lev
        FROM matched ORDER BY a_id, b_id
    """,
    "entity_clusters": f"""
        WITH RECURSIVE {_VOCAB_CTE.strip()},
        edges AS (SELECT a_id AS src, b_id AS dst FROM matched
                  UNION ALL
                  SELECT b_id, a_id FROM matched),
        reach(src, dst) AS (
            SELECT src, src FROM (SELECT DISTINCT src FROM edges)
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        comp AS (SELECT src AS entity_id, min(dst) AS cluster_id
                 FROM reach GROUP BY 1),
        assigned AS (
            SELECT v.p_name, v.entity_id, v.n_rows,
                   coalesce(c.cluster_id, v.entity_id) AS cluster_id
            FROM vocab v LEFT JOIN comp c USING (entity_id))
        SELECT a.cluster_id, canon.p_name AS canonical_name,
               a.p_name, a.entity_id, a.n_rows
        FROM assigned a JOIN vocab canon ON canon.entity_id = a.cluster_id
        ORDER BY a.cluster_id, a.entity_id
    """,
}

QUERIES = {
    "entity_match_pairs": entity_match_pairs,
    "entity_clusters": entity_clusters,
}


def entity_canonical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The payoff query of entity resolution: revenue rolled up by
    CANONICAL entity, so spelling variants ("old anvil"/"cold anvil")
    stop fragmenting the analytics. lineitem joins part on the part key,
    part maps to its canonical family through the (broadcast-sized)
    cluster table, and revenue accumulates as integer cents.

    Scale: the only fact-table work is one broadcast join (part dim) and
    one map-side-combined groupBy; the cluster mapping is vocabulary-sized.
    """
    parts = load_table(spark, sf_dir, "part")
    items = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    clusters = entity_clusters(spark, sf_dir).select("p_name", "canonical_name")
    mapping = parts.select("p_partkey", "p_name").join(
        F.broadcast(clusters), "p_name"
    )
    return (
        items.join(
            F.broadcast(
                mapping.select(
                    F.col("p_partkey").alias("l_partkey"), "canonical_name"
                )
            ),
            "l_partkey",
        )
        .groupBy("canonical_name")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.round(F.sum("cents") / 100.0, 2).alias("revenue"),
        )
        .orderBy("canonical_name")
    )


QUERIES["entity_canonical_rollup"] = entity_canonical_rollup

ORACLES["entity_canonical_rollup"] = f"""
    WITH RECURSIVE {_VOCAB_CTE.strip()},
    edges AS (SELECT a_id AS src, b_id AS dst FROM matched
              UNION ALL
              SELECT b_id, a_id FROM matched),
    reach(src, dst) AS (
        SELECT src, src FROM (SELECT DISTINCT src FROM edges)
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
    comp AS (SELECT src AS entity_id, min(dst) AS cluster_id
             FROM reach GROUP BY 1),
    assigned AS (
        SELECT v.p_name, coalesce(c.cluster_id, v.entity_id) AS cluster_id
        FROM vocab v LEFT JOIN comp c USING (entity_id)),
    mapping AS (
        SELECT p.p_partkey, canon.p_name AS canonical_name
        FROM part p
        JOIN assigned a ON a.p_name = p.p_name
        JOIN vocab canon ON canon.entity_id = a.cluster_id)
    SELECT m.canonical_name,
           count(*) AS n_lineitems,
           round(CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                      AS BIGINT) / 100.0, 2) AS revenue
    FROM lineitem l JOIN mapping m ON m.p_partkey = l.l_partkey
    GROUP BY 1
    ORDER BY 1
"""
