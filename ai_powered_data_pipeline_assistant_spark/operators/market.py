"""Market-basket affinity mining over the order/lineitem star: frequent
co-purchased part pairs with support and lift.

The association-rule layer (Apriori's first level) on top of the fact
table — the relational sibling of `webcorpus.collocation_pmi` (word pairs)
and a standard recommendation/bundling signal. The reference has no
basket analytics at all; this is part of the analytics surface a user of
a 100 TB retail fact table expects.

Scale design:
- ONE hash shuffle builds per-basket part sets (collect_set groupBy);
  pair generation is an IN-ROW k² explode over each set — no basket-key
  self-join, no second shuffle of the facts. Per-basket work is k², which
  real order data bounds at tens; the MAX_BASKET size filter guards the
  degenerate basket — the same quadratic-blowup guard as every
  candidate-generation step in this repo (dedup.MAX_SHINGLE_DF,
  entity.MAX_BLOCK).
- Item supports and the basket count are map-side-combined aggregates.
  The 1-row basket count broadcasts; the item-support frame is
  catalog-sized (distinct items — 10^8+ in a real catalog) so it carries
  NO broadcast hint: AQE broadcasts it when the measured size allows and
  shuffle-joins it against the (post-aggregate, support-floored, tiny)
  pair frame otherwise.
- The support filter runs on the pair AGGREGATE (post-shuffle, tiny), and
  lift arithmetic is pure projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table
from ai_powered_data_pipeline_assistant_spark.execution import materialize

MIN_SUPPORT = 3  # pair must appear in ≥ this many baskets
MAX_BASKET = 1_000  # degenerate-basket guard


def basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchased part pairs with basket support and lift
    (lift = P(a,b) / (P(a)·P(b)), > 1 ⇒ bought together more than chance).
    """
    # ONE shuffle builds the basket sets (collect_set dedups a repeated
    # part in-row); pair generation is then an IN-ROW k² explode — no
    # basket-key self-join, no window pass. The higher-order filter emits
    # each unordered pair once (b > a), halving the exploded volume.
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
        .filter(F.size("parts") <= MAX_BASKET)
        .transform(materialize)
    )
    n_baskets = baskets.agg(F.count("*").alias("n_baskets"))
    item_support = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").alias("s"))
    )
    pair_support = (
        baskets.select(F.explode("parts").alias("a_part"), "parts")
        .select(
            "a_part",
            F.explode(
                F.filter("parts", lambda p: p > F.col("a_part"))
            ).alias("b_part"),
        )
        .groupBy("a_part", "b_part")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= MIN_SUPPORT)
    )
    # No broadcast hint on item_support: it is catalog-sized (distinct
    # items), which a real deployment can grow past driver memory (10^8+
    # items). pair_support is the small side here (post-aggregate, bounded
    # by MIN_SUPPORT), so AQE picks the right strategy — broadcast when the
    # measured size allows, shuffle join otherwise.
    return (
        pair_support.join(
            item_support.withColumnRenamed("l_partkey", "a_part")
                        .withColumnRenamed("s", "s_a"),
            "a_part",
        )
        .join(
            item_support.withColumnRenamed("l_partkey", "b_part")
                        .withColumnRenamed("s", "s_b"),
            "b_part",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "a_part",
            "b_part",
            "support",
            "s_a",
            "s_b",
            F.round(
                F.col("support") * F.col("n_baskets")
                / (F.col("s_a") * F.col("s_b")).cast("double"),
                6,
            ).alias("lift"),
        )
        .orderBy("a_part", "b_part")
    )


ORACLES: dict[str, str] = {
    "basket_pairs": f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        capped AS (
            SELECT * FROM items
            QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= {MAX_BASKET}),
        nb AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM capped),
        sup AS (SELECT l_partkey, count(*) AS s FROM capped GROUP BY 1),
        pairs AS (
            SELECT a.l_partkey AS a_part, b.l_partkey AS b_part,
                   count(*) AS support
            FROM capped a JOIN capped b
                 ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING count(*) >= {MIN_SUPPORT})
        SELECT a_part, b_part, support, sa.s AS s_a, sb.s AS s_b,
               round(support * n_baskets / CAST(sa.s * sb.s AS DOUBLE), 6)
                   AS lift
        FROM pairs
        JOIN sup sa ON sa.l_partkey = a_part
        JOIN sup sb ON sb.l_partkey = b_part
        CROSS JOIN nb
        ORDER BY a_part, b_part
    """,
}

QUERIES = {
    "basket_pairs": basket_pairs,
}


REC_TOP_K = 3
REC_SALTS = 8


def item_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering head: for every part, the top-K
    co-purchased parts ranked by lift (ties → higher support, lower id) —
    the "customers also bought" table, derived entirely from
    `basket_pairs`'s support/lift frame.

    Scale: the pair frame is already the post-aggregate (bounded by the
    support floor); both orientations of each pair are derived in-row by a
    union, and the per-item top-K uses the same salted two-phase pattern
    as `vector.knn_join` so no single reducer sees a hub item's full
    candidate list.
    """
    pairs = basket_pairs(spark, sf_dir)
    # both orientations via ONE in-row explode — a union of two selects
    # would evaluate the whole basket pipeline twice
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("a_part").alias("item"), F.col("b_part").alias("rec")
                ),
                F.struct(
                    F.col("b_part").alias("item"), F.col("a_part").alias("rec")
                ),
            )
        ).alias("p"),
        "support",
        "lift",
    ).select("p.item", "p.rec", "support", "lift")
    from pyspark.sql import Window

    salted = directed.withColumn("salt", F.col("rec") % REC_SALTS)
    w1 = Window.partitionBy("item", "salt").orderBy(
        F.desc("lift"), F.desc("support"), F.asc("rec")
    )
    survivors = (
        salted.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= REC_TOP_K)
        .drop("rn", "salt")
    )
    w2 = Window.partitionBy("item").orderBy(
        F.desc("lift"), F.desc("support"), F.asc("rec")
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= REC_TOP_K)
        .select("item", F.col("rank").cast("long").alias("rank"), "rec",
                "support", "lift")
        .orderBy("item", "rank")
    )


QUERIES["item_recommendations"] = item_recommendations

ORACLES["item_recommendations"] = f"""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    capped AS (
        SELECT * FROM items
        QUALIFY count(*) OVER (PARTITION BY l_orderkey) <= {MAX_BASKET}),
    nb AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM capped),
    sup AS (SELECT l_partkey, count(*) AS s FROM capped GROUP BY 1),
    pairs AS (
        SELECT a.l_partkey AS a_part, b.l_partkey AS b_part,
               count(*) AS support
        FROM capped a JOIN capped b
             ON a.l_orderkey = b.l_orderkey
            AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= {MIN_SUPPORT}),
    scored AS (
        SELECT a_part, b_part, support,
               round(support * n_baskets / CAST(sa.s * sb.s AS DOUBLE), 6)
                   AS lift
        FROM pairs
        JOIN sup sa ON sa.l_partkey = a_part
        JOIN sup sb ON sb.l_partkey = b_part
        CROSS JOIN nb),
    directed AS (
        SELECT a_part AS item, b_part AS rec, support, lift FROM scored
        UNION ALL
        SELECT b_part, a_part, support, lift FROM scored)
    SELECT item,
           CAST(row_number() OVER (PARTITION BY item
                                   ORDER BY lift DESC, support DESC, rec ASC)
                AS BIGINT) AS rank,
           rec, support, lift
    FROM directed
    QUALIFY rank <= {REC_TOP_K}
    ORDER BY item, rank
"""
