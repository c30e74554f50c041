"""TPC-H-shaped relational pipelines beyond q1/q3: multi-join star query
(q5), selective scan-agg (q6), and group-having-join top-k (q18).

These exercise the relational surface the reference exposes through its
guarded ad-hoc SELECT executor (J5, reference backend/utils/sql_safety.py:
184-231 — arbitrary validated SELECTs incl. joins run through SQLAlchemy):
a user of the reference can run exactly these shapes, so the engine must
plan them well.

All money math is fixed-point int64 (cents × percent-cents) so results
hash-match the DuckDB oracle bit-for-bit; see operators/aggregates.py.

Scale notes:
- q5: dimension chain (region→nation) broadcasts; the two fact joins
  (orders⋈customer on custkey+nationkey, lineitem⋈supplier) shuffle on
  their keys; AQE picks the final strategy at runtime.
- q6: single scan, every predicate pushed to parquet (row-group pruning on
  shipdate/discount/quantity min-max stats), one partial+final agg — the
  cheapest possible plan at any scale.
- q18: the HAVING subquery is a self-aggregation of lineitem reused via a
  semi-join on orderkey — no correlated subquery, no second scan of the
  big side after the aggregate's shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ai_powered_data_pipeline_assistant_spark.catalog import load_table

_Q18_QTY_THRESHOLD = 150


def tpch_q5(spark: SparkSession, sf_dir: str, region: str = "ASIA") -> DataFrame:
    """Q5 local-supplier revenue: 6-table star join, grouped by nation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1994-01-01") & (F.col("o_orderdate") < "1995-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)

    price = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    revenue_units = price * (F.lit(100) - disc)

    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(broadcast(reg), nation.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(revenue_units) / 1e6, 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "nation")
    )


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecasting revenue change: pure scan-filter-agg, all predicates
    pushed to the parquet reader."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_shipdate") < "1995-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(price * disc) / 1e4, 4).alias("revenue"))
    )


def tpch_q18(spark: SparkSession, sf_dir: str, top_n: int = 100) -> DataFrame:
    """Q18 large-volume customers: HAVING-filtered aggregate semi-joined
    back to orders⋈customer, top-N by totalprice."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qty_units = F.round(F.col("l_quantity") * 100).cast("long")

    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty_units).alias("qty_units"))
        .filter(F.col("qty_units") > _Q18_QTY_THRESHOLD * 100)
    )
    return (
        orders.join(big_orders, orders.o_orderkey == big_orders.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round(F.col("qty_units") / 100.0, 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(top_n)
    )


def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect: lineitem ⋈ part (broadcast dim) with a
    conditional aggregate — promo revenue share for one ship month."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    part = load_table(spark, sf_dir, "part")
    price = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    rev = price * (F.lit(100) - disc)
    return (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0))
                * 100.0
                / F.sum(rev),
                6,
            ).alias("promo_revenue_pct")
        )
    )


def supplier_balance_rank(spark: SparkSession, sf_dir: str, top_n: int = 20) -> DataFrame:
    """Supplier account-balance leaderboard per nation (dense_rank window) —
    uses the supplier dim end-to-end with a broadcast nation join."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    from pyspark.sql import Window

    cents = F.round(F.col("s_acctbal") * 100).cast("long")
    w = Window.partitionBy("nation").orderBy(F.desc("bal_cents"), "s_suppkey")
    return (
        supp.join(broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation"),
            cents.alias("bal_cents"),
        )
        .withColumn("rk", F.dense_rank().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "nation",
            "rk",
            "s_suppkey",
            "s_name",
            F.round(F.col("bal_cents") / 100.0, 2).alias("acctbal"),
        )
    )


def below_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape (TPC-H q2/q17 family): suppliers whose
    balance is below their nation's average. Spark decorrelates this to a
    window (avg over nation partition) — one shuffle, no re-scan, versus
    the naive per-row subquery."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    from pyspark.sql import Window

    cents = F.round(F.col("s_acctbal") * 100).cast("long")
    w = Window.partitionBy("nation")
    return (
        supp.join(broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"), cents.alias("bal"))
        .withColumn("nation_avg", F.avg("bal").over(w))
        .filter(F.col("bal") < F.col("nation_avg"))
        .select(
            "s_suppkey",
            "s_name",
            "nation",
            F.round(F.col("bal") / 100.0, 2).alias("acctbal"),
            F.round(F.col("nation_avg") / 100.0, 4).alias("nation_avg_bal"),
        )
    )


def urgent_no_fail_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21-family combined existential shape: customers with ≥1 urgent open
    order (semi-join) AND no failed order (anti-join) — both joins ship only
    the key column and compose without row duplication."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "O")
    ).select("o_custkey")
    failed = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .join(failed, cust.c_custkey == failed.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-shaped EXISTS with date arithmetic: orders from 1995H1 having at
    least one line shipped > 60 days after the order date, counted per
    priority. The EXISTS compiles to a left-semi join whose condition mixes
    the key equality with the date comparison — only the key and two dates
    shuffle."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1995-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    # interval add, not date_add: date_add would truncate the timestamp to a
    # date, silently changing semantics for any non-midnight order time
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("order_cnt"))
    )


def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shaped supplier-variety count: distinct suppliers per
    (brand, type, size) — grouped COUNT(DISTINCT) over a fact⋈dim join
    (part broadcast; the distinct expands to a two-phase agg on the
    grouping keys + suppkey)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size").isin(1, 5, 9, 13))
    return (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def tpch_q10(spark: SparkSession, sf_dir: str, top_n: int = 20) -> DataFrame:
    """Q10 returned-item revenue: customer ⋈ orders ⋈ lineitem(R) ⋈ nation,
    revenue per customer, top-20 — the classic 4-table agg + TakeOrdered."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-10-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    price = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    rev = price * (F.lit(100) - disc)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "c_custkey", "c_name",
            F.col("n_name").alias("nation"),
            F.col("c_acctbal"),
        )
        .agg(F.round(F.sum(rev) / 1e6, 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(top_n)
    )


def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-shaped conditional bucket agg: per return flag, how many
    late-shipped lines belong to high- vs low-priority orders — the
    CASE-inside-SUM over a fact join."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= "1996-01-01"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_cnt"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_priority_cnt"),
        )
    )


def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-shaped disjunctive predicate join: revenue over an OR-of-ANDs
    condition mixing both sides (brand × size-range × quantity-range).
    Catalyst extracts the common `l_partkey = p_partkey` conjunct as the
    join key and leaves the disjunction as a post-join filter — the part
    side still broadcasts and per-side conjuncts still push to the scans."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    price = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    joined = li.join(broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#13") & (F.col("p_size").between(1, 10))
         & (F.col("l_quantity").between(1, 20)))
        | ((F.col("p_brand") == "Brand#20") & (F.col("p_size").between(5, 25))
           & (F.col("l_quantity").between(10, 35)))
    )
    return joined.filter(cond).agg(
        F.count("*").alias("line_cnt"),
        F.round(F.sum(price * (F.lit(100) - disc)) / 1e6, 4).alias("revenue"),
    )


def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shaped min-cost supplier: for each selected part, the supplier(s)
    offering it at the minimum observed price (lineitem stands in for
    partsupp — the testdata has no partsupp table; min sale price per
    (part, supplier) is the supply-cost analog).

    Q2's correlated scalar subquery (`ps_supplycost = (SELECT min(...)
    WHERE ps_partkey = p_partkey)`, reference shape J5 via the guarded SQL
    executor, backend/utils/sql_safety.py:184-231) decorrelates to a
    window min over the part partition: one shuffle on the pre-aggregated
    (part, supplier) offers instead of a per-row re-scan. The offers agg
    itself shuffles on (partkey, suppkey) — far smaller than lineitem —
    and part/nation broadcast."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size").isin(5, 15, 25))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    price = F.round(F.col("l_extendedprice") * 100).cast("long")

    offers = li.groupBy("l_partkey", "l_suppkey").agg(F.min(price).alias("cost_cents"))
    w = Window.partitionBy("l_partkey")
    best = offers.withColumn("min_cost", F.min("cost_cents").over(w)).filter(
        F.col("cost_cents") == F.col("min_cost")
    )
    return (
        best.join(broadcast(part), best.l_partkey == part.p_partkey)
        .join(supp, best.l_suppkey == supp.s_suppkey)
        .join(broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_brand",
            F.round(F.col("cost_cents") / 100.0, 2).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "nation", "s_name", "p_partkey")
        .limit(100)
    )


def tpch_q21(spark: SparkSession, sf_dir: str, top_n: int = 100) -> DataFrame:
    """Q21-shaped waiting-orders count: suppliers who were the SOLE late
    shipper in a multi-supplier failed order ("late" = shipped > 60 days
    after order date; the testdata lineitem has no commit/receipt dates).

    The textbook q21 is a triple self-join of lineitem (base + EXISTS +
    NOT EXISTS). This plan replaces it with ONE scan: per-(order, supplier)
    late flags (shuffle 1, map-side combined), then order-level supplier /
    late-supplier counts as window sums over the much smaller aggregate,
    then the existential conditions become plain filters — `nsupp > 1`
    ≙ EXISTS other supplier, `nlate = 1` ≙ NOT EXISTS other late one."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    late = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    ).cast("int")

    per_sup = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("late"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = (
        per_sup.withColumn("nsupp", F.count("*").over(w))
        .withColumn("nlate", F.sum("late").over(w))
        .filter((F.col("late") == 1) & (F.col("nsupp") > 1) & (F.col("nlate") == 1))
    )
    return (
        flagged.join(supp, flagged.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(top_n)
    )


def tpch_q7(spark: SparkSession, sf_dir: str,
            nation_a: str = "NATION_1", nation_b: str = "NATION_2") -> DataFrame:
    """Q7 volume shipping: revenue between two nations by ship year.

    Both nation dims are filtered to the two names BEFORE their joins, so
    the 2-row broadcasts drop ~92% of joined rows at the hash probe instead
    of in a post-join filter; only the cross-pair condition (supplier nation
    ≠ customer nation) remains afterwards."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(nation_a, nation_b)
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    price = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    rev = price * (F.lit(100) - disc)
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(broadcast(n1), supp.s_nationkey == F.col("s_nkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum(rev) / 1e6, 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def tpch_q8(spark: SparkSession, sf_dir: str, nation: str = "NATION_7",
            region: str = "ASIA", ptype: str = "PROMO") -> DataFrame:
    """Q8 national market share: one nation's slice of a region's revenue
    for one part type, by order year. The share is a conditional-sum ratio
    of the same integer revenue units, so the division is the only float op
    and both engines divide identical integers — bit-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == ptype)
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    n_cust = nat.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n_supp = nat.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    price = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    rev = price * (F.lit(100) - disc)
    return (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(broadcast(n_cust), cust.c_nationkey == F.col("c_nkey"))
        .join(broadcast(reg), F.col("c_rkey") == reg.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(broadcast(n_supp), supp.s_nationkey == F.col("s_nkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == nation, rev).otherwise(0))
                * 100.0
                / F.sum(rev),
                6,
            ).alias("mkt_share_pct")
        )
        .orderBy("o_year")
    )


def tpch_q9(spark: SparkSession, sf_dir: str, name_pat: str = "widget") -> DataFrame:
    """Q9 product-type profit: per supplier nation per order year. The
    testdata has no partsupp, so supply cost is `p_retailprice × quantity`
    (both fixed-point int64: cents × quantity-hundredths lands on the same
    1e-4-dollar scale as cents × discount-percent)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(name_pat)
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    price = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    qty = F.round(F.col("l_quantity") * 100).cast("long")
    retail = F.round(F.col("p_retailprice") * 100).cast("long")
    amount = price * (F.lit(100) - disc) - retail * qty
    return (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(F.round(F.sum(amount) / 1e6, 4).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def tpch_q11(spark: SparkSession, sf_dir: str, nation: str = "NATION_5") -> DataFrame:
    """Q11 important stock: parts whose traded value from one nation's
    suppliers exceeds 0.1% of that nation's total. The global total is a
    1-row aggregate broadcast back over the grouped values (Q11's scalar
    subquery), and the fraction test cross-multiplies in int64 — no float.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == nation)
    price = F.round(F.col("l_extendedprice") * 100).cast("long")
    qty = F.round(F.col("l_quantity") * 100).cast("long")
    grouped = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(price * qty).alias("value_units"))
    )
    total = grouped.agg(F.sum("value_units").alias("total_units"))
    return (
        grouped.crossJoin(broadcast(total))
        .filter(F.col("value_units") * 1000 > F.col("total_units"))
        .select(
            "l_partkey",
            F.round(F.col("value_units") / 1e8, 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution: left join so zero-order
    customers survive, count per customer, then histogram the counts.
    Two shuffles (custkey, then count value) — the second input is tiny."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier(s) by quarterly revenue. The max is a 1-row
    aggregate broadcast-cross-joined back (not an unpartitioned window,
    which would serialize on one task at scale); integer revenue units make
    the equality exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier")
    price = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(price * (F.lit(100) - disc)).alias("rev_units")
    )
    top = rev.agg(F.max("rev_units").alias("max_units"))
    return (
        rev.crossJoin(broadcast(top))
        .filter(F.col("rev_units") == F.col("max_units"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_units") / 1e6, 4).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def tpch_q17(spark: SparkSession, sf_dir: str, brand: str = "Brand#13") -> DataFrame:
    """Q17 small-quantity-order revenue: lines under 20% of their part's
    average quantity. The correlated AVG decorrelates to window sums over
    the part partition, and `qty < 0.2·avg` cross-multiplies to
    `5·qty·cnt < sum` — all int64, no float threshold."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == brand)
    qty = F.round(F.col("l_quantity") * 100).cast("long")
    price = F.round(F.col("l_extendedprice") * 100).cast("long")
    w = Window.partitionBy("l_partkey")
    return (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .withColumn("qty_units", qty)
        .withColumn("price_cents", price)
        .withColumn("sum_units", F.sum("qty_units").over(w))
        .withColumn("cnt", F.count("*").over(w))
        .filter(F.col("qty_units") * 5 * F.col("cnt") < F.col("sum_units"))
        .agg(F.round(F.sum("price_cents") / 700.0, 4).alias("avg_yearly"))
    )


def tpch_q20(spark: SparkSession, sf_dir: str, name_prefix: str = "large",
             nation: str = "NATION_7") -> DataFrame:
    """Q20 dominant-supplier shape: suppliers from one nation who shipped
    more than half of some part's 1996 volume (availqty analog — the
    testdata has no partsupp). Nested agg → window share test → distinct
    semi-join back to the supplier dim."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith(name_prefix)
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == nation)
    qty = F.round(F.col("l_quantity") * 100).cast("long")
    per = (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(qty).alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        per.withColumn("part_qty", F.sum("supp_qty").over(w))
        .filter(F.col("supp_qty") * 2 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity: rich-but-inactive accounts per
    "country code" (custkey mod 7 — the testdata has no phone column).
    Every customer here has orders, so "inactive" = no URGENT order (the
    anti-join keeps Q22's NOT EXISTS shape non-vacuous). The positive-
    balance average is a 1-row broadcast and the comparison
    cross-multiplies to int64."""
    cust = load_table(spark, sf_dir, "customer")
    bal = F.round(F.col("c_acctbal") * 100).cast("long")
    base = cust.filter((F.col("c_custkey") % 7).isin(1, 3, 5)).select(
        (F.col("c_custkey") % 7).alias("code"),
        "c_custkey",
        bal.alias("bal_cents"),
    )
    stats = base.filter(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("sum_bal"), F.count("*").alias("cnt_bal")
    )
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    return (
        base.crossJoin(broadcast(stats))
        .filter(F.col("bal_cents") * F.col("cnt_bal") > F.col("sum_bal"))
        .join(urgent, base.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("code")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("bal_cents") / 100.0, 2).alias("totacctbal"),
        )
        .orderBy("code")
    )


def discount_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing view: per discount band (integer cents of discount rate),
    line count, average quantity, and revenue — the table a pricing team
    reads to see whether deeper discounts actually move volume. One
    map-side-combined groupBy on the ≤11-value discount key; all sums are
    int64 fixed-point."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_band = F.round(F.col("l_discount") * 100).cast("long")
    qty_cents = F.round(F.col("l_quantity") * 100).cast("long")
    rev_units = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - disc_band)
    )
    return (
        li.select(
            disc_band.alias("discount_pct"),
            qty_cents.alias("qty_cents"),
            rev_units.alias("rev"),
        )
        .groupBy("discount_pct")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("qty_cents") / (F.count("*") * 100.0), 4).alias(
                "avg_qty"
            ),
            F.round(F.sum("rev") / 1e6, 2).alias("revenue"),
        )
        .orderBy("discount_pct")
    )


def monthly_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order revenue with the year-over-year ratio — the finance
    seasonality view (is December's spike growth or just December?).
    Revenue sums int64 cents per (year, month); the YoY ratio is a
    lag-12-months self-lookup done as a window over the ≤ |months|-row
    aggregate (integer month index = year*12+month, so a missing prior
    month yields NULL rather than a wrong neighbor)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    monthly = (
        orders.select(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            cents.alias("cents"),
        )
        .groupBy("y", "m")
        .agg(F.sum("cents").alias("rev_cents"))
        .withColumn("midx", F.col("y") * 12 + F.col("m"))
    )
    w = Window.orderBy("midx")
    prior = F.when(
        F.lag("midx", 12).over(w) == F.col("midx") - 12,
        F.lag("rev_cents", 12).over(w),
    )
    return monthly.select(
        "y",
        "m",
        F.round(F.col("rev_cents") / 100.0, 2).alias("revenue"),
        F.round(F.col("rev_cents") / prior.cast("double"), 6).alias("yoy_ratio"),
    ).orderBy("y", "m")


def brand_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand P&L view: discounted revenue per part brand and its share of
    total revenue. Revenue accumulates as int64 fixed-point units
    (cents × discount-complement, the Q1 discipline) so the rollup is
    order-free; the share rides a window over the ~|brands|-row aggregate.
    The part dimension joins on partkey — broadcast while it fits, AQE
    picks the shuffle join beyond that."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev_units = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
    )
    per_brand = (
        li.select("l_partkey", rev_units.alias("rev"))
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum("rev").alias("rev_units"))
    )
    whole = Window.partitionBy()
    return per_brand.select(
        "p_brand",
        F.round(F.col("rev_units") / 1e6, 2).alias("revenue"),
        F.round(
            F.col("rev_units") / F.sum("rev_units").over(whole).cast("double"), 6
        ).alias("revenue_share"),
    ).orderBy("p_brand")


def order_to_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment-latency profile: per order priority, integer-day stats of
    (first line-item ship date − order date) — the ops dashboard that shows
    whether URGENT orders actually ship faster. First-ship is one
    conditional-min groupBy(orderkey) over lineitem; the per-order day
    deltas are exact epoch-second integer arithmetic (floored to days), so
    every aggregate is order-free int64. Orders⋈first-ship joins on the
    already-grouped orderkey — the only shuffles are the two key hashes."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.unix_timestamp("o_orderdate").alias("od")
    )
    first_ship = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.min(F.unix_timestamp("l_shipdate")).alias("sd"))
    )
    days = F.expr("(sd - od) DIV 86400")
    joined = orders.join(
        first_ship, orders.o_orderkey == first_ship.l_orderkey
    ).select("o_orderpriority", days.alias("days"))
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("days").alias("min_days"),
            F.max("days").alias("max_days"),
            F.round(F.sum("days") / F.count("*").cast("double"), 4).alias(
                "avg_days"
            ),
        )
        .orderBy("o_orderpriority")
    )


ORACLES: dict[str, str] = {
    "discount_effectiveness": """
        WITH b AS (
            SELECT CAST(round(l_discount * 100) AS BIGINT) AS discount_pct,
                   CAST(round(l_quantity * 100) AS BIGINT) AS qty_cents,
                   CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev
            FROM lineitem)
        SELECT discount_pct, count(*) AS n_lines,
               round(CAST(sum(qty_cents) AS BIGINT)
                     / (count(*) * 100.0), 4) AS avg_qty,
               round(CAST(sum(rev) AS BIGINT) / 1e6, 2) AS revenue
        FROM b GROUP BY 1 ORDER BY 1
    """,
    "monthly_revenue_yoy": """
        WITH monthly AS (
            SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS rev_cents,
                   year(o_orderdate) * 12 + month(o_orderdate) AS midx
            FROM orders GROUP BY 1, 2)
        SELECT y, m,
               round(rev_cents / 100.0, 2) AS revenue,
               round(rev_cents / CAST(CASE WHEN lag(midx, 12) OVER w = midx - 12
                                           THEN lag(rev_cents, 12) OVER w
                                      END AS DOUBLE), 6) AS yoy_ratio
        FROM monthly
        WINDOW w AS (ORDER BY midx)
        ORDER BY y, m
    """,
    "brand_revenue_share": """
        WITH per AS (
            SELECT p.p_brand,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                        AS BIGINT) AS rev_units
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1)
        SELECT p_brand,
               round(rev_units / 1e6, 2) AS revenue,
               round(rev_units / CAST(CAST(sum(rev_units) OVER () AS BIGINT)
                                      AS DOUBLE), 6) AS revenue_share
        FROM per ORDER BY p_brand
    """,
    "order_to_ship_latency": """
        WITH fs AS (
            SELECT l_orderkey,
                   min(CAST(floor(epoch(l_shipdate)) AS BIGINT)) AS sd
            FROM lineitem GROUP BY 1),
        j AS (
            SELECT o.o_orderpriority,
                   (fs.sd - CAST(floor(epoch(o.o_orderdate)) AS BIGINT))
                       // 86400 AS days
            FROM orders o JOIN fs ON o.o_orderkey = fs.l_orderkey)
        SELECT o_orderpriority, count(*) AS n_orders,
               min(days) AS min_days, max(days) AS max_days,
               round(CAST(sum(days) AS BIGINT) / CAST(count(*) AS DOUBLE), 4)
                   AS avg_days
        FROM j GROUP BY 1 ORDER BY 1
    """,
    "tpch_q7": """
        SELECT supp_nation, cust_nation, l_year,
               round(sum(rev) / 1e6, 4) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE n1.n_name IN ('NATION_1', 'NATION_2')
              AND n2.n_name IN ('NATION_1', 'NATION_2')
              AND n1.n_name <> n2.n_name
              AND l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01')
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    "tpch_q8": """
        SELECT o_year,
               round(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev ELSE 0 END)
                     * 100.0 / sum(rev), 6) AS mkt_share_pct
        FROM (
            SELECT year(o_orderdate) AS o_year, n2.n_name AS supp_nation,
                   CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region   ON n1.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'PROMO'
              AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01')
        GROUP BY 1
        ORDER BY 1
    """,
    "tpch_q9": """
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                         - CAST(round(p_retailprice * 100) AS BIGINT)
                           * CAST(round(l_quantity * 100) AS BIGINT)) / 1e6,
                     4) AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
        ORDER BY nation, o_year DESC
    """,
    "tpch_q11": """
        WITH grouped AS (
            SELECT l_partkey,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * CAST(round(l_quantity * 100) AS BIGINT)) AS value_units
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_5'
            GROUP BY 1)
        SELECT l_partkey, round(value_units / 1e8, 2) AS part_value
        FROM grouped, (SELECT sum(value_units) AS total_units FROM grouped)
        WHERE value_units * 1000 > total_units
        ORDER BY part_value DESC, l_partkey
    """,
    "tpch_q13": """
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
            GROUP BY 1)
        GROUP BY 1
        ORDER BY custdist DESC, c_count DESC
    """,
    "tpch_q15": """
        WITH rev AS (
            SELECT l_suppkey,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS rev_units
            FROM lineitem
            WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
            GROUP BY 1)
        SELECT s_suppkey, s_name, round(rev_units / 1e6, 4) AS total_revenue
        FROM rev
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE rev_units = (SELECT max(rev_units) FROM rev)
        ORDER BY s_suppkey
    """,
    "tpch_q17": """
        SELECT round(sum(price_cents) / 700.0, 4) AS avg_yearly
        FROM (
            SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
                   CAST(round(l_quantity * 100) AS BIGINT) AS qty_units,
                   sum(CAST(round(l_quantity * 100) AS BIGINT))
                       OVER (PARTITION BY l_partkey) AS sum_units,
                   count(*) OVER (PARTITION BY l_partkey) AS cnt
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_brand = 'Brand#13')
        WHERE qty_units * 5 * cnt < sum_units
    """,
    "tpch_q20": """
        WITH per AS (
            SELECT l_partkey, l_suppkey,
                   sum(CAST(round(l_quantity * 100) AS BIGINT)) AS supp_qty
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'large%'
              AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
            GROUP BY 1, 2),
        dominant AS (
            SELECT DISTINCT l_suppkey
            FROM (SELECT *, sum(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
                  FROM per)
            WHERE supp_qty * 2 > part_qty)
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
          AND s_suppkey IN (SELECT l_suppkey FROM dominant)
        ORDER BY s_name
    """,
    "tpch_q22": """
        WITH base AS (
            SELECT c_custkey % 7 AS code, c_custkey,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
            FROM customer
            WHERE c_custkey % 7 IN (1, 3, 5)),
        stats AS (
            SELECT sum(bal_cents) AS sum_bal, count(*) AS cnt_bal
            FROM base WHERE bal_cents > 0)
        SELECT code, count(*) AS numcust,
               round(sum(bal_cents) / 100.0, 2) AS totacctbal
        FROM base, stats
        WHERE bal_cents * cnt_bal > sum_bal
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY 1
        ORDER BY 1
    """,
    "tpch_q2": """
        WITH offers AS (
            SELECT l_partkey, l_suppkey,
                   min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_cents
            FROM lineitem GROUP BY 1, 2),
        best AS (
            SELECT *, min(cost_cents) OVER (PARTITION BY l_partkey) AS min_cost
            FROM offers)
        SELECT s_acctbal, s_name, n_name AS nation, p_partkey, p_brand,
               round(cost_cents / 100.0, 2) AS supply_cost
        FROM best
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE cost_cents = min_cost AND p_size IN (5, 15, 25)
        ORDER BY s_acctbal DESC, nation, s_name, p_partkey
        LIMIT 100
    """,
    "tpch_q21": """
        WITH per_sup AS (
            SELECT l_orderkey, l_suppkey,
                   max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                            THEN 1 ELSE 0 END) AS late
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
            GROUP BY 1, 2),
        flagged AS (
            SELECT *, count(*) OVER (PARTITION BY l_orderkey) AS nsupp,
                      sum(late) OVER (PARTITION BY l_orderkey) AS nlate
            FROM per_sup)
        SELECT s_name, count(*) AS numwait
        FROM flagged JOIN supplier ON l_suppkey = s_suppkey
        WHERE late = 1 AND nsupp > 1 AND nlate = 1
        GROUP BY 1
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
    "tpch_q19": """
        SELECT count(*) AS line_cnt,
               round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 1e6,
                     4) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#20' AND p_size BETWEEN 5 AND 25
               AND l_quantity BETWEEN 10 AND 35)
    """,
    "tpch_q12": """
        SELECT l_returnflag AS flag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_cnt,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_cnt
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= '1996-01-01'
        GROUP BY 1
    """,
    "tpch_q10": """
        SELECT c_custkey, c_name, n_name AS nation, c_acctbal,
               round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 1e6,
                     4) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= '1995-10-01' AND o_orderdate < '1996-01-01'
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "tpch_q16": """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size IN (1, 5, 9, 13)
        GROUP BY 1, 2, 3
    """,
    "tpch_q4": """
        SELECT o_orderpriority AS priority, count(*) AS order_cnt
        FROM orders o
        WHERE o_orderdate >= '1995-01-01' AND o_orderdate < '1995-07-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY 1
    """,
    "below_nation_avg": """
        SELECT s_suppkey, s_name, nation,
               round(bal / 100.0, 2) AS acctbal,
               round(nation_avg / 100.0, 4) AS nation_avg_bal
        FROM (
            SELECT s_suppkey, s_name, n_name AS nation,
                   CAST(round(s_acctbal * 100) AS BIGINT) AS bal,
                   avg(CAST(round(s_acctbal * 100) AS BIGINT))
                       OVER (PARTITION BY n_name) AS nation_avg
            FROM supplier JOIN nation ON s_nationkey = n_nationkey)
        WHERE bal < nation_avg
    """,
    "urgent_no_fail_customers": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders
                            WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'O')
          AND c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_orderstatus = 'F')
    """,
    "tpch_q14": """
        SELECT round(
                 sum(CASE WHEN p_type = 'PROMO'
                          THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                               * (100 - CAST(round(l_discount * 100) AS BIGINT))
                          ELSE 0 END) * 100.0
                 / sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))),
                 6) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= '1995-09-01' AND l_shipdate < '1995-10-01'
    """,
    "supplier_balance_rank": """
        SELECT nation, rk, s_suppkey, s_name,
               round(bal_cents / 100.0, 2) AS acctbal
        FROM (
            SELECT s_suppkey, s_name, n_name AS nation,
                   CAST(round(s_acctbal * 100) AS BIGINT) AS bal_cents,
                   dense_rank() OVER (PARTITION BY n_name
                                      ORDER BY CAST(round(s_acctbal * 100) AS BIGINT) DESC,
                                               s_suppkey) AS rk
            FROM supplier JOIN nation ON s_nationkey = n_nationkey)
        WHERE rk <= 3
    """,
    "tpch_q5": """
        SELECT n_name AS nation,
               round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 1e6,
                     4) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= '1994-01-01' AND o_orderdate < '1995-01-01'
        GROUP BY 1
        ORDER BY revenue DESC, nation
    """,
    "tpch_q6": """
        SELECT round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * CAST(round(l_discount * 100) AS BIGINT)) / 1e4,
                     4) AS revenue
        FROM lineitem
        WHERE l_shipdate >= '1994-01-01' AND l_shipdate < '1995-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "tpch_q18": f"""
        WITH big_orders AS (
            SELECT l_orderkey,
                   sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qty_units
            FROM lineitem GROUP BY 1
            HAVING qty_units > {_Q18_QTY_THRESHOLD * 100})
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               round(qty_units / 100.0, 2) AS total_qty
        FROM orders
        JOIN big_orders ON o_orderkey = l_orderkey
        JOIN customer   ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        LIMIT 100
    """,
}

QUERIES = {
    "tpch_q5": tpch_q5,
    "tpch_q6": tpch_q6,
    "tpch_q18": tpch_q18,
    "tpch_q14": tpch_q14,
    "supplier_balance_rank": supplier_balance_rank,
    "below_nation_avg": below_nation_avg,
    "urgent_no_fail_customers": urgent_no_fail_customers,
    "tpch_q4": tpch_q4,
    "tpch_q10": tpch_q10,
    "tpch_q12": tpch_q12,
    "tpch_q19": tpch_q19,
    "tpch_q16": tpch_q16,
    "tpch_q2": tpch_q2,
    "tpch_q21": tpch_q21,
    "tpch_q7": tpch_q7,
    "tpch_q8": tpch_q8,
    "tpch_q9": tpch_q9,
    "tpch_q11": tpch_q11,
    "tpch_q13": tpch_q13,
    "tpch_q15": tpch_q15,
    "tpch_q17": tpch_q17,
    "tpch_q20": tpch_q20,
    "tpch_q22": tpch_q22,
    "order_to_ship_latency": order_to_ship_latency,
    "brand_revenue_share": brand_revenue_share,
    "monthly_revenue_yoy": monthly_revenue_yoy,
    "discount_effectiveness": discount_effectiveness,
}


LATERAL_CUST_MOD = 100
LATERAL_TOP_N = 2


def lateral_topn_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:2016 / Spark 3.2+): the newest
    LATERAL_TOP_N orders for each sampled customer, expressed exactly as a
    user would write it against the SQL surface — the per-row-subquery
    shape that decorrelates into a ranked window join under Catalyst
    (same result as the `top_docs_per_lang` grouped-top-N pattern, but
    arriving via the SQL front door).
    """
    from ai_powered_data_pipeline_assistant_spark.catalog import load_tables

    load_tables(spark, sf_dir, register_views=True)
    return spark.sql(f"""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice
                 FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_orderdate DESC, o_orderkey
                 LIMIT {LATERAL_TOP_N}) t
        WHERE c.c_custkey % {LATERAL_CUST_MOD} = 0
        ORDER BY c.c_custkey, t.o_orderkey
    """)


QUERIES["lateral_topn_per_customer"] = lateral_topn_per_customer

ORACLES["lateral_topn_per_customer"] = f"""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice
             FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_orderdate DESC, o_orderkey
             LIMIT {LATERAL_TOP_N}) t
    WHERE c.c_custkey % {LATERAL_CUST_MOD} = 0
    ORDER BY c.c_custkey, t.o_orderkey
"""
