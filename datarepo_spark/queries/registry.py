"""Named query registry: the correctness surface of the engine.

Every entry pairs a Spark DataFrame program with an equivalent ANSI-SQL
oracle (run by DuckDB over the same parquet). Together they cover the full
operator inventory of SURVEY.md §2 — Layer A (filter algebra, pruning,
projection, dedup, normalization, union) and Layer B (the relational surface
the reference delegates to polars: joins, aggregations, windows, set ops,
reshape, scalar function families, time bucketing).

Determinism rules (so the driver's order-insensitive value hash matches):
  - Per-row double arithmetic is IEEE-deterministic and identical across
    engines; only *aggregation order* isn't. Every SUM/AVG over doubles
    therefore accumulates exactly via DECIMAL(38,6) and casts the final
    value back to DOUBLE in both the Spark program and the oracle.
  - Every ORDER BY ... LIMIT has a unique tiebreaker column.
  - Window orderings are made total with key tiebreakers.
  - Column names are aliased identically on both sides.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..core.readconf import apply_parquet_read_compat

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark_fn: QueryFn
    oracle: Optional[str]  # None → driver falls back to rows-only check
    description: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: Optional[str] = None, description: str = ""
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(name, fn, oracle, description or (fn.__doc__ or ""))
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Pin timestamp semantics on whatever session the caller hands us
    # (driver gate, notebook): see core/readconf.py.
    apply_parquet_read_compat(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # Parquet TIMESTAMP(NANOS) arrives as a raw nanosecond long (see
    # session.py nanosAsLong); convert to a proper timestamp. Integer DIV —
    # a double division would lose precision above 2^53 ns (~1970+104 days).
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return df


def dsum(col: Column | str) -> Column:
    """Order-insensitive exact sum of a double expression (see module doc)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(T.DecimalType(38, 6))).cast("double")


def davg(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(T.DecimalType(38, 6))).cast("double")
        / F.count(c)
    )


def SQL_DSUM(expr: str) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"


def SQL_DAVG(expr: str) -> str:
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"
        f" / COUNT({expr})"
    )


# ---------------------------------------------------------------------------
# Flagship / TPC-H-style analytical queries
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {SQL_DSUM('l_quantity')} AS sum_qty,
           {SQL_DSUM('l_extendedprice')} AS sum_base_price,
           {SQL_DSUM('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {SQL_DSUM('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {SQL_DAVG('l_quantity')} AS avg_qty,
           {SQL_DAVG('l_extendedprice')} AS avg_price,
           {SQL_DAVG('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1: scan-filter-aggregate with 8 aggregates",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {SQL_DSUM('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    description="TPC-H Q3: 3-way join, group, top-k (broadcastable dims)",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    # customer is the smallest side → broadcast it into orders; the
    # orders→lineitem join shuffles on the (high-cardinality) order key.
    return (
        li.join(
            F.broadcast(cust).join(orders, cust.c_custkey == orders.o_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {SQL_DSUM('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    description="TPC-H Q5: 6-way star join with dims broadcast",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {SQL_DSUM('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    description="TPC-H Q6: pure scan-filter-aggregate (pushdown showcase)",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {SQL_DSUM('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    description="TPC-H Q10: join + group + top-20 customers by lost revenue",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Filter-algebra operators (Layer A8/A9: all 12 operators over real data)
# ---------------------------------------------------------------------------


@register(
    "filter_comparisons",
    oracle="""
    SELECT p_partkey, p_name, p_size, p_retailprice
    FROM part
    WHERE p_size >= 10 AND p_size < 40 AND p_retailprice > 900.0
      AND p_brand != 'Brand#3'
    """,
    description="=, !=, <, <=, >, >= comparison operators",
)
def filter_comparisons(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..core.compile import filters_to_column
    from ..core.filters import Filter, normalize_filters

    p = load(spark, sf_dir, "part")
    dnf = normalize_filters(
        [
            Filter("p_size", ">=", 10),
            Filter("p_size", "<", 40),
            Filter("p_retailprice", ">", 900.0),
            Filter("p_brand", "!=", "Brand#3"),
        ]
    )
    return p.filter(filters_to_column(dnf)).select(
        "p_partkey", "p_name", "p_size", "p_retailprice"
    )


@register(
    "filter_in_contains_dnf",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal
    FROM customer
    WHERE (c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_acctbal > 5000.0)
       OR (c_name LIKE '%0042%')
    """,
    description="in / contains / OR-of-conjunctions DNF compile",
)
def filter_in_contains_dnf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..core.compile import filters_to_column
    from ..core.filters import Filter, normalize_filters

    c = load(spark, sf_dir, "customer")
    dnf = normalize_filters(
        [
            [
                Filter("c_mktsegment", "in", ["BUILDING", "MACHINERY"]),
                Filter("c_acctbal", ">", 5000.0),
            ],
            [Filter("c_name", "contains", "0042")],
        ]
    )
    return c.filter(filters_to_column(dnf)).select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )


@register(
    "filter_not_in",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE o_orderstatus NOT IN ('O')
      AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    """,
    description="not in operator",
)
def filter_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..core.compile import filters_to_column
    from ..core.filters import Filter, normalize_filters

    o = load(spark, sf_dir, "orders")
    dnf = normalize_filters(
        [
            Filter("o_orderstatus", "not in", ["O"]),
            Filter("o_orderpriority", "not in", ["1-URGENT", "2-HIGH"]),
        ]
    )
    return o.filter(filters_to_column(dnf)).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )


@register(
    "filter_sql_string",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_acctbal >= 0.0 AND s_nationkey < 10
    """,
    description="raw SQL string predicate passthrough (reference A2 delta path)",
)
def filter_sql_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    return s.filter("s_acctbal >= 0.0 AND s_nationkey < 10").select(
        "s_suppkey", "s_name", "s_acctbal"
    )


# ---------------------------------------------------------------------------
# Join family (Layer B)
# ---------------------------------------------------------------------------


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0
    )
    """,
    description="left-semi join (EXISTS)",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
    description="left-anti join (NOT EXISTS): customers with no orders",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_outer_full",
    oracle="""
    SELECT n.n_name, r.r_name
    FROM nation n
    FULL OUTER JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    description="full outer join on small dims",
)
def join_outer_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return n.join(r, n.n_regionkey == r.r_regionkey, "outer").select(
        "n_name", "r_name"
    )


@register(
    "join_cross",
    oracle="""
    SELECT r1.r_name AS r1_name, r2.r_name AS r2_name
    FROM region r1 CROSS JOIN region r2
    """,
    description="cross join",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    r1 = r.select(F.col("r_name").alias("r1_name"))
    r2 = r.select(F.col("r_name").alias("r2_name"))
    return r1.crossJoin(r2)


@register(
    "join_theta_inequality",
    oracle="""
    SELECT s.s_suppkey, s.s_name, c.c_custkey
    FROM supplier s
    JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    WHERE s.s_suppkey <= 20
    """,
    description="theta join: equi key + inequality residual",
)
def join_theta_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 20)
    c = load(spark, sf_dir, "customer")
    return s.join(
        c,
        (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal),
    ).select("s_suppkey", "s_name", "c_custkey")


@register(
    "join_range_bucketed",
    oracle="""
    SELECT s.s_suppkey, c.c_custkey, s.s_acctbal, c.c_acctbal
    FROM supplier s
    JOIN customer c
      ON s.s_nationkey = c.c_nationkey
     AND s.s_acctbal >= c.c_acctbal - 250.0
     AND s.s_acctbal <= c.c_acctbal + 250.0
    """,
    description=(
        "interval-containment join via range bucketing: equi-join on "
        "(key, bucket) + exact residual — never a nested loop"
    ),
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.range_join import range_join

    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        (F.col("c_acctbal") - 250.0).alias("__lo"),
        (F.col("c_acctbal") + 250.0).alias("__hi"),
    )
    return range_join(
        s,
        c,
        point_col="s_acctbal",
        start_col="__lo",
        end_col="__hi",
        bucket_width=500.0,
        equi_keys=[("s_nationkey", "c_nationkey")],
    ).select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")


# ---------------------------------------------------------------------------
# Aggregation family
# ---------------------------------------------------------------------------


@register(
    "agg_distinct_counts",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    description="count distinct + min/max per group",
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@register(
    "agg_whole_frame",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           {SQL_DSUM('l_quantity')} AS total_qty,
           MIN(l_shipdate) AS first_ship,
           MAX(l_shipdate) AS last_ship
    FROM lineitem
    """,
    description="whole-frame aggregation (no grouping)",
)
def agg_whole_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_suppkey").alias("n_supp"),
        dsum("l_quantity").alias("total_qty"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {SQL_DSUM('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    description="ROLLUP grouping sets (free Spark upgrade over polars)",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty")
    )


@register(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    description="CUBE grouping sets",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_prio
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    description=(
        "explicit GROUPING SETS (a strict subset of CUBE's lattice) with "
        "GROUPING() markers distinguishing rollup-nulls from data-nulls"
    ),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark 4 DataFrame API: groupingSets(...). One pass; the expand
    # operator replicates rows per set before a single partial+final agg,
    # so at 100 TB the cost is (#sets x rows) map-side, still 1 shuffle.
    o = load(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_prio"),
    )


@register(
    "agg_median_quantile",
    oracle="""
    SELECT l_returnflag,
           MEDIAN(l_quantity) AS med_qty,
           QUANTILE_CONT(l_quantity, 0.9) AS p90_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="median / exact interpolated quantile per group",
)
def agg_median_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.percentile("l_quantity", 0.9).alias("p90_qty"),
    )


@register(
    "agg_approx_percentile",
    # Like the HLL gate: the sketch VALUE (KLL/GK quantile estimate) is
    # engine-specific, but its rank-error contract is checkable — the
    # approx median must land between the exact 45th and 55th
    # percentiles (percentile_approx at accuracy=1000 guarantees rank
    # error ≤ 0.1%; the 5-point window is 50× headroom). Emit the exact
    # median + the contract boolean; DuckDB reproduces both.
    oracle="""
    SELECT l_returnflag,
           MEDIAN(l_extendedprice) AS exact_median,
           TRUE AS within_rank_window
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="percentile_approx (KLL-style sketch) gated by a rank-"
    "window contract around the exact median",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    approx = F.percentile_approx("l_extendedprice", 0.5, 1000)
    return li.groupBy("l_returnflag").agg(
        F.median("l_extendedprice").alias("exact_median"),
        (
            (approx >= F.percentile("l_extendedprice", 0.45))
            & (approx <= F.percentile("l_extendedprice", 0.55))
        ).alias("within_rank_window"),
    )


@register(
    "agg_approx_distinct",
    # HLL estimates are engine-specific, so the sketch VALUE can't be
    # oracle-compared — but its accuracy contract can: emit the exact
    # distinct count plus a boolean asserting the Spark HLL estimate is
    # within 3× the requested rsd (0.05). DuckDB's oracle computes the same
    # exact count and (trivially true under the contract) bound flag, so
    # the row hash is stable and the gate is hard.
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS within_rsd
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="approx_count_distinct (HLL) gated by exact-count rsd bound",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", rsd=0.05)
                - F.count_distinct("l_partkey")
            )
            <= F.lit(0.15) * F.count_distinct("l_partkey")
        ).alias("within_rsd"),
    )


# ---------------------------------------------------------------------------
# Window family
# ---------------------------------------------------------------------------


@register(
    "window_rank_topk_per_group",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal, rnk
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (
               PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey
             ) AS rnk
      FROM customer
    )
    WHERE rnk <= 3
    """,
    description="top-k per group via row_number window",
)
def window_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rnk")
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           LAG(o_totalprice)  OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    description="lag/lead analytic windows",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@register(
    "window_running_sum",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    WHERE o_custkey <= 100
    """,
    description="cumulative sum window (rowsBetween frame)",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(T.DecimalType(38, 6)))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


@register(
    "window_rolling_mean",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE)
             / COUNT(o_totalprice) OVER w AS rolling3_avg
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    description="rolling window mean over a 3-row frame",
)
def window_rolling_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(F.col("o_totalprice").cast(T.DecimalType(38, 6)))
            .over(w)
            .cast("double")
            / F.count("o_totalprice").over(w)
        ).alias("rolling3_avg"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / dedup / set ops
# ---------------------------------------------------------------------------


@register(
    "sort_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    description="global top-k (Spark plans TakeOrderedAndProject — no full sort)",
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@register(
    "dedup_distinct_subset",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment
    FROM customer
    """,
    description="distinct on a column subset (reference A15 dropDuplicates)",
)
def dedup_distinct_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select("c_nationkey", "c_mktsegment").distinct()


@register(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    description="union + distinct (set semantics)",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).distinct()


@register(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
    description="EXCEPT set op (customers minus purchasers)",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c.exceptAll(o).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    description="INTERSECT set op",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


# ---------------------------------------------------------------------------
# Scalar function families (string / date / math / array / JSON / cond)
# ---------------------------------------------------------------------------


@register(
    "fn_string_suite",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LOWER(p_type) AS type_lower,
           LENGTH(p_name) AS name_len,
           SUBSTRING(p_name, 1, 5) AS name_head,
           REPLACE(p_brand, 'Brand#', 'B') AS brand_short,
           CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END AS is_brass,
           SPLIT_PART(p_type, ' ', 1) AS type_first_word,
           TRIM(CONCAT('  ', p_brand, '  ')) AS brand_trim
    FROM part
    WHERE p_partkey <= 200
    """,
    description="string function family",
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.regexp_replace("p_brand", "Brand#", "B").alias("brand_short"),
        F.when(F.col("p_type").contains("BRASS"), 1).otherwise(0).alias("is_brass"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_first_word"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias(
            "brand_trim"
        ),
    )


@register(
    "fn_date_suite",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(DAY(o_orderdate) AS INT) AS order_day,
           CAST(DAYOFWEEK(o_orderdate) + 1 AS INT) AS order_dow,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           CAST(o_orderdate AS DATE) AS order_date
    FROM orders
    WHERE o_orderkey <= 500
    """,
    description="date/time function family",
)
def fn_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        (F.dayofweek("o_orderdate")).alias("order_dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )


@register(
    "fn_math_suite",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_round,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
           ABS(l_quantity - 25.0) AS qty_dev,
           CAST(SQRT(l_extendedprice) AS DOUBLE) AS price_sqrt,
           ROUND(CAST(LN(l_extendedprice + 1) AS DOUBLE), 9) AS price_ln,
           ROUND(CAST(POW(l_tax + 1, 2) AS DOUBLE), 9) AS tax_sq,
           MOD(l_orderkey, 7) AS key_mod
    FROM lineitem
    WHERE l_orderkey <= 300
    """,
    description="math function family (per-row IEEE ops are deterministic)",
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_round"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.abs(F.col("l_quantity") - 25.0).alias("qty_dev"),
        # sqrt is IEEE correctly-rounded (safe cross-engine); ln/pow are
        # libm-dependent in the last ulp — round to 9 decimals on both sides.
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 9).alias("price_ln"),
        F.round(F.pow(F.col("l_tax") + 1, 2), 9).alias("tax_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@register(
    "fn_array_suite",
    oracle="""
    SELECT vec_id, label,
           LEN(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           LIST_REDUCE(
             LIST_PREPEND(0.0, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))),
             (acc, x) -> acc + x
           ) AS vec_sum
    FROM embeddings
    WHERE vec_id <= 100
    """,
    description="array function family: size / element_at / aggregate-fold",
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") <= 100)
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("bigint").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double"),
        ).alias("vec_sum"),
    )


@register(
    "fn_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    WHERE event_id <= 200
    """,
    description="JSON extraction from a string column",
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_id") <= 200)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


@register(
    "fn_conditional_null",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS balance_band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked
    FROM customer
    """,
    description="when/otherwise, coalesce, nullif",
)
def fn_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("balance_band"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_masked"),
    )


# ---------------------------------------------------------------------------
# Reshape: explode / pivot / unpivot
# ---------------------------------------------------------------------------


@register(
    "reshape_explode",
    oracle="""
    SELECT vec_id, CAST(u.val AS DOUBLE) AS val
    FROM embeddings, UNNEST(embedding) AS u(val)
    WHERE vec_id <= 20
    """,
    description="explode an array column to rows",
)
def reshape_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") <= 20)
    return e.select("vec_id", F.explode("embedding").alias("v")).select(
        "vec_id", F.col("v").cast("double").alias("val")
    )


@register(
    "reshape_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity END
                         AS DECIMAL(38,6))) AS DOUBLE) AS "O",
           CAST(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity END
                         AS DECIMAL(38,6))) AS DOUBLE) AS "F"
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="pivot linestatus into columns",
)
def reshape_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
    )


@register(
    "reshape_unpivot",
    oracle="""
    SELECT c_custkey, metric, CAST(value AS DOUBLE) AS value
    FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey' AS metric,
             CAST(c_nationkey AS DOUBLE) AS value FROM customer
    )
    WHERE c_custkey <= 100
    """,
    description="unpivot/melt wide→long",
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    return c.select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "value")


# ---------------------------------------------------------------------------
# Time bucketing over the events table
# ---------------------------------------------------------------------------


@register(
    "events_tumbling_window",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {SQL_DSUM('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    description="tumbling 1h time-window aggregation (batch form of streaming agg)",
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "events_sessionize",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ), sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events, MIN(ts) AS session_start
    FROM sess
    GROUP BY user_id, session_id
    """,
    description="sessionization: lag-gap + cumulative-sum session ids",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # µs-exact gap so the 30-minute threshold compares identically to the
    # oracle's INTERVAL comparison (second-truncation would drift at edges).
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    is_new = F.when(
        gap.isNull() | (gap > 30 * 60 * 1_000_000), 1
    ).otherwise(0)
    sess = e.withColumn("is_new", is_new).withColumn(
        "session_id",
        F.sum("is_new").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
    )


# ---------------------------------------------------------------------------
# Coverage batch 2: remaining §2B families (left/as-of joins, rank variants,
# frame windows, union-with-drift, normalization, posexplode, struct/map,
# date parsing, heavier TPC-H shapes)
# ---------------------------------------------------------------------------


@register(
    "join_left",
    oracle="""
    SELECT n.n_name, s.s_suppkey, s.s_acctbal
    FROM nation n
    LEFT JOIN supplier s
      ON n.n_nationkey = s.s_nationkey AND s.s_acctbal > 9000.0
    """,
    description="left outer join with pushed-down right-side predicate",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000.0)
    return n.join(s, n.n_nationkey == s.s_nationkey, "left").select(
        "n_name", "s_suppkey", "s_acctbal"
    )


@register(
    "join_asof_backward",
    oracle="""
    SELECT e.event_id, e.user_id, o.o_orderdate AS last_order_date
    FROM events e
    ASOF LEFT JOIN orders o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    description="as-of join (backward): latest order at-or-before each event",
)
def join_asof_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    e = load(spark, sf_dir, "events")
    o = load(spark, sf_dir, "orders")
    return asof_join(
        e.select("event_id", "user_id", "ts"),
        o,
        left_on="ts",
        right_on="o_orderdate",
        left_by="user_id",
        right_by="o_custkey",
        payload=F.col("o_orderdate"),
        payload_name="last_order_date",
    ).select("event_id", "user_id", "last_order_date")


@register(
    "window_rank_variants",
    oracle="""
    SELECT s_suppkey,
           RANK()         OVER w AS rnk,
           DENSE_RANK()   OVER w AS drnk,
           PERCENT_RANK() OVER w AS prnk,
           NTILE(4)       OVER w AS quartile
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
    description="rank / dense_rank / percent_rank / ntile window variants",
)
def window_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    return s.select(
        "s_suppkey",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@register(
    "window_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice)  OVER w AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WHERE o_custkey <= 50
    WINDOW w AS (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
    description="first_value / last_value / nth_value over full-frame window",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@register(
    "window_range_7d",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_7d,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sum_7d
    FROM events
    WHERE user_id <= 30
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts
      RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
    )
    """,
    description="rangeBetween interval frame: trailing-7-day per-user stats",
)
def window_range_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("user_id") <= 30)
    # rangeBetween needs a numeric ordering column: epoch µs, exact.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-7 * 24 * 3600 * 1_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_7d"),
        F.sum(F.col("value").cast(T.DecimalType(38, 6)))
        .over(w)
        .cast("double")
        .alias("sum_7d"),
    )


@register(
    "set_union_all_drift",
    oracle="""
    SELECT c_custkey AS id, c_acctbal AS balance, NULL AS nation FROM customer
    UNION ALL
    SELECT s_suppkey AS id, NULL AS balance,
           CAST(s_nationkey AS INT) AS nation FROM supplier
    """,
    description="union-all with missing-column tolerance (A5 + A16)",
)
def set_union_all_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.col("c_acctbal").alias("balance")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("id"),
        F.col("s_nationkey").cast("int").alias("nation"),
    )
    return c.unionByName(s, allowMissingColumns=True)


@register(
    "normalize_missing_column",
    oracle="""
    SELECT s_suppkey, s_name, CAST(NULL AS DOUBLE) AS bonus, s_acctbal
    FROM supplier
    """,
    description="schema normalization: declared column absent from files → "
    "typed NULL, declared order preserved (A16)",
)
def normalize_missing_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables.normalize import normalize_df

    declared = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("bonus", T.DoubleType()),  # not in the files
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    )
    s = load(spark, sf_dir, "supplier")
    return normalize_df(s, declared)


@register(
    "reshape_posexplode",
    oracle="""
    SELECT vec_id, CAST(i - 1 AS INT) AS pos,
           CAST(embedding[i] AS DOUBLE) AS val
    FROM embeddings, RANGE(1, 65) r(i)
    WHERE vec_id <= 10
    """,
    description="posexplode: array → (position, value) rows",
)
def reshape_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") <= 10)
    return e.select("vec_id", F.posexplode("embedding")).select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        F.col("col").cast("double").alias("val"),
    )


@register(
    "fn_struct_map",
    oracle="""
    SELECT c_custkey,
           c_acctbal AS profile_balance,
           CAST(c_nationkey AS INT) AS profile_nation,
           c_mktsegment AS tag_segment
    FROM customer
    WHERE c_custkey <= 200
    """,
    description="struct construction + field access, map literal + element_at",
)
def fn_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    built = c.select(
        "c_custkey",
        F.struct(
            F.col("c_acctbal").alias("balance"),
            F.col("c_nationkey").cast("int").alias("nation"),
        ).alias("profile"),
        F.create_map(
            F.lit("segment"), F.col("c_mktsegment")
        ).alias("tags"),
    )
    return built.select(
        "c_custkey",
        F.col("profile.balance").alias("profile_balance"),
        F.col("profile.nation").alias("profile_nation"),
        F.element_at("tags", "segment").alias("tag_segment"),
    )


@register(
    "fn_date_parse_format",
    oracle="""
    SELECT o_orderkey,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS date_str,
           CAST(STRPTIME(STRFTIME(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d')
                AS TIMESTAMP) AS reparsed,
           CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    WHERE o_orderkey <= 300
    """,
    description="date formatting / parsing round trip + epoch seconds",
)
def fn_date_parse_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_str"),
        F.to_timestamp(
            F.date_format("o_orderdate", "yyyy-MM-dd"), "yyyy-MM-dd"
        ).alias("reparsed"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    description="TPC-H Q4 shape: EXISTS semi-join + grouped count",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    matched = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "q18_large_volume",
    oracle=f"""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
           {SQL_DSUM('l.l_quantity')} AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 180
    )
    GROUP BY c.c_custkey, o.o_orderkey, o.o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    description="TPC-H Q18 shape: HAVING subquery via semi-join, re-agg, top-k",
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(T.DecimalType(38, 6))).alias("q"))
        .filter(F.col("q") > 180)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, o.o_custkey == c.c_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "agg_having",
    oracle=f"""
    SELECT c_nationkey, {SQL_DAVG('c_acctbal')} AS avg_bal,
           COUNT(*) AS n_cust
    FROM customer
    GROUP BY c_nationkey
    HAVING {SQL_DAVG('c_acctbal')} > 4400.0
    """,
    description="grouped aggregate with HAVING filter on the aggregate",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            davg("c_acctbal").alias("avg_bal"),
            F.count(F.lit(1)).alias("n_cust"),
        )
        .filter(F.col("avg_bal") > 4400.0)
    )


# ---------------------------------------------------------------------------
# Coverage batch 3: classic TPC-H query shapes adapted to the testdata star
# schema (no partsupp/shipmode columns — predicates adapted, shapes kept)
# ---------------------------------------------------------------------------


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS l_year,
           {SQL_DSUM('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY n1.n_name, n2.n_name, YEAR(l.l_shipdate)
    ORDER BY cust_nation, supp_nation, l_year
    """,
    description="TPC-H Q7 shape: bidirectional nation pair volume by year",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nkey"))
        .filter(
            (
                (F.col("cust_nation") == "NATION_1")
                & (F.col("supp_nation") == "NATION_2")
            )
            | (
                (F.col("cust_nation") == "NATION_2")
                & (F.col("supp_nation") == "NATION_1")
            )
        )
    )
    return (
        joined.groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy("cust_nation", "supp_nation", "l_year")
    )


@register(
    "q12_priority_counting",
    oracle="""
    SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    GROUP BY YEAR(o_orderdate)
    """,
    description="TPC-H Q12 shape: conditional counting with CASE aggregates",
)
def q12_priority_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return o.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.00 * {SQL_DSUM("CASE WHEN p.p_type = 'PROMO' "
                              "THEN l.l_extendedprice * (1 - l.l_discount) "
                              "ELSE 0 END")}
           / {SQL_DSUM('l.l_extendedprice * (1 - l.l_discount)')}
           AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    description="TPC-H Q14 shape: promo revenue share (conditional / total)",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg((100.00 * dsum(promo) / dsum(rev)).alias("promo_revenue"))
    )


@register(
    "q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand NOT IN ('Brand#1', 'Brand#2')
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
    description="TPC-H Q16 shape: distinct supplier count with NOT IN",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(
        ~F.col("p_brand").isin("Brand#1", "Brand#2")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_size"))
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {SQL_DSUM('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 21)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
    description="TPC-H Q19 shape: OR-of-conjunctions join predicate (DNF)",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    branch = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= smax)
        & (F.col("l_quantity") >= qlo)
        & (F.col("l_quantity") <= qhi)
    )
    pred = (
        branch("Brand#1", 15, 1, 21)
        | branch("Brand#2", 25, 10, 30)
        | branch("Brand#3", 35, 20, 40)
    )
    return joined.filter(pred).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        )
    )


@register(
    "q22_global_sales_opportunity",
    oracle=f"""
    WITH avg_bal AS (
      SELECT {SQL_DAVG('c_acctbal')} AS ab FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           COUNT(*) AS numcust,
           {SQL_DSUM('c.c_acctbal')} AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      )
    GROUP BY c.c_nationkey
    """,
    description="TPC-H Q22 shape: scalar-subquery threshold + anti join",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    # Scalar aggregate as a 1-row broadcast cross join — no collect(), the
    # threshold stays inside the plan.
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("ab")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )
