"""Rank-based statistics and distribution shapes (r12 batch).

Every operator here is the class the r11 verdict flagged as Spark's
global-order trap: exact order statistics over corpus-scaled frames.
They are all built on the two-pass distributed rank/prefix-sum
primitive (functions/twopass.py) — value cells, range-partitioned
local windows, bounded carry frames — so no query in this module ever
plans an unpartitioned Window over a data-scaled input.

Determinism contract (registry.py rules): exact integer/decimal folds
up to the last division; libm outputs rounded at 9 on both engines;
double folds over bounded group sets use the pinned ordered-fold
pattern (Spark ``aggregate`` over a sorted array == DuckDB
``list_reduce`` over ``LIST(... ORDER BY ...)``, 0.0-seed == first-
element-seed because ``0.0 + x == x``).

Reference parity: the reference engine's analytics surface stops at
SQL windows (src/datarepo/*); these are the standard
statistics-warehouse extensions (Mann-Whitney U, Kruskal-Wallis H,
weighted median, Lorenz curve, Kaplan-Meier survival, inter-arrival
percentiles, association rules) every large-scale data-quality
pipeline reaches for — public-textbook formulations, cited per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.twopass import distributed_ntile, distributed_prefix_sum
from .registry import load, register

_DEC = "decimal(38,0)"


def _value_cells(df: DataFrame, val_col: str) -> DataFrame:
    """(v, c): per distinct value, its count — the pre-rank cell frame.
    Consumers that only need cell counts (tie terms) read THIS, not the
    ranked output, so they never drag the prefix-sum pipeline into
    their branch (r12 ADVICE on profile_kruskal_wallis)."""
    return df.groupBy(F.col(val_col).alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )


def _doubled_midrank_from_cells(cells: DataFrame) -> DataFrame:
    """(v, c, r2) from a (v, c) cell frame: the DOUBLED midrank
    2*cum_before + c + 1 (doubling keeps ties' half-ranks integer).
    The cum_before is the two-pass distributed prefix sum — value
    cells of a continuous column are corpus-scaled (the spearman
    lesson)."""
    ranked = distributed_prefix_sum(
        cells, ["v"], "c", out_col="cb", exclusive=True
    )
    return ranked.select(
        "v",
        "c",
        (F.lit(2) * F.col("cb").cast("long") + F.col("c") + F.lit(1)).alias(
            "r2"
        ),
    )


def _doubled_midrank_cells(df: DataFrame, val_col: str) -> DataFrame:
    return _doubled_midrank_from_cells(_value_cells(df, val_col))


_SKETCH_K = 4096


def bottomk_quantile_summary(
    samp: DataFrame, src: DataFrame, value_out: str
) -> DataFrame:
    """Quantile estimates from a bottom-k sample + exact realized-rank
    verification (shared by agg_quantile_sketch and the streaming
    twin). ``samp``: the k-row uniform sample, one column ``v``;
    ``src``: the full data, one column ``v``. Returns one row per
    p ∈ {50, 90, 95, 99}: the sample's p-quantile (element at index
    (p*(m-1)) DIV 100 of the value-sorted sample — integer arithmetic,
    no double rounding at the index), its EXACT realized rank in the
    full data (one conditional-count pass with the 4-row estimate
    frame broadcast), and the pinned eps=0.05 rank-error check.

    Everything here is bounded: the sample collapses to one k-array
    row, the estimate frame is 4 rows, and the only data-scaled pass
    is the rank count (a broadcast-filtered aggregate)."""
    spark = src.sparkSession
    arr = samp.agg(
        F.sort_array(F.collect_list("v")).alias("a"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    n = src.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    ps = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(p).cast("long") for p in (50, 90, 95, 99)])
        ).alias("p_pct")
    )
    est = ps.crossJoin(F.broadcast(arr)).select(
        "p_pct",
        F.col("m").alias("sketch_m"),
        F.element_at(
            F.col("a"),
            (F.expr("(p_pct * (m - 1)) DIV 100") + F.lit(1)).cast("int"),
        ).alias("__est"),
    )
    rk = (
        src.crossJoin(F.broadcast(est.select("p_pct", "__est")))
        .filter(F.col("v") <= F.col("__est"))
        .groupBy("p_pct")
        .agg(F.count(F.lit(1)).cast("long").alias("n_le"))
    )
    err = (
        F.col("n_le").cast("double") / F.col("n_rows").cast("double")
        - F.col("p_pct").cast("double") / F.lit(100.0)
    )
    return (
        est.join(F.broadcast(rk), "p_pct")
        .crossJoin(F.broadcast(n))
        .select(
            "p_pct",
            "sketch_m",
            "n_rows",
            F.col("__est").alias(value_out),
            F.round(
                F.col("n_le").cast("double")
                / F.col("n_rows").cast("double"),
                9,
            ).alias("realized_q"),
            F.round(F.abs(err), 9).alias("rank_err"),
            F.when(F.abs(err) <= 0.05, 1).otherwise(0).alias(
                "within_eps"
            ),
        )
        .orderBy("p_pct")
    )


@register(
    "profile_mann_whitney",
    # Mann-Whitney U (Wilcoxon rank-sum) comparing the `value`
    # distribution of click vs purchase events — THE nonparametric
    # two-sample location test (textbook formulation: Mann & Whitney
    # 1947; normal approximation with the standard tie correction).
    # Doubled midranks over pooled value cells keep everything integer
    # (the profile_spearman_rank machinery, two-pass distributed
    # cum_before); rank sums and the tie term Σ(c³-c) accumulate in
    # DECIMAL(38,0) with decimal-interior multiplies (exact to ~1e12
    # rows: c³ ≤ 1e36 < 1e38). The only doubles are the final
    # U/z/effect-size expressions — identical parenthesization on both
    # engines, sqrt is IEEE-exact, ROUND 9. Effect size is the rank-
    # biserial correlation r = -A/(n1*n2) where A = 2U - n1*n2.
    oracle="""
    WITH pool AS (
      SELECT value AS v,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_x
      FROM events WHERE event_type IN ('click', 'purchase')
    ), cells AS (
      SELECT v,
             CAST(SUM(is_x) AS BIGINT) AS cx,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM pool GROUP BY v
    ), ranked AS (
      SELECT cx, c,
             2 * CAST(COALESCE(SUM(c) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS BIGINT) + c + 1 AS r2
      FROM cells
    ), s AS (
      SELECT CAST(SUM(cx) AS DECIMAL(38,0)) AS nx,
             CAST(SUM(c - cx) AS DECIMAL(38,0)) AS ny,
             CAST(SUM(CAST(cx AS DECIMAL(38,0))
                      * CAST(r2 AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS s2rx,
             CAST(SUM(CAST(c AS DECIMAL(38,0))
                      * CAST(c AS DECIMAL(38,0))
                      * CAST(c AS DECIMAL(38,0))
                      - CAST(c AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS t_ties
      FROM ranked
    ), u AS (
      SELECT nx, ny, t_ties,
             CAST(s2rx - nx * (nx + 1) AS DECIMAL(38,0)) AS u2x,
             CAST(s2rx - nx * (nx + 1) - nx * ny
                  AS DECIMAL(38,0)) AS a
      FROM s
    )
    SELECT CAST(nx AS BIGINT) AS n_click,
           CAST(ny AS BIGINT) AS n_purchase,
           CAST(u2x AS DOUBLE) / 2.0 AS u_click,
           ROUND(CAST(a AS DOUBLE)
                 / (2.0 * SQRT((CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)
                                / 12.0)
                   * ((CAST(nx + ny AS DOUBLE) + 1.0)
                      - CAST(t_ties AS DOUBLE)
                        / (CAST(nx + ny AS DOUBLE)
                           * (CAST(nx + ny AS DOUBLE) - 1.0))))),
                 9) AS z_score,
           ROUND(-CAST(a AS DOUBLE)
                 / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)),
                 9) AS rank_biserial
    FROM u
    """,
    description="Mann-Whitney U test (click vs purchase event values):"
    " doubled midranks via the two-pass distributed prefix sum, exact "
    "DECIMAL rank sums and tie term, normal-approx z with tie "
    "correction, rank-biserial effect size",
)
def profile_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    pool = e.filter(
        F.col("event_type").isin("click", "purchase")
    ).select(
        F.col("value").alias("v"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias(
            "is_x"
        ),
    )
    cells = pool.groupBy("v").agg(
        F.sum("is_x").cast("long").alias("cx"),
        F.count(F.lit(1)).alias("c"),
    )
    cells = distributed_prefix_sum(
        cells, ["v"], "c", out_col="cb", exclusive=True
    )
    ranked = cells.select(
        "cx",
        "c",
        (F.lit(2) * F.col("cb").cast("long") + F.col("c") + F.lit(1)).alias(
            "r2"
        ),
    )
    cd = F.col("c").cast(_DEC)
    s = ranked.agg(
        F.sum("cx").cast(_DEC).alias("nx"),
        F.sum(F.col("c") - F.col("cx")).cast(_DEC).alias("ny"),
        F.sum(F.col("cx").cast(_DEC) * F.col("r2").cast(_DEC))
        .cast(_DEC)
        .alias("s2rx"),
        F.sum(cd * cd * cd - cd).cast(_DEC).alias("t_ties"),
    )
    u = s.select(
        "nx",
        "ny",
        "t_ties",
        (F.col("s2rx") - F.col("nx") * (F.col("nx") + 1))
        .cast(_DEC)
        .alias("u2x"),
        (
            F.col("s2rx")
            - F.col("nx") * (F.col("nx") + 1)
            - F.col("nx") * F.col("ny")
        )
        .cast(_DEC)
        .alias("a"),
    )
    nxd = F.col("nx").cast("double")
    nyd = F.col("ny").cast("double")
    nd = (F.col("nx") + F.col("ny")).cast("double")
    td = F.col("t_ties").cast("double")
    ad = F.col("a").cast("double")
    return u.select(
        F.col("nx").cast("long").alias("n_click"),
        F.col("ny").cast("long").alias("n_purchase"),
        (F.col("u2x").cast("double") / F.lit(2.0)).alias("u_click"),
        F.round(
            ad
            / (
                F.lit(2.0)
                * F.sqrt(
                    (nxd * nyd / F.lit(12.0))
                    * (
                        (nd + F.lit(1.0))
                        - td / (nd * (nd - F.lit(1.0)))
                    )
                )
            ),
            9,
        ).alias("z_score"),
        F.round(-ad / (nxd * nyd), 9).alias("rank_biserial"),
    )


@register(
    "profile_kruskal_wallis",
    # Kruskal-Wallis H across ALL FIVE event types — the k-group
    # generalization of Mann-Whitney (textbook: Kruskal & Wallis
    # 1952), with the standard tie correction H' = H/(1 - ΣT/(n³-n)).
    # Pooled midranks come from value cells + the two-pass prefix sum;
    # per-group doubled rank sums R2_g = Σ c_g·r2 stay exact DECIMAL.
    # Σ_g R_g²/n_g squares R2_g in DOUBLE (R2_g² reaches ~4e48 at
    # 1e12 rows — past any decimal width; double keeps it
    # deterministic, and exact below 2^53) and folds the ≤5 group
    # terms in event_type order with the pinned ordered fold (Spark
    # aggregate over a sorted array == DuckDB list_reduce; 0.0-seed
    # == first-element-seed). ROUND 9 on H and H'.
    oracle="""
    WITH vc AS (
      SELECT value AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY value
    ), ranked AS (
      SELECT v, c,
             2 * CAST(COALESCE(SUM(c) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS BIGINT) + c + 1 AS r2
      FROM vc
    ), gv AS (
      SELECT event_type AS g, value AS v, CAST(COUNT(*) AS BIGINT) AS cg
      FROM events GROUP BY event_type, value
    ), per_g AS (
      SELECT g,
             CAST(SUM(cg) AS DECIMAL(38,0)) AS ng,
             CAST(SUM(CAST(cg AS DECIMAL(38,0))
                      * CAST(r2 AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS r2g
      FROM gv JOIN ranked USING (v) GROUP BY g
    ), tie AS (
      SELECT CAST(SUM(CAST(c AS DECIMAL(38,0))
                      * CAST(c AS DECIMAL(38,0))
                      * CAST(c AS DECIMAL(38,0))
                      - CAST(c AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS t_ties
      FROM ranked
    ), folded AS (
      SELECT CAST(SUM(CAST(ng AS BIGINT)) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             LIST_REDUCE(
               LIST(CAST(r2g AS DOUBLE) * CAST(r2g AS DOUBLE)
                    / (4.0 * CAST(ng AS DOUBLE)) ORDER BY g),
               (a, x) -> a + x) AS s_rank
      FROM per_g
    ), h AS (
      SELECT n_rows, n_groups,
             12.0 / (CAST(n_rows AS DOUBLE)
                     * (CAST(n_rows AS DOUBLE) + 1.0)) * s_rank
             - 3.0 * (CAST(n_rows AS DOUBLE) + 1.0) AS h_raw,
             (SELECT t_ties FROM tie) AS t_ties
      FROM folded
    )
    SELECT n_rows, n_groups,
           ROUND(h_raw, 9) AS h_statistic,
           ROUND(h_raw / (1.0 - CAST(t_ties AS DOUBLE)
                 / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)
                    * CAST(n_rows AS DOUBLE)
                    - CAST(n_rows AS DOUBLE))), 9) AS h_tie_corrected
    FROM h
    """,
    description="Kruskal-Wallis H across the five event types: pooled "
    "two-pass midranks, exact DECIMAL per-group rank sums, ordered "
    "double fold of the <=5 group terms, tie-corrected H; the k-group "
    "nonparametric ANOVA",
)
def profile_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    cells = _value_cells(e, "value")
    ranked = _doubled_midrank_from_cells(cells)
    gv = e.groupBy(
        F.col("event_type").alias("g"), F.col("value").alias("v")
    ).agg(F.count(F.lit(1)).alias("cg"))
    per_g = (
        gv.join(ranked.select("v", "r2"), "v")
        .groupBy("g")
        .agg(
            F.sum("cg").cast(_DEC).alias("ng"),
            F.sum(F.col("cg").cast(_DEC) * F.col("r2").cast(_DEC))
            .cast(_DEC)
            .alias("r2g"),
        )
    )
    # tie term needs only the pre-rank (v, c) cell counts — computing
    # it from `ranked` would drag the whole prefix-sum pipeline (range
    # sample, persist, local+carry windows, join) into this branch
    cd = F.col("c").cast(_DEC)
    tie = cells.agg(
        F.sum(cd * cd * cd - cd).cast(_DEC).alias("t_ties")
    )
    term = F.struct(
        F.col("g").alias("g"),
        (
            F.col("r2g").cast("double")
            * F.col("r2g").cast("double")
            / (F.lit(4.0) * F.col("ng").cast("double"))
        ).alias("term"),
    )
    folded = per_g.agg(
        F.sum(F.col("ng").cast("long")).cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.aggregate(
            F.array_sort(F.collect_list(term)),
            F.lit(0.0),
            lambda a, x: a + x["term"],
        ).alias("s_rank"),
    )
    nd = F.col("n_rows").cast("double")
    h_raw = (
        F.lit(12.0) / (nd * (nd + F.lit(1.0))) * F.col("s_rank")
        - F.lit(3.0) * (nd + F.lit(1.0))
    )
    h = folded.crossJoin(F.broadcast(tie)).select(
        "n_rows", "n_groups", h_raw.alias("h_raw"), "t_ties"
    )
    td = F.col("t_ties").cast("double")
    nd2 = F.col("n_rows").cast("double")
    return h.select(
        "n_rows",
        "n_groups",
        F.round(F.col("h_raw"), 9).alias("h_statistic"),
        F.round(
            F.col("h_raw")
            / (F.lit(1.0) - td / (nd2 * nd2 * nd2 - nd2)),
            9,
        ).alias("h_tie_corrected"),
    )


@register(
    "profile_weighted_median",
    # Quantity-weighted median of l_extendedprice per return flag —
    # the weighted order statistic (lower weighted median convention:
    # the smallest value whose cumulative weight reaches half the
    # total). Weights are exact DECIMAL(38,6) sums of l_quantity per
    # (flag, price) cell; the per-flag cumulative weight is the
    # GROUPED two-pass prefix sum (partition_by) — three giant groups
    # is precisely the shape where PARTITION BY hands each group to
    # one task, the few-giant-groups trap. The median condition
    # 2·cum >= total is exact decimal arithmetic; no rounding anywhere
    # (the output is an input value).
    oracle="""
    WITH cells AS (
      SELECT l_returnflag AS flag, l_extendedprice AS price,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                  AS DECIMAL(38,6)) AS w,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1, 2
    ), cum AS (
      SELECT flag, price, w, n,
             CAST(SUM(w) OVER (PARTITION BY flag ORDER BY price
                   ROWS UNBOUNDED PRECEDING) AS DECIMAL(38,6)) AS cw
      FROM cells
    ), tot AS (
      SELECT flag,
             CAST(SUM(w) AS DECIMAL(38,6)) AS total_w,
             CAST(SUM(n) AS BIGINT) AS n_rows
      FROM cells GROUP BY flag
    )
    SELECT c.flag AS l_returnflag, t.n_rows,
           CAST(t.total_w AS DOUBLE) AS total_weight,
           MIN(c.price) AS weighted_median
    FROM cum c JOIN tot t ON c.flag = t.flag
    WHERE 2 * c.cw >= t.total_w
    GROUP BY c.flag, t.n_rows, t.total_w
    ORDER BY l_returnflag
    """,
    description="quantity-weighted median price per return flag via "
    "the GROUPED two-pass prefix sum (three giant groups — the "
    "PARTITION-BY-hands-one-task shape), exact DECIMAL weights, "
    "2*cum>=total pick",
)
def profile_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
    ).agg(
        F.sum(F.col("l_quantity").cast("decimal(38,6)"))
        .cast("decimal(38,6)")
        .alias("w"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    cum = distributed_prefix_sum(
        cells, ["price"], "w", out_col="cw", partition_by=["flag"]
    )
    tot = cells.groupBy("flag").agg(
        F.sum("w").cast("decimal(38,6)").alias("total_w"),
        F.sum("n").cast("long").alias("n_rows"),
    )
    return (
        cum.join(F.broadcast(tot), "flag")
        .filter(F.lit(2) * F.col("cw") >= F.col("total_w"))
        .groupBy("flag", "n_rows", "total_w")
        .agg(F.min("price").alias("weighted_median"))
        .select(
            F.col("flag").alias("l_returnflag"),
            "n_rows",
            F.col("total_w").cast("double").alias("total_weight"),
            "weighted_median",
        )
        .orderBy("l_returnflag")
    )


@register(
    "window_lorenz_deciles",
    # Lorenz curve of customer lifetime value at decile grain — the
    # inequality profile behind the Gini coefficient
    # (profile_gini's where-is-the-mass companion): customers ranked
    # by DECIMAL monetary into exact NTILE(10) deciles via the
    # distributed closed form (customer cells scale with the corpus —
    # the RFM lesson), then per-decile revenue share and cumulative
    # share. The only window left is over the TEN decile rows
    # (bounded by construction). Shares are pinned divisions, ROUND 9;
    # revenue displays as ROUND-2-then-cast (the pareto convention).
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                  AS DECIMAL(38,6)) AS monetary
      FROM orders GROUP BY o_custkey
    ), tiled AS (
      SELECT monetary,
             CAST(NTILE(10) OVER (ORDER BY monetary, o_custkey)
                  AS BIGINT) AS decile
      FROM cust
    ), cell AS (
      SELECT decile,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(monetary) AS DECIMAL(38,6)) AS rev
      FROM tiled GROUP BY decile
    )
    SELECT decile, n_customers,
           CAST(ROUND(rev, 2) AS DOUBLE) AS decile_revenue,
           ROUND(CAST(rev AS DOUBLE)
                 / CAST(SUM(rev) OVER () AS DOUBLE), 9) AS share,
           ROUND(CAST(SUM(rev) OVER (ORDER BY decile
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / CAST(SUM(rev) OVER () AS DOUBLE), 9) AS cum_share
    FROM cell ORDER BY decile
    """,
    description="Lorenz curve at decile grain: distributed NTILE(10) "
    "over customer monetary cells, per-decile revenue share + "
    "cumulative share (window only over the ten decile rows); the "
    "Gini companion",
)
def window_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .cast("decimal(38,6)")
        .alias("monetary")
    )
    tiled = distributed_ntile(
        cust,
        [F.asc("monetary"), F.asc("o_custkey")],
        10,
        out_col="decile",
    )
    cell = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("monetary").cast("decimal(38,6)").alias("rev"),
    )
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return cell.select(
        "decile",
        "n_customers",
        F.round(F.col("rev"), 2).cast("double").alias("decile_revenue"),
        F.round(
            F.col("rev").cast("double")
            / F.sum("rev").over(w_all).cast("double"),
            9,
        ).alias("share"),
        F.round(
            F.sum("rev").over(w_cum).cast("double")
            / F.sum("rev").over(w_all).cast("double"),
            9,
        ).alias("cum_share"),
    ).orderBy("decile")


@register(
    "events_kaplan_meier",
    # Kaplan-Meier time-to-conversion survival — the product-limit
    # estimator (Kaplan & Meier 1958) on the first-click →
    # first-purchase duration: the survival curve S(t) is the fraction
    # of clicking users NOT yet converted t hours after their first
    # click, with users who never purchase after their first click
    # CENSORED at the corpus end (observation stopped, not
    # non-conversion — the censoring KM exists for; the conversion-
    # latency percentiles ignore those users entirely). Durations are
    # exact integer hours (µs DIV). Risk set n(t) = users with
    # duration >= t comes from the total minus the two-pass exclusive
    # prefix sum over duration-hour cells; S(t) =
    # prod_{t'<=t, events>0} (1 - d/n). The product is the pinned
    # ordered fold over the (bounded: corpus-duration-in-hours) death
    # cells — each ratio is one IEEE division, the multiply chain is
    # identical on both engines (Spark `aggregate` seeded 1.0 over a
    # t-sorted array == DuckDB list_reduce seeded by the first
    # element, since 1.0*x == x). ROUND 9 on display.
    oracle="""
    WITH anchor AS (
      SELECT MAX(ts) AS maxt FROM events
    ), c AS (
      SELECT user_id, MIN(ts) AS fc
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ), p AS (
      SELECT c.user_id, MIN(e.ts) AS fp
      FROM c JOIN events e
        ON e.user_id = c.user_id
       AND e.event_type = 'purchase' AND e.ts >= c.fc
      GROUP BY c.user_id
    ), users AS (
      SELECT c.user_id,
             CAST(CASE WHEN p.fp IS NOT NULL
                  THEN (EPOCH_US(p.fp) - EPOCH_US(c.fc)) // 3600000000
                  ELSE (EPOCH_US((SELECT maxt FROM anchor))
                        - EPOCH_US(c.fc)) // 3600000000
                  END AS BIGINT) AS t_hours,
             CASE WHEN p.fp IS NULL THEN 1 ELSE 0 END AS censored
      FROM c LEFT JOIN p ON c.user_id = p.user_id
    ), cells AS (
      SELECT t_hours AS t,
             CAST(SUM(1 - censored) AS BIGINT) AS d,
             CAST(SUM(censored) AS BIGINT) AS cens
      FROM users GROUP BY t_hours
    ), risk AS (
      SELECT t, d, cens,
             CAST((SELECT COUNT(*) FROM users) AS BIGINT)
             - CAST(COALESCE(SUM(d + cens) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS BIGINT) AS n_risk
      FROM cells
    ), dcells AS (
      SELECT t, d, cens, n_risk,
             1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS ratio
      FROM risk WHERE d > 0
    ), arr AS (
      SELECT LIST(struct_pack(t := t, r := ratio) ORDER BY t) AS a
      FROM dcells
    )
    SELECT c.t AS t_hours, c.n_risk, c.d AS d_converted,
           c.cens AS n_censored,
           ROUND(LIST_REDUCE(
                   LIST_TRANSFORM(LIST_FILTER(a, x -> x.t <= c.t),
                                  x -> x.r),
                   (p, q) -> p * q), 9) AS survival
    FROM dcells c, arr ORDER BY t_hours
    """,
    description="Kaplan-Meier time-to-conversion survival (first "
    "click to first purchase, hour grain, never-converting users "
    "censored at corpus end): two-pass risk sets over duration "
    "cells, pinned ordered-fold product-limit estimator",
)
def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    anchor = e.agg(F.max("ts").alias("maxt"))
    c = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fc"))
    )
    # AQE-planned join (first-clicks are per-user, corpus-scaled —
    # the conversion_latency convention: never a forced broadcast)
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("fc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp"))
    )
    hours = lambda a, b: F.expr(  # noqa: E731
        f"(unix_micros({a}) - unix_micros({b})) DIV 3600000000"
    ).cast("long")
    users = (
        c.join(p, "user_id", "left")
        .crossJoin(F.broadcast(anchor))
        .select(
            F.when(F.col("fp").isNotNull(), hours("fp", "fc"))
            .otherwise(hours("maxt", "fc"))
            .alias("t_hours"),
            F.when(F.col("fp").isNull(), 1).otherwise(0).alias(
                "censored"
            ),
        )
    )
    from ..functions.dedup import _scoped_persist

    cells = _scoped_persist(
        users.groupBy(F.col("t_hours").alias("t")).agg(
            F.sum(1 - F.col("censored")).cast("long").alias("d"),
            F.sum("censored").cast("long").alias("cens"),
        )
    )
    # risk set: total clicking users minus everyone whose duration
    # ended before t — the exclusive prefix sum of (d + cens) over
    # duration-hour cells. Hour cells are bounded by corpus duration,
    # but the SAME primitive costs nothing extra and keeps the
    # module's invariant: no unpartitioned window anywhere.
    pre = distributed_prefix_sum(
        cells.withColumn("ended", F.col("d") + F.col("cens")),
        ["t"],
        "ended",
        out_col="ended_before",
        exclusive=True,
    )
    total = users.agg(F.count(F.lit(1)).cast("long").alias("__total"))
    risk = pre.crossJoin(F.broadcast(total)).select(
        "t",
        "d",
        "cens",
        (F.col("__total") - F.col("ended_before").cast("long")).alias(
            "n_risk"
        ),
    )
    dcells = risk.filter(F.col("d") > 0).select(
        "t",
        "d",
        "cens",
        "n_risk",
        (
            F.lit(1.0)
            - F.col("d").cast("double") / F.col("n_risk").cast("double")
        ).alias("ratio"),
    )
    arr = dcells.agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col("t").alias("t"), F.col("ratio").alias("r"))
            )
        ).alias("a")
    )
    return (
        dcells.crossJoin(F.broadcast(arr))
        .select(
            F.col("t").alias("t_hours"),
            "n_risk",
            F.col("d").alias("d_converted"),
            F.col("cens").alias("n_censored"),
            F.round(
                F.aggregate(
                    F.filter(
                        F.col("a"), lambda x: x["t"] <= F.col("t")
                    ),
                    F.lit(1.0),
                    lambda acc, x: acc * x["r"],
                ),
                9,
            ).alias("survival"),
        )
        .orderBy("t_hours")
    )


@register(
    "events_interarrival",
    # Inter-arrival time profile per event type — the traffic-model
    # operator (exponential-fit input, capacity planning): for each
    # consecutive same-user same-type event pair, the exact-µs gap;
    # per type, the count, mean, and pinned-interpolated p50/p95. The
    # lag runs in per-(user, type) windows (bounded per user); the
    # percentile indexes come from gap-µs cells + the GROUPED two-pass
    # prefix sum (five giant groups — the weighted-median shape). Gap
    # arithmetic is exact integer µs; the mean and the interpolation
    # are pinned double expressions scaled to seconds in one division,
    # ROUND 6.
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id) AS gap_us
      FROM events
    ), g AS (
      SELECT event_type, gap_us FROM gaps WHERE gap_us IS NOT NULL
    ), r AS (
      SELECT event_type, gap_us,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY gap_us) - 1 AS i,
             CAST(COUNT(*) OVER (PARTITION BY event_type) - 1
                  AS DOUBLE) AS nm1
      FROM g
    ), q AS (
      SELECT event_type,
             (MIN(CASE WHEN i = CAST(FLOOR(nm1 * 0.5) AS BIGINT)
                       THEN gap_us END)
              + (MAX(CASE WHEN i = CAST(CEIL(nm1 * 0.5) AS BIGINT)
                          THEN gap_us END)
                 - MIN(CASE WHEN i = CAST(FLOOR(nm1 * 0.5) AS BIGINT)
                            THEN gap_us END))
                * (MIN(nm1 * 0.5) - FLOOR(MIN(nm1 * 0.5))))
               / 1000000.0 AS p50_s,
             (MIN(CASE WHEN i = CAST(FLOOR(nm1 * 0.95) AS BIGINT)
                       THEN gap_us END)
              + (MAX(CASE WHEN i = CAST(CEIL(nm1 * 0.95) AS BIGINT)
                          THEN gap_us END)
                 - MIN(CASE WHEN i = CAST(FLOOR(nm1 * 0.95) AS BIGINT)
                            THEN gap_us END))
                * (MIN(nm1 * 0.95) - FLOOR(MIN(nm1 * 0.95))))
               / 1000000.0 AS p95_s
      FROM r
      WHERE i IN (CAST(FLOOR(nm1 * 0.5) AS BIGINT),
                  CAST(CEIL(nm1 * 0.5) AS BIGINT),
                  CAST(FLOOR(nm1 * 0.95) AS BIGINT),
                  CAST(CEIL(nm1 * 0.95) AS BIGINT))
      GROUP BY event_type
    ), m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_gaps,
             CAST(SUM(CAST(gap_us AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS sum_us
      FROM g GROUP BY event_type
    )
    SELECT m.event_type, m.n_gaps,
           ROUND(CAST(m.sum_us AS DOUBLE) / CAST(m.n_gaps AS DOUBLE)
                 / 1000000.0, 6) AS mean_gap_s,
           ROUND(q.p50_s, 6) AS p50_s,
           ROUND(q.p95_s, 6) AS p95_s
    FROM m JOIN q ON m.event_type = q.event_type
    ORDER BY m.event_type
    """,
    description="per-type inter-arrival profile: exact-us gaps from "
    "per-(user,type) lag windows, mean + pinned p50/p95 via gap cells "
    "and the grouped two-pass prefix sum; the traffic-model operator",
)
def events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w_lag = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    gap = F.unix_micros(F.col("ts")) - F.lag(
        F.unix_micros(F.col("ts"))
    ).over(w_lag)
    g = (
        e.select("event_type", gap.alias("gap_us"))
        .filter(F.col("gap_us").isNotNull())
    )
    from ..functions.dedup import _scoped_persist

    g = _scoped_persist(g)
    cells = g.groupBy("event_type", "gap_us").agg(
        F.count(F.lit(1)).alias("c")
    )
    cells = distributed_prefix_sum(
        cells,
        ["gap_us"],
        "c",
        out_col="cb",
        exclusive=True,
        partition_by=["event_type"],
    )
    m = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum(F.col("gap_us").cast(_DEC)).cast(_DEC).alias("sum_us"),
    )
    r = cells.join(
        F.broadcast(m.select("event_type", "n_gaps")), "event_type"
    ).withColumn("nm1", (F.col("n_gaps") - 1).cast("double"))

    def covers(k):
        idx = k.cast("long")
        return (F.col("cb") <= idx) & (idx < F.col("cb") + F.col("c"))

    def interp(q: float):
        k = F.col("nm1") * F.lit(q)
        lo = F.min(F.when(covers(F.floor(k)), F.col("gap_us")))
        hi = F.max(F.when(covers(F.ceil(k)), F.col("gap_us")))
        return (
            lo + (hi - lo) * (F.min(k) - F.floor(F.min(k)))
        ) / F.lit(1000000.0)

    k50 = F.col("nm1") * F.lit(0.5)
    k95 = F.col("nm1") * F.lit(0.95)
    hits = r.filter(
        covers(F.floor(k50))
        | covers(F.ceil(k50))
        | covers(F.floor(k95))
        | covers(F.ceil(k95))
    )
    q = hits.groupBy("event_type").agg(
        F.round(interp(0.5), 6).alias("p50_s"),
        F.round(interp(0.95), 6).alias("p95_s"),
    )
    return (
        m.join(q, "event_type")
        .select(
            "event_type",
            "n_gaps",
            F.round(
                F.col("sum_us").cast("double")
                / F.col("n_gaps").cast("double")
                / F.lit(1000000.0),
                6,
            ).alias("mean_gap_s"),
            "p50_s",
            "p95_s",
        )
        .orderBy("event_type")
    )


@register(
    "agg_association_rules",
    # Association rules over order baskets (Agrawal et al. 1993 —
    # support / confidence / lift), the market-basket companion of
    # agg_frequent_itemsets: item = part, basket = order. Pair
    # candidates come from the ONLY scalable generator — the basket-
    # keyed self-join (work = sum of C(items_per_basket, 2), never
    # parts²) — aggregated to pair cells, floored at pair count >= 3,
    # top-20 by (lift DESC, part keys). Counts are exact integers;
    # lift/confidence/support are pinned double expressions (counts
    # cast to double BEFORE multiplying — c_ab * N overflows int64
    # past ~1e10 baskets), ROUND 9.
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
      FROM lineitem
    ), n AS (
      SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_baskets
      FROM items
    ), ic AS (
      SELECT pk, CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY pk
    ), pairs AS (
      SELECT a.pk AS pa, b.pk AS pb, CAST(COUNT(*) AS BIGINT) AS cab
      FROM items a JOIN items b
        ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY a.pk, b.pk
      HAVING COUNT(*) >= 3
    )
    SELECT pa AS part_a, pb AS part_b, cab AS n_pairs,
           ROUND(CAST(cab AS DOUBLE) / CAST(n_baskets AS DOUBLE), 9)
             AS support,
           ROUND(CAST(cab AS DOUBLE) / CAST(ia.c AS DOUBLE), 9)
             AS conf_a_to_b,
           ROUND(CAST(cab AS DOUBLE) / CAST(ib.c AS DOUBLE), 9)
             AS conf_b_to_a,
           ROUND((CAST(cab AS DOUBLE) * CAST(n_baskets AS DOUBLE))
                 / (CAST(ia.c AS DOUBLE) * CAST(ib.c AS DOUBLE)), 9)
             AS lift
    FROM pairs
    JOIN ic ia ON pa = ia.pk
    JOIN ic ib ON pb = ib.pk
    CROSS JOIN n
    ORDER BY lift DESC, part_a, part_b LIMIT 20
    """,
    description="association rules over order baskets: basket-keyed "
    "pair generation, support floor 3, confidence both directions, "
    "lift with double-interior products; top-20 by lift",
)
def agg_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    from ..functions.dedup import _scoped_persist

    items = _scoped_persist(
        li.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
        ).distinct()
    )
    n = items.agg(
        F.countDistinct("ok").cast("long").alias("n_baskets")
    )
    ic = items.groupBy("pk").agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = items.alias("a")
    b = items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.pk") < F.col("b.pk")),
        )
        .groupBy(F.col("a.pk").alias("pa"), F.col("b.pk").alias("pb"))
        .agg(F.count(F.lit(1)).cast("long").alias("cab"))
        .filter(F.col("cab") >= 3)
    )
    ia = ic.select(F.col("pk").alias("pa"), F.col("c").alias("ca"))
    ib = ic.select(F.col("pk").alias("pb"), F.col("c").alias("cb"))
    cabd = F.col("cab").cast("double")
    nd = F.col("n_baskets").cast("double")
    cad = F.col("ca").cast("double")
    cbd = F.col("cb").cast("double")
    return (
        pairs.join(ia, "pa")
        .join(ib, "pb")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            F.col("cab").alias("n_pairs"),
            F.round(cabd / nd, 9).alias("support"),
            F.round(cabd / cad, 9).alias("conf_a_to_b"),
            F.round(cabd / cbd, 9).alias("conf_b_to_a"),
            F.round((cabd * nd) / (cad * cbd), 9).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(20)
    )


@register(
    "events_cohort_ltv",
    # Cohort LTV curve — events_retention's value-weighted companion
    # (the growth-analytics pair: retention answers "do they come
    # back", LTV answers "what are they worth over time"): per weekly
    # first-activity cohort and week offset, active users, the DECIMAL
    # value total, the running cumulative value, and cumulative value
    # per cohort user. The cumulative window runs over (cohort_week,
    # week_offset) CELLS — bounded by the corpus timespan squared in
    # weeks (a few hundred rows even at years of data), never by the
    # corpus. Exact integer/decimal folds; two pinned divisions,
    # display rounding decimal-first (the pareto convention).
    oracle="""
    WITH weeks AS (
      SELECT user_id, CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS w,
             CAST(value AS DECIMAL(38, 6)) AS v
      FROM events
    ), coh AS (
      SELECT user_id, MIN(w) AS cw FROM weeks GROUP BY 1
    ), sz AS (
      SELECT cw, CAST(COUNT(*) AS BIGINT) AS cohort_users
      FROM coh GROUP BY 1
    ), cell AS (
      SELECT c.cw AS cohort_week,
             CAST(DATE_DIFF('day', CAST(c.cw AS DATE),
                            CAST(w.w AS DATE)) / 7 AS INT)
               AS week_offset,
             CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_active,
             CAST(SUM(v) AS DECIMAL(38, 6)) AS value_sum
      FROM weeks w JOIN coh c USING (user_id) GROUP BY 1, 2
    ), cum AS (
      SELECT cohort_week, week_offset, n_active, value_sum,
             CAST(SUM(value_sum) OVER (PARTITION BY cohort_week
                   ORDER BY week_offset ROWS UNBOUNDED PRECEDING)
                  AS DECIMAL(38, 6)) AS cum_value
      FROM cell
    )
    SELECT cohort_week, week_offset, n_active,
           CAST(ROUND(value_sum, 2) AS DOUBLE) AS value_sum,
           CAST(ROUND(cum_value, 2) AS DOUBLE) AS cum_value,
           ROUND(CAST(cum_value AS DOUBLE)
                 / CAST(s.cohort_users AS DOUBLE), 6) AS ltv_per_user
    FROM cum JOIN sz s ON cum.cohort_week = s.cw
    ORDER BY cohort_week, week_offset
    """,
    description="weekly-cohort LTV curve: active users, DECIMAL value "
    "totals, cumulative value and per-user LTV by week offset — "
    "events_retention's value-weighted companion; windows only over "
    "(cohort, offset) cells",
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    weeks = e.select(
        "user_id",
        F.date_trunc("week", F.col("ts")).alias("w"),
        F.col("value").cast("decimal(38,6)").alias("v"),
    )
    coh = weeks.groupBy("user_id").agg(F.min("w").alias("cw"))
    sz = coh.groupBy("cw").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    cell = (
        weeks.join(coh, "user_id")
        .groupBy(
            F.col("cw").alias("cohort_week"),
            (
                F.datediff(F.col("w").cast("date"), F.col("cw").cast("date"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_active"),
            F.sum("v").cast("decimal(38,6)").alias("value_sum"),
        )
    )
    w_cum = (
        Window.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cell.select(
        "cohort_week",
        "week_offset",
        "n_active",
        "value_sum",
        F.sum("value_sum").over(w_cum).cast("decimal(38,6)").alias(
            "cum_value"
        ),
    )
    return (
        cum.join(
            F.broadcast(sz),
            cum.cohort_week == sz.cw,
        )
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            F.round(F.col("value_sum"), 2).cast("double").alias(
                "value_sum"
            ),
            F.round(F.col("cum_value"), 2).cast("double").alias(
                "cum_value"
            ),
            F.round(
                F.col("cum_value").cast("double")
                / F.col("cohort_users").cast("double"),
                6,
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# pinned CMS hash parameters: h_i(x) = ((a_i*x + b_i) mod p) mod w —
# pure int64 arithmetic both engines (a*x stays under 2^63 for any
# realistic key range: a <= 7e4, keys to ~1e14)
_CMS_P = 2147483647
_CMS_W = 1024
_CMS_PARAMS = [(0, 48271, 11), (1, 16807, 101), (2, 69621, 1009),
               (3, 40692, 10007)]


@register(
    "agg_count_min_sketch",
    # Count-Min sketch (Cormode & Muthukrishnan 2005) over part
    # frequencies — THE mergeable point-frequency sketch: d=4 pinned
    # universal-ish hash rows x w=1024 counters, estimate = min over
    # rows, one-sided error (never underestimates). Unlike the
    # engine-native HLL (agg_sketch_rollup, contract-gated because the
    # sketch bits differ per engine), THIS sketch is pinned integer
    # arithmetic end to end — both engines build the identical 4096
    # counters and the oracle matches bit-exactly, overestimates
    # included. Scale: the build is ONE map-side-combinable aggregate
    # into <= d*w cells regardless of corpus size (the pre-aggregate-
    # and-merge pattern: per-partition sketches sum); the probe joins
    # the top-10 exact keys against the broadcast-sized sketch.
    oracle="""
    WITH params(i, a, b) AS (
      VALUES (0, 48271, 11), (1, 16807, 101), (2, 69621, 1009),
             (3, 40692, 10007)
    ), pk AS (
      SELECT l_partkey AS x FROM lineitem
    ), sketch AS (
      SELECT i, ((a * x + b) % 2147483647) % 1024 AS col,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM pk CROSS JOIN params GROUP BY 1, 2
    ), exact AS (
      SELECT x, CAST(COUNT(*) AS BIGINT) AS exact_count
      FROM pk GROUP BY x ORDER BY exact_count DESC, x LIMIT 10
    ), est AS (
      SELECT e.x, e.exact_count,
             CAST(MIN(s.c) AS BIGINT) AS cms_estimate
      FROM exact e CROSS JOIN params p
      JOIN sketch s
        ON s.i = p.i
       AND s.col = ((p.a * e.x + p.b) % 2147483647) % 1024
      GROUP BY e.x, e.exact_count
    )
    SELECT x AS l_partkey, exact_count, cms_estimate,
           CAST(cms_estimate - exact_count AS BIGINT) AS overestimate
    FROM est ORDER BY exact_count DESC, l_partkey
    """,
    description="count-min sketch (d=4, w=1024, pinned integer "
    "hashes) over part frequencies: one combinable aggregate builds "
    "4096 counters at any corpus size; top-10 exact keys probed "
    "against the broadcast sketch — bit-exact cross-engine, "
    "one-sided overestimates reported",
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("x")
    )

    def h(a: int, b: int, x):
        return F.pmod(
            F.pmod(F.lit(a) * x + F.lit(b), F.lit(_CMS_P)), F.lit(_CMS_W)
        )

    hash_arr = F.array(
        *[h(a, b, F.col("x")) for (_, a, b) in _CMS_PARAMS]
    )
    cells = (
        li.select(F.posexplode(hash_arr).alias("i", "col"))
        .groupBy("i", "col")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    exact = (
        li.groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.asc("x"))
        .limit(10)
    )
    probes = exact.select(
        "x", "exact_count", F.posexplode(hash_arr).alias("i", "col")
    )
    est = (
        probes.join(F.broadcast(cells), ["i", "col"])
        .groupBy("x", "exact_count")
        .agg(F.min("c").cast("long").alias("cms_estimate"))
    )
    return est.select(
        F.col("x").alias("l_partkey"),
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count"))
        .cast("long")
        .alias("overestimate"),
    ).orderBy(F.desc("exact_count"), "l_partkey")


@register(
    "sample_neyman_allocation",
    # Neyman-optimal stratified sampling (Neyman 1934): a fixed
    # 1000-row budget allocated across the l_returnflag strata
    # proportional to N_h·S_h (stratum size x stddev of the surveyed
    # variable) — the variance-minimizing allocation every large-scale
    # eval-set builder should use instead of proportional quotas
    # (sample_stratified). Per-stratum stddev comes from exact DECIMAL
    # co-moments (price scaled /1000 per the r8 cast bound, sqrt is
    # IEEE-exact); the 3-term N·S normalizer folds in flag order
    # (pinned ordered fold). Allocation is FLOOR(budget·w_h/W) —
    # spends <= budget; remainder-seat policy is the caller's.
    # Selection inside each stratum is deterministic: rank by
    # (Lehmer mix of the (orderkey, linenumber) row key, key, PRICE)
    # via the GROUPED two-pass row number (three giant strata — a
    # PARTITION BY rank would hand each stratum to one task), keep
    # rank <= n_h. The synthetic data repeats (orderkey, linenumber),
    # so the row key alone is NOT total — the price tiebreak makes any
    # residual tie OUTPUT-invariant: tied rows carry equal price, so
    # whichever side of the allocation boundary each lands on, the
    # selected price multiset (and thus n_sampled and sample_mean) is
    # identical on both engines.
    # Output: per-stratum N, stddev, allocation, realized sample size
    # and sample mean — exact integers/decimals, ROUND 6 on libm-free
    # divisions.
    oracle="""
    WITH src AS (
      SELECT l_returnflag AS flag,
             l_extendedprice AS price,
             (l_orderkey * 8 + l_linenumber) AS rid
      FROM lineitem
    ), stats AS (
      SELECT flag,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(price / 1000 AS DECIMAL(38, 6)))
                  AS DECIMAL(38, 6)) AS sx,
             CAST(SUM(CAST(price / 1000 AS DECIMAL(38, 6))
                      * CAST(price / 1000 AS DECIMAL(38, 6)))
                  AS DECIMAL(38, 6)) AS sxx
      FROM src GROUP BY flag
    ), sd AS (
      SELECT flag, n_rows,
             SQRT((CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  / (CAST(n_rows AS DOUBLE)
                     * (CAST(n_rows AS DOUBLE) - 1.0))) * 1000.0
               AS stddev
      FROM stats
    ), wsum AS (
      SELECT LIST_REDUCE(
               LIST(CAST(n_rows AS DOUBLE) * stddev ORDER BY flag),
               (a, x) -> a + x) AS w_total
      FROM sd
    ), alloc AS (
      SELECT flag, n_rows, stddev,
             CAST(FLOOR(1000.0 * (CAST(n_rows AS DOUBLE) * stddev)
                        / w_total) AS BIGINT) AS n_alloc
      FROM sd, wsum
    ), ranked AS (
      SELECT s.flag, s.price,
             ROW_NUMBER() OVER (PARTITION BY s.flag
               ORDER BY (s.rid * 48271) % 2147483647, s.rid,
                        s.price) AS rn
      FROM src s
    ), sample_ AS (
      SELECT r.flag,
             CAST(COUNT(*) AS BIGINT) AS n_sampled,
             CAST(SUM(CAST(r.price AS DECIMAL(38, 6)))
                  AS DECIMAL(38, 6)) AS samp_sum
      FROM ranked r JOIN alloc a ON r.flag = a.flag
      WHERE r.rn <= a.n_alloc
      GROUP BY r.flag
    )
    SELECT a.flag AS l_returnflag, a.n_rows,
           ROUND(a.stddev, 6) AS stddev,
           a.n_alloc, s.n_sampled,
           ROUND(CAST(s.samp_sum AS DOUBLE)
                 / CAST(s.n_sampled AS DOUBLE), 6) AS sample_mean
    FROM alloc a JOIN sample_ s ON a.flag = s.flag
    ORDER BY l_returnflag
    """,
    description="Neyman-allocation stratified sample (budget 1000, "
    "allocation proportional to stratum size x stddev): exact DECIMAL "
    "co-moment stddevs, pinned allocation, deterministic Lehmer-mix "
    "selection via the grouped two-pass rank; per-stratum summary",
)
def sample_neyman_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    src = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_extendedprice").alias("price"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("rid"),
    )
    from ..functions.dedup import _scoped_persist

    src = _scoped_persist(src)
    ps = (F.col("price") / 1000).cast("decimal(38,6)")
    stats = src.groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(ps).cast("decimal(38,6)").alias("sx"),
        F.sum(ps * ps).cast("decimal(38,6)").alias("sxx"),
    )
    nd = F.col("n_rows").cast("double")
    sd = stats.select(
        "flag",
        "n_rows",
        (
            F.sqrt(
                (
                    nd * F.col("sxx").cast("double")
                    - F.col("sx").cast("double")
                    * F.col("sx").cast("double")
                )
                / (nd * (nd - F.lit(1.0)))
            )
            * F.lit(1000.0)
        ).alias("stddev"),
    )
    wsum = sd.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("flag").alias("flag"),
                        (F.col("n_rows").cast("double") * F.col("stddev"))
                        .alias("w"),
                    )
                )
            ),
            F.lit(0.0),
            lambda a, x: a + x["w"],
        ).alias("w_total")
    )
    alloc = sd.crossJoin(F.broadcast(wsum)).select(
        "flag",
        "n_rows",
        "stddev",
        F.floor(
            F.lit(1000.0)
            * (F.col("n_rows").cast("double") * F.col("stddev"))
            / F.col("w_total")
        )
        .cast("long")
        .alias("n_alloc"),
    )
    # deterministic per-stratum rank without a per-stratum single-task
    # sort: grouped two-pass row number over the Lehmer-mixed row key
    mixed = src.withColumn(
        "__mix", F.pmod(F.col("rid") * F.lit(48271), F.lit(2147483647))
    )
    ranked = distributed_prefix_sum(
        mixed.withColumn("__one", F.lit(1).cast("long")),
        [F.asc("__mix"), F.asc("rid"), F.asc("price")],
        "__one",
        out_col="rn",
        partition_by=["flag"],
    )
    sample_ = (
        ranked.join(
            F.broadcast(alloc.select("flag", "n_alloc")), "flag"
        )
        .filter(F.col("rn") <= F.col("n_alloc"))
        .groupBy("flag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sampled"),
            F.sum(F.col("price").cast("decimal(38,6)"))
            .cast("decimal(38,6)")
            .alias("samp_sum"),
        )
    )
    return (
        alloc.join(sample_, "flag")
        .select(
            F.col("flag").alias("l_returnflag"),
            "n_rows",
            F.round(F.col("stddev"), 6).alias("stddev"),
            "n_alloc",
            "n_sampled",
            F.round(
                F.col("samp_sum").cast("double")
                / F.col("n_sampled").cast("double"),
                6,
            ).alias("sample_mean"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_bloom_filter",
    # Bloom-filter membership (Bloom 1970) with pinned integer hashes —
    # the sketch family's membership member (count-min answers "how
    # many", HLL "how many distinct", Bloom "is it in the set"):
    # build a m=4096-bit / k=3 filter over the part keys with size >
    # 40, probe every distinct lineitem part key, and report the
    # measured false-positive behavior against exact membership. Both
    # the BUILD (distinct set bit positions — <= m cells however large
    # the key set) and the PROBE (per key, matched-position count ==
    # k) are pinned integer arithmetic, so the filter bits and every
    # individual false positive match the oracle exactly — the
    # engine-native bloom_filter_agg could only be contract-gated.
    # Scale: build is one combinable distinct into <= 4096 cells
    # (broadcastable at any corpus); probe is a hash join of probe-key
    # positions against those cells. The observed fp_rate row is the
    # standard (1-e^{-kn/m})^k regime check a pipeline uses to size m.
    oracle="""
    WITH params(i, a, b) AS (
      VALUES (0, 48271, 11), (1, 16807, 101), (2, 69621, 1009)
    ), keys AS (
      SELECT p_partkey AS x FROM part WHERE p_size > 40
    ), bits AS (
      SELECT DISTINCT i, ((a * x + b) % 2147483647) % 4096 AS pos
      FROM keys CROSS JOIN params
    ), probe AS (
      SELECT DISTINCT l_partkey AS x FROM lineitem
    ), hits AS (
      SELECT pr.x, CAST(COUNT(*) AS BIGINT) AS matched
      FROM probe pr CROSS JOIN params p
      JOIN bits b
        ON b.i = p.i
       AND b.pos = ((p.a * pr.x + p.b) % 2147483647) % 4096
      GROUP BY pr.x
    ), verdicts AS (
      SELECT pr.x,
             CASE WHEN COALESCE(h.matched, 0) = 3 THEN 1 ELSE 0 END
               AS bloom_positive,
             CASE WHEN k.x IS NOT NULL THEN 1 ELSE 0 END AS is_member
      FROM probe pr
      LEFT JOIN hits h ON pr.x = h.x
      LEFT JOIN keys k ON pr.x = k.x
    )
    SELECT CAST((SELECT COUNT(*) FROM keys) AS BIGINT) AS n_keys,
           CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS n_bits_set,
           CAST(COUNT(*) AS BIGINT) AS n_probed,
           CAST(SUM(is_member) AS BIGINT) AS n_members,
           CAST(SUM(bloom_positive) AS BIGINT) AS n_positive,
           CAST(SUM(bloom_positive) - SUM(is_member) AS BIGINT)
             AS n_false_positive,
           ROUND(CAST(SUM(bloom_positive) - SUM(is_member) AS DOUBLE)
                 / CAST(COUNT(*) - SUM(is_member) AS DOUBLE), 9)
             AS fp_rate
    FROM verdicts
    """,
    description="bloom-filter membership (m=4096, k=3, pinned integer "
    "hashes) over size>40 part keys probed by all lineitem part keys: "
    "bit-exact filter and false positives on both engines; build "
    "state <= m cells at any corpus size",
)
def agg_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    params = [(0, 48271, 11), (1, 16807, 101), (2, 69621, 1009)]

    def pos(a: int, b: int, x):
        return F.pmod(
            F.pmod(F.lit(a) * x + F.lit(b), F.lit(2147483647)),
            F.lit(4096),
        )

    keys = part.filter(F.col("p_size") > 40).select(
        F.col("p_partkey").alias("x")
    )
    from ..functions.dedup import _scoped_persist

    keys = _scoped_persist(keys)
    bits = (
        keys.select(
            F.posexplode(
                F.array(*[pos(a, b, F.col("x")) for (_, a, b) in params])
            ).alias("i", "pos")
        )
        .distinct()
    )
    probe = li.select(F.col("l_partkey").alias("x")).distinct()
    probe_pos = probe.select(
        "x",
        F.posexplode(
            F.array(*[pos(a, b, F.col("x")) for (_, a, b) in params])
        ).alias("i", "pos"),
    )
    hits = (
        probe_pos.join(F.broadcast(bits), ["i", "pos"])
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("long").alias("matched"))
    )
    verdicts = (
        probe.join(hits, "x", "left")
        .join(
            keys.withColumn("__m", F.lit(1)).select("x", "__m"),
            "x",
            "left",
        )
        .select(
            F.when(F.coalesce(F.col("matched"), F.lit(0)) == 3, 1)
            .otherwise(0)
            .alias("bloom_positive"),
            F.when(F.col("__m").isNotNull(), 1).otherwise(0).alias(
                "is_member"
            ),
        )
    )
    n_keys = keys.agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    n_bits = bits.agg(
        F.count(F.lit(1)).cast("long").alias("n_bits_set")
    )
    summary = verdicts.agg(
        F.count(F.lit(1)).cast("long").alias("n_probed"),
        F.sum("is_member").cast("long").alias("n_members"),
        F.sum("bloom_positive").cast("long").alias("n_positive"),
        (F.sum("bloom_positive") - F.sum("is_member"))
        .cast("long")
        .alias("n_false_positive"),
        F.round(
            (F.sum("bloom_positive") - F.sum("is_member")).cast("double")
            / (F.count(F.lit(1)) - F.sum("is_member")).cast("double"),
            9,
        ).alias("fp_rate"),
    )
    return (
        n_keys.crossJoin(F.broadcast(n_bits))
        .crossJoin(F.broadcast(summary))
        .select(
            "n_keys", "n_bits_set", "n_probed", "n_members",
            "n_positive", "n_false_positive", "fp_rate",
        )
    )


@register(
    "agg_quantile_sketch",
    # Mergeable approximate quantiles — the sketch family's order-
    # statistics member (VERDICT r12 #6: "p95 without a sort"), as a
    # bottom-k uniform-sample sketch (the KMV/bottom-k construction,
    # Cohen & Kaplan 2007; the mergeable-summaries framing is Agarwal
    # et al. 2013 — public textbook material). Each partition keeps
    # only the k=4096 rows with the smallest pinned Lehmer mix of the
    # row key — a constant-size heap, merged by keeping the bottom-k
    # of the union (exactly what Spark's TakeOrderedAndProject
    # executes: per-partition heaps, one bounded merge). The retained
    # rows are a uniform sample of the data, so the sample's own
    # p-quantile estimates the population's with rank error
    # O(sqrt(p(1-p)/k)) — the same state-bounded contract as
    # count-min/bloom, here for "what value sits at p95".
    #
    # Why not literal KLL/t-digest: their compactors are randomized
    # and partition-ORDER-dependent — no SQL oracle can reproduce the
    # exact sketch, so they could only be contract-gated. The bottom-k
    # sketch is a pure function of the data multiset under the pinned
    # hash: both engines materialize the identical sample, estimates,
    # and realized ranks, bit-exact — and it keeps the same
    # per-partition-state/merge/query execution shape.
    #
    # Determinism at the k boundary: (mix, rid) is not total (the
    # synthetic data repeats (orderkey, linenumber)), so price joins
    # the sort key — residual ties are full duplicates whose boundary
    # placement cannot change the sampled price multiset (the
    # sample_neyman_allocation lesson). Estimate convention: element
    # at index (p*(m-1)) DIV 100 of the value-sorted sample — integer
    # arithmetic, no double rounding at the index. The realized rank
    # of each estimate is then measured EXACTLY against the full data
    # (one conditional-count pass with a 4-row broadcast), and the
    # within_eps flag checks the pinned rank-error budget eps=0.05
    # (loose vs the ~0.003 sampling sd at k=4096 — regime check, not
    # a tail bound).
    oracle="""
    WITH src AS (
      SELECT l_extendedprice AS price,
             (l_orderkey * 8 + l_linenumber) AS rid
      FROM lineitem
    ), samp AS (
      SELECT price FROM src
      ORDER BY (rid * 48271) % 2147483647, rid, price
      LIMIT 4096
    ), arr AS (
      SELECT LIST(price ORDER BY price) AS a,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM samp
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM src
    ), ps(p_pct) AS (
      VALUES (CAST(50 AS BIGINT)), (90), (95), (99)
    ), est AS (
      SELECT p_pct, m,
             a[CAST((p_pct * (m - 1)) // 100 AS BIGINT) + 1] AS est_price
      FROM ps CROSS JOIN arr
    ), rk AS (
      SELECT e.p_pct, CAST(COUNT(*) AS BIGINT) AS n_le
      FROM est e JOIN src s ON s.price <= e.est_price
      GROUP BY e.p_pct
    )
    SELECT e.p_pct AS p_pct,
           e.m AS sketch_m,
           n.n_rows,
           e.est_price,
           ROUND(CAST(rk.n_le AS DOUBLE) / CAST(n.n_rows AS DOUBLE), 9)
             AS realized_q,
           ROUND(ABS(CAST(rk.n_le AS DOUBLE) / CAST(n.n_rows AS DOUBLE)
                     - CAST(e.p_pct AS DOUBLE) / 100.0), 9) AS rank_err,
           CASE WHEN ABS(CAST(rk.n_le AS DOUBLE)
                         / CAST(n.n_rows AS DOUBLE)
                         - CAST(e.p_pct AS DOUBLE) / 100.0) <= 0.05
                THEN 1 ELSE 0 END AS within_eps
    FROM est e CROSS JOIN n JOIN rk ON rk.p_pct = e.p_pct
    ORDER BY e.p_pct
    """,
    description="mergeable bottom-k quantile sketch (k=4096, pinned "
    "Lehmer-mix sampling) over l_extendedprice: per-partition heaps "
    "merged by TakeOrdered, p50/p90/p95/p99 estimated from the "
    "value-sorted sample, realized ranks measured exactly — constant "
    "sketch state at any corpus size; bit-exact on both engines",
)
def agg_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    src = li.select(
        F.col("l_extendedprice").alias("price"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("rid"),
    )
    from ..functions.dedup import _scoped_persist

    src = _scoped_persist(src)
    mix = F.pmod(F.col("rid") * F.lit(48271), F.lit(2147483647))
    # the sketch: bottom-k by the pinned hash — per-partition heaps +
    # one bounded merge (TakeOrderedAndProject; plan-pinned), never a
    # global sort of the data
    samp = (
        src.orderBy(mix.asc(), F.asc("rid"), F.asc("price"))
        .limit(_SKETCH_K)
        .select(F.col("price").alias("v"))
    )
    return bottomk_quantile_summary(
        samp, src.select(F.col("price").alias("v")), "est_price"
    )


@register(
    "agg_exp_histogram",
    # Exponential-histogram quantile sketch — the PURE-AGGREGATE member
    # of the sketch family (r13; the bottom-k sketch gives rank-error
    # quantiles via TakeOrdered, this gives RELATIVE-VALUE-error
    # quantiles via nothing but a groupBy). The DDSketch idea (Masson,
    # Rim & Lee, VLDB 2019: log-bucketed counters, relative-error
    # guarantee, trivially mergeable) made integer-exact: libm log()
    # differs in the last ulp across engines and a boundary-adjacent
    # value could land in different buckets, so the bucket key is pure
    # integer arithmetic — msb = bit-length of the price in cents
    # (length of the base-2 string on both engines), sub-bucket = the
    # top 5 bits. That is 16 log-spaced sub-buckets per octave: bucket
    # width / lower bound <= 1/16, so the midpoint estimate carries a
    # guaranteed <= ~3.1% relative error, engine-exact.
    #
    # Scale contract: the sketch state is the bucket-count map —
    # <= 16 cells per octave, ~64 octaves for any int64 domain (here
    # ~8: prices span 914..105k) — built by ONE combinable partial+
    # final aggregate; merge = count addition (the mergeable-sketch
    # property, map-side combine IS the merge). The quantile query
    # walks the <= 1024-cell frame with one bounded unpartitioned
    # window (value-domain-bounded, the KS-drift class in the SCALE.md
    # window audit). The realized rank bounds come FREE from the cums
    # (buckets partition the domain: count(x <= hi_b) == cum_b
    # exactly) — no second data pass.
    #
    # Cents via ROUND(price*100) on BOTH engines: the parquet price is
    # DOUBLE and a bare CAST truncates in Spark but rounds in DuckDB —
    # rounding first is engine-identical (no product lands exactly on
    # .5: doubles near cents values are off by <1e-6 ulps).
    oracle="""
    WITH src AS (
      SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
      FROM lineitem
      WHERE l_extendedprice > 0
    ), b AS (
      SELECT length(to_base(cents, 2)) AS msb,
             cents >> GREATEST(length(to_base(cents, 2)) - 5, 0) AS sub,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM src GROUP BY 1, 2
    ), cells AS (
      SELECT msb, sub, GREATEST(msb - 5, 0) AS sh, c,
             CAST(SUM(c) OVER (ORDER BY msb, sub
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM b
    ), n AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_buckets
      FROM b
    ), ps(p_pct) AS (
      VALUES (CAST(50 AS BIGINT)), (90), (95), (99)
    ), pick AS (
      SELECT p.p_pct,
             MIN_BY(struct_pack(
               lo := sub << sh,
               hi := ((sub + 1) << sh) - 1,
               c := c, cum := cum), cum) AS s
      FROM ps p
      CROSS JOIN n
      JOIN cells ON cells.cum >= (p.p_pct * n.n_rows + 99) // 100
      GROUP BY p.p_pct
    )
    SELECT k.p_pct AS p_pct, n.n_rows, n.n_buckets,
           CAST((k.s.lo + k.s.hi) // 2 AS BIGINT) AS est_cents,
           CAST(k.s.lo AS BIGINT) AS bucket_lo,
           CAST(k.s.hi AS BIGINT) AS bucket_hi,
           ROUND(CAST(k.s.cum - k.s.c AS DOUBLE)
                 / CAST(n.n_rows AS DOUBLE), 9) AS realized_lo,
           ROUND(CAST(k.s.cum AS DOUBLE)
                 / CAST(n.n_rows AS DOUBLE), 9) AS realized_hi,
           ROUND(CAST(k.s.hi - k.s.lo AS DOUBLE)
                 / CAST(k.s.lo AS DOUBLE), 9) AS rel_width
    FROM pick k CROSS JOIN n
    ORDER BY k.p_pct
    """,
    description="exponential-histogram quantile sketch (integer-exact "
    "DDSketch: bit-length octaves x 16 sub-buckets, <=3.1% relative "
    "error): one combinable aggregate builds the <=1024-cell state, "
    "counts merge by addition; p50/p90/p95/p99 with exact realized "
    "rank bounds read off the bucket cums — bit-exact on both engines",
)
def agg_exp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    src = li.filter(F.col("l_extendedprice") > 0).select(
        F.round(F.col("l_extendedprice") * 100, 0)
        .cast("long")
        .alias("cents")
    )
    b = (
        src.select(
            F.length(F.bin(F.col("cents"))).cast("int").alias("msb"),
            F.expr(
                "shiftright(cents, greatest("
                "length(bin(cents)) - 5, 0))"
            ).alias("sub"),
        )
        .groupBy("msb", "sub")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # bounded frame: <= 16 sub-buckets per octave, ~64 octaves max for
    # int64 — the unpartitioned window runs over <= 1024 cells by
    # construction (value-domain-bounded), never over the data
    w = Window.orderBy("msb", "sub").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cells = b.select(
        "msb",
        "sub",
        F.greatest(F.col("msb") - 5, F.lit(0)).alias("sh"),
        "c",
        F.sum("c").over(w).cast("long").alias("cum"),
    )
    n = b.agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )
    ps = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(p).cast("long") for p in (50, 90, 95, 99)])
        ).alias("p_pct")
    )
    cand = (
        cells.crossJoin(F.broadcast(ps))
        .crossJoin(F.broadcast(n))
        .filter(
            F.col("cum")
            >= F.expr("(p_pct * n_rows + 99) DIV 100")
        )
    )
    s = F.struct(
        F.expr("shiftleft(sub, sh)").alias("lo"),
        (F.expr("shiftleft(sub + 1, sh)") - 1).alias("hi"),
        F.col("c").alias("c"),
        F.col("cum").alias("cum"),
    )
    pick = cand.groupBy("p_pct").agg(
        F.min_by(s, F.col("cum")).alias("s")
    )
    return (
        pick.crossJoin(F.broadcast(n))
        .select(
            "p_pct",
            "n_rows",
            "n_buckets",
            F.expr("(s.lo + s.hi) DIV 2").cast("long").alias(
                "est_cents"
            ),
            F.col("s.lo").cast("long").alias("bucket_lo"),
            F.col("s.hi").cast("long").alias("bucket_hi"),
            F.round(
                (F.col("s.cum") - F.col("s.c")).cast("double")
                / F.col("n_rows").cast("double"),
                9,
            ).alias("realized_lo"),
            F.round(
                F.col("s.cum").cast("double")
                / F.col("n_rows").cast("double"),
                9,
            ).alias("realized_hi"),
            F.round(
                (F.col("s.hi") - F.col("s.lo")).cast("double")
                / F.col("s.lo").cast("double"),
                9,
            ).alias("rel_width"),
        )
        .orderBy("p_pct")
    )
