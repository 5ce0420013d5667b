"""Window-function operators (SURVEY.md §2 Part B "Window functions").

Determinism rules used throughout: any ROWS frame or row_number is ordered
by a *unique* composite key (ties would make results run-dependent and
unhashable); RANGE frames are allowed ties because the frame includes the
whole peer group. At scale every window here is one shuffle on its
partition key followed by a per-partition sort — no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from aind_data_transformation_spark.io.sources import load_table
from aind_data_transformation_spark.ops import attach_broadcast, series_row_number
from aind_data_transformation_spark.queries.numeric import cents


def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank over a ties-heavy key (order year) + row_number over
    a unique tiebroken key."""
    o = load_table(spark, sf_dir, "orders")
    o = o.withColumn("order_year", F.year("o_orderdate").cast("bigint"))
    w_ties = Window.partitionBy("o_custkey").orderBy(F.col("order_year").desc())
    w_unique = Window.partitionBy("o_custkey").orderBy(
        F.col("order_year").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "order_year",
        F.rank().over(w_ties).cast("bigint").alias("yr_rank"),
        F.dense_rank().over(w_ties).cast("bigint").alias("yr_dense_rank"),
        F.row_number().over(w_unique).cast("bigint").alias("rn"),
    )


def q_win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals: ROWS frame over a unique ordering plus a RANGE frame
    over the (ties-allowed) day number."""
    o = load_table(spark, sf_dir, "orders")
    o = o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff("o_orderdate", F.lit("1995-01-01")).cast("long").alias("day_num"),
        cents("o_totalprice").alias("price_c"),
    )
    w_rows = (
        Window.partitionBy("o_custkey")
        .orderBy("day_num", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_range = (
        Window.partitionBy("o_custkey")
        .orderBy("day_num")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "day_num",
        (F.sum("price_c").over(w_rows).cast("double") / F.lit(100.0)).alias(
            "running_spend_rows"
        ),
        (F.sum("price_c").over(w_range).cast("double") / F.lit(100.0)).alias(
            "running_spend_range"
        ),
    )


def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Previous/next event value per user over time."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        F.lag("event_type", 2, "none").over(w).alias("prev2_type"),
    )


def q_win_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4), cume_dist, percent_rank over a unique global ordering —
    WITHOUT the single-partition global window.

    A plain ``Window.orderBy(...)`` funnels every raw row through one
    task (Exchange SinglePartition over the scan — the one genuinely
    unbounded single-partition plan the registry audit flagged). All
    three functions are pure arithmetic in (rn, n) once the ordering is
    unique: the global row number comes from the two-phase
    ``series_row_number`` (parallelism ∝ acctbal buckets; the coarse key
    ``floor(c_acctbal)`` is monotone in the leading order column), and n
    attaches via a constant-key broadcast hash join. ntile's
    larger-buckets-first split is reproduced exactly: with q = n div 4,
    r = n mod 4, rows 1..(q+1)·r land in buckets of size q+1, the rest
    in buckets of size q. cume_dist = rn/n and percent_rank =
    (rn−1)/(n−1) hold exactly because the custkey tiebreak makes the
    ordering tie-free; the divisions are single correctly-rounded double
    ops, so values hash-match the oracle's real window functions."""
    c = load_table(spark, sf_dir, "customer")
    numbered = series_row_number(
        c.select("c_custkey", "c_acctbal"),
        [],
        [F.col("c_acctbal").asc(), F.col("c_custkey").asc()],
        "CAST(floor(c_acctbal) AS BIGINT) div 64",
    )
    n_rows = c.agg(F.count(F.lit(1)).alias("__n"))
    rn, n = F.col("rn"), F.col("__n")
    # integer ntile arithmetic: q/r via `div`/`%`, bucket index via
    # integer division (never floor-of-double — off-by-one risk)
    quartile = F.expr(
        "CASE WHEN rn <= (__n div 4 + 1) * (__n % 4)"
        " THEN (rn - 1) div (__n div 4 + 1) + 1"
        " ELSE (__n % 4) + (rn - (__n div 4 + 1) * (__n % 4) - 1)"
        "      div (__n div 4) + 1 END"
    )
    return attach_broadcast(numbered, n_rows).select(
        "c_custkey",
        "c_acctbal",
        quartile.cast("bigint").alias("quartile"),
        (rn.cast("double") / n.cast("double")).alias("cume"),
        F.when(n > 1, (rn - 1).cast("double") / (n - 1).cast("double"))
        .otherwise(F.lit(0.0))
        .alias("pct_rank"),
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: row_number window + filter. At 100 TB
    prefer this over sort+groupBy-collect: one shuffle, no array blowup."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("bigint").alias("rn"))
    )


def q_win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day trailing spend per customer: a bounded RANGE frame over a
    tz-free day index (``datediff`` vs a fixed epoch — never
    timestamp->unix seconds, which would bend around DST under a hostile
    session timezone). One shuffle on the partition key; the frame scan is
    a per-partition sliding pointer, O(n) per partition."""
    o = load_table(spark, sf_dir, "orders")
    o = o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff("o_orderdate", F.lit("1990-01-01")).cast("long").alias("day_idx"),
        cents("o_totalprice").alias("price_c"),
    )
    w30 = (
        Window.partitionBy("o_custkey").orderBy("day_idx").rangeBetween(-30, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "day_idx",
        (F.sum("price_c").over(w30).cast("double") / F.lit(100.0)).alias(
            "spend_trailing_30d"
        ),
        F.count(F.lit(1)).over(w30).alias("orders_trailing_30d"),
    )


QUERIES = {
    "win_rank": q_win_rank,
    "win_running": q_win_running,
    "win_lag_lead": q_win_lag_lead,
    "win_ntile_cume": q_win_ntile_cume,
    "topk_per_group": q_topk_per_group,
    "win_range_interval": q_win_range_interval,
}

ORACLES = {
    "win_rank": """
        SELECT o_custkey, o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS order_year,
               CAST(rank() OVER w_ties AS BIGINT) AS yr_rank,
               CAST(dense_rank() OVER w_ties AS BIGINT) AS yr_dense_rank,
               CAST(row_number() OVER w_unique AS BIGINT) AS rn
        FROM orders
        WINDOW w_ties AS (PARTITION BY o_custkey ORDER BY year(o_orderdate) DESC),
               w_unique AS (PARTITION BY o_custkey
                            ORDER BY year(o_orderdate) DESC, o_orderkey ASC)
    """,
    "win_running": """
        WITH base AS (
            SELECT o_custkey, o_orderkey,
                   CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num,
                   CAST(round(o_totalprice*100) AS BIGINT) AS price_c
            FROM orders
        )
        SELECT o_custkey, o_orderkey, day_num,
               CAST(SUM(price_c) OVER (PARTITION BY o_custkey ORDER BY day_num, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
                   AS running_spend_rows,
               CAST(SUM(price_c) OVER (PARTITION BY o_custkey ORDER BY day_num
                    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
                   AS running_spend_range
        FROM base
    """,
    "win_lag_lead": """
        SELECT event_id, user_id, value,
               lag(value, 1) OVER w AS prev_value,
               lead(value, 1) OVER w AS next_value,
               lag(event_type, 2, 'none') OVER w AS prev2_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "win_ntile_cume": """
        SELECT c_custkey, c_acctbal,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile,
               cume_dist() OVER w AS cume,
               percent_rank() OVER w AS pct_rank
        FROM customer
        WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
    """,
    "topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
        FROM orders
        QUALIFY rn <= 3
    """,
    "win_range_interval": """
        WITH base AS (
            SELECT o_custkey, o_orderkey,
                   CAST(date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
                       AS day_idx,
                   CAST(round(o_totalprice*100) AS BIGINT) AS price_c
            FROM orders
        )
        SELECT o_custkey, o_orderkey, day_idx,
               CAST(SUM(price_c) OVER w30 AS DOUBLE) / 100.0 AS spend_trailing_30d,
               COUNT(*) OVER w30 AS orders_trailing_30d
        FROM base
        WINDOW w30 AS (PARTITION BY o_custkey ORDER BY day_idx
                       RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
    """,
}
