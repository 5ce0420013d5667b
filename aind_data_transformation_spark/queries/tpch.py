"""Composite TPC-H-style queries adapted to the driver's slim star schema
(FIXTURES.md columns only — no comment/address/phone/shipmode fields).

These are the engine's headline multi-operator pipelines: scan + pushed
filters + broadcast dims + hash joins + partial aggregation + top-k, all in
one Catalyst plan. Revenue math uses integer cents (numeric.py) so every
query hash-matches the DuckDB oracle exactly.

Scale shapes (SURVEY.md §4): dimension tables (region/nation/supplier/part
at this ratio) broadcast; fact-fact joins (orders⋈lineitem) shuffle on the
join key once and AQE coalesces/skew-splits; final top-k uses
TakeOrderedAndProject, never a full global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from aind_data_transformation_spark.io.sources import load_table
from aind_data_transformation_spark.queries.numeric import cents, sql_cents

#: revenue in scaled integer space: cents(price) * (100 - cents-scaled disc)
def _rev(price_col: str = "l_extendedprice", disc_col: str = "l_discount"):
    return cents(price_col) * (100 - cents(disc_col))


def _sql_rev(price: str = "l_extendedprice", disc: str = "l_discount") -> str:
    return f"{sql_cents(price)} * (100 - {sql_cents(disc)})"


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: top 10 unshipped orders by revenue for one
    market segment."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1995-03-15").cast("timestamp_ntz")
    return (
        li.where(F.col("l_shipdate") > cutoff)
        .join(o.where(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(c.where(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg((F.sum(_rev()).cast("double") / F.lit(1.0e4)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume: revenue per nation where the supplier and
    the customer share the nation, one region, one year."""
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    y0 = F.lit("1996-01-01").cast("timestamp_ntz")
    y1 = F.lit("1997-01-01").cast("timestamp_ntz")
    return (
        o.where((F.col("o_orderdate") >= y0) & (F.col("o_orderdate") < y1))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(c),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg((F.sum(_rev()).cast("double") / F.lit(1.0e4)).alias("revenue"))
    )


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecast revenue: single-table scan with every predicate pushed
    to parquet; the whole query is one codegen stage + a scalar agg."""
    li = load_table(spark, sf_dir, "lineitem")
    y0 = F.lit("1996-01-01").cast("timestamp_ntz")
    y1 = F.lit("1997-01-01").cast("timestamp_ntz")
    return (
        li.where(
            (F.col("l_shipdate") >= y0)
            & (F.col("l_shipdate") < y1)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(cents("l_extendedprice") * cents("l_discount")).cast("double") / F.lit(1.0e4)).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting: top 20 customers by lost revenue from
    returned lines in one quarter."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    q0 = F.lit("1996-01-01").cast("timestamp_ntz")
    q1 = F.lit("1996-04-01").cast("timestamp_ntz")
    return (
        o.where((F.col("o_orderdate") >= q0) & (F.col("o_orderdate") < q1))
        .join(
            li.where(F.col("l_returnflag") == "R"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(_rev()).cast("double") / F.lit(1.0e4)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect: conditional aggregation over a broadcast
    part join — promo revenue share in one month."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    m0 = F.lit("1996-06-01").cast("timestamp_ntz")
    m1 = F.lit("1996-07-01").cast("timestamp_ntz")
    rev = _rev()
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0))
    return (
        li.where((F.col("l_shipdate") >= m0) & (F.col("l_shipdate") < m1))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: orders whose total line quantity exceeds
    a threshold — an aggregate-driven semi-join back onto the fact table."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg((F.sum(cents("l_quantity")).cast("double") / F.lit(100.0)).alias("total_qty"))
        .where(F.col("total_qty") > 300.0)
    )
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            (F.round(F.col("o_totalprice") * 100).cast("long").cast("double") / F.lit(100.0)).alias(
                "o_totalprice"
            ),
            "total_qty",
        )
    )


QUERIES = {
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
    "tpch_q6": q_tpch_q6,
    "tpch_q10": q_tpch_q10,
    "tpch_q14": q_tpch_q14,
    "tpch_q18": q_tpch_q18,
}

ORACLES = {
    "tpch_q3": f"""
        SELECT l_orderkey, o_orderdate,
               CAST(SUM({_sql_rev()}) AS DOUBLE) / 1e4 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "tpch_q5": f"""
        SELECT n_name,
               CAST(SUM({_sql_rev()}) AS DOUBLE) / 1e4 AS revenue
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
    """,
    "tpch_q6": f"""
        SELECT CAST(SUM({sql_cents('l_extendedprice')} * {sql_cents('l_discount')}) AS DOUBLE) / 1e4
                   AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "tpch_q10": f"""
        SELECT c_custkey, c_name, n_name,
               CAST(SUM({_sql_rev()}) AS DOUBLE) / 1e4 AS revenue
        FROM orders
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "tpch_q14": f"""
        SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_sql_rev()} ELSE 0 END) AS DOUBLE)
                   / CAST(SUM({_sql_rev()}) AS DOUBLE) AS promo_revenue_pct,
               COUNT(*) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-06-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
    """,
    "tpch_q18": f"""
        WITH big AS (
            SELECT l_orderkey,
                   CAST(SUM({sql_cents('l_quantity')}) AS DOUBLE) / 100.0 AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING CAST(SUM({sql_cents('l_quantity')}) AS DOUBLE) / 100.0 > 300.0
        )
        SELECT c_custkey, c_name, o_orderkey, o_orderdate,
               CAST({sql_cents('o_totalprice')} AS DOUBLE) / 100.0 AS o_totalprice,
               total_qty
        FROM orders
        JOIN big ON o_orderkey = l_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
}
